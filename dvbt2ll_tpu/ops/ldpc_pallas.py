"""Pallas TPU kernel for the quasi-cyclic LDPC parity accumulator.

Same math as the XLA slice-schedule in ``pipeline.bb_and_fec`` (see
``tables/ldpc.qc_entries``), but with the bit matrix transposed to
(nbch, F): every roll is then a SUBLANE rotation over exactly 360 = 45*8
sublanes while F stays on 128-aligned lanes, and the running in-row
prefix streams through the output block so only one (360, f_tile) value
is ever live - the whole schedule runs out of VMEM with no intermediate
HBM round-trips.  Measured ~15% faster than the XLA formulation on the
vv009 stage including the wrapping transposes (tools/profile_pallas_ldpc.py).

Kernel-facing layout notes:
  * input block (nbch, f_tile) uint8, grid over F tiles;
  * output block (q*360, f_tile): block c rows m = in-row inclusive
    prefix incl[c][m]; the wrapper undoes the column-major layout
    (parity bit p = m*q + c) with one small transpose;
  * Mosaic limits honored: no strided stores, no u8 dynamic rotates
    (rolls are static two-slice concats), no associative_scan (the row
    prefix is a Hillis-Steele XOR ladder).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(cols_sched, nbch: int, plen: int, q: int, f_pad: int,
                 f_tile: int, interpret: bool):
    def kernel(bits_ref, out_ref):
        run = None
        for c, entries in enumerate(cols_sched):
            acc = None
            for (r, s) in entries:
                t = bits_ref[r * 360:(r + 1) * 360, :]
                if s:  # static roll: out[m] = in[(m - s) % 360]
                    t = jnp.concatenate([t[360 - s:], t[:360 - s]], axis=0)
                acc = t if acc is None else acc ^ t
            if acc is None:
                acc = jnp.zeros((360, bits_ref.shape[1]), jnp.uint8)
            run = acc if run is None else run ^ acc
            out_ref[c * 360:(c + 1) * 360, :] = run
        # Hillis-Steele inclusive XOR scan over the 360 accumulator rows
        x = run
        sh = 1
        while sh < 360:
            x = x ^ jnp.concatenate(
                [jnp.zeros((sh, x.shape[1]), jnp.uint8), x[:-sh]], axis=0)
            sh *= 2
        row_excl = jnp.concatenate(
            [jnp.zeros((1, x.shape[1]), jnp.uint8), x[:-1]], axis=0)
        for c in range(q):
            out_ref[c * 360:(c + 1) * 360, :] = (
                out_ref[c * 360:(c + 1) * 360, :] ^ row_excl)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((plen, f_pad), jnp.uint8),
        grid=(f_pad // f_tile,),
        in_specs=[pl.BlockSpec((nbch, f_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((plen, f_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )


def _tile_for(nbch: int, plen: int, f: int):
    """Largest 128-multiple lane tile whose blocks fit the 16 MB scoped
    VMEM budget, or None if no tile fits (caller falls back to XLA).

    With more than one grid step Pallas double-buffers the in/out blocks,
    so the block bytes count twice; ~24 extra (360, tile) temporaries
    cover the streaming accumulator and scan ladder (validated against
    the Mosaic scoped-vmem accounting on hardware: vv009 tile 256/grid 8
    fits, 8K-normal tile 128 fits only at grid 1)."""
    budget = 15 * (1 << 20)
    for t in (256, 128):
        f_pad = -(-f // t) * t
        bufs = 1 if f_pad == t else 2
        if (bufs * (nbch + plen) + 24 * 360) * t <= budget:
            return t
    return None


def qc_ldpc_parity_pallas(cols_sched, nbch: int, plen: int, q: int,
                          nbch_bits: jnp.ndarray,
                          interpret: bool = False):
    """(F, nbch) uint8 codeword bits -> (F, plen) uint8 LDPC parity, or
    None when no lane tile fits VMEM (large tables with a multi-step
    grid) - the caller must then use the XLA schedule."""
    f = nbch_bits.shape[0]
    f_tile = _tile_for(nbch, plen, f)
    if f_tile is None:
        return None
    f_pad = -(-f // f_tile) * f_tile
    bits_t = nbch_bits.T
    if f_pad != f:
        bits_t = jnp.pad(bits_t, ((0, 0), (0, f_pad - f)))
    pk = _make_kernel(tuple(map(tuple, cols_sched)), nbch, plen, q, f_pad,
                      f_tile, interpret)
    out = pk(bits_t)  # (plen, f_pad), column-major prefix layout
    par = (out.reshape(q, 360, f_pad).transpose(1, 0, 2)
           .reshape(plen, f_pad))
    return par[:, :f].T
