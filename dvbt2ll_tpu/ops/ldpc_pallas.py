"""Pallas TPU kernel for the quasi-cyclic LDPC parity accumulator.

Same math as the XLA slice-schedule in ``pipeline.bb_and_fec`` (see
``tables/ldpc.qc_entries``), but with the bit matrix transposed to
(nbch, F): every roll is then a SUBLANE rotation over exactly 360 = 45*8
sublanes while F stays on 128-aligned lanes, and the running in-row
prefix streams through the output block so only one (360, f_tile) value
is ever live - the whole schedule runs out of VMEM with no intermediate
HBM round-trips.  Short-frame tables fit a single resident input block;
normal-frame tables (nbch up to 54000 rows) run a two-level variant that
grids over input ROW GROUPS with the output block VMEM-resident across
group steps, so every Annex-A table is covered at any batch.  A/B
evidence vs the XLA schedule: tools/profile_pallas_ldpc.py / BENCH.md
"Pallas LDPC".

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


def _split_groups(cols_sched, q: int, group_blocks: int, n_groups: int):
    """Partition the (column -> [(block row r, roll s)]) schedule into
    n_groups row-group schedules with LOCAL block rows, so group g's
    kernel body only touches input rows [g*group_blocks*360, ...)."""
    groups = [[[] for _ in range(q)] for _ in range(n_groups)]
    for c, entries in enumerate(cols_sched):
        for (r, s) in entries:
            groups[r // group_blocks][c].append((r % group_blocks, s))
    return [tuple(tuple(col) for col in g) for g in groups]


def _make_grouped_kernel(groups_sched, group_rows: int, plen: int, q: int,
                         f_pad: int, f_tile: int, interpret: bool):
    """Two-level accumulation for tables whose full (nbch, f_tile) block
    exceeds VMEM: grid (F tiles, row groups) with the groups innermost.
    The output block's index map is constant across groups, so it stays
    resident in VMEM while each group XORs in its slice's contributions;
    the LAST group then turns the per-column sums into the in-row running
    prefix and applies the Hillis-Steele row scan - identical math to the
    single-group kernel, one extra VMEM pass over the output block."""
    n_groups = len(groups_sched)

    def kernel(bits_ref, out_ref):
        g = pl.program_id(1)
        for k, sched in enumerate(groups_sched):
            @pl.when(g == k)
            def _(sched=sched, k=k):
                for c in range(q):
                    acc = None
                    for (r, s) in sched[c]:
                        t = bits_ref[r * 360:(r + 1) * 360, :]
                        if s:
                            t = jnp.concatenate([t[360 - s:], t[:360 - s]],
                                                axis=0)
                        acc = t if acc is None else acc ^ t
                    if k == 0:
                        if acc is None:
                            acc = jnp.zeros((360, bits_ref.shape[1]),
                                            jnp.uint8)
                        out_ref[c * 360:(c + 1) * 360, :] = acc
                    elif acc is not None:
                        out_ref[c * 360:(c + 1) * 360, :] = (
                            out_ref[c * 360:(c + 1) * 360, :] ^ acc)

        @pl.when(g == n_groups - 1)
        def _():
            run = None
            for c in range(q):
                cur = out_ref[c * 360:(c + 1) * 360, :]
                run = cur if run is None else run ^ cur
                out_ref[c * 360:(c + 1) * 360, :] = run
            x = run
            sh = 1
            while sh < 360:
                x = x ^ jnp.concatenate(
                    [jnp.zeros((sh, x.shape[1]), jnp.uint8), x[:-sh]],
                    axis=0)
                sh *= 2
            row_excl = jnp.concatenate(
                [jnp.zeros((1, x.shape[1]), jnp.uint8), x[:-1]], axis=0)
            for c in range(q):
                out_ref[c * 360:(c + 1) * 360, :] = (
                    out_ref[c * 360:(c + 1) * 360, :] ^ row_excl)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((plen, f_pad), jnp.uint8),
        grid=(f_pad // f_tile, n_groups),
        in_specs=[pl.BlockSpec((group_rows, f_tile), lambda i, g: (g, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((plen, f_tile), lambda i, g: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )


def _tile_for(nbch: int, plen: int, f: int):
    """VMEM tiling choice: (f_tile, group_rows) with group_rows == nbch
    for the single-group kernel, or a row-group size for the two-level
    kernel; None only if even one 360-row group cannot fit (never true
    for the Annex-A tables).

    With more than one grid step Pallas double-buffers the in/out blocks,
    so the block bytes count twice; ~24 extra (360, tile) temporaries
    cover the streaming accumulator and scan ladder (validated against
    the Mosaic scoped-vmem accounting on hardware: vv009 tile 256/grid 8
    fits, 8K-normal tile 128 fits only at grid 1).  Grouping prefers the
    FEWEST groups (smallest guarded-code footprint / fewest output
    passes), tie-broken by the wider lane tile."""
    budget = 15 * (1 << 20)
    for t in (256, 128):
        f_pad = -(-f // t) * t
        bufs = 1 if f_pad == t else 2
        if (bufs * (nbch + plen) + 24 * 360) * t <= budget:
            return t, nbch
    nblocks = nbch // 360
    best = None
    for t in (256, 128):
        avail = budget // t - 2 * plen - 24 * 360
        gb_max = min(nblocks, avail // (2 * 360))
        if gb_max < 1:
            continue
        n_groups = -(-nblocks // gb_max)
        if best is None or n_groups < best[0]:
            best = (n_groups, t)
    if best is None:
        return None
    n_groups, t = best
    return t, -(-nblocks // n_groups) * 360


def qc_ldpc_parity_pallas(cols_sched, nbch: int, plen: int, q: int,
                          nbch_bits: jnp.ndarray,
                          interpret: bool = False,
                          packed=None):
    """(F, nbch) uint8 codeword bits -> (F, plen) uint8 LDPC parity, or
    None when no VMEM tiling exists (not the case for any Annex-A table)
    - the caller must then use the XLA schedule.  Tables too large for a
    single resident input block run the two-level row-grouped kernel.

    ``packed`` (auto when None): run the kernel on a frame-PACKED matrix
    - bit j of byte column w is frame 8w+j.  Rolls are sublane rotations
    and the schedule is pure XOR, so the kernel bodies are bit-for-bit
    agnostic to the packing; only this wrapper packs/unpacks.  At F
    frames the kernel block shrinks from F to ceil(F/8) lanes, cutting
    the VMEM traffic of every schedule entry (and the HBM transpose) up
    to 8x - the round-2 "packbits" rejection (BENCH.md) A/B'd the XLA
    roll schedule on packed words, NOT the VMEM-resident kernel.
    MEASURED round 4 (tools/profile_pallas_ldpc.py): packed runs at
    0.88-0.98x of the unpacked kernel at every bench-realistic F - the
    schedule is bound by its op COUNT (thousands of (360, lanes) XOR
    tiles, identical packed or not), so the density win never lands
    while the XLA-side pack/unpack passes are pure cost.  Default is
    therefore False; the parameter stays for remeasurement."""
    f = nbch_bits.shape[0]
    if packed is None:
        packed = False
    if packed:
        fp = -(-f // 8)
        # pack along the FRAME axis: (F, nbch) -> (F/8, nbch) -> T
        bits_t = jnp.packbits(nbch_bits, axis=0).T  # (nbch, fp) u8
        f_eff = fp
    else:
        bits_t = nbch_bits.T
        f_eff = f
    tiling = _tile_for(nbch, plen, f_eff)
    if tiling is None:
        return None
    f_tile, group_rows = tiling
    f_pad = -(-f_eff // f_tile) * f_tile
    n_groups = -(-nbch // group_rows)
    rows_pad = n_groups * group_rows
    if f_pad != f_eff or rows_pad != nbch:
        bits_t = jnp.pad(bits_t, ((0, rows_pad - nbch),
                                  (0, f_pad - f_eff)))
    if n_groups == 1:
        pk = _make_kernel(tuple(map(tuple, cols_sched)), nbch, plen, q,
                          f_pad, f_tile, interpret)
    else:
        groups = _split_groups(cols_sched, q, group_rows // 360, n_groups)
        pk = _make_grouped_kernel(groups, group_rows, plen, q, f_pad,
                                  f_tile, interpret)
    out = pk(bits_t)  # (plen, f_pad), column-major prefix layout
    par = (out.reshape(q, 360, f_pad).transpose(1, 0, 2)
           .reshape(plen, f_pad))
    if packed:
        # (plen, fp) packed bytes -> (F, plen) bits: transpose the SMALL
        # packed matrix, then unpack along the frame axis
        return jnp.unpackbits(par[:, : -(-f // 8)].T, axis=0)[:f]
    return par[:, :f].T
