"""Pallas TPU kernel: fused 4-step IFFT + guard-interval epilogue.

The OFDM tail's cost on TPU is not FFT FLOPs but HBM passes: XLA's
complex64 FFT materializes the time tensor, the GI concatenate rewrites
it, and stack(real, imag) rewrites the final output (xprof: copies /
reshapes / pad fusions spread across the tail, BENCH.md round 4).  This
kernel runs the Bailey 4-step IFFT as MXU matmuls on separate real/imag
f32 planes with every intermediate VMEM-resident, and writes the
guard-interval prefix + body directly - one HBM read of the grid, one
HBM write of the GI'd time domain, no complex dtype anywhere.
Match: the reference's per-symbol FFTW execute + 2-memcpy cyclic prefix
(lib/pilotgenp1insert_cc_impl.cc:2890-2897).

Layout trick that makes it transpose-free: with N = N1*N2 (N1 = 128
lanes) and the decimation n = n1 + N1*n2, k = N2*k1 + k2,

    x[n1 + N1*n2] = (1/N) sum_k2 W2[n2,k2] * T[k2,n1]
                    * sum_k1 At[k2,k1] W1[k1,n1]

where At[k2,k1] = X[N2*k1 + k2] is the TRANSPOSED-GRID layout the frame
builder's gather can emit for free (grid_src is an arbitrary
permutation).  Both matmuls then keep n1 on the 128-wide lane axis, the
result rows (n2) are already in natural sample order, and the cyclic
prefix is a whole-row concat: out rows = [last gi/N1 rows | all rows].
Validated against np.fft.ifft to 1.5e-15 in f64 (tools/profile_ifft4.py)
and >130 dB in f32 with precision=HIGHEST dots.

Applicability gate (``supported()``): 1K-8K FFTs with fft % 128 == 0 and
gi % 128 == 0.  16K/32K keep the complex jnp.fft tail (the 4-step matmul
FLOPs cancel the layout savings there, measured), as do sub-128 guard
intervals (GI 1/128 below 16K).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N1 = 128  # lane width of the second (length-128) DFT factor


def supported(fft: int, gi: int) -> bool:
    """Geometry gate for the planar 4-step tail.  n2 = fft/128 is capped
    at 64 (<= 8K FFT): the 4-step costs N*(N2+128) MAC/sample, so at 16K
    and 32K the matmul FLOPs swamp the layout savings - measured flat at
    32K (2069 -> 2075 Msamp/s) while 4K/8K gained 11-14 % (BENCH.md
    round 4).  Above the cap the chain keeps the complex jnp.fft tail."""
    return fft % N1 == 0 and gi % N1 == 0 and 8 <= fft // N1 <= 64


def factor_matrices(fft: int, scale: float):
    """(w1r, w1i, ttr, tti, w2r, w2i) f32 host constants; `scale` (the
    1/N of the inverse transform times the chain's fft*ofdm_norm) is
    folded into W1."""
    n2 = fft // N1
    k1 = np.arange(N1)
    k2 = np.arange(n2)
    w1 = np.exp(2j * np.pi * np.outer(k1, k1) / N1) * scale
    t = np.exp(2j * np.pi * np.outer(k2, k1) / fft)    # T[k2, n1]
    w2 = np.exp(2j * np.pi * np.outer(k2, k2) / n2)
    return (np.float32(w1.real), np.float32(w1.imag),
            np.float32(t.real), np.float32(t.imag),
            np.float32(w2.real), np.float32(w2.imag))


def ifft_gi_einsum(grids_re_t: jnp.ndarray, grids_im_t: jnp.ndarray,
                   fft: int, gi: int, scale: float,
                   precision=None):
    """The same transposed-layout 4-step IFFT as the Pallas kernel, but
    as XLA einsums: stage 1 contracts over the 128-lane axis with
    M = B*S*N2 (full MXU utilization), stage 2 is one small-by-wide
    matmul, and the result rows land in natural sample order so the
    guard interval is a row concat - no output transpose.  Measured
    FASTER than the VMEM-resident Pallas kernel (0.715 ms vs ~0.45 ms at
    vv009/256): the kernel's per-symbol (32,128) dots starve the MXU,
    and XLA's batching beats residency here (BENCH.md round 4)."""
    hi = precision if precision is not None else jax.lax.Precision.HIGHEST
    b, s, n2, n1 = grids_re_t.shape
    gi_rows = gi // N1
    w1r, w1i, ttr, tti, w2r, w2i = factor_matrices(fft, scale)
    br = (jnp.einsum("xskn,nm->xskm", grids_re_t, w1r, precision=hi)
          - jnp.einsum("xskn,nm->xskm", grids_im_t, w1i, precision=hi))
    bi = (jnp.einsum("xskn,nm->xskm", grids_re_t, w1i, precision=hi)
          + jnp.einsum("xskn,nm->xskm", grids_im_t, w1r, precision=hi))
    cr = br * ttr - bi * tti
    ci = br * tti + bi * ttr
    xr = (jnp.einsum("ab,xsbn->xsan", w2r, cr, precision=hi)
          - jnp.einsum("ab,xsbn->xsan", w2i, ci, precision=hi))
    xi = (jnp.einsum("ab,xsbn->xsan", w2r, ci, precision=hi)
          + jnp.einsum("ab,xsbn->xsan", w2i, cr, precision=hi))
    body_re = jnp.concatenate([xr[:, :, n2 - gi_rows:], xr], axis=2)
    body_im = jnp.concatenate([xi[:, :, n2 - gi_rows:], xi], axis=2)
    return (body_re.reshape(b, s, fft + gi),
            body_im.reshape(b, s, fft + gi))


def ifft_gi_einsum2d(grids_re_t: jnp.ndarray, grids_im_t: jnp.ndarray,
                     fft: int, gi: int, scale: float,
                     precision=None):
    """ifft_gi_einsum with both matmul stages expressed as plain dots on
    reshaped operands: stage 1 merges rows to ONE (B*S*N2, 128) 2D
    matmul, stage 3 applies W2 as a broadcast batched LEFT-multiplication
    (n2, n2) @ (B*S, n2, N1) via jnp.matmul.  Mathematically identical
    to the einsum tail; exists to A/B whether XLA's {2,3,1,0} einsum
    operand copies (BENCH.md per-op table, 0.28 ms) disappear under
    these formulations (measured: ~1 %, at the tunnel noise floor)."""
    hi = precision if precision is not None else jax.lax.Precision.HIGHEST
    b, s, n2, n1 = grids_re_t.shape
    gi_rows = gi // N1
    w1r, w1i, ttr, tti, w2r, w2i = factor_matrices(fft, scale)
    ar = grids_re_t.reshape(b * s * n2, N1)
    ai = grids_im_t.reshape(b * s * n2, N1)
    dot = functools.partial(jnp.matmul, precision=hi)
    br = dot(ar, w1r) - dot(ai, w1i)
    bi = dot(ar, w1i) + dot(ai, w1r)
    cr = (br.reshape(b * s, n2, N1) * ttr
          - bi.reshape(b * s, n2, N1) * tti)
    ci = (br.reshape(b * s, n2, N1) * tti
          + bi.reshape(b * s, n2, N1) * ttr)
    # stage 3 as batched matmul with W2 on the LEFT via jnp.matmul's
    # broadcasting: (n2, n2) @ (B*S, n2, N1) -> (B*S, n2, N1)
    xr = dot(w2r, cr) - dot(w2i, ci)
    xi = dot(w2r, ci) + dot(w2i, cr)
    xr = xr.reshape(b, s, n2, N1)
    xi = xi.reshape(b, s, n2, N1)
    body_re = jnp.concatenate([xr[:, :, n2 - gi_rows:], xr], axis=2)
    body_im = jnp.concatenate([xi[:, :, n2 - gi_rows:], xi], axis=2)
    return (body_re.reshape(b, s, fft + gi),
            body_im.reshape(b, s, fft + gi))


def _kernel(gi_rows: int, n2: int, s_tile: int, b_tile: int,
            ar_ref, ai_ref, w1r_ref, w1i_ref, ttr_ref, tti_ref,
            w2r_ref, w2i_ref, or_ref, oi_ref):
    """Batched formulation (round 5): the round-4 kernel issued one
    (N2, 128)x(128, 128) dot per symbol and one grid step per FRAME -
    256 invocations of tiny-M dots at vv009/256, so per-invocation fixed
    cost and MXU starvation dominated (measured 1.97 ms vs einsum 1.69
    with symbols-only batching; the per-symbol original was no better).
    Now a tile covers b_tile frames x s_tile symbols:

      stage 1: ONE (b_tile*s_tile*N2, 128) x (128, 128) dot
      stage 3: per frame, block-diag W2
               (s_tile*N2, s_tile*N2) x (s_tile*N2, 128)

    The block-diagonal W2 spends s_tile x the stage-3 MACs on zeros, but
    stage 3 is only N2/128 of stage 1's work per row, and one large dot
    beats s_tile small-M dots on the systolic array; it also needs NO
    in-VMEM transpose or lane-axis reshape (n1 never leaves the lanes).
    """
    dot = functools.partial(
        jax.lax.dot, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    m = s_tile * n2
    ar = ar_ref[:].reshape(b_tile * m, N1)
    ai = ai_ref[:].reshape(b_tile * m, N1)
    # stage 1: B = At @ W1 (complex, n1 stays on lanes, whole tile)
    w1r, w1i = w1r_ref[:], w1i_ref[:]
    br = dot(ar, w1r) - dot(ai, w1i)
    bi = dot(ar, w1i) + dot(ai, w1r)
    # stage 2: twiddle C = B * T (T tiled to (b_tile*m, N1) on the host)
    ttr, tti = ttr_ref[:], tti_ref[:]
    cr = (br * ttr - bi * tti).reshape(b_tile, m, N1)
    ci = (br * tti + bi * ttr).reshape(b_tile, m, N1)
    # stage 3: X = blkdiag(W2,..) @ C -> rows in natural sample order
    w2r, w2i = w2r_ref[:], w2i_ref[:]
    for f in range(b_tile):
        xr = (dot(w2r, cr[f]) - dot(w2i, ci[f])).reshape(s_tile, n2, N1)
        xi = (dot(w2r, ci[f]) + dot(w2i, cr[f])).reshape(s_tile, n2, N1)
        # guard interval: prefix = last gi_rows rows, then the body
        or_ref[f, :, :gi_rows] = xr[:, n2 - gi_rows:]
        oi_ref[f, :, :gi_rows] = xi[:, n2 - gi_rows:]
        or_ref[f, :, gi_rows:] = xr
        oi_ref[f, :, gi_rows:] = xi


def ifft_gi_pallas(grids_re_t: jnp.ndarray, grids_im_t: jnp.ndarray,
                   fft: int, gi: int, scale: float,
                   interpret: bool = False):
    """Transposed-layout grids (B, S, N2, N1) f32 planes -> GI'd time
    domain (B, S, fft + gi) f32 planes (re, im).

    Input element [b, s, k2, k1] must hold carrier bin N2*k1 + k2 of
    symbol s (the frame builder emits this directly by permuting its
    gather map; see plan.grid_src_t)."""
    b, s, n2, n1 = grids_re_t.shape
    assert n1 == N1 and n2 == fft // N1 and gi % N1 == 0
    gi_rows = gi // N1
    w1r, w1i, ttr, tti, w2r, w2i = factor_matrices(fft, scale)

    # symbol tile: amortize the resident constants over a few symbols
    # while keeping in+out+temps comfortably inside VMEM, and cap the
    # block-diagonal stage-3 matrix at 256 rows (its MAC count grows
    # linearly in s_tile; 256 keeps the zero-padding overhead at <= 2x
    # stage 1 while the dot is already full-MXU)
    bytes_per_sym = (2 * (n2 * N1) + 2 * ((n2 + gi_rows) * N1)) * 4
    s_tile = max(1, min(s, (4 << 20) // bytes_per_sym,
                        max(1, 256 // n2)))
    while s % s_tile:
        s_tile -= 1
    # frame tile: batch whole frames into the same invocation so stage 1
    # is one large-M dot and the grid shrinks ~b_tile-fold (the dominant
    # cost at small per-frame shapes is per-invocation overhead);
    # bounded so in+out tiles + stage-1/2 temps stay well inside VMEM
    per_frame = s_tile * bytes_per_sym * 2  # in/out + ~same again in temps
    b_tile = max(1, min(b, 8, (6 << 20) // max(per_frame, 1)))
    while b % b_tile:
        b_tile -= 1

    # host-built batched constants: T tiled over the tile's rows,
    # W2 as a block-diagonal so stage 3 is one dot per frame
    m = s_tile * n2
    ttr_b = np.tile(ttr, (b_tile * s_tile, 1))
    tti_b = np.tile(tti, (b_tile * s_tile, 1))
    eye = np.eye(s_tile, dtype=np.float32)
    w2r_b, w2i_b = np.kron(eye, w2r), np.kron(eye, w2i)

    kern = functools.partial(_kernel, gi_rows, n2, s_tile, b_tile)
    const = lambda shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, s, n2 + gi_rows, N1), jnp.float32)
    body_re, body_im = pl.pallas_call(
        kern,
        out_shape=(out_shape, out_shape),
        grid=(b // b_tile, s // s_tile),
        in_specs=[
            pl.BlockSpec((b_tile, s_tile, n2, N1),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, s_tile, n2, N1),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            const((N1, N1)), const((N1, N1)),
            const((b_tile * m, N1)), const((b_tile * m, N1)),
            const((m, m)), const((m, m)),
        ],
        out_specs=(
            pl.BlockSpec((b_tile, s_tile, n2 + gi_rows, N1),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, s_tile, n2 + gi_rows, N1),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(grids_re_t, grids_im_t, w1r, w1i, ttr_b, tti_b, w2r_b, w2i_b)
    return (body_re.reshape(b, s, fft + gi),
            body_im.reshape(b, s, fft + gi))
