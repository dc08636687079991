"""Pallas QC-LDPC encoder experiment vs the XLA slice-schedule version.

Layout: bits transposed to (nbch, F) so every QC roll is a SUBLANE
rotation (360 = 45*8 sublanes, perfectly tiled; F lanes are 128-aligned)
and the whole (360, q) accumulator stays in VMEM across the schedule.
Usage: python tools/profile_pallas_ldpc.py [F] [config]
"""
import functools
import sys

from _common import bench

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dvbt2ll_tpu.config import vv009_config
from dvbt2ll_tpu.tables.ldpc import qc_entries


def make_pallas_ldpc(cols_sched, nbch, plen, q, f_total, f_tile=512):
    rows = nbch // 360

    def kernel(bits_ref, out_ref):
        # bits_ref: (nbch, f_tile) u8; out_ref: (q*360, f_tile) holding the
        # in-row inclusive prefix, COLUMN-major (block c = incl[c] over m);
        # the caller undoes the layout.  Columns stream through out_ref so
        # only one (360, f_tile) value is live at a time (VMEM stack).
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
        # Hillis-Steele inclusive XOR scan over the 360 rows (log-depth;
        # associative_scan lowers to zero-size slices Mosaic rejects)
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

    grid = (f_total // f_tile,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((plen, f_total), jnp.uint8),
        grid=grid,
        in_specs=[pl.BlockSpec((nbch, f_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((plen, f_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )


def main():
    f = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    cfg = vv009_config()
    q, plen, nbch = cfg.q_ldpc, cfg.ldpc_parity_bits, cfg.nbch
    cols_sched = qc_entries(cfg.frame_size, cfg.code_rate, q)
    rows = nbch // 360
    rng = np.random.default_rng(0)
    nb = jnp.asarray(rng.integers(0, 2, (f, nbch), dtype=np.uint8))

    def xla_path(nbb):
        g = nbb.reshape(f, rows, 360)
        g2 = jnp.concatenate([g, g], axis=2)
        cols = []
        for entries in cols_sched:
            acc = None
            for (r, s) in entries:
                t = g2[:, r, 360 - s : 720 - s]
                acc = t if acc is None else acc ^ t
            cols.append(acc if acc is not None
                        else jnp.zeros((f, 360), jnp.uint8))
        run = cols[0]
        incl = [run]
        for cc in range(1, q):
            run = run ^ cols[cc]
            incl.append(run)
        incl = jnp.stack(incl, axis=2)
        row_inc = jax.lax.associative_scan(jnp.bitwise_xor, run, axis=1)
        row_excl = jnp.concatenate(
            [jnp.zeros((f, 1), jnp.uint8), row_inc[:, :-1]], axis=1)
        return (incl ^ row_excl[:, :, None]).reshape(f, plen)

    pk = make_pallas_ldpc(cols_sched, nbch, plen, q, f)

    def _undo(out, fdim):
        # out block c row m = parity bit m*q + c
        return out.reshape(q, 360, fdim).transpose(1, 0, 2).reshape(plen,
                                                                    fdim)

    def pallas_path(nbb):
        return _undo(pk(nbb.T), f).T

    def pallas_path_pretransposed(nbt):
        return _undo(pk(nbt), f)

    a, _ = bench("xla slice-schedule", xla_path, nb)
    b, _ = bench("pallas (incl. transposes)", pallas_path, nb)
    c, _ = bench("pallas (pre-transposed)", pallas_path_pretransposed, nb.T)
    print("equal:", bool(jnp.array_equal(a, b)),
          bool(jnp.array_equal(jnp.asarray(a).T, c)), flush=True)


if __name__ == "__main__":
    main()
