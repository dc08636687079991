"""Pallas QC-LDPC encoder (the shipped ops/ldpc_pallas.py kernel) vs the
XLA slice-schedule, on real hardware.

Usage: python tools/profile_pallas_ldpc.py [F] [config]
  config: vv009_4kshort (default) | 8k_normal | 32k_extended
Measured on TPU v5e (F=2048, vv009): XLA 1.16 ms, Pallas 0.96-0.99 ms
including the wrapping transposes.  Normal-frame tables fit VMEM only at
grid 1 (F <= 128); beyond that the kernel declines (returns None) and
the pipeline keeps the XLA schedule.
"""
import sys

from _common import bench

import jax
import jax.numpy as jnp
import numpy as np

from bench import _named_config
from dvbt2ll_tpu.ops.ldpc_pallas import qc_ldpc_parity_pallas
from dvbt2ll_tpu.tables.ldpc import qc_entries


def main():
    f = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    name = sys.argv[2] if len(sys.argv) > 2 else "vv009_4kshort"
    cfg = _named_config(name)
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

    def pallas_path(nbb):
        out = qc_ldpc_parity_pallas(cols_sched, nbch, plen, q, nbb)
        assert out is not None, "kernel declined (no VMEM tile fits)"
        return out

    a, _ = bench("xla slice-schedule", xla_path, nb)
    b, _ = bench("pallas kernel", pallas_path, nb)
    print("equal:", bool(jnp.array_equal(a, b)), flush=True)


if __name__ == "__main__":
    main()
