"""Experiment: one dense GF(2) generator matmul for BCH+LDPC parity (MXU)
vs the gather + cumsum formulation, on the vv009 short-frame config."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from dvbt2ll_tpu.config import vv009_config
from dvbt2ll_tpu.pipeline import Transmitter, _plp_consts
from dvbt2ll_tpu.tables.ldpc import _TABLES, address_pairs, encoder_gather
from dvbt2ll_tpu.tables import table


def fence(x):
    return float(jnp.sum(jnp.ravel(x)[:16].astype(jnp.float32)))


def bench(name, fn, *args, iters=30):
    f = jax.jit(fn)
    out = f(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:26s} {dt*1e3:8.2f} ms", flush=True)
    return out


def build_dense_generator(cfg, bch_matrix):
    """(kbch, nbch_par + plen) uint8: [BCH parity | LDPC parity] as linear
    functions of the kbch info bits."""
    t0 = time.perf_counter()
    tab = table(_TABLES[(cfg.frame_size, cfg.code_rate)])
    plen = cfg.ldpc_parity_bits
    info_idx, parity_idx = address_pairs(tab, cfg.q_ldpc, plen)
    A = np.zeros((cfg.nbch, plen), dtype=np.uint8)
    np.add.at(A, (info_idx, parity_idx), 1)
    A &= 1
    G_ldpc = np.cumsum(A, axis=1, dtype=np.uint8) & 1  # prefix-XOR chain
    Gb = bch_matrix.astype(np.float32)                 # (kbch, npar)
    cross = (Gb @ G_ldpc[cfg.kbch:].astype(np.float32)).astype(np.int64) & 1
    G_par = (G_ldpc[: cfg.kbch] ^ cross.astype(np.uint8))
    G = np.concatenate([bch_matrix.astype(np.uint8), G_par], axis=1)
    print(f"generator build {time.perf_counter()-t0:.1f}s shape={G.shape}",
          flush=True)
    return G


def main():
    batch = 256
    cfg = vv009_config()
    tx = Transmitter(cfg, batch, strict=False)
    pp = tx.plan.plps[0]
    c = _plp_consts(pp)
    f = pp.fec_frames
    rng = np.random.default_rng(0)
    kbch_bits = jnp.asarray(
        rng.integers(0, 2, (f, cfg.kbch), dtype=np.uint8))

    def gather_path(kb):
        bch_par = (jnp.matmul(kb.astype(jnp.int8), c["bch_matrix"],
                              preferred_element_type=jnp.int32) & 1).astype(
                                  jnp.uint8)
        nbch_bits = jnp.concatenate([kb, bch_par], axis=1)
        ext_t = jnp.concatenate(
            [nbch_bits.T, jnp.zeros((1, nbch_bits.shape[0]), jnp.uint8)],
            axis=0)
        acc_t = ext_t[ldpc_g].sum(1, dtype=jnp.uint8)
        ldpc_par = (jnp.cumsum(acc_t, axis=0, dtype=jnp.uint8) & 1).T
        return jnp.concatenate([nbch_bits, ldpc_par], axis=1)

    ldpc_g, _ = encoder_gather(cfg.frame_size, cfg.code_rate,
                               cfg.ldpc_parity_bits, cfg.nbch, cfg.q_ldpc)
    ldpc_g = np.asarray(ldpc_g, np.int32)
    G = build_dense_generator(cfg, np.asarray(c["bch_matrix"], np.uint8))
    Gi8 = G.astype(np.int8)

    def dense_path(kb):
        par = (jnp.matmul(kb.astype(jnp.int8), Gi8,
                          preferred_element_type=jnp.int32) & 1).astype(
                              jnp.uint8)
        return jnp.concatenate([kb, par], axis=1)

    a = bench("bch+ldpc gather", gather_path, kbch_bits)
    b = bench("bch+ldpc dense matmul", dense_path, kbch_bits)
    eq = bool(jnp.array_equal(a, b))
    print("dense == gather:", eq, flush=True)

    # bf16 variant: exact for sums < 257? no - bf16 has 8 mantissa bits,
    # integer-exact only to 256; rows sum up to kbch -> NOT exact. skip.


if __name__ == "__main__":
    main()
