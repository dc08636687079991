"""A/B benchmarks for pipeline op variants on the current device."""
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
from dvbt2ll_tpu.io import synthetic_ts
from dvbt2ll_tpu.pipeline import Transmitter, _plp_consts, _consts


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


def main():
    batch = 256
    cfg = vv009_config()
    tx = Transmitter(cfg, batch, strict=False)
    pp = tx.plan.plps[0]
    c = _plp_consts(pp)
    # crc_scatter left the hot-path consts (VERDICT r1 weak #9); rebuild it for the A/B
    c = dict(c, crc_scatter=np.asarray(pp.crc_scatter, np.int32))
    g = _consts(tx.plan)
    n = tx.bytes_per_step
    ts = np.concatenate([np.zeros(187, np.uint8), synthetic_ts(n)])
    w = jax.device_put(jnp.asarray(ts))
    f = pp.fec_frames
    p = pp.n_packets

    # ---- unpackbits variants -------------------------------------------
    bench("unpack 1d", lambda a: jnp.unpackbits(a), w)
    pad = (-w.size) % 1024
    w2 = jnp.pad(w, (0, pad)).reshape(-1, 1024)
    bench("unpack 2d rows", lambda a: jnp.unpackbits(a, axis=1), w2)
    bench("unpack shift2d",
          lambda a: ((a[:, :, None] >> np.arange(7, -1, -1)[None, None, :])
                     & 1).reshape(a.shape[0], -1), w2)

    # ---- CRC: scatter vs column-concat ----------------------------------
    bits = jnp.unpackbits(w)

    def crc_scatter(bits):
        stream = bits[187 * 8:]
        pkt = (bits[: p * 188 * 8].reshape(p, 188 * 8)[:, : 187 * 8]
               .astype(jnp.int8))
        crc = (jnp.matmul(pkt, c["crc_matrix"],
                          preferred_element_type=jnp.int32) & 1
               ).astype(jnp.uint8)
        return stream.at[c["crc_scatter"]].set(crc.reshape(-1))

    def crc_concat(bits):
        pkt = (bits[: p * 188 * 8].reshape(p, 188 * 8)[:, : 187 * 8]
               .astype(jnp.int8))
        crc = (jnp.matmul(pkt, c["crc_matrix"],
                          preferred_element_type=jnp.int32) & 1
               ).astype(jnp.uint8)
        stream = bits[187 * 8:]
        n = stream.shape[0]
        rest = (jnp.pad(stream, (0, p * 188 * 8 - n))
                .reshape(p, 188 * 8)[:, 8:])
        return jnp.concatenate([crc, rest], axis=1).reshape(-1)[:n]

    a = bench("crc scatter", crc_scatter, bits)
    b = bench("crc concat", crc_concat, bits)
    print("crc variants equal:", bool(jnp.array_equal(a, b)), flush=True)

    # ---- mapper gather orientation --------------------------------------
    frame_bits = jnp.asarray(
        np.random.default_rng(0).integers(0, 2, (f, 16200), dtype=np.uint8))
    perm = c["mapper_perm"]
    a = bench("mapper minor gather", lambda x: x[:, perm], frame_bits)
    b = bench("mapper major gather+T",
              lambda x: x.T[perm].T, frame_bits)
    print("mapper variants equal:", bool(jnp.array_equal(a, b)), flush=True)

    # ---- grid gather orientation ----------------------------------------
    seq_len = int(g["grid_src"].max()) + 1
    seq = jnp.asarray((np.random.default_rng(1)
                       .standard_normal((batch, seq_len, 2))
                       .astype(np.float32)).view(np.complex64)[..., 0])
    src = g["grid_src"]
    clip = np.clip(src, 0, None)
    valid = (src >= 0)

    def grid_minor(s):
        d = jnp.where(valid[None], s[:, clip], 0j)
        return d

    def grid_major(s):
        d = s.T[clip.reshape(-1)].T.reshape(s.shape[0], *src.shape)
        return jnp.where(valid[None], d, 0j)

    a = bench("grid minor gather", grid_minor, seq)
    b = bench("grid major gather+T", grid_major, seq)
    print("grid variants equal:", bool(jnp.array_equal(a, b)), flush=True)


if __name__ == "__main__":
    main()


def crc_rowunpack_variant():
    """Packet-aligned 2D unpack replacing the bit-scatter CRC substitution."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dvbt2ll_tpu.config import vv009_config
    from dvbt2ll_tpu.io import synthetic_ts
    from dvbt2ll_tpu.pipeline import Transmitter, _plp_consts

    batch = 256
    cfg = vv009_config()
    tx = Transmitter(cfg, batch, strict=False)
    pp = tx.plan.plps[0]
    c = _plp_consts(pp)
    # crc_scatter left the hot-path consts (VERDICT r1 weak #9); rebuild it for the A/B
    c = dict(c, crc_scatter=np.asarray(pp.crc_scatter, np.int32))
    n = tx.bytes_per_step
    ts = np.concatenate([np.zeros(187, np.uint8), synthetic_ts(n)])
    w = jax.device_put(jnp.asarray(ts))
    p = pp.n_packets

    def current(wb):
        nb = wb.shape[0]
        rows = jnp.pad(wb, (0, (-nb) % 1024)).reshape(-1, 1024)
        bits = jnp.unpackbits(rows, axis=1).reshape(-1)[: nb * 8]
        stream = bits[187 * 8:]
        pkt = (bits[: p * 188 * 8].reshape(p, 188 * 8)[:, : 187 * 8]
               .astype(jnp.int8))
        crc = (jnp.matmul(pkt, c["crc_matrix"],
                          preferred_element_type=jnp.int32) & 1
               ).astype(jnp.uint8)
        return stream.at[c["crc_scatter"]].set(crc.reshape(-1))

    def rowaligned(wb):
        nb = wb.shape[0]
        nfresh = nb - 187
        padded = (wb[: p * 188] if nb >= p * 188
                  else jnp.pad(wb, (0, p * 188 - nb)))
        pkt_rows = jnp.unpackbits(padded.reshape(p, 188), axis=1)
        pkt = pkt_rows[:, : 187 * 8].astype(jnp.int8)
        crc = (jnp.matmul(pkt, c["crc_matrix"],
                          preferred_element_type=jnp.int32) & 1
               ).astype(jnp.uint8)
        fresh_rows = jnp.unpackbits(
            jnp.pad(wb[187:], (0, p * 188 - nfresh)).reshape(p, 188), axis=1)
        out = jnp.concatenate([crc, fresh_rows[:, 8:]], axis=1)
        return out.reshape(-1)[: nfresh * 8]

    a = bench("unpack+crc current", current, w)
    b = bench("unpack+crc rowaligned", rowaligned, w)
    print("rowaligned equal:", bool(jnp.array_equal(a, b)), flush=True)


if __name__ == "__main__" and "--crc" in sys.argv:
    crc_rowunpack_variant()
