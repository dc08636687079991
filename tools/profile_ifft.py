"""A/B perf probe: XLA's native ifft vs a 64x64 four-step matmul IFFT.

Result on TPU v5e: parity (1.57 vs 1.59 ms for 1792x4096) - XLA's FFT
already runs at MXU-class speed, so the native ifft stays in the
pipeline.  NOTE: the four-step twiddle composition here was never made
bit-exact (unnecessary once runtime parity ruled it out); this script is
a timing probe, not a reference implementation."""
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


_chk = None

def fence(x):
    global _chk
    if _chk is None:
        _chk = jax.jit(lambda v: jnp.sum(jnp.abs(jnp.ravel(v)[:8]))
                       .astype(jnp.float32))
    return float(_chk(x))


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
    n = 4096
    r = 64  # n = r*r
    b = 1792  # 256 frames x 7 symbols
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, n, 2)).astype(np.float32))

    # four-step IFFT: x (b, r, r) -> W_r along axis2 -> twiddle -> transpose
    # -> W_r along axis2 -> flatten.  IDFT matrix W[j,k] = exp(2i pi jk / r)/1
    jk = np.outer(np.arange(r), np.arange(r))
    W = np.exp(2j * np.pi * jk / r).astype(np.complex64)          # (r, r)
    tw = np.exp(2j * np.pi
                * np.outer(np.arange(r), np.arange(r)) / n).astype(
                    np.complex64)                                  # (r, r)

    def ifft_native(vp):
        v = jax.lax.complex(vp[..., 0], vp[..., 1])
        y = jnp.fft.ifft(v, axis=-1)
        return jnp.stack([jnp.real(y), jnp.imag(y)], axis=-1)

    def ifft_matmul(vp):
        v = jax.lax.complex(vp[..., 0], vp[..., 1])
        # v (b, n): index j = j1*r + j2 -> out k = k1 + r*k2
        y = v.reshape(b, r, r)                 # [j1, j2]
        y = jnp.einsum("bjk,kl->bjl", y, W)    # IDFT over j2 -> k1
        y = y * tw.T[None]                     # twiddle(j1, k1)... tw[k1, j1]
        y = jnp.einsum("bjl,jm->bml", y, W)    # IDFT over j1 -> k2
        # out[k1 + r*k2] = y[k2?]: y is [m=k2, l=k1] -> flatten k2-major
        y = y.reshape(b, n) / n
        return jnp.stack([jnp.real(y), jnp.imag(y)], axis=-1)

    a = bench("xla ifft", ifft_native, x)
    c = bench("matmul 4-step ifft", ifft_matmul, x)
    ref = np.asarray(a)
    got = np.asarray(c)
    err = np.abs(ref - got).max() / np.abs(ref).max()
    print("rel err:", err, flush=True)


if __name__ == "__main__":
    main()
