"""On-TPU correctness lane: run the COMPILED chain on the real chip.

CI (tests/) verifies everything on the CPU backend — including the
Pallas LDPC kernel, but only in interpret mode.  This runnable closes
the one correctness surface CI never touches: the Mosaic-compiled
kernel plus the full fused chain executing on TPU hardware.  For each
config it asserts

  * e2e IQ SNR > 100 dB against the PINNED reference-binary golden
    (tests/golden_ref/<name>.npz — vectors from the unmodified
    reference sources, tools/gen_reference_golden.py), and
  * Pallas-vs-XLA bit-identity of the LDPC frame bits ON DEVICE (the
    compiled kernel vs the XLA slice schedule, same input window).

The same checks run as pytest under ``-m tpu`` (tests/test_tpu_hw.py);
the default test run deselects them so the suite stays CPU-fast.
Match: the reference's only integration artifact is its hardware
flowgraph (apps/vv009-4kshort.grc) — this is the TPU equivalent.

Usage: python tools/verify_tpu.py [name ...]   (default: vv009 + 8k)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_NAMES = ["vv009_4kshort", "8k_normal"]
# `--all`: the full hardware-verified matrix (BENCH.md "On-TPU
# verification lane") - kept out of DEFAULT_NAMES because the 32K
# compile takes 10-20 min through the dev tunnel on a cold cache
ALL_NAMES = DEFAULT_NAMES + ["inband_2k", "1k_pp4", "qpsk_short_c13",
                             "hieff_4k", "32k_papr_tr",
                             "t2lite_4k", "t2lite_8k_t2gi_miso", "v121_4k",
                             "t2lite_16k_t2gi", "eq_2k_5mhz"]


def _jax_tpu():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    devs = [d for d in jax.devices() if d.platform not in ("cpu",)]
    if not devs:
        raise SystemExit("no TPU device attached")
    return jax, devs[0]


def verify_on_tpu(name: str) -> dict:
    """Run one config's full chain on the TPU; returns the measured
    figures (raises AssertionError on any correctness failure)."""
    import numpy as np

    jax, dev = _jax_tpu()
    import jax.numpy as jnp

    from bench import _named_config
    from dvbt2ll_tpu.io import synthetic_ts
    from dvbt2ll_tpu.pipeline import Transmitter, bb_and_fec

    golden = os.path.join(REPO, "tests", "golden_ref", f"{name}.npz")
    if not os.path.exists(golden):
        raise FileNotFoundError(
            f"{golden} missing - run tools/gen_reference_golden.py {name}")
    g = np.load(golden)
    cfg = _named_config(name)
    nframes = int(g["nframes"])
    ts = synthetic_ts(int(g["ts_bytes"]), seed=int(g["ts_seed"]))
    ref_iq = g["stage5_iq"].reshape(nframes, cfg.samples_per_frame)
    ref_bits = np.unpackbits(g["stage2_bits_packed"])[
        : int(g["stage2_count"])].reshape(-1, cfg.ldpc_frame_bits)

    with jax.default_device(dev):
        # --- full chain, compiled Pallas LDPC kernel ------------------
        tx = Transmitter(cfg, nframes, strict=False, use_pallas=True)
        assert tx.plan.plps[0].use_pallas
        iq = tx(ts)  # float32 planes cross the tunnel; complex on host
        err = float((np.abs(iq - ref_iq) ** 2).sum())
        snr = 10 * np.log10(float((np.abs(ref_iq) ** 2).sum())
                            / max(err, 1e-30))
        assert snr > 100, f"{name}: on-TPU IQ SNR {snr:.1f} dB vs golden"

        # --- Pallas vs XLA LDPC parity, both compiled on device -------
        pp = tx.plan.plps[0]
        window = jnp.asarray(np.concatenate([np.zeros(187, np.uint8), ts]))

        def fec(use_pallas):
            pp.use_pallas = use_pallas
            try:
                return np.asarray(jax.jit(
                    lambda w: bb_and_fec(pp, w))(window))
            finally:
                pp.use_pallas = True
        bits_pallas, bits_xla = fec(True), fec(False)
        assert np.array_equal(bits_pallas, bits_xla), (
            f"{name}: compiled Pallas LDPC differs from the XLA schedule")
        assert np.array_equal(bits_pallas, ref_bits), (
            f"{name}: on-TPU FEC bits differ from the reference golden")

    return {"name": name, "device": str(dev), "frames": nframes,
            "snr_db": round(snr, 1), "fec_bits": int(ref_bits.size),
            "pallas_xla_bit_identical": True}


def main():
    import json
    names = sys.argv[1:] or DEFAULT_NAMES
    if names == ["--all"]:
        names = ALL_NAMES
    for name in names:
        r = verify_on_tpu(name)
        print(json.dumps(r), flush=True)
    print(f"verify_tpu OK: {len(names)} config(s)")


if __name__ == "__main__":
    main()
