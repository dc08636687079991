"""Speed-of-light (roofline) model of the transmit chain on TPU v5e.

Counts the UNAVOIDABLE HBM traffic of each pipeline stage - every array a
stage must materialize because the next op is a gather/FFT/reshape that
cannot fuse through it - and converts it to a samples/s ceiling at the
chip's HBM bandwidth.  Also accounts the IFFT FLOPs against the compute
peak to show which bound binds.  Pure host arithmetic: no device needed.

Chip model (TPU v5 lite, public figures):
  HBM bandwidth   819 GB/s
  bf16 MXU peak   197 TFLOP/s   (f32 ~1/4 of that)
  VMEM            ~128 MB

Usage: python tools/roofline.py [batch] [config ...]
"""
import sys

from _common import bench  # noqa: F401  (adds repo root to sys.path)

from bench import _named_config
from dvbt2ll_tpu.plan import build_plan

HBM_GBPS = 819e9
F32_FLOPS = 197e12 / 4  # MXU f32-equivalent peak


def stage_traffic(cfg, plan, batch):
    """[(stage, bytes, note)] of unavoidable HBM reads+writes per step."""
    f = plan.fec_frames
    pp = plan.plps[0]
    samples = batch * cfg.samples_per_frame
    bits = f * cfg.ldpc_frame_bits          # u8 bit-planes
    cells = f * cfg.cell_size * 8           # complex64
    grid = batch * cfg.num_symbols * cfg.fft_points * 8
    out = samples * 8                       # c64 (== f32 I/Q planes)

    t = []
    t.append(("bb+BCH+LDPC", pp.ts_bytes_in            # read TS bytes
              + f * cfg.nbch                           # stream bits materialized
                                                       # once (gather-free front
                                                       # end fuses the rest)
              + bits,                                  # write frame bits
              "in: TS u8; out: (F, frame_bits) u8"))
    t.append(("bit-ilv + QAM map", bits                # gather read
              + cells,                                 # write cells
              "gather src + c64 cells"))
    t.append(("frame build (1 gather)", cells          # gather read
              + grid,                                  # write grids (+pilots
                                                       # fused)
              "grid_src gather + pilot add"))
    t.append(("IFFT", 2 * grid,                        # read+write (in-place
                                                       # FFT still streams both
                                                       # ways)
              "per-symbol c64 FFT"))
    t.append(("GI + P1 + IQ out", grid + out,          # read time domain, write
                                                       # final stream
              "cyclic-prefix concat + f32 planes"))
    return t, samples


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    names = sys.argv[2:] or ["vv009_4kshort", "8k_normal", "32k_extended"]
    for name in names:
        cfg = _named_config(name)
        # bench.py protocol batches: 256 for the 4K/8K class, 128 at 32K
        b = batch if cfg.fft_points <= 8192 else min(batch, 128)
        plan = build_plan(cfg, b, strict=False)
        rows, samples = stage_traffic(cfg, plan, b)
        total = sum(r[1] for r in rows)
        # IFFT compute: 5 N log2 N real FLOPs per c64 transform
        import math
        n = cfg.fft_points
        fft_flops = 5 * n * math.log2(n) * b * cfg.num_symbols
        fft_t_bw = 2 * b * cfg.num_symbols * n * 8 / HBM_GBPS
        fft_t_fl = fft_flops / F32_FLOPS
        print(f"\n== {name} (batch {b}, {samples/1e6:.2f} Msamples/step) ==")
        for stage, byt, note in rows:
            t_us = byt / HBM_GBPS * 1e6
            print(f"  {stage:24s} {byt/1e6:9.2f} MB  {t_us:8.1f} us   {note}")
        sol = samples / (total / HBM_GBPS)
        print(f"  {'TOTAL':24s} {total/1e6:9.2f} MB  "
              f"{total/HBM_GBPS*1e6:8.1f} us")
        print(f"  IFFT bound: bandwidth {fft_t_bw*1e6:.1f} us vs compute "
              f"{fft_t_fl*1e6:.1f} us ({fft_flops/1e9:.2f} GFLOP) -> "
              f"{'BANDWIDTH' if fft_t_bw > fft_t_fl else 'COMPUTE'}-bound")
        print(f"  speed-of-light: {sol/1e6:,.0f} Msamples/s/chip "
              f"at {HBM_GBPS/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
