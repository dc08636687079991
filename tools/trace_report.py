"""Capture an xprof trace of N transmit steps and print the device-op
cost ranking.  The per-op histogram is how the chain was verified to be
at its op-level plateau (no single fusion dominates; the cost is spread
across ~30 fusions of 0.07-0.2 ms at batch 256).

Usage: python tools/trace_report.py [batch] [steps] [config]
  config: vv009_4kshort (default) | 8k_normal | 32k_extended | ...
"""
import collections
import glob
import gzip
import json
import sys
import tempfile

from _common import fence  # noqa: F401  (adds repo root to sys.path)

import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from bench import _named_config
    from dvbt2ll_tpu.io import synthetic_ts
    from dvbt2ll_tpu.observability import profile_trace
    from dvbt2ll_tpu.pipeline import Transmitter

    cfg = _named_config(sys.argv[3] if len(sys.argv) > 3
                        else "vv009_4kshort")
    # profiling repeats the same step; phase continuity is irrelevant here
    tx = Transmitter(cfg, batch, strict=False,
                     allow_phase_drift=True)
    ts = synthetic_ts(tx.bytes_per_step)
    tx(ts)  # compile outside the trace
    logdir = tempfile.mkdtemp(prefix="dvbt2ll_xprof_")
    with profile_trace(logdir):
        for _ in range(steps):
            tx(ts)

    f = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    names = {e["pid"]: e["args"].get("name", "")
             for e in data["traceEvents"]
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    agg = collections.Counter()
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and "TPU" in names.get(e.get("pid"), ""):
            name = e.get("name", "?")
            if name.startswith("jit_"):  # whole-program parent region
                continue
            agg[name[:64]] += e.get("dur", 0)
    total = sum(agg.values())
    print(f"trace: {f}")
    print(f"device op time: {total/steps/1e3:.2f} ms/step "
          f"(batch {batch}, {steps} steps)")
    for k, v in agg.most_common(25):
        print(f"{v/steps/1e3:8.3f} ms/step  {100*v/total:5.1f}%  {k}")


if __name__ == "__main__":
    main()
