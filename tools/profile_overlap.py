"""A/B: StreamingExecutor enqueue-before-drain vs sequential drain.

Measures whether enqueueing step N on the device BEFORE the blocking
device->host fetch of step N-1 (executor.py::StreamingExecutor.step)
actually buys throughput over the naive order (fetch each step's IQ as
soon as it is enqueued).  Both arms run the same Transmitter, the same
pre-generated TS windows, and fetch every step's output to the host
(the sink work the reference's downstream blocks do on their own GR
thread, SURVEY.md section 2.3).

Usage: python tools/profile_overlap.py [batch] [steps] [reps]
Writes the table BENCH.md "Executor overlap" cites.
"""
import statistics
import sys
import time

from _common import bench, fence  # noqa: F401  (adds repo root to sys.path)

import numpy as np

from dvbt2ll_tpu.config import vv009_config
from dvbt2ll_tpu.executor import StreamingExecutor
from dvbt2ll_tpu.io import synthetic_ts
from dvbt2ll_tpu.pipeline import Transmitter


class _CountSink:
    def __init__(self):
        self.samples = 0

    def write(self, iq):
        # touch the host buffer like a real sink would
        self.samples += iq.size


def _make_source(tx, n_steps):
    n = tx.bytes_per_step
    blocks = [synthetic_ts(n, seed=s) for s in range(4)]
    state = {"i": 0}

    def src(nbytes):
        b = blocks[state["i"] % 4]
        state["i"] += 1
        return b

    return src


def run_overlapped(tx, n_steps):
    ex = StreamingExecutor(tx, source=_make_source(tx, n_steps),
                           sink=_CountSink())
    t0 = time.perf_counter()
    stats = ex.run(n_steps)
    return time.perf_counter() - t0


def run_sequential(tx, n_steps):
    src = _make_source(tx, n_steps)
    sink = _CountSink()
    t0 = time.perf_counter()
    for _ in range(n_steps):
        iq = tx.step_device(src(tx.bytes_per_step))
        h = np.asarray(iq)  # blocking fetch immediately after enqueue
        sink.write(h.reshape(h.shape[0], -1).view(np.complex64))
    return time.perf_counter() - t0


def main():
    # modest defaults: every step fetches batch*31616 c64 samples to the
    # host, and through the axon tunnel that transfer dominates wall time
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cfg = vv009_config()
    tx = Transmitter(cfg, batch, strict=False, allow_phase_drift=True)
    spf = cfg.samples_per_frame

    # warm both paths (compile once; same jitted step either way)
    run_sequential(tx, 2)
    run_overlapped(tx, 2)

    seq, ovl = [], []
    for _ in range(reps):
        seq.append(run_sequential(tx, steps))
        ovl.append(run_overlapped(tx, steps))
    rate = lambda ts: [steps * batch * spf / t / 1e6 for t in ts]
    rs, ro = rate(seq), rate(ovl)
    print(f"batch={batch} steps={steps} reps={reps}")
    print(f"sequential drain : {statistics.median(rs):8.1f} Msamp/s "
          f"(min {min(rs):.1f}, max {max(rs):.1f})")
    print(f"enqueue-first    : {statistics.median(ro):8.1f} Msamp/s "
          f"(min {min(ro):.1f}, max {max(ro):.1f})")
    print(f"overlap gain     : {statistics.median(ro)/statistics.median(rs):8.2f}x")


if __name__ == "__main__":
    main()
