"""Streaming executor: overlap correctness and sink integration."""
import numpy as np

from dvbt2ll_tpu import vv009_config
from dvbt2ll_tpu.executor import StreamingExecutor
from dvbt2ll_tpu.io import synthetic_ts
from dvbt2ll_tpu.pipeline import Transmitter


class _ListSink:
    def __init__(self):
        self.chunks = []

    def write(self, iq):
        self.chunks.append(iq.copy())


def test_executor_matches_sequential():
    cfg = vv009_config()
    n_steps = 3
    # batch-1 vv009 is not phase-invariant (12352 % 188 != 0); the executor
    # mechanics under test don't care, so opt out of the streamability guard
    tx_seq = Transmitter(cfg, 1, strict=False, allow_phase_drift=True)
    n = tx_seq.bytes_per_step
    ts = synthetic_ts(n_steps * n, seed=101)
    expected = np.concatenate(
        [tx_seq(ts[i * n:(i + 1) * n]) for i in range(n_steps)])

    tx = Transmitter(cfg, 1, strict=False, allow_phase_drift=True)
    pos = {"o": 0}

    def source(nbytes):
        o = pos["o"]
        pos["o"] += nbytes
        return ts[o : o + nbytes]

    sink = _ListSink()
    stats = StreamingExecutor(tx, source, sink).run(n_steps)
    got = np.concatenate(sink.chunks)
    assert np.array_equal(got, expected)
    assert stats["steps"] == n_steps
    assert stats["sustained_samples_per_second"] > 0


def test_executor_multi_plp_sources():
    """One source callable per PLP stream (the executor's list form) must
    match the sequential multi-PLP chain."""
    from tests.test_multiplp_fef import _mixed_plp_cfg

    cfg = _mixed_plp_cfg()
    n_steps = 2
    tx_seq = Transmitter(cfg, 1, strict=False, allow_phase_drift=True)
    per = tx_seq.bytes_per_step_per_plp
    streams = [synthetic_ts(n_steps * m, seed=110 + k)
               for k, m in enumerate(per)]
    expected = np.concatenate([
        tx_seq([s[i * m:(i + 1) * m] for s, m in zip(streams, per)])
        for i in range(n_steps)])

    tx = Transmitter(cfg, 1, strict=False, allow_phase_drift=True)
    pos = [0] * len(per)

    def make_source(k):
        def source(nbytes):
            o = pos[k]
            pos[k] += nbytes
            return streams[k][o:o + nbytes]
        return source

    sink = _ListSink()
    stats = StreamingExecutor(
        tx, [make_source(k) for k in range(len(per))], sink).run(n_steps)
    assert np.array_equal(np.concatenate(sink.chunks), expected)
    assert stats["steps"] == n_steps


def test_executor_realtime_pacing():
    """run(realtime=True) must hold the air schedule: N steps take at
    least ~N x the batch's frame airtime even when compute is far
    faster (the deployment contract bench_sustained.py 'paced' measures
    on hardware)."""
    import time

    cfg = vv009_config()
    tx = Transmitter(cfg, 1, strict=False, allow_phase_drift=True)
    n = tx.bytes_per_step
    ts = synthetic_ts(6 * n, seed=103)
    pos = {"o": 0}

    def source(nbytes):
        o = pos["o"]
        pos["o"] += nbytes
        return ts[o : o + nbytes]

    ex = StreamingExecutor(tx, source, _ListSink(), realtime=True)
    ex.step()  # compile outside the pacing window
    t0 = time.perf_counter()
    ex.run(5)
    wall = time.perf_counter() - t0
    frame_t = tx.plan.batch_frames * cfg.frame_duration
    assert wall >= 5 * frame_t * 0.9, (wall, frame_t)


def test_executor_emits_fef_parts():
    """For FEF configs the executor's sink stream must equal the
    sequential Transmitter.stream() output (FEF parts inserted after
    every fef_interval-th frame) - previously the executor silently
    dropped FEF parts."""
    import dataclasses

    cfg = dataclasses.replace(vv009_config(), fef_length=4096,
                              fef_interval=2).validate()
    tx_seq = Transmitter(cfg, 1, strict=False, allow_phase_drift=True)
    n = tx_seq.bytes_per_step
    ts = synthetic_ts(4 * n, seed=104)
    expected = np.concatenate(
        [tx_seq.stream(ts[i * n:(i + 1) * n]) for i in range(4)])

    tx = Transmitter(cfg, 1, strict=False, allow_phase_drift=True)
    pos = {"o": 0}

    def source(nbytes):
        o = pos["o"]
        pos["o"] += nbytes
        return ts[o : o + nbytes]

    sink = _ListSink()
    ex = StreamingExecutor(tx, source, sink)
    ex.run(4)
    got = np.concatenate([c.reshape(-1) for c in sink.chunks])
    assert np.array_equal(got, expected)
