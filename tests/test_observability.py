"""Counters, TS validation warnings, and checkpoint/resume."""
import logging

import numpy as np

from dvbt2ll_tpu import vv009_config
from dvbt2ll_tpu.io import synthetic_ts
from dvbt2ll_tpu.observability import TxCounters, check_ts_sync
from dvbt2ll_tpu.pipeline import Transmitter


def test_counters_accumulate():
    cfg = vv009_config()
    tx = Transmitter(cfg, 1, strict=False, allow_phase_drift=True)
    ts = synthetic_ts(2 * tx.bytes_per_step, seed=71)
    tx(ts[: tx.bytes_per_step])
    tx(ts[tx.bytes_per_step :])
    c = tx.counters
    assert c.steps == 2
    assert c.frames == 2
    assert c.samples == 2 * cfg.samples_per_frame
    assert c.ts_bytes == ts.size
    assert c.samples_per_second > 0
    assert c.realtime_margin(cfg.sample_rate) > 0


def test_sync_check_warns(caplog):
    ts = synthetic_ts(188 * 5, seed=72).copy()
    assert check_ts_sync(ts) == 0
    ts[188 * 2] = 0x00  # corrupt one sync byte
    with caplog.at_level(logging.WARNING, logger="dvbt2ll_tpu"):
        assert check_ts_sync(ts) == 1
    assert "Malformed MPEG-TS" in caplog.text


def test_validate_ts_counts_sync_errors():
    """The sync_errors counter must actually CHECK the stream when
    validate_ts=True: clean phase-invariant windows count zero, and a
    corrupted sync byte in a later step's fresh bytes is counted (the
    reference logs per-byte in its work loop,
    lib/bbheaderbch_bb_impl.cc:676,704)."""
    from dvbt2ll_tpu.plan import min_batch_frames

    cfg = vv009_config()
    tx = Transmitter(cfg, min_batch_frames(cfg), validate_ts=True)
    n = tx.bytes_per_step
    ts = synthetic_ts(2 * n, seed=74)
    tx(ts[:n])
    assert tx.counters.sync_errors == 0
    bad = ts[n : 2 * n].copy()
    bad[188] = 0x00  # second packet of the window loses its sync byte
    tx(bad)
    assert tx.counters.sync_errors == 1


def test_validate_ts_drifted_phase_plan():
    """Per-phase plans (start_phases != 0) start their window mid-packet:
    the sync check must scan the plan's actual sync slots, not offset 0
    (a phase=0 scan would count ~24 spurious errors per vv009 window)."""
    cfg = vv009_config()
    tx1 = Transmitter(cfg, 1, strict=False, validate_ts=True)
    n = tx1.bytes_per_step
    ts = synthetic_ts(2 * n, seed=75)
    tx1(ts[:n])
    assert tx1.counters.sync_errors == 0
    phase = tx1.plan.plps[0].bb.next_phase
    assert phase != 0  # vv009 with batch 1 drifts (4695 % 188 == 183)

    tx2 = Transmitter(cfg, 1, strict=False, validate_ts=True,
                      start_phases=phase)
    tx2(ts[n:])  # the clean continuation window counts ZERO errors
    assert tx2.counters.sync_errors == 0

    bad = ts[n:].copy()
    bad[(188 - phase) % 188] = 0x00  # true first sync slot of the window
    tx3 = Transmitter(cfg, 1, strict=False, validate_ts=True,
                      start_phases=phase)
    tx3(bad)
    assert tx3.counters.sync_errors == 1


def test_checkpoint_resume_bit_identical(tmp_path):
    cfg = vv009_config()
    n = None
    tx_a = Transmitter(cfg, 1, strict=False, allow_phase_drift=True)
    ts = synthetic_ts(4 * tx_a.bytes_per_step, seed=73)
    n = tx_a.bytes_per_step
    out_ref = [tx_a(ts[i * n : (i + 1) * n]) for i in range(4)]

    tx_b = Transmitter(cfg, 1, strict=False, allow_phase_drift=True)
    tx_b(ts[:n])
    tx_b(ts[n : 2 * n])
    ckpt = tmp_path / "tx_state.npz"
    tx_b.save(str(ckpt))

    tx_c = Transmitter(cfg, 1, strict=False, allow_phase_drift=True)
    tx_c.restore(str(ckpt))
    out_c = [tx_c(ts[2 * n : 3 * n]), tx_c(ts[3 * n :])]
    assert np.array_equal(out_c[0], out_ref[2])
    assert np.array_equal(out_c[1], out_ref[3])
