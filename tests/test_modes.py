"""Input modes: HIEFF (sync removal) and in-band type B signalling."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dvbt2ll_tpu import pipeline, refmodel
from dvbt2ll_tpu.config import (CodeRate, Constellation, FFTSize, FrameSize,
                                GuardInterval, InBand, InputMode,
                                L1Constellation, PilotPattern, Rotation,
                                T2Config)
from dvbt2ll_tpu.io import synthetic_ts
from dvbt2ll_tpu.pipeline import Transmitter
from dvbt2ll_tpu.plan import build_plan, min_batch_frames


def _base_cfg(**kw):
    base = dict(
        frame_size=FrameSize.SHORT, code_rate=CodeRate.C1_2,
        constellation=Constellation.QPSK, rotation=Rotation.OFF,
        fft_size=FFTSize.FFT_2K, guard_interval=GuardInterval.GI_1_8,
        pilot_pattern=PilotPattern.PP1, fec_blocks=1, ti_blocks=1,
        t2_frames=2, num_data_symbols=8,
        l1_constellation=L1Constellation.BPSK)
    base.update(kw)
    return T2Config(**base).validate()


def _snr(cfg, tx_out, ref):
    err = (np.abs(tx_out - ref) ** 2).sum()
    return 10 * np.log10(
        float((np.abs(ref) ** 2).sum()) / max(float(err), 1e-30))


def test_hieff_bb_stage_matches_oracle():
    cfg = _base_cfg(input_mode=InputMode.HIEFF)
    assert min_batch_frames(cfg) == 17  # 17 * 869 payload = 79 packets
    plan = build_plan(cfg, 17)
    assert plan.ts_bytes_in == 17 * 869 + 79  # payload + dropped syncs
    ts = synthetic_ts(plan.ts_bytes_in, seed=81)
    padded = np.concatenate([np.zeros(187, np.uint8), ts])
    fast = np.asarray(jax.jit(
        lambda x: pipeline.bb_and_fec(plan.plps[0], x))(jnp.asarray(padded)))
    frames, _ = refmodel.bbheader_frames(cfg, ts, 17)
    coded = refmodel.ldpc_encode(cfg, frames)
    assert (fast == coded).all()


def test_hieff_end_to_end():
    cfg = _base_cfg(input_mode=InputMode.HIEFF)
    tx = Transmitter(cfg, 17)
    ts = synthetic_ts(tx.bytes_per_step, seed=82)
    out = tx(ts)
    ref = refmodel.transmit_chain(cfg, ts, 17).reshape(17, -1)
    assert _snr(cfg, out, ref) > 100.0


def test_inband_bb_stage_matches_oracle():
    cfg = _base_cfg(in_band=InBand.ON, fec_blocks=2, ts_rate=4_000_000)
    plan = build_plan(cfg, 2, strict=False)
    # first frame of each T2-frame group is 13 bytes short
    assert plan.ts_bytes_in == 2 * (2 * 869 - 13)
    ts = synthetic_ts(plan.ts_bytes_in, seed=83)
    padded = np.concatenate([np.zeros(187, np.uint8), ts])
    fast = np.asarray(jax.jit(
        lambda x: pipeline.bb_and_fec(plan.plps[0], x))(jnp.asarray(padded)))
    frames, _ = refmodel.bbheader_frames(cfg, ts, 4)
    coded = refmodel.ldpc_encode(cfg, frames)
    assert (fast == coded).all()


def test_inband_end_to_end():
    cfg = _base_cfg(in_band=InBand.ON, fec_blocks=2)
    tx = Transmitter(cfg, 2, strict=False)
    ts = synthetic_ts(tx.bytes_per_step, seed=84)
    out = tx(ts)
    ref = refmodel.transmit_chain(cfg, ts, 2).reshape(2, -1)
    assert _snr(cfg, out, ref) > 100.0


def test_inband_hieff_combined():
    cfg = _base_cfg(in_band=InBand.ON, input_mode=InputMode.HIEFF,
                    fec_blocks=2)
    b = min_batch_frames(cfg)
    plan = build_plan(cfg, b)
    ts = synthetic_ts(plan.ts_bytes_in, seed=85)
    padded = np.concatenate([np.zeros(187, np.uint8), ts])
    fast = np.asarray(jax.jit(
        lambda x: pipeline.bb_and_fec(plan.plps[0], x))(jnp.asarray(padded)))
    frames, _ = refmodel.bbheader_frames(cfg, ts, b * 2)
    coded = refmodel.ldpc_encode(cfg, frames)
    assert (fast == coded).all()


def test_inband_streaming_state():
    """fec_block cadence and TS phase carry across steps: a consumer that
    rebuilds the plan with start_phases=bb.next_phase gets bit-exact frames
    for EVERY step of a non-phase-invariant in-band stream (the drift is
    3476 % 188 == 92 bytes per step)."""
    cfg = _base_cfg(in_band=InBand.ON, fec_blocks=2)
    n_steps = 3
    ts = synthetic_ts(n_steps * 2 * (2 * 869 - 13), seed=86)
    carry = np.zeros(187, np.uint8)
    phase = 0
    outs = []
    for i in range(n_steps):
        plan = build_plan(cfg, 2, strict=False, start_phases=phase)
        bb = plan.plps[0].bb
        assert bb.start_phase == phase and not bb.phase_invariant
        n = plan.ts_bytes_in
        padded = np.concatenate([carry, ts[i * n:(i + 1) * n]])
        step = jax.jit(lambda x, p=plan: pipeline.bb_and_fec(p.plps[0], x))
        outs.append(np.asarray(step(jnp.asarray(padded))))
        carry = padded[-187:]
        phase = bb.next_phase
    fast = np.concatenate(outs)
    frames, _ = refmodel.bbheader_frames(cfg, ts, n_steps * 4)
    coded = refmodel.ldpc_encode(cfg, frames)
    assert (fast == coded).all()  # ALL frames, all steps


def test_normal_phase_drift_plans():
    """Per-phase plans make non-packet-aligned NORMAL-mode streaming
    bit-exact too (every step's headers, SYNCD, and CRC slot positions
    match the continuous oracle)."""
    cfg = _base_cfg()  # 869 payload bytes/frame; 869 % 188 = 117 drift
    n_steps = 4
    ts = synthetic_ts(n_steps * 869, seed=87)
    carry = np.zeros(187, np.uint8)
    phase = 0
    outs = []
    for i in range(n_steps):
        plan = build_plan(cfg, 1, strict=False, start_phases=phase)
        bb = plan.plps[0].bb
        padded = np.concatenate([carry, ts[i * 869:(i + 1) * 869]])
        step = jax.jit(lambda x, p=plan: pipeline.bb_and_fec(p.plps[0], x))
        outs.append(np.asarray(step(jnp.asarray(padded))))
        carry = padded[-187:]
        phase = bb.next_phase
    fast = np.concatenate(outs)
    frames, _ = refmodel.bbheader_frames(cfg, ts, n_steps)
    coded = refmodel.ldpc_encode(cfg, frames)
    assert (fast == coded).all()
