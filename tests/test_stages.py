"""Per-stage tests: composed fast-path stages vs the sequential oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvbt2ll_tpu import pipeline, refmodel
from dvbt2ll_tpu.config import (CodeRate, Constellation, FrameSize,
                                PilotPattern, Rotation, T2Config,
                                vv009_config)
from dvbt2ll_tpu.io import synthetic_ts
from dvbt2ll_tpu.plan import build_plan
from dvbt2ll_tpu.tables.mapper import bit_permutation
from dvbt2ll_tpu.tables.constellations import qam_lut


@pytest.fixture(scope="module")
def vv009_plan():
    cfg = vv009_config()
    return build_plan(cfg, 1, strict=False)


def test_bb_and_fec_matches_oracle(vv009_plan):
    plan = vv009_plan
    cfg = plan.cfg
    ts = synthetic_ts(plan.ts_bytes_in, seed=7)
    padded = np.concatenate([np.zeros(187, np.uint8), ts])
    fast = np.asarray(jax.jit(
        lambda x: pipeline.bb_and_fec(plan.plps[0], x))(jnp.asarray(padded)))
    frames, _ = refmodel.bbheader_frames(cfg, ts, plan.fec_frames)
    coded = refmodel.ldpc_encode(cfg, frames)
    assert (fast == coded).all()


def _stream_aligned_cfg():
    """A config whose per-T2-frame TS byte count is a multiple of 188, so a
    1-frame batch can stream (min_batch_frames == 1): short C1_3 QPSK has
    df_bytes=644 and 47 FEC blocks give 47*644 = 161*188."""
    from dvbt2ll_tpu.config import (FFTSize, GuardInterval, L1Constellation)
    return T2Config(
        frame_size=FrameSize.SHORT, code_rate=CodeRate.C1_3,
        constellation=Constellation.QPSK, rotation=Rotation.OFF,
        fft_size=FFTSize.FFT_1K, guard_interval=GuardInterval.GI_1_32,
        pilot_pattern=PilotPattern.PP1,
        l1_constellation=L1Constellation.BPSK,
        fec_blocks=47, ti_blocks=3, t2_frames=2, num_data_symbols=492,
    ).validate()


def test_bbheader_stream_state_across_steps():
    """The 187-byte carry window must reproduce the oracle's sequential
    CRC-8/count state across jit step boundaries (the only data-dependent
    cross-step state; SURVEY.md section 3.3)."""
    cfg = _stream_aligned_cfg()
    from dvbt2ll_tpu.plan import min_batch_frames
    assert min_batch_frames(cfg) == 1
    plan = build_plan(cfg, 1)
    step = jax.jit(lambda x: pipeline.bb_and_fec(plan.plps[0], x))

    n = plan.ts_bytes_in
    ts = synthetic_ts(3 * n, seed=8)
    carry = np.zeros(187, np.uint8)
    fast = []
    for i in range(3):
        padded = np.concatenate([carry, ts[i * n:(i + 1) * n]])
        fast.append(np.asarray(step(jnp.asarray(padded))))
        carry = padded[-187:]
    fast = np.concatenate(fast, axis=0)

    frames, _ = refmodel.bbheader_frames(cfg, ts, 3 * plan.fec_frames)
    coded = refmodel.ldpc_encode(cfg, frames)
    assert (fast == coded).all()


@pytest.mark.parametrize("constellation,rate,frame_size", [
    (Constellation.QPSK, CodeRate.C1_2, FrameSize.SHORT),
    (Constellation.QPSK, CodeRate.C1_3, FrameSize.SHORT),   # parity ilv on
    (Constellation.QAM16, CodeRate.C3_5, FrameSize.NORMAL),  # special mux
    (Constellation.QAM64, CodeRate.C2_3, FrameSize.SHORT),
    (Constellation.QAM256, CodeRate.C4_5, FrameSize.SHORT),  # Nc = mod
    (Constellation.QAM256, CodeRate.C2_3, FrameSize.NORMAL),  # special mux
])
def test_mapper_permutation_vs_oracle(constellation, rate, frame_size):
    cfg = T2Config(frame_size=frame_size, code_rate=rate,
                   constellation=constellation, rotation=Rotation.ON,
                   pilot_pattern=PilotPattern.PP1, fec_blocks=1, ti_blocks=1)
    rng = np.random.default_rng(9)
    frame = rng.integers(0, 2, cfg.ldpc_frame_bits).astype(np.uint8)
    ref_cells = refmodel.interleave_and_map(cfg, frame[None])[0]

    perm = bit_permutation(cfg)
    assert sorted(perm) == list(range(cfg.ldpc_frame_bits))
    bits = frame[perm].reshape(cfg.cell_size, cfg.mod_bits)
    words = bits @ (1 << np.arange(cfg.mod_bits - 1, -1, -1))
    lut = qam_lut(constellation, True)
    fast = lut[words]
    delayed = lut[np.roll(words, 1)]
    fast = fast.real + 1j * delayed.imag
    assert np.abs(fast - ref_cells).max() < 1e-6


def test_build_frames_matches_oracle(vv009_plan):
    plan = vv009_plan
    cfg = plan.cfg
    rng = np.random.default_rng(10)
    cells = (rng.standard_normal((cfg.fec_blocks, cfg.cell_size, 2))
             .astype(np.float32).view(np.complex64)[..., 0])
    grids = np.asarray(jax.jit(
        lambda x: pipeline.build_frames(
            plan, x.reshape(1, -1), jnp.int32(0)))(
            jnp.asarray(cells)))[0]
    mapped = refmodel.frame_map(cfg, cells.reshape(-1), 0)
    # reconstruct the oracle's grid: symbol-major assembly with pilots
    ref_iq = refmodel.ofdm_modulate(cfg, mapped)
    fast_iq = np.asarray(jax.jit(
        lambda g: pipeline.modulate(plan, g))(jnp.asarray(grids)[None]))[0]
    assert np.abs(fast_iq - ref_iq).max() < 2e-5


def test_end_to_end_vv009_snr():
    cfg = vv009_config()
    from dvbt2ll_tpu.pipeline import Transmitter
    B = 2
    tx = Transmitter(cfg, B, strict=False)
    ts = synthetic_ts(tx.bytes_per_step, seed=11)
    out = tx(ts)
    ref = refmodel.transmit_chain(cfg, ts, B).reshape(B, -1)
    err = ((np.abs(out - ref)) ** 2).sum()
    snr = 10 * np.log10(float((np.abs(ref) ** 2).sum()) / max(float(err), 1e-30))
    assert snr > 100.0, snr


def test_frame_idx_wraps_l1post():
    """L1-post must differ between frame indices and wrap at t2_frames."""
    cfg = vv009_config()
    plan = build_plan(cfg, 1, strict=False)
    rng = np.random.default_rng(12)
    cells = (rng.standard_normal((cfg.fec_blocks, cfg.cell_size, 2))
             .astype(np.float32).view(np.complex64)[..., 0])
    f = jax.jit(lambda x, i: pipeline.build_frames(
        plan, x.reshape(1, -1), i))
    g0 = np.asarray(f(jnp.asarray(cells), jnp.int32(0)))
    g1 = np.asarray(f(jnp.asarray(cells), jnp.int32(1)))
    g2 = np.asarray(f(jnp.asarray(cells), jnp.int32(cfg.t2_frames)))
    assert not np.array_equal(g0, g1)
    assert np.array_equal(g0, g2)
