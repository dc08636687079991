"""Config-derivation tests: counts and invariants from EN 302 755 / SURVEY §2."""
import pytest

from dvbt2ll_tpu.config import (CodeRate, Constellation, FFTSize, FrameSize,
                                GuardInterval, PilotPattern, T2Config,
                                vv009_config)


def test_vv009_derived_constants():
    cfg = vv009_config()
    assert (cfg.kbch, cfg.nbch, cfg.q_ldpc) == (12432, 12600, 10)
    assert cfg.cell_size == 2025
    assert cfg.stream_cells == 16200
    assert (cfg.n_p2, cfg.c_p2) == (4, 2236)
    assert (cfg.c_data, cfg.n_fc, cfg.c_fc) == (3328, 3266, 2792)
    assert cfg.mapped_cells == 18866
    assert cfg.c_ps == 3409
    assert cfg.guard_samples == 128
    assert cfg.samples_per_frame == 31616
    assert (cfg.n_post, cfg.n_punc) == (1512, 8006)
    assert cfg.l1post_cells == 252
    assert cfg.dummy_cells == 100


@pytest.mark.parametrize("frame_size,rate,kbch,nbch,q", [
    (FrameSize.NORMAL, CodeRate.C1_2, 32208, 32400, 90),
    (FrameSize.NORMAL, CodeRate.C5_6, 53840, 54000, 30),
    (FrameSize.SHORT, CodeRate.C1_3, 5232, 5400, 30),
    (FrameSize.SHORT, CodeRate.C3_5, 9552, 9720, 18),
])
def test_fec_params(frame_size, rate, kbch, nbch, q):
    cfg = T2Config(frame_size=frame_size, code_rate=rate,
                   constellation=Constellation.QPSK,
                   pilot_pattern=PilotPattern.PP1, fec_blocks=1, ti_blocks=1)
    assert (cfg.kbch, cfg.nbch, cfg.q_ldpc) == (kbch, nbch, q)
    # nbch - kbch must equal the BCH parity width
    assert cfg.nbch - cfg.kbch == cfg.bch_parity_bits


def test_cell_counts_consistent():
    """nbch*... -> frame_size -> cell_size chain must divide evenly."""
    for fs in FrameSize:
        for c in Constellation:
            cfg = T2Config(frame_size=fs, constellation=c,
                           code_rate=CodeRate.C1_2,
                           pilot_pattern=PilotPattern.PP1, fec_blocks=1,
                           ti_blocks=1)
            assert cfg.ldpc_frame_bits == cfg.cell_size * cfg.mod_bits
            assert cfg.cell_size % 5 == 0  # time-interleaver row constraint


def test_fc_suppression():
    cfg = vv009_config()  # GI 1/32 + PP7: FC present
    assert cfg.has_fc_symbol
    cfg2 = T2Config(guard_interval=GuardInterval.GI_1_32,
                    pilot_pattern=PilotPattern.PP4)
    assert not cfg2.has_fc_symbol  # 1/32+PP4 suppressed in SISO


def test_invalid_combos_raise():
    with pytest.raises(ValueError):
        T2Config(fft_size=FFTSize.FFT_1K,
                 pilot_pattern=PilotPattern.PP7).validate()
    with pytest.raises(ValueError):
        T2Config(frame_size=FrameSize.NORMAL,
                 code_rate=CodeRate.C1_3).validate()
    with pytest.raises(ValueError):
        T2Config(fec_blocks=2000).validate()  # cells exceed frame capacity


def test_frame_duration_example():
    cfg = vv009_config()
    assert abs(cfg.frame_duration - 31616 / (131e6 / 71.0)) < 1e-12
