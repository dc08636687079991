"""Multi-PLP frames and FEF insertion (BASELINE.json config 4)."""
import dataclasses

import numpy as np
import pytest

from dvbt2ll_tpu import PLPConfig, refmodel
from dvbt2ll_tpu.config import (CodeRate, Constellation, FFTSize, FrameSize,
                                GuardInterval, PilotPattern, Rotation,
                                T2Config, vv009_config)
from dvbt2ll_tpu.io import synthetic_ts
from dvbt2ll_tpu.pipeline import Transmitter


def _mixed_plp_cfg(**kw):
    """Two type-1 data PLPs with different code rates and constellations."""
    return T2Config(
        frame_size=FrameSize.SHORT, code_rate=CodeRate.C4_5,
        constellation=Constellation.QAM256, rotation=Rotation.ON,
        fft_size=FFTSize.FFT_4K, guard_interval=GuardInterval.GI_1_32,
        pilot_pattern=PilotPattern.PP7,
        plps=(
            PLPConfig(plp_id=0, code_rate=CodeRate.C4_5,
                      constellation=Constellation.QAM256,
                      rotation=Rotation.ON, frame_size=FrameSize.SHORT,
                      fec_blocks=4, ti_blocks=2),
            PLPConfig(plp_id=1, code_rate=CodeRate.C1_2,
                      constellation=Constellation.QAM16,
                      rotation=Rotation.OFF, frame_size=FrameSize.SHORT,
                      fec_blocks=2, ti_blocks=1),
        ),
        fec_blocks=4, ti_blocks=2, t2_frames=2, num_data_symbols=3,
        **kw).validate()


def test_single_plp_tuple_is_degenerate():
    """plps=(one PLPConfig matching the top-level fields,) must produce
    bit-identical output to the implicit single-PLP config."""
    base = vv009_config()
    explicit = dataclasses.replace(base, plps=(
        PLPConfig(plp_id=0, code_rate=base.code_rate,
                  constellation=base.constellation, rotation=base.rotation,
                  frame_size=base.frame_size, fec_blocks=base.fec_blocks,
                  ti_blocks=base.ti_blocks),)).validate()
    assert explicit.ksig_post == base.ksig_post == 350
    tx_a = Transmitter(base, 1, strict=False)
    tx_b = Transmitter(explicit, 1, strict=False)
    ts = synthetic_ts(tx_a.bytes_per_step, seed=61)
    assert np.array_equal(tx_a(ts), tx_b([ts]))


def test_multi_plp_matches_oracle():
    cfg = _mixed_plp_cfg()
    assert cfg.num_plp == 2
    tx = Transmitter(cfg, 1, strict=False)
    streams = [synthetic_ts(n, seed=62 + i)
               for i, n in enumerate(tx.bytes_per_step_per_plp)]
    out = tx(streams)
    ref = refmodel.transmit_chain(cfg, streams, 1).reshape(1, -1)
    err = (np.abs(out - ref) ** 2).sum()
    snr = 10 * np.log10(float((np.abs(ref) ** 2).sum()) / max(float(err), 1e-30))
    assert snr > 100.0, snr


def test_multi_plp_l1_sizes():
    cfg = _mixed_plp_cfg()
    assert cfg.ksig_post == 350 + 137
    assert cfg.plp_starts == (0, cfg.plp_configs[0].stream_cells)
    assert (cfg.total_stream_cells
            == 4 * 2025 + 2 * 4050)


def _typed_plp_cfg(sub_slices=2, **kw):
    """Common PLP (type 0) + one type-1 + two sub-sliced type-2 PLPs
    (EN 302 755 sections 8.3.1 / 8.3.6.3)."""
    return T2Config(
        frame_size=FrameSize.SHORT, code_rate=CodeRate.C4_5,
        constellation=Constellation.QAM256, rotation=Rotation.ON,
        fft_size=FFTSize.FFT_4K, guard_interval=GuardInterval.GI_1_32,
        pilot_pattern=PilotPattern.PP7, sub_slices=sub_slices,
        plps=(
            PLPConfig(plp_id=0, plp_type=0, code_rate=CodeRate.C1_2,
                      constellation=Constellation.QAM16,
                      rotation=Rotation.OFF, frame_size=FrameSize.SHORT,
                      fec_blocks=1, ti_blocks=1),
            PLPConfig(plp_id=1, plp_type=1, code_rate=CodeRate.C4_5,
                      constellation=Constellation.QAM256,
                      rotation=Rotation.ON, frame_size=FrameSize.SHORT,
                      fec_blocks=2, ti_blocks=1),
            PLPConfig(plp_id=2, plp_type=2, code_rate=CodeRate.C1_2,
                      constellation=Constellation.QAM16,
                      rotation=Rotation.OFF, frame_size=FrameSize.SHORT,
                      fec_blocks=2, ti_blocks=1),
            PLPConfig(plp_id=3, plp_type=2, code_rate=CodeRate.C3_5,
                      constellation=Constellation.QAM16,
                      rotation=Rotation.OFF, frame_size=FrameSize.SHORT,
                      fec_blocks=1, ti_blocks=1),
        ),
        fec_blocks=4, ti_blocks=2, t2_frames=2, num_data_symbols=8,
        **kw).validate()


def test_common_and_type2_plps_match_oracle():
    """Type-0 + type-1 + sub-sliced type-2 frame: fast path vs oracle
    (the two sides derive the section 8.3.6 frame order independently)."""
    cfg = _typed_plp_cfg()
    tx = Transmitter(cfg, 1, strict=False)
    streams = [synthetic_ts(n, seed=71 + i)
               for i, n in enumerate(tx.bytes_per_step_per_plp)]
    out = tx(streams)
    ref = refmodel.transmit_chain(cfg, streams, 1).reshape(1, -1)
    err = (np.abs(out - ref) ** 2).sum()
    snr = 10 * np.log10(float((np.abs(ref) ** 2).sum())
                        / max(float(err), 1e-30))
    assert snr > 100.0, snr


def test_sub_slicing_changes_frame_layout():
    """sub_slices=2 must interleave the type-2 payload differently from
    sub_slices=1 while leaving the common/type-1 region identical."""
    a = Transmitter(_typed_plp_cfg(sub_slices=1), 1, strict=False)
    b = Transmitter(_typed_plp_cfg(sub_slices=2), 1, strict=False)
    ga = a.plan.grid_src
    gb = b.plan.grid_src
    assert not np.array_equal(ga, gb)
    # common + type-1 cells keep their addresses: positions whose source
    # lies below type_2_start's seq index are identical
    cfg = a.cfg
    from dvbt2ll_tpu.config import N_L1PRE_CELLS
    lim = N_L1PRE_CELLS + cfg.l1post_cells + cfg.type_2_start
    mask = (ga >= 0) & (ga < lim)
    assert np.array_equal(ga[mask], gb[mask])


def test_typed_plp_l1_fields():
    cfg = _typed_plp_cfg()
    from dvbt2ll_tpu.tables.l1 import l1post_fields
    f = {name: (v, w) for name, v, w in l1post_fields(cfg, 0)}
    assert f["sub_slices_per_frame"] == (2, 15)
    assert f["type_2_start"][0] == cfg.type_2_start == (
        cfg.plp_configs[0].stream_cells + cfg.plp_configs[1].stream_cells)
    total2 = (cfg.plp_configs[2].stream_cells
              + cfg.plp_configs[3].stream_cells)
    assert f["sub_slice_interval"] == (total2 // 2, 22)
    # PLP_START of the second type-2 PLP = type_2_start + first type-2
    # PLP's sub-slice size
    ss2 = cfg.plp_configs[2].stream_cells // 2
    assert cfg.plp_frame_starts == (
        0, cfg.plp_configs[0].stream_cells, cfg.type_2_start,
        cfg.type_2_start + ss2)
    # the dynamic loop signals plp_frame_starts
    starts = [v for name, v, w in l1post_fields(cfg, 0)
              if name == "plp_start"]
    assert tuple(starts) == cfg.plp_frame_starts
    types = [v for name, v, w in l1post_fields(cfg, 0)
             if name == "plp_type"]
    assert types == [0, 1, 2, 2]


def test_typed_plp_validation():
    import pytest as _pytest
    with _pytest.raises(ValueError, match="ordered"):
        _typed_plp_cfg_unsorted()
    with _pytest.raises(ValueError, match="type-2"):
        _mixed_plp_cfg(sub_slices=2)   # no type-2 PLPs
    with _pytest.raises(ValueError, match="sub-slices"):
        _typed_plp_cfg(sub_slices=4)   # 4050 cells not /4
    with _pytest.raises(ValueError, match="common"):
        T2Config(plps=(PLPConfig(plp_id=0, plp_type=0),),
                 num_data_symbols=3).validate()


def _typed_plp_cfg_unsorted():
    return T2Config(
        frame_size=FrameSize.SHORT,
        fft_size=FFTSize.FFT_4K, guard_interval=GuardInterval.GI_1_32,
        pilot_pattern=PilotPattern.PP7,
        plps=(
            PLPConfig(plp_id=0, plp_type=1, fec_blocks=2, ti_blocks=1),
            PLPConfig(plp_id=1, plp_type=0, fec_blocks=1, ti_blocks=1,
                      code_rate=CodeRate.C1_2,
                      constellation=Constellation.QPSK,
                      rotation=Rotation.OFF),
        ),
        fec_blocks=4, ti_blocks=2, t2_frames=2,
        num_data_symbols=3).validate()


def test_fef_insertion():
    cfg = dataclasses.replace(
        vv009_config(), fef_length=4096, fef_type=0,
        fef_interval=2).validate()
    tx = Transmitter(cfg, 2, strict=False)
    ts = synthetic_ts(tx.bytes_per_step, seed=63)
    out = tx.stream(ts)
    spf = cfg.samples_per_frame
    # frames 0,1 then one FEF part after frame_idx 1
    assert out.size == 2 * spf + 4096
    fef = out[2 * spf:]
    # FEF part: its own P1 then nulls
    assert np.abs(fef[:2048]).max() > 0
    assert np.abs(fef[2048:]).max() == 0
    # the FEF P1 differs from the T2 P1 (different S1/S2 signalling)
    assert not np.allclose(fef[:2048], out[:2048])


def test_fef_mixed_bit_changes_t2_p1():
    base = vv009_config()
    mixed = dataclasses.replace(base, fef_length=4096,
                                fef_interval=2).validate()
    from dvbt2ll_tpu.tables.pilots import p1_waveform
    assert not np.allclose(p1_waveform(base), p1_waveform(mixed))


def test_fef_l1_signalling_fields():
    from dvbt2ll_tpu.tables.l1 import l1post_fields
    cfg = dataclasses.replace(vv009_config(), fef_length=100000,
                              fef_interval=1,
                              t2_frames=2).validate()
    fields = dict((n, (v, w)) for n, v, w in l1post_fields(cfg, 0))
    assert fields["fef_type"] == (0, 4)
    assert fields["fef_length"] == (100000 & 0x3FFFFF, 22)
    assert fields["fef_interval"] == (1, 8)
    assert cfg.ksig_post == 350 + 34


def test_stream_window_matches_stream():
    """stream_window (pre-carried windows, e.g. the native ingest ring)
    must emit the same FEF-bearing stream as stream() fed fresh bytes -
    the --stdin app path goes through it."""
    cfg = dataclasses.replace(
        vv009_config(), fef_length=4096, fef_type=0,
        fef_interval=2).validate()
    from dvbt2ll_tpu.plan import min_batch_frames

    b = min_batch_frames(cfg)    # phase-invariant: streamable across steps
    tx_a = Transmitter(cfg, b)
    tx_b = Transmitter(cfg, b)
    ts = synthetic_ts(2 * tx_a.bytes_per_step, seed=64)
    n = tx_a.bytes_per_step
    for i in range(2):
        fresh = ts[i * n:(i + 1) * n]
        a = tx_a.stream(fresh)
        carry = np.zeros(187, np.uint8) if i == 0 else ts[i * n - 187:i * n]
        got = tx_b.stream_window(np.concatenate([carry, fresh]))
        assert np.array_equal(a, got)
