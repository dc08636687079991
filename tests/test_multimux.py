"""Heterogeneous multi-mux: independent channels with DIFFERENT configs
on one device pool (BASELINE config 5's "independent channels", literal).

The reference analog is N independent flowgraphs; MultiMuxTransmitter
partitions the pool into per-channel submeshes.  Each channel must be
bit-identical to its standalone ShardedTransmitter run.
"""
import jax
import numpy as np
import pytest

from dvbt2ll_tpu.config import vv009_config
from dvbt2ll_tpu.io import synthetic_ts
from dvbt2ll_tpu.parallel import (MultiMuxTransmitter, MuxChannel,
                                  ShardedTransmitter, make_mesh)
from tests.test_sharding import _phase_invariant_cfg


def test_hetero_channels_bit_identical():
    """vv009 (4K short, drift mode) + a HIEFF 17-block config (strict,
    phase-invariant) side by side: different FFT sizes, input modes, and
    frame geometries in one pool; each equals its standalone run."""
    cpu = jax.devices("cpu")
    cfg_a, cfg_b = vv009_config(), _phase_invariant_cfg()
    mm = MultiMuxTransmitter([
        MuxChannel(cfg_a, n_mux=1, frames_per_shard=1, strict=False,
                   allow_phase_drift=True),
        MuxChannel(cfg_b, n_mux=1, frames_per_shard=1),
    ], devices=cpu[:4])
    na, nb = mm.bytes_per_step
    ts_a = synthetic_ts(na, seed=50)
    ts_b = synthetic_ts(nb, seed=51)
    out_a, out_b = mm([ts_a[None], ts_b[None]])

    ref_a = ShardedTransmitter(cfg_a, make_mesh(cpu[:2], mux=1), n_mux=1,
                               frames_per_shard=1, strict=False,
                               allow_phase_drift=True)(ts_a[None])
    ref_b = ShardedTransmitter(cfg_b, make_mesh(cpu[2:4], mux=1), n_mux=1,
                               frames_per_shard=1)(ts_b[None])
    assert np.array_equal(out_a, ref_a)
    assert np.array_equal(out_b, ref_b)


def test_shared_config_group_and_pinned_devices():
    """A 2-mux shared-config group next to a pinned single-mux channel;
    streaming across 2 steps with per-channel carries."""
    cpu = jax.devices("cpu")
    cfg = _phase_invariant_cfg()
    mm = MultiMuxTransmitter([
        MuxChannel(cfg, n_mux=2, n_devices=4, frames_per_shard=1),
        MuxChannel(cfg, n_mux=1, frames_per_shard=1),
    ], devices=cpu[:6])
    assert mm.channels[1].n_devices == 2
    (n2, n1) = mm.bytes_per_step
    ts = [np.stack([synthetic_ts(2 * n2, seed=60 + m) for m in range(2)]),
          synthetic_ts(2 * n1, seed=62)[None]]
    step1 = mm([ts[0][:, :n2], ts[1][:, :n1]])
    step2 = mm([ts[0][:, n2:], ts[1][:, n1:]])

    ref = ShardedTransmitter(cfg, make_mesh(cpu[:2], mux=1), n_mux=1,
                             frames_per_shard=1)
    for m in range(2):  # each mux of the group == its own sequential run
        ref.load_state({"carries": np.zeros((1, 1, 187), np.uint8),
                        "step_no": 0})
        r1 = ref(ts[0][m, :n2][None])
        r2 = ref(ts[0][m, n2:][None])
        a1 = np.asarray(step1[0])[m].reshape(1, ref.frames_per_step, -1)
        a2 = np.asarray(step2[0])[m].reshape(1, ref.frames_per_step, -1)
        assert np.array_equal(a1.view(np.complex64), r1)
        assert np.array_equal(a2.view(np.complex64), r2)


def test_hetero_with_multi_plp_channel():
    """A multi-PLP mux next to a single-PLP mux: per-channel inputs keep
    ShardedTransmitter semantics (a per-PLP sequence for the multi-PLP
    group), outputs equal the standalone runs."""
    from tests.test_multiplp_fef import _mixed_plp_cfg
    cpu = jax.devices("cpu")
    cfg_a, cfg_b = _mixed_plp_cfg(), vv009_config()
    mm = MultiMuxTransmitter([
        MuxChannel(cfg_a, frames_per_shard=1, strict=False,
                   allow_phase_drift=True),
        MuxChannel(cfg_b, frames_per_shard=1, strict=False,
                   allow_phase_drift=True),
    ], devices=cpu[:4])
    per_a = mm.bytes_per_step[0]
    assert isinstance(per_a, tuple) and len(per_a) == 2
    ts_a = [synthetic_ts(per_a[0], seed=80)[None],
            synthetic_ts(per_a[1], seed=81)[None]]
    ts_b = synthetic_ts(mm.bytes_per_step[1], seed=82)[None]
    out_a, out_b = mm([ts_a, ts_b])

    ref_a = ShardedTransmitter(cfg_a, make_mesh(cpu[:2], mux=1), n_mux=1,
                               frames_per_shard=1, strict=False,
                               allow_phase_drift=True)(ts_a)
    ref_b = ShardedTransmitter(cfg_b, make_mesh(cpu[2:4], mux=1), n_mux=1,
                               frames_per_shard=1, strict=False,
                               allow_phase_drift=True)(ts_b)
    assert np.array_equal(out_a, ref_a)
    assert np.array_equal(out_b, ref_b)


def test_pool_partition_errors():
    cpu = jax.devices("cpu")
    cfg = vv009_config()
    with pytest.raises(ValueError, match="split evenly"):
        MultiMuxTransmitter([MuxChannel(cfg, strict=False,
                                        allow_phase_drift=True)] * 2,
                            devices=cpu[:3])
    with pytest.raises(ValueError, match="multiple"):
        MultiMuxTransmitter(
            [MuxChannel(cfg, n_mux=3, n_devices=4, strict=False,
                        allow_phase_drift=True)], devices=cpu[:4])


def test_checkpoint_roundtrip(tmp_path):
    cpu = jax.devices("cpu")
    cfg = _phase_invariant_cfg()
    mm = MultiMuxTransmitter([MuxChannel(cfg, frames_per_shard=1)] * 2,
                             devices=cpu[:4])
    (na, nb) = mm.bytes_per_step
    ts1 = [synthetic_ts(na, seed=70)[None], synthetic_ts(nb, seed=71)[None]]
    ts2 = [synthetic_ts(na, seed=72)[None], synthetic_ts(nb, seed=73)[None]]
    mm(ts1)
    p = str(tmp_path / "mm.npz")
    mm.save(p)
    out = mm(ts2)

    mm2 = MultiMuxTransmitter([MuxChannel(cfg, frames_per_shard=1)] * 2,
                              devices=cpu[:4])
    mm2.restore(p)
    out2 = mm2(ts2)
    for a, b in zip(out, out2):
        assert np.array_equal(a, b)
