"""Native C++ TS ingest runtime: framing, resync, stuffing, carry."""
import os

import numpy as np
import pytest

from dvbt2ll_tpu.io.ingest import TSIngest


def _make_ts(n_packets, seed=0):
    rng = np.random.default_rng(seed)
    pkts = rng.integers(0, 256, (n_packets, 188), dtype=np.uint8)
    pkts[:, 0] = 0x47
    return pkts


def _pipe_with(data: bytes):
    r, w = os.pipe()
    os.write(w, data)
    os.close(w)
    return r


def test_clean_stream_window_and_carry():
    pkts = _make_ts(20)
    fd = _pipe_with(pkts.tobytes())
    with TSIngest(fd=fd) as ing:
        assert ing.pump() == 20
        w = ing.window(188 * 10, allow_stuffing=False)
        assert w is not None and w.size == 187 + 1880
        assert (w[:187] == 0).all()                      # initial carry
        assert (w[187:] == pkts[:10].reshape(-1)).all()
        w2 = ing.window(188 * 10, allow_stuffing=False)
        assert (w2[:187] == pkts[9].reshape(-1)[1:]).all()  # carry = tail
        assert (w2[187:] == pkts[10:].reshape(-1)).all()
        assert ing.stats["sync_errors"] == 0
    os.close(fd)


def test_resync_after_corruption():
    pkts = _make_ts(10, seed=1)
    raw = bytearray(pkts.tobytes())
    garbage = bytes([0x00, 0x12, 0x34, 0x56, 0x99])
    corrupted = bytes(raw[: 3 * 188]) + garbage + bytes(raw[3 * 188:])
    fd = _pipe_with(corrupted)
    with TSIngest(fd=fd) as ing:
        ing.pump()
        st = ing.stats
        # garbage between packets is dropped, sync recovered
        assert st["sync_errors"] >= 1
        assert st["packets_in"] == 10
        w = ing.window(188 * 10, allow_stuffing=False)
        assert (w[187:] == pkts.reshape(-1)).all()
    os.close(fd)


def test_underrun_null_stuffing():
    pkts = _make_ts(2, seed=2)
    fd = _pipe_with(pkts.tobytes())
    with TSIngest(fd=fd) as ing:
        ing.pump()
        assert ing.window(188 * 4, allow_stuffing=False) is None
        w = ing.window(188 * 4, allow_stuffing=True)
        assert (w[187 : 187 + 376] == pkts.reshape(-1)).all()
        stuffed = w[187 + 376 :]
        assert stuffed[0] == 0x47 and stuffed[1] == 0x1F and stuffed[2] == 0xFF
        assert ing.stats["null_stuffed"] == 2
    os.close(fd)


def test_backpressure_loses_no_bytes():
    """When the ring fills mid-pump, the unconsumed chunk tail must be
    left in the fd, not discarded (regression: the old pump dropped it,
    losing stream bytes and logging one spurious resync per ring-full
    event — caught by tools/bench_sustained.py showing ~1 sync error
    per feeder buffer cycle)."""
    n_pkts = 256
    pkts = _make_ts(n_pkts, seed=4)
    fd = _pipe_with(pkts.tobytes())
    # ring holds ~44 packets; alternate tiny pumps with partial drains so
    # the ring is repeatedly full while the pipe still has data
    with TSIngest(fd=fd, capacity=1 << 13) as ing:
        got = []
        while True:
            rc = ing.pump(budget=1 << 20)
            w = ing.window(188 * 8, allow_stuffing=False)
            if w is not None:
                got.append(w[187:])
            elif rc < 0:
                break
        st = ing.stats
        assert st["sync_errors"] == 0, st
        assert st["packets_in"] == n_pkts, st
    os.close(fd)
    stream = np.concatenate(got)
    assert (stream == pkts.reshape(-1)[: stream.size]).all()
    assert stream.size >= 188 * (n_pkts - 8)  # all but the last window


def test_feeds_transmitter():
    """Ingest window drives the jitted chain exactly like the python path."""
    import jax.numpy as jnp

    from dvbt2ll_tpu import vv009_config
    from dvbt2ll_tpu.pipeline import Transmitter

    cfg = vv009_config()
    tx = Transmitter(cfg, 1, strict=False)
    n = tx.bytes_per_step
    n_pkts = -(-n // 188)
    pkts = _make_ts(n_pkts, seed=3)
    fd = _pipe_with(pkts.tobytes())
    with TSIngest(fd=fd) as ing:
        ing.pump(budget=1 << 22)
        w = ing.window(n)           # carry + fresh, ready for the step
    os.close(fd)
    out_native = np.asarray(
        tx._step(jnp.asarray(w), jnp.int32(0)))
    out_python = tx(pkts.reshape(-1)[:n])
    ref = out_python.view(np.float32).reshape(out_native.shape)
    assert np.array_equal(out_native, ref)


def test_native_iq_sink_matches_python_sink(tmp_path):
    """The C++ async sink must write byte-identical cf32 output (incl. the
    gain multiply) to the synchronous python IQFileSink."""
    from dvbt2ll_tpu.io.native_sink import NativeIQSink
    from dvbt2ll_tpu.io.sink import IQFileSink

    rng = np.random.default_rng(5)
    iq = (rng.standard_normal((3, 1000, 2)).astype(np.float32)
          .reshape(3, 1000, 2).view(np.float32))
    blocks = [iq[i].reshape(-1).view(np.complex64) for i in range(3)]

    p_native, p_py = tmp_path / "n.cf32", tmp_path / "p.cf32"
    with NativeIQSink(str(p_native), gain=0.2) as ns:
        for b in blocks:
            ns.write(b)
        ns.flush()
        assert ns.samples_written == 3000
    with IQFileSink(str(p_py), gain=0.2) as ps:
        for b in blocks:
            ps.write(b)
    a = np.fromfile(p_native, dtype=np.float32)
    b = np.fromfile(p_py, dtype=np.float32)
    assert a.shape == b.shape == (6000,)
    assert np.array_equal(a, b)


def test_native_iq_sink_large_wraparound(tmp_path):
    """Ring wraparound + backpressure: write more than the ring capacity."""
    from dvbt2ll_tpu.io.native_sink import NativeIQSink
    rng = np.random.default_rng(6)
    data = rng.standard_normal(1 << 18).astype(np.float32)
    path = tmp_path / "w.cf32"
    with NativeIQSink(str(path), gain=1.0, ring_samples=1 << 12) as ns:
        for i in range(0, data.size, 4096):
            ns.write(data[i:i + 4096])
        ns.flush()
    out = np.fromfile(path, dtype=np.float32)
    assert np.array_equal(out, data)
