"""Golden-vector regression tests.

The oracle (refmodel) and the fast path are verified against each other
everywhere else; these vectors pin the ABSOLUTE waveform so a consistent
change to both (e.g. an optimization subtly altering the standard's
behavior in pipeline AND oracle) still fails loudly.  Vectors were
generated from the oracle at the point the chain matched the reference
algorithms statement-for-statement (tables/golden_vv009.npz).
"""
import os

import numpy as np

from dvbt2ll_tpu.config import vv009_config
from dvbt2ll_tpu.io import synthetic_ts
from dvbt2ll_tpu.pipeline import Transmitter

_GOLDEN = os.path.join(os.path.dirname(__file__), "golden_vv009.npz")


def _first_frame():
    cfg = vv009_config()
    tx = Transmitter(cfg, 1, strict=False)
    ts = synthetic_ts(tx.bytes_per_step, seed=1234)
    return tx(ts)[0]


def test_vv009_waveform_is_pinned():
    iq = _first_frame()
    with np.load(_GOLDEN) as z:
        p1 = z["p1"]
        sym0 = z["sym0"]
        checksum = z["checksum"]
    assert np.abs(iq[:2048] - p1).max() < 1e-5          # P1 preamble
    assert np.abs(iq[2048:2048 + 4224] - sym0).max() < 1e-5  # first P2 symbol
    assert abs(np.abs(iq).sum() - checksum) / checksum < 1e-5


if __name__ == "__main__":
    # regenerate the golden file FROM THE ORACLE (refmodel), never from the
    # fast path - otherwise a pipeline bug that also lands in a pipeline-
    # vs-oracle-consistent state could re-pin itself
    from dvbt2ll_tpu import refmodel
    cfg = vv009_config()
    tx = Transmitter(cfg, 1, strict=False)  # only for bytes_per_step
    ts = synthetic_ts(tx.bytes_per_step, seed=1234)
    iq = refmodel.transmit_chain(cfg, ts, 1).reshape(-1)
    np.savez(_GOLDEN, p1=iq[:2048], sym0=iq[2048:2048 + 4224],
             checksum=np.abs(iq).sum())
    print("golden written from oracle", iq.shape)
