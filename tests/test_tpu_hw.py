"""On-TPU hardware lane (deselected by default; run with ``-m tpu``).

The default suite verifies the identical XLA programs on the CPU
backend and the Pallas kernel only in interpret mode; these tests run
the COMPILED kernel + full chain on the attached TPU chip and assert
e2e SNR against the pinned reference-binary goldens plus on-device
Pallas/XLA bit-identity (VERDICT r3 "missing" #3).  Slow through the
axon tunnel (first compile minutes; .jax_cache makes reruns fast).
"""
import importlib.util
import os

import pytest

_spec = importlib.util.spec_from_file_location(
    "verify_tpu", os.path.join(os.path.dirname(__file__), "..", "tools",
                               "verify_tpu.py"))
verify_tpu = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(verify_tpu)
# NO module-level jax calls: a bare jax.devices() probes the axon backend
# during COLLECTION of the CPU-only suite and blocks forever when the
# tunnel is down; the device check runs lazily inside the selected tests.


def _require_tpu():
    import jax
    if not any(d.platform != "cpu" for d in jax.devices()):
        pytest.skip("no TPU attached")


@pytest.mark.tpu
@pytest.mark.parametrize("name", verify_tpu.DEFAULT_NAMES)
def test_chain_on_tpu_hardware(name):
    _require_tpu()
    r = verify_tpu.verify_on_tpu(name)
    assert r["snr_db"] > 100 and r["pallas_xla_bit_identical"]
