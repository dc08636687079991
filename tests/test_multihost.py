"""Multi-host (jax.distributed over DCN) execution, as real processes.

Wraps tools/dryrun_multihost.py: a single-process 8-device ground-truth
step, then two jax.distributed worker processes (4 virtual CPU devices
each, localhost coordinator) running the same ShardedTransmitter step on
a global mesh spanning both; process 0 asserts the gathered output is
bit-identical.  Covers SURVEY.md section 5.8 / the BASELINE N>=2-hosts leg.
"""
import os
import subprocess
import sys

import pytest

_TOOL = os.path.join(os.path.dirname(__file__), "..", "tools",
                     "dryrun_multihost.py")


@pytest.mark.slow
def test_two_process_distributed_bit_identical():
    r = subprocess.run([sys.executable, _TOOL], capture_output=True,
                       text=True, timeout=560)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "BIT-IDENTICAL" in (r.stdout + r.stderr)
