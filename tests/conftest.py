"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The axon TPU tunnel compiles slowly and cannot transfer complex64 buffers;
tests exercise the identical XLA programs on the host CPU backend, with 8
virtual devices so sharding tests run real collectives.
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402
import pytest  # noqa: E402

# the unrolled QC-LDPC schedules cost seconds of XLA compile per config;
# cache compiled executables across test runs
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_collection_modifyitems(config, items):
    """Hardware (tpu-marked) tests run ONLY when the -m expression names
    them explicitly.  pytest's -m option is store-last, so an addopts
    deselection would be silently REPLACED by any user -m (e.g.
    `-m "not slow"` would re-enable minutes-long hardware compiles), and
    the axon tunnel hangs on first RPC when it is down - opt-in must be
    explicit (`pytest tests/ -m tpu`)."""
    if "tpu" in (config.option.markexpr or ""):
        return
    tpu_items = [i for i in items if "tpu" in i.keywords]
    if tpu_items:
        config.hook.pytest_deselected(items=tpu_items)
        items[:] = [i for i in items if "tpu" not in i.keywords]


@pytest.fixture(scope="session", autouse=True)
def _cpu_default_device():
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        yield


def cpu_devices(n=None):
    devs = jax.devices("cpu")
    return devs if n is None else devs[:n]
