"""Test config: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes its backends, so this executes
at conftest import time (pytest imports conftest before test modules).
"""

import os

# A remote-TPU backend may already be registered by a sitecustomize before
# this conftest runs, so env vars alone are not enough: force the CPU
# platform with 8 virtual devices through the config API (effective as long
# as no backend has been *used* yet).
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
