"""Regression tests for the driver entry points (__graft_entry__.py).

MULTICHIP_r01/r02 both failed because dryrun_multichip touched the default
(remote-TPU) backend in the driver's environment — something 200+ green
tests under the conftest CPU env could never catch. These tests simulate
the driver's exact invocation in subprocesses with hostile environments:
a pre-registered, pre-INITIALIZED 1-device default platform and no
conftest env vars.
"""

import os
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _scrubbed_env():
    """Environment WITHOUT the conftest CPU-forcing vars, as the driver
    would have it."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_PLATFORM_NAME", None)
    env.pop("_FACEOFF_DRYRUN_CHILD", None)
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(flags)
    return env


def _run(code, env, timeout=600):
    return subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO_ROOT,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.mark.slow
def test_dryrun_survives_preinitialized_1device_default_platform():
    """The driver scenario: the default platform is already registered AND
    initialized with a single device before dryrun_multichip(8) is called.
    The dryrun must not dispatch anything on it (r02 failed exactly there)
    and must still complete on an 8-device virtual CPU mesh via re-exec."""
    env = _scrubbed_env()
    # Simulate the driver's 1-device default platform: a 1-device CPU
    # platform that the parent has already initialized with a dispatch.
    env["XLA_FLAGS"] = (
        env["XLA_FLAGS"] + " --xla_force_host_platform_device_count=1"
    ).strip()
    code = (
        "import jax, jax.numpy as jnp\n"
        "jax.block_until_ready(jnp.zeros(()) + 1)  # init default backend\n"
        "assert jax.device_count() == 1\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "print('DRIVER_SIM_OK')\n"
    )
    result = _run(code, env)
    assert result.returncode == 0, (
        f"dryrun failed in driver simulation:\n"
        f"stdout={result.stdout}\nstderr={result.stderr[-3000:]}"
    )
    assert "DRIVER_SIM_OK" in result.stdout
    assert "dryrun_multichip(8): ok" in result.stdout


@pytest.mark.slow
def test_dryrun_inprocess_under_cpu_env():
    """Under the proven conftest env (JAX_PLATFORMS=cpu + 8 virtual
    devices) the dryrun runs in-process — no re-exec marker needed."""
    env = _scrubbed_env()
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env["XLA_FLAGS"] + " --xla_force_host_platform_device_count=8"
    ).strip()
    code = (
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    result = _run(code, env)
    assert result.returncode == 0, (
        f"stdout={result.stdout}\nstderr={result.stderr[-3000:]}"
    )
    assert "dryrun_multichip(8): ok" in result.stdout


def test_parent_never_imports_jax_before_decision():
    """Importing __graft_entry__ must not import jax (the module must be
    able to decide to re-exec before any backend can be registered)."""
    env = _scrubbed_env()
    code = (
        "import sys\n"
        "import __graft_entry__\n"
        "assert 'jax' not in sys.modules, 'module import pulled in jax'\n"
        "print('NO_JAX_AT_IMPORT')\n"
    )
    result = _run(code, env, timeout=120)
    assert result.returncode == 0, result.stderr[-2000:]
    assert "NO_JAX_AT_IMPORT" in result.stdout
