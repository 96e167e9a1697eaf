"""Test config: run on CPU with an 8-device virtual mesh for sharding tests.

The container's default env routes EVERY jax compile — even CPU — through the
axon remote-compile tunnel (slow, single-client, crashes on big graphs). The
axon hook is installed by sitecustomize via PYTHONPATH=/root/.axon_site, which
has already run by the time this conftest imports, so we re-exec pytest once
with a cleaned environment to get the local CPU compiler.
"""

import os
import sys

if "axon" in os.environ.get("PYTHONPATH", "") and \
        os.environ.get("_M3D_TEST_REEXEC") != "1":
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env["JAX_PLATFORMS"] = "cpu"
    env["_M3D_TEST_REEXEC"] = "1"
    env["PYTHONUNBUFFERED"] = "1"  # keep progress streaming through pipes
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:],
              env)

# Must be set before jax is imported anywhere. Force (not setdefault): the
# environment ships JAX_PLATFORMS=axon (the real TPU tunnel) and tests must
# never compete for the single serialized TPU client.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute train smokes / end-to-end pipelines "
        "(deselect with -m 'not slow'; the fast tier must stay < 5 min)",
    )


@pytest.fixture
def rng():
    return np.random.RandomState(42)
