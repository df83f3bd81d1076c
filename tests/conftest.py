"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding tests run on a virtual CPU mesh (the real environment
has a single TPU chip); this must be set before jax is imported anywhere.
"""

import os
import sys

def pytest_configure(config):
    """Re-exec pytest once with a scrubbed environment.

    The environment's sitecustomize registers a remote-TPU (axon) PJRT
    plugin in every Python process, which costs ~60s of startup and slows
    compiles. The test suite runs on a virtual 8-device CPU mesh, so if the
    plugin got registered, restart with the plugin env vars removed.
    Capture is stopped first so the child's output reaches the terminal.
    """
    if (os.environ.get("PALLAS_AXON_POOL_IPS")
            and not os.environ.get("GGAD_TPU_TEST_REEXEC")):
        env = dict(os.environ)
        for var in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE"):
            env.pop(var, None)
        env["GGAD_TPU_TEST_REEXEC"] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            capman.stop_global_capturing()
        sys.stdout.flush()
        sys.stderr.flush()
        os.execve(sys.executable,
                  [sys.executable, "-m", "pytest", *sys.argv[1:]], env)


os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
