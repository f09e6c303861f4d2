"""Force tests onto a virtual 8-device CPU mesh (no TPU needed in CI).

Must set env before jax is imported anywhere.
"""

import os

# force-override: the machine env pins JAX_PLATFORMS to the TPU plugin
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(0)
    yield
