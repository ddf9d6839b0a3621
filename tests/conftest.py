"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the TPU-analog way (SURVEY.md §4): an
8-device host-platform mesh via XLA_FLAGS, set BEFORE jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# this box has a single CPU core: persist compiled executables across runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# The environment's sitecustomize registers the 'axon' TPU-tunnel PJRT
# plugin in every interpreter; even under JAX_PLATFORMS=cpu its presence
# costs ~5 MINUTES at the first device->host transfer. Tests are CPU-only:
# force the platform config and drop every non-CPU backend factory before
# any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax._src.xla_bridge as _xb  # noqa: E402

# drop ONLY the axon tunnel backend: removing 'tpu' as well would strip the
# platform from the MLIR registry and break pallas-TPU imports
_xb._backend_factories.pop("axon", None)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
