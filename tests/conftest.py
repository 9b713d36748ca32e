"""Test configuration: run the JAX engine on CPU with a virtual 8-device mesh
so sharding paths are exercised without TPU hardware, and in float64 so
numeric parity with the CPU MuJoCo oracle is meaningful."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# NOTE: do not enable jax_compilation_cache_dir here — the executable
# serializer segfaults intermittently on this CPU backend (observed in
# jax 0.9 compilation_cache.put_executable_and_time). Compile times are
# kept manageable by the lax.scan tree recursions instead.
# The axon TPU plugin ignores JAX_PLATFORMS; pin the default device to CPU so
# parity tests run in float64 (TPU has no native f64).
jax.config.update("jax_default_device", jax.local_devices(backend="cpu")[0])

import pytest  # noqa: E402

REF_DATA = "/root/reference/loco_mujoco/environments/data"


@pytest.fixture(scope="session")
def ref_data_dir():
    if not os.path.isdir(REF_DATA):
        pytest.skip("reference asset pack not available")
    return REF_DATA
