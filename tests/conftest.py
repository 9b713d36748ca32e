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
# The axon TPU plugin overrides the JAX_PLATFORMS env var; the config knob
# still wins, and skipping TPU client creation entirely keeps test runs from
# blocking on the chip's single-process device lock while a bench/profile
# job holds it. (f64 parity vs the CPU MuJoCo oracle needs CPU anyway.)
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REF_DATA = "/root/reference/loco_mujoco/environments/data"


@pytest.fixture(scope="session")
def ref_data_dir():
    if not os.path.isdir(REF_DATA):
        pytest.skip("reference asset pack not available")
    return REF_DATA
