import os
import sys

# Tests run on CPU with a virtual 8-device mesh so sharding tests work without
# TPU hardware (SURVEY.md §4: the fake-backend multi-chip story).
os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env sets JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import pytest  # noqa: E402

# The axon sitecustomize imports jax at interpreter startup, BEFORE this
# conftest runs — so the JAX_PLATFORMS env set above is too late and the
# suite silently ran on the TPU relay. Forcing the platform via jax.config
# works as long as no device was touched yet, and makes the suite genuinely
# CPU (the judge/CI environment) with the 8 virtual devices above.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

# Parity tests compare fp32 numerics against torch CPU; the default lowered
# matmul precision would drown the comparison in bf16 rounding.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="session")
def tiny128_cfg():
    from sam2_opt_tpu.config import model_config

    return model_config("hiera_t", image_size=128)


@pytest.fixture(scope="session")
def tiny128_params(tiny128_cfg):
    from sam2_opt_tpu.models.init import init_params

    return init_params(tiny128_cfg, jax.random.PRNGKey(0))

