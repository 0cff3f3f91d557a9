"""Test configuration: force an 8-device CPU mesh unless explicitly
running against real TPU hardware (GENOMICS_TPU_TEST_TPU=1).

The axon TPU plugin registers itself via sitecustomize and pins
jax_platforms; we override in-process before any backend is touched so
tests exercise sharding on a virtual 8-device CPU mesh (SURVEY.md §4:
multi-host tests the reference entirely lacks)."""
import os

if os.environ.get("GENOMICS_TPU_TEST_TPU") != "1":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
