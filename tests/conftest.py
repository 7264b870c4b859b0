"""Test configuration: force CPU JAX with an 8-device virtual mesh so
multi-chip sharding paths are exercised without TPU hardware.

The environment pins JAX_PLATFORMS via sitecustomize, so the env-var route is
ineffective; use jax.config instead (must run before any backend init).
Set EGGFUSION_TEST_TPU=1 to run the suite on the real TPU instead.
"""
import os

if os.environ.get("EGGFUSION_TEST_TPU") != "1":
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
