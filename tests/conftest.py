"""Test configuration: force CPU JAX with an 8-device virtual mesh so
multi-chip sharding paths are exercised without TPU hardware.

The environment pins JAX_PLATFORMS via sitecustomize, so the env-var route is
ineffective; use jax.config instead (must run before any backend init).
Set EGGFUSION_TEST_TPU=1 to run the suite on the real TPU instead.
"""
import os

import jax

if os.environ.get("EGGFUSION_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

# persistent compile cache: the e2e tests are compile-bound on CPU
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
