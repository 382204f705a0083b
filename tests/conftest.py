"""Test configuration: force a virtual 8-device CPU mesh.

The reference's test harness runs vertices on a simulated IPUModel when no
hardware is present (reference: include/ipu/ipu_utils.hpp:98-106). Our
equivalent: JAX CPU backend with 8 virtual devices so sharding/collective
paths are exercised without TPU hardware. Pallas kernels run in interpret
mode on CPU (selected automatically by the kernels).

Note: this environment's sitecustomize registers a remote "axon" TPU
backend and force-sets jax_platforms="axon,cpu", so plain JAX_PLATFORMS=cpu
is not enough — we must override the config after importing jax, before any
backend initialises.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent XLA compile cache: the suite's cost is dominated by CPU
# compiles of the sharded/binning programs (~40-200 s each); repeat runs
# hit the cache and the whole suite drops from ~50 min to a few minutes.
# Keyed by HLO + config hash, so code changes re-compile correctly.
jax.config.update("jax_compilation_cache_dir", "/tmp/gsplat_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8
