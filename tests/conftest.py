"""Test configuration.

Forces JAX onto a virtual 8-device CPU mesh so sharding/pjit paths are
exercised without TPU hardware (SURVEY.md section 4, item 4).

Must set env vars BEFORE jax is imported anywhere.
"""

import os
import sys

# The session env pins JAX_PLATFORMS to the TPU backend and the axon plugin
# overrides the env var at import; tests run on a virtual CPU mesh unless
# L4P_TEST_TPU=1 is set explicitly (forced via config below, which the
# plugin cannot override).
if not os.environ.get("L4P_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# fp32 matmuls for parity tests (JAX's CPU backend otherwise emulates the
# TPU's default bf16 matmul precision)
import jax  # noqa: E402

if not os.environ.get("L4P_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compilation cache: the heavier orchestrator graphs compile once
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "jax")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
