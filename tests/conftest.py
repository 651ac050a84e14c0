"""Test configuration: force a virtual 8-device CPU mesh before jax import.

The reference has no automated tests (SURVEY.md §4); this suite is the test
layer the TPU build adds: kernels vs dense oracles, token-exact losslessness,
and multi-device sharding on a host-platform mesh.
"""
import os

# zero-egress environment: make HF/torch never touch the network
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
os.environ.setdefault("HF_HUB_DISABLE_TELEMETRY", "1")
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")
os.environ["JAX_PLATFORMS"] = "cpu"  # force: ambient env points at remote TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_cpu")

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
