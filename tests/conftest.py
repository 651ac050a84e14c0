"""Test configuration: force a virtual 8-device CPU mesh.

The reference has no automated tests (SURVEY.md §4); this suite is the test
layer the TPU build adds: kernels vs dense oracles, token-exact losslessness,
and multi-device sharding on a host-platform mesh.

The remote-TPU site hook (sitecustomize on PYTHONPATH) imports jax at
interpreter startup and registers + force-selects the 'axon' PJRT plugin —
env vars set here are too late, so without the surgery below the "CPU" test
suite silently runs every op against the remote TPU chip (slow, single
device, no virtual mesh, and it wedges when another process holds the chip).
No backend is *initialized* until the first jax.devices()/computation, so
deregistering the factory + updating the already-read jax_platforms config
still works at conftest time.
"""
import os

# zero-egress environment: make HF/torch never touch the network
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
os.environ.setdefault("HF_HUB_DISABLE_TELEMETRY", "1")
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")
os.environ["JAX_PLATFORMS"] = "cpu"  # for child processes we spawn
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_cpu")

import jax  # noqa: E402
import jax._src.xla_bridge as _xb  # noqa: E402

if "axon" in getattr(_xb, "_backend_factories", {}):
    assert _xb.backends_are_initialized() is False, \
        "jax backend initialized before conftest could force CPU"
    _xb._backend_factories.pop("axon", None)
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="also run @pytest.mark.slow gates (multi-minute compile-bound "
             "tests, e.g. grad-of-shard_map ring training; the builder runs "
             "these once per round — they are gates, not dead weight)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    skip = pytest.mark.skip(reason="slow gate; run with --slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
