"""Test configuration: force the CPU backend (the image pins JAX_PLATFORMS to
the axon TPU plugin, which tunnels every op over the network) and expose a
virtual 8-device mesh so sharding tests run without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# inherited by subprocess-hosted models so their compiles hit the cache too
os.environ.setdefault("MAGENT_JAX_CACHE", "/tmp/magent_tpu_jax_cache")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeated suite runs on one box skip most XLA
# compiles (the env-var spelling of these options is NOT picked up by this
# jax version — they must be set via jax.config)
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MAGENT_JAX_CACHE",
                                 "/tmp/magent_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight fuzz/e2e tests, opt-in via --runslow or "
        "MAGENT_SLOW_TESTS=1 (nightly tier; the default tier keeps every "
        "parity class covered)")


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("MAGENT_SLOW_TESTS"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow or set "
                                   "MAGENT_SLOW_TESTS=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
