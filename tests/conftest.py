"""Test environment: force CPU with 8 virtual devices so sharding tests run
anywhere (SURVEY.md §4 — multi-host tests via xla_force_host_platform_device_count).

Note: this image's sitecustomize force-registers the axon TPU backend and
overrides the JAX_PLATFORMS env var, so we must select CPU via
``jax.config.update`` *after* importing jax.
"""
import os

# No persistent compile cache under pytest: CPU AOT entries are host-ISA
# bound (SIGILL on host migration) and cache *writes* have aborted the
# suite mid-compile; the suite's graphs are small enough to recompile.
os.environ.setdefault("NEURALSIM_NO_COMPILE_CACHE", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    The full suite compiles hundreds of CPU graphs in one process; with all
    executables kept live, the XLA:CPU compiler has aborted (SIGABRT inside
    backend_compile_and_load) deterministically around test #122 while the
    same tests pass in any smaller subset. Different modules share few
    graphs, so per-module eviction costs little recompilation.
    """
    yield
    jax.clear_caches()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running training-probe regression tests")
