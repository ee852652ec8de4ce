"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must run before jax is used anywhere in the test process.  Note the axon
TPU plugin ignores the JAX_PLATFORMS env var, so we also force the platform
through jax.config.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# persistent compile cache makes repeated test runs fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_fastplong")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
# small device batches => small shapes => fast XLA compiles in tests
os.environ.setdefault("FASTPLONG_TOKENS_PER_BATCH", str(1 << 15))
os.environ.setdefault("FASTPLONG_MAX_BATCH_READS", "64")
# one pool worker per test daemon (production default 4): xdist runs
# many daemons concurrently on these 4 cores
os.environ.setdefault("FASTPLONG_DAEMON_POOL", "1")

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_load_initial_conftests(early_config, parser, args):
    """pytest.ini's `-n auto` requires pytest-xdist (a test-only
    dependency); without the plugin the flag is an unknown option and
    pytest exits with a usage error.  Strip it so the suite still runs,
    just serially."""
    try:
        import xdist  # noqa: F401
    except ImportError:
        while "-n" in args:
            i = args.index("-n")
            del args[i:i + 2]


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (multi-process jax etc.)")


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: the default invocation (`pytest -q`) runs the fast
    tier (<5 min on the dev host); slow-marked tests (monster reads,
    640bp+ adapter goldens, multi-process jax) run with FASTPLONG_SLOW=1
    or an explicit `-m slow`.  See README 'Tests'."""
    if config.getoption("-m") or os.environ.get("FASTPLONG_SLOW") == "1":
        return
    skip = pytest.mark.skip(
        reason="slow tier: FASTPLONG_SLOW=1 or -m slow to run")
    for it in items:
        if "slow" in it.keywords:
            it.add_marker(skip)


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_steps():
    """Drop compiled-executable references between test modules.

    The golden suite runs dozens of pipeline configs in one process; the
    process-wide step cache (pipeline/device._step_cache) plus jit's
    per-shape executable caches otherwise accumulate hundreds of live XLA
    CPU executables, which has been observed to segfault the XLA compiler
    late in the run.  Production is unaffected (one config per process).
    The persistent on-disk compile cache keeps recompiles cheap.
    """
    yield
    try:
        from fastplong_tpu.pipeline import device
        device._step_cache.clear()
        jax.clear_caches()
    except Exception:
        pass
