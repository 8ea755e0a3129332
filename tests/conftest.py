"""Test configuration: run on CPU with 8 virtual devices for mesh tests.

Mirrors the survey's multi-chip test plan (SURVEY.md §4): a
``jax.sharding`` mesh over virtual CPU devices is the "fake multi-node"
fixture; sharded runs are compared against single-device runs.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the TPU tunnel,
# which must not be touched by unit tests (and is a single chip anyway).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
# f64-on-CPU verification mode (SURVEY.md §7 hard part 5): tests may build
# float64 grids to check discrete identities to machine precision.
jax.config.update("jax_enable_x64", True)
# NOTE: the persistent compilation cache is deliberately NOT enabled —
# cache writes segfault this jax build on some executables (observed in
# compilation_cache.put_executable_and_time for bf16 scan programs).


def pytest_addoption(parser):
    parser.addoption(
        "--nightly", action="store_true", default=False,
        help="run the nightly tier (example --check physics runs and "
             "validation smokes) in addition to the default suite")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "nightly: long-running physics-assertion tier (example --check "
        "runs, validation smokes); deselected unless --nightly is given")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--nightly"):
        return
    import pytest
    skip = pytest.mark.skip(
        reason="nightly tier — run with --nightly (or ./runtests.sh --nightly)")
    for item in items:
        if "nightly" in item.keywords:
            item.add_marker(skip)
