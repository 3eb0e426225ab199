"""Test configuration: force an 8-device virtual CPU mesh.

Tests never touch the real TPU; multi-chip sharding is validated on a
virtual CPU mesh exactly like the driver's ``dryrun_multichip`` check.

Note: the environment pre-imports jax (axon sitecustomize) with
``JAX_PLATFORMS=axon``, so setting env vars here is too late — we must use
``jax.config.update`` before the first backend use instead.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "tests expect an 8-device virtual CPU mesh"


# --- fast/slow tiers (round-2 verdict weak #4) -------------------------
# Interpret-mode Pallas kernels run the full Mosaic program element-wise
# on CPU — minutes per test.  Default `pytest tests/ -q` is the fast tier
# (<10 min); `--runslow` adds the slow tier (full-suite green is still
# required before any end-of-round snapshot, see CLAUDE.md).

def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run slow tests (interpret-mode Pallas/slab oracles)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: interpret-mode Pallas/slab oracle tests (minutes each)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier (run with --runslow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def dam_break_small():
    """Shared 2k-particle dam-break fixture (config-1 analogue, CPU-sized)."""
    from sph_tpu.core.params import FluidParams, SimConfig, compute_grid_dims
    from sph_tpu.core.state import spawn_standard, state_from_spawn

    spawn = spawn_standard(2048, seed=7)
    state = state_from_spawn(spawn)
    params = FluidParams.default().derive_mass()
    dims = compute_grid_dims(0, np.array([7.0, 7.0, 7.0]),
                             np.array([0.0, 0.0, 0.0]), 0.28)
    return state, params, dims
