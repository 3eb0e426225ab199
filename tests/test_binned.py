"""Binned-plane engine must match the brute-force oracle.

The binned engine returns state in cell-sorted order, so trajectories are
realigned by orig_id before comparison.
"""
import numpy as np
import jax.numpy as jnp

from sph_tpu.core.params import FluidParams, SimConfig
from sph_tpu.engine.step import SceneBuffers, run_substeps


def _aligned(state):
    order = np.argsort(np.asarray(state.orig_id))
    return {
        "pos": np.asarray(state.pos)[order],
        "density": np.asarray(state.density)[order],
        "valid": np.asarray(state.valid)[order],
        "foam": np.asarray(state.foam)[order],
    }


def _run(state, params, dims, impl, n_sub, cap=8):
    cfg = SimConfig(n=state.n, grid_dims=dims, neighbor_impl=impl,
                    cell_capacity=cap)
    buf = SceneBuffers.create(cfg)
    out, _ = run_substeps(state, params, buf, params.dt, n_sub, cfg)
    return out


def test_binned_matches_brute(dam_break_small):
    state, params, dims = dam_break_small
    a = _aligned(_run(state, params, dims, "brute", 10))
    b = _aligned(_run(state, params, dims, "binned", 10, cap=8))
    v = a["valid"] > 0
    dpos = np.abs(a["pos"] - b["pos"])[v]
    assert dpos.max() < 5e-5, f"binned trajectory diverged: {dpos.max()}"
    drho = np.abs(a["density"] - b["density"])[v]
    assert drho.max() < 0.5
    dfoam = np.abs(a["foam"] - b["foam"])[v]
    assert dfoam.max() < 1e-3


def test_binned_overflow_graceful(dam_break_small):
    """cap=1 forces overflow: particles must keep moving, no NaN."""
    state, params, dims = dam_break_small
    out = _run(state, params, dims, "binned", 5, cap=1)
    pos = np.asarray(out.pos)
    assert not np.isnan(pos).any()
    v = np.asarray(out.valid) > 0
    assert np.all(np.abs(pos[v]) <= 7.0 + 1e-4)


def test_binned_ghost_face_activation(dam_break_small):
    """Per-face ghost activation: a wall-adjacent fluid particle sees the
    ghost shell's density only when its face is active; binned must match
    the brute oracle in both settings."""
    from sph_tpu.core.state import (SpawnResult, spawn_ghost_box_shell,
                                    concat_spawns, state_from_spawn)
    from sph_tpu.core.params import compute_grid_dims

    shell = spawn_ghost_box_shell(box_half=(3.0, 3.0, 3.0), layers=2)
    fluid = SpawnResult(
        pos=np.array([[0.0, -2.9, 0.0]], np.float32),
        vel=np.zeros((1, 3), np.float32),
        ghost=np.zeros(1, np.int32), face=np.full(1, -1, np.int32),
        color_group=np.zeros(1, np.int32), count=1)
    st = state_from_spawn(concat_spawns(fluid, shell))
    params = FluidParams.default(box_half=[3.0, 3.0, 3.0]).derive_mass()
    params_off = params.replace(ghost_face_active=jnp.zeros((6,), jnp.int32))
    dims = compute_grid_dims(0, np.array([3., 3., 3.]), np.zeros(3), 0.28)

    for p in (params, params_off):
        a = _aligned(_run(st, p, dims, "brute", 1))
        b = _aligned(_run(st, p, dims, "binned", 1))
        np.testing.assert_allclose(b["density"][0], a["density"][0], rtol=1e-5)

    rho_on = _aligned(_run(st, params, dims, "binned", 1))["density"][0]
    rho_off = _aligned(_run(st, params_off, dims, "binned", 1))["density"][0]
    assert rho_on > rho_off + 1.0, (rho_on, rho_off)
