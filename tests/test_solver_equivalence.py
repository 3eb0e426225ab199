"""Cell-list solver must match the brute-force oracle to fp32 tolerance.

This is the core correctness contract from BASELINE config 1: the
sort-based cell list (sized so no neighbor within h is ever missed) must
reproduce the all-pairs trajectory; differences come only from float
summation order.
"""
import numpy as np
import jax.numpy as jnp

from sph_tpu.core.params import FluidParams, SimConfig
from sph_tpu.engine.step import SceneBuffers, run_substeps


def _run(state, params, dims, impl, n_sub, **cfg_kw):
    cfg = SimConfig(n=state.n, grid_dims=dims, neighbor_impl=impl, **cfg_kw)
    buf = SceneBuffers.create(cfg)
    out, _ = run_substeps(state, params, buf, params.dt, n_sub, cfg)
    return out


def test_cell_matches_brute_dam_break(dam_break_small):
    state, params, dims = dam_break_small
    st_b = _run(state, params, dims, "brute", 20)
    st_c = _run(state, params, dims, "cell", 20)
    v = np.asarray(state.valid) > 0
    dpos = np.abs(np.asarray(st_b.pos) - np.asarray(st_c.pos))[v]
    drho = np.abs(np.asarray(st_b.density) - np.asarray(st_c.density))[v]
    assert dpos.max() < 5e-5, f"trajectory diverged: {dpos.max()}"
    assert drho.max() < 0.5, f"density diverged: {drho.max()}"


def test_cell_binning_vs_brute_neighbors(dam_break_small):
    """Cell-list density equals brute-force density on the initial state."""
    from sph_tpu.physics import brute_force, cell_solver
    from sph_tpu.neighbors import grid as G
    from sph_tpu.core.params import grid_min

    state, params, dims = dam_break_small
    contrib = state.contrib_mask(params.ghost_face_active)
    rho_b = np.asarray(brute_force.density_pass(state.pos, state.pos,
                                                contrib, params))
    cl = G.build_cell_list(state.pos, state.valid, grid_min(params),
                           params.h, dims, 8)
    assert int(cl.overflow) == 0
    rho_c = np.asarray(cell_solver.density_pass(
        cl, state.pos, contrib.astype(jnp.float32), params, dims, 8))
    v = np.asarray(state.valid) > 0
    np.testing.assert_allclose(rho_c[v], rho_b[v], rtol=1e-5, atol=1e-2)


def test_stability_invariants(dam_break_small):
    """Dam break: no NaN, densities floored, speeds capped, inside box."""
    state, params, dims = dam_break_small
    st = _run(state, params, dims, "cell", 100)
    v = np.asarray(state.valid) > 0
    pos = np.asarray(st.pos)[v]
    vel = np.asarray(st.vel)[v]
    rho = np.asarray(st.density)[v]
    assert not np.isnan(pos).any()
    assert rho.min() >= 0.5 * 1000.0 - 1e-3
    cap = 0.4 * 0.28 / 1e-3
    assert np.linalg.norm(vel, axis=-1).max() <= cap * 1.0001
    assert np.all(np.abs(pos) <= 7.0 + 1e-4)  # inside the box container
    assert np.asarray(st.pressure)[v].min() >= 0.0
