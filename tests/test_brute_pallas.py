"""brute_pallas (all-pairs Pallas kernels) vs the brute-force oracle.

Interpret mode on CPU; the same kernels run compiled on TPU for
BASELINE config 1 (dam_break_8k)."""
import numpy as np
import pytest

from sph_tpu.core import state as S
from sph_tpu.core.params import (FluidParams, SimConfig,
                                 compute_grid_dims, SHAPE_BOX)
from sph_tpu.engine.step import SceneBuffers, run_substeps

pytestmark = pytest.mark.slow   # interpret-mode Mosaic


def _run(state, params, dims, impl, n_sub=5):
    cfg = SimConfig(n=state.n, grid_dims=dims, neighbor_impl=impl)
    buf = SceneBuffers.create(cfg)
    out, _ = run_substeps(state, params, buf, params.dt, n_sub, cfg)
    return out


def test_brute_pallas_matches_oracle_dam_break():
    half = (4.0, 4.0, 4.0)
    spawn = S.spawn_standard(512, h=0.28, box_half=half, seed=0)
    state = S.state_from_spawn(spawn)
    params = FluidParams.default(
        box_half=np.asarray(half, np.float32)).derive_mass()
    dims = compute_grid_dims(SHAPE_BOX, half, (0, 0, 0), 0.28)

    ref = _run(state, params, dims, "brute")
    got = _run(state, params, dims, "brute_pallas")

    # identical enumeration, identical row order — only the pair
    # summation tree differs, so the tolerance is tight
    err_p = np.abs(np.asarray(ref.pos) - np.asarray(got.pos)).max()
    err_v = np.abs(np.asarray(ref.vel) - np.asarray(got.vel)).max()
    err_r = np.abs(np.asarray(ref.density)
                   - np.asarray(got.density)).max()
    assert err_p < 1e-4, f"pos diverged: {err_p}"
    assert err_v < 1e-3, f"vel diverged: {err_v}"
    assert err_r < 1.0, f"density diverged: {err_r}"
    assert not np.isnan(np.asarray(got.pos)).any()


def test_brute_pallas_matches_oracle_with_ghosts():
    """Ghost shells: active ghosts contribute as rho0/v=0 sources and
    never integrate (SPHFluid.comp:71-83)."""
    half = (3.0, 3.0, 3.0)
    spawn = S.concat_spawns(
        S.spawn_standard(256, h=0.28, box_half=half, seed=1),
        S.spawn_ghost_box_shell(h=0.28, box_half=half))
    state = S.state_from_spawn(spawn)
    params = FluidParams.default(
        box_half=np.asarray(half, np.float32)).derive_mass()
    dims = compute_grid_dims(SHAPE_BOX, half, (0, 0, 0), 0.28)

    ref = _run(state, params, dims, "brute", n_sub=3)
    got = _run(state, params, dims, "brute_pallas", n_sub=3)

    err_p = np.abs(np.asarray(ref.pos) - np.asarray(got.pos)).max()
    assert err_p < 1e-4, f"pos diverged: {err_p}"
    # ghosts pinned: zero velocity, rest density
    gm = np.asarray(got.ghost) > 0
    assert np.abs(np.asarray(got.vel)[gm]).max() == 0.0
    np.testing.assert_allclose(np.asarray(got.density)[gm], 1000.0)
