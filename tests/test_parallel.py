"""Multi-chip sharding: sharded substep must match the single-device oracle."""
import numpy as np
import jax
import jax.numpy as jnp

from sph_tpu.core.params import FluidParams, SimConfig, compute_grid_dims
from sph_tpu.core.state import spawn_standard, state_from_spawn
from sph_tpu.engine.step import SceneBuffers, run_substeps
from sph_tpu.parallel import domain


def test_sharded_matches_single_device():
    spawn = spawn_standard(512, seed=3)
    state = state_from_spawn(spawn, pad_to=512)
    params = FluidParams.default().derive_mass()
    dims = compute_grid_dims(0, np.array([7.0, 7.0, 7.0]),
                             np.array([0.0, 0.0, 0.0]), 0.28)
    cfg = SimConfig(n=512, grid_dims=dims, neighbor_impl="brute")
    buf = SceneBuffers.create(cfg)

    # Single-device reference (brute oracle + container)
    ref, _ = run_substeps(state, params, buf, params.dt, 5, cfg)

    # 8-way sharded
    mesh = domain.make_mesh(8)
    step = domain.make_sharded_substep(mesh, cfg)
    st = domain.shard_state(state, mesh)
    b = buf
    for _ in range(5):
        st, b = step(st, params, b, params.dt)

    v = np.asarray(state.valid) > 0
    dpos = np.abs(np.asarray(ref.pos) - np.asarray(st.pos))[v]
    assert dpos.max() < 1e-5, f"sharded trajectory diverged: {dpos.max()}"
    drho = np.abs(np.asarray(ref.density) - np.asarray(st.density))[v]
    assert drho.max() < 0.1
