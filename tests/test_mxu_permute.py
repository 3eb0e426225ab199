"""MXU one-hot permutation kernels vs the reference data movements."""
import numpy as np

import jax
import jax.numpy as jnp

from sph_tpu.core import state as S
from sph_tpu.core.params import FluidParams, SimConfig, compute_grid_dims
from sph_tpu.neighbors import expand as EX
from sph_tpu.neighbors import mxu_permute as MX
from sph_tpu.neighbors import planes as PL


def _sorted_setup(n=1500, half=(3.0, 3.0, 3.0), seed=0):
    spawn = S.spawn_standard(n, h=0.28, box_half=half, seed=seed)
    state = S.state_from_spawn(spawn)
    params = FluidParams.default(
        box_half=np.asarray(half, np.float32)).derive_mass()
    dims = compute_grid_dims(0, half, (0, 0, 0), 0.28)
    sim = SimConfig(n=state.n, grid_dims=dims, neighbor_impl="pallas")
    geom = PL.geom_for(sim)
    key = PL.compute_keys_ymajor(state.pos, state.valid, params, geom)
    contrib = state.contrib_mask(params.ghost_face_active)
    s = PL.sort_particles(state, key, contrib)
    return s, params, geom


def test_expand_mxu_matches_scatter():
    s, params, geom = _sorted_setup()
    n = s.key.shape[0]
    m = PL.unpack_meta(s.meta)
    contrib = m.contrib > 0
    src_pos = jnp.where(contrib[:, None], s.pos, PL.SENTINEL_POS)
    packed = jnp.concatenate([
        src_pos, s.vel,
        (contrib & (m.ghost > 0)).astype(jnp.float32)[:, None],
        jnp.zeros((n, 1), jnp.float32)], axis=1)
    pc = PL.padded_cell_index(s.key, geom)
    key_p = jnp.where(s.key < geom.num_cells, pc, geom.padded_cells)
    hole = jnp.concatenate([
        jnp.full((3,), PL.SENTINEL_POS, jnp.float32),
        jnp.zeros((5,), jnp.float32)])

    cpb, max_p = 32, 256
    win, in_slot, starts, ovf = MX.expand_window_ids(
        key_p, s.rank, geom, cpb, max_p)
    assert not bool(ovf)
    out = MX.expand_call(packed, in_slot, starts, geom, hole,
                         cells_per_block=cpb, max_p=max_p, interpret=True)

    eg = EX.ExpandGeom(ny=geom.nyp, cps=geom.nzp * geom.nxp, cap=geom.cap)
    ref = EX.expand_scatter_T(packed, key_p, s.rank, eg, hole)
    # ref: [nyp, F, cps*K] slot = cell*K + k; out: [F, nyp, K, nsc*cpb]
    nsc, _, _ = MX.expand_windows(geom, cpb)
    cps = geom.nzp * geom.nxp
    ref4 = np.asarray(ref).reshape(geom.nyp, 8, cps, geom.cap)
    out4 = np.asarray(out)[:, :, :, :cps * 1]  # [F, nyp, K, nsc*cpb]
    # compare cell-by-cell: out[f, y, k, cell] == ref[y, f, cell, k]
    out_cmp = out4[:, :, :, :cps]
    ref_cmp = np.transpose(ref4, (1, 0, 3, 2))
    np.testing.assert_array_equal(out_cmp, ref_cmp)


def test_gather_mxu_matches_row_gather():
    s, params, geom = _sorted_setup()
    n = s.key.shape[0]
    # fake stacked "kernel outputs": value = flat slot index, per field f
    shape = (geom.ny, geom.n_chunks, geom.cap, geom.cw)
    base = jnp.arange(np.prod(shape), dtype=jnp.float32).reshape(shape)

    # real pidx planes from build_planes (the last stacked field)
    planes = PL.build_planes(s, params, geom, method="scatter")
    pidx_c = PL.center_from_chunks(planes.pidx, geom)
    stacked = jnp.stack(
        [base + 1000.0 * f for f in range(4)] + [pidx_c], axis=0)

    lpb, max_p = 32, 256
    win, in_slot, starts, ovf = MX.gather_window_ids(
        s.key, s.rank, geom, lpb, max_p)
    assert not bool(ovf)
    per = MX.gather_call(stacked, starts, geom, n,
                         lanes_per_block=lpb, max_p=max_p, interpret=True)

    flat = stacked[:4].reshape(4, -1).T
    ref = np.asarray(flat[PL.out_flat_index(s, geom)])
    got = np.asarray(per)
    in_bin = np.asarray((s.rank < geom.cap) & (s.key < geom.num_cells))
    np.testing.assert_array_equal(got[in_bin], ref[in_bin])
