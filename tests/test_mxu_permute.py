"""MXU one-hot expand kernel vs the XLA scatter reference, plus the
row-gather index round-trip over the class-split dense tables."""
import numpy as np

import jax.numpy as jnp

from sph_tpu.core import state as S
from sph_tpu.core.params import FluidParams, SimConfig, compute_grid_dims
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


def _assert_tables_equal(ft_x, ft_y):
    np.testing.assert_array_equal(np.asarray(ft_x.tbl_a),
                                  np.asarray(ft_y.tbl_a))
    np.testing.assert_array_equal(np.asarray(ft_x.tbl_b),
                                  np.asarray(ft_y.tbl_b))
    np.testing.assert_array_equal(np.asarray(ft_x.occ_rows),
                                  np.asarray(ft_y.occ_rows))


def test_expand_mxu_matches_scatter():
    """The one-hot matmul expand writes bit-identical class tables to
    the XLA scatter path (same [F, nyq, nc, 2cap, CW] layout/holes)."""
    s, params, geom = _sorted_setup()
    ft_mxu = PL.build_fluid_tables(s, params, geom, method="mxu")
    ft_ref = PL.build_fluid_tables(s, params, geom, method="scatter")
    _assert_tables_equal(ft_mxu, ft_ref)


def test_expand_butterfly_matches_scatter():
    s, params, geom = _sorted_setup(seed=3)
    ft_bf = PL.build_fluid_tables(s, params, geom, method="butterfly")
    ft_ref = PL.build_fluid_tables(s, params, geom, method="scatter")
    _assert_tables_equal(ft_bf, ft_ref)


def test_expand_window_overflow_flag():
    """Tiny max_p must trip the overflow flag so the caller conds into
    the scatter fallback; generous max_p must not."""
    s, params, geom = _sorted_setup()
    pc = PL.padded_cell_index(s.key, geom)
    key_p = jnp.where(s.key < geom.num_cells, pc, geom.padded_cells)
    *_, ovf_small = MX.expand_window_ids(key_p, s.rank, geom, 128, 2)
    *_, ovf_big = MX.expand_window_ids(key_p, s.rank, geom, 128, 4096)
    assert bool(ovf_small)
    assert not bool(ovf_big)


def test_out_flat_index_roundtrip():
    """A particle-index field expanded into the class tables and
    gathered back by out_flat_index recovers each in-bin particle's own
    sorted index (the data path the substep's row gather relies on)."""
    s, params, geom = _sorted_setup(seed=1)
    n = s.key.shape[0]
    pc = PL.padded_cell_index(s.key, geom)
    key_p = jnp.where(s.key < geom.num_cells, pc, geom.padded_cells)
    pidx = jnp.arange(n, dtype=jnp.float32)[:, None]
    hole = jnp.full((1,), -1.0, jnp.float32)
    ovf = jnp.sum(((s.rank >= 2 * geom.cap)
                   & (s.key < geom.num_cells)).astype(jnp.int32))
    ta, tb = PL._expand_tables(pidx, key_p, s.rank, ovf, geom, hole,
                               "scatter")
    flat = jnp.concatenate([ta[0].reshape(-1), tb[0].reshape(-1)])
    per = np.asarray(flat[PL.out_flat_index(s, geom)])
    in_bin = np.asarray((s.rank < 2 * geom.cap)
                        & (s.key < geom.num_cells))
    np.testing.assert_array_equal(per[in_bin],
                                  np.arange(n, dtype=np.float32)[in_bin])
