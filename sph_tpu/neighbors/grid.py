"""Sort-based spatial cell list.

The reference builds its neighbor grid with an atomicExchange lock-free
linked list (``BuildGrid.comp:36``) and walks ``cellHead``/``particleNext``
chains.  Pointer chasing is hostile to TPUs, so here the grid is a *dense
fixed-capacity bin table* built from a stable sort of the int32 cell keys:

    key_i   = x + nx (y + ny z)        (same flatten as BuildGrid.comp:21)
    order   = argsort(key)             (stable; replaces the atomic insert)
    rank_i  = position of i within its cell's segment
    bins[cell * K + rank] = i          (rank >= K overflows are dropped)

``bins`` then answers "who is in cell c" with plain gathers — exactly the
access pattern XLA and Pallas tile well.  Capacity ``K`` bounds occupancy:
at rest spacing 0.85h a cell of side h holds ~1.6 particles, so the default
K = 8 leaves ~5x compression headroom; ``build_bins`` also reports the
number of dropped (overflowed) particles for observability.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# The 27 neighbor-cell offsets, ordered like the GLSL triple loop
# (dx outer, dz inner — order only matters for float sum reproducibility).
NEIGHBOR_OFFSETS = np.array(
    [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    dtype=np.int32,
)


class CellList(NamedTuple):
    bins: jax.Array        # [num_cells*K + 1] i32 particle index per slot, -1 empty
    coords: jax.Array      # [N,3] i32 per-particle cell coordinate (clamped)
    key: jax.Array         # [N] i32 flattened cell key
    overflow: jax.Array    # [] i32 number of particles dropped from full cells


def cell_coords(pos: jax.Array, grid_min: jax.Array, cell_size: jax.Array,
                dims: Tuple[int, int, int]) -> jax.Array:
    """floor((p - gridMin)/cellSize) clamped into the grid (BuildGrid.comp:30-31)."""
    c = jnp.floor((pos - grid_min[None, :]) / cell_size).astype(jnp.int32)
    hi = jnp.asarray(dims, jnp.int32) - 1
    return jnp.clip(c, 0, hi[None, :])


def flatten_coords(coords: jax.Array, dims: Tuple[int, int, int]) -> jax.Array:
    nx, ny, _ = dims
    return coords[:, 0] + nx * (coords[:, 1] + ny * coords[:, 2])


def build_cell_list(pos: jax.Array, valid: jax.Array, grid_min: jax.Array,
                    cell_size: jax.Array, dims: Tuple[int, int, int],
                    capacity: int, coords: jax.Array = None) -> CellList:
    """Build the dense bin table for one substep.

    ``coords`` overrides the world-frame binning (callers pass
    container-local coords from ``core.params.grid_cell_coords``)."""
    n = pos.shape[0]
    num_cells = int(np.prod(dims))
    if coords is None:
        coords = cell_coords(pos, grid_min, cell_size, dims)
    key = flatten_coords(coords, dims)
    key = jnp.where(valid > 0, key, num_cells)        # padding sorts last

    order = jnp.argsort(key)                          # stable
    sorted_key = key[order]
    first = jnp.searchsorted(sorted_key, sorted_key, side="left")
    rank = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)

    in_bin = (rank < capacity) & (sorted_key < num_cells)
    slot = jnp.where(in_bin, sorted_key * capacity + rank,
                     num_cells * capacity)
    bins = jnp.full((num_cells * capacity + 1,), -1, jnp.int32)
    bins = bins.at[slot].set(order.astype(jnp.int32), mode="drop")
    bins = bins.at[num_cells * capacity].set(-1)      # sentinel stays empty

    overflow = jnp.sum(((rank >= capacity) & (sorted_key < num_cells))
                       .astype(jnp.int32))
    return CellList(bins=bins, coords=coords, key=key, overflow=overflow)


def neighbor_slots(cell_list: CellList, offset: jax.Array,
                   dims: Tuple[int, int, int], capacity: int
                   ) -> Tuple[jax.Array, jax.Array]:
    """Per-particle neighbor indices for one 3D cell offset.

    Returns (j [N,K] particle indices clipped to 0, mask [N,K] validity).
    """
    nx, ny, nz = dims
    nc = cell_list.coords + offset[None, :]
    in_bounds = ((nc[:, 0] >= 0) & (nc[:, 0] < nx)
                 & (nc[:, 1] >= 0) & (nc[:, 1] < ny)
                 & (nc[:, 2] >= 0) & (nc[:, 2] < nz))
    ncell = nc[:, 0] + nx * (nc[:, 1] + ny * nc[:, 2])
    ncell = jnp.where(in_bounds, ncell, 0)
    slots = ncell[:, None] * capacity + jnp.arange(capacity, dtype=jnp.int32)[None, :]
    j = cell_list.bins[slots]                          # [N,K]
    mask = in_bounds[:, None] & (j >= 0)
    return jnp.maximum(j, 0), mask
