"""Plane-table geometry + construction for the Pallas sweep kernels.

The Pallas neighbor engine (``pallas_sweeps.py``) consumes per-field
"cell-block planes": dense ``[ny+2, n_chunks, K, CW + 2*H]`` f32 arrays
where

- ``ny+2``    = y cell rows with a +-1 halo (gravity is -Y, so empty-space
                skipping is most effective when y is the program axis),
- ``K``       = cell capacity (slot index, the f32 sublane dim = 8, so
                each (row, chunk) block is a full-VPU ``(K, CWH)`` tile),
- lanes       = the (z, x) plane flattened as ``zx = zp * nxp + xp`` with
                per-axis +-1 halos baked in (``nxp = nx+2``), chunked into
                ``n_chunks`` windows of ``CW`` lanes, each carrying
                ``H = nxp + 1`` extra halo lanes per side so that every
                neighbor-cell offset (dy, dz, dx) is a *static lane slice*:
                ``lane_off = H + dz * nxp + dx``.

Cells beyond the container grid and empty slots hold a far-away sentinel
position, so the ``r^2 < h^2`` test eliminates them with no flag traffic
(same trick as ``binned.py``).

The construction path is: y-major cell keys -> 9-operand ``lax.sort`` ->
per-cell rank -> one ascending packed row scatter into the padded table ->
transpose to slot-major planes -> chunk.  See SURVEY.md §7 ("hard parts")
for why sort-based binning replaces the reference's atomicExchange linked
lists (``BuildGrid.comp:36``).
"""
from __future__ import annotations

import math
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sph_tpu.core.params import FluidParams, SimConfig, grid_min as grid_min_fn
from sph_tpu.core.state import ParticleState

SENTINEL_POS = 1.0e7

# meta bit packing: oid[0:22] ghost[22] active[23] valid[24] contrib[25]
# face+1[26:29] color_group[29]
_OID_BITS = 22
_OID_MASK = (1 << _OID_BITS) - 1


class PlaneGeom(NamedTuple):
    nx: int
    ny: int
    nz: int
    cap: int        # K slots per cell
    n_chunks: int

    @property
    def nxp(self) -> int:
        return self.nx + 2

    @property
    def nyp(self) -> int:
        return self.ny + 2

    @property
    def nzp(self) -> int:
        return self.nz + 2

    @property
    def num_cells(self) -> int:
        return self.nx * self.ny * self.nz

    @property
    def nzx(self) -> int:
        return self.nzp * self.nxp

    @property
    def halo(self) -> int:
        return self.nxp + 1

    @property
    def cw(self) -> int:
        return -(-self.nzx // self.n_chunks)

    @property
    def nzxp(self) -> int:
        return self.cw * self.n_chunks

    @property
    def cwh(self) -> int:
        return self.cw + 2 * self.halo

    @property
    def padded_cells(self) -> int:
        return self.nyp * self.nzp * self.nxp


def geom_for(config: SimConfig, max_cwh: int = 0) -> PlaneGeom:
    if max_cwh <= 0:
        max_cwh = getattr(config, "plane_max_cwh", 1536)
    nx, ny, nz = config.grid_dims
    nzx = (nz + 2) * (nx + 2)
    halo = nx + 3
    n_chunks = 1
    while -(-nzx // n_chunks) + 2 * halo > max_cwh:
        n_chunks += 1
    return PlaneGeom(nx=nx, ny=ny, nz=nz, cap=config.cell_capacity,
                     n_chunks=n_chunks)


def compute_keys_ymajor(pos: jax.Array, valid: jax.Array,
                        params: FluidParams, geom: PlaneGeom) -> jax.Array:
    """y-major cell key ``x + nx*(z + nz*y)``; invalid -> spill key C."""
    from sph_tpu.core.params import grid_cell_coords
    c = grid_cell_coords(pos, params, (geom.nx, geom.ny, geom.nz))
    key = c[:, 0] + geom.nx * (c[:, 2] + geom.nz * c[:, 1])
    return jnp.where(valid > 0, key, geom.num_cells)


def pack_meta(state: ParticleState, contrib: jax.Array) -> jax.Array:
    return (
        (state.orig_id & _OID_MASK)
        | ((state.ghost & 1) << 22)
        | ((state.active & 1) << 23)
        | ((state.valid & 1) << 24)
        | (contrib.astype(jnp.int32) << 25)
        | (((jnp.clip(state.face, -1, 5) + 1) & 7) << 26)
        | ((state.color_group & 1) << 29)
    )


class MetaFields(NamedTuple):
    orig_id: jax.Array
    ghost: jax.Array
    active: jax.Array
    valid: jax.Array
    contrib: jax.Array
    face: jax.Array
    color_group: jax.Array


def unpack_meta(meta: jax.Array) -> MetaFields:
    return MetaFields(
        orig_id=meta & _OID_MASK,
        ghost=(meta >> 22) & 1,
        active=(meta >> 23) & 1,
        valid=(meta >> 24) & 1,
        contrib=(meta >> 25) & 1,
        face=((meta >> 26) & 7) - 1,
        color_group=(meta >> 29) & 1,
    )


class Sorted(NamedTuple):
    key: jax.Array    # [N] i32 ascending (spill = num_cells)
    rank: jax.Array   # [N] i32 index within cell
    pos: jax.Array    # [N,3]
    vel: jax.Array    # [N,3]
    foam: jax.Array   # [N]
    meta: jax.Array   # [N] i32 packed


def sort_particles(state: ParticleState, key: jax.Array,
                   contrib: jax.Array) -> Sorted:
    """9-operand stable sort by cell key (the TPU BuildGrid)."""
    n = state.n
    meta = pack_meta(state, contrib)
    skey, px, py, pz, vx, vy, vz, foam, smeta = lax.sort(
        (key, state.pos[:, 0], state.pos[:, 1], state.pos[:, 2],
         state.vel[:, 0], state.vel[:, 1], state.vel[:, 2],
         state.foam, meta),
        dimension=0, num_keys=1, is_stable=True)
    iota = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    seg_start = lax.associative_scan(jnp.maximum,
                                     jnp.where(is_start, iota, 0))
    return Sorted(key=skey, rank=iota - seg_start,
                  pos=jnp.stack([px, py, pz], -1),
                  vel=jnp.stack([vx, vy, vz], -1),
                  foam=foam, meta=smeta)


def to_particle_state(s: Sorted, density: jax.Array, pressure: jax.Array,
                      acc: jax.Array) -> ParticleState:
    m = unpack_meta(s.meta)
    return ParticleState(
        pos=s.pos, vel=s.vel, acc=acc, density=density, pressure=pressure,
        foam=s.foam, ghost=m.ghost, active=m.active, face=m.face,
        color_group=m.color_group, valid=m.valid, orig_id=m.orig_id)


def padded_cell_index(key: jax.Array, geom: PlaneGeom) -> jax.Array:
    """Interior cell key -> index in the (y,z,x)-padded cell space."""
    x = key % geom.nx
    z = (key // geom.nx) % geom.nz
    y = key // (geom.nx * geom.nz)
    return (x + 1) + geom.nxp * ((z + 1) + geom.nzp * (y + 1))


def chunk_lanes(plane: jax.Array, geom: PlaneGeom,
                sentinel: float) -> jax.Array:
    """[..., NZX] -> [..., n_chunks, CWH] with halo + tail padding baked in."""
    lead = plane.shape[:-1]
    h, cw = geom.halo, geom.cw
    tail = geom.nzxp - geom.nzx + h
    full = jnp.pad(plane, [(0, 0)] * len(lead) + [(h, tail)],
                   constant_values=sentinel)
    chunks = [lax.slice_in_dim(full, c * cw, c * cw + geom.cwh, axis=-1)
              for c in range(geom.n_chunks)]
    return jnp.stack(chunks, axis=-2)


class Planes(NamedTuple):
    """Cell-block field planes [nyp, n_chunks, K, CWH] + occupancy."""
    px: jax.Array
    py: jax.Array
    pz: jax.Array
    vx: jax.Array
    vy: jax.Array
    vz: jax.Array
    ghost_on: jax.Array
    pidx: jax.Array      # sorted particle index per slot (-1 = empty)
    occ_rows: jax.Array  # [nyp, n_chunks] i32: max slot bound per row & chunk
    in_bin: jax.Array    # [N] bool
    overflow: jax.Array  # [] i32


def _interpret_default() -> bool:
    import jax
    return jax.default_backend() not in ("tpu", "axon")


def default_expand_method(geom: PlaneGeom) -> str:
    """Measured on v5e: the lane-major butterfly wins for small tables
    (6.4 vs 10.3 ms at 131k) but its log2(slots) rounds scale with table
    size; the MXU one-hot kernel wins at 1M (62.7 vs 73.7 ms)."""
    return "mxu" if geom.padded_cells * geom.cap >= 4_000_000 else "butterfly"


def build_planes(s: Sorted, params: FluidParams, geom: PlaneGeom,
                 method: str = "auto") -> Planes:
    """``method``: "auto" (size-based pick), "mxu" (one-hot matmul
    kernel, overflow-guarded), "butterfly" (lane-major conditional
    shifts), "scatter" (XLA rows)."""
    if method == "auto":
        method = default_expand_method(geom)
    k = geom.cap
    num_cells = geom.num_cells
    pc_count = geom.padded_cells
    n = s.key.shape[0]

    m = unpack_meta(s.meta)
    contrib = m.contrib > 0
    in_bin = (s.rank < k) & (s.key < num_cells)

    overflow = jnp.sum(((s.rank >= k) & (s.key < num_cells)
                        & (m.valid > 0)).astype(jnp.int32))

    src_pos = jnp.where(contrib[:, None], s.pos, SENTINEL_POS)
    # field 7 = sorted particle index: rides through the slot tables so
    # the MXU gather can build its one-hot from the slot side (empty
    # slots carry -1)
    pidx = jnp.arange(n, dtype=jnp.float32)
    packed = jnp.concatenate([
        src_pos, s.vel,
        (contrib & (m.ghost > 0)).astype(jnp.float32)[:, None],
        pidx[:, None],
    ], axis=1)                                            # [N, 8]

    pc = padded_cell_index(s.key, geom)
    key_p = jnp.where(s.key < num_cells, pc, pc_count)

    from sph_tpu.neighbors import expand as EX
    eg = EX.ExpandGeom(ny=geom.nyp, cps=geom.nzp * geom.nxp, cap=k)
    hole = jnp.concatenate([
        jnp.full((3,), SENTINEL_POS, jnp.float32),
        jnp.zeros((4,), jnp.float32),
        jnp.full((1,), -1.0, jnp.float32)])       # empty pidx = -1

    if method == "mxu":
        # one-hot MXU permutation kernel (neighbors/mxu_permute.py):
        # table blocks materialize as onehot @ particle-row matmuls.
        from sph_tpu.neighbors import mxu_permute as MX
        cpb, max_p = 128, 512
        _, in_slot, starts, win_ovf = MX.expand_window_ids(
            key_p, s.rank, geom, cpb, max_p)
        nsc, _, _ = MX.expand_windows(geom, cpb)
        interp = _interpret_default()

        def via_mxu(pk):
            out = MX.expand_call(pk, in_slot, starts, geom, hole,
                                 cells_per_block=cpb, max_p=max_p,
                                 interpret=interp)
            return out[:, :, :, :geom.nzx]            # [8, nyp, K, NZX]

        def via_scatter(pk):
            # rare overflow fallback: per-field 1D scatters into k-MAJOR
            # flat tables, so both cond branches carry the same sane
            # (cells-minor) physical layout — mixing a k-minor branch in
            # makes XLA tile the whole cond output at 16x padding
            # (27 GB HBM at the 512k-rotated grid; see PERF.md)
            cps = geom.nzp * geom.nxp
            total = k * pc_count
            in2 = (s.rank < k) & (key_p < pc_count)
            slot2 = jnp.where(in2, s.rank * pc_count + key_p, total)
            fields = []
            for i in range(8):
                t = jnp.full((total + 1,), hole[i], jnp.float32)
                t = t.at[slot2].set(pk[:, i], mode="drop",
                                    unique_indices=True)
                fields.append(t[:total])
            t8 = jnp.stack(fields)                     # [8, K*PC]
            return jnp.transpose(
                t8.reshape(8, k, geom.nyp, cps), (0, 2, 1, 3))

        # (cell-rank overflow needs no fallback here: rank >= K maps to
        # the dropped slot, same as the scatter path's spill row)
        planes = lax.cond(win_ovf, via_scatter, via_mxu, packed)
    else:
        if method == "butterfly":
            # lane-major monotone butterfly expand (neighbors/expand.py)
            table_t = EX.expand_T(packed, key_p, s.rank, overflow, eg,
                                  hole)
        else:
            table_t = EX.expand_scatter_T(packed, key_p, s.rank, eg, hole)
        # [nyp, 8, NZX*K] -> [nyp, 8, NZX, K] -> [8, nyp, K, NZX]
        planes = jnp.transpose(
            table_t.reshape(geom.nyp, 8, geom.nzx, k), (1, 0, 3, 2))

    # Slot bound per cell (max occupied slot + 1) from the sentinel
    # pattern, maxed over each chunk window + halo.  Bit 4 carries a
    # dest gate: "this row's CENTER window (no halo) holds any FLUID
    # particle" — windows holding only ghosts/empties (e.g. the wall
    # shells above the fluid surface) are pure neighbor *sources*, so
    # the kernels skip their pair loops entirely.
    occupied = planes[0] < SENTINEL_POS * 0.5            # [nyp, K, NZX]
    slot_ids = jnp.arange(1, k + 1, dtype=jnp.int32).reshape(1, k, 1)
    occ_cell = jnp.max(jnp.where(occupied, slot_ids, 0), axis=1)  # [nyp, NZX]
    occ_chunk = jnp.max(chunk_lanes(occ_cell, geom, 0.0), axis=-1)  # [nyp, nc]
    fluid_cell = jnp.any(occupied & (planes[6] <= 0.0), axis=1)   # [nyp, NZX]
    pad_tail = geom.nzxp - geom.nzx
    fluid_win = jnp.pad(fluid_cell, ((0, 0), (0, pad_tail))) \
        .reshape(geom.nyp, geom.n_chunks, geom.cw)
    dest_any = jnp.any(fluid_win, axis=-1).astype(jnp.int32)      # [nyp, nc]
    occ_chunk = occ_chunk | (dest_any << 4)

    def cp(i, sent=0.0):
        # [nyp, K, NZX] -> [nyp, nc, K, CWH] via direct slices: the old
        # chunk-then-transpose route let XLA pick a K-minor layout for
        # the [nyp, K, nc*CWH] intermediate (16x tile padding -> HBM OOM
        # at 512k-rotated grid sizes, see PERF.md)
        h, cw = geom.halo, geom.cw
        tail = geom.nzxp - geom.nzx + h
        full = jnp.pad(planes[i], ((0, 0), (0, 0), (h, tail)),
                       constant_values=sent)
        chunks = [lax.slice_in_dim(full, c * cw, c * cw + geom.cwh,
                                   axis=-1)
                  for c in range(geom.n_chunks)]
        return jnp.stack(chunks, axis=1)

    return Planes(
        px=cp(0, SENTINEL_POS), py=cp(1, SENTINEL_POS),
        pz=cp(2, SENTINEL_POS),
        vx=cp(3), vy=cp(4), vz=cp(5), ghost_on=cp(6), pidx=cp(7, -1.0),
        occ_rows=occ_chunk, in_bin=in_bin, overflow=overflow)


def center_from_chunks(plane: jax.Array, geom: PlaneGeom) -> jax.Array:
    """[nyp, n_chunks, K, CWH] src plane -> interior [ny, n_chunks, K, CW]
    (the kernel-output layout)."""
    h = geom.halo
    return plane[1:1 + geom.ny, :, :, h:h + geom.cw]


def rechunk_output(arr: jax.Array, geom: PlaneGeom,
                   sentinel: float) -> jax.Array:
    """Kernel output [ny, n_chunks, K, CW] -> src-style plane
    [nyp, n_chunks, K, CWH] (re-add y halo rows + lane halos)."""
    # -> [ny, K, NZXp] -> trim lane padding -> [ny, K, NZX]
    flat = jnp.transpose(arr, (0, 2, 1, 3)).reshape(
        geom.ny, geom.cap, geom.nzxp)[..., :geom.nzx]
    padded = jnp.pad(flat, ((1, 1), (0, 0), (0, 0)),
                     constant_values=sentinel)            # [nyp, K, NZX]
    ch = chunk_lanes(padded, geom, sentinel)              # [nyp, K, nc, CWH]
    return jnp.transpose(ch, (0, 2, 1, 3))


def out_flat_index(s: Sorted, geom: PlaneGeom) -> jax.Array:
    """Per sorted particle: flat index into stacked kernel outputs
    ``[ny, n_chunks, K, CW]`` (clamped for out-of-bin particles; mask
    separately)."""
    key = jnp.minimum(s.key, geom.num_cells - 1)
    rank = jnp.minimum(s.rank, geom.cap - 1)
    x = key % geom.nx
    z = (key // geom.nx) % geom.nz
    y = key // (geom.nx * geom.nz)
    lane = (z + 1) * geom.nxp + (x + 1)
    c = lane // geom.cw
    li = lane - c * geom.cw
    return ((y * geom.n_chunks + c) * geom.cap + rank) * geom.cw + li
