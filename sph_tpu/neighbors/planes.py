"""Table geometry + construction for the Pallas sweep kernels.

The Pallas neighbor engine (``pallas_sweeps.py``) consumes dense
"cell-block tables": ONE stacked ``[F, ny+2, n_chunks, K, CW]`` f32
array per particle family (fluid / ghost) where

- ``ny+2``    = y cell rows with a +-1 sentinel halo (gravity is -Y, so
                empty-space skipping is most effective when y is the
                program axis),
- ``K``       = cell capacity (slot index, the f32 sublane dim, so each
                (row, chunk) block is a stack of full-VPU ``(K, CW)``
                tiles),
- lanes       = the (z, x) plane flattened as ``zx = zp * nxp + xp``
                with per-axis +-1 border cells baked in
                (``nxp = nx + 2``), chunked into ``n_chunks`` disjoint
                windows of ``CW`` lanes (CW is 128-aligned so the MXU
                expand kernel can write chunk slices directly).

Unlike round 1 there are NO baked halo lanes: each kernel program
fetches the 3x3 neighboring (y, chunk) blocks and assembles the
halo-extended ``(K, CW + 2H)`` source rows in VMEM (the same clamped
re-fetch trick the force kernel already used for the density planes —
junk lanes introduced by edge clamping are provably never read by real
destination cells, see ``pallas_sweeps._ext_rows``).

Ghost boundary particles live in their OWN static position-only table:
ghosts never move, carry rho = rho0 / pressure 0 / velocity 0
(``shaders/SPHFluid.comp:71-83``), so their sweeps need no velocity, no
density and no output slots — and keeping them out of the fluid tables
un-poisons the occupancy gate that drives the kernels' slot loops
(PERF.md finding 1).

The construction path is: y-major cell keys -> 9-operand ``lax.sort``
-> per-cell rank -> expand (MXU one-hot matmul kernel or butterfly
shifts) -> stacked dense chunks.  See SURVEY.md §7 for why sort-based
binning replaces the reference's atomicExchange linked lists
(``BuildGrid.comp:36``).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

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

# occ_rows bit packing (see FluidTables.occ_rows)
OCC_BITS = 5
OCC_MASK = (1 << OCC_BITS) - 1
DEST_BIT = 1 << OCC_BITS
GOCC_SHIFT = OCC_BITS + 1


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
        """Lane-halo width: one z row +- one x cell."""
        return self.nxp + 1

    @property
    def cw(self) -> int:
        """Chunk width in lanes; 128-aligned so MXU expand windows tile
        chunks exactly."""
        return 128 * (-(-self.nzx // (128 * self.n_chunks)))

    @property
    def nzxp(self) -> int:
        return self.cw * self.n_chunks

    @property
    def cwh(self) -> int:
        """Halo-extended width of the in-kernel assembled source rows."""
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
    max_cw = max(128, max_cwh - 2 * halo)
    n_chunks = 1
    while 128 * (-(-nzx // (128 * n_chunks))) > max_cw:
        n_chunks += 1
    g = PlaneGeom(nx=nx, ny=ny, nz=nz, cap=config.cell_capacity,
                  n_chunks=n_chunks)
    # the in-kernel halo assembly reads at most H lanes from each
    # neighboring chunk, so chunks must be at least one halo wide
    assert g.cw >= g.halo, (g.cw, g.halo)
    return g


def compute_keys_ymajor(pos: jax.Array, mask: jax.Array,
                        params: FluidParams, geom: PlaneGeom) -> jax.Array:
    """y-major cell key ``x + nx*(z + nz*y)``; mask=False -> spill key C."""
    from sph_tpu.core.params import grid_cell_coords
    c = grid_cell_coords(pos, params, (geom.nx, geom.ny, geom.nz))
    key = c[:, 0] + geom.nx * (c[:, 2] + geom.nz * c[:, 1])
    return jnp.where(mask, key, geom.num_cells)


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
    return Sorted(key=skey, rank=_ranks(skey),
                  pos=jnp.stack([px, py, pz], -1),
                  vel=jnp.stack([vx, vy, vz], -1),
                  foam=foam, meta=smeta)


def _ranks(skey: jax.Array) -> jax.Array:
    """Index-within-equal-key-run for an ascending key array."""
    n = skey.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    seg_start = lax.associative_scan(jnp.maximum,
                                     jnp.where(is_start, iota, 0))
    return iota - seg_start


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


class FluidTables(NamedTuple):
    """Stacked dense fluid source tables + occupancy.

    ``tbl``: [7, nyp, nc, K, CW] — px py pz vx vy vz pidx (pidx = sorted
    particle index as f32; empty slots carry -1 and SENTINEL_POS).
    ``occ_rows``: [nyp, nc] i32 — bits0:5 fluid max-slot bound over the
    chunk window + its +-H halo lanes, bit5 "window interior holds any
    fluid" dest gate, bits6:11 ghost occ bound (merged in by substep).
    """
    tbl: jax.Array
    occ_rows: jax.Array
    in_bin: jax.Array    # [N] bool
    overflow: jax.Array  # [] i32


class GhostTables(NamedTuple):
    """Static position-only ghost source table (built once per frame)."""
    tbl: jax.Array       # [3, nyp, nc, K, CW]
    occ: jax.Array       # [nyp, nc] i32 ghost occ bound incl halo
    overflow: jax.Array  # [] i32


def _interpret_default() -> bool:
    import jax
    return jax.default_backend() not in ("tpu", "axon")


def default_expand_method(geom: PlaneGeom) -> str:
    """Measured on v5e: the lane-major butterfly wins for small tables
    (6.4 vs 10.3 ms at 131k) but its log2(slots) rounds scale with table
    size; the MXU one-hot kernel wins at 1M (62.7 vs 73.7 ms)."""
    return "mxu" if geom.padded_cells * geom.cap >= 4_000_000 else "butterfly"


def _expand_tables(packed: jax.Array, key_p: jax.Array, rank: jax.Array,
                   overflow: jax.Array, geom: PlaneGeom, hole: jax.Array,
                   method: str) -> jax.Array:
    """[N, F] sorted rows -> [F, nyp, nc, K, CW] stacked dense tables."""
    if method == "auto":
        method = default_expand_method(geom)
    k = geom.cap
    f = packed.shape[1]
    pc_count = geom.padded_cells

    from sph_tpu.neighbors import expand as EX
    eg = EX.ExpandGeom(ny=geom.nyp, cps=geom.nzx, cap=k)

    if method == "mxu":
        from sph_tpu.neighbors import mxu_permute as MX
        cpb, max_p = 128, 512
        _, in_slot, starts, win_ovf = MX.expand_window_ids(
            key_p, rank, geom, cpb, max_p)
        interp = _interpret_default()

        def via_mxu(pk):
            return MX.expand_call(pk, in_slot, starts, geom, hole,
                                  cells_per_block=cpb, max_p=max_p,
                                  interpret=interp)

        def via_scatter(pk):
            # rare overflow fallback: per-field 1D scatters into k-MAJOR
            # flat tables over the lane-PADDED cell space (so the tail
            # lanes beyond nzx carry the hole fill, not junk), keeping
            # both cond branches in the same sane cells-minor layout —
            # mixing a k-minor branch in makes XLA tile the whole cond
            # output at 16x padding (27 GB HBM; see PERF.md)
            ppc = geom.nyp * geom.nzxp
            total = k * ppc
            yp = key_p // geom.nzx
            lane = key_p - yp * geom.nzx
            key_pp = jnp.where(key_p < pc_count,
                               yp * geom.nzxp + lane, ppc)
            in2 = (rank < k) & (key_pp < ppc)
            slot2 = jnp.where(in2, rank * ppc + key_pp, total)
            fields = []
            for i in range(f):
                t = jnp.full((total + 1,), hole[i], jnp.float32)
                t = t.at[slot2].set(pk[:, i], mode="drop",
                                    unique_indices=True)
                fields.append(t[:total])
            t8 = jnp.stack(fields)                     # [F, K*PPC]
            t5 = t8.reshape(f, k, geom.nyp, geom.n_chunks, geom.cw)
            return jnp.transpose(t5, (0, 2, 3, 1, 4))

        # (cell-rank overflow needs no fallback here: rank >= K maps to
        # the dropped slot, same as the scatter path's spill row)
        return lax.cond(win_ovf, via_scatter, via_mxu, packed)

    if method == "butterfly":
        table_t = EX.expand_T(packed, key_p, rank, overflow, eg, hole)
    else:
        table_t = EX.expand_scatter_T(packed, key_p, rank, eg, hole)
    # [nyp, F, nzx*K] -> pad the lane-cell dim WITH THE HOLE VALUES
    # (zero-padding would plant fake sources at the origin) ->
    # [F, nyp, nc, K, CW].  Padding happens on the flat slot dim
    # (lane-major, sane layout); the k-minor intermediate below is the
    # same deferred-bitcast transpose the round-1 path used (XLA fuses
    # it; see PERF.md 8).
    pad = (geom.nzxp - geom.nzx) * k
    if pad:
        fill = jnp.broadcast_to(hole[None, :, None],
                                (geom.nyp, f, pad)).astype(table_t.dtype)
        table_t = jnp.concatenate([table_t, fill], axis=2)
    t5 = table_t.reshape(geom.nyp, f, geom.n_chunks, geom.cw, k)
    return jnp.transpose(t5, (1, 0, 2, 4, 3))


def _window_occ(counts_p: jax.Array, geom: PlaneGeom, cap: int
                ) -> Tuple[jax.Array, jax.Array]:
    """Per-padded-cell counts [nyp, nzx] -> (window occ bound incl +-H
    halo lanes [nyp, nc], window-interior-nonempty gate [nyp, nc])."""
    occ_cell = jnp.minimum(counts_p, cap).astype(jnp.int32)
    occ_flat = jnp.pad(occ_cell, ((0, 0), (0, geom.nzxp - geom.nzx)))
    win = occ_flat.reshape(geom.nyp, geom.n_chunks, geom.cw)
    h = geom.halo
    interior = jnp.max(win, axis=-1)                       # [nyp, nc]
    tails = jnp.max(win[:, :, geom.cw - h:], axis=-1)
    heads = jnp.max(win[:, :, :h], axis=-1)
    z = jnp.zeros((geom.nyp, 1), jnp.int32)
    left = jnp.concatenate([z, tails[:, :-1]], axis=1)
    right = jnp.concatenate([heads[:, 1:], z], axis=1)
    occ = jnp.maximum(jnp.maximum(interior, left), right)
    return occ, (interior > 0).astype(jnp.int32)


def _padded_counts(key_p: jax.Array, geom: PlaneGeom) -> jax.Array:
    """[N] padded-cell keys (spill = padded_cells) -> [nyp, nzx] counts."""
    pc_count = geom.padded_cells
    counts = jnp.zeros((pc_count + 1,), jnp.int32).at[key_p].add(
        1, mode="drop")
    return counts[:pc_count].reshape(geom.nyp, geom.nzx)


def build_fluid_tables(s: Sorted, params: FluidParams, geom: PlaneGeom,
                       method: str = "auto") -> FluidTables:
    """``method``: "auto" (size-based pick), "mxu" (one-hot matmul
    kernel, overflow-guarded), "butterfly" (lane-major conditional
    shifts), "scatter" (XLA rows).

    ``s`` must be sorted with FLUID keys (ghost/invalid rows spilled to
    ``num_cells``), so every table slot is a live fluid particle."""
    k = geom.cap
    num_cells = geom.num_cells
    n = s.key.shape[0]

    in_bin = (s.rank < k) & (s.key < num_cells)
    overflow = jnp.sum(((s.rank >= k) & (s.key < num_cells))
                       .astype(jnp.int32))

    pidx = jnp.arange(n, dtype=jnp.float32)
    packed = jnp.concatenate([s.pos, s.vel, pidx[:, None]], axis=1)

    pc = padded_cell_index(s.key, geom)
    key_p = jnp.where(s.key < num_cells, pc, geom.padded_cells)
    hole = jnp.concatenate([
        jnp.full((3,), SENTINEL_POS, jnp.float32),
        jnp.zeros((3,), jnp.float32),
        jnp.full((1,), -1.0, jnp.float32)])       # empty pidx = -1

    tbl = _expand_tables(packed, key_p, s.rank, overflow, geom, hole,
                         method)
    occ, dest = _window_occ(_padded_counts(key_p, geom), geom, k)
    occ_rows = occ | (dest << OCC_BITS)
    return FluidTables(tbl=tbl, occ_rows=occ_rows, in_bin=in_bin,
                       overflow=overflow)


def build_ghost_tables(state: ParticleState, params: FluidParams,
                       geom: PlaneGeom, method: str = "auto"
                       ) -> GhostTables:
    """Static ghost source table: positions of contributing ghosts only.

    Ghosts never move and per-face activation is fixed within a frame,
    so callers build this ONCE per ``run_substeps`` and thread it
    through the scan (``engine/step.py``)."""
    contrib = state.contrib_mask(params.ghost_face_active)
    gmask = (state.valid > 0) & (state.ghost > 0) & contrib
    key = compute_keys_ymajor(state.pos, gmask, params, geom)
    skey, px, py, pz = lax.sort(
        (key, state.pos[:, 0], state.pos[:, 1], state.pos[:, 2]),
        dimension=0, num_keys=1, is_stable=True)
    rank = _ranks(skey)
    k = geom.cap
    overflow = jnp.sum(((rank >= k) & (skey < geom.num_cells))
                       .astype(jnp.int32))
    packed = jnp.stack([px, py, pz], axis=1)
    pc = padded_cell_index(skey, geom)
    key_p = jnp.where(skey < geom.num_cells, pc, geom.padded_cells)
    hole = jnp.full((3,), SENTINEL_POS, jnp.float32)
    tbl = _expand_tables(packed, key_p, rank, overflow, geom, hole,
                         method)
    occ, _ = _window_occ(_padded_counts(key_p, geom), geom, k)
    return GhostTables(tbl=tbl, occ=occ, overflow=overflow)


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
