"""Table geometry + construction for the Pallas sweep kernels.

The Pallas neighbor engine (``pallas_sweeps.py``) consumes dense
"cell-block tables": TWO stacked ``[F, nyq, n_chunks, 2*cap, CW]`` f32
arrays per particle family (fluid / ghost) — one per RANK CLASS —
where

- ``nyq``     = PAIRS of y cell rows (the y grid gets a +-1 sentinel
                halo, is padded to an even row count, and consecutive
                rows share one tile — gravity is -Y, so y stays the
                program axis for empty-space skipping),
- class       = table A holds cell ranks ``[0, cap)``; table B (the
                SPILL class) holds ranks ``[cap, 2*cap)``, so a
                crowded cell keeps full SPH physics up to
                ``2*cap = cell_capacity`` particles,
- ``2*cap``   = the slot dim ``slot = parity * cap + k`` (which row of
                the pair x rank within the class); each (pair, chunk)
                block is a stack of ``(2*cap, CW)`` VPU tiles and IS
                the dest tile for its class,
- lanes       = the (z, x) plane flattened as ``zx = zp * nxp + xp``
                with per-axis +-1 border cells baked in
                (``nxp = nx + 2``), chunked into ``n_chunks`` disjoint
                windows of ``CW`` lanes (CW is 128-aligned so the MXU
                expand kernel can write chunk slices directly).

Packing two y rows and two rank classes into the slot dim kills the
dest-slot padding that dominated round 1 (PERF.md roadmap #1: K=8 slot
rows for mean cell occupancy ~1.7): occupancy is now bounded PER ROW
PER CLASS (4-bit fields in ``occ_rows``), so the kernels' slot loops
scale with what is actually there, and the spill class closes the
rank>=K physics hole (VERDICT round 1, weak #5) up to
``cell_capacity``; the remainder is counted in ``overflow`` and
asserted zero by ``bench.py``.

There are NO baked halo lanes: each kernel program fetches the 3x3
neighboring (pair, chunk) blocks and assembles halo-extended
``(S, CW + 2H)`` source rows in VMEM (junk lanes introduced by edge
clamping are provably never read by real destination cells, see
``pallas_sweeps._ext_rows``).

Ghost boundary particles live in their OWN static position-only table
with the same slot layout: ghosts never move, carry rho = rho0 /
pressure 0 / velocity 0 (``shaders/SPHFluid.comp:71-83``), so their
sweeps need no velocity, no density and no output slots — and keeping
them out of the fluid tables un-poisons the fluid occupancy gates
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

# occ_rows bit packing, all PER Y ROW (see FluidTables.occ_rows):
#   bits  0:4  fluid class-0 slot bound over the chunk window +-H halo
#   bits  4:8  fluid class-1 (spill) slot bound
#   bits  8:12 ghost class-0 slot bound   (merged in by substep)
#   bits 12:16 ghost class-1 slot bound
#   bit  16    "window interior holds class-0 fluid" dest gate
#   bit  17    "window interior holds class-1 fluid" dest gate
OCC_BITS = 4
OCC_MASK = (1 << OCC_BITS) - 1
OCC_B_SHIFT = 4
GOCC_SHIFT = 8
DEST_A_SHIFT = 16
DEST_B_SHIFT = 17


class PlaneGeom(NamedTuple):
    nx: int
    ny: int
    nz: int
    cap: int        # slots per (row, class): cell_capacity // 2
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
    def nyp_pad(self) -> int:
        """y rows padded to an even count for pair packing."""
        return self.nyp + (self.nyp & 1)

    @property
    def nyq(self) -> int:
        """Row pairs (the kernel/program y axis)."""
        return self.nyp_pad // 2

    @property
    def s_slots(self) -> int:
        """One class table's slot dim: (parity, k) -> 2 * cap."""
        return 2 * self.cap

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
        return self.nyp * self.nzx


def geom_for(config: SimConfig, max_cwh: int = 0) -> PlaneGeom:
    if max_cwh <= 0:
        max_cwh = getattr(config, "plane_max_cwh", 1536)
    assert config.cell_capacity % 2 == 0 and config.cell_capacity >= 2
    nx, ny, nz = config.grid_dims
    nzx = (nz + 2) * (nx + 2)
    halo = nx + 3
    max_cw = max(128, max_cwh - 2 * halo)
    n_chunks = 1
    while 128 * (-(-nzx // (128 * n_chunks))) > max_cw:
        n_chunks += 1
    g = PlaneGeom(nx=nx, ny=ny, nz=nz, cap=config.cell_capacity // 2,
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

    ``tbl_a``/``tbl_b``: [6, nyq, nc, 2*cap, CW] — px py pz vx vy vz
    for rank classes 0 / 1 (empty slots carry SENTINEL_POS / 0).
    ``occ_rows``: [nyp_pad, nc] i32 — per-row occupancy bounds and dest
    gates, see the bit layout at the top of this module.
    """
    tbl_a: jax.Array
    tbl_b: jax.Array
    occ_rows: jax.Array
    in_bin: jax.Array    # [N] bool (rank < 2*cap, key in grid)
    overflow: jax.Array  # [] i32 count of rank >= 2*cap fluid


class GhostTables(NamedTuple):
    """Static position-only ghost source tables (built once per frame)."""
    tbl_a: jax.Array     # [3, nyq, nc, 2*cap, CW]
    tbl_b: jax.Array
    occ: jax.Array       # [nyp_pad, nc] i32, ghost occ in bits 0:8
    overflow: jax.Array  # [] i32


def _interpret_default() -> bool:
    import jax
    return jax.default_backend() not in ("tpu", "axon")


def default_expand_method(geom: PlaneGeom) -> str:
    """Measured on v5e: the lane-major butterfly wins for small tables
    (6.4 vs 10.3 ms at 131k) but its log2(slots) rounds scale with table
    size; the MXU one-hot kernel wins at 1M (62.7 vs 73.7 ms)."""
    return ("mxu" if geom.padded_cells * 2 * geom.cap >= 4_000_000
            else "butterfly")


def _slot_of(rank_in_class: jax.Array, parity: jax.Array, cap: int
             ) -> jax.Array:
    """(rank within class, row parity) -> slot in a class table."""
    return parity * cap + rank_in_class


def _expand_tables(packed: jax.Array, key_p: jax.Array, rank: jax.Array,
                   overflow: jax.Array, geom: PlaneGeom, hole: jax.Array,
                   method: str) -> Tuple[jax.Array, jax.Array]:
    """[N, F] sorted rows -> two [F, nyq, nc, 2*cap, CW] stacked dense
    class tables (ranks [0, cap) / [cap, 2*cap)).

    ``key_p`` indexes the y-UNPAIRED padded cell space [nyp, nzx]
    (spill = padded_cells); ``rank`` is the in-cell rank; ranks >=
    2*cap are dropped (spill class full -> overflow, counted by the
    caller)."""
    if method == "auto":
        method = default_expand_method(geom)
    cap = geom.cap
    k2c = 2 * cap                       # ranks representable per cell
    f = packed.shape[1]

    from sph_tpu.neighbors import expand as EX
    eg = EX.ExpandGeom(ny=geom.nyp, cps=geom.nzx, cap=k2c)

    if method == "mxu":
        from sph_tpu.neighbors import mxu_permute as MX
        cpb, max_p = 128, 512
        interp = _interpret_default()
        n = packed.shape[0]

        # --- class A: ranks [0, cap), full-density windows ---
        _, slot_a, starts_a, ovf_a = MX.expand_window_ids(
            key_p, rank, geom, cpb, max_p)

        def mxu_a(pk):
            return MX.expand_call(pk, slot_a, starts_a, geom, hole,
                                  cells_per_block=cpb, max_p=max_p,
                                  interpret=interp)

        def scat_a(pk):
            return _scatter_class(pk, key_p, rank, 0, geom, hole)

        tbl_a = lax.cond(ovf_a, scat_a, mxu_a, packed)

        # --- class B (spill ranks [cap, 2cap)): almost always nearly
        # empty, so compact the spill rows (stable flag-keyed sort
        # keeps key order) and expand with a small window bound
        # instead of doubling the one-hot matmul work ---
        mcap = min(n, max(2048, n // 8))
        max_pb = min(max_p, 128)
        is_b = ((rank >= cap) & (rank < k2c)
                & (key_p < geom.padded_cells))
        flag = jnp.where(is_b, 0, 1).astype(jnp.int32)
        pack_kr = jnp.where(
            is_b, key_p * 16 + jnp.clip(rank - cap, 0, 15),
            geom.padded_cells * 16)
        ops = lax.sort(
            (flag, pack_kr, *[packed[:, i] for i in range(f)]),
            dimension=0, num_keys=1, is_stable=True)
        pkr = ops[1][:mcap]
        key_pb = pkr // 16
        rank_b = pkr - key_pb * 16
        packed_b = jnp.stack(ops[2:], axis=1)[:mcap]
        n_spill = jnp.sum(is_b.astype(jnp.int32))
        _, slot_b, starts_b, ovf_b = MX.expand_window_ids(
            key_pb, rank_b, geom, cpb, max_pb, count_all_ranks=False)
        ovf_b = ovf_b | (n_spill > mcap)

        def mxu_b(pk):
            return MX.expand_call(pk, slot_b, starts_b, geom, hole,
                                  cells_per_block=cpb, max_p=max_pb,
                                  interpret=interp)

        def scat_b(_pk):
            return _scatter_class(packed, key_p, rank, cap, geom, hole)

        tbl_b = lax.cond(ovf_b, scat_b, mxu_b, packed_b)
        return tbl_a, tbl_b

    if method == "scatter":
        return (_scatter_class(packed, key_p, rank, 0, geom, hole),
                _scatter_class(packed, key_p, rank, cap, geom, hole))

    # butterfly: lane-major [nyp, F, nzx * 2cap] with slot = cell*2cap
    # + rank (k-minor), scatter fallback on rank overflow inside
    table_t = EX.expand_T(packed, key_p, rank, overflow, eg, hole)
    # pad the lane-cell dim WITH THE HOLE VALUES (zero-padding would
    # plant fake sources at the origin) and pad y rows to even count
    pad = (geom.nzxp - geom.nzx) * k2c
    if pad:
        fill = jnp.broadcast_to(hole[None, :, None],
                                (geom.nyp, f, pad)).astype(table_t.dtype)
        table_t = jnp.concatenate([table_t, fill], axis=2)
    if geom.nyp_pad != geom.nyp:
        fill = jnp.broadcast_to(
            hole[None, :, None],
            (geom.nyp_pad - geom.nyp, f, table_t.shape[2])
        ).astype(table_t.dtype)
        table_t = jnp.concatenate([table_t, fill], axis=0)
    # the same deferred-bitcast k-minor transpose the flat layout always
    # used (measured cheap), THEN the coarse pair fold
    t5 = table_t.reshape(geom.nyp_pad, f, geom.n_chunks, geom.cw, k2c)
    t5 = jnp.transpose(t5, (1, 0, 2, 4, 3))
    return _fold_pairs(t5, geom)


def _fold_pairs_single(t5: jax.Array, geom: PlaneGeom) -> jax.Array:
    """[F, nyp_pad, nc, cap(rank-in-class), CW] -> one class table
    [F, nyq, nc, 2cap(parity*cap+k), CW].

    A row-parity transpose whose (cap, CW) inner blocks move WHOLESALE
    — a coarse-grained copy at memory bandwidth, unlike a single fused
    7D transpose with a sub-8 sublane minor dim, which XLA
    materializes at 2x tile padding and ~4x cost (measured: 25.6 vs
    6.4 ms table build at 131k)."""
    f = t5.shape[0]
    cap = geom.cap
    tc = t5.reshape(f, geom.nyq, 2, geom.n_chunks, cap, geom.cw)
    tc = jnp.transpose(tc, (0, 1, 3, 2, 4, 5))
    return tc.reshape(f, geom.nyq, geom.n_chunks, geom.s_slots, geom.cw)


def _fold_pairs(t5: jax.Array, geom: PlaneGeom
                ) -> Tuple[jax.Array, jax.Array]:
    """[F, nyp_pad, nc, 2cap(rank), CW] -> the two class tables (class
    slice + parity fold)."""
    cap = geom.cap
    return (_fold_pairs_single(t5[:, :, :, :cap, :], geom),
            _fold_pairs_single(t5[:, :, :, cap:, :], geom))


def _scatter_class(packed: jax.Array, key_p: jax.Array, rank: jax.Array,
                   rank_off: int, geom: PlaneGeom, hole: jax.Array
                   ) -> jax.Array:
    """General-case per-field 1D scatters for ONE rank class (ranks
    [rank_off, rank_off + cap)) into k-MAJOR flat tables over the
    lane-PADDED cell space (so the tail lanes beyond nzx carry the
    hole fill, not junk).  Both ``lax.cond`` branches in
    ``_expand_tables`` keep the same cells-minor layout — mixing a
    k-minor branch in makes XLA tile the whole cond output at 16x
    padding (27 GB HBM; see PERF.md finding 8)."""
    cap = geom.cap
    f = packed.shape[1]
    ppc = geom.nyp_pad * geom.nzxp
    total = cap * ppc
    yp = key_p // geom.nzx
    lane = key_p - yp * geom.nzx
    key_pp = jnp.where(key_p < geom.padded_cells,
                       yp * geom.nzxp + lane, ppc)
    rk = rank - rank_off
    in2 = (rk >= 0) & (rk < cap) & (key_pp < ppc)
    slot2 = jnp.where(in2, rk * ppc + key_pp, total)
    fields = []
    for i in range(f):
        t = jnp.full((total + 1,), hole[i], jnp.float32)
        t = t.at[slot2].set(packed[:, i], mode="drop",
                            unique_indices=True)
        fields.append(t[:total])
    t8 = jnp.stack(fields)                     # [F, cap * PPC]
    t5 = t8.reshape(f, cap, geom.nyp_pad, geom.n_chunks, geom.cw)
    t5 = jnp.transpose(t5, (0, 2, 3, 1, 4))
    return _fold_pairs_single(t5, geom)


def _window_occ(counts_p: jax.Array, geom: PlaneGeom
                ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per-padded-cell counts [nyp, nzx] -> per-row per-class window
    bounds incl +-H halo lanes and window-interior dest gates, each
    [nyp_pad, nc] i32: (occ_a, occ_b, dest_a, dest_b)."""
    cap = geom.cap

    def window_max(occ_cell):
        occ_flat = jnp.pad(occ_cell, ((0, geom.nyp_pad - geom.nyp),
                                      (0, geom.nzxp - geom.nzx)))
        win = occ_flat.reshape(geom.nyp_pad, geom.n_chunks, geom.cw)
        h = geom.halo
        interior = jnp.max(win, axis=-1)
        tails = jnp.max(win[:, :, geom.cw - h:], axis=-1)
        heads = jnp.max(win[:, :, :h], axis=-1)
        z = jnp.zeros((geom.nyp_pad, 1), jnp.int32)
        left = jnp.concatenate([z, tails[:, :-1]], axis=1)
        right = jnp.concatenate([heads[:, 1:], z], axis=1)
        return jnp.maximum(jnp.maximum(interior, left), right), interior

    occ_a_cell = jnp.minimum(counts_p, cap).astype(jnp.int32)
    occ_b_cell = jnp.clip(counts_p - cap, 0, cap).astype(jnp.int32)
    occ_a, int_a = window_max(occ_a_cell)
    occ_b, int_b = window_max(occ_b_cell)
    return (occ_a, occ_b,
            (int_a > 0).astype(jnp.int32), (int_b > 0).astype(jnp.int32))


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
    k2c = 2 * geom.cap
    num_cells = geom.num_cells
    n = s.key.shape[0]

    in_bin = (s.rank < k2c) & (s.key < num_cells)
    overflow = jnp.sum(((s.rank >= k2c) & (s.key < num_cells))
                       .astype(jnp.int32))

    packed = jnp.concatenate([s.pos, s.vel], axis=1)

    pc = padded_cell_index(s.key, geom)
    key_p = jnp.where(s.key < num_cells, pc, geom.padded_cells)
    hole = jnp.concatenate([
        jnp.full((3,), SENTINEL_POS, jnp.float32),
        jnp.zeros((3,), jnp.float32)])

    tbl_a, tbl_b = _expand_tables(packed, key_p, s.rank, overflow, geom,
                                  hole, method)
    occ_a, occ_b, dest_a, dest_b = _window_occ(
        _padded_counts(key_p, geom), geom)
    occ_rows = (occ_a | (occ_b << OCC_B_SHIFT)
                | (dest_a << DEST_A_SHIFT) | (dest_b << DEST_B_SHIFT))
    return FluidTables(tbl_a=tbl_a, tbl_b=tbl_b, occ_rows=occ_rows,
                       in_bin=in_bin, overflow=overflow)


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
    k2c = 2 * geom.cap
    overflow = jnp.sum(((rank >= k2c) & (skey < geom.num_cells))
                       .astype(jnp.int32))
    packed = jnp.stack([px, py, pz], axis=1)
    pc = padded_cell_index(skey, geom)
    key_p = jnp.where(skey < geom.num_cells, pc, geom.padded_cells)
    hole = jnp.full((3,), SENTINEL_POS, jnp.float32)
    tbl_a, tbl_b = _expand_tables(packed, key_p, rank, overflow, geom,
                                  hole, method)
    occ_a, occ_b, _, _ = _window_occ(_padded_counts(key_p, geom), geom)
    return GhostTables(tbl_a=tbl_a, tbl_b=tbl_b,
                       occ=occ_a | (occ_b << OCC_B_SHIFT),
                       overflow=overflow)


def tbl_gather_idx(key: jax.Array, geom: PlaneGeom) -> jax.Array:
    """Dest cell keys [B] -> flat gather indices [B, 27*cap] into ONE
    class table flattened per field (``[nyq*nc*s_slots*CW]`` — the
    same layout for fluid A/B, ghost A/B, and the density outputs).

    The 27-cell neighborhood is expressed in PADDED coordinates, so
    row offsets off the grid land in sentinel rows (or, under the
    slab engine, in the halo rows its ppermute exchange filled with
    the neighbor slabs' edge sources) and lane offsets off the grid
    land in sentinel lanes — all carrying SENTINEL_POS, which
    distance-masks to zero contribution.  No bounds handling needed."""
    cap = geom.cap
    kc = jnp.minimum(key, geom.num_cells - 1)
    x = kc % geom.nx
    z = (kc // geom.nx) % geom.nz
    y = kc // (geom.nx * geom.nz)
    off = jnp.arange(-1, 2, dtype=jnp.int32)
    dy, dz, dx = [o.reshape(-1) for o in jnp.meshgrid(
        off, off, off, indexing="ij")]
    xp = x[:, None] + 1 + dx[None, :]             # [B, 27]
    zp = z[:, None] + 1 + dz[None, :]
    yp = y[:, None] + 1 + dy[None, :]
    q = yp // 2
    par = yp % 2
    lane = zp * geom.nxp + xp
    c = lane // geom.cw
    li = lane - c * geom.cw
    k = jnp.arange(cap, dtype=jnp.int32)          # rank within class
    slot = par[..., None] * cap + k               # [B, 27, cap]
    flat = (((q[..., None] * geom.n_chunks + c[..., None])
             * geom.s_slots + slot) * geom.cw + li[..., None])
    return flat.reshape(key.shape[0], -1)


def out_flat_index(s: Sorted, geom: PlaneGeom) -> jax.Array:
    """Per sorted particle: flat index into the CONCATENATED kernel
    outputs ``[class A | class B]`` where each class output is
    ``[nyq, n_chunks, 2*cap, CW]`` flattened (clamped for out-of-bin
    particles; mask separately)."""
    cap = geom.cap
    key = jnp.minimum(s.key, geom.num_cells - 1)
    rank = jnp.minimum(s.rank, 2 * cap - 1)
    cls = rank // cap
    x = key % geom.nx
    z = (key // geom.nx) % geom.nz
    y = key // (geom.nx * geom.nz)
    yp = y + 1
    q = yp // 2
    parity = yp % 2
    slot = _slot_of(rank - cls * cap, parity, cap)
    lane = (z + 1) * geom.nxp + (x + 1)
    c = lane // geom.cw
    li = lane - c * geom.cw
    local = ((q * geom.n_chunks + c) * geom.s_slots + slot) * geom.cw + li
    t_class = geom.nyq * geom.n_chunks * geom.s_slots * geom.cw
    return cls * t_class + local
