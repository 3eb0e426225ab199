"""Pallas TPU neighbor-sweep kernels — the hot path of the framework.

Two fused Mosaic kernels over the class-split dense cell tables built
by ``planes.py``:

1. **density**      — poly6 pair sums (``shaders/SPHFluid.comp:89-106``)
2. **force + xsph** — spiky-gradient pressure + viscosity Laplacian +
   color-field surface tension accumulators, fused with gravity
   assembly, semi-implicit Euler integration
   (``SPHFluid.comp:109-171``), the XSPH smoothing sweep
   (``SPHFluid.comp:177-201``) AND the XSPH apply + CFL speed cap
   (``SPHFluid.comp:200-207``).  XSPH fuses legally because its
   semantics are "fresh self pos/vel vs STALE neighbor pos/vel" (see
   ``physics/brute_force.py:116``): the second sweep runs after the
   in-kernel integration against the same pre-move source rows already
   resident in VMEM.

Kernel structure (both share it):

- Tables are ``[F, nyq, n_chunks, 2*cap, CW]`` per (family, rank
  class): y row PAIRS on the second dim, the (z, x) plane flattened to
  lanes and chunked into disjoint ``CW``-lane windows, and the slot
  dim ``parity * cap + k`` packing BOTH rows of the pair — so a dest
  tile is a full ``(2*cap, CW)`` VPU tile stack with HALF the dest
  padding of a one-row-per-tile layout, and occupancy is gated PER
  SOURCE ROW PER CLASS (4-bit fields of ``occ_rows``) instead of a
  3-row max (PERF.md roadmap #1).
- Rank class B (ranks ``[cap, 2*cap)``) is the SPILL class: its table
  is almost everywhere empty, its sweeps and its dest section gate off
  on per-row occupancy / dest bits, but crowded cells keep exact SPH
  physics up to ``cell_capacity`` particles (closes VERDICT round-1
  weak #5; the remainder is counted and asserted in bench.py).
- grid = ``(nyq, n_chunks)``; each program DMAs the 3x3 neighboring
  (pair, chunk) blocks of every source family (pair AND chunk indices
  clamp at the plane edges — the junk this injects is provably never
  read by real destination cells, see ``_ext_rows`` and the per-row
  occupancy gates) and assembles halo-extended ``(2*cap, CWH)`` source
  rows in VMEM.
- A dest pair needs source rows ``2q-1 .. 2q+2``: 4 source rows ``j``,
  each a parity half of a fetched pair view; rows ``2q-1`` / ``2q+2``
  contribute only to the matching dest parity half (static sublane
  masks).  The source-slot loop ``k2`` is a static unroll wrapped in
  ``pl.when(k2 < occ[row, class])``.
- Every neighbor-cell offset (dz, dx) is a *static lane slice*
  ``ext[slot, H + dz*nxp + dx : +CW]`` of the assembled rows, so the
  sweeps compile to pure VPU code with zero gathers (the TPU-shaped
  replacement for the linked-list walks in ``SPHFluid.comp:92-103``).
- Ghost boundary particles arrive in SEPARATE static position-only
  tables: ghosts carry rho = rho0, pressure 0, velocity 0
  (``SPHFluid.comp:71-83``), so their sweep terms are constants-only
  and their occupancy gates are zero away from the walls (PERF.md 1).
- Empty slots and out-of-grid cells hold a far-away sentinel position,
  so the ``r^2 < h^2`` test removes them with no flag traffic.

Physics semantics are identical to ``physics/brute_force.py`` (the
oracle) and ``neighbors/binned.py``; see ``physics/common.py``.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sph_tpu.core.params import FluidParams, SimConfig
from sph_tpu.core.state import ParticleState
from sph_tpu.neighbors import planes as PL
from sph_tpu.neighbors.blockcheck import check_block
from sph_tpu.physics import common as C

_PI = 3.141592653589

# pvec layout (traced live-tunable params, prefetched to SMEM)
_PV_H = 0
_PV_H2 = 1
_PV_MASS = 2
_PV_SPIKY = 3
_PV_VISC_LAP = 4
_PV_POLY6 = 5
_PV_MU = 6
_PV_ST = 7
_PV_GX = 8
_PV_GY = 9
_PV_GZ = 10
_PV_DT = 11
_PV_RHO0 = 12
_PV_GASK = 13
_PV_RHO_FLOOR = 14
_PV_LEN = 15

# "no ghosts in this configuration" marker for the aux argument: a
# static empty tuple (pytree-stable across scan iterations)
NO_GHOSTS = ()

# source row j (= padded row 2q-1+j) -> fetched pair view / parity half
_VIEW = (0, 1, 1, 2)
_PAR = (1, 0, 1, 0)


def _make_pvec(params: FluidParams, dt: jax.Array) -> jax.Array:
    h = params.h
    return jnp.stack([
        h, h * h, params.mass,
        -45.0 / (_PI * h**6), 45.0 / (_PI * h**6),
        315.0 / (64.0 * _PI * h**9),
        params.viscosity, params.surface_tension,
        params.gravity[0], params.gravity[1], params.gravity[2],
        jnp.asarray(dt, jnp.float32),
        params.rest_density, params.gas_constant,
        C.DENSITY_FLOOR_FRAC * params.rest_density,
    ]).astype(jnp.float32)


def _lane_offsets(geom: PL.PlaneGeom):
    """(lane_offset, is_zero_offset) for the 9 (dz, dx) neighbor cells."""
    for dz in (-1, 0, 1):
        for dx in (-1, 0, 1):
            yield geom.halo + dz * geom.nxp + dx, (dz == 0 and dx == 0)


def _row_occs(geom: PL.PlaneGeom, occ_ref, q, c):
    """The 4 packed occupancy words for source rows 2q-1 .. 2q+2
    (clamped; clamped rows are sentinel halo rows with zero counts)."""
    top = geom.nyp_pad - 1
    return [occ_ref[jnp.clip(2 * q - 1 + j, 0, top), c] for j in range(4)]


def _dest_bits(occv, shift):
    return ((occv[1] | occv[2]) >> shift) & 1


def _imap_qc(geom: PL.PlaneGeom, compact: bool):
    """Program indices -> (q, c) block coords.

    Dense mode: 2D grid (q, c).  Compact mode (PERF.md roofline fix
    #2): 1D grid over the scalar-prefetched active-block list ``qc``
    (flat block ids, active blocks first) — inactive blocks are never
    fetched; the tail padding programs point at real-but-inactive
    blocks whose bodies gate off and whose outputs zero harmlessly.
    Raw ``lax.div/rem``: nested jnp ``//``/``%`` breaks Mosaic's
    index-map lowering (PERF.md finding 13)."""
    nc = geom.n_chunks
    if compact:
        def qc_of(i, occ, pvec, qc, *_):
            b = qc[i]
            return lax.div(b, jnp.int32(nc)), lax.rem(b, jnp.int32(nc))
    else:
        def qc_of(q, c, *_):
            return q, c
    return qc_of


def _tbl_spec(geom: PL.PlaneGeom, compact: bool, f: int, view: int,
              dc: int) -> pl.BlockSpec:
    """3x3 neighborhood block over a class table [F, nyq, nc, 2cap, CW].
    BOTH the pair and chunk indices clamp at the plane edges; the junk
    this injects is never read (clamped-pair source rows are gated off
    by their real occupancy words, which live OUTSIDE the table and are
    indexed by true row; clamped-chunk junk lanes are beyond every real
    destination's reach, see ``_ext_rows``)."""
    nc = geom.n_chunks
    nyq = geom.nyq
    qc_of = _imap_qc(geom, compact)

    def imap(*ix):
        q, c = qc_of(*ix)
        return (0, jnp.clip(q + view - 1, 0, nyq - 1),
                jnp.clip(c + dc, 0, nc - 1), 0, 0)

    check_block((f, 1, 1, geom.s_slots, geom.cw),
                (f, geom.nyq, nc, geom.s_slots, geom.cw), "tbl")
    return pl.BlockSpec((f, 1, 1, geom.s_slots, geom.cw), imap,
                        memory_space=pltpu.VMEM)


def _rho_spec(geom: PL.PlaneGeom, compact: bool, view: int, dc: int
              ) -> pl.BlockSpec:
    """3x3 block over a density output array [nyq, nc, 2cap, CW]."""
    nc = geom.n_chunks
    nyq = geom.nyq
    qc_of = _imap_qc(geom, compact)

    def imap(*ix):
        q, c = qc_of(*ix)
        return (jnp.clip(q + view - 1, 0, nyq - 1),
                jnp.clip(c + dc, 0, nc - 1), 0, 0)

    check_block((1, 1, geom.s_slots, geom.cw),
                (geom.nyq, nc, geom.s_slots, geom.cw), "rho")
    return pl.BlockSpec((1, 1, geom.s_slots, geom.cw), imap,
                        memory_space=pltpu.VMEM)


def _nine(spec_fn, geom, compact, *a):
    return [spec_fn(geom, compact, *a, v, dc)
            for v in range(3) for dc in (-1, 0, 1)]


def _ext_rows(refs9: Sequence, geom: PL.PlaneGeom, lead: bool = True):
    """9 fetched blocks (view-major: [(v,c-1),(v,c),(v,c+1)] x 3) ->
    3 halo-extended source-row stacks [F, 2cap, CWH] (or [2cap, CWH]
    when ``lead`` is False for the rho blocks).

    Chunk-edge safety: at c = 0 the clamped "left" block duplicates the
    center chunk, so its tail lanes are junk in the assembled ltail —
    but the first REAL cell of the whole plane sits at lane
    nxp + 1 == H, so every real destination lane i >= H reads
    ``ext[i + H + doff] >= ext[H]`` (doff >= -H), never touching
    ltail[0:H).  Symmetrically the junk rhead at c = nc-1 is beyond
    every real destination's reach because the plane's border z-row
    provides nxp >= H - 1 trailing lanes.  Middle chunks read real
    neighbor data on both sides."""
    h, cw = geom.halo, geom.cw
    outs = []
    for v in range(3):
        blocks = refs9[v * 3:(v + 1) * 3]
        if lead:
            left, mid, right = (b[:, 0, 0] for b in blocks)
        else:
            left, mid, right = (b[0, 0] for b in blocks)
        outs.append(jnp.concatenate(
            [left[..., cw - h:], mid, right[..., :h]], axis=-1))
    return outs


class _Fam(NamedTuple):
    """A source family for the sweep loops."""
    ext: Sequence          # 3 views of [F, 2cap, CWH]
    occ_shift: int         # occupancy field position in the occ words
    ghost: bool
    is_self: bool          # self-exclusion family (the dest class)
    spres: Optional[Sequence] = None     # force only: 3 x [2cap, CWH]
    sminv: Optional[Sequence] = None     # force only: 3 x [2cap, CWH]


def _grid_spec(geom: PL.PlaneGeom, in_specs, out_specs, scratch=(),
               n_prog: int = 0, n_extra_scalars: int = 0):
    """Dense 2D (q, c) grid, or — when ``n_prog`` > 0 — the compact 1D
    grid over the prefetched active-block list (3rd scalar arg).
    ``n_extra_scalars``: trailing scalar-prefetch operands beyond
    (occ, pvec[, qc]) — the emit tail's window starts/dsts."""
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=(3 if n_prog else 2) + n_extra_scalars,
        grid=(n_prog,) if n_prog else (geom.nyq, geom.n_chunks),
        in_specs=list(in_specs),
        out_specs=out_specs,
        scratch_shapes=list(scratch))


def active_block_list(occ_rows: jax.Array, geom: PL.PlaneGeom,
                      max_active: int):
    """(qc[max_active] i32 flat block ids — active first, in (q, c)
    order, padded with inactive ids —, n_active).  A block is active
    iff either of its pair's rows carries a dest bit (exactly the
    kernels' own (dest_a | dest_b) gate)."""
    dest = (occ_rows >> PL.DEST_A_SHIFT) & 3          # bits 16,17
    pair = dest.reshape(geom.nyq, 2, geom.n_chunks).max(axis=1)
    flat = (pair > 0).astype(jnp.int32).reshape(-1)
    n_active = jnp.sum(flat)
    order = jnp.argsort(1 - flat, stable=True).astype(jnp.int32)
    return order[:max_active], n_active


def _max_active(geom: PL.PlaneGeom, config: SimConfig) -> int:
    """Static compact-grid size: covers ``sweep_active_frac`` of the
    blocks (<= 0 or >= 1 disables compaction); the dense fallback
    handles fuller states via ``lax.cond``."""
    frac = float(getattr(config, "sweep_active_frac", 0.625))
    total = geom.nyq * geom.n_chunks
    if frac <= 0.0 or frac >= 1.0:
        return 0
    return min(total, max(1, int(-(-total * frac // 1))))


# The unrolled slot x offset pair loops carry wide temporaries; raise
# the default 16 MiB scoped-VMEM ceiling so the compiler can keep them
# resident instead of failing (v5e has 128 MiB VMEM per core).
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _half_mask(geom: PL.PlaneGeom, j: int):
    """Dest-parity validity mask for source row j: rows 2q-1 / 2q+2 are
    out of y range for one of the pair's rows."""
    iota = lax.broadcasted_iota(jnp.int32, (geom.s_slots, geom.cw), 0)
    if j == 0:
        return iota < geom.cap           # only dest row 2q (parity 0)
    if j == 3:
        return iota >= geom.cap          # only dest row 2q+1 (parity 1)
    return None


def _self_mask(geom: PL.PlaneGeom, sj: int):
    return lax.broadcasted_iota(
        jnp.int32, (geom.s_slots, geom.cw), 0) == sj


def _sweep(geom: PL.PlaneGeom, fams, occv, cap: int, accum):
    """Run ``accum(fam, k2)`` for every potentially occupied (family,
    slot), wrapped in ``pl.when(k2 < max-over-the-4-source-rows occ)``.

    The gate is deliberately COARSE (one region per (family, slot), the
    4-row loop runs inside it): per-(row, slot) gating was measured
    slower — it multiplies the conditional regions and therefore the
    accumulator flush traffic through VMEM refs (PERF.md finding 2;
    re-confirmed round 2: per-row regions cost 57 ms vs 27 ms at
    131k)."""
    for fam in fams:
        occs = [(ov >> fam.occ_shift) & PL.OCC_MASK for ov in occv]
        occ4 = jnp.maximum(jnp.maximum(occs[0], occs[1]),
                           jnp.maximum(occs[2], occs[3]))
        for k2 in range(cap):
            @pl.when(k2 < occ4)
            def _(fam=fam, k2=k2):
                accum(fam, k2)


# ---------------------------------------------------------------------------
# density
# ---------------------------------------------------------------------------

def _density_kernel(geom: PL.PlaneGeom, has_ghosts: bool, compact: bool,
                    occ_ref, pvec_ref, *refs):
    if compact:
        qc_ref, refs = refs[0], refs[1:]
        b = qc_ref[pl.program_id(0)]
        q = lax.div(b, jnp.int32(geom.n_chunks))
        c = lax.rem(b, jnp.int32(geom.n_chunks))
    else:
        q = pl.program_id(0)
        c = pl.program_id(1)
    fa9 = refs[0:9]
    fb9 = refs[9:18]
    ga9 = refs[18:27] if has_ghosts else None
    gb9 = refs[27:36] if has_ghosts else None
    rho_a_ref = refs[-2]
    rho_b_ref = refs[-1]
    occv = _row_occs(geom, occ_ref, q, c)
    dest_a = _dest_bits(occv, PL.DEST_A_SHIFT)
    dest_b = _dest_bits(occv, PL.DEST_B_SHIFT)
    h2 = pvec_ref[_PV_H2]
    cw = geom.cw
    cap = geom.cap
    ss = geom.s_slots

    floor = jnp.full((1, 1, ss, cw), pvec_ref[_PV_RHO_FLOOR], jnp.float32)
    rho_a_ref[...] = floor
    rho_b_ref[...] = floor

    @pl.when((dest_a | dest_b) > 0)
    def _():
        fams = [
            _Fam(_ext_rows(fa9, geom), 0, False, False),
            _Fam(_ext_rows(fb9, geom), PL.OCC_B_SHIFT, False, False),
        ]
        if has_ghosts:
            fams.append(_Fam(_ext_rows(ga9, geom), PL.GOCC_SHIFT,
                             True, False))
            fams.append(_Fam(_ext_rows(gb9, geom), PL.GOCC_SHIFT + 4,
                             True, False))

        def section(dest_bit, ctr_blocks, out_ref):
            @pl.when(dest_bit > 0)
            def _():
                ctr = ctr_blocks[4][:, 0, 0]            # [6, 2cap, CW]
                cx, cy, cz = ctr[0], ctr[1], ctr[2]
                out_ref[0, 0] = jnp.zeros((ss, cw), jnp.float32)

                def accum(fam, k2):
                    acc = jnp.zeros((ss, cw), jnp.float32)
                    for j in range(4):
                        rows = fam.ext[_VIEW[j]]
                        sj = _PAR[j] * cap + k2
                        hmask = _half_mask(geom, j)
                        part = jnp.zeros((ss, cw), jnp.float32)
                        for off, _zero in _lane_offsets(geom):
                            ddx = cx - rows[0, sj, off:off + cw]
                            ddy = cy - rows[1, sj, off:off + cw]
                            ddz = cz - rows[2, sj, off:off + cw]
                            r2 = ddx * ddx + ddy * ddy + ddz * ddz
                            d = jnp.maximum(h2 - r2, 0.0)
                            part = part + d * d * d
                        if hmask is not None:
                            part = jnp.where(hmask, part, 0.0)
                        acc = acc + part
                    out_ref[0, 0] += acc

                # self-pairs are *included*, as in the GLSL density loop
                # (SPHFluid.comp:89-106 has no j != i check)
                _sweep(geom, fams, occv, cap, accum)

                # pointwise finish: mass*poly6 + floor (SPHFluid.comp:105)
                raw = out_ref[0, 0]
                scale = pvec_ref[_PV_MASS] * pvec_ref[_PV_POLY6]
                out_ref[0, 0] = jnp.maximum(raw * scale,
                                            pvec_ref[_PV_RHO_FLOOR])

        section(dest_a, fa9, rho_a_ref)
        section(dest_b, fb9, rho_b_ref)


def density_call(ft: PL.FluidTables, occ_rows: jax.Array,
                 gt, pvec: jax.Array, geom: PL.PlaneGeom,
                 interpret: bool, qc=None, n_prog: int = 0):
    """FINAL per-slot fluid density (floored) for both rank classes:
    two [nyq, nc, 2cap, CW] arrays.  ``qc``/``n_prog``: compact-grid
    mode (see ``active_block_list``); inactive blocks' rho stays
    UNWRITTEN — the force kernel sanitizes fetched rho, and inactive
    blocks hold no gathered particle."""
    has_ghosts = gt is not None
    compact = qc is not None
    in_specs = _nine(_tbl_spec, geom, compact, 6) * 2
    args = [ft.tbl_a] * 9 + [ft.tbl_b] * 9
    if has_ghosts:
        in_specs += _nine(_tbl_spec, geom, compact, 3) * 2
        args += [gt.tbl_a] * 9 + [gt.tbl_b] * 9
    pre = (occ_rows, pvec, qc) if compact else (occ_rows, pvec)
    out = pl.pallas_call(
        functools.partial(_density_kernel, geom, has_ghosts, compact),
        grid_spec=_grid_spec(
            geom, in_specs,
            [_rho_out_spec(geom, compact), _rho_out_spec(geom, compact)],
            n_prog=n_prog if compact else 0),
        out_shape=[_rho_shape(geom), _rho_shape(geom)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(*pre, *args)
    return out[0], out[1]


def _rho_out_spec(geom: PL.PlaneGeom, compact: bool) -> pl.BlockSpec:
    qc_of = _imap_qc(geom, compact)

    def imap(*ix):
        q, c = qc_of(*ix)
        return (q, c, 0, 0)

    check_block((1, 1, geom.s_slots, geom.cw), _rho_shape(geom).shape,
                "rho out")
    return pl.BlockSpec((1, 1, geom.s_slots, geom.cw), imap,
                        memory_space=pltpu.VMEM)


def _rho_shape(geom: PL.PlaneGeom):
    return jax.ShapeDtypeStruct(
        (geom.nyq, geom.n_chunks, geom.s_slots, geom.cw), jnp.float32)


def _out_spec(geom: PL.PlaneGeom, compact: bool, f: int) -> pl.BlockSpec:
    qc_of = _imap_qc(geom, compact)

    def imap(*ix):
        q, c = qc_of(*ix)
        return (0, q, c, 0, 0)

    check_block((f, 1, 1, geom.s_slots, geom.cw), _out_shape(geom, f).shape,
                "force out")
    return pl.BlockSpec((f, 1, 1, geom.s_slots, geom.cw), imap,
                        memory_space=pltpu.VMEM)


def _out_shape(geom: PL.PlaneGeom, f: int):
    return jax.ShapeDtypeStruct(
        (f, geom.nyq, geom.n_chunks, geom.s_slots, geom.cw), jnp.float32)


# ---------------------------------------------------------------------------
# force + integrate + xsph (fused)
# ---------------------------------------------------------------------------

def _force_xsph_kernel(geom: PL.PlaneGeom, has_ghosts: bool,
                       compact: bool, emit_tile: int,
                       occ_ref, pvec_ref, *refs):
    emit = emit_tile > 0
    if compact:
        qc_ref, refs = refs[0], refs[1:]
        b = qc_ref[pl.program_id(0)]
        q = lax.div(b, jnp.int32(geom.n_chunks))
        c = lax.rem(b, jnp.int32(geom.n_chunks))
    else:
        q = pl.program_id(0)
        c = pl.program_id(1)
    if emit:
        wst_ref, wdst_ref, refs = refs[0], refs[1], refs[2:]
        (rows_hbm, emit_ref, tile_in, tile_out,
         sem_in, sem_out) = (refs[-9], refs[-6], refs[-4], refs[-3],
                             refs[-2], refs[-1])
        out_a_ref = refs[-8]
        out_b_ref = refs[-7]
        acc_ref = refs[-5]
    else:
        out_a_ref = refs[-3]
        out_b_ref = refs[-2]
        acc_ref = refs[-1]
    fa9 = refs[0:9]
    fb9 = refs[9:18]
    ra9 = refs[18:27]
    rb9 = refs[27:36]
    ga9 = refs[36:45] if has_ghosts else None
    gb9 = refs[45:54] if has_ghosts else None
    occv = _row_occs(geom, occ_ref, q, c)
    dest_a = _dest_bits(occv, PL.DEST_A_SHIFT)
    dest_b = _dest_bits(occv, PL.DEST_B_SHIFT)
    cw = geom.cw
    cap = geom.cap
    ss = geom.s_slots
    h = pvec_ref[_PV_H]
    h2 = pvec_ref[_PV_H2]
    mass = pvec_ref[_PV_MASS]
    spiky_c = pvec_ref[_PV_SPIKY]
    visc_lap_c = pvec_ref[_PV_VISC_LAP]
    poly6_c = pvec_ref[_PV_POLY6]
    mu = pvec_ref[_PV_MU]
    rho0 = pvec_ref[_PV_RHO0]
    gas_k = pvec_ref[_PV_GASK]
    dt = pvec_ref[_PV_DT]

    # pos fields init to SENTINEL (not zero): the resident engine reuses
    # these outputs as the next substep's source tables, and a zero
    # "position" in a skipped (no-dest) window would be a phantom
    # particle at the world origin.  Computed sections overwrite; empty
    # slots inside them carry sentinel through the integration anyway.
    out_a_ref[...] = jnp.zeros(out_a_ref.shape, jnp.float32)
    out_b_ref[...] = jnp.zeros(out_b_ref.shape, jnp.float32)
    pos_init = jnp.full((3,) + out_a_ref.shape[1:], PL.SENTINEL_POS,
                        jnp.float32)
    out_a_ref[0:3] = pos_init
    out_b_ref[0:3] = pos_init

    @pl.when((dest_a | dest_b) > 0)
    def _():
        gminv = mass / jnp.maximum(rho0, 1e-12)     # ghost: rho == rho0

        def fluid_fam(f9, r9, shift):
            # hoisted per-source-row pressure and mass/rho (one divide
            # per row instead of one per (row, offset) pair); EOS
            # in-kernel (SPHFluid.comp:109-111).  Under the compact
            # grid, rho of never-written inactive neighbor blocks is
            # arbitrary bits — their slots hold sentinel positions, so
            # `inside` masks every use, but a NaN would survive the
            # mask through 0*NaN: squash NaN to rho0 here (one
            # compare+select per source row).
            rho_ext = [jnp.where(r == r, r, rho0)
                       for r in _ext_rows(r9, geom, lead=False)]
            return _Fam(
                _ext_rows(f9, geom), shift, False, False,
                spres=[jnp.maximum(gas_k * (r - rho0), 0.0)
                       for r in rho_ext],
                sminv=[mass / jnp.maximum(r, 1e-12) for r in rho_ext])

        fam_a = fluid_fam(fa9, ra9, 0)
        fam_b = fluid_fam(fb9, rb9, PL.OCC_B_SHIFT)
        fams = [fam_a, fam_b]
        if has_ghosts:
            fams.append(_Fam(_ext_rows(ga9, geom), PL.GOCC_SHIFT,
                             True, False))
            fams.append(_Fam(_ext_rows(gb9, geom), PL.GOCC_SHIFT + 4,
                             True, False))

        def section(dest_bit, self_fam, ctr_blocks, rho_blocks, out_ref):
            @pl.when(dest_bit > 0)
            def _():
                ctr = ctr_blocks[4][:, 0, 0]            # [6, 2cap, CW]
                cx, cy, cz = ctr[0], ctr[1], ctr[2]
                cvx, cvy, cvz = ctr[3], ctr[4], ctr[5]
                crho = rho_blocks[4][0, 0]
                cpres = jnp.maximum(gas_k * (crho - rho0), 0.0)

                acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

                def force_accum(fam, k2):
                    fx = jnp.zeros((ss, cw), jnp.float32)
                    fy = jnp.zeros((ss, cw), jnp.float32)
                    fz = jnp.zeros((ss, cw), jnp.float32)
                    gcx = jnp.zeros((ss, cw), jnp.float32)
                    gcy = jnp.zeros((ss, cw), jnp.float32)
                    gcz = jnp.zeros((ss, cw), jnp.float32)
                    lc = jnp.zeros((ss, cw), jnp.float32)
                    for j in range(4):
                        rows = fam.ext[_VIEW[j]]
                        sj = _PAR[j] * cap + k2
                        hmask = _half_mask(geom, j)
                        selfable = fam.is_self and j in (1, 2)
                        smask = (_self_mask(geom, sj) if selfable
                                 else None)
                        for off, zero_off in _lane_offsets(geom):
                            ddx = cx - rows[0, sj, off:off + cw]
                            ddy = cy - rows[1, sj, off:off + cw]
                            ddz = cz - rows[2, sj, off:off + cw]
                            r2 = ddx * ddx + ddy * ddy + ddz * ddz
                            # one rsqrt replaces sqrt + the 1/r divide
                            rinv = lax.rsqrt(jnp.maximum(r2, 1e-24))
                            r = r2 * rinv
                            inside = r < h
                            if zero_off and smask is not None:
                                inside = inside & ~smask
                            if hmask is not None:
                                inside = inside & hmask
                            if fam.ghost:
                                sp = 0.0
                                mw = jnp.where(inside, gminv, 0.0)
                            else:
                                sp = fam.spres[_VIEW[j]][sj,
                                                         off:off + cw]
                                mw = jnp.where(
                                    inside,
                                    fam.sminv[_VIEW[j]][sj,
                                                        off:off + cw],
                                    0.0)
                            dcl = jnp.maximum(h - r, 0.0)
                            gmag = jnp.where(
                                r2 > 0.0, spiky_c * dcl * dcl * rinv,
                                0.0)
                            lapw = visc_lap_c * dcl
                            pscale = -(cpres + sp) * 0.5 * mw * gmag
                            vscale = mw * lapw * mu
                            if fam.ghost:
                                # ghost velocity is exactly 0
                                # (SPHFluid.comp:71-83)
                                fx = fx + pscale * ddx - vscale * cvx
                                fy = fy + pscale * ddy - vscale * cvy
                                fz = fz + pscale * ddz - vscale * cvz
                            else:
                                fx = fx + pscale * ddx + vscale * (
                                    rows[3, sj, off:off + cw] - cvx)
                                fy = fy + pscale * ddy + vscale * (
                                    rows[4, sj, off:off + cw] - cvy)
                                fz = fz + pscale * ddz + vscale * (
                                    rows[5, sj, off:off + cw] - cvz)
                            gscale = mw * gmag
                            gcx = gcx + gscale * ddx
                            gcy = gcy + gscale * ddy
                            gcz = gcz + gscale * ddz
                            lc = lc + mw * lapw
                    acc_ref[0] += fx
                    acc_ref[1] += fy
                    acc_ref[2] += fz
                    acc_ref[3] += gcx
                    acc_ref[4] += gcy
                    acc_ref[5] += gcz
                    acc_ref[6] += lc

                _sweep(geom, _mark_self(fams, self_fam), occv, cap,
                       force_accum)

                # surface tension + gravity + integrate
                # (SPHFluid.comp:156-171)
                st = pvec_ref[_PV_ST]
                fx, fy, fz = acc_ref[0], acc_ref[1], acc_ref[2]
                gcx, gcy, gcz = acc_ref[3], acc_ref[4], acc_ref[5]
                lc = acc_ref[6]
                glen = jnp.sqrt(gcx * gcx + gcy * gcy + gcz * gcz)
                stm = jnp.where(glen > C.SURFACE_THRESHOLD,
                                -st * lc / jnp.maximum(glen, 1e-30), 0.0)
                rho_safe = jnp.maximum(crho, 1e-12)
                ax = (fx + stm * gcx + pvec_ref[_PV_GX] * crho) / rho_safe
                ay = (fy + stm * gcy + pvec_ref[_PV_GY] * crho) / rho_safe
                az = (fz + stm * gcz + pvec_ref[_PV_GZ] * crho) / rho_safe
                nvx = (cvx + ax * dt) * C.VELOCITY_DAMPING
                nvy = (cvy + ay * dt) * C.VELOCITY_DAMPING
                nvz = (cvz + az * dt) * C.VELOCITY_DAMPING
                npx = cx + nvx * dt
                npy = cy + nvy * dt
                npz = cz + nvz * dt

                # --- xsph: fresh self pos/vel vs stale neighbor rows
                # (still in VMEM) — SPHFluid.comp:177-201 /
                # brute_force.xsph_pass ---
                def xsph_accum(fam, k2):
                    xx = jnp.zeros((ss, cw), jnp.float32)
                    xy = jnp.zeros((ss, cw), jnp.float32)
                    xz = jnp.zeros((ss, cw), jnp.float32)
                    xn = jnp.zeros((ss, cw), jnp.float32)
                    for j in range(4):
                        rows = fam.ext[_VIEW[j]]
                        sj = _PAR[j] * cap + k2
                        hmask = _half_mask(geom, j)
                        selfable = fam.is_self and j in (1, 2)
                        smask = (_self_mask(geom, sj) if selfable
                                 else None)
                        for off, zero_off in _lane_offsets(geom):
                            ddx = npx - rows[0, sj, off:off + cw]
                            ddy = npy - rows[1, sj, off:off + cw]
                            ddz = npz - rows[2, sj, off:off + cw]
                            r2 = ddx * ddx + ddy * ddy + ddz * ddz
                            inside = r2 < h2
                            if zero_off and smask is not None:
                                inside = inside & ~smask
                            if hmask is not None:
                                inside = inside & hmask
                            d = jnp.maximum(h2 - r2, 0.0)
                            w = jnp.where(inside, poly6_c * d * d * d,
                                          0.0)
                            if fam.ghost:
                                mw = w * gminv
                                xx = xx - mw * nvx
                                xy = xy - mw * nvy
                                xz = xz - mw * nvz
                            else:
                                mw = w * fam.sminv[_VIEW[j]][sj,
                                                             off:off + cw]
                                xx = xx + mw * (
                                    rows[3, sj, off:off + cw] - nvx)
                                xy = xy + mw * (
                                    rows[4, sj, off:off + cw] - nvy)
                                xz = xz + mw * (
                                    rows[5, sj, off:off + cw] - nvz)
                            xn = xn + w
                    acc_ref[7] += xx
                    acc_ref[8] += xy
                    acc_ref[9] += xz
                    acc_ref[10] += xn

                _sweep(geom, _mark_self(fams, self_fam), occv, cap,
                       xsph_accum)

                # xsph apply (SPHFluid.comp:200-201) + CFL speed cap
                # (SPHFluid.comp:203-207) in-kernel
                xn = acc_ref[10]
                inv = jnp.where(xn > 0.0,
                                C.XSPH_COEFF / jnp.maximum(xn, 1e-30),
                                0.0)
                vx = nvx + inv * acc_ref[7]
                vy = nvy + inv * acc_ref[8]
                vz = nvz + inv * acc_ref[9]
                max_speed = C.CFL_FRACTION * h / jnp.maximum(dt, 1e-6)
                sp2 = vx * vx + vy * vy + vz * vz
                spd = jnp.sqrt(sp2)
                vscl = jnp.where(spd > max_speed,
                                 max_speed / jnp.maximum(spd, 1e-30),
                                 1.0)
                out_ref[0, 0, 0] = npx
                out_ref[1, 0, 0] = npy
                out_ref[2, 0, 0] = npz
                out_ref[3, 0, 0] = vx * vscl
                out_ref[4, 0, 0] = vy * vscl
                out_ref[5, 0, 0] = vz * vscl
                out_ref[6, 0, 0] = ax
                out_ref[7, 0, 0] = ay
                out_ref[8, 0, 0] = az

        section(dest_a, fam_a, fa9, ra9, out_a_ref)
        section(dest_b, fam_b, fb9, rb9, out_b_ref)

        if emit:
            # any window with rows implies dest_a (rank 0 exists), so
            # the emit tail is complete inside this gate
            _emit_tail(geom, emit_tile, q, c, wst_ref, wdst_ref,
                       rows_hbm, out_a_ref, out_b_ref,
                       ra9[4][0, 0], rb9[4][0, 0],
                       emit_ref, tile_in, tile_out, sem_in, sem_out)


def _mark_self(fams, self_fam):
    """Tag the dest class's family for self-pair exclusion."""
    return [f._replace(is_self=(f is self_fam)) if not f.ghost else f
            for f in fams]


def _emit_tail(geom: PL.PlaneGeom, tile: int, q, c, wst_ref, wdst_ref,
               rows_hbm, out_a_ref, out_b_ref, rho_a_ctr, rho_b_ctr,
               emit_ref, tile_in, tile_out, sem_in, sem_out):
    """Row-emit (PERF.md roofline fix #4): stream this block's final
    outputs straight to PARTICLE rows, killing the per-substep row
    gather (46.5 ms at 1M, finding 10).  The failed round-1/2 one-hot
    gather paid a full ``max_p x S`` matmul + 256 KB write per window
    (~170x the useful data); here the block's outputs are ALREADY in
    VMEM (zero extra table reads), tiles are count-gated, and each
    window writes a private ``tile``-aligned dst region (disjoint =>
    in-flight DMAs never race; the spare tail lanes carry zeros).

    Emitted row layout (cols 0:10): npx npy npz vx vy vz ax ay az rho.
    Rows of overflow ranks (no slot) emit zeros; their ballistic
    fallback values are selected by the caller's ``ofl`` mask."""
    cap, cw, cpb = geom.cap, geom.cw, 128
    wpc = cw // cpb
    nsc = geom.nzxp // cpb
    s2 = 2 * cap * cpb
    iota_s = lax.broadcasted_iota(jnp.int32, (tile, s2), 1)
    dn = (((1,), (0,)), ((), ()))

    for par in (0, 1):
        lo = par * cap
        for wc in range(wpc):
            w = ((2 * q + par) * jnp.int32(nsc)
                 + c * jnp.int32(wpc) + jnp.int32(wc))
            st = wst_ref[w]
            cnt = wst_ref[w + 1] - st
            dst = wdst_ref[w]

            @pl.when(cnt > 0)
            def _(lo=lo, wc=wc, st=st, cnt=cnt, dst=dst):
                cs = slice(wc * cpb, (wc + 1) * cpb)
                # classes side by side on the slot axis (matches the
                # combined-slot numbering in MX.emit_window_ids), 10
                # fields + 6 zero pad rows -> a [s2, 16] rhs
                blk_a = jnp.concatenate([
                    out_a_ref[:, 0, 0, lo:lo + cap, cs]
                    .reshape(9, cap * cpb),
                    rho_a_ctr[lo:lo + cap, cs].reshape(1, cap * cpb),
                ], axis=0)
                blk_b = jnp.concatenate([
                    out_b_ref[:, 0, 0, lo:lo + cap, cs]
                    .reshape(9, cap * cpb),
                    rho_b_ctr[lo:lo + cap, cs].reshape(1, cap * cpb),
                ], axis=0)
                blk = jnp.concatenate([blk_a, blk_b], axis=1)
                blk = jnp.concatenate(
                    [blk, jnp.zeros((6, s2), jnp.float32)], axis=0)
                blk_t = blk.T                    # [s2, 16]
                # exact f32 via 3-term bf16 expansion (the one-hot lhs
                # is exactly 0/1 in bf16; see mxu_permute)
                b1 = blk_t.astype(jnp.bfloat16)
                r1 = blk_t - b1.astype(jnp.float32)
                b2 = r1.astype(jnp.bfloat16)
                b3 = (r1 - b2.astype(jnp.float32)).astype(jnp.bfloat16)

                def body(i, carry):
                    cp = pltpu.make_async_copy(
                        rows_hbm.at[pl.ds(st + i * tile, tile)],
                        tile_in, sem_in)
                    cp.start()
                    cp.wait()
                    slots = tile_in[:, 0].astype(jnp.int32)
                    ok = (lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
                          < cnt - i * tile)
                    oh = jnp.where(ok & (slots[:, None] == iota_s),
                                   1.0, 0.0).astype(jnp.bfloat16)

                    def mm(b):
                        return lax.dot_general(
                            oh, b, dn,
                            preferred_element_type=jnp.float32)

                    out16 = mm(b1) + mm(b2) + mm(b3)   # [tile, 16]
                    tile_out[...] = jnp.concatenate(
                        [out16, jnp.zeros((tile, 112), jnp.float32)],
                        axis=1)
                    cpo = pltpu.make_async_copy(
                        tile_out,
                        emit_ref.at[pl.ds(dst + i * tile, tile)],
                        sem_out)
                    cpo.start()
                    cpo.wait()
                    return carry

                lax.fori_loop(0, lax.div(cnt + (tile - 1),
                                         jnp.int32(tile)), body, 0)


def force_xsph_call(ft: PL.FluidTables, occ_rows: jax.Array,
                    rho_a: jax.Array, rho_b: jax.Array, gt,
                    pvec: jax.Array, geom: PL.PlaneGeom,
                    interpret: bool, qc=None, n_prog: int = 0,
                    emit=None):
    """Two [9, nyq, nc, 2cap, CW] outputs (classes A, B): npx npy npz
    vx vy vz (final: xsph-applied + speed-capped) ax ay az.

    ``emit``: None, or ``(rows, wst, wdst, n_emit, tile)`` from
    ``MX.emit_window_ids``/``emit_rows_build`` — adds a third output
    ``[n_emit, 128]`` holding the same 10 fields in window-padded
    PARTICLE-row order (see ``_emit_tail``)."""
    has_ghosts = gt is not None
    compact = qc is not None
    in_specs = (_nine(_tbl_spec, geom, compact, 6) * 2
                + _nine(_rho_spec, geom, compact) * 2)
    args = ([ft.tbl_a] * 9 + [ft.tbl_b] * 9
            + [rho_a] * 9 + [rho_b] * 9)
    if has_ghosts:
        in_specs += _nine(_tbl_spec, geom, compact, 3) * 2
        args += [gt.tbl_a] * 9 + [gt.tbl_b] * 9
    pre = [occ_rows, pvec] + ([qc] if compact else [])
    out_specs = [_out_spec(geom, compact, 9), _out_spec(geom, compact, 9)]
    out_shapes = [_out_shape(geom, 9), _out_shape(geom, 9)]
    scratch = [pltpu.VMEM((11, geom.s_slots, geom.cw), jnp.float32)]
    tile = 0
    if emit is not None:
        rows, wst, wdst, n_emit, tile = emit
        pre += [wst, wdst]
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        args.append(rows)
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shapes.append(
            jax.ShapeDtypeStruct((n_emit, 128), jnp.float32))
        scratch += [pltpu.VMEM((tile, 128), jnp.float32),
                    pltpu.VMEM((tile, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA]
    out = pl.pallas_call(
        functools.partial(_force_xsph_kernel, geom, has_ghosts, compact,
                          tile),
        grid_spec=_grid_spec(
            geom, in_specs, out_specs, scratch=scratch,
            n_prog=n_prog if compact else 0,
            n_extra_scalars=2 if emit is not None else 0),
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(*pre, *args)
    if emit is not None:
        return out[0], out[1], out[2]
    return out[0], out[1], None


# ---------------------------------------------------------------------------
# substep composition
# ---------------------------------------------------------------------------

def _interpret_default() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


# Static dest bucket of the UNCONDITIONAL inline overflow fallback
# (overflow_inline=True).  bench.py tightens its overflow assert to this
# bound when the knob is on (rows past it stay ballistic for a substep).
_OVF_INLINE_B = 512


def _movf_bound(n: int, config: SimConfig) -> int:
    """Static capacity of the exact-overflow dest set (0 disables)."""
    if not getattr(config, "exact_overflow", True):
        return 0
    m = max(2048, n // 64)
    return min(n, -(-m // 256) * 256)


def _overflow_exact(s: PL.Sorted, m: PL.MetaFields, fluid: jax.Array,
                    ofl: jax.Array, rho_fluid: jax.Array,
                    params: FluidParams, dt: jax.Array, movf: int):
    """Exact all-pairs WCSPH update for up to ``movf`` rank-overflow
    particles (VERDICT r3 weak #3: ballistic fallback never drains —
    overflowed particles feel no pressure, stack at the walls, and keep
    their cells crowded; the reference has no such hole because its
    per-cell lists are unbounded, ``BuildGrid.comp:34-38``).

    Dest set: the compacted overflow rows.  Sources: EVERY sorted row
    (fluid with the kernels' fresh densities, contributing ghosts at
    rho0/vel 0, overflow dests with their own fallback densities) — the
    same rectangular tiles as ``physics/brute_force`` and the same
    density -> force -> integrate -> xsph -> speed-cap pipeline, so the
    handled rows follow oracle physics exactly (minus the transient
    missing ovf->in-table source terms, bounded by
    ``test_pallas_overflow_transient_bounded``).

    Returns (didx, dmask, pos, vel, acc, rho, pres, foam) for the
    compacted dest rows."""
    from sph_tpu.physics import brute_force as BF
    n = s.key.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    oflag = jnp.where(ofl, 0, 1).astype(jnp.int32)
    _, oidx = lax.sort((oflag, iota), dimension=0, num_keys=1,
                       is_stable=True)
    didx = oidx[:movf]
    dmask = ofl[didx]

    contrib_j = m.contrib > 0
    gon = (m.ghost > 0) & contrib_j
    vel_j = jnp.where(gon[:, None], 0.0, s.vel)
    r0 = params.rest_density

    pos_i = s.pos[didx]
    vel_i = vel_j[didx]

    rho_raw = BF.density_pass(pos_i, s.pos, contrib_j, params)
    rho_i = jnp.maximum(rho_raw, C.DENSITY_FLOOR_FRAC * r0)
    pres_i = jnp.maximum(params.gas_constant * (rho_i - r0), 0.0)

    # source densities: kernel outputs for in-bin fluid, rho0 for
    # contributing ghosts, the fallback's own densities for dest rows;
    # anything else stays 0 and is masked out by the passes
    rho_j = jnp.where(fluid, rho_fluid, jnp.where(gon, r0, 0.0))
    rho_j = rho_j.at[didx].set(jnp.where(dmask, rho_i, rho_j[didx]),
                               unique_indices=True)
    pres_j = jnp.maximum(params.gas_constant * (rho_j - r0), 0.0)

    accum = BF.force_pass(pos_i, vel_i, pres_i, didx,
                          s.pos, vel_j, rho_j, pres_j, contrib_j, iota,
                          params)
    acc_i = C.assemble_acc(accum, rho_i, params)
    new_pos_i, new_vel_i = C.integrate(pos_i, vel_i, acc_i, dt)
    xs, xn = BF.xsph_pass(new_pos_i, new_vel_i, didx,
                          s.pos, vel_j, rho_j, contrib_j, iota, params)
    new_vel_i = C.speed_cap(C.apply_xsph(new_vel_i, xs, xn), params.h, dt)
    foam_i = C.foam_update(s.foam[didx], new_vel_i, rho_i, params)
    return didx, dmask, new_pos_i, new_vel_i, acc_i, rho_i, pres_i, foam_i


def _overflow_compact(ofl: jax.Array, movf: int):
    """Stable-compact the overflow rows to the front: (didx, dmask)."""
    n = ofl.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    oflag = jnp.where(ofl, 0, 1).astype(jnp.int32)
    _, oidx = lax.sort((oflag, iota), dimension=0, num_keys=1,
                       is_stable=True)
    didx = oidx[:movf]
    return didx, ofl[didx]


def _gather_tbl_sources(dest_key: jax.Array, tbl_a: jax.Array,
                        tbl_b: jax.Array, rho_a: jax.Array,
                        rho_b: jax.Array, gt, geom: PL.PlaneGeom):
    """27-cell in-table sources for the exact-overflow fallback.

    Gathers straight from the class-split dense tables (pos+vel) and
    the kernels' density outputs — the EXACT source set the sweep
    kernels see (rank < 2*cap per class per cell; empty slots carry
    SENTINEL_POS and distance-mask to zero).  Shared by the
    single-device engine and the slab engine (whose halo rows arrive
    pre-exchanged, so cross-slab sources ride the same gather).
    Returns (pj [B,S,3], vj [B,S,3], rj [B,S], gp [B,S,3] | None)."""
    gidx = PL.tbl_gather_idx(dest_key, geom)      # [B, 27*cap]
    fa = tbl_a.reshape(6, -1)[:, gidx]            # [6, B, 27*cap]
    fb = tbl_b.reshape(6, -1)[:, gidx]
    src = jnp.concatenate([fa, fb], axis=2)       # [6, B, S]
    pj = jnp.moveaxis(src[0:3], 0, -1)            # [B, S, 3]
    vj = jnp.moveaxis(src[3:6], 0, -1)
    rj = jnp.concatenate([rho_a.reshape(-1)[gidx],
                          rho_b.reshape(-1)[gidx]], axis=1)
    gp = None
    if gt is not None:
        ga = gt.tbl_a.reshape(3, -1)[:, gidx]
        gb = gt.tbl_b.reshape(3, -1)[:, gidx]
        gp = jnp.moveaxis(jnp.concatenate([ga, gb], axis=2), 0, -1)
    return pj, vj, rj, gp


def _ovf_gathered_density(pos_i: jax.Array, pj: jax.Array, rj: jax.Array,
                          gp, params: FluidParams) -> jax.Array:
    """Raw density over the gathered in-table + ghost sources (the
    caller adds the overflow-set all-pairs term, whose diagonal is the
    GLSL self term, SPHFluid.comp:89-106)."""
    from sph_tpu.physics import kernels as KK
    h = params.h
    h2 = h * h
    r2 = jnp.sum((pos_i[:, None, :] - pj) ** 2, axis=-1)
    rho = params.mass * jnp.sum(
        jnp.where((r2 < h2) & (rj > 0.0), KK.poly6(r2, h), 0.0), axis=1)
    if gp is not None:
        rg2 = jnp.sum((pos_i[:, None, :] - gp) ** 2, axis=-1)
        rho = rho + params.mass * jnp.sum(
            jnp.where(rg2 < h2, KK.poly6(rg2, h), 0.0), axis=1)
    return rho


def _ovf_force_xsph(pos_i, vel_i, foam_i, rho_i, pres_i, ids_i,
                    pj, vj, rj, gp,
                    opos, ovel, orho, opres, omask, oids,
                    params: FluidParams, dt: jax.Array):
    """Force + integrate + XSPH + foam for the overflow dest set, over
    the three source partitions: gathered in-table rows (pj/vj/rj),
    the overflow set (opos..oids — local, or all_gather'd under
    slabs), and gathered ghosts gp (rho0/vel0/pres0,
    SPHFluid.comp:71-83).  Oracle semantics (physics/brute_force)."""
    from sph_tpu.physics import brute_force as BF
    from sph_tpu.physics import kernels as KK
    h = params.h
    h2 = h * h
    r0 = params.rest_density

    dr = pos_i[:, None, :] - pj
    r2 = jnp.sum(dr * dr, axis=-1)
    r = jnp.sqrt(r2)
    prj = jnp.maximum(params.gas_constant * (rj - r0), 0.0)
    maskf = (r < h) & (rj > 0.0)
    fp, fv, gcf, lcf = C.pair_force_terms(
        dr, r, vel_i[:, None, :], vj, pres_i[:, None], prj, rj,
        h, params.mass, maskf)
    accum = C.ForceAccum(fp.sum(1), fv.sum(1), gcf.sum(1), lcf.sum(1))
    a2 = BF.force_pass(pos_i, vel_i, pres_i, ids_i,
                       opos, ovel, orho, opres, omask, oids, params)
    accum = C.ForceAccum(*(x + y for x, y in zip(accum, a2)))
    if gp is not None:
        drg = pos_i[:, None, :] - gp
        rg = jnp.sqrt(jnp.sum(drg * drg, axis=-1))
        rhog = jnp.where(rg < h, r0, 0.0)
        fpg, fvg, gcg, lcg = C.pair_force_terms(
            drg, rg, vel_i[:, None, :], jnp.zeros_like(gp),
            pres_i[:, None], jnp.zeros_like(rhog), rhog,
            h, params.mass, (rg < h) & (rhog > 0.0))
        accum = C.ForceAccum(*(x + y.sum(1) for x, y in zip(
            accum, (fpg, fvg, gcg, lcg))))
    acc_i = C.assemble_acc(accum, rho_i, params)
    new_pos_i, new_vel_i = C.integrate(pos_i, vel_i, acc_i, dt)

    # xsph: fresh self pos/vel vs stale sources (brute_force.py:116)
    rr2 = jnp.sum((new_pos_i[:, None, :] - pj) ** 2, axis=-1)
    wx = jnp.where((rr2 < h2) & (rj > 0.0), KK.poly6(rr2, h), 0.0)
    mw = wx * params.mass / jnp.maximum(rj, 1e-12)
    xs = jnp.sum((vj - new_vel_i[:, None, :]) * mw[..., None], axis=1)
    xn = jnp.sum(wx, axis=1)
    xs2, xn2 = BF.xsph_pass(new_pos_i, new_vel_i, ids_i,
                            opos, ovel, orho, omask, oids, params)
    xs, xn = xs + xs2, xn + xn2
    if gp is not None:
        rrg2 = jnp.sum((new_pos_i[:, None, :] - gp) ** 2, axis=-1)
        wxg = jnp.where(rrg2 < h2, KK.poly6(rrg2, h), 0.0)
        mwg = wxg * params.mass / r0
        xs = xs + jnp.sum((-new_vel_i[:, None, :]) * mwg[..., None],
                          axis=1)
        xn = xn + jnp.sum(wxg, axis=1)
    new_vel_i = C.speed_cap(C.apply_xsph(new_vel_i, xs, xn), h, dt)
    foam_i = C.foam_update(foam_i, new_vel_i, rho_i, params)
    return new_pos_i, new_vel_i, acc_i, foam_i


def _ovf_core(pos_i, vel_i, foam_i, key_i, amask, ids_i,
              tbl_a, tbl_b, rho_a, rho_b, gt, params: FluidParams,
              dt: jax.Array, geom: PL.PlaneGeom):
    """Exact WCSPH update for a FIXED set of overflow rows (the body of
    :func:`_overflow_nbr`, also used by the resident engine with
    side-carried rows): table-gathered 27-cell sources + all-pairs over
    the row set + gathered ghosts.  Returns
    (pos, vel, acc, rho, pres, foam) for the rows."""
    from sph_tpu.physics import brute_force as BF
    r0 = params.rest_density
    pj, vj, rj, gp = _gather_tbl_sources(key_i, tbl_a, tbl_b,
                                         rho_a, rho_b, gt, geom)
    rho_raw = _ovf_gathered_density(pos_i, pj, rj, gp, params)
    rho_raw = rho_raw + BF.density_pass(pos_i, pos_i, amask, params)
    rho_i = jnp.maximum(rho_raw, C.DENSITY_FLOOR_FRAC * r0)
    pres_i = jnp.maximum(params.gas_constant * (rho_i - r0), 0.0)

    orho = jnp.where(amask, rho_i, 0.0)
    opres = jnp.where(amask, pres_i, 0.0)
    new_pos_i, new_vel_i, acc_i, foam_i = _ovf_force_xsph(
        pos_i, vel_i, foam_i, rho_i, pres_i, ids_i,
        pj, vj, rj, gp, pos_i, vel_i, orho, opres, amask, ids_i,
        params, dt)
    return new_pos_i, new_vel_i, acc_i, rho_i, pres_i, foam_i


def _overflow_nbr(s: PL.Sorted, ofl: jax.Array, ft, rho_a: jax.Array,
                  rho_b: jax.Array, gt, params: FluidParams,
                  dt: jax.Array, geom: PL.PlaneGeom, B: int, movf: int):
    """Exact WCSPH update for rank-overflow particles, neighborhood
    sources (the cheap form of :func:`_overflow_exact` — same math,
    same oracle semantics, but each dest sources from its 27 cells'
    IN-TABLE rows + an all-pairs block over the overflow set + the
    gathered ghost-table rows, instead of from all ``n`` sorted rows.
    Cost scales with the actual overflow count through the
    ``B``-bucket ``lax.switch`` ladder in :func:`substep`; the round-4
    all-pairs cut cost 2.3 s/substep at 1M with 170 steady-state
    overflow — movf(18k) x n(1.1M) pairs every substep, measured
    2379 ms vs 201 with this form, PERF.md).

    Exactness argument: a dest's kernel support (radius h <= cell
    size) is covered by its 27-cell neighborhood.  Sources within it
    partition into (a) in-table rows — gathered from the dense class
    tables with the kernels' own floored densities (rho_a/rho_b);
    (b) other overflow rows — not in tables, covered by the all-pairs
    block over the compacted dest set (its diagonal supplies the self
    term the GLSL density loop includes); (c) contributing ghosts —
    gathered from the ghost tables, exactly the ghost set the kernels
    see.  Everything is a TABLE GATHER: no scatter-add counts build,
    no n-row ghost compaction sort (both measured as the 49 ms/substep
    bench-vs-profiler gap at ghost_1m, PERF.md round-4).

    ``B``: rows actually computed (first B of the compacted movf).
    Returns movf-padded (didx, dmask, pos, vel, acc, rho, pres, foam).
    """
    didx, dmask = _overflow_compact(ofl, movf)
    dB = didx[:B]
    amask = ofl[dB]
    new_pos_i, new_vel_i, acc_i, rho_i, pres_i, foam_i = _ovf_core(
        s.pos[dB], s.vel[dB], s.foam[dB], s.key[dB], amask, dB,
        ft.tbl_a, ft.tbl_b, rho_a, rho_b, gt, params, dt, geom)

    def padm(x):
        pad = [(0, movf - B)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad) if movf > B else x

    return (didx, dmask & (jnp.arange(movf) < B), padm(new_pos_i),
            padm(new_vel_i), padm(acc_i), padm(rho_i), padm(pres_i),
            padm(foam_i))


def build_aux(state: ParticleState, params: FluidParams,
              config: SimConfig):
    """Per-frame neighbor aux: the static ghost tables (or NO_GHOSTS).

    Ghost positions and per-face activation are fixed across the
    substeps of a frame, so ``engine.run_substeps`` builds this once
    outside the scan.  The ghost-presence check needs concrete state;
    under a tracer we conservatively build the tables."""
    try:
        has_g = bool(jax.device_get(jnp.any(state.ghost > 0)))
    except jax.errors.TracerArrayConversionError:
        has_g = True
    if not has_g:
        return NO_GHOSTS
    geom = PL.geom_for(config)
    return _build_ghost_tables_jit(state, params, geom)


@functools.partial(jax.jit, static_argnames=("geom",))
def _build_ghost_tables_jit(state, params, geom):
    return PL.build_ghost_tables(state, params, geom)


def substep(state: ParticleState, params: FluidParams, dt: jax.Array,
            config: SimConfig, aux=None) -> ParticleState:
    """Full Pallas-kernel substep. Returns state in SORTED order
    (particle identity lives in spawn order via orig_id).

    ``aux``: ``NO_GHOSTS`` (no ghost particles in the config), a
    ``planes.GhostTables`` built by :func:`build_aux`, or None to build
    ghost tables inline (conservative default for direct callers)."""
    geom = PL.geom_for(config)
    interpret = _interpret_default()

    if aux is None:
        aux = PL.build_ghost_tables(state, params, geom)
    gt: Optional[PL.GhostTables] = (
        aux if isinstance(aux, PL.GhostTables) else None)

    m_valid = state.valid > 0
    fluid_mask = m_valid & (state.ghost == 0)
    key = PL.compute_keys_ymajor(state.pos, fluid_mask, params, geom)
    contrib = state.contrib_mask(params.ghost_face_active)
    s = PL.sort_particles(state, key, contrib)
    ft = PL.build_fluid_tables(s, params, geom)
    occ_rows = ft.occ_rows if gt is None else (
        ft.occ_rows | (gt.occ << PL.GOCC_SHIFT))
    pvec = _make_pvec(params, dt)

    # row-emit (PERF.md roofline fix #4): the force kernel streams its
    # outputs straight to window-padded particle rows; the per-substep
    # table gather collapses to a cheap monotone reorder
    n = s.key.shape[0]
    tile = int(getattr(config, "emit_tile", 64))
    emit_on = bool(getattr(config, "emit_rows", True)) and tile > 0
    if emit_on:
        from sph_tpu.neighbors import mxu_permute as MX
        pc = PL.padded_cell_index(s.key, geom)
        key_p = jnp.where(s.key < geom.num_cells, pc,
                          geom.padded_cells)
        win, slot_c, wst, wdst = MX.emit_window_ids(key_p, s.rank,
                                                    geom, tile)
        nw = wst.shape[0] - 1
        n_emit = n + tile * nw
        emit = (MX.emit_rows_build(slot_c, tile), wst, wdst, n_emit,
                tile)
    else:
        emit = None

    def run_sweeps(qc, n_prog, force_compact=True):
        # force_compact=False restricts compaction to the density kernel
        # (A/B: seq4 profiled force cmpct 119 vs dense 91 ms at 1M while
        # density cmpct is a consistent ~6 ms win); one code path for
        # both dispatches so emit/em-None handling can't diverge
        # (ADVICE r4).
        ra, rb = density_call(ft, occ_rows, gt, pvec, geom, interpret,
                              qc=qc, n_prog=n_prog)
        fqc, fn = (qc, n_prog) if force_compact else (None, 0)
        oa, ob, em = force_xsph_call(ft, occ_rows, ra, rb, gt, pvec,
                                     geom, interpret, qc=fqc,
                                     n_prog=fn, emit=emit)
        if em is None:
            em = jnp.zeros((0, 128), jnp.float32)
        return ra, rb, oa, ob, em

    # compact-grid sweeps when the active blocks fit the static cap;
    # dense fallback otherwise (PERF.md roofline fix #2).
    ma = _max_active(geom, config)
    if ma:
        fc = bool(getattr(config, "compact_force", True))
        qc, n_active = active_block_list(occ_rows, geom, ma)
        rho_a, rho_b, out_a, out_b, em = lax.cond(
            n_active <= ma,
            lambda: run_sweeps(qc, ma, force_compact=fc),
            lambda: run_sweeps(None, 0))
    else:
        rho_a, rho_b, out_a, out_b, em = run_sweeps(None, 0)

    nf = config.n_fluid if 0 < config.n_fluid < n else n
    if emit_on:
        # monotone reorder: row i of the sorted array lives at
        # wdst[win_i] + (i - wst[win_i]) in the emitted rows (garbage
        # for non-member rows — their ghost/ballistic fallback values
        # are selected below)
        iota = jnp.arange(n, dtype=jnp.int32)
        dst_idx = jnp.clip(wdst[win] + (iota - wst[win]), 0,
                           em.shape[0] - 1)
        per = em[dst_idx[:nf], :10]                           # [nf, 10]
    elif getattr(config, "gather_cols", False):
        # per-field two-gather + select: no [10, T] concat and no
        # [T, 10] transpose materialization — 10 gathers with the SAME
        # monotone index against each flat field plane
        idx = PL.out_flat_index(s, geom)[:nf]
        t_class = geom.nyq * geom.n_chunks * geom.s_slots * geom.cw
        ia = jnp.minimum(idx, t_class - 1)
        ib = jnp.maximum(idx - t_class, 0)
        sel = idx < t_class
        cols = []
        for f in range(10):
            fa = (out_a[f] if f < 9 else rho_a).reshape(-1)
            fb = (out_b[f] if f < 9 else rho_b).reshape(-1)
            cols.append(jnp.where(sel, fa[ia], fb[ib]))
        per = jnp.stack(cols, axis=1)                         # [nf, 10]
    else:
        # one row gather back to (sorted) particle order (measured at
        # 1M, see PERF.md 10: the XLA row gather beats every FULL-table
        # MXU one-hot variant tried; row-emit above beats both).
        # Row-gather cost scales with ROW COUNT, and sorted fluid rows
        # come first (ghosts/invalid spill to key=num_cells), so gather
        # only the static fluid upper bound and zero-fill the tail
        # (those rows are reassembled from their own fallback paths
        # below anyway).
        sa = jnp.concatenate([out_a, rho_a[None]], axis=0).reshape(
            10, -1)
        sb = jnp.concatenate([out_b, rho_b[None]], axis=0).reshape(
            10, -1)
        tbl = jnp.concatenate([sa, sb], axis=1).T
        idx = PL.out_flat_index(s, geom)[:nf]
        if getattr(config, "gather_unique", False):
            # the index set is a permutation into distinct slots; the
            # unique_indices tag lets XLA skip its duplicate-handling
            # path (A/B for the latency-bound 42 ms gather at 1M)
            per = tbl.at[idx].get(unique_indices=True,
                                  mode="promise_in_bounds")
        else:
            per = tbl[idx]                                    # [nf, 10]
    if nf < n:
        per = jnp.concatenate(
            [per, jnp.zeros((n - nf, 10), jnp.float32)], axis=0)

    new_pos = per[:, 0:3]
    new_vel = per[:, 3:6]       # xsph + speed cap applied in-kernel
    new_acc = per[:, 6:9]
    new_rho = per[:, 9]
    new_pres = jnp.maximum(
        params.gas_constant * (new_rho - params.rest_density), 0.0)

    # --- reassemble particle state (mirrors binned.substep) ---
    m = PL.unpack_meta(s.meta)
    fluid = (m.valid > 0) & (m.ghost == 0) & ft.in_bin
    ofl = (m.valid > 0) & (m.ghost == 0) & ~ft.in_bin

    acc_g = jnp.broadcast_to(params.gravity[None, :], s.pos.shape)
    vel_g = C.speed_cap((s.vel + acc_g * dt) * C.VELOCITY_DAMPING,
                        params.h, dt)
    pos_g = s.pos + vel_g * dt

    ghost_on = (m.contrib > 0) & (m.ghost > 0)
    density = jnp.where(fluid, new_rho,
                        jnp.where(m.ghost > 0, params.rest_density, 0.0))
    pressure = jnp.where(fluid, new_pres, 0.0)
    foam = C.foam_update(s.foam, new_vel, density, params)

    pos = jnp.where(fluid[:, None], new_pos,
                    jnp.where(ofl[:, None], pos_g, s.pos))
    vel = jnp.where(fluid[:, None], new_vel,
                    jnp.where(ofl[:, None], vel_g, s.vel))
    vel = jnp.where(ghost_on[:, None], 0.0, vel)
    acc = jnp.where(fluid[:, None], new_acc,
                    jnp.where(ofl[:, None], acc_g, 0.0))
    acc = jnp.where(ghost_on[:, None], 0.0, acc)
    foam = jnp.where(fluid, foam, s.foam)

    # exact-overflow fallback (VERDICT r3 weak #3): rank-overflow rows
    # get oracle physics via a compacted neighborhood-gathered update
    # instead of a ballistic step that never drains.  A lax.switch
    # ladder sizes the dest bucket to the ACTUAL overflow count (1M
    # holds ~170 steady-state overflow — a fallback priced at movf is
    # paid every substep, see PERF.md round-4), and the 0 branch keeps
    # it free when no cell exceeds capacity.  Reference analogue:
    # unbounded per-cell lists, BuildGrid.comp:34-38 — no capacity, so
    # no such hole to patch.
    movf = _movf_bound(n, config)
    if movf and getattr(config, "overflow_inline", False):
        # A/B form: the B=512 neighborhood fallback runs UNCONDITIONALLY
        # inline — no lax.switch/cond boundary, so XLA fuses/lays out the
        # fallback gathers with the surrounding substep (finding 8: a
        # branch boundary can force big-operand relayouts even for never-
        # taken branches).  Overflow rows past B stay ballistic for the
        # substep (dmask truncation below) — acceptable only while the
        # steady overflow is < B (ghost_1m: 170).
        B = min(_OVF_INLINE_B, movf)
        didx, dmask, pos_o, vel_o, acc_o, rho_o, pres_o, foam_o = \
            _overflow_nbr(s, ofl, ft, rho_a, rho_b, gt, params, dt,
                          geom, B, movf)

        def put(dst, src):
            sel = dmask[:, None] if src.ndim == 2 else dmask
            return dst.at[didx].set(jnp.where(sel, src, dst[didx]),
                                    unique_indices=True)

        pos = put(pos, pos_o)
        vel = put(vel, vel_o)
        acc = put(acc, acc_o)
        density = put(density, rho_o)
        pressure = put(pressure, pres_o)
        foam = put(foam, foam_o)
    elif movf:
        def _skip():
            z3 = jnp.zeros((movf, 3), jnp.float32)
            z1 = jnp.zeros((movf,), jnp.float32)
            return (jnp.arange(movf, dtype=jnp.int32),
                    jnp.zeros((movf,), jnp.bool_), z3, z3, z3, z1, z1,
                    z1)

        if getattr(config, "overflow_allpairs", False):
            branches = [_skip,
                        lambda: _overflow_exact(s, m, fluid, ofl,
                                                new_rho, params, dt,
                                                movf)]
            thresholds = [0]
        else:
            buckets = [b for b in (512, 4096) if b < movf] + [movf]

            def mk(b):
                return lambda: _overflow_nbr(s, ofl, ft, rho_a, rho_b,
                                             gt, params, dt, geom, b,
                                             movf)

            branches = [_skip] + [mk(b) for b in buckets]
            thresholds = [0] + buckets[:-1]
        cnt_o = jnp.sum(ofl.astype(jnp.int32))
        sel = sum((cnt_o > t).astype(jnp.int32) for t in thresholds)
        didx, dmask, pos_o, vel_o, acc_o, rho_o, pres_o, foam_o = \
            lax.switch(sel, branches)

        def put(dst, src):
            sel = dmask[:, None] if src.ndim == 2 else dmask
            return dst.at[didx].set(jnp.where(sel, src, dst[didx]),
                                    unique_indices=True)

        pos = put(pos, pos_o)
        vel = put(vel, vel_o)
        acc = put(acc, acc_o)
        density = put(density, rho_o)
        pressure = put(pressure, pres_o)
        foam = put(foam, foam_o)

    return PL.to_particle_state(
        s._replace(pos=pos, vel=vel, foam=foam),
        density=density, pressure=pressure, acc=acc)
