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


def _tbl_spec(geom: PL.PlaneGeom, f: int, view: int, dc: int
              ) -> pl.BlockSpec:
    """3x3 neighborhood block over a class table [F, nyq, nc, 2cap, CW].
    BOTH the pair and chunk indices clamp at the plane edges; the junk
    this injects is never read (clamped-pair source rows are gated off
    by their real occupancy words, which live OUTSIDE the table and are
    indexed by true row; clamped-chunk junk lanes are beyond every real
    destination's reach, see ``_ext_rows``)."""
    nc = geom.n_chunks
    nyq = geom.nyq

    def imap(q, c, occ, pvec):
        return (0, jnp.clip(q + view - 1, 0, nyq - 1),
                jnp.clip(c + dc, 0, nc - 1), 0, 0)

    return pl.BlockSpec((f, 1, 1, geom.s_slots, geom.cw), imap,
                        memory_space=pltpu.VMEM)


def _rho_spec(geom: PL.PlaneGeom, view: int, dc: int) -> pl.BlockSpec:
    """3x3 block over a density output array [nyq, nc, 2cap, CW]."""
    nc = geom.n_chunks
    nyq = geom.nyq

    def imap(q, c, occ, pvec):
        return (jnp.clip(q + view - 1, 0, nyq - 1),
                jnp.clip(c + dc, 0, nc - 1), 0, 0)

    return pl.BlockSpec((1, 1, geom.s_slots, geom.cw), imap,
                        memory_space=pltpu.VMEM)


def _nine(spec_fn, geom, *a):
    return [spec_fn(geom, *a, v, dc) if a else spec_fn(geom, v, dc)
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


def _grid_spec(geom: PL.PlaneGeom, in_specs, out_specs, scratch=()):
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(geom.nyq, geom.n_chunks),
        in_specs=list(in_specs),
        out_specs=out_specs,
        scratch_shapes=list(scratch))


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

def _density_kernel(geom: PL.PlaneGeom, has_ghosts: bool,
                    occ_ref, pvec_ref, *refs):
    fa9 = refs[0:9]
    fb9 = refs[9:18]
    ga9 = refs[18:27] if has_ghosts else None
    gb9 = refs[27:36] if has_ghosts else None
    rho_a_ref = refs[-2]
    rho_b_ref = refs[-1]
    q = pl.program_id(0)
    c = pl.program_id(1)
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
                 interpret: bool):
    """FINAL per-slot fluid density (floored) for both rank classes:
    two [nyq, nc, 2cap, CW] arrays."""
    has_ghosts = gt is not None
    in_specs = _nine(_tbl_spec, geom, 6) * 2
    args = [ft.tbl_a] * 9 + [ft.tbl_b] * 9
    if has_ghosts:
        in_specs += _nine(_tbl_spec, geom, 3) * 2
        args += [gt.tbl_a] * 9 + [gt.tbl_b] * 9
    out = pl.pallas_call(
        functools.partial(_density_kernel, geom, has_ghosts),
        grid_spec=_grid_spec(geom, in_specs,
                             [_rho_out_spec(geom), _rho_out_spec(geom)]),
        out_shape=[_rho_shape(geom), _rho_shape(geom)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(occ_rows, pvec, *args)
    return out[0], out[1]


def _rho_out_spec(geom: PL.PlaneGeom) -> pl.BlockSpec:
    return pl.BlockSpec((1, 1, geom.s_slots, geom.cw),
                        lambda q, c, occ, pvec: (q, c, 0, 0),
                        memory_space=pltpu.VMEM)


def _rho_shape(geom: PL.PlaneGeom):
    return jax.ShapeDtypeStruct(
        (geom.nyq, geom.n_chunks, geom.s_slots, geom.cw), jnp.float32)


def _out_spec(geom: PL.PlaneGeom, f: int) -> pl.BlockSpec:
    return pl.BlockSpec((f, 1, 1, geom.s_slots, geom.cw),
                        lambda q, c, occ, pvec: (0, q, c, 0, 0),
                        memory_space=pltpu.VMEM)


def _out_shape(geom: PL.PlaneGeom, f: int):
    return jax.ShapeDtypeStruct(
        (f, geom.nyq, geom.n_chunks, geom.s_slots, geom.cw), jnp.float32)


# ---------------------------------------------------------------------------
# force + integrate + xsph (fused)
# ---------------------------------------------------------------------------

def _force_xsph_kernel(geom: PL.PlaneGeom, has_ghosts: bool,
                       occ_ref, pvec_ref, *refs):
    fa9 = refs[0:9]
    fb9 = refs[9:18]
    ra9 = refs[18:27]
    rb9 = refs[27:36]
    ga9 = refs[36:45] if has_ghosts else None
    gb9 = refs[45:54] if has_ghosts else None
    out_a_ref = refs[-3]
    out_b_ref = refs[-2]
    acc_ref = refs[-1]
    q = pl.program_id(0)
    c = pl.program_id(1)
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

    out_a_ref[...] = jnp.zeros(out_a_ref.shape, jnp.float32)
    out_b_ref[...] = jnp.zeros(out_b_ref.shape, jnp.float32)

    @pl.when((dest_a | dest_b) > 0)
    def _():
        gminv = mass / jnp.maximum(rho0, 1e-12)     # ghost: rho == rho0

        def fluid_fam(f9, r9, shift):
            # hoisted per-source-row pressure and mass/rho (one divide
            # per row instead of one per (row, offset) pair); EOS
            # in-kernel (SPHFluid.comp:109-111)
            rho_ext = _ext_rows(r9, geom, lead=False)
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


def _mark_self(fams, self_fam):
    """Tag the dest class's family for self-pair exclusion."""
    return [f._replace(is_self=(f is self_fam)) if not f.ghost else f
            for f in fams]


def force_xsph_call(ft: PL.FluidTables, occ_rows: jax.Array,
                    rho_a: jax.Array, rho_b: jax.Array, gt,
                    pvec: jax.Array, geom: PL.PlaneGeom,
                    interpret: bool):
    """Two [9, nyq, nc, 2cap, CW] outputs (classes A, B): npx npy npz
    vx vy vz (final: xsph-applied + speed-capped) ax ay az."""
    has_ghosts = gt is not None
    in_specs = _nine(_tbl_spec, geom, 6) * 2 + _nine(_rho_spec, geom) * 2
    args = ([ft.tbl_a] * 9 + [ft.tbl_b] * 9
            + [rho_a] * 9 + [rho_b] * 9)
    if has_ghosts:
        in_specs += _nine(_tbl_spec, geom, 3) * 2
        args += [gt.tbl_a] * 9 + [gt.tbl_b] * 9
    out = pl.pallas_call(
        functools.partial(_force_xsph_kernel, geom, has_ghosts),
        grid_spec=_grid_spec(
            geom, in_specs, [_out_spec(geom, 9), _out_spec(geom, 9)],
            scratch=[pltpu.VMEM((11, geom.s_slots, geom.cw),
                                jnp.float32)]),
        out_shape=[_out_shape(geom, 9), _out_shape(geom, 9)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(occ_rows, pvec, *args)
    return out[0], out[1]


# ---------------------------------------------------------------------------
# substep composition
# ---------------------------------------------------------------------------

def _interpret_default() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


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

    rho_a, rho_b = density_call(ft, occ_rows, gt, pvec, geom, interpret)
    out_a, out_b = force_xsph_call(ft, occ_rows, rho_a, rho_b, gt, pvec,
                                   geom, interpret)

    # --- one row gather back to (sorted) particle order ---
    # (measured at 1M, see PERF.md 10: XLA row gather beats every MXU
    # one-hot / transposed / monotone-index variant tried).  Row-gather
    # cost scales with ROW COUNT, and sorted fluid rows come first
    # (ghosts/invalid spill to key=num_cells), so gather only the
    # static fluid upper bound and zero-fill the tail (those rows are
    # reassembled from their own fallback paths below anyway).
    n = s.key.shape[0]
    nf = config.n_fluid if 0 < config.n_fluid < n else n
    sa = jnp.concatenate([out_a, rho_a[None]], axis=0).reshape(10, -1)
    sb = jnp.concatenate([out_b, rho_b[None]], axis=0).reshape(10, -1)
    per = jnp.concatenate([sa, sb], axis=1).T[
        PL.out_flat_index(s, geom)[:nf]]                      # [nf, 10]
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

    return PL.to_particle_state(
        s._replace(pos=pos, vel=vel, foam=foam),
        density=density, pressure=pressure, acc=acc)
