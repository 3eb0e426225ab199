"""Pallas TPU neighbor-sweep kernels — the hot path of the framework.

Replaces the XLA binned-plane sweeps (``binned_sweeps.py``) with three
fused Mosaic kernels over cell-block planes built by ``planes.py``:

1. **density**  — poly6 pair sums (``shaders/SPHFluid.comp:89-106``)
2. **force**    — spiky-gradient pressure + viscosity Laplacian +
   color-field surface tension accumulators, fused with gravity assembly
   and semi-implicit Euler integration (``SPHFluid.comp:109-171``)
3. **xsph**     — XSPH velocity smoothing vs pre-move neighbors
   (``SPHFluid.comp:177-201``)

Kernel structure (all three share it):

- Planes are ``[nyp, n_chunks, K, CWH]`` per field: y cell rows with a
  +-1 halo, the (z, x) plane flattened to lanes and chunked into
  ``CW``-lane windows carrying ``H = nxp + 1`` halo lanes per side, and
  K = 8 cell slots on the f32 sublane dim (full VPU rows).
- grid = ``(ny, n_chunks)``; each program DMAs, per field, the 3
  contributing y-rows as whole ``(K, CWH)`` blocks — every source row
  is fetched ONCE per destination chunk (not once per slot), and the
  center view doubles as the destination block (no separate dst fetch).
- The source-slot loop ``k2`` is a static 8-iteration unroll *inside*
  the kernel; each iteration is wrapped in ``pl.when(k2 < occ)`` where
  ``occ = max_v occ_rows[y + v, chunk]`` is a scalar-prefetched bound
  on the max occupied slot over the 3 contributing y-rows' chunk
  windows + halo lanes — compute scales with real occupancy, and
  fully-empty chunks skip everything (the TPU equivalent of the
  reference dispatching only ceil(N/256) workgroups).  (Per-row
  gating of the k2 loop was measured SLOWER: it triples the number of
  conditional regions and therefore the accumulator flush traffic
  through VMEM refs.)
- Every neighbor-cell offset (dy, dz, dx) is a *static lane slice*
  ``src[k2, H + dz*nxp + dx : +CW]`` of the halo-extended chunk, so the
  27 sweeps compile to pure VPU code with zero gathers (the TPU-shaped
  replacement for the linked-list walks in ``SPHFluid.comp:92-103``).
- Empty slots and out-of-grid cells hold a far-away sentinel position,
  so the ``r^2 < h^2`` test removes them with no flag traffic.

Physics semantics are identical to ``physics/brute_force.py`` (the
oracle) and ``neighbors/binned.py``; see ``physics/common.py``.
"""
from __future__ import annotations

import functools
from typing import Sequence

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


def _offsets(geom: PL.PlaneGeom):
    """(view, lane_offset, is_zero_offset) for the 27 neighbor cells."""
    for v in range(3):
        for dz in (-1, 0, 1):
            for dx in (-1, 0, 1):
                yield v, geom.halo + dz * geom.nxp + dx, (
                    v == 1 and dz == 0 and dx == 0)


def _lane_offsets(geom: PL.PlaneGeom, v: int):
    """(lane_offset, is_zero_offset) for one y-view's 9 neighbor cells."""
    for dz in (-1, 0, 1):
        for dx in (-1, 0, 1):
            yield geom.halo + dz * geom.nxp + dx, (
                v == 1 and dz == 0 and dx == 0)


def _row_occs(occ_ref, y, c):
    """(src slot bound over the 3 contributing y-rows, center-row fluid
    dest gate) from the packed occupancy table (planes.py: low 4 bits =
    max occupied slot, bit 4 = center window holds fluid)."""
    rows = [occ_ref[y + v, c] for v in range(3)]
    occ = jnp.maximum(jnp.maximum(rows[0] & 15, rows[1] & 15),
                      rows[2] & 15)
    dest = (rows[1] >> 4) & 1
    return occ, dest


def _src_spec(geom: PL.PlaneGeom, view: int) -> pl.BlockSpec:
    return pl.BlockSpec((1, 1, geom.cap, geom.cwh),
                        lambda y, c, occ, pvec, v=view: (y + v, c, 0, 0),
                        memory_space=pltpu.VMEM)


def _dstout_spec(geom: PL.PlaneGeom) -> pl.BlockSpec:
    """Block over a force-kernel *output* array (no halo) used as input."""
    return pl.BlockSpec((1, 1, geom.cap, geom.cw),
                        lambda y, c, occ, pvec: (y, c, 0, 0),
                        memory_space=pltpu.VMEM)


def _out_spec(geom: PL.PlaneGeom) -> pl.BlockSpec:
    return pl.BlockSpec((1, 1, geom.cap, geom.cw),
                        lambda y, c, occ, pvec: (y, c, 0, 0),
                        memory_space=pltpu.VMEM)


def _out_shape(geom: PL.PlaneGeom) -> jax.ShapeDtypeStruct:
    return jax.ShapeDtypeStruct(
        (geom.ny, geom.n_chunks, geom.cap, geom.cw), jnp.float32)


def _grid_spec(geom: PL.PlaneGeom, in_specs: Sequence[pl.BlockSpec],
               out_specs, scratch_shapes=()):
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(geom.ny, geom.n_chunks),
        in_specs=list(in_specs),
        out_specs=out_specs,
        scratch_shapes=list(scratch_shapes))


# The unrolled 8-slot x 27-offset pair loops carry wide temporaries;
# raise the default 16 MiB scoped-VMEM ceiling so the compiler can keep
# them resident instead of failing (v5e has 128 MiB VMEM per core).
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _src_rows(refs):
    """3 chunked-plane src refs -> their (K, CWH) blocks."""
    return [r[0, 0] for r in refs]


def _rho_spec(geom: PL.PlaneGeom, view: int, dc: int) -> pl.BlockSpec:
    """Neighbor-density block over the density *output* array (no halo):
    3 y-views x 3 lane-chunks, chunk index clamped at the plane edges.
    Out-of-plane halo lanes assemble garbage, but the position sentinel
    already fails the r < h test for those lanes, so the value is never
    used."""
    nc = geom.n_chunks
    ny = geom.ny

    def imap(y, c, occ, pvec):
        # y/c clamps re-read an interior block at the plane edges; the
        # sentinel in the POSITION y-halo / lane-halo makes those pairs
        # fail r < h, so the wrong rho never contributes.
        return (jnp.clip(y + view - 1, 0, ny - 1),
                jnp.clip(c + dc, 0, nc - 1), 0, 0)

    return pl.BlockSpec((1, 1, geom.cap, geom.cw), imap,
                        memory_space=pltpu.VMEM)


def _rho_views(refs, geom):
    """9 clamped rho blocks -> 3 halo-extended (K, CWH) rows.

    refs order: view-major [(v0,c-1),(v0,c),(v0,c+1),(v1,...),...]."""
    h = geom.halo
    rows = []
    for v in range(3):
        left, mid, right = (r[0, 0] for r in refs[v * 3:(v + 1) * 3])
        rows.append(jnp.concatenate(
            [left[:, geom.cw - h:], mid, right[:, :h]], axis=1))
    return rows


def _center(rows, geom):
    """Center-view (K, CWH) block -> interior (K, CW) destination."""
    return rows[1][:, geom.halo:geom.halo + geom.cw]


def _self_mask(k2: int, geom: PL.PlaneGeom):
    return lax.broadcasted_iota(jnp.int32, (geom.cap, geom.cw), 0) == k2


# ---------------------------------------------------------------------------
# density
# ---------------------------------------------------------------------------

def _density_kernel(geom: PL.PlaneGeom, occ_ref, pvec_ref, *refs):
    spx, spy, spz = refs[0:3], refs[3:6], refs[6:9]
    ghost_ref = refs[9]
    rho_ref = refs[10]
    y = pl.program_id(0)
    c = pl.program_id(1)
    occ, dest = _row_occs(occ_ref, y, c)
    h2 = pvec_ref[_PV_H2]
    cw = geom.cw
    rho0 = pvec_ref[_PV_RHO0]

    rho_ref[...] = jnp.full(rho_ref.shape, pvec_ref[_PV_RHO_FLOOR],
                            jnp.float32)

    @pl.when((occ > 0) & (dest > 0))
    def _():
        sx = _src_rows(spx)
        sy = _src_rows(spy)
        sz = _src_rows(spz)
        cx = _center(sx, geom)
        cy = _center(sy, geom)
        cz = _center(sz, geom)
        acc0 = jnp.zeros((geom.cap, cw), jnp.float32)
        rho_ref[0, 0] = acc0
        for k2 in range(geom.cap):
            @pl.when(k2 < occ)
            def _(k2=k2):
                acc = jnp.zeros((geom.cap, cw), jnp.float32)
                for v, off, _ in _offsets(geom):
                    ddx = cx - sx[v][k2, off:off + cw]
                    ddy = cy - sy[v][k2, off:off + cw]
                    ddz = cz - sz[v][k2, off:off + cw]
                    r2 = ddx * ddx + ddy * ddy + ddz * ddz
                    d = jnp.maximum(h2 - r2, 0.0)
                    acc = acc + d * d * d
                rho_ref[0, 0] += acc
        # pointwise finish: mass*poly6 scale + floor (SPHFluid.comp:105)
        raw = rho_ref[0, 0]
        scale = pvec_ref[_PV_MASS] * pvec_ref[_PV_POLY6]
        rho_ref[0, 0] = jnp.maximum(raw * scale, pvec_ref[_PV_RHO_FLOOR])

    # ghost override OUTSIDE the dest gate (ghost rho = rho0,
    # SPHFluid.comp:71-83): ghosts in fluid-free windows are still read
    # as neighbor sources by adjacent windows' force/xsph passes.
    g_on = ghost_ref[0, 0][:, geom.halo:geom.halo + cw] > 0.0
    rho_ref[0, 0] = jnp.where(g_on, rho0, rho_ref[0, 0])


def density_call(planes: PL.Planes, pvec: jax.Array, geom: PL.PlaneGeom,
                 interpret: bool) -> jax.Array:
    """FINAL per-slot density (floored, ghost-overridden): [ny,nc,K,CW]."""
    in_specs = []
    args = []
    for field in (planes.px, planes.py, planes.pz):
        for v in range(3):
            in_specs.append(_src_spec(geom, v))
            args.append(field)
    in_specs.append(_src_spec(geom, 1))     # ghost flag, center view
    args.append(planes.ghost_on)
    return pl.pallas_call(
        functools.partial(_density_kernel, geom),
        grid_spec=_grid_spec(geom, in_specs, _out_spec(geom)),
        out_shape=_out_shape(geom),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(planes.occ_rows, pvec, *args)


# ---------------------------------------------------------------------------
# force + integrate
# ---------------------------------------------------------------------------

def _force_kernel(geom: PL.PlaneGeom, occ_ref, pvec_ref, *refs):
    # srcs: 6 pos/vel fields x 3 views + 9 rho blocks; outs: 9;
    # scratch: acc (7, K, CW)
    s_fields = [refs[i * 3:(i + 1) * 3] for i in range(6)]
    rho_refs = refs[18:27]
    outs = refs[27:36]
    acc_ref = refs[36]
    y = pl.program_id(0)
    c = pl.program_id(1)
    occ, dest = _row_occs(occ_ref, y, c)
    cw = geom.cw
    kk = geom.cap
    h = pvec_ref[_PV_H]
    mass = pvec_ref[_PV_MASS]
    spiky_c = pvec_ref[_PV_SPIKY]
    visc_lap_c = pvec_ref[_PV_VISC_LAP]
    mu = pvec_ref[_PV_MU]
    rho0 = pvec_ref[_PV_RHO0]
    gas_k = pvec_ref[_PV_GASK]

    for o in outs:
        o[...] = jnp.zeros(o.shape, jnp.float32)

    @pl.when((occ > 0) & (dest > 0))
    def _():
        sv = [_src_rows(fld) for fld in s_fields]
        (sxv, syv, szv, svxv, svyv, svzv) = sv
        srhov = _rho_views(rho_refs, geom)
        # pressure from EOS in-kernel (SPHFluid.comp:109-111); ghosts
        # carry rho = rho0 so their pressure is exactly 0
        spresv = [jnp.maximum(gas_k * (r - rho0), 0.0) for r in srhov]
        cx = _center(sxv, geom)
        cy = _center(syv, geom)
        cz = _center(szv, geom)
        cvx = _center(svxv, geom)
        cvy = _center(svyv, geom)
        cvz = _center(svzv, geom)
        cpres = _center(spresv, geom)

        # hoisted per-src-element mass/rho (one divide per row instead of
        # one per (row, offset) pair)
        sminvv = [mass / jnp.maximum(r, 1e-12) for r in srhov]

        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)
        for k2 in range(kk):
            @pl.when(k2 < occ)
            def _(k2=k2):
                self_row = _self_mask(k2, geom)
                fx = jnp.zeros((kk, cw), jnp.float32)
                fy = jnp.zeros((kk, cw), jnp.float32)
                fz = jnp.zeros((kk, cw), jnp.float32)
                gcx = jnp.zeros((kk, cw), jnp.float32)
                gcy = jnp.zeros((kk, cw), jnp.float32)
                gcz = jnp.zeros((kk, cw), jnp.float32)
                lc = jnp.zeros((kk, cw), jnp.float32)
                for v, off, zero_off in _offsets(geom):
                    ddx = cx - sxv[v][k2, off:off + cw]
                    ddy = cy - syv[v][k2, off:off + cw]
                    ddz = cz - szv[v][k2, off:off + cw]
                    r2 = ddx * ddx + ddy * ddy + ddz * ddz
                    # one rsqrt replaces sqrt + the 1/r divide
                    rinv = lax.rsqrt(jnp.maximum(r2, 1e-24))
                    r = r2 * rinv
                    inside = r < h
                    if zero_off:
                        inside = inside & ~self_row
                    spres = spresv[v][k2, off:off + cw]
                    mw = jnp.where(inside, sminvv[v][k2, off:off + cw],
                                   0.0)
                    dcl = jnp.maximum(h - r, 0.0)
                    gmag = jnp.where(r2 > 0.0,
                                     spiky_c * dcl * dcl * rinv, 0.0)
                    lapw = visc_lap_c * dcl
                    pscale = -(cpres + spres) * 0.5 * mw * gmag
                    vscale = mw * lapw * mu
                    fx = fx + pscale * ddx \
                        + vscale * (svxv[v][k2, off:off + cw] - cvx)
                    fy = fy + pscale * ddy \
                        + vscale * (svyv[v][k2, off:off + cw] - cvy)
                    fz = fz + pscale * ddz \
                        + vscale * (svzv[v][k2, off:off + cw] - cvz)
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

        # surface tension + gravity + integrate (SPHFluid.comp:156-171)
        st = pvec_ref[_PV_ST]
        dt = pvec_ref[_PV_DT]
        fx = acc_ref[0]
        fy = acc_ref[1]
        fz = acc_ref[2]
        gcx = acc_ref[3]
        gcy = acc_ref[4]
        gcz = acc_ref[5]
        lc = acc_ref[6]
        glen = jnp.sqrt(gcx * gcx + gcy * gcy + gcz * gcz)
        stm = jnp.where(glen > C.SURFACE_THRESHOLD,
                        -st * lc / jnp.maximum(glen, 1e-30), 0.0)
        crho = _center(srhov, geom)
        rho_safe = jnp.maximum(crho, 1e-12)
        ax = (fx + stm * gcx + pvec_ref[_PV_GX] * crho) / rho_safe
        ay = (fy + stm * gcy + pvec_ref[_PV_GY] * crho) / rho_safe
        az = (fz + stm * gcz + pvec_ref[_PV_GZ] * crho) / rho_safe
        nvx = (cvx + ax * dt) * C.VELOCITY_DAMPING
        nvy = (cvy + ay * dt) * C.VELOCITY_DAMPING
        nvz = (cvz + az * dt) * C.VELOCITY_DAMPING
        outs[0][0, 0] = cx + nvx * dt
        outs[1][0, 0] = cy + nvy * dt
        outs[2][0, 0] = cz + nvz * dt
        outs[3][0, 0] = nvx
        outs[4][0, 0] = nvy
        outs[5][0, 0] = nvz
        outs[6][0, 0] = ax
        outs[7][0, 0] = ay
        outs[8][0, 0] = az


def force_call(planes: PL.Planes, rho_out: jax.Array,
               pvec: jax.Array, geom: PL.PlaneGeom, interpret: bool):
    fields = (planes.px, planes.py, planes.pz,
              planes.vx, planes.vy, planes.vz)
    in_specs = []
    args = []
    for field in fields:
        for v in range(3):
            in_specs.append(_src_spec(geom, v))
            args.append(field)
    for v in range(3):
        for dc in (-1, 0, 1):
            in_specs.append(_rho_spec(geom, v, dc))
            args.append(rho_out)
    outs = pl.pallas_call(
        functools.partial(_force_kernel, geom),
        grid_spec=_grid_spec(
            geom, in_specs, [_out_spec(geom)] * 9,
            scratch_shapes=[pltpu.VMEM((7, geom.cap, geom.cw),
                                       jnp.float32)]),
        out_shape=[_out_shape(geom)] * 9,
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(planes.occ_rows, pvec, *args)
    return outs  # npx, npy, npz, nvx, nvy, nvz, ax, ay, az


# ---------------------------------------------------------------------------
# xsph
# ---------------------------------------------------------------------------

def _xsph_kernel(geom: PL.PlaneGeom, occ_ref, pvec_ref, *refs):
    s_fields = [refs[i * 3:(i + 1) * 3] for i in range(6)]
    rho_refs = refs[18:27]
    (dnpx, dnpy, dnpz, dnvx, dnvy, dnvz) = refs[27:33]
    xs_refs = refs[33:37]
    y = pl.program_id(0)
    c = pl.program_id(1)
    occ, dest = _row_occs(occ_ref, y, c)
    cw = geom.cw
    kk = geom.cap
    h2 = pvec_ref[_PV_H2]
    mass = pvec_ref[_PV_MASS]
    poly6_c = pvec_ref[_PV_POLY6]

    for o in xs_refs:
        o[...] = jnp.zeros(o.shape, jnp.float32)

    @pl.when((occ > 0) & (dest > 0))
    def _():
        sv = [_src_rows(fld) for fld in s_fields]
        (sxv, syv, szv, svxv, svyv, svzv) = sv
        srhov = _rho_views(rho_refs, geom)
        cx = dnpx[0, 0]
        cy = dnpy[0, 0]
        cz = dnpz[0, 0]
        cvx = dnvx[0, 0]
        cvy = dnvy[0, 0]
        cvz = dnvz[0, 0]
        sminvv = [mass / jnp.maximum(r, 1e-12) for r in srhov]
        for k2 in range(kk):
            @pl.when(k2 < occ)
            def _(k2=k2):
                self_row = _self_mask(k2, geom)
                xx = jnp.zeros((kk, cw), jnp.float32)
                xy = jnp.zeros((kk, cw), jnp.float32)
                xz = jnp.zeros((kk, cw), jnp.float32)
                xn = jnp.zeros((kk, cw), jnp.float32)
                for v, off, zero_off in _offsets(geom):
                    ddx = cx - sxv[v][k2, off:off + cw]
                    ddy = cy - syv[v][k2, off:off + cw]
                    ddz = cz - szv[v][k2, off:off + cw]
                    r2 = ddx * ddx + ddy * ddy + ddz * ddz
                    inside = r2 < h2
                    if zero_off:
                        inside = inside & ~self_row
                    d = jnp.maximum(h2 - r2, 0.0)
                    w = jnp.where(inside, poly6_c * d * d * d, 0.0)
                    mw = w * sminvv[v][k2, off:off + cw]
                    xx = xx + mw * (svxv[v][k2, off:off + cw] - cvx)
                    xy = xy + mw * (svyv[v][k2, off:off + cw] - cvy)
                    xz = xz + mw * (svzv[v][k2, off:off + cw] - cvz)
                    xn = xn + w
                xs_refs[0][0, 0] += xx
                xs_refs[1][0, 0] += xy
                xs_refs[2][0, 0] += xz
                xs_refs[3][0, 0] += xn


def xsph_call(planes: PL.Planes, rho_out: jax.Array,
              np_out: Sequence[jax.Array], nv_out: Sequence[jax.Array],
              pvec: jax.Array, geom: PL.PlaneGeom, interpret: bool):
    s_flds = (planes.px, planes.py, planes.pz,
              planes.vx, planes.vy, planes.vz)
    in_specs = []
    args = []
    for field in s_flds:
        for v in range(3):
            in_specs.append(_src_spec(geom, v))
            args.append(field)
    for v in range(3):
        for dc in (-1, 0, 1):
            in_specs.append(_rho_spec(geom, v, dc))
            args.append(rho_out)
    for field in (*np_out, *nv_out):
        in_specs.append(_dstout_spec(geom))
        args.append(field)
    return pl.pallas_call(
        functools.partial(_xsph_kernel, geom),
        grid_spec=_grid_spec(geom, in_specs, [_out_spec(geom)] * 4),
        out_shape=[_out_shape(geom)] * 4,
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(planes.occ_rows, pvec, *args)


# ---------------------------------------------------------------------------
# substep composition
# ---------------------------------------------------------------------------

def _interpret_default() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def substep(state: ParticleState, params: FluidParams, dt: jax.Array,
            config: SimConfig) -> ParticleState:
    """Full Pallas-kernel substep. Returns state in SORTED order (particle
    identity lives in spawn order via orig_id)."""
    geom = PL.geom_for(config)
    interpret = _interpret_default()

    key = PL.compute_keys_ymajor(state.pos, state.valid, params, geom)
    contrib = state.contrib_mask(params.ghost_face_active)
    s = PL.sort_particles(state, key, contrib)
    planes = PL.build_planes(s, params, geom)
    pvec = _make_pvec(params, dt)

    # --- density: kernel outputs FINAL rho (floor + ghost override) ---
    rho_out = density_call(planes, pvec, geom, interpret)

    # --- force + integrate (pressure from EOS in-kernel) ---
    f_outs = force_call(planes, rho_out, pvec, geom, interpret)
    npx, npy, npz, nvx, nvy, nvz, ax, ay, az = f_outs

    # --- xsph vs pre-move neighbors ---
    xs = xsph_call(planes, rho_out, (npx, npy, npz), (nvx, nvy, nvz),
                   pvec, geom, interpret)

    # --- one row gather back to (sorted) particle order ---
    # (measured at 1M, see PERF.md: XLA row gather 46.5 ms; the naive
    # MXU one-hot gather 151 ms; the TRANSPOSED MXU one-hot gather
    # (mxu_permute.gather_call, F streamed as MXU rows) 67.8 ms — the
    # one-hot matmul work per window is ~170x the useful data whatever
    # the orientation; gathering from the [14, T] side (axis=1) ties at
    # 46.4 ms; a materialized lane-major [.., CW, K] transpose OOMs at
    # compile (XLA tiles the K-minor copy at 16x padding, 18.6 GB).)
    stacked = jnp.stack([npx, npy, npz, nvx, nvy, nvz, ax, ay, az,
                         rho_out, *xs], axis=0)        # [14, ny, nc, K, CW]
    per = stacked.reshape(14, -1).T[PL.out_flat_index(s, geom)]  # [N, 14]

    new_pos = per[:, 0:3]
    nvel = per[:, 3:6]
    new_acc = per[:, 6:9]
    new_rho = per[:, 9]
    new_pres = jnp.maximum(
        params.gas_constant * (new_rho - params.rest_density), 0.0)
    xsum = per[:, 10:13]
    xnorm = per[:, 13]

    # XSPH apply + CFL speed cap in particle space
    inv = jnp.where(xnorm > 0.0,
                    C.XSPH_COEFF / jnp.maximum(xnorm, 1e-30), 0.0)
    new_vel = C.speed_cap(nvel + inv[:, None] * xsum, params.h, dt)

    # --- reassemble particle state (mirrors binned.substep) ---
    m = PL.unpack_meta(s.meta)
    fluid = (m.valid > 0) & (m.ghost == 0) & planes.in_bin
    ofl = (m.valid > 0) & (m.ghost == 0) & ~planes.in_bin

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
