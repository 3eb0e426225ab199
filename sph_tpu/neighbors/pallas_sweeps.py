"""Pallas TPU neighbor-sweep kernels — the hot path of the framework.

Two fused Mosaic kernels over the stacked dense cell tables built by
``planes.py``:

1. **density**      — poly6 pair sums (``shaders/SPHFluid.comp:89-106``)
2. **force + xsph** — spiky-gradient pressure + viscosity Laplacian +
   color-field surface tension accumulators, fused with gravity
   assembly, semi-implicit Euler integration
   (``SPHFluid.comp:109-171``) AND the XSPH smoothing sweep
   (``SPHFluid.comp:177-201``).  XSPH is fusable because its semantics
   are "fresh self pos/vel vs STALE neighbor pos/vel" (see
   ``physics/brute_force.py:116``): the second sweep runs after the
   in-kernel integration against the same pre-move source rows already
   resident in VMEM.

Kernel structure (both share it):

- Tables are ``[F, nyp, n_chunks, K, CW]`` per particle family: y cell
  rows with a +-1 sentinel halo, the (z, x) plane flattened to lanes
  and chunked into disjoint ``CW``-lane windows, K cell slots on the
  f32 sublane dim.
- grid = ``(ny, n_chunks)``; each program DMAs the 3x3 neighboring
  (y, chunk) blocks (chunk index clamped at the plane edges — the junk
  lanes this injects are provably never read by real destination
  cells, see ``_ext_rows``) and assembles halo-extended ``(K, CWH)``
  source rows in VMEM.
- The source-slot loop ``k2`` is a static unroll *inside* the kernel;
  each iteration is wrapped in ``pl.when(k2 < occ)`` where ``occ`` is a
  scalar-prefetched per-window bound on the max occupied slot over the
  3 contributing y-rows' windows + halo lanes — compute scales with
  real occupancy, and fully-empty chunks skip everything.  (Per-row
  gating was measured SLOWER: it triples the conditional regions and
  therefore the accumulator flush traffic through VMEM refs.)
- Every neighbor-cell offset (dy, dz, dx) is a *static lane slice*
  ``ext[k2, H + dz*nxp + dx : +CW]`` of the assembled rows, so the 27
  sweeps compile to pure VPU code with zero gathers (the TPU-shaped
  replacement for the linked-list walks in ``SPHFluid.comp:92-103``).
- Ghost boundary particles arrive in a SEPARATE static position-only
  table: ghosts carry rho = rho0, pressure 0, velocity 0
  (``SPHFluid.comp:71-83``), so their sweep terms are constants-only
  and their occupancy gates (``gocc``) are zero away from the walls —
  wall shells no longer poison the fluid occupancy bound (PERF.md 1).
- Empty slots and out-of-grid cells hold a far-away sentinel position,
  so the ``r^2 < h^2`` test removes them with no flag traffic.

Physics semantics are identical to ``physics/brute_force.py`` (the
oracle) and ``neighbors/binned.py``; see ``physics/common.py``.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Union

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
    """(view, lane_offset, is_zero_offset) for the 27 neighbor cells."""
    for v in range(3):
        for dz in (-1, 0, 1):
            for dx in (-1, 0, 1):
                yield v, geom.halo + dz * geom.nxp + dx, (
                    v == 1 and dz == 0 and dx == 0)


def _gates(occ_ref, y, c):
    """(fluid slot bound, center-row dest gate, ghost slot bound) from
    the packed occupancy table (planes.py: bits0:5 fluid occ incl halo,
    bit5 center-interior-holds-fluid, bits6:11 ghost occ incl halo)."""
    rows = [occ_ref[y + v, c] for v in range(3)]
    occ = jnp.maximum(jnp.maximum(rows[0] & PL.OCC_MASK,
                                  rows[1] & PL.OCC_MASK),
                      rows[2] & PL.OCC_MASK)
    dest = (rows[1] >> PL.OCC_BITS) & 1
    gocc = jnp.maximum(
        jnp.maximum(rows[0] >> PL.GOCC_SHIFT, rows[1] >> PL.GOCC_SHIFT),
        rows[2] >> PL.GOCC_SHIFT) & PL.OCC_MASK
    return occ, dest, gocc


def _tbl_spec(geom: PL.PlaneGeom, f: int, view: int, dc: int
              ) -> pl.BlockSpec:
    """3x3 neighborhood block over a stacked table [F, nyp, nc, K, CW].
    y is NOT clamped (tables carry real +-1 sentinel halo rows); the
    chunk index is clamped at the plane edges — see ``_ext_rows`` for
    why the junk lanes clamping injects are never read."""
    nc = geom.n_chunks

    def imap(y, c, occ, pvec):
        return (0, y + view, jnp.clip(c + dc, 0, nc - 1), 0, 0)

    return pl.BlockSpec((f, 1, 1, geom.cap, geom.cw), imap,
                        memory_space=pltpu.VMEM)


def _rho_spec(geom: PL.PlaneGeom, view: int, dc: int) -> pl.BlockSpec:
    """3x3 block over the density *output* array [ny, nc, K, CW] (no y
    halo rows): BOTH y and chunk indices clamp at the edges.  The junk
    this injects at the y edges is multiplied by pairs whose POSITION
    comes from the sentinel y-halo rows of the fluid table, so it never
    contributes."""
    nc = geom.n_chunks
    ny = geom.ny

    def imap(y, c, occ, pvec):
        return (jnp.clip(y + view - 1, 0, ny - 1),
                jnp.clip(c + dc, 0, nc - 1), 0, 0)

    return pl.BlockSpec((1, 1, geom.cap, geom.cw), imap,
                        memory_space=pltpu.VMEM)


def _nine(spec_fn, geom, *a):
    return [spec_fn(geom, *a, v, dc) if a else spec_fn(geom, v, dc)
            for v in range(3) for dc in (-1, 0, 1)]


def _ext_rows(refs9: Sequence, geom: PL.PlaneGeom, lead: bool = True):
    """9 fetched blocks (view-major: [(v,c-1),(v,c),(v,c+1)] x 3) ->
    3 halo-extended source-row stacks [F, K, CWH] (or [K, CWH] when
    ``lead`` is False for the rho blocks).

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


def _self_mask(k2: int, geom: PL.PlaneGeom):
    return lax.broadcasted_iota(jnp.int32, (geom.cap, geom.cw), 0) == k2


def _grid_spec(geom: PL.PlaneGeom, in_specs, out_specs, scratch=()):
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(geom.ny, geom.n_chunks),
        in_specs=list(in_specs),
        out_specs=out_specs,
        scratch_shapes=list(scratch))


# The unrolled slot x 27-offset pair loops carry wide temporaries;
# raise the default 16 MiB scoped-VMEM ceiling so the compiler can keep
# them resident instead of failing (v5e has 128 MiB VMEM per core).
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


# ---------------------------------------------------------------------------
# density
# ---------------------------------------------------------------------------

def _density_kernel(geom: PL.PlaneGeom, has_ghosts: bool,
                    occ_ref, pvec_ref, *refs):
    f9 = refs[0:9]
    g9 = refs[9:18] if has_ghosts else None
    rho_ref = refs[-1]
    y = pl.program_id(0)
    c = pl.program_id(1)
    occ, dest, gocc = _gates(occ_ref, y, c)
    h2 = pvec_ref[_PV_H2]
    cw = geom.cw
    kk = geom.cap

    rho_ref[...] = jnp.full(rho_ref.shape, pvec_ref[_PV_RHO_FLOOR],
                            jnp.float32)

    @pl.when(dest > 0)
    def _():
        ext = _ext_rows(f9, geom)                   # 3 x [6, K, CWH]
        ctr = f9[4][:, 0, 0]                        # [6, K, CW]
        cx, cy, cz = ctr[0], ctr[1], ctr[2]
        rho_ref[0, 0] = jnp.zeros((kk, cw), jnp.float32)

        def sweep(k2, rows3):
            acc = jnp.zeros((kk, cw), jnp.float32)
            for v, off, _ in _lane_offsets(geom):
                ddx = cx - rows3[v][0, k2, off:off + cw]
                ddy = cy - rows3[v][1, k2, off:off + cw]
                ddz = cz - rows3[v][2, k2, off:off + cw]
                r2 = ddx * ddx + ddy * ddy + ddz * ddz
                d = jnp.maximum(h2 - r2, 0.0)
                acc = acc + d * d * d
            rho_ref[0, 0] += acc

        # self-pairs are *included*, as in the GLSL density loop
        # (SPHFluid.comp:89-106 has no j != i check)
        for k2 in range(kk):
            @pl.when(k2 < occ)
            def _(k2=k2):
                sweep(k2, ext)
        if has_ghosts:
            gext = _ext_rows(g9, geom)              # 3 x [3, K, CWH]
            for k2 in range(kk):
                @pl.when(k2 < gocc)
                def _(k2=k2):
                    sweep(k2, gext)

        # pointwise finish: mass*poly6 scale + floor (SPHFluid.comp:105)
        raw = rho_ref[0, 0]
        scale = pvec_ref[_PV_MASS] * pvec_ref[_PV_POLY6]
        rho_ref[0, 0] = jnp.maximum(raw * scale, pvec_ref[_PV_RHO_FLOOR])


def density_call(ft: PL.FluidTables, occ_rows: jax.Array,
                 gt, pvec: jax.Array, geom: PL.PlaneGeom,
                 interpret: bool) -> jax.Array:
    """FINAL per-slot fluid density (floored): [ny, nc, K, CW]."""
    has_ghosts = gt is not None
    in_specs = _nine(_tbl_spec, geom, 6)
    args = [ft.tbl] * 9
    if has_ghosts:
        in_specs += _nine(_tbl_spec, geom, 3)
        args += [gt.tbl] * 9
    return pl.pallas_call(
        functools.partial(_density_kernel, geom, has_ghosts),
        grid_spec=_grid_spec(geom, in_specs, _out_spec(geom, 1)),
        out_shape=_out_shape(geom, 1),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(occ_rows, pvec, *args)


def _out_spec(geom: PL.PlaneGeom, f: int) -> pl.BlockSpec:
    if f == 1:
        return pl.BlockSpec((1, 1, geom.cap, geom.cw),
                            lambda y, c, occ, pvec: (y, c, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((f, 1, 1, geom.cap, geom.cw),
                        lambda y, c, occ, pvec: (0, y, c, 0, 0),
                        memory_space=pltpu.VMEM)


def _out_shape(geom: PL.PlaneGeom, f: int):
    if f == 1:
        return jax.ShapeDtypeStruct(
            (geom.ny, geom.n_chunks, geom.cap, geom.cw), jnp.float32)
    return jax.ShapeDtypeStruct(
        (f, geom.ny, geom.n_chunks, geom.cap, geom.cw), jnp.float32)


# ---------------------------------------------------------------------------
# force + integrate + xsph (fused)
# ---------------------------------------------------------------------------

def _force_xsph_kernel(geom: PL.PlaneGeom, has_ghosts: bool,
                       occ_ref, pvec_ref, *refs):
    f9 = refs[0:9]
    rho9 = refs[9:18]
    g9 = refs[18:27] if has_ghosts else None
    out_ref = refs[-2]
    acc_ref = refs[-1]
    y = pl.program_id(0)
    c = pl.program_id(1)
    occ, dest, gocc = _gates(occ_ref, y, c)
    cw = geom.cw
    kk = geom.cap
    h = pvec_ref[_PV_H]
    h2 = pvec_ref[_PV_H2]
    mass = pvec_ref[_PV_MASS]
    spiky_c = pvec_ref[_PV_SPIKY]
    visc_lap_c = pvec_ref[_PV_VISC_LAP]
    poly6_c = pvec_ref[_PV_POLY6]
    mu = pvec_ref[_PV_MU]
    rho0 = pvec_ref[_PV_RHO0]
    gas_k = pvec_ref[_PV_GASK]

    out_ref[...] = jnp.zeros(out_ref.shape, jnp.float32)

    @pl.when(dest > 0)
    def _():
        ext = _ext_rows(f9, geom)                   # 3 x [6, K, CWH]
        rhov = _ext_rows(rho9, geom, lead=False)    # 3 x [K, CWH]
        # pressure from EOS in-kernel (SPHFluid.comp:109-111)
        spresv = [jnp.maximum(gas_k * (r - rho0), 0.0) for r in rhov]
        # hoisted per-src-element mass/rho (one divide per row instead
        # of one per (row, offset) pair)
        sminvv = [mass / jnp.maximum(r, 1e-12) for r in rhov]
        gminv = mass / jnp.maximum(rho0, 1e-12)     # ghost: rho == rho0

        ctr = f9[4][:, 0, 0]
        cx, cy, cz = ctr[0], ctr[1], ctr[2]
        cvx, cvy, cvz = ctr[3], ctr[4], ctr[5]
        crho = rho9[4][0, 0]
        cpres = jnp.maximum(gas_k * (crho - rho0), 0.0)

        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

        def force_sweep(k2, rows3, ghost: bool):
            self_row = None if ghost else _self_mask(k2, geom)
            fx = jnp.zeros((kk, cw), jnp.float32)
            fy = jnp.zeros((kk, cw), jnp.float32)
            fz = jnp.zeros((kk, cw), jnp.float32)
            gcx = jnp.zeros((kk, cw), jnp.float32)
            gcy = jnp.zeros((kk, cw), jnp.float32)
            gcz = jnp.zeros((kk, cw), jnp.float32)
            lc = jnp.zeros((kk, cw), jnp.float32)
            for v, off, zero_off in _lane_offsets(geom):
                ddx = cx - rows3[v][0, k2, off:off + cw]
                ddy = cy - rows3[v][1, k2, off:off + cw]
                ddz = cz - rows3[v][2, k2, off:off + cw]
                r2 = ddx * ddx + ddy * ddy + ddz * ddz
                # one rsqrt replaces sqrt + the 1/r divide
                rinv = lax.rsqrt(jnp.maximum(r2, 1e-24))
                r = r2 * rinv
                inside = r < h
                if zero_off and not ghost:
                    inside = inside & ~self_row
                if ghost:
                    spres = 0.0
                    mw = jnp.where(inside, gminv, 0.0)
                else:
                    spres = spresv[v][k2, off:off + cw]
                    mw = jnp.where(inside, sminvv[v][k2, off:off + cw],
                                   0.0)
                dcl = jnp.maximum(h - r, 0.0)
                gmag = jnp.where(r2 > 0.0,
                                 spiky_c * dcl * dcl * rinv, 0.0)
                lapw = visc_lap_c * dcl
                pscale = -(cpres + spres) * 0.5 * mw * gmag
                vscale = mw * lapw * mu
                if ghost:
                    # ghost velocity is exactly 0 (SPHFluid.comp:71-83)
                    fx = fx + pscale * ddx - vscale * cvx
                    fy = fy + pscale * ddy - vscale * cvy
                    fz = fz + pscale * ddz - vscale * cvz
                else:
                    fx = fx + pscale * ddx \
                        + vscale * (rows3[v][3, k2, off:off + cw] - cvx)
                    fy = fy + pscale * ddy \
                        + vscale * (rows3[v][4, k2, off:off + cw] - cvy)
                    fz = fz + pscale * ddz \
                        + vscale * (rows3[v][5, k2, off:off + cw] - cvz)
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

        for k2 in range(kk):
            @pl.when(k2 < occ)
            def _(k2=k2):
                force_sweep(k2, ext, ghost=False)
        if has_ghosts:
            gext = _ext_rows(g9, geom)
            for k2 in range(kk):
                @pl.when(k2 < gocc)
                def _(k2=k2):
                    force_sweep(k2, gext, ghost=True)

        # surface tension + gravity + integrate (SPHFluid.comp:156-171)
        st = pvec_ref[_PV_ST]
        dt = pvec_ref[_PV_DT]
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
        out_ref[0, 0, 0] = npx
        out_ref[1, 0, 0] = npy
        out_ref[2, 0, 0] = npz
        out_ref[3, 0, 0] = nvx
        out_ref[4, 0, 0] = nvy
        out_ref[5, 0, 0] = nvz
        out_ref[6, 0, 0] = ax
        out_ref[7, 0, 0] = ay
        out_ref[8, 0, 0] = az

        # --- xsph: fresh self pos/vel vs stale neighbor rows (still in
        # VMEM) — SPHFluid.comp:177-201 / brute_force.xsph_pass ---
        def xsph_sweep(k2, rows3, ghost: bool):
            self_row = None if ghost else _self_mask(k2, geom)
            xx = jnp.zeros((kk, cw), jnp.float32)
            xy = jnp.zeros((kk, cw), jnp.float32)
            xz = jnp.zeros((kk, cw), jnp.float32)
            xn = jnp.zeros((kk, cw), jnp.float32)
            for v, off, zero_off in _lane_offsets(geom):
                ddx = npx - rows3[v][0, k2, off:off + cw]
                ddy = npy - rows3[v][1, k2, off:off + cw]
                ddz = npz - rows3[v][2, k2, off:off + cw]
                r2 = ddx * ddx + ddy * ddy + ddz * ddz
                inside = r2 < h2
                if zero_off and not ghost:
                    inside = inside & ~self_row
                d = jnp.maximum(h2 - r2, 0.0)
                w = jnp.where(inside, poly6_c * d * d * d, 0.0)
                if ghost:
                    mw = w * gminv
                    xx = xx - mw * nvx
                    xy = xy - mw * nvy
                    xz = xz - mw * nvz
                else:
                    mw = w * sminvv[v][k2, off:off + cw]
                    xx = xx + mw * (rows3[v][3, k2, off:off + cw] - nvx)
                    xy = xy + mw * (rows3[v][4, k2, off:off + cw] - nvy)
                    xz = xz + mw * (rows3[v][5, k2, off:off + cw] - nvz)
                xn = xn + w
            acc_ref[7] += xx
            acc_ref[8] += xy
            acc_ref[9] += xz
            acc_ref[10] += xn

        for k2 in range(kk):
            @pl.when(k2 < occ)
            def _(k2=k2):
                xsph_sweep(k2, ext, ghost=False)
        if has_ghosts:
            for k2 in range(kk):
                @pl.when(k2 < gocc)
                def _(k2=k2):
                    xsph_sweep(k2, gext, ghost=True)

        out_ref[9, 0, 0] = acc_ref[7]
        out_ref[10, 0, 0] = acc_ref[8]
        out_ref[11, 0, 0] = acc_ref[9]
        out_ref[12, 0, 0] = acc_ref[10]


def force_xsph_call(ft: PL.FluidTables, occ_rows: jax.Array,
                    rho_out: jax.Array, gt, pvec: jax.Array,
                    geom: PL.PlaneGeom, interpret: bool) -> jax.Array:
    """[13, ny, nc, K, CW]: npx npy npz nvx nvy nvz ax ay az xs0 xs1
    xs2 xnorm."""
    has_ghosts = gt is not None
    in_specs = _nine(_tbl_spec, geom, 6) + _nine(_rho_spec, geom)
    args = [ft.tbl] * 9 + [rho_out] * 9
    if has_ghosts:
        in_specs += _nine(_tbl_spec, geom, 3)
        args += [gt.tbl] * 9
    return pl.pallas_call(
        functools.partial(_force_xsph_kernel, geom, has_ghosts),
        grid_spec=_grid_spec(
            geom, in_specs, _out_spec(geom, 13),
            scratch=[pltpu.VMEM((11, geom.cap, geom.cw), jnp.float32)]),
        out_shape=_out_shape(geom, 13),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(occ_rows, pvec, *args)


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

    rho_out = density_call(ft, occ_rows, gt, pvec, geom, interpret)
    f13 = force_xsph_call(ft, occ_rows, rho_out, gt, pvec, geom,
                          interpret)

    # --- one row gather back to (sorted) particle order ---
    # (measured at 1M, see PERF.md 10: XLA row gather 46.5 ms beats
    # every MXU one-hot / transposed / monotone-index variant tried)
    stacked = jnp.concatenate([f13, rho_out[None]], axis=0)
    per = stacked.reshape(14, -1).T[PL.out_flat_index(s, geom)]  # [N, 14]

    new_pos = per[:, 0:3]
    nvel = per[:, 3:6]
    new_acc = per[:, 6:9]
    xsum = per[:, 9:12]
    xnorm = per[:, 12]
    new_rho = per[:, 13]
    new_pres = jnp.maximum(
        params.gas_constant * (new_rho - params.rest_density), 0.0)

    # XSPH apply + CFL speed cap in particle space
    inv = jnp.where(xnorm > 0.0,
                    C.XSPH_COEFF / jnp.maximum(xnorm, 1e-30), 0.0)
    new_vel = C.speed_cap(nvel + inv[:, None] * xsum, params.h, dt)

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
