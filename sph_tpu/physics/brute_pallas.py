"""All-pairs WCSPH substep as Pallas TPU kernels (BASELINE config 1).

``physics/brute_force.py`` is the golden oracle, but its
``lax.map``-over-tiles evaluation serializes ~1k tiny blocks per pass —
9.8 ms/substep at 8k particles on a v5e (round-2 PERF table), pure
latency.  This module keeps the oracle's exact all-pairs O(N^2)
semantics (BASELINE config 1 mandates brute-force neighbors, not a cell
list) but evaluates them the TPU way: the whole j-side state resides in
VMEM transposed to ``[F, N]`` (fields on sublanes, particles on lanes),
and a grid over i-row blocks computes ``[TI, N]`` pair terms as full-
width VPU ops — two kernels, mirroring the production table engine:

1. density (self-pairs INCLUDED, ``SPHFluid.comp:89-106``)
2. force + semi-implicit-Euler integrate + XSPH (fresh self vs stale
   neighbors, ``SPHFluid.comp:177-201``) + XSPH apply + CFL speed cap

Pair math matches ``physics/common.py`` term for term; only summation
order differs (lane-reduction tree vs sequential fori), so trajectories
match the oracle to float32 tolerance — enforced by
``tests/test_brute_pallas.py``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sph_tpu.core.params import FluidParams
from sph_tpu.core.state import ParticleState
from sph_tpu.neighbors.pallas_sweeps import (
    _PV_DT, _PV_GX, _PV_GY, _PV_GZ, _PV_H, _PV_H2, _PV_MASS, _PV_MU,
    _PV_POLY6, _PV_SPIKY, _PV_ST, _PV_VISC_LAP, _COMPILER_PARAMS,
    _interpret_default, _make_pvec)
from sph_tpu.physics import common as C

TI = 128         # i rows per program (round-4 TPU corner sweep, seq5:
JC = 512         # 128:512 = 1.510 ms/substep / 5.43e6 psteps/s at 8k,
                 # beating 64:1024's 1.685).  j-chunking bounds each
                 # round's [TI, jc] temporaries register-resident; the
                 # one-full-pass [TI, N] form spills (2.45 ms).


def _pad_to(x: jax.Array, n: int, fill: float = 0.0) -> jax.Array:
    if x.shape[0] == n:
        return x
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad, constant_values=fill)


def _jslices(n: int, jc: int):
    """Static j-chunk slices: jc <= 0 or >= n gives one full-width pass
    (the measured-default form); smaller jc bounds each round's [TI, jc]
    temporaries so Mosaic keeps them register-resident instead of
    spilling [TI, N] intermediates through VMEM."""
    step = n if jc <= 0 or jc >= n else jc
    return [(j0, min(step, n - j0)) for j0 in range(0, n, step)]


def _density_kernel(n: int, jc: int, pvec_ref, jref, iref, out_ref):
    """rho_raw rows: mass * sum_j contrib_j * poly6(r2), self included."""
    h2 = pvec_ref[_PV_H2]
    pi = iref[...]                                   # [TI, 128]
    px, py, pz = pi[:, 0:1], pi[:, 1:2], pi[:, 2:3]
    rho = None
    for j0, w_ in _jslices(n, jc):
        dx = px - jref[0:1, j0:j0 + w_]
        dy = py - jref[1:2, j0:j0 + w_]
        dz = pz - jref[2:3, j0:j0 + w_]
        r2 = dx * dx + dy * dy + dz * dz
        d = jnp.maximum(h2 - r2, 0.0)
        w = jnp.where(r2 < h2, d * d * d, 0.0) * jref[8:9, j0:j0 + w_]
        part = jnp.sum(w, axis=1, keepdims=True)
        rho = part if rho is None else rho + part
    rho = rho * (pvec_ref[_PV_MASS] * pvec_ref[_PV_POLY6])
    out_ref[...] = jnp.broadcast_to(rho, out_ref.shape)


def _force_kernel(n: int, ti: int, jc: int, pvec_ref, jref, iref,
                  out_ref):
    """Force + integrate + XSPH + apply + CFL cap for one i-row block.

    i rows: pos(0:3) vel(3:6) rho(6) pres(7).
    j rows ([9, N]): pos(0:3) vel(3:6) rho(6) pres(7) contrib(8).
    out rows: npos(0:3) nvel(3:6) acc(6:9).
    """
    h = pvec_ref[_PV_H]
    h2 = pvec_ref[_PV_H2]
    mass = pvec_ref[_PV_MASS]
    dt = pvec_ref[_PV_DT]
    mu = pvec_ref[_PV_MU]

    pi = iref[...]                                   # [TI, 128]
    px, py, pz = pi[:, 0:1], pi[:, 1:2], pi[:, 2:3]
    vx, vy, vz = pi[:, 3:4], pi[:, 4:5], pi[:, 5:6]
    rho_i = pi[:, 6:7]
    pres_i = pi[:, 7:8]

    gi = (pl.program_id(0) * ti
          + lax.broadcasted_iota(jnp.int32, (ti, 1), 0))

    fpx = fpy = fpz = gcx = gcy = gcz = lc = jnp.zeros((ti, 1),
                                                       jnp.float32)
    for j0, w_ in _jslices(n, jc):
        lj = j0 + lax.broadcasted_iota(jnp.int32, (ti, w_), 1)
        not_self = gi != lj
        jx, jy, jz = (jref[0:1, j0:j0 + w_], jref[1:2, j0:j0 + w_],
                      jref[2:3, j0:j0 + w_])
        jvx, jvy, jvz = (jref[3:4, j0:j0 + w_], jref[4:5, j0:j0 + w_],
                         jref[5:6, j0:j0 + w_])
        rho_j = jref[6:7, j0:j0 + w_]
        pres_j = jref[7:8, j0:j0 + w_]
        live_j = (rho_j > 0.0) & (jref[8:9, j0:j0 + w_] > 0.0)

        dx = px - jx
        dy = py - jy
        dz = pz - jz
        r2 = dx * dx + dy * dy + dz * dz
        rinv = lax.rsqrt(jnp.maximum(r2, 1e-24))
        r = r2 * rinv
        mask = not_self & (r < h) & live_j

        # pair_force_terms (physics/common.py:40-56), w folded into
        # m/rho
        m_over_rho = jnp.where(mask, mass / jnp.maximum(rho_j, 1e-12),
                               0.0)
        dcl = jnp.maximum(h - r, 0.0)
        gmag = jnp.where(r2 > 0.0,
                         pvec_ref[_PV_SPIKY] * dcl * dcl * rinv, 0.0)
        lapw = pvec_ref[_PV_VISC_LAP] * dcl
        pscale = -(pres_i + pres_j) * 0.5 * m_over_rho * gmag
        # mu folds into the per-pair viscous term (assemble_acc applies
        # it outside the sum; multiplication distributes — fp32-equal
        # within the oracle tolerance, same as the production table
        # kernel)
        vscale = m_over_rho * lapw * mu
        fpx = fpx + jnp.sum(pscale * dx + vscale * (jvx - vx), axis=1,
                            keepdims=True)
        fpy = fpy + jnp.sum(pscale * dy + vscale * (jvy - vy), axis=1,
                            keepdims=True)
        fpz = fpz + jnp.sum(pscale * dz + vscale * (jvz - vz), axis=1,
                            keepdims=True)
        gscale = m_over_rho * gmag
        gcx = gcx + jnp.sum(gscale * dx, axis=1, keepdims=True)
        gcy = gcy + jnp.sum(gscale * dy, axis=1, keepdims=True)
        gcz = gcz + jnp.sum(gscale * dz, axis=1, keepdims=True)
        lc = lc + jnp.sum(m_over_rho * lapw, axis=1, keepdims=True)

    # assemble_acc + integrate (common.py:79-99)
    glen = jnp.sqrt(gcx * gcx + gcy * gcy + gcz * gcz)
    stm = jnp.where(glen > C.SURFACE_THRESHOLD,
                    -pvec_ref[_PV_ST] * lc / jnp.maximum(glen, 1e-30),
                    0.0)
    rho_safe = jnp.maximum(rho_i, 1e-12)
    ax = (fpx + stm * gcx + pvec_ref[_PV_GX] * rho_i) / rho_safe
    ay = (fpy + stm * gcy + pvec_ref[_PV_GY] * rho_i) / rho_safe
    az = (fpz + stm * gcz + pvec_ref[_PV_GZ] * rho_i) / rho_safe
    nvx = (vx + ax * dt) * C.VELOCITY_DAMPING
    nvy = (vy + ay * dt) * C.VELOCITY_DAMPING
    nvz = (vz + az * dt) * C.VELOCITY_DAMPING
    npx = px + nvx * dt
    npy = py + nvy * dt
    npz = pz + nvz * dt

    # XSPH: fresh self pos/vel vs stale neighbors (common.py /
    # brute_force.xsph_pass)
    sx = sy = sz = norm = jnp.zeros((ti, 1), jnp.float32)
    for j0, w_ in _jslices(n, jc):
        lj = j0 + lax.broadcasted_iota(jnp.int32, (ti, w_), 1)
        not_self = gi != lj
        jx, jy, jz = (jref[0:1, j0:j0 + w_], jref[1:2, j0:j0 + w_],
                      jref[2:3, j0:j0 + w_])
        jvx, jvy, jvz = (jref[3:4, j0:j0 + w_], jref[4:5, j0:j0 + w_],
                         jref[5:6, j0:j0 + w_])
        rho_j = jref[6:7, j0:j0 + w_]
        live_j = (rho_j > 0.0) & (jref[8:9, j0:j0 + w_] > 0.0)
        ddx = npx - jx
        ddy = npy - jy
        ddz = npz - jz
        rr2 = ddx * ddx + ddy * ddy + ddz * ddz
        xmask = not_self & (rr2 < h2) & live_j
        dd = jnp.maximum(h2 - rr2, 0.0)
        w = jnp.where(xmask, pvec_ref[_PV_POLY6] * dd * dd * dd, 0.0)
        mw = w * mass / jnp.maximum(rho_j, 1e-12)
        sx = sx + jnp.sum(mw * (jvx - nvx), axis=1, keepdims=True)
        sy = sy + jnp.sum(mw * (jvy - nvy), axis=1, keepdims=True)
        sz = sz + jnp.sum(mw * (jvz - nvz), axis=1, keepdims=True)
        norm = norm + jnp.sum(w, axis=1, keepdims=True)
    inv = jnp.where(norm > 0.0,
                    C.XSPH_COEFF / jnp.maximum(norm, 1e-30), 0.0)
    nvx = nvx + inv * sx
    nvy = nvy + inv * sy
    nvz = nvz + inv * sz

    max_speed = C.CFL_FRACTION * h / jnp.maximum(dt, 1e-6)
    spd = jnp.sqrt(nvx * nvx + nvy * nvy + nvz * nvz)
    vscl = jnp.where(spd > max_speed,
                     max_speed / jnp.maximum(spd, 1e-30), 1.0)

    z = jnp.zeros((ti, 128 - 9), jnp.float32)
    out_ref[...] = jnp.concatenate(
        [npx, npy, npz, nvx * vscl, nvy * vscl, nvz * vscl, ax, ay, az,
         z], axis=1)

def _calls(pos, vel, rho, pres, contrib, pvec, interpret: bool,
           ti: int = TI, jc: int = JC):
    """Run both kernels over [Np(128-mult), ...] padded arrays."""
    np_ = pos.shape[0]
    assert np_ % ti == 0 and np_ % 128 == 0, np_

    jrows = jnp.concatenate([
        pos.T, vel.T, rho[None, :], pres[None, :],
        contrib.astype(jnp.float32)[None, :]], axis=0)     # [9, Np]

    def irows(fields):
        r = jnp.concatenate(fields, axis=1)
        return jnp.pad(r, ((0, 0), (0, 128 - r.shape[1])))

    grid_spec = lambda: pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(np_ // ti,),
        in_specs=[
            pl.BlockSpec((9, np_), lambda i, pv: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, 128), lambda i, pv: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ti, 128), lambda i, pv: (i, 0),
                               memory_space=pltpu.VMEM))
    out_shape = jax.ShapeDtypeStruct((np_, 128), jnp.float32)

    i_d = irows([pos])
    rho_rows = pl.pallas_call(
        functools.partial(_density_kernel, np_, jc),
        grid_spec=grid_spec(), out_shape=out_shape,
        interpret=interpret, compiler_params=_COMPILER_PARAMS,
    )(pvec, jrows, i_d)
    return rho_rows[:, 0], jrows, irows, grid_spec, out_shape


def substep(state: ParticleState, params: FluidParams,
            dt: jax.Array, ti: int = TI, jc: int = JC) -> ParticleState:
    """Drop-in for ``brute_force.substep`` (same all-pairs semantics,
    Pallas evaluation).  Order-preserving: no sort, rows stay put."""
    interpret = _interpret_default()
    n = state.n
    np_ = -(-n // 128) * 128
    pvec = _make_pvec(params, dt)
    contrib = state.contrib_mask(params.ghost_face_active)

    pos = _pad_to(state.pos, np_, 1.0e7)        # sentinel pad rows
    vel = _pad_to(state.vel, np_)
    contrib_p = _pad_to(contrib.astype(jnp.float32), np_)

    rho_raw, _, irows, grid_spec, out_shape = _calls(
        pos, vel, _pad_to(state.density, np_),
        _pad_to(state.pressure, np_), contrib_p, pvec, interpret, ti,
        jc)

    density, pressure = C.finish_density(
        rho_raw[:n], state.ghost, contrib, state.density,
        state.pressure, params)

    rho_p = _pad_to(density, np_)
    pres_p = _pad_to(pressure, np_)
    jrows = jnp.concatenate([
        pos.T, vel.T, rho_p[None, :], pres_p[None, :],
        contrib_p[None, :]], axis=0)
    i_f = irows([pos, vel, rho_p[:, None], pres_p[:, None]])
    out = pl.pallas_call(
        functools.partial(_force_kernel, np_, ti, jc),
        grid_spec=grid_spec(), out_shape=out_shape,
        interpret=interpret, compiler_params=_COMPILER_PARAMS,
    )(pvec, jrows, i_f)[:n]

    new_pos = out[:, 0:3]
    new_vel = out[:, 3:6]
    acc = out[:, 6:9]
    foam = C.foam_update(state.foam, new_vel, density, params)

    fluid = state.fluid_mask()
    ghost_on = contrib & (state.ghost > 0)
    return state.replace(
        pos=C.select_updated(fluid, new_pos, state.pos),
        vel=jnp.where(ghost_on[:, None], 0.0,
                      C.select_updated(fluid, new_vel, state.vel)),
        acc=jnp.where(ghost_on[:, None], 0.0,
                      C.select_updated(fluid, acc, state.acc)),
        density=density,
        pressure=pressure,
        foam=C.select_updated(fluid, foam, state.foam),
    )
