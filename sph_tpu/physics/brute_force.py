"""Brute-force O(N^2) reference solver — the golden oracle.

BASELINE config 1 designates an all-pairs WCSPH solver as the trajectory
oracle: the cell-list and Pallas engines must match it to float32 tolerance
(with the caveat that pair summation order differs, so tolerances are loose
rather than bitwise).  Pairs are enumerated in [tile_i, tile_j] blocks so
memory stays bounded; the physics itself lives in ``physics/common.py``.

The i-side and j-side operands are separate arguments so the same sweeps
serve the single-chip oracle (i == j) and the multi-chip engine
(``parallel/domain.py``: i = local shard, j = all-gathered global arrays).
Self-pairs are excluded by comparing global particle ids.

Semantics reference: ``shaders/SPHFluid.comp`` (see common.py header for
the one documented determinism deviation).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from sph_tpu.core.params import FluidParams
from sph_tpu.core.state import ParticleState
from sph_tpu.physics import common as C
from sph_tpu.physics import kernels as K


def _pick_tile(n: int) -> int:
    for t in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        if n % t == 0:
            return t
    return 1


def _tile_starts(n: int, tile: int) -> jax.Array:
    return jnp.arange(0, n, tile, dtype=jnp.int32)


def density_pass(pos_i: jax.Array, pos_j: jax.Array, contrib_j: jax.Array,
                 params: FluidParams) -> jax.Array:
    """rho_raw[i] = mass * sum_j contrib_j * poly6(r2) for r2 < h^2.

    Self-pairs are *included*, as in the GLSL density loop
    (``SPHFluid.comp:89-106`` has no j != i check).
    """
    ni, nj = pos_i.shape[0], pos_j.shape[0]
    ti, tj = _pick_tile(ni), _pick_tile(nj)
    h = params.h
    h2 = h * h
    cj_f = contrib_j.astype(jnp.float32)

    def per_i_tile(i0):
        pi = lax.dynamic_slice(pos_i, (i0, 0), (ti, 3))

        def j_body(jt, acc):
            j0 = jt * tj
            pj = lax.dynamic_slice(pos_j, (j0, 0), (tj, 3))
            cj = lax.dynamic_slice(cj_f, (j0,), (tj,))
            diff = pi[:, None, :] - pj[None, :, :]
            r2 = jnp.sum(diff * diff, axis=-1)
            w = jnp.where(r2 < h2, K.poly6(r2, h), 0.0) * cj[None, :]
            return acc + jnp.sum(w, axis=1)

        return lax.fori_loop(0, nj // tj, j_body, jnp.zeros((ti,), jnp.float32))

    out = lax.map(per_i_tile, _tile_starts(ni, ti))
    return params.mass * out.reshape(ni)


def force_pass(pos_i, vel_i, pres_i, ids_i,
               pos_j, vel_j, rho_j, pres_j, contrib_j, ids_j,
               params) -> C.ForceAccum:
    """Pressure / viscosity / surface-tension accumulators, all pairs."""
    ni, nj = pos_i.shape[0], pos_j.shape[0]
    ti, tj = _pick_tile(ni), _pick_tile(nj)
    h = params.h
    cj_f = contrib_j.astype(jnp.float32)

    def per_i_tile(i0):
        pi = lax.dynamic_slice(pos_i, (i0, 0), (ti, 3))
        vi = lax.dynamic_slice(vel_i, (i0, 0), (ti, 3))
        pri = lax.dynamic_slice(pres_i, (i0,), (ti,))
        ii = lax.dynamic_slice(ids_i, (i0,), (ti,))

        def j_body(jt, carry):
            fp, fv, gc, lc = carry
            j0 = jt * tj
            pj = lax.dynamic_slice(pos_j, (j0, 0), (tj, 3))
            vj = lax.dynamic_slice(vel_j, (j0, 0), (tj, 3))
            prj = lax.dynamic_slice(pres_j, (j0,), (tj,))
            rhoj = lax.dynamic_slice(rho_j, (j0,), (tj,))
            cj = lax.dynamic_slice(cj_f, (j0,), (tj,))
            jj = lax.dynamic_slice(ids_j, (j0,), (tj,))

            rij = pi[:, None, :] - pj[None, :, :]               # [ti,tj,3]
            r = jnp.sqrt(jnp.sum(rij * rij, axis=-1))
            mask = ((ii[:, None] != jj[None, :]) & (r < h)
                    & (rhoj[None, :] > 0.0) & (cj[None, :] > 0.0))
            dfp, dfv, dgc, dlc = C.pair_force_terms(
                rij, r, vi[:, None, :], vj[None, :, :],
                pri[:, None], prj[None, :], rhoj[None, :],
                h, params.mass, mask)
            return (fp + dfp.sum(1), fv + dfv.sum(1),
                    gc + dgc.sum(1), lc + dlc.sum(1))

        z3 = jnp.zeros((ti, 3), jnp.float32)
        z1 = jnp.zeros((ti,), jnp.float32)
        fp, fv, gc, lc = lax.fori_loop(0, nj // tj, j_body, (z3, z3, z3, z1))
        return C.ForceAccum(fp, fv, gc, lc)

    out = lax.map(per_i_tile, _tile_starts(ni, ti))
    return C.ForceAccum(*(x.reshape((ni,) + x.shape[2:]) for x in out))


def xsph_pass(new_pos_i, new_vel_i, ids_i,
              old_pos_j, old_vel_j, rho_j, contrib_j, ids_j, params):
    """XSPH smoothing: fresh self pos/vel vs stale neighbor pos/vel
    (``SPHFluid.comp:177-201``).  Returns (xsph_sum[Ni,3], xsph_norm[Ni])."""
    ni, nj = new_pos_i.shape[0], old_pos_j.shape[0]
    ti, tj = _pick_tile(ni), _pick_tile(nj)
    h = params.h
    h2 = h * h
    cj_f = contrib_j.astype(jnp.float32)

    def per_i_tile(i0):
        pi = lax.dynamic_slice(new_pos_i, (i0, 0), (ti, 3))
        vi = lax.dynamic_slice(new_vel_i, (i0, 0), (ti, 3))
        ii = lax.dynamic_slice(ids_i, (i0,), (ti,))

        def j_body(jt, carry):
            s, norm = carry
            j0 = jt * tj
            pj = lax.dynamic_slice(old_pos_j, (j0, 0), (tj, 3))
            vj = lax.dynamic_slice(old_vel_j, (j0, 0), (tj, 3))
            rhoj = lax.dynamic_slice(rho_j, (j0,), (tj,))
            cj = lax.dynamic_slice(cj_f, (j0,), (tj,))
            jj = lax.dynamic_slice(ids_j, (j0,), (tj,))

            diff = pi[:, None, :] - pj[None, :, :]
            r2 = jnp.sum(diff * diff, axis=-1)
            mask = ((ii[:, None] != jj[None, :]) & (r2 < h2)
                    & (rhoj[None, :] > 0.0) & (cj[None, :] > 0.0))
            w = jnp.where(mask, K.poly6(r2, h), 0.0)
            mw = w * params.mass / jnp.maximum(rhoj[None, :], 1e-12)
            s = s + jnp.sum((vj[None, :, :] - vi[:, None, :]) * mw[..., None], 1)
            return (s, norm + jnp.sum(w, axis=1))

        z3 = jnp.zeros((ti, 3), jnp.float32)
        z1 = jnp.zeros((ti,), jnp.float32)
        return lax.fori_loop(0, nj // tj, j_body, (z3, z1))

    s, norm = lax.map(per_i_tile, _tile_starts(ni, ti))
    return s.reshape(ni, 3), norm.reshape(ni)


def substep(state: ParticleState, params: FluidParams,
            dt: jax.Array) -> ParticleState:
    """One full WCSPH substep with all-pairs neighbor enumeration."""
    n = state.n
    ids = jnp.arange(n, dtype=jnp.int32)
    contrib = state.contrib_mask(params.ghost_face_active)
    fluid = state.fluid_mask()

    rho_raw = density_pass(state.pos, state.pos, contrib, params)
    density, pressure = C.finish_density(
        rho_raw, state.ghost, contrib, state.density, state.pressure, params)

    accum = force_pass(state.pos, state.vel, pressure, ids,
                       state.pos, state.vel, density, pressure, contrib, ids,
                       params)
    acc = C.assemble_acc(accum, density, params)
    new_pos, new_vel = C.integrate(state.pos, state.vel, acc, dt)

    xsph_sum, xsph_norm = xsph_pass(new_pos, new_vel, ids,
                                    state.pos, state.vel, density, contrib,
                                    ids, params)
    new_vel = C.apply_xsph(new_vel, xsph_sum, xsph_norm)
    new_vel = C.speed_cap(new_vel, params.h, dt)
    foam = C.foam_update(state.foam, new_vel, density, params)

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
