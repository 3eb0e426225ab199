"""Brute-force O(N^2) reference solver — the golden oracle.

BASELINE config 1 designates an all-pairs WCSPH solver as the trajectory
oracle: the cell-list and Pallas engines must match it to float32 tolerance
(with the caveat that pair summation order differs, so tolerances are loose
rather than bitwise).  Pairs are enumerated in [tile_i, tile_j] blocks so
memory stays bounded and the distance math stays in registers; the physics
itself lives in ``physics/common.py``.

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

_TILE = 256  # both tile axes; ParticleState is padded to a multiple of 256


def _tile_starts(n: int) -> jax.Array:
    return jnp.arange(0, n, _TILE, dtype=jnp.int32)


def density_pass(pos: jax.Array, contrib: jax.Array,
                 params: FluidParams) -> jax.Array:
    """rho_raw[i] = sum_j contrib_j * mass * poly6(r2) for r2 < h^2."""
    n = pos.shape[0]
    h = params.h
    h2 = h * h
    contrib_f = contrib.astype(jnp.float32)

    def per_i_tile(i0):
        pi = lax.dynamic_slice(pos, (i0, 0), (_TILE, 3))       # [T,3]

        def j_body(jt, acc):
            j0 = jt * _TILE
            pj = lax.dynamic_slice(pos, (j0, 0), (_TILE, 3))
            cj = lax.dynamic_slice(contrib_f, (j0,), (_TILE,))
            diff = pi[:, None, :] - pj[None, :, :]
            r2 = jnp.sum(diff * diff, axis=-1)
            w = jnp.where(r2 < h2, K.poly6(r2, h), 0.0) * cj[None, :]
            return acc + jnp.sum(w, axis=1)

        acc = lax.fori_loop(0, n // _TILE, j_body,
                            jnp.zeros((_TILE,), jnp.float32))
        return params.mass * acc

    return lax.map(per_i_tile, _tile_starts(n)).reshape(n)


def force_pass(pos, vel, density, pressure, contrib, params) -> C.ForceAccum:
    """Pressure / viscosity / surface-tension accumulators, all pairs."""
    n = pos.shape[0]
    h = params.h
    contrib_f = contrib.astype(jnp.float32)
    idx = jnp.arange(n, dtype=jnp.int32)

    def per_i_tile(i0):
        pi = lax.dynamic_slice(pos, (i0, 0), (_TILE, 3))
        vi = lax.dynamic_slice(vel, (i0, 0), (_TILE, 3))
        pri = lax.dynamic_slice(pressure, (i0,), (_TILE,))
        ii = i0 + jnp.arange(_TILE, dtype=jnp.int32)

        def j_body(jt, carry):
            fp, fv, gc, lc = carry
            j0 = jt * _TILE
            pj = lax.dynamic_slice(pos, (j0, 0), (_TILE, 3))
            vj = lax.dynamic_slice(vel, (j0, 0), (_TILE, 3))
            prj = lax.dynamic_slice(pressure, (j0,), (_TILE,))
            rhoj = lax.dynamic_slice(density, (j0,), (_TILE,))
            cj = lax.dynamic_slice(contrib_f, (j0,), (_TILE,))
            jj = lax.dynamic_slice(idx, (j0,), (_TILE,))

            rij = pi[:, None, :] - pj[None, :, :]               # [T,T,3]
            r = jnp.sqrt(jnp.sum(rij * rij, axis=-1))
            mask = ((ii[:, None] != jj[None, :]) & (r < h)
                    & (rhoj[None, :] > 0.0) & (cj[None, :] > 0.0))
            dfp, dfv, dgc, dlc = C.pair_force_terms(
                rij, r, vi[:, None, :], vj[None, :, :],
                pri[:, None], prj[None, :], rhoj[None, :],
                h, params.mass, mask)
            return (fp + dfp.sum(1), fv + dfv.sum(1),
                    gc + dgc.sum(1), lc + dlc.sum(1))

        z3 = jnp.zeros((_TILE, 3), jnp.float32)
        z1 = jnp.zeros((_TILE,), jnp.float32)
        fp, fv, gc, lc = lax.fori_loop(0, n // _TILE, j_body, (z3, z3, z3, z1))
        return C.ForceAccum(fp, fv, gc, lc)

    out = lax.map(per_i_tile, _tile_starts(n))
    return C.ForceAccum(*(x.reshape((n,) + x.shape[2:]) for x in out))


def xsph_pass(new_pos, new_vel, old_pos, old_vel, density, contrib, params):
    """XSPH smoothing: fresh self pos/vel vs stale neighbor pos/vel
    (``SPHFluid.comp:177-201``).  Returns (xsph_sum[N,3], xsph_norm[N])."""
    n = new_pos.shape[0]
    h = params.h
    h2 = h * h
    contrib_f = contrib.astype(jnp.float32)
    idx = jnp.arange(n, dtype=jnp.int32)

    def per_i_tile(i0):
        pi = lax.dynamic_slice(new_pos, (i0, 0), (_TILE, 3))
        vi = lax.dynamic_slice(new_vel, (i0, 0), (_TILE, 3))
        ii = i0 + jnp.arange(_TILE, dtype=jnp.int32)

        def j_body(jt, carry):
            s, norm = carry
            j0 = jt * _TILE
            pj = lax.dynamic_slice(old_pos, (j0, 0), (_TILE, 3))
            vj = lax.dynamic_slice(old_vel, (j0, 0), (_TILE, 3))
            rhoj = lax.dynamic_slice(density, (j0,), (_TILE,))
            cj = lax.dynamic_slice(contrib_f, (j0,), (_TILE,))
            jj = lax.dynamic_slice(idx, (j0,), (_TILE,))

            diff = pi[:, None, :] - pj[None, :, :]
            r2 = jnp.sum(diff * diff, axis=-1)
            mask = ((ii[:, None] != jj[None, :]) & (r2 < h2)
                    & (rhoj[None, :] > 0.0) & (cj[None, :] > 0.0))
            w = jnp.where(mask, K.poly6(r2, h), 0.0)
            mw = w * params.mass / jnp.maximum(rhoj[None, :], 1e-12)
            s = s + jnp.sum((vj[None, :, :] - vi[:, None, :]) * mw[..., None], 1)
            return (s, norm + jnp.sum(w, axis=1))

        z3 = jnp.zeros((_TILE, 3), jnp.float32)
        z1 = jnp.zeros((_TILE,), jnp.float32)
        s, norm = lax.fori_loop(0, n // _TILE, j_body, (z3, z1))
        return s, norm

    s, norm = lax.map(per_i_tile, _tile_starts(n))
    return s.reshape(n, 3), norm.reshape(n)


def substep(state: ParticleState, params: FluidParams,
            dt: jax.Array) -> ParticleState:
    """One full WCSPH substep with all-pairs neighbor enumeration."""
    contrib = state.contrib_mask(params.ghost_face_active)
    fluid = state.fluid_mask()

    rho_raw = density_pass(state.pos, contrib, params)
    density, pressure = C.finish_density(
        rho_raw, state.ghost, contrib, state.density, state.pressure, params)

    accum = force_pass(state.pos, state.vel, density, pressure, contrib, params)
    acc = C.assemble_acc(accum, density, params)
    new_pos, new_vel = C.integrate(state.pos, state.vel, acc, dt)

    xsph_sum, xsph_norm = xsph_pass(new_pos, new_vel, state.pos, state.vel,
                                    density, contrib, params)
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
