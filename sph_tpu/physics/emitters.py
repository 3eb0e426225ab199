"""Particle recycling emitters: fountain jet and river stream.

Behavioral ports of ``shaders/FountainRecycle.comp`` and
``shaders/StreamEmit.comp``.  The shader-side LCG RNG becomes a vectorized
uint32 LCG driven by (particle index, per-dispatch seed), so reel exports
stay deterministic — the reference advances ``uSeed`` once per dispatch
(``SPHFluid3D.cpp:469``) and we mirror that with an explicit ``seed`` arg.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from sph_tpu.core.params import FluidParams, effective_half
from sph_tpu.core.state import ParticleState

_LCG_A = jnp.uint32(1664525)
_LCG_C = jnp.uint32(1013904223)


def _lcg_next(s: jax.Array):
    s = s * _LCG_A + _LCG_C
    u = (s & jnp.uint32(0xFFFFFF)).astype(jnp.float32) / 16777215.0
    return s, u


def fountain_recycle(state: ParticleState, params: FluidParams, dt: jax.Array,
                     seed: jax.Array) -> ParticleState:
    """Recycle pooled bottom water into an upward nozzle jet.

    Mirrors ``FountainRecycle.comp``: particles below the drain plane are
    respawned (with probability ``drain_per_sec * dt``) on the nozzle disc
    with an upward jet velocity + sideways spread cone.  Color-group tags
    survive recycling.
    """
    half = effective_half(params)
    emit = params.box_center + params.fountain_offset
    drain_y = (params.box_center[1] - half[1]) + params.fountain_drain_level
    drain_chance = jnp.minimum(1.0, params.fountain_drain_per_sec * dt)

    i = state.orig_id.astype(jnp.uint32)
    s = (i ^ (jnp.asarray(seed, jnp.uint32) * jnp.uint32(747796405))) \
        + jnp.uint32(2891336453)
    s, roll = _lcg_next(s)
    s, r1 = _lcg_next(s)
    s, r2 = _lcg_next(s)
    s, r3 = _lcg_next(s)
    s, r4 = _lcg_next(s)

    recycle = ((state.ghost == 0) & (state.valid > 0)
               & (state.pos[:, 1] < drain_y) & (roll <= drain_chance))

    ang = 2.0 * jnp.pi * r1
    rad = params.fountain_radius * jnp.sqrt(r2)       # area-uniform disc
    new_pos = emit[None, :] + jnp.stack(
        [jnp.cos(ang) * rad, 0.2 * r3, jnp.sin(ang) * rad], axis=-1)
    side = jnp.stack([jnp.cos(ang), jnp.sin(ang)], -1) \
        * (params.fountain_spread * r4)[:, None]
    jet = jnp.stack([side[:, 0], jnp.ones_like(ang), side[:, 1]], axis=-1)
    jet = jet / jnp.sqrt(jnp.sum(jet * jet, axis=-1, keepdims=True))
    new_vel = params.fountain_jet_speed * jet

    m = recycle[:, None]
    return state.replace(
        pos=jnp.where(m, new_pos, state.pos),
        vel=jnp.where(m, new_vel, state.vel),
        acc=jnp.where(m, 0.0, state.acc),
        density=jnp.where(recycle, params.rest_density, state.density),
        pressure=jnp.where(recycle, 0.0, state.pressure),
    )


def stream_emit(state: ParticleState, params: FluidParams) -> ParticleState:
    """River recycling: dead particles respawn along the channel centerline.

    Mirrors ``StreamEmit.comp``: "dead" = below sink Y or past sink Z; the
    respawn hash depends only on the particle index (as in the reference),
    so a given slot always respawns at the same jittered spot.
    """
    i = state.orig_id.astype(jnp.uint32)
    s = i * _LCG_A + _LCG_C

    def nxt16(s):
        u = (s & jnp.uint32(0xFFFF)).astype(jnp.float32) / 65535.0
        return s * _LCG_A + _LCG_C, u

    r1 = (s & jnp.uint32(0xFFFF)).astype(jnp.float32) / 65535.0
    s, r2 = nxt16(s)
    s, r3 = nxt16(s)
    s, r4 = nxt16(s)

    dead = ((state.ghost == 0) & (state.valid > 0)
            & ((state.pos[:, 1] < params.river_sink_y)
               | (state.pos[:, 2] > params.river_sink_z_max)))

    spread_z = params.river_sink_z_max - params.river_emitter_pos[2]
    spawn_z = params.river_emitter_pos[2] + r1 * spread_z
    cx = (params.box_center[0]
          + params.river_amp * jnp.sin(params.river_freq * spawn_z
                                       + params.river_phase))
    new_pos = jnp.stack([
        cx + (r4 - 0.5) * 2.0 * params.river_emitter_radius,
        params.river_emitter_pos[1] + r3 * 0.6,
        spawn_z,
    ], axis=-1)

    m = dead[:, None]
    return state.replace(
        pos=jnp.where(m, new_pos, state.pos),
        vel=jnp.where(m, params.river_emitter_vel[None, :], state.vel),
        acc=jnp.where(m, 0.0, state.acc),
        density=jnp.where(dead, params.rest_density, state.density),
        pressure=jnp.where(dead, 0.0, state.pressure),
    )
