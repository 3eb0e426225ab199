#!/usr/bin/env python
"""Measure the [N,3]-layout tax on TPU row-space math (round-5
hypothesis: [N,3] f32 tiles as (8,128) with 125/128 lanes padded, so
every elementwise pass on pos/vel moves ~42x the bytes; the engine's
apply_container + reassembly chains run in that layout).

Compares, at n rows, scan-amortized:
  container(rows)   — constraints.apply_container on a ParticleState
  container(planes) — constraints.apply_container_planes on 6 [N] planes
                      (including the [N,3] -> planes slice + restack)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax import lax
from sph_tpu.core.params import FluidParams
from sph_tpu.core.state import ParticleState
from sph_tpu.physics import constraints as CN

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1147904
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20

params = FluidParams.default(
    box_half=np.asarray([18.5, 18.5, 18.5], np.float32),
    box_euler_deg=np.asarray([0.0, 0.0, 0.0], np.float32))
rng = np.random.RandomState(0)
pos = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
vel = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
st = ParticleState.zeros(n).replace(
    pos=jnp.asarray(pos), vel=jnp.asarray(vel),
    valid=jnp.ones((n,), jnp.int32))

def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:4]
    t0 = time.time()
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:4]
    dt = (time.time() - t0) / reps * 1e3
    print(f"{name:24s} {dt:8.2f} ms/iter", flush=True)

def rows_body(st_):
    def body(c, _):
        c = CN.apply_container(c, params)
        return c.replace(pos=c.pos * 1.0000001), None
    out, _ = lax.scan(body, st_, None, length=reps)
    return out

timed("container(rows)", rows_body, st)

def planes_body(st_):
    def body(c, _):
        px, py, pz = c.pos[:, 0], c.pos[:, 1], c.pos[:, 2]
        vx, vy, vz = c.vel[:, 0], c.vel[:, 1], c.vel[:, 2]
        live = (c.ghost == 0) & (c.valid > 0)
        px, py, pz, vx, vy, vz = CN.apply_container_planes(
            px, py, pz, vx, vy, vz, live, params)
        return c.replace(pos=jnp.stack([px, py, pz], -1) * 1.0000001,
                         vel=jnp.stack([vx, vy, vz], -1)), None
    out, _ = lax.scan(body, st_, None, length=reps)
    return out

timed("container(planes)", planes_body, st)

# pure elementwise chain tax: 10 fused mul-adds on [N,3] vs [3,N]
a3 = jnp.asarray(pos)
aT = jnp.asarray(pos.T.copy())

def chain(x):
    def body(c, _):
        for _ in range(10):
            c = c * 1.000001 + 0.5
        return c, None
    out, _ = lax.scan(body, x, None, length=reps)
    return out

timed("chain [N,3]", chain, a3)
timed("chain [3,N]", chain, aT)
