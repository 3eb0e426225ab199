#!/usr/bin/env python
"""Micro-benchmarks: pallas smoke test + sort/scatter/gather costs at N."""
from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable without PYTHONPATH
import sys
import time

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
C = int(sys.argv[2]) if len(sys.argv) > 2 else 2_400_000
K = 8
reps = 20

print(f"jax {jax.__version__}  N={N} C={C}", file=sys.stderr)


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf.reshape(-1)[:4])
    t0 = time.time()
    out = f(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf.reshape(-1)[:4])
    dt = (time.time() - t0) / reps * 1e3
    print(f"{name:28s} {dt:8.2f} ms/iter")
    return dt


# --- pallas smoke: simple block-accumulate kernel ---
def smoke_kernel(x_ref, o_ref):
    k2 = pl.program_id(1)

    @pl.when(k2 == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)
    o_ref[:] += x_ref[:] * 2.0


def smoke(x):
    return pl.pallas_call(
        smoke_kernel,
        grid=(x.shape[0] // 8, 4),
        in_specs=[pl.BlockSpec((8, x.shape[1]), lambda i, k: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, x.shape[1]), lambda i, k: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


x = jnp.ones((256, 512), jnp.float32)
out = jax.jit(smoke)(x)
print("pallas smoke:", np.asarray(out[:1, :4]), "(expect 8s)")

rng = np.random.default_rng(0)
keys = jnp.asarray(np.sort(rng.integers(0, C, N)).astype(np.int32))
fields = [jnp.asarray(rng.standard_normal(N).astype(np.float32))
          for _ in range(8)]
ranks = jnp.asarray((rng.integers(0, K, N)).astype(np.int32))


def scan9sort(k, fs):
    def body(carry, _):
        ops = lax.sort((k + carry, *fs), dimension=0, num_keys=1,
                       is_stable=True)
        return carry + ops[0][0] % 1, ops[1][0]
    return lax.scan(body, jnp.int32(0), None, length=reps)


def scan2sort(k):
    idx = jnp.arange(N, dtype=jnp.int32)

    def body(carry, _):
        ops = lax.sort((k + carry, idx), dimension=0, num_keys=1,
                       is_stable=True)
        return carry + ops[0][0] % 1, ops[1][0]
    return lax.scan(body, jnp.int32(0), None, length=reps)


def scan_scatter(k, r, fs):
    packed = jnp.stack(fs, -1)  # [N, 8]
    init = jnp.zeros((C * K + 1, 8), jnp.float32)

    def body(carry, _):
        slot = jnp.where(r < K, (k + carry) * K + r, C * K)
        t = init.at[slot].set(packed, mode="drop", unique_indices=True)
        return carry + (t[0, 0].astype(jnp.int32) % 1), t[0, 0]
    return lax.scan(body, jnp.int32(0), None, length=reps)


def scan_gather_asc(k, r, fs):
    flat = jnp.stack(fs + fs[:3], -1)  # [N, 11] stand-in, reuse table shape
    table = jnp.zeros((C * K, 11), jnp.float32)
    slot = jnp.minimum(k * K + r, C * K - 1)  # ascending-ish (key-major)

    def body(carry, _):
        pp = table[slot + carry]
        return carry + (pp[0, 0].astype(jnp.int32) % 1), pp[0, 0]
    return lax.scan(body, jnp.int32(0), None, length=reps)


def scan_gather_rand(k, r):
    table = jnp.zeros((C * K, 11), jnp.float32)
    slot = jnp.minimum(r * C + k, C * K - 1)  # rank-major: non-monotonic

    def body(carry, _):
        pp = table[slot + carry]
        return carry + (pp[0, 0].astype(jnp.int32) % 1), pp[0, 0]
    return lax.scan(body, jnp.int32(0), None, length=reps)


def scan_transpose(fs):
    table = jnp.stack(fs, -1)  # [N, 8]
    t = jnp.broadcast_to(table[:, None, :], (N, 2, 8)).reshape(N * 2, 8)
    big = jnp.concatenate([t] * max(1, (C * K) // (2 * N)), 0)  # ~[C*K, 8]

    def body(carry, _):
        out = jnp.transpose(big + carry, (1, 0))
        return carry + out[0, 0] * 1e-20, out[0, 0]
    return lax.scan(body, jnp.float32(0), None, length=reps)


timed("sort 9 ops", scan9sort, keys, fields)
timed("sort 2 ops (key,idx)", scan2sort, keys)
timed("scatter packed asc [N,8]", scan_scatter, keys, ranks, fields)
timed("gather [N,11] key-major", scan_gather_asc, keys, ranks, fields)
timed("gather [N,11] rank-major", scan_gather_rand, keys, ranks)
timed("transpose [C*K,8]->[8,C*K]", scan_transpose, fields)
