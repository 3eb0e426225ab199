#!/usr/bin/env python
"""Decisive primitives for the neighbor-table build at 1M particles."""
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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
reps = 20
K = 8

print(f"jax {jax.__version__}  N={N}", file=sys.stderr)
rng = np.random.default_rng(0)


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
    print(f"{name:44s} {dt:8.2f} ms/iter", flush=True)
    return dt


keys_small = jnp.asarray(np.sort(rng.integers(0, N // 2, N)).astype(np.int32))
keys_big = jnp.asarray(np.sort(rng.integers(0, 2_400_000, N)).astype(np.int32))
ranks = jnp.asarray(rng.integers(0, K, N).astype(np.int32))
packed = jnp.asarray(rng.standard_normal((N, 8)).astype(np.float32))
f1 = packed[:, 0]


def scan(body):
    def outer(*args):
        def b(carry, _):
            return body(carry, *args)
        return lax.scan(b, jnp.int32(0), None, length=reps)
    return outer


def scatter_rows(table_rows):
    init = jnp.zeros((table_rows + 1, 8), jnp.float32)

    def body(carry, kk, r, p):
        slot = jnp.minimum(kk * K + r + carry, table_rows)
        t = init.at[slot].set(p, mode="drop", unique_indices=True)
        return carry + (t[0, 0].astype(jnp.int32) % 1), t[0, 0]
    return scan(body)


def scatter_1field(table_rows):
    init = jnp.zeros((table_rows + 1,), jnp.float32)

    def body(carry, kk, r, v):
        slot = jnp.minimum(kk * K + r + carry, table_rows)
        t = init.at[slot].set(v, mode="drop", unique_indices=True)
        return carry + (t[0].astype(jnp.int32) % 1), t[0]
    return scan(body)


def scatter_add_i32(table_rows):
    init = jnp.zeros((table_rows + 1,), jnp.int32)

    def body(carry, kk):
        slot = jnp.minimum(kk + carry, table_rows)
        t = init.at[slot].add(1, mode="drop")
        return carry + (t[0] % 1), t[0]
    return scan(body)


def searchsorted_rows(n_bound):
    bounds = jnp.arange(n_bound, dtype=jnp.int32) * jnp.int32(
        max(1, 2_400_000 // n_bound))

    def body(carry, kk):
        ss = jnp.searchsorted(kk, bounds + carry).astype(jnp.int32)
        return carry + (ss[0] % 1), ss[0]
    return scan(body)


def vmap_dynslice(n_idx, rows):
    starts = jnp.asarray(
        np.sort(rng.integers(0, N - rows - 1, n_idx)).astype(jnp.int32))

    def body(carry, p):
        def one(s):
            return lax.dynamic_slice(p, (s, 0), (rows, 8))
        out = jax.vmap(one)(starts + carry)
        return carry + (out[0, 0, 0].astype(jnp.int32) % 1), out[0, 0, 0]
    return scan(body)


# How does ascending-unique row scatter scale with table size?
timed("scatter [N,8] -> 2.4M rows", scatter_rows(2_400_000), keys_small, ranks, packed)
timed("scatter [N,8] -> 19.2M rows", scatter_rows(19_200_000), keys_big, ranks, packed)
timed("scatter [N] f32 -> 19.2M rows", scatter_1field(19_200_000), keys_big, ranks, f1)
timed("scatter-add [N] i32 -> 2.4M", scatter_add_i32(2_400_000), keys_big)
timed("searchsorted 18.5k bounds", searchsorted_rows(18_500), keys_big)
timed("searchsorted 2.4M bounds", searchsorted_rows(2_400_000), keys_big)
timed("vmap dynslice 136 x [8192,8]", vmap_dynslice(136, 8192), packed)
timed("vmap dynslice 18.5k x [128,8]", vmap_dynslice(18_500, 128), packed)
timed("vmap dynslice 150k x [16,8]", vmap_dynslice(150_000, 16), packed)
