#!/usr/bin/env python
"""Prototype: butterfly-in-VMEM expand kernel.

Validates the risky Mosaic pieces before integration:
- dynamic dim-0 DMA from a [N, 128] HBM array (arbitrary row offset)
- in-kernel [max_row, 16] -> [16, max_row] transpose
- the monotone-expand conditional-shift rounds on VMEM values
- static block output write [F, 1, S]

Usage: python scripts/proto_bfly_kernel.py [--tpu]
"""
from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable without PYTHONPATH
import functools
import math
import sys

import numpy as np

import jax
if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F = 8          # payload fields
import os
NROW = int(os.environ.get("PROTO_NROW", 64))
S = int(os.environ.get("PROTO_S", 4096))
MAXR = int(os.environ.get("PROTO_MAXR", 1024))
SEED = 0


def _kernel(rounds: int, starts_ref, rows_hbm, out_ref, scr, sem,
            skip_transpose=False, skip_rounds=False, skip_dma=False):
    y = pl.program_id(0)
    st = starts_ref[y]
    cnt = starts_ref[y + 1] - st
    if not skip_dma:
        cp = pltpu.make_async_copy(rows_hbm.at[pl.ds(st, MAXR)], scr, sem)
        cp.start()
        cp.wait()
    tile = scr[...]                          # [MAXR, 128]
    if skip_transpose:
        xT = jnp.broadcast_to(tile[:F + 1, :1], (F + 1, MAXR)) + tile[0, 0]
    else:
        xT = jnp.transpose(tile)[:F + 1]     # full-tile transpose, [F+1, MAXR]
    # lay into [F+1, S]: element i sits at position i, target slot in row F
    x = jnp.pad(xT, ((0, 0), (0, S - MAXR)))
    t_idx = lax.broadcasted_iota(jnp.int32, (1, S), 1)
    target = x[F:F + 1].astype(jnp.int32)    # [1, S]
    live = jnp.where(t_idx < cnt, 1, 0)      # int masks: bool vector pads
    dist = jnp.maximum(jnp.where(live > 0, target - t_idx, 0), 0)
    vals = x[:F]
    for b in reversed(range(0 if skip_rounds else rounds)):
        sh = 1 << b
        xs = jnp.pad(vals, ((0, 0), (sh, 0)))[:, :S]
        ds = jnp.pad(dist, ((0, 0), (sh, 0)))[:, :S]
        ls = jnp.pad(live, ((0, 0), (sh, 0)))[:, :S]
        take = ls * ((ds >> b) & 1)
        vacate = live * ((dist >> b) & 1)
        vals = jnp.where(take > 0, xs, vals)
        dist = jnp.where(take > 0, ds - sh, dist)
        live = jnp.maximum(take, live - vacate)
    vals = jnp.where(live > 0, vals, -1.0)   # holes -> -1
    out_ref[...] = vals[None, :, :]          # [1, F, S]


def main():
    rng = np.random.default_rng(SEED)
    rounds = int(math.ceil(math.log2(S)))

    # synth: each row gets a random occupancy; targets ascending unique
    counts = rng.integers(int(MAXR*0.5), MAXR, NROW)
    starts = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    n = int(starts[-1])
    rows = np.zeros((n + MAXR, 128), np.float32)
    targets_all = []
    for y in range(NROW):
        t = np.sort(rng.choice(S, counts[y], replace=False))
        targets_all.append(t)
        sl = slice(starts[y], starts[y + 1])
        rows[sl, :F] = rng.standard_normal((counts[y], F)).astype(np.float32)
        rows[sl, F] = t

    out = pl.pallas_call(
        functools.partial(_kernel, rounds),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NROW,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((1, F, S), lambda y, st: (y, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((MAXR, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA]),
        out_shape=jax.ShapeDtypeStruct((NROW, F, S), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(jnp.asarray(starts), jnp.asarray(rows))
    out = np.asarray(out)

    # oracle
    ref = np.full((NROW, F, S), -1.0, np.float32)
    for y in range(NROW):
        sl = slice(starts[y], starts[y + 1])
        ref[y, :, targets_all[y]] = rows[sl, :F]
    np.testing.assert_array_equal(out, ref)
    print(f"proto bfly expand OK — {n} elements, {NROW} rows, S={S}")

    if "--tpu" in sys.argv:
        import time
        def make(skip_t=False, skip_r=False, skip_d=False):
            return (lambda st_, rw: pl.pallas_call(
                functools.partial(_kernel, rounds, skip_transpose=skip_t,
                                  skip_rounds=skip_r, skip_dma=skip_d),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(NROW,),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
                    out_specs=pl.BlockSpec((1, F, S), lambda y, st: (y, 0, 0),
                                           memory_space=pltpu.VMEM),
                    scratch_shapes=[pltpu.VMEM((MAXR, 128), jnp.float32),
                                    pltpu.SemaphoreType.DMA]),
                out_shape=jax.ShapeDtypeStruct((NROW, F, S), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=110 * 1024 * 1024),
            )(st_, rw))
        def scanned(fv):
            def run(st_, rw):
                def body(c, _):
                    o = fv(st_, rw + c)
                    return c + o[0, 0, 0] * 1e-20, None
                out, _ = lax.scan(body, jnp.float32(0.0), None, length=20)
                return out
            return jax.jit(run)
        for name, fv in [("full", make()),
                         ("no-transpose", make(skip_t=True)),
                         ("no-rounds", make(skip_r=True)),
                         ("no-dma", make(skip_d=True)),
                         ("only-write", make(True, True, True))]:
            g = scanned(fv)
            o = g(jnp.asarray(starts), jnp.asarray(rows))
            _ = np.asarray(o)
            t0 = time.time()
            o = g(jnp.asarray(starts), jnp.asarray(rows))
            _ = np.asarray(o)
            print(f"tpu[{name}]: {(time.time()-t0)/20*1e3:.3f} ms/call")
        return
        f = jax.jit(lambda st_, rw: pl.pallas_call(
            functools.partial(_kernel, rounds),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(NROW,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
                out_specs=pl.BlockSpec((1, F, S), lambda y, st: (y, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((MAXR, 128), jnp.float32),
                                pltpu.SemaphoreType.DMA]),
            out_shape=jax.ShapeDtypeStruct((NROW, F, S), jnp.float32),
        )(st_, rw))
        o = f(jnp.asarray(starts), jnp.asarray(rows))
        _ = np.asarray(o[:1, :1, :8])
        t0 = time.time()
        for _ in range(20):
            o = f(jnp.asarray(starts), jnp.asarray(rows))
        _ = np.asarray(o[:1, :1, :8])
        print(f"tpu: {(time.time()-t0)/20*1e3:.3f} ms/call "
              f"({NROW} rows x {S} slots)")


if __name__ == "__main__":
    main()
