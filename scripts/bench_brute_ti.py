#!/usr/bin/env python
"""TI sweep for the brute_pallas all-pairs kernels (dam_break_8k,
BASELINE config 1): times `ti` i-rows-per-program variants, scan-
amortized inside one jit. Target: >=5e6 psteps/s (1.64 ms/substep).
Usage: python scripts/bench_brute_ti.py [reps] [ti ...]
"""
from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable without PYTHONPATH
import functools
import sys
import time

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax import lax

from sph_tpu.app import configs as AC
from sph_tpu.physics import brute_pallas as BP

def parse(a):
    """``ti`` or ``ti:jc`` (jc = j-chunk width, 0 = one full pass)."""
    if ":" in a:
        t, j = a.split(":")
        return int(t), int(j)
    return int(a), 0


reps = int(sys.argv[1]) if len(sys.argv) > 1 else 50
tis = [parse(a) for a in sys.argv[2:]] or [
    (8, 0), (16, 0), (32, 0), (64, 0), (128, 0), (256, 0),
    (16, 1024), (32, 512), (32, 1024), (32, 2048), (64, 1024)]

cfg = AC.CONFIGS["dam_break_8k"]
state, params, sim = AC.build(cfg)
n = int(np.asarray(state.fluid_mask()).sum())
print(f"n={n} reps={reps}", file=sys.stderr)

for ti, jc in tis:
    @functools.partial(jax.jit, static_argnames=("ti", "jc"))
    def run(st, dt, ti, jc):
        def body(s, _):
            return BP.substep(s, params, dt, ti=ti, jc=jc), ()
        out, _ = lax.scan(body, st, None, length=reps)
        return out

    out = run(state, params.dt, ti=ti, jc=jc)
    _ = np.asarray(out.pos[:8])
    t0 = time.time()
    out = run(state, params.dt, ti=ti, jc=jc)
    _ = np.asarray(out.pos[:8])
    el = time.time() - t0
    ms = 1e3 * el / reps
    print(f"ti={ti:4d} jc={jc:5d}: {ms:7.3f} ms/substep  "
          f"{n * reps / el:.3e} psteps/s", flush=True)
