#!/usr/bin/env python
"""Bisect the rotated_512k cap-16 NaN: replay the bench sequence
(wave impulse + substeps) one substep at a time, auditing NaN counts,
overflow, and extrema after each."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from sph_tpu.app import configs as AC
from sph_tpu.engine.step import SceneBuffers, run_substeps
from sph_tpu.physics.impulses import wave_impulse

cap = int(sys.argv[1]) if len(sys.argv) > 1 else 16
n_total = int(sys.argv[2]) if len(sys.argv) > 2 else 40
import dataclasses as dc
cfg = AC.CONFIGS["rotated_512k"]
state, params, sim = AC.build(cfg)
if cap != sim.cell_capacity:
    sim = dc.replace(sim, cell_capacity=cap)
buffers = SceneBuffers.create(sim)
imp = jax.jit(lambda st: wave_impulse(
    st, amplitude=60.0 * float(params.dt) * 20, wavelength=4.0,
    phase=0.7, direction=jnp.asarray([1.0, 0.0, 0.3])))

def audit(st, tag):
    pos = np.asarray(st.pos)
    vel = np.asarray(st.vel)
    rho = np.asarray(st.density)
    nanp = int(np.isnan(pos).any(axis=1).sum())
    nanv = int(np.isnan(vel).any(axis=1).sum())
    sp = np.linalg.norm(np.nan_to_num(vel), axis=1)
    print(f"[{tag}] nan pos={nanp} vel={nanv} max|p|={np.nanmax(np.abs(pos)):.3g} "
          f"maxsp={sp.max():.3g} rho[min,max]=[{np.nanmin(rho):.3g},{np.nanmax(rho):.3g}]",
          flush=True)
    if nanp:
        bad = np.isnan(pos).any(axis=1)
        i = np.where(bad)[0][:5]
        print(f"   first bad rows {i.tolist()} ghost={np.asarray(st.ghost)[i].tolist()} "
              f"valid={np.asarray(st.valid)[i].tolist()}", flush=True)
    return nanp

state = imp(state)
audit(state, "impulse0")
for k in range(n_total):
    if k == 20:
        state = imp(state)
        audit(state, "impulse20")
    state, buffers = run_substeps(state, params, buffers, params.dt, 1, sim)
    if audit(state, f"sub{k+1:02d}"):
        break
