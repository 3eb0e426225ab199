#!/usr/bin/env python
"""Quick correctness check: pallas engine vs brute oracle on a small dam
break (CPU interpret mode unless run under TPU)."""
from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable without PYTHONPATH
import sys

import numpy as np

import jax
if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sph_tpu.core import state as S
from sph_tpu.core.params import FluidParams, SimConfig, compute_grid_dims, SHAPE_BOX
from sph_tpu.engine.step import SceneBuffers, run_substeps

n_sub = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 10

spawn = S.spawn_standard(2048, h=0.28, box_half=(4.0, 4.0, 4.0), seed=0)
state = S.state_from_spawn(spawn)
params = FluidParams.default(box_half=np.asarray([4.0, 4.0, 4.0], np.float32)
                             ).derive_mass()
dims = compute_grid_dims(SHAPE_BOX, [4.0, 4.0, 4.0], [0, 0, 0], 0.28)
print(f"n={state.n} fluid={spawn.count} dims={dims}")


def run(impl):
    cfg = SimConfig(n=state.n, grid_dims=dims, neighbor_impl=impl)
    buf = SceneBuffers.create(cfg)
    out, _ = run_substeps(state, params, buf, params.dt, n_sub, cfg)
    return out


st_b = run("brute")
st_p = run("pallas")

v = np.asarray(state.valid) > 0
# pallas returns sorted order; realign by orig_id
oid_b = np.asarray(st_b.orig_id)
oid_p = np.asarray(st_p.orig_id)
ord_b = np.argsort(oid_b)
ord_p = np.argsort(oid_p)

pos_b = np.asarray(st_b.pos)[ord_b][v[ord_b] * 0 + np.sort(oid_b) >= 0]
pos_b = np.asarray(st_b.pos)[ord_b]
pos_p = np.asarray(st_p.pos)[ord_p]
rho_b = np.asarray(st_b.density)[ord_b]
rho_p = np.asarray(st_p.density)[ord_p]
val_b = np.asarray(st_b.valid)[ord_b] > 0

dpos = np.abs(pos_b - pos_p)[val_b]
drho = np.abs(rho_b - rho_p)[val_b]
print(f"substeps={n_sub}  max|dpos|={dpos.max():.3e}  max|drho|={drho.max():.3e}")
print(f"rho range pallas: {rho_p[val_b].min():.1f}..{rho_p[val_b].max():.1f}")
assert not np.isnan(pos_p).any(), "NaN in pallas positions"
assert dpos.max() < 5e-4, f"trajectory diverged: {dpos.max()}"
print("OK")
