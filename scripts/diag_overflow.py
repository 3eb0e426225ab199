#!/usr/bin/env python
"""Diagnose WHERE capacity-overflow particles sit for a bench config:
grid-edge cells (clamping artifact — grid too small for the live fluid
extent) vs interior cells (real physical compression, needs capacity or
the exact fallback).  Usage:
    python scripts/diag_overflow.py <config> [n_substeps]
"""
from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # runnable without PYTHONPATH
import sys

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from sph_tpu.app import configs as AC
from sph_tpu.core.params import grid_cell_coords
from sph_tpu.engine.step import SceneBuffers, run_substeps
from sph_tpu.neighbors import planes as PL

config_name = sys.argv[1] if len(sys.argv) > 1 else "rotated_512k"
n_sub = int(sys.argv[2]) if len(sys.argv) > 2 else 20

cfg = AC.CONFIGS[config_name]
state, params, sim = AC.build(cfg)
print(f"[diag] config={config_name} n={state.n} grid={sim.grid_dims} "
      f"capacity={sim.cell_capacity}", file=sys.stderr)

if cfg.wave_impulse:
    from sph_tpu.physics.impulses import wave_impulse
    state = jax.jit(lambda st: wave_impulse(
        st, amplitude=60.0 * float(params.dt) * n_sub,
        wavelength=4.0, phase=0.7,
        direction=jnp.asarray([1.0, 0.0, 0.3])))(state)

buffers = SceneBuffers.create(sim)
state, _ = run_substeps(state, params, buffers, params.dt, n_sub, sim)

pos = np.asarray(state.pos)
fluid = np.asarray(state.fluid_mask())
geom = PL.geom_for(sim)
key = np.asarray(PL.compute_keys_ymajor(
    state.pos, state.fluid_mask(), params, geom))
order = np.argsort(key, kind="stable")
skey = key[order]
rank = np.asarray(PL._ranks(jnp.asarray(skey)))
ovf = (rank >= sim.cell_capacity) & (skey < geom.num_cells)
n_ovf = int(ovf.sum())
print(f"[diag] overflow particles (rank >= {sim.cell_capacity}): "
      f"{n_ovf}", file=sys.stderr)
if n_ovf == 0:
    sys.exit(0)

okey = skey[ovf]
nx, ny, nz = sim.grid_dims
cx = okey % nx
cz = (okey // nx) % nz
cy = okey // (nx * nz)
at_edge = ((cx == 0) | (cx == nx - 1) | (cy == 0) | (cy == ny - 1)
           | (cz == 0) | (cz == nz - 1))
print(f"[diag] overflow at grid-EDGE cells: {int(at_edge.sum())} "
      f"({100.0 * at_edge.mean():.1f}%) — clamping artifact if high",
      file=sys.stderr)
print(f"[diag] overflow at interior cells: {int((~at_edge).sum())}",
      file=sys.stderr)

# how hot are the hottest cells?
uniq, counts = np.unique(skey[skey < geom.num_cells],
                         return_counts=True)
top = np.sort(counts)[-16:]
print(f"[diag] hottest cell occupancies: {top.tolist()}",
      file=sys.stderr)
# where are the hottest cells?
hot = uniq[np.argsort(counts)[-8:]]
hx, hz, hy = hot % nx, (hot // nx) % nz, hot // (nx * nz)
print(f"[diag] hottest cells (x,y,z of {nx}x{ny}x{nz}): "
      f"{list(zip(hx.tolist(), hy.tolist(), hz.tolist()))}",
      file=sys.stderr)

# are the clamped rows actually OUTSIDE the grid extent?
opos = pos[order][ovf]
c = np.asarray(grid_cell_coords(jnp.asarray(opos), params,
                                sim.grid_dims))
print(f"[diag] overflow cell-coord ranges: x[{c[:,0].min()},"
      f"{c[:,0].max()}] y[{c[:,1].min()},{c[:,1].max()}] "
      f"z[{c[:,2].min()},{c[:,2].max()}]", file=sys.stderr)
