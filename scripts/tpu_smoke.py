#!/usr/bin/env python
"""Fail-fast TPU smoke (VERDICT r3 weak #5): run BEFORE any timed bench.

1. ``expand``: build a small fluid table with the MXU one-hot kernel and
   with the scatter reference ON THE DEVICE and assert bit-equality —
   catches Mosaic lowering crashes and wrong-output bugs in minutes.
2. ``configs``: for each named bench config, compile + run ONE substep
   (scan length 1) and report wall time.  A config that cannot lower
   fails here in its own line instead of killing a 30-minute sequence.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_smoke.py \
           [expand] [config names...]
"""
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

args = sys.argv[1:] or ["expand", "default_131k", "rotated_512k",
                        "ghost_1m", "export_4m"]
print(f"[smoke] device: {jax.devices()[0].device_kind}", file=sys.stderr)


def smoke_expand() -> None:
    from sph_tpu.core import state as S
    from sph_tpu.core.params import (FluidParams, SimConfig,
                                     compute_grid_dims, SHAPE_BOX)
    from sph_tpu.neighbors import planes as PL

    spawn = S.spawn_standard(4096, h=0.28, box_half=(5.0, 5.0, 5.0), seed=0)
    state = S.state_from_spawn(spawn)
    params = FluidParams.default(
        box_half=np.asarray([5.0, 5.0, 5.0], np.float32)).derive_mass()
    dims = compute_grid_dims(SHAPE_BOX, [5.0, 5.0, 5.0], [0, 0, 0], 0.28)
    for cell_capacity in (8, 16, 4):
        sim = SimConfig(n=state.n, grid_dims=dims, neighbor_impl="pallas",
                        cell_capacity=cell_capacity)
        geom = PL.geom_for(sim)
        mask = (state.valid > 0) & (state.ghost == 0)
        key = PL.compute_keys_ymajor(state.pos, mask, params, geom)
        contrib = state.contrib_mask(params.ghost_face_active)
        s = PL.sort_particles(state, key, contrib)

        t0 = time.time()
        ft_m = jax.jit(lambda s_: PL.build_fluid_tables(
            s_, params, geom, method="mxu"))(s)
        a_m, b_m = (np.asarray(ft_m.tbl_a), np.asarray(ft_m.tbl_b))
        t_mxu = time.time() - t0
        ft_s = jax.jit(lambda s_: PL.build_fluid_tables(
            s_, params, geom, method="scatter"))(s)
        a_s, b_s = (np.asarray(ft_s.tbl_a), np.asarray(ft_s.tbl_b))
        ok = (a_m == a_s).all() and (b_m == b_s).all()
        print(f"[smoke] expand cap={cell_capacity}: mxu==scatter: {ok} "
              f"(compile+run {t_mxu:.1f}s)", flush=True)
        if not ok:
            bad = np.argwhere(a_m != a_s)
            print(f"[smoke]   first mismatches A: {bad[:5]}", flush=True)
            sys.exit(f"expand mismatch at cap={cell_capacity}")


def smoke_config(name: str) -> None:
    from sph_tpu.app import configs as AC
    from sph_tpu.engine.step import SceneBuffers, run_substeps
    cfg = AC.CONFIGS[name]
    state, params, sim = AC.build(cfg)
    buffers = SceneBuffers.create(sim)
    t0 = time.time()
    out, _ = run_substeps(state, params, buffers, params.dt, 1, sim)
    p = np.asarray(out.pos[:8])
    dt = time.time() - t0
    nan = bool(np.isnan(p).any())
    print(f"[smoke] {name}: 1 substep ok in {dt:.1f}s (compile incl) "
          f"nan={nan}", flush=True)
    if nan:
        sys.exit(f"{name}: NaN after one substep")


for a in args:
    if a == "expand":
        smoke_expand()
    else:
        smoke_config(a)
print("[smoke] ALL OK", flush=True)
