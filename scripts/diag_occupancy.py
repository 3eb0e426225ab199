#!/usr/bin/env python
"""Per-window occupancy histogram for the pallas sweep kernels.

PERF.md round-4: force+xsph costs 91.5 ms at ghost_1m and scales with
the WINDOW-max occupancy bound (one crowded cell forces the slot loop
deep for all ``cw`` lanes).  Before building per-subwindow gating, this
quantifies the attainable win: it replays a config, rebuilds the
per-cell counts the table build uses (planes._padded_counts), and
compares the kernel's work under
  (a) the shipped per-(row, chunk) window-max bound (occ4 over 4 rows),
  (b) a hypothetical per-SUBWINDOW (128/256-lane) max bound,
  (c) the true per-cell lower bound (sum of cell occupancies).

Usage: python scripts/diag_occupancy.py <config> [n_substeps]
"""
from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # runnable without PYTHONPATH
import sys

import numpy as np

import jax
if _os.environ.get("SPH_DIAG_CPU") == "1":
    # n_sub=0 analysis of the spawn state needs no device at all
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from sph_tpu.app import configs as AC
from sph_tpu.engine.step import SceneBuffers, run_substeps
from sph_tpu.neighbors import planes as PL

config_name = sys.argv[1] if len(sys.argv) > 1 else "ghost_1m"
n_sub = int(sys.argv[2]) if len(sys.argv) > 2 else 20

cfg = AC.CONFIGS[config_name]
state, params, sim = AC.build(cfg)
geom = PL.geom_for(sim)
print(f"[occ] config={config_name} n={state.n} grid={sim.grid_dims} "
      f"cap={geom.cap} nyq={geom.nyq} nc={geom.n_chunks} cw={geom.cw} "
      f"halo={geom.halo}", file=sys.stderr)

buffers = SceneBuffers.create(sim)
state, _ = run_substeps(state, params, buffers, params.dt, n_sub, sim)

# --- host-side rebuild of the padded-cell counts (fluid rows only) ---
key = np.asarray(PL.compute_keys_ymajor(
    state.pos, state.fluid_mask(), params, geom))
key = np.sort(key)
pc = np.asarray(PL.padded_cell_index(jnp.asarray(key), geom))
key_p = np.where(key < geom.num_cells, pc, geom.padded_cells)
counts = np.bincount(key_p, minlength=geom.padded_cells + 1)
counts = counts[:geom.padded_cells].reshape(geom.nyp, geom.nzx)

cap = geom.cap
occ_a = np.minimum(counts, cap)
occ_b = np.clip(counts - cap, 0, cap)

nyp_pad = geom.nyp_pad
nzxp = geom.n_chunks * geom.cw
occ_a = np.pad(occ_a, ((0, nyp_pad - geom.nyp), (0, nzxp - geom.nzx)))
occ_b = np.pad(occ_b, ((0, nyp_pad - geom.nyp), (0, nzxp - geom.nzx)))
dest = (occ_a.reshape(nyp_pad, geom.n_chunks, geom.cw).max(-1) > 0)

h = geom.halo


def ext_rows(occ, q):
    """The 4 source-row slices (rows 2q-1..2q+2, clipped) with halo."""
    top = nyp_pad - 1
    rows = [occ[min(max(2 * q - 1 + j, 0), top)] for j in range(4)]
    return np.stack(rows)                     # [4, nzxp]


def work(sub: int):
    """Sweep slot-loop unit count under sub-lane-window max bounds.
    One unit = one (fam-slot, 128-lane, 36-window-iter) strip; the
    shipped kernel is sub == cw (whole window)."""
    total = 0
    n_strips = geom.cw // sub
    for q in range(geom.nyq):
        for c in range(geom.n_chunks):
            if not dest[2 * q: 2 * q + 2, c].any():
                continue
            base = c * geom.cw
            r4a = ext_rows(occ_a, q)
            r4b = ext_rows(occ_b, q)
            for s0 in range(n_strips):
                lo = base + s0 * sub - h
                hi = base + (s0 + 1) * sub + h
                lo = max(lo, 0)
                wa = r4a[:, lo:hi].max() if hi > lo else 0
                wb = r4b[:, lo:hi].max() if hi > lo else 0
                total += int(wa + wb) * (sub // 128)
    return total


units_full = work(geom.cw)
units_256 = work(256) if geom.cw % 256 == 0 else -1
units_128 = work(128)

# true per-cell lower bound: each real (dest-cell, source-slot) pair,
# in 128-lane units
cnt_full = counts.reshape(-1)
true_units = float((np.minimum(cnt_full, 2 * cap)).sum()) * 27 / 36 / 128

print(f"[occ] slot-strip units (128-lane x 36-iter):", file=sys.stderr)
print(f"[occ]   window-max (shipped, cw={geom.cw}): {units_full}",
      file=sys.stderr)
if units_256 >= 0:
    print(f"[occ]   256-lane subwindows: {units_256}  "
          f"(x{units_full / max(units_256, 1):.2f} less work)",
      file=sys.stderr)
print(f"[occ]   128-lane subwindows: {units_128}  "
      f"(x{units_full / max(units_128, 1):.2f} less work)",
      file=sys.stderr)
print(f"[occ]   true cell-granular bound: ~{true_units:.0f}  "
      f"(x{units_full / max(true_units, 1):.1f})", file=sys.stderr)

# occupancy histograms
occ4 = []
for q in range(geom.nyq):
    r4 = ext_rows(occ_a, q) + 0
    for c in range(geom.n_chunks):
        if not dest[2 * q: 2 * q + 2, c].any():
            continue
        lo = max(c * geom.cw - h, 0)
        hi = (c + 1) * geom.cw + h
        occ4.append(r4[:, lo:hi].max())
occ4 = np.asarray(occ4)
print(f"[occ] active blocks: {occ4.size}; window occ4_A histogram: "
      f"{np.bincount(occ4, minlength=cap + 1).tolist()}", file=sys.stderr)
print(f"[occ] mean cell occupancy (occupied cells): "
      f"{cnt_full[cnt_full > 0].mean():.2f}; "
      f"cells > 2cap: {(cnt_full > 2 * cap).sum()}", file=sys.stderr)
