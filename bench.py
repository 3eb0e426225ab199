#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Metric (BASELINE.json): particle-steps/sec at 1M particles on one TPU chip.
Baseline: the reference's implied sustained design point on its dev GPU,
~4.8e7 particle-steps/sec (50k particles x 16 substeps x 60 fps; see
BASELINE.md).  Detail timings (per-stage ms/substep) go to stderr.

Usage: python bench.py [config_name] [n_substeps]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_BASELINE_PSTEPS = 4.8e7


def main() -> None:
    config_name = sys.argv[1] if len(sys.argv) > 1 else "ghost_1m"
    n_substeps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    impl_override = sys.argv[3] if len(sys.argv) > 3 else None

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from sph_tpu.app import configs as AC
    from sph_tpu.engine.step import SceneBuffers, run_substeps

    dev = jax.devices()[0]
    print(f"[bench] device: {dev.device_kind} ({dev.platform})",
          file=sys.stderr)

    if config_name not in AC.CONFIGS:
        sys.exit(f"unknown config '{config_name}'; "
                 f"available: {', '.join(sorted(AC.CONFIGS))}")
    cfg = AC.CONFIGS[config_name]
    state, params, sim = AC.build(cfg, neighbor_impl=impl_override)

    # A/B knobs for perf bisection (PERF.md): env overrides beat editing
    # configs between runs — the driver never sets these.
    import dataclasses as _dc
    import os as _os
    _ab = {}
    if _os.environ.get("SPH_EMIT_ROWS") is not None:
        _ab["emit_rows"] = _os.environ["SPH_EMIT_ROWS"] == "1"
    if _os.environ.get("SPH_ACTIVE_FRAC") is not None:
        _ab["sweep_active_frac"] = float(_os.environ["SPH_ACTIVE_FRAC"])
    if _os.environ.get("SPH_EXACT_OVERFLOW") is not None:
        _ab["exact_overflow"] = _os.environ["SPH_EXACT_OVERFLOW"] == "1"
    if _os.environ.get("SPH_OVERFLOW_INLINE") is not None:
        _ab["overflow_inline"] = _os.environ["SPH_OVERFLOW_INLINE"] == "1"
    if _os.environ.get("SPH_GATHER_COLS") is not None:
        _ab["gather_cols"] = _os.environ["SPH_GATHER_COLS"] == "1"
    if _os.environ.get("SPH_GATHER_UNIQUE") is not None:
        _ab["gather_unique"] = _os.environ["SPH_GATHER_UNIQUE"] == "1"
    if _os.environ.get("SPH_MAX_CWH") is not None:
        _ab["plane_max_cwh"] = int(_os.environ["SPH_MAX_CWH"])
    if _os.environ.get("SPH_COMPACT_FORCE") is not None:
        _ab["compact_force"] = _os.environ["SPH_COMPACT_FORCE"] == "1"
    if _os.environ.get("SPH_CELL_CAPACITY") is not None:
        # structural: table shapes change; cap = capacity//2 must stay
        # Mosaic-legal (divisible by 8), so use 16 or 32 — never 24
        _ab["cell_capacity"] = int(_os.environ["SPH_CELL_CAPACITY"])
    if _ab:
        sim = _dc.replace(sim, **_ab)
        print(f"[bench] A/B overrides: {_ab}", file=sys.stderr)
    buffers = SceneBuffers.create(sim)
    n_fluid = int(np.asarray(state.fluid_mask()).sum())
    print(f"[bench] config={config_name} fluid={n_fluid} padded={state.n} "
          f"grid={sim.grid_dims} impl={sim.neighbor_impl}", file=sys.stderr)

    # Config 3 ("rotated OBB + continuous wave impulse"): the reference
    # kicks once per FRAME (Scene0p.cpp:1303-1307), dt-premultiplied; a
    # bench batch stands in for one frame.
    if cfg.wave_impulse:
        import jax.numpy as jnp
        from sph_tpu.physics.impulses import wave_impulse
        frame_prologue = jax.jit(lambda st: wave_impulse(
            st, amplitude=60.0 * float(params.dt) * n_substeps,
            wavelength=4.0, phase=0.7,
            direction=jnp.asarray([1.0, 0.0, 0.3])))
    else:
        def frame_prologue(st):
            return st

    # Warmup with the SAME substep count (scan length is a static jit arg,
    # so a different count would recompile inside the timed section).
    t0 = time.time()
    state, buffers = run_substeps(frame_prologue(state), params, buffers,
                                  params.dt, n_substeps, sim)
    _ = np.asarray(state.pos[:8])  # force completion (block_until_ready is a no-op over the tunnel)
    print(f"[bench] compile+warmup: {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    state, buffers = run_substeps(frame_prologue(state), params, buffers,
                                  params.dt, n_substeps, sim)
    _ = np.asarray(state.pos[:8])
    elapsed = time.time() - t0

    ms_per_substep = 1e3 * elapsed / n_substeps
    psteps = n_fluid * n_substeps / elapsed
    print(f"[bench] {n_substeps} substeps in {elapsed:.3f}s "
          f"({ms_per_substep:.2f} ms/substep)", file=sys.stderr)

    # Sanity: simulation must stay finite.
    assert not bool(np.isnan(np.asarray(state.pos[:1024])).any()), \
        "NaN in positions after bench run"

    if sim.neighbor_impl == "pallas":
        # Capacity audit (VERDICT r1 weak #5 / r3 weak #3): particles
        # beyond cell_capacity are routed through the exact all-pairs
        # fallback (pallas_sweeps._overflow_exact) — oracle physics, no
        # silent degradation — as long as their count stays within the
        # fallback's static dest capacity. Fail loudly past that bound
        # (the reference's per-cell lists are unbounded,
        # BuildGrid.comp:34-38, so it has no analogous failure mode).
        import jax.numpy as jnp
        from sph_tpu.neighbors import pallas_sweeps as K
        from sph_tpu.neighbors import planes as PL
        geom = PL.geom_for(sim)
        key = PL.compute_keys_ymajor(
            state.pos, state.fluid_mask(), params, geom)
        skey, = jax.jit(lambda k: (jax.lax.sort((k,))[0],))(key)
        rank = PL._ranks(skey)
        ovf = int(np.asarray(jnp.sum(
            ((rank >= sim.cell_capacity)
             & (skey < geom.num_cells)).astype(jnp.int32))))
        movf = K._movf_bound(state.n, sim)
        # overflow_inline truncates the exact fallback at its static
        # bucket: rows past it stay ballistic for the substep, so the
        # assert must tighten to the bucket (ADVICE r4) — otherwise the
        # A/B knob silently degrades physics on high-overflow configs.
        cap_eff = (min(K._OVF_INLINE_B, movf)
                   if getattr(sim, "overflow_inline", False) else movf)
        print(f"[bench] capacity-overflow particles "
              f"(cell rank >= {sim.cell_capacity}): {ovf} "
              f"(exact-fallback capacity {cap_eff})", file=sys.stderr)
        assert ovf <= cap_eff, (
            f"{ovf} particles overflowed cell_capacity="
            f"{sim.cell_capacity}, beyond the exact fallback's "
            f"{cap_eff}-row capacity; physics silently degraded")

    if cfg.viz_export:
        # BASELINE config 5: headless frame export in all 4 viz modes
        # (height/speed/pressure/density) from the final state.
        import os
        from sph_tpu.viz import palettes as PAL
        from sph_tpu.viz.camera import fit_camera
        from sph_tpu.viz.splat import render_frame, save_png
        out_dir = "bench_frames"
        os.makedirs(out_dir, exist_ok=True)
        cam = fit_camera(np.asarray(cfg.box_half, np.float32))
        t0 = time.time()
        for mode, name in ((PAL.DRIVE_HEIGHT, "height"),
                           (PAL.DRIVE_SPEED, "speed"),
                           (PAL.DRIVE_PRESSURE, "pressure"),
                           (PAL.DRIVE_DENSITY, "density")):
            vp = PAL.VizParams(
                palette_id=1, color_drive=mode,
                height_min=-cfg.box_half[1], height_max=cfg.box_half[1])
            img = render_frame(state, vp, cam, width=960, height=540,
                               particle_radius=0.5 * cfg.h)
            save_png(img, os.path.join(out_dir, f"{config_name}_{name}.png"))
        print(f"[bench] viz export (4 modes, {n_fluid} particles): "
              f"{time.time() - t0:.1f}s -> {out_dir}/", file=sys.stderr)

    print(json.dumps({
        "metric": f"particle-steps/sec @ {config_name}",
        "value": round(psteps, 1),
        "unit": "particle-steps/sec",
        "vs_baseline": round(psteps / REFERENCE_BASELINE_PSTEPS, 3),
    }))


if __name__ == "__main__":
    main()
