"""Scene orchestrator — the idiomatic split of the reference's Scene0p
god object (``Scene0p.{h,cpp}``, 3694 LoC) into composable pieces.

Owns: SceneSettings (every user-facing knob), the device-side sim state
(ParticleState + FluidParams + SceneBuffers), reaction phases, the orbit
camera, the sequencer, and an optional audio reactor.  Responsibilities:

- ``respawn()``      — settings -> spawn + params + jit config
  (reference ``ResetSimulation`` path, ``SPHFluid3D.cpp:641-659``)
- ``update(frame_dt, bands)`` — one frame: sequencer tick, audio
  reaction, fixed-dt substep loop (``Scene0p.cpp:1321-1333``)
- ``render()``       — headless frame via the viz subsystem
- ``save_preset``/``load_preset`` — the KV look system
- ``save_checkpoint``/``load_checkpoint`` — full binary state
  checkpointing (positions/velocities/flags + settings + phases), a
  capability the reference lacks (SURVEY.md §5.4)
- ``load_stencil_png`` — Liquid Logo targets from a PNG's bright pixels
  (``Scene0p.cpp:1805-1852``)
"""
from __future__ import annotations

import dataclasses
import math
import os
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from sph_tpu.core import params as P
from sph_tpu.core import state as S
from sph_tpu.core.params import FluidParams, SimConfig
from sph_tpu.engine import step as E
from sph_tpu.io import presets as pio
from sph_tpu.scene import art_presets as AP
from sph_tpu.scene import reaction as R
from sph_tpu.scene.sequencer import Sequencer
from sph_tpu.scene.settings import (SceneSettings, apply_preset,
                                    gather_preset, needs_respawn,
                                    to_viz_params)
from sph_tpu.viz.camera import OrbitCamera, fit_camera

MAX_SUBSTEPS_PER_FRAME = 16          # Scene0p.h:48
MAX_SUBSTEPS_SLOW_FRAME = 8          # Scene0p.cpp:1323 (dt > 33 ms)
STENCIL_CAPACITY = 4096


def params_from_settings(s: SceneSettings) -> FluidParams:
    """SceneSettings -> traced FluidParams (mass re-derived from h)."""
    return FluidParams.default(
        h=s.h, rest_density=s.rest_density, gas_constant=s.gas_constant,
        viscosity=s.viscosity, gravity=[0.0, s.gravity_y, 0.0],
        surface_tension=s.surface_tension, dt=s.time_step,
        foam_gen=s.foam_gen, foam_vel_ref=s.foam_vel_ref,
        box_center=s.box_center, box_half=s.box_half,
        box_euler_deg=s.box_euler, shape_type=s.shape_type,
        shape_aux=(s.shape_aux if any(s.shape_aux) else (5.0, 0.35, 2.5)),
        wall_restitution=s.wall_restitution, wall_friction=s.wall_friction,
        fountain_offset=s.fountain_pos, fountain_radius=s.fountain_radius,
        fountain_spread=s.fountain_spread, fountain_jet_speed=s.fountain_jet,
        fountain_drain_level=s.fountain_drain_level,
        fountain_drain_per_sec=s.fountain_drain_rate,
    ).derive_mass()


class Scene:
    def __init__(self, settings: Optional[SceneSettings] = None,
                 neighbor_impl: str = "binned", seed: int = 0,
                 preset_dir: str = "presets"):
        self.settings = settings or SceneSettings()
        self.neighbor_impl = neighbor_impl
        self.seed = seed
        self.preset_dir = preset_dir
        self.phases = R.ReactionPhases()
        self.live = R.LiveValues()
        self.sequencer = Sequencer(preset_dir=preset_dir)
        self.camera: OrbitCamera = fit_camera(self.settings.box_half)
        self.stencil_targets: Optional[np.ndarray] = None
        self.dt_accumulator = 0.0
        self.sim_time = 0.0
        self.pending_reset = False

        self.state: Optional[S.ParticleState] = None
        self.params: Optional[FluidParams] = None
        self.config: Optional[SimConfig] = None
        self.buffers: Optional[E.SceneBuffers] = None
        self.respawn()

    # --- lifecycle -----------------------------------------------------

    def respawn(self) -> None:
        """Full reset: spawn from settings (ResetSimulation analogue)."""
        s = self.settings
        spawn = S.spawn_standard(
            s.particle_count, h=s.h, rest_density=s.rest_density,
            box_center=tuple(s.box_center), box_half=tuple(s.box_half),
            shape_type=s.shape_type, shape_aux=tuple(s.shape_aux)
            if any(s.shape_aux) else (5.0, 0.35, 2.5),
            mix_pattern=s.mix_pattern, use_jitter=s.use_jitter,
            jitter_amp=s.jitter_amp, seed=self.seed)
        self.state = S.state_from_spawn(spawn)
        self.params = params_from_settings(s)
        dims = P.compute_grid_dims(
            s.shape_type, np.asarray(s.box_half, np.float32),
            np.asarray(s.box_euler, np.float32), s.h)
        self.config = SimConfig(
            n=self.state.n, grid_dims=dims,
            neighbor_impl=self.neighbor_impl,
            fountain_mode=s.fountain_on,
            stencil_capacity=(STENCIL_CAPACITY
                              if self.stencil_targets is not None else 0))
        self.buffers = E.SceneBuffers.create(self.config)
        if self.stencil_targets is not None:
            self._upload_stencil()
        self.dt_accumulator = 0.0
        self.pending_reset = False

    def _sync_params(self) -> None:
        """Push live-tunable settings into the traced params (no respawn,
        no recompile — everything traced)."""
        self.params = params_from_settings(self.settings).replace(
            gravity=self.params.gravity)   # reaction may have tipped it

    def apply_settings(self, new: SceneSettings) -> None:
        if needs_respawn(self.settings, new):
            self.settings = new
            self.respawn()
        else:
            self.settings = new
            self._sync_params()

    def apply_art_preset(self, which: int) -> None:
        self.settings = AP.apply_art_preset(self.settings, which)
        self.respawn()

    def surprise_me(self, seed: Optional[int] = None) -> None:
        self.settings = AP.surprise_me(self.settings, seed)
        self.respawn()

    # --- frame update --------------------------------------------------

    def update(self, frame_dt: float,
               bands: Tuple[float, float, float] = (0.0, 0.0, 0.0),
               max_substeps: Optional[int] = None) -> int:
        """One frame: sequencer -> impulses -> substep loop.  Returns the
        number of substeps run."""
        s = self.settings

        if self.sequencer.enabled:
            new = self.sequencer.tick(s, self.sim_time)
            if new is not s:
                self.settings = s = new
                self._sync_params()

        if self.pending_reset:
            self.respawn()
            s = self.settings

        state = self.state
        params = self.params

        state, self.phases = R.drive_continuous_wave(
            state, s, self.phases, frame_dt)

        if s.audio_enabled:
            bass, mid, treble = bands
        else:
            bass = mid = treble = 0.0
        state, params, self.phases, self.live = R.drive_audio_reaction(
            state, params, s, self.phases, bass, mid, treble, frame_dt,
            stencil_targets=self.stencil_targets)
        params = params.replace(
            fountain_jet_speed=jnp.float32(self.live.fountain_jet))

        if max_substeps is None:
            max_substeps = (MAX_SUBSTEPS_SLOW_FRAME if frame_dt > 0.033
                            else MAX_SUBSTEPS_PER_FRAME)
        n_sub, self.dt_accumulator = E.substeps_for_frame(
            frame_dt, s.time_step, max_substeps, self.dt_accumulator)
        if n_sub > 0:
            state, self.buffers = E.run_substeps(
                state, params, self.buffers,
                jnp.float32(s.time_step), n_sub, self.config)

        # auto-orbit camera (Scene0p.cpp:560-591)
        if s.orbit_on:
            self.camera.yaw_deg += self.live.orbit_speed_deg * frame_dt

        self.state = state
        self.params = params
        self.sim_time += frame_dt
        return n_sub

    # --- rendering -----------------------------------------------------

    def render(self, width: int = 960, height: int = 540) -> np.ndarray:
        from sph_tpu.viz.splat import render_frame
        vp = to_viz_params(
            self.settings, anim_time=self.phases.anim_time,
            hue_shift_live=self.live.hue_shift_deg,
            bright_mul_live=self.live.bright_mul)
        cam = dataclasses.replace(
            self.camera,
            distance=self.camera.distance * self.live.cam_dist_scale)
        radius = 0.5 * self.settings.h * self.live.radius_scale
        return render_frame(self.state, vp, cam, width=width, height=height,
                            particle_radius=radius,
                            background=tuple(self.settings.bg_color))

    # --- presets -------------------------------------------------------

    def save_preset(self, name: str) -> bool:
        os.makedirs(self.preset_dir, exist_ok=True)
        path = os.path.join(self.preset_dir,
                            f"{pio.sanitize_name(name)}.txt")
        return pio.save_file(path, gather_preset(self.settings))

    def load_preset(self, name: str, structural: bool = True) -> bool:
        path = os.path.join(self.preset_dir,
                            f"{pio.sanitize_name(name)}.txt")
        kv = pio.load_file(path)
        if kv is None:
            return False
        new = apply_preset(self.settings, kv, structural=structural)
        if structural:
            self.settings = new
            self.respawn()
        else:
            self.apply_settings(new)
        return True

    # --- checkpointing (new capability, SURVEY.md §5.4) ---------------

    def save_checkpoint(self, path: str) -> None:
        st = self.state
        np.savez_compressed(
            path,
            pos=np.asarray(st.pos), vel=np.asarray(st.vel),
            acc=np.asarray(st.acc), density=np.asarray(st.density),
            pressure=np.asarray(st.pressure), foam=np.asarray(st.foam),
            ghost=np.asarray(st.ghost), active=np.asarray(st.active),
            face=np.asarray(st.face),
            color_group=np.asarray(st.color_group),
            valid=np.asarray(st.valid), orig_id=np.asarray(st.orig_id),
            settings_kv=pio.serialize(gather_preset(self.settings)),
            phases=np.asarray([getattr(self.phases, f.name) for f in
                               dataclasses.fields(self.phases)]),
            sim_time=self.sim_time,
            dt_accumulator=self.dt_accumulator)

    def load_checkpoint(self, path: str) -> None:
        z = np.load(path, allow_pickle=False)
        kv = pio.parse(str(z["settings_kv"]))
        self.settings = apply_preset(self.settings, kv, structural=True)
        self.respawn()   # rebuild params/config/buffers at the right n
        self.state = S.ParticleState(
            pos=jnp.asarray(z["pos"]), vel=jnp.asarray(z["vel"]),
            acc=jnp.asarray(z["acc"]), density=jnp.asarray(z["density"]),
            pressure=jnp.asarray(z["pressure"]),
            foam=jnp.asarray(z["foam"]), ghost=jnp.asarray(z["ghost"]),
            active=jnp.asarray(z["active"]), face=jnp.asarray(z["face"]),
            color_group=jnp.asarray(z["color_group"]),
            valid=jnp.asarray(z["valid"]),
            orig_id=jnp.asarray(z["orig_id"]))
        for f, v in zip(dataclasses.fields(self.phases), z["phases"]):
            setattr(self.phases, f.name, float(v))
        self.sim_time = float(z["sim_time"])
        self.dt_accumulator = float(z["dt_accumulator"])

    # --- liquid logo ---------------------------------------------------

    def load_stencil_png(self, path: str,
                         brightness_threshold: float = 0.5) -> int:
        """PNG bright pixels -> 3D attractor targets in the container's
        XY plane (``Scene0p.cpp:1805-1852``).  Returns target count."""
        from PIL import Image
        img = np.asarray(
            Image.open(path).convert("L"), np.float32) / 255.0
        hpx, wpx = img.shape
        ys, xs = np.nonzero(img > brightness_threshold)
        if len(xs) == 0:
            self.stencil_targets = None
            return 0
        # subsample to capacity, preserve aspect, center at container
        if len(xs) > STENCIL_CAPACITY:
            sel = np.random.default_rng(0).choice(
                len(xs), STENCIL_CAPACITY, replace=False)
            xs, ys = xs[sel], ys[sel]
        scale = self.settings.logo_scale / max(hpx, 1)
        cx = np.asarray(self.settings.box_center, np.float32)
        tx = (xs - wpx * 0.5) * scale + cx[0]
        ty = (hpx * 0.5 - ys) * scale + cx[1]
        tz = np.zeros_like(tx) + cx[2]
        self.stencil_targets = np.stack([tx, ty, tz], -1).astype(np.float32)
        self.settings.logo_path = path
        self.config = dataclasses.replace(
            self.config, stencil_capacity=STENCIL_CAPACITY)
        self.buffers = E.SceneBuffers.create(self.config)
        self._upload_stencil()
        return len(tx)

    def _upload_stencil(self) -> None:
        t = np.zeros((STENCIL_CAPACITY, 3), np.float32)
        n = min(len(self.stencil_targets), STENCIL_CAPACITY)
        t[:n] = self.stencil_targets[:n]
        self.buffers = self.buffers.replace(
            stencil_targets=jnp.asarray(t),
            stencil_count=jnp.int32(n))
