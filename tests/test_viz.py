"""Viz tests: palette math, color drives, HSV grade, headless splat."""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from sph_tpu.viz import palettes as P
from sph_tpu.viz.camera import OrbitCamera, fit_camera
from sph_tpu.viz.splat import render_frame


def _t():
    return jnp.linspace(0.0, 1.0, 64)


@pytest.mark.parametrize("pid", range(P.NUM_PALETTES))
def test_all_palettes_finite(pid):
    vp = P.VizParams(palette_id=pid, anim_time=1.5)
    t = _t()
    n = t.shape[0]
    wp = jnp.stack([t * 4 - 2, t * 8 - 4, jnp.zeros(n)], -1)
    facing = jnp.full(n, 0.7)
    c = P.apply_palette(vp, pid, t, facing, wp)
    assert c.shape == (n, 3)
    assert bool(jnp.all(jnp.isfinite(c)))
    # palettes are colorful: not all-constant across t
    assert float(jnp.std(c)) > 1e-3


def test_hsv_roundtrip():
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(0.05, 0.95, (128, 3)), jnp.float32)
    back = P.hsv2rgb(P.rgb2hsv(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)


def test_turbo_endpoints():
    c = P.turbo(jnp.asarray([0.0, 0.6]))
    # t=0 dark blue; t=0.6 red-dominant (quadratic turbo fit,
    # particleImpostor.frag:122-127 — goes negative at t=1, clamped later)
    assert c[0, 2] > c[0, 0]
    assert c[1, 0] > c[1, 2]


def test_drives():
    n = 8
    pos = np.zeros((n, 3), np.float32)
    pos[:, 1] = np.linspace(-7, 7, n)
    vel = np.zeros((n, 3), np.float32)
    vel[:, 0] = np.linspace(0, 10, n)
    vpos = np.zeros((n, 3), np.float32)
    vpos[:, 2] = -np.linspace(1, 10, n)
    pres = np.linspace(0, 10, n).astype(np.float32)
    rho = np.linspace(0, 10, n).astype(np.float32)

    for drive in range(7):
        vp = P.VizParams(color_drive=drive, viz_min=0.0, viz_max=10.0)
        t = np.asarray(P.compute_drive(vp, jnp.asarray(pos),
                                       jnp.asarray(vpos), jnp.asarray(vel),
                                       jnp.asarray(pres), jnp.asarray(rho)))
        assert t.shape == (n,)
        assert (t >= 0).all() and (t <= 1).all()
        if drive in (P.DRIVE_HEIGHT, P.DRIVE_SPEED, P.DRIVE_PRESSURE,
                     P.DRIVE_DENSITY, P.DRIVE_VIEW_DEPTH):
            assert t[-1] > t[0]        # monotone in the driven quantity


def test_velocity_dir_drive_angle():
    vp = P.VizParams(color_drive=P.DRIVE_VELOCITY_DIR)
    vel = np.array([[1, 0, 0], [-1, 0, 0], [0, 0, 1], [0, 0, 0]], np.float32)
    z = np.zeros((4, 3), np.float32)
    t = np.asarray(P.compute_drive(vp, z, z, jnp.asarray(vel),
                                   np.zeros(4, np.float32),
                                   np.zeros(4, np.float32)))
    assert abs(t[0] - 0.5) < 1e-5      # +x -> atan2=0 -> 0.5
    assert t[1] < 0.01 or t[1] > 0.99  # -x wraps to 0/1
    assert abs(t[2] - 0.75) < 1e-5     # +z -> pi/2 -> 0.75
    assert t[3] == 0.0                 # zero velocity -> 0


def test_color_adjust_invert_and_hue():
    c = jnp.asarray([[0.8, 0.2, 0.2]])
    vp = P.VizParams(invert_color=True)
    out = np.asarray(P.apply_color_adjust(vp, c))
    np.testing.assert_allclose(out, [[0.2, 0.8, 0.8]], atol=1e-5)

    vp = P.VizParams(hue_shift=120.0)   # red -> green
    out = np.asarray(P.apply_color_adjust(vp, c))
    assert out[0, 1] > out[0, 0] and out[0, 1] > out[0, 2]


def test_two_color_groups():
    n = 4
    vp = P.VizParams(palette_id=8, palette_id2=3,
                     duo_color_a=(0, 0, 1), duo_color_b=(0, 0, 1))
    pos = np.zeros((n, 3), np.float32)
    group = np.array([0, 1, 0, 1])
    cols = np.asarray(P.particle_colors(
        vp, jnp.asarray(pos), jnp.asarray(pos), jnp.asarray(pos),
        jnp.zeros(n), jnp.zeros(n), jnp.asarray(group)))
    # group 0 -> duotone blue; group 1 -> fire palette (red-dominant)
    assert cols[0, 2] > cols[0, 0]
    assert cols[1, 0] >= cols[1, 2]


def test_camera_projection_center():
    cam = OrbitCamera(yaw_deg=0.0, pitch_deg=0.0, distance=10.0)
    view = cam.view_matrix()
    target_view = view[:3, :3] @ cam.target + view[:3, 3]
    np.testing.assert_allclose(target_view, [0, 0, -10], atol=1e-5)
    eye_view = view[:3, :3] @ cam.eye() + view[:3, 3]
    np.testing.assert_allclose(eye_view, [0, 0, 0], atol=1e-5)


def test_render_frame_smoke(dam_break_small):
    state, params, dims = dam_break_small
    vp = P.VizParams(palette_id=1, color_drive=P.DRIVE_SPEED)
    cam = fit_camera(np.asarray([7.0, 7.0, 7.0]))
    img = render_frame(state, vp, cam, width=160, height=90)
    assert img.shape == (90, 160, 3)
    assert img.dtype == np.uint8
    # particles visible: image differs from pure background
    bg = np.array([0.03, 0.04, 0.06]) * 255
    diff = np.abs(img.astype(np.float32) - bg).sum(-1)
    assert (diff > 30).sum() > 50


def test_render_ghosts_hidden(dam_break_small):
    state, params, dims = dam_break_small
    ghost_state = dataclasses.replace(
        state, ghost=jnp.ones_like(state.ghost))
    vp = P.VizParams()
    cam = fit_camera(np.asarray([7.0, 7.0, 7.0]))
    img = render_frame(ghost_state, vp, cam, width=64, height=36)
    bg = (np.array([0.03, 0.04, 0.06]) * 255).astype(np.uint8)
    assert (img == bg[None, None, :]).all()


def _tiny_scene():
    from sph_tpu.core import state as S
    spawn = S.spawn_standard(512, h=0.28, box_half=(4.0, 4.0, 4.0), seed=3)
    st = S.state_from_spawn(spawn)
    vp = P.VizParams(palette_id=2, color_drive=P.DRIVE_SPEED,
                     lit_sphere=True)
    cam = fit_camera(np.asarray([4.0, 4.0, 4.0]))
    return st, vp, cam


def test_native_splat_matches_numpy(monkeypatch):
    """The C++ rasterizer and the numpy fallback agree (the native path
    is painter-exact across offsets, so allow a small differing-pixel
    fraction at particle overlaps)."""
    from sph_tpu import native
    from sph_tpu.viz import splat as SP
    if native.load("splat_raster") is None:
        import pytest
        pytest.skip("no native toolchain")
    st, vp, cam = _tiny_scene()
    a = SP.render_frame(st, vp, cam, width=160, height=120)
    monkeypatch.setattr(SP, "_native_lib", lambda: None)
    b = SP.render_frame(st, vp, cam, width=160, height=120)
    diff = (np.abs(a.astype(int) - b.astype(int)) > 2).any(axis=-1)
    assert diff.mean() < 0.02


def test_native_ssfr_splat_matches_numpy(monkeypatch):
    from sph_tpu import native
    from sph_tpu.viz import ssfr as SS
    lib = native.load("splat_raster")
    if lib is None:
        import pytest
        pytest.skip("no native toolchain")
    st, vp, cam = _tiny_scene()
    view = cam.view_matrix()
    proj = cam.proj_matrix(160 / 120)
    d1, t1, f1 = SS.splat_depth_thickness(
        st.pos, st.foam, view, proj, 160, 120, 0.2)
    monkeypatch.setattr(native, "load", lambda name: None)
    d2, t2, f2 = SS.splat_depth_thickness(
        st.pos, st.foam, view, proj, 160, 120, 0.2)
    # depth assignment differs only where splats overlap
    assert (np.abs(d1 - d2) > 1e-4).mean() < 0.02
    np.testing.assert_allclose(t1, t2, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(f1, f2, rtol=1e-4, atol=1e-4)
