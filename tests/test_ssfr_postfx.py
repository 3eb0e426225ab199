"""SSFR water renderer + post-FX chain tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from sph_tpu.viz import postfx as PF
from sph_tpu.viz.camera import OrbitCamera, fit_camera
from sph_tpu.viz.ssfr import (WaterParams, composite, render_background,
                              render_water, smooth_depth,
                              splat_depth_thickness)


def test_render_water_smoke(dam_break_small):
    state, params, dims = dam_break_small
    wp = WaterParams(sky_on=False, bg_color=(0.0, 0.0, 0.0))
    cam = fit_camera([7.0, 7.0, 7.0])
    img = render_water(state, wp, cam, width=160, height=90)
    assert img.shape == (90, 160, 3)
    # water visible on black background
    assert (img.sum(-1) > 30).sum() > 100


def test_splat_depth_nearest_wins():
    """Two particles on the same pixel: the nearer one's depth wins."""
    pos = np.array([[0, 0, 0], [0, 0, 5.0]], np.float32)  # second nearer
    cam = OrbitCamera(yaw_deg=0, pitch_deg=0, distance=20.0)
    view = cam.view_matrix()
    proj = cam.proj_matrix(1.0)
    depth, thick, foam = splat_depth_thickness(
        pos, np.zeros(2, np.float32), view, proj, 64, 64, 0.3)
    center = depth[32, 32]
    assert center != 0.0
    # nearer particle is at view z = -15; farther at -20
    assert center > -16.5
    # thickness accumulates BOTH particles
    assert thick[32, 32] > thick[40, 40]


def test_smooth_depth_preserves_background_and_merges():
    d = np.zeros((32, 32), np.float32)
    d[10:20, 10:20] = -10.0
    d[14, 14] = -10.4          # a dent within the merge band
    out = np.asarray(smooth_depth(jnp.asarray(d), 2, 0.2, 200.0,
                                  WaterParams()))
    assert (out[d == 0.0] == 0.0).all()          # background untouched
    assert abs(out[14, 14] - d[14, 14]) < 0.4    # dent pulled toward -10
    assert out[15, 15] != 0.0


def test_smooth_depth_keeps_silhouette():
    """A much nearer blob must not bleed into a far surface."""
    d = np.zeros((32, 32), np.float32)
    d[:, :16] = -30.0      # far sheet
    d[:, 16:] = -5.0       # near sheet (out of band: band ~ merge*r)
    out = np.asarray(smooth_depth(jnp.asarray(d), 1, 0.2, 200.0,
                                  WaterParams()))
    assert abs(out[16, 8] - (-30.0)) < 1.0
    assert abs(out[16, 24] - (-5.0)) < 1.0


def test_background_sky_gradient():
    cam = OrbitCamera(yaw_deg=0, pitch_deg=0, distance=10)
    wp = WaterParams(sky_on=True)
    bg = np.asarray(render_background(64, 64, cam.view_matrix(),
                                      cam.proj_matrix(1.0), wp))
    # zenith (top rows) bluer/darker than horizon per defaults
    assert bg[0].mean() != bg[-1].mean()
    assert np.isfinite(bg).all()


def test_composite_background_passthrough():
    wp = WaterParams(bg_color=(0.2, 0.0, 0.0))
    cam = OrbitCamera()
    view = jnp.asarray(cam.view_matrix())
    z = jnp.zeros((16, 16))
    bg = jnp.broadcast_to(jnp.asarray([0.2, 0.0, 0.0]), (16, 16, 3))
    out = np.asarray(composite(z, z, z, bg, view, (16, 16),
                               1.0, 1.0, wp))
    # no fluid anywhere: output = finishColor(bg) everywhere (red-ish)
    assert (out[..., 0] > out[..., 2]).all()
    assert np.allclose(out, out[0, 0], atol=1e-5)


# --- post fx ---


def _img():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 0.4, (64, 96, 3)).astype(np.float32)
    img[30:34, 40:44] = 1.0      # a bright spot
    return jnp.asarray(img)


def test_post_chain_neutral_is_identity():
    img = _img()
    out, st = PF.run_post_chain(img, PF.PostParams(), PF.PostState(), 1 / 30)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)
    assert st.post_time == pytest.approx(1 / 30)


def test_bloom_spreads_brights():
    img = _img()
    pp = PF.PostParams(bloom_strength=1.0, bloom_threshold=0.6)
    out, _ = PF.run_post_chain(img, pp, PF.PostState(), 1 / 30)
    out = np.asarray(out)
    # neighborhood of the bright spot gains energy
    assert out[28, 38].sum() > np.asarray(img)[28, 38].sum() + 0.01


def test_trails_decay():
    img = _img()
    pp = PF.PostParams(trail_half_life=0.5)
    st = PF.PostState()
    out1, st = PF.run_post_chain(img, pp, st, 1 / 30)
    dark = jnp.zeros_like(img)
    out2, st = PF.run_post_chain(dark, pp, st, 1 / 30)
    out3, st = PF.run_post_chain(dark, pp, st, 1 / 30)
    # the bright spot persists but decays
    a = np.asarray(out2)[31, 41].sum()
    b = np.asarray(out3)[31, 41].sum()
    assert a > 0.1
    assert b < a


def test_vignette_darkens_corners():
    img = jnp.full((64, 64, 3), 0.5)
    pp = PF.PostParams(vignette=1.0)
    out, _ = PF.run_post_chain(img, pp, PF.PostState(), 1 / 30)
    out = np.asarray(out)
    assert out[0, 0].mean() < out[32, 32].mean() - 0.05


def test_grain_deterministic():
    img = jnp.full((32, 32, 3), 0.5)
    pp = PF.PostParams(grain=0.2)
    a, _ = PF.run_post_chain(img, pp, PF.PostState(post_time=1.0), 1 / 30)
    b, _ = PF.run_post_chain(img, pp, PF.PostState(post_time=1.0), 1 / 30)
    c, _ = PF.run_post_chain(img, pp, PF.PostState(post_time=2.3), 1 / 30)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))
    assert float(jnp.std(a)) > 0.01


def test_kaleido_symmetry():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
    pp = PF.PostParams(kaleido_segments=4)
    out, _ = PF.run_post_chain(img, pp, PF.PostState(), 1 / 30)
    out = np.asarray(out)
    # mirror-fold: reflecting across the horizontal center axis is ~equal
    flipped = out[::-1, :]
    assert np.abs(out - flipped).mean() < 0.02


def test_chromatic_splits_channels():
    img = jnp.zeros((64, 64, 3)).at[:, 40:44, :].set(1.0)
    pp = PF.PostParams(chromatic=5.0)
    out, _ = PF.run_post_chain(img, pp, PF.PostState(), 1 / 30)
    out = np.asarray(out)
    # channels shifted apart near the edge stripe
    r_edge = out[32, :, 0].argmax()
    b_edge = out[32, :, 2].argmax()
    assert r_edge != b_edge


def test_dof_blurs_out_of_focus():
    img = jnp.zeros((64, 64, 3)).at[30:34, 30:34, :].set(1.0)
    z = jnp.full((64, 64), 50.0)          # far from focus (22)
    pp = PF.PostParams(aperture=30.0, focus_dist=22.0)
    out = np.asarray(PF.depth_of_field(img, z, pp))
    # energy spreads: center dims, neighbors gain
    assert out[32, 32, 0] < 1.0
    assert out[32, 40, 0] > 0.0


def test_post_params_from_settings():
    from sph_tpu.scene.settings import SceneSettings
    s = SceneSettings()
    s.bloom_strength = 0.7
    s.kaleido_segments = 6
    s.kaleido_angle = 90.0
    pp = PF.post_params_from_settings(s)
    assert pp.bloom_strength == 0.7
    assert pp.kaleido_segments == 6
    assert pp.kaleido_angle == pytest.approx(np.pi / 2)
