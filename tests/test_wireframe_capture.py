"""Wireframe overlay, render-path selection, and screenshot capture."""
import os

import numpy as np
import pytest

from sph_tpu.scene.scene import Scene
from sph_tpu.scene.settings import SceneSettings
from sph_tpu.viz import wireframe as WF
from sph_tpu.viz.camera import fit_camera


def _small_settings(**kw):
    s = SceneSettings()
    s.particle_count = 512
    s.box_half = [4.0, 4.0, 4.0]
    for k, v in kw.items():
        setattr(s, k, v)
    return s


@pytest.mark.parametrize("shape", list(range(10)))
def test_shape_polylines_all_shapes(shape):
    lines = WF.shape_polylines(shape, (4.0, 4.0, 4.0))
    assert len(lines) > 0
    pts = np.concatenate(lines)
    assert np.isfinite(pts).all()
    # every shape's wireframe stays within a generous bound of the
    # container (trefoil extends to ~3*scale)
    assert np.abs(pts).max() < 16.0


def test_container_wireframe_rotates():
    a = np.concatenate(WF.container_wireframe(0, (4, 2, 1), (0, 0, 0),
                                              (0, 0, 0)))
    b = np.concatenate(WF.container_wireframe(0, (4, 2, 1), (0, 0, 0),
                                              (0, 0, 45.0)))
    assert not np.allclose(a, b)
    # rotation preserves distances from center
    assert np.allclose(np.linalg.norm(a, axis=1).max(),
                       np.linalg.norm(b, axis=1).max(), rtol=1e-5)


def test_draw_polylines_marks_pixels():
    cam = fit_camera([4.0, 4.0, 4.0])
    img = np.zeros((120, 160, 3), np.uint8)
    lines = WF.container_wireframe(0, (4, 4, 4), (0, 0, 0), (0, 0, 0))
    out = WF.draw_polylines(img, lines, cam.view_matrix(),
                            cam.proj_matrix(160 / 120),
                            color=(1.0, 0.0, 0.0))
    assert out.shape == img.shape
    assert (out[..., 0] > 100).sum() > 50      # red line pixels landed
    assert (out[..., 1] > 100).sum() == 0


def test_river_bank_lines():
    from sph_tpu.scene.river import RiverSpec
    spec = RiverSpec.random(3)
    banks = WF.river_bank_lines(spec, (0, 0, 0), (7, 7, 7))
    assert len(banks) == 2
    for b in banks:
        assert b.shape == (64, 3)
        assert np.isfinite(b).all()
        # banks stay within the box footprint laterally
        assert np.abs(b[:, 2]).max() <= 7.0 + 1e-5


def test_render_mode_paths_differ():
    sc = Scene(settings=_small_settings(show_outline=False), seed=1)
    sc.update(1 / 60)
    sc.settings.render_mode = 1
    imp = sc.render(160, 120)
    sc.settings.render_mode = 0
    water = sc.render(160, 120)
    sc.settings.render_mode = 2
    mesh = sc.render(160, 120)
    for img in (imp, water, mesh):
        assert img.shape == (120, 160, 3) and img.dtype == np.uint8
    assert not np.array_equal(imp, water)


def test_render_outline_overlay_changes_frame():
    sc = Scene(settings=_small_settings(render_mode=1), seed=1)
    sc.settings.show_outline = False
    off = sc.render(160, 120)
    sc.settings.show_outline = True
    on = sc.render(160, 120)
    assert not np.array_equal(off, on)


def test_capture_writes_png(tmp_path):
    sc = Scene(settings=_small_settings(render_mode=1,
                                        show_outline=True), seed=1)
    p = str(tmp_path / "shot.png")
    w, h = sc.capture(p, size="window", width=96, height=64, supersample=2)
    assert (w, h) == (96, 64)
    assert os.path.exists(p) and os.path.getsize(p) > 100


def test_capture_post_active_disables_supersample():
    sc = Scene(settings=_small_settings(render_mode=1), seed=1)
    sc.settings.kaleido_segments = 6
    # supersample=None -> auto-select: warping FX active => 1
    import sph_tpu.scene.scene as scene_mod
    calls = {}
    orig = sc.render

    def spy(w, h, apply_post=True):
        calls["size"] = (w, h)
        return orig(w, h, apply_post=apply_post)

    sc.render = spy
    sc.capture(os.path.join(os.fspath(os.getcwd()), "/tmp/_cap_test.png"),
               size="window", width=64, height=48)
    assert calls["size"] == (64, 48)      # no 2x supersample


def test_logger_roundtrip(tmp_path):
    from sph_tpu.utils import log
    p = str(tmp_path / "log.txt")
    log.init(p, min_level=log.INFO)
    log.trace("hidden")
    log.info("hello")
    log.warning("warn")
    with pytest.raises(log.EngineFatalError):
        log.fatal("boom")
    log.init(None)
    text = open(p).read()
    assert "hello" in text and "warn" in text and "boom" in text
    assert "hidden" not in text


def test_dof_applies_with_scene_depth_in_impostor_mode():
    """DOF needs scene depth: active in impostor/mesh modes, skipped in
    water mode (Scene0p.cpp:2601-2603)."""
    sc = Scene(settings=_small_settings(render_mode=1,
                                        show_outline=False), seed=2)
    sc.update(1 / 60)
    base = sc.render(160, 120)
    sc.settings.lens_aperture = 3.0
    sc.settings.lens_focus_dist = 5.0
    dof = sc.render(160, 120)
    assert not np.array_equal(base, dof)


def test_render_depth_buffer():
    from sph_tpu.viz.splat import render_frame
    from sph_tpu.viz import palettes as P
    from sph_tpu.core import state as S
    spawn = S.spawn_standard(256, h=0.28, box_half=(4.0, 4.0, 4.0), seed=1)
    st = S.state_from_spawn(spawn)
    cam = fit_camera(np.asarray([4.0, 4.0, 4.0]))
    img, z = render_frame(st, P.VizParams(), cam, width=160, height=120,
                          return_depth=True)
    assert z.shape == (120, 160)
    covered = z > 0
    assert covered.sum() > 50                 # particles hit pixels
    assert np.isfinite(z[covered]).all()
    # depths are plausible view distances
    assert z[covered].min() > 1.0 and z[covered].max() < 200.0


def test_terrain_renderer():
    """R12 parity: heightfield colors, normals, and the splat pass."""
    from sph_tpu.viz import terrain as T
    from sph_tpu.viz.camera import fit_camera
    th = np.zeros((16, 16), np.float32)
    th[:, 8:] = 2.0                                 # a step in x
    pos, nrm = T.terrain_points(th, (0, 0, 0), (5, 5, 5), upsample=2)
    assert np.isfinite(pos).all() and np.isfinite(nrm).all()
    assert np.allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-5)
    # flat regions have straight-up normals; the step has tilted ones
    flat = np.abs(pos[:, 0]) > 3.0
    assert np.abs(nrm[flat][:, 1] - 1.0).max() < 1e-4
    cam = fit_camera([5.0, 5.0, 5.0])
    img = np.zeros((90, 160, 3), np.uint8)
    out = T.draw_terrain(img, th, (0, 0, 0), (5, 5, 5),
                         cam.view_matrix(), cam.proj_matrix(160 / 90))
    lit = out.sum(-1) > 0
    assert lit.sum() > 100                          # terrain visible
    # hole-free: within each row's lit span, coverage is dense (the
    # projected outline is a parallelogram, so bbox fill would under-count)
    span = lit_in_span = 0
    for row in lit:
        xs = np.nonzero(row)[0]
        if len(xs):
            span += xs.max() - xs.min() + 1
            lit_in_span += len(xs)
    assert lit_in_span / span > 0.93


def test_river_scene_renders_terrain():
    sc = Scene(settings=_small_settings(render_mode=1, particle_count=256,
                                        show_outline=False), seed=6)
    sc.settings.bg_color = [0.0, 0.0, 0.0]
    no_river = sc.render(160, 90)
    sc.enable_river(6)
    sc.update(1 / 60)
    with_river = sc.render(160, 90)
    # the terrain pass fills far more pixels than bare particles
    assert (with_river.sum(-1) > 0).mean() > (no_river.sum(-1) > 0).mean()
