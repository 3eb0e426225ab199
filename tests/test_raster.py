"""Triangle rasterizer + mesh assets (terrain mesh R12 backbone and the
instanced OBJ mesh path, Mesh.cpp:20-54 / defaultVert.glsl:30-35)."""
import numpy as np
import pytest

from sph_tpu.viz import raster as R


def test_triangle_fill_and_ztest():
    img = np.zeros((64, 64, 3), np.float32)
    z = np.full((64, 64), np.inf, np.float32)
    px = np.array([4, 60, 32, 4, 60, 32], np.float32)
    py = np.array([4, 4, 60, 4, 4, 60], np.float32)
    # second triangle is identical but NEARER and green
    d = np.array([10, 10, 10, 5, 5, 5], np.float32)
    col = np.array([[1, 0, 0]] * 3 + [[0, 1, 0]] * 3, np.float32)
    R.rasterize(img, z, px, py, d,
                col, np.array([[0, 1, 2], [3, 4, 5]], np.int32))
    filled = img.sum(-1) > 0
    assert filled.sum() > 600
    # near triangle wins everywhere it covers
    assert img[10, 32, 1] == pytest.approx(255.0)
    assert img[10, 32, 0] == 0.0
    assert np.isclose(z[10, 32], 5.0)


def test_numpy_fallback_matches_native():
    rng = np.random.RandomState(0)
    v = 12
    px = rng.rand(v).astype(np.float32) * 48
    py = rng.rand(v).astype(np.float32) * 48
    d = (rng.rand(v).astype(np.float32) * 5 + 1)
    col = rng.rand(v, 3).astype(np.float32)
    tris = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8], [9, 10, 11]],
                    np.int32)
    img_a = np.zeros((48, 48, 3), np.float32)
    z_a = np.full((48, 48), np.inf, np.float32)
    R.rasterize(img_a, z_a, px, py, d, col, tris)
    img_b = np.zeros((48, 48, 3), np.float32)
    z_b = np.full((48, 48), np.inf, np.float32)
    R._rasterize_numpy(img_b, z_b, px, py, d, col, tris)
    from sph_tpu import native
    if native.load("tri_raster") is None:
        pytest.skip("no native toolchain")
    np.testing.assert_allclose(img_a, img_b, atol=2e-2)
    fin = np.isfinite(z_a) | np.isfinite(z_b)
    np.testing.assert_allclose(np.where(np.isfinite(z_a), z_a, 0)[fin],
                               np.where(np.isfinite(z_b), z_b, 0)[fin],
                               atol=1e-3)


def test_perspective_correct_depth_interpolation():
    img = np.zeros((32, 32, 3), np.float32)
    z = np.full((32, 32), np.inf, np.float32)
    px = np.array([0, 31, 0], np.float32)
    py = np.array([16, 16, 17], np.float32)
    d = np.array([2.0, 8.0, 2.0], np.float32)
    col = np.ones((3, 3), np.float32)
    R.rasterize(img, z, px, py, d, col, np.array([[0, 1, 2]], np.int32))
    row = z[16]
    fin = np.isfinite(row)
    # 1/z is linear across the scanline, so midscreen z < arithmetic mean
    mid = row[fin][len(row[fin]) // 2]
    assert 2.0 < mid < 5.0


def test_load_obj_and_fan_triangulation(tmp_path):
    obj = tmp_path / "quad.obj"
    obj.write_text(
        "# comment\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f 1/1/1 2/2/2 3/3/3 4/4/4\n")
    verts, tris = R.load_obj(str(obj))
    assert verts.shape == (4, 3)
    # quad fan-triangulates into 2 triangles sharing vertex 0
    np.testing.assert_array_equal(tris, [[0, 1, 2], [0, 2, 3]])


def test_icosphere_is_unit_and_closed():
    v, t = R.icosphere(1)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-6)
    assert len(t) == 80
    # closed 2-manifold: every edge appears exactly twice
    edges = {}
    for a, b, c in t:
        for e in ((a, b), (b, c), (c, a)):
            k = (min(e), max(e))
            edges[k] = edges.get(k, 0) + 1
    assert all(n == 2 for n in edges.values())


def test_draw_mesh_instances_renders_and_occludes():
    from sph_tpu.viz.camera import fit_camera
    cam = fit_camera(np.array([2.0, 2.0, 2.0], np.float32))
    img = np.zeros((96, 128, 3), np.float32)
    z = np.full((96, 128), np.inf, np.float32)
    centers = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, -1.5]], np.float32)
    cols = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
    R.draw_mesh_instances(img, z, centers, 0.9, cols,
                          cam.view_matrix(),
                          cam.proj_matrix(128 / 96))
    filled = img.sum(-1) > 0
    assert filled.sum() > 50
    # the front (red) sphere must occlude the center of the back one
    h, w = np.nonzero(filled)
    cy, cx = int(np.mean(h)), int(np.mean(w))
    assert img[cy, cx, 0] > img[cy, cx, 1]


def test_render_frame_mesh_smoke():
    from sph_tpu.core import state as S
    from sph_tpu.viz import palettes as P
    from sph_tpu.viz.camera import fit_camera
    from sph_tpu.viz.splat import render_frame_mesh

    spawn = S.spawn_standard(256, h=0.3, box_half=(2.5, 2.5, 2.5))
    state = S.state_from_spawn(spawn)
    vp = P.VizParams(palette_id=1, color_drive=P.DRIVE_HEIGHT,
                     height_min=-2.5, height_max=2.5)
    cam = fit_camera(np.array([2.5, 2.5, 2.5], np.float32))
    img, depth = render_frame_mesh(state, vp, cam, width=160, height=96,
                                   particle_radius=0.15,
                                   return_depth=True)
    assert img.shape == (96, 160, 3)
    assert (img.sum(-1) > 0).sum() > 100
    assert (depth > 0).sum() > 100
