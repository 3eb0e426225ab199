"""Headless terrain heightfield renderer — the reference's river terrain
mesh pass (R12: ``terrainVert/Frag.glsl``, mesh build
``Scene0p.cpp:2942-3123``) as painter-splat image math.

The heightfield upsamples (bilinear) to a dense point grid; each point
projects and splats back-to-front with the reference fragment shader's
height-blended colors (wet rock -> dry rock -> soil -> grass,
``terrainFrag.glsl:14-26``) and Lambertian shading from finite-difference
normals (``Scene0p.cpp:2988-2996``).  Drawn before the particle pass so
the fluid occludes the ground it flows over.
"""
from __future__ import annotations

import math

import numpy as np

# height-blend palette (terrainFrag.glsl:14-17)
_WET_ROCK = np.array([0.22, 0.19, 0.15], np.float32)
_DRY_ROCK = np.array([0.42, 0.37, 0.30], np.float32)
_SOIL = np.array([0.34, 0.28, 0.20], np.float32)
_GRASS = np.array([0.20, 0.36, 0.13], np.float32)


def terrain_colors(heights: np.ndarray, normals: np.ndarray,
                   sun_dir, sun_color) -> np.ndarray:
    """[M] heights + [M,3] normals -> [M,3] shaded colors
    (terrainFrag.glsl semantics)."""
    t = np.clip(heights * 0.18 + 0.35, 0.0, 1.0)
    c = np.empty((len(t), 3), np.float32)
    lo = t < 0.25
    mid = (t >= 0.25) & (t < 0.55)
    hi = t >= 0.55
    c[lo] = _WET_ROCK + (_DRY_ROCK - _WET_ROCK) * (t[lo, None] * 4.0)
    c[mid] = _DRY_ROCK + (_SOIL - _DRY_ROCK) * ((t[mid, None] - 0.25)
                                                / 0.30)
    c[hi] = _SOIL + (_GRASS - _SOIL) * ((t[hi, None] - 0.55) / 0.45)
    sd = np.asarray(sun_dir, np.float32)
    sd = sd / max(np.linalg.norm(sd), 1e-9)
    ndotl = np.maximum(0.15, normals @ sd)
    return np.clip(c * np.asarray(sun_color, np.float32)[None, :]
                   * ndotl[:, None], 0.0, 1.0)


def terrain_points(terrain: np.ndarray, box_center, box_half,
                   upsample: int = 3):
    """Heightfield -> (world positions [M,3], normals [M,3]) on a dense
    bilinear grid (upsample x the physics resolution)."""
    th, tw = terrain.shape
    c = np.asarray(box_center, np.float32)
    half = np.asarray(box_half, np.float32)
    rh, rw = th * upsample, tw * upsample

    u = np.linspace(0.0, tw - 1.0, rw, dtype=np.float32)
    v = np.linspace(0.0, th - 1.0, rh, dtype=np.float32)
    uu, vv = np.meshgrid(u, v)
    u0 = np.clip(uu.astype(np.int32), 0, tw - 2)
    v0 = np.clip(vv.astype(np.int32), 0, th - 2)
    fu = uu - u0
    fv = vv - v0
    h = (terrain[v0, u0] * (1 - fu) * (1 - fv)
         + terrain[v0, u0 + 1] * fu * (1 - fv)
         + terrain[v0 + 1, u0] * (1 - fu) * fv
         + terrain[v0 + 1, u0 + 1] * fu * fv)

    wx = c[0] - half[0] + (uu / (tw - 1)) * 2.0 * half[0]
    wz = c[2] - half[2] + (vv / (th - 1)) * 2.0 * half[2]

    dx = 2.0 * half[0] / (rw - 1)
    dz = 2.0 * half[2] / (rh - 1)
    gx = np.gradient(h, axis=1) / dx
    gz = np.gradient(h, axis=0) / dz
    n = np.stack([-gx, np.ones_like(h), -gz], -1)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)

    pos = np.stack([wx, h, wz], -1).reshape(-1, 3).astype(np.float32)
    return pos, n.reshape(-1, 3).astype(np.float32)


def draw_terrain(img: np.ndarray, terrain: np.ndarray, box_center,
                 box_half, view: np.ndarray, proj: np.ndarray,
                 sun_dir=(0.4, 1.0, 0.5), sun_color=(1.0, 0.97, 0.9),
                 upsample: int = 3, footprint: int | None = None
                 ) -> np.ndarray:
    """Splat the shaded heightfield into an [H,W,3] uint8 frame
    (painter order, far first).

    ``footprint=None`` (default) sizes the splat square from the
    projected grid spacing so the surface tiles hole-free at any
    camera distance — the point-splat analogue of the reference's
    continuous triangle mesh (``Scene0p.cpp:2942-3123``).
    """
    hpx, wpx = img.shape[:2]
    pos, normals = terrain_points(terrain, box_center, box_half, upsample)
    col = terrain_colors(pos[:, 1], normals, sun_dir, sun_color)

    vp = pos @ view[:3, :3].T + view[:3, 3]
    depth = -vp[:, 2]
    ok = depth > 1e-6
    clip_x = vp[:, 0] * proj[0, 0]
    clip_y = vp[:, 1] * proj[1, 1]
    sw = np.maximum(depth, 1e-6)
    px = (clip_x / sw * 0.5 + 0.5) * wpx
    py = (1.0 - (clip_y / sw * 0.5 + 0.5)) * hpx
    ok &= (px >= 0) & (px < wpx) & (py >= 0) & (py < hpx)
    idx = np.nonzero(ok)[0]
    if len(idx) == 0:
        return img
    order = np.argsort(-depth[idx], kind="stable")
    idx = idx[order]

    if footprint is None:
        # Actual projected spacing between adjacent grid points (99th
        # percentile tolerates cliff edges); cover it plus 1px overlap.
        rh, rw = terrain.shape[0] * upsample, terrain.shape[1] * upsample
        gx = px.reshape(rh, rw)
        gy = py.reshape(rh, rw)
        du = np.hypot(np.diff(gx, axis=1), np.diff(gy, axis=1))
        dv = np.hypot(np.diff(gx, axis=0), np.diff(gy, axis=0))
        spacing = float(np.percentile(np.concatenate(
            [du.ravel(), dv.ravel()]), 99.0))
        footprint = max(1, int(math.ceil(spacing)) + 1)

    out = img.astype(np.float32).reshape(-1, 3)
    x0 = px[idx].astype(np.int32)
    y0 = py[idx].astype(np.int32)
    c255 = col[idx] * 255.0
    r = int(footprint)
    lo = -(r // 2)
    for dy in range(lo, lo + r + 1):
        for dx in range(lo, lo + r + 1):
            x = np.clip(x0 + dx, 0, wpx - 1)
            y = np.clip(y0 + dy, 0, hpx - 1)
            out[y * wpx + x] = c255
    return np.clip(out.reshape(hpx, wpx, 3), 0.0, 255.0).astype(np.uint8)
