"""Screen-space fluid rendering (SSFR) — the reference's 5-pass water
surface (``shaders/fluidDepth.*``, ``depthSmooth.frag``,
``fluidThickness.frag``, ``skyGradient.frag``, ``fluidComposite.frag``;
pass plumbing ``Scene0p.cpp:2708-2940``) rebuilt as headless image math.

Pass structure:

1. **splat** (host numpy): per-pixel nearest view-Z via painter-sorted
   assignment, additive Gaussian thickness + foam (numpy ``bincount`` —
   the rasterizer stand-in; off the device hot path by design).
2. **smooth** (jnp, jittable): separable narrow-range bilateral depth
   filter (Truong-style): world-size kernel projected to pixels, samples
   nearer than ``center + band`` skipped, farther samples clamped into
   the band (``depthSmooth.frag:19-45``), ping-pong N iterations.
3. **sky** (jnp): procedural horizon/zenith gradient + sun glow
   (``skyGradient.frag``) for the background and reflections.
4. **composite** (jnp): view-pos reconstruction, min-|dz| depth-aware
   normals, Schlick Fresnel, Blinn-Phong sun specular, refraction UV
   offset, Beer-Lambert absorption, sky reflection, foam whitening,
   ACES tonemap + gamma + HSV grade (``fluidComposite.frag:60-174``).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sph_tpu.viz import palettes as P
from sph_tpu.viz.camera import OrbitCamera

MAX_HALF_K = 32


@dataclasses.dataclass(frozen=True)
class WaterParams:
    """SSFR look parameters (``Scene0p.h:295-312`` defaults)."""
    smooth_iterations: int = 5
    world_filter_scale: float = 6.0
    surface_merge: float = 3.0
    thickness_strength: float = 0.05
    thickness_falloff: float = 4.0
    radius_scale: float = 1.3
    extinction: Tuple[float, float, float] = (0.45, 0.15, 0.05)
    thickness_scale: float = 1.0
    sun_dir: Tuple[float, float, float] = (0.4, 1.0, 0.5)
    sun_color: Tuple[float, float, float] = (1.0, 0.97, 0.9)
    deep_color: Tuple[float, float, float] = (0.02, 0.08, 0.25)
    specular_power: float = 256.0
    specular_strength: float = 0.8
    refraction_strength: float = 0.04
    fresnel_bias: float = 0.02
    env_reflect: Tuple[float, float, float] = (0.90, 0.95, 1.00)
    sky_horizon: Tuple[float, float, float] = (0.40, 0.55, 0.65)
    sky_zenith: Tuple[float, float, float] = (0.15, 0.28, 0.50)
    foam_amount: float = 1.5
    exposure: float = 1.0
    sky_on: bool = False
    bg_color: Tuple[float, float, float] = (0.0, 0.0, 0.0)


def splat_depth_thickness(pos, foam, view, proj, width, height,
                          particle_radius, mask=None):
    """Pass 1 (host): -> (depth [H,W] view-z, thickness [H,W],
    foam [H,W]).  depth == 0 means background (the reference's clear
    value, ``fluidDepth.frag``)."""
    pos = np.asarray(pos, np.float32)
    foam = np.asarray(foam, np.float32)
    vp = pos @ np.asarray(view[:3, :3]).T + np.asarray(view[:3, 3])
    w = -vp[:, 2]
    ok = w > 1e-6
    if mask is not None:
        ok &= np.asarray(mask)
    clip_x = vp[:, 0] * proj[0, 0]
    clip_y = vp[:, 1] * proj[1, 1]
    sw = np.maximum(w, 1e-6)
    px = (clip_x / sw * 0.5 + 0.5) * width
    py = (1.0 - (clip_y / sw * 0.5 + 0.5)) * height
    ok &= (px >= 0) & (px < width) & (py >= 0) & (py < height)

    idx = np.nonzero(ok)[0]
    depth = np.zeros(height * width, np.float32)
    thick = np.zeros(height * width, np.float32)
    foam_img = np.zeros(height * width, np.float32)
    if len(idx) == 0:
        return (depth.reshape(height, width),
                thick.reshape(height, width),
                foam_img.reshape(height, width))

    # splat radius in pixels (particleImpostor.vert:38-40)
    rad_px = np.clip(particle_radius * proj[1, 1] / sw[idx] * height * 0.5,
                     0.6, 6.0)
    cx = px[idx]
    cy = py[idx]
    vz = vp[idx, 2]
    fo = foam[idx]

    # painter order: far first so near depth wins the final assignment
    order = np.argsort(vz, kind="stable")        # vz negative: most negative
    cx, cy, vz, fo, rad_px = (a[order] for a in (cx, cy, vz, fo, rad_px))

    from sph_tpu import native
    lib = native.load("splat_raster")
    if lib is not None:
        import ctypes
        fp = ctypes.POINTER(ctypes.c_float)

        def ptr(a):
            return np.ascontiguousarray(a, np.float32).ctypes.data_as(fp)

        lib.ssfr_splat(
            ctypes.c_int(len(cx)), ptr(cx), ptr(cy), ptr(vz),
            ptr(rad_px), ptr(fo), ctypes.c_float(float(particle_radius)),
            ctypes.c_int(width), ctypes.c_int(height),
            depth.ctypes.data_as(fp), thick.ctypes.data_as(fp),
            foam_img.ctypes.data_as(fp))
        return (depth.reshape(height, width),
                thick.reshape(height, width),
                foam_img.reshape(height, width))

    r = 3
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            d2 = dx * dx + dy * dy
            sel = d2 <= rad_px * rad_px
            if not sel.any():
                continue
            x = (cx[sel] + dx).astype(np.int32)
            y = (cy[sel] + dy).astype(np.int32)
            inb = (x >= 0) & (x < width) & (y >= 0) & (y < height)
            if not inb.any():
                continue
            flat = y[inb] * width + x[inb]
            # sphere surface depth: front of the particle sphere
            rr = np.sqrt(np.maximum(
                1.0 - d2 / np.maximum(rad_px[sel][inb] ** 2, 0.36), 0.0))
            depth[flat] = vz[sel][inb] + particle_radius * rr
            # additive Gaussian blobs (fluidThickness.frag:19-23)
            g = np.exp(-d2 / np.maximum(
                0.5 * rad_px[sel][inb] ** 2, 0.18)).astype(np.float32)
            tsum = np.bincount(flat, weights=g, minlength=height * width)
            thick += tsum.astype(np.float32)
            fsum = np.bincount(flat, weights=g * fo[sel][inb],
                               minlength=height * width)
            foam_img += fsum.astype(np.float32)
    return (depth.reshape(height, width), thick.reshape(height, width),
            foam_img.reshape(height, width))


@functools.partial(jax.jit, static_argnums=(1, 4))
def smooth_depth(depth, iterations: int, particle_radius, proj_scale_y,
                 wp: WaterParams):
    """Pass 2: separable narrow-range bilateral filter, `iterations`
    ping-pong rounds of horizontal+vertical (depthSmooth.frag)."""
    band = wp.surface_merge * particle_radius

    def one_dir(d, axis):
        center = d
        px_radius = (wp.world_filter_scale * particle_radius
                     * proj_scale_y / jnp.maximum(0.001, -center))
        half_kf = jnp.clip(px_radius, 1.0, float(MAX_HALF_K))
        sigma = jnp.maximum(1.0, half_kf * 0.4)
        near_bound = center + band
        far_bound = center - band

        ssum = jnp.zeros_like(d)
        wsum = jnp.zeros_like(d)
        for i in range(-MAX_HALF_K, MAX_HALF_K + 1):
            s = jnp.roll(d, -i, axis=axis)
            valid = ((s != 0.0) & (s <= near_bound)
                     & (jnp.abs(float(i)) <= half_kf))
            sc = jnp.maximum(s, far_bound)
            ws = jnp.where(valid,
                           jnp.exp(-float(i * i) / (2.0 * sigma * sigma)),
                           0.0)
            ssum = ssum + sc * ws
            wsum = wsum + ws
        out = jnp.where(wsum > 1e-6, ssum / jnp.maximum(wsum, 1e-6),
                        center)
        return jnp.where(center == 0.0, 0.0, out)

    for _ in range(max(iterations, 0)):
        depth = one_dir(depth, axis=1)
        depth = one_dir(depth, axis=0)
    return depth


def sky_gradient(dirs, wp: WaterParams):
    """Procedural sky along world-space directions [..., 3]
    (skyGradient.frag)."""
    horizon = jnp.asarray(wp.sky_horizon, jnp.float32)
    zenith = jnp.asarray(wp.sky_zenith, jnp.float32)
    sun = jnp.asarray(wp.sun_dir, jnp.float32)
    sun = sun / jnp.linalg.norm(sun)
    t = jnp.clip(dirs[..., 1] * 0.5 + 0.5, 0.0, 1.0) ** 0.7
    col = horizon + (zenith - horizon) * t[..., None]
    s = jnp.maximum(jnp.einsum("...c,c->...", dirs, sun), 0.0)
    return col + jnp.asarray(wp.sun_color) * (s ** 128.0 * 0.8)[..., None]


def render_background(width, height, view, proj, wp: WaterParams):
    """Sky background (or flat bg color) in LINEAR space [H,W,3]."""
    if not wp.sky_on:
        return jnp.broadcast_to(jnp.asarray(wp.bg_color, jnp.float32),
                                (height, width, 3))
    u = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    v = 1.0 - (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    ndc_x = u * 2.0 - 1.0
    ndc_y = v * 2.0 - 1.0
    ray = jnp.stack([
        jnp.broadcast_to(ndc_x[None, :], (height, width)) / proj[0, 0],
        jnp.broadcast_to(ndc_y[:, None], (height, width)) / proj[1, 1],
        -jnp.ones((height, width), jnp.float32)], axis=-1)
    world = ray @ jnp.asarray(view[:3, :3], jnp.float32)   # R^T @ ray
    world = world / jnp.linalg.norm(world, axis=-1, keepdims=True)
    return sky_gradient(world, wp)


def _aces(x):
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def finish_color(c, wp: WaterParams, vp: Optional[P.VizParams] = None):
    """HDR -> display: exposure, ACES, gamma, HSV grade
    (fluidComposite.frag:69-80)."""
    c = _aces(c * wp.exposure) ** (1.0 / 2.2)
    if vp is not None:
        c = P.apply_color_adjust(vp, c)
    return c


@functools.partial(jax.jit, static_argnums=(5, 8, 9))
def composite(depth, thick, foam_img, background, view, shape_hw,
              proj00, proj11, wp: WaterParams,
              vp: Optional[P.VizParams] = None):
    """Pass 5: the full surface shade (fluidComposite.frag:60-174).
    Returns LINEAR-graded display RGB [H,W,3] in [0,1]."""
    height, width = shape_hw
    u = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    v = 1.0 - (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    uu = jnp.broadcast_to(u[None, :], (height, width))
    vv = jnp.broadcast_to(v[:, None], (height, width))

    def view_pos(uuu, vvv, vz):
        ndc_x = uuu * 2.0 - 1.0
        ndc_y = vvv * 2.0 - 1.0
        return jnp.stack([ndc_x / proj00 * (-vz), ndc_y / proj11 * (-vz),
                          vz], axis=-1)

    vz = depth
    pos = view_pos(uu, vv, vz)

    # min-|dz| depth-aware normals (fluidComposite.frag:109-131)
    def shifted(dx_, dy_):
        return jnp.roll(jnp.roll(depth, -dy_, axis=0), -dx_, axis=1)

    px_u = 1.0 / width
    px_v = 1.0 / height
    vz_r = shifted(1, 0)
    vz_l = shifted(-1, 0)
    vz_u = shifted(0, -1)
    vz_d = shifted(0, 1)

    d_xf = view_pos(uu + px_u, vv, vz_r) - pos
    d_xb = pos - view_pos(uu - px_u, vv, vz_l)
    use_b_x = (vz_l != 0.0) & ((vz_r == 0.0)
                               | (jnp.abs(d_xb[..., 2])
                                  < jnp.abs(d_xf[..., 2])))
    d_x = jnp.where(use_b_x[..., None], d_xb,
                    jnp.where((vz_r != 0.0)[..., None], d_xf, 0.0))

    d_yf = view_pos(uu, vv + px_v, vz_u) - pos
    d_yb = pos - view_pos(uu, vv - px_v, vz_d)
    use_b_y = (vz_d != 0.0) & ((vz_u == 0.0)
                               | (jnp.abs(d_yb[..., 2])
                                  < jnp.abs(d_yf[..., 2])))
    d_y = jnp.where(use_b_y[..., None], d_yb,
                    jnp.where((vz_u != 0.0)[..., None], d_yf, 0.0))

    n = jnp.cross(d_x, d_y)
    nlen = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = jnp.where(nlen > 1e-5, n / jnp.maximum(nlen, 1e-9),
                  jnp.asarray([0.0, 0.0, 1.0]))
    n = jnp.where(n[..., 2:3] < 0.0, -n, n)

    vdir = -pos / jnp.maximum(
        jnp.linalg.norm(pos, axis=-1, keepdims=True), 1e-9)

    cos_n = jnp.maximum(0.0, jnp.einsum("hwc,hwc->hw", n, vdir))
    fres = wp.fresnel_bias + (1.0 - wp.fresnel_bias) \
        * (1.0 - cos_n) ** 5.0

    view3 = jnp.asarray(view[:3, :3], jnp.float32)
    sun_w = jnp.asarray(wp.sun_dir, jnp.float32)
    sun_w = sun_w / jnp.linalg.norm(sun_w)
    sun_v = view3 @ sun_w
    sun_v = sun_v / jnp.maximum(jnp.linalg.norm(sun_v), 1e-9)
    hvec = sun_v[None, None, :] + vdir
    hvec = hvec / jnp.maximum(
        jnp.linalg.norm(hvec, axis=-1, keepdims=True), 1e-9)
    spec = jnp.maximum(0.0, jnp.einsum("hwc,hwc->hw", n, hvec)) \
        ** wp.specular_power

    # refraction: background sampled at normal-offset UV (gather)
    ru = jnp.clip(uu + n[..., 0] * wp.refraction_strength, 0.001, 0.999)
    rv = jnp.clip(vv + n[..., 1] * wp.refraction_strength, 0.001, 0.999)
    xi = jnp.clip((ru * width).astype(jnp.int32), 0, width - 1)
    yi = jnp.clip(((1.0 - rv) * height).astype(jnp.int32), 0, height - 1)
    bg_sample = background[yi, xi]

    thick_s = jnp.maximum(0.0, thick * wp.thickness_scale
                          * wp.thickness_strength)
    transmit = jnp.exp(-jnp.asarray(wp.extinction) * thick_s[..., None])
    avg_t = jnp.clip(jnp.mean(transmit, axis=-1), 0.0, 1.0)
    deep = jnp.asarray(wp.deep_color, jnp.float32)
    transmitted = deep + (bg_sample * transmit - deep) * avg_t[..., None]

    # environment reflection along the world reflected ray
    refl_v = 2.0 * cos_n[..., None] * n - vdir
    refl_w = refl_v @ view3                     # R^T @ v
    env = sky_gradient(refl_w, wp) * jnp.asarray(wp.env_reflect)

    surface = transmitted + (env - transmitted) * fres[..., None]
    surface = surface + jnp.asarray(wp.sun_color) \
        * (spec * wp.specular_strength)[..., None]

    foam_f = jnp.clip(1.0 - jnp.exp(-foam_img * wp.foam_amount), 0.0, 1.0)
    surface = surface + (0.95 - surface) * foam_f[..., None]

    out = jnp.where((vz != 0.0)[..., None], surface, background)
    return finish_color(out, wp, vp)


def render_water(state, wp: WaterParams, cam: OrbitCamera,
                 width: int = 960, height: int = 540,
                 particle_radius: float = 0.18,
                 vp: Optional[P.VizParams] = None,
                 mask=None) -> np.ndarray:
    """Full SSFR path -> [H,W,3] uint8."""
    view = cam.view_matrix()
    proj = cam.proj_matrix(width / height)
    draw = (np.asarray(state.valid) > 0) & (np.asarray(state.ghost) == 0)
    if mask is not None:
        draw &= np.asarray(mask)
    r = particle_radius * wp.radius_scale
    depth, thick, foam_img = splat_depth_thickness(
        state.pos, state.foam, view, proj, width, height, r, mask=draw)
    proj_scale_y = float(proj[1, 1]) * height * 0.5
    sm = smooth_depth(jnp.asarray(depth), wp.smooth_iterations,
                      r, proj_scale_y, wp)
    bg = render_background(width, height, view, proj, wp)
    img = composite(sm, jnp.asarray(thick), jnp.asarray(foam_img), bg,
                    jnp.asarray(view), (height, width),
                    float(proj[0, 0]), float(proj[1, 1]), wp, vp)
    return (np.clip(np.asarray(img), 0.0, 1.0) * 255.0).astype(np.uint8)
