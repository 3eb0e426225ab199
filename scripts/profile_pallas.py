#!/usr/bin/env python
"""Per-stage profiler for the Pallas substep: sort / planes / density /
force / xsph / gather.  Each stage runs in its own jit with a lax.scan of
`reps` iterations (data dependency threaded), so tunnel round-trips
amortize.  Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/profile_pallas.py [config] [reps]
"""
from __future__ import annotations

import sys
import time

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax import lax

from sph_tpu.app import configs as AC
from sph_tpu.neighbors import planes as PL
from sph_tpu.neighbors import pallas_sweeps as K

cfg_name = sys.argv[1] if len(sys.argv) > 1 else "default_131k"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10

import dataclasses
cfg = AC.CONFIGS[cfg_name]
state, params, sim = AC.build(cfg, neighbor_impl="pallas")
if len(sys.argv) > 3:
    sim = dataclasses.replace(sim, plane_max_cwh=int(sys.argv[3]))
geom = PL.geom_for(sim)
print(f"config={cfg_name} n={state.n} dims={sim.grid_dims} "
      f"geom: nc={geom.n_chunks} cw={geom.cw} cwh={geom.cwh}",
      file=sys.stderr)

interp = jax.default_backend() not in ("tpu", "axon")
key = PL.compute_keys_ymajor(state.pos, state.valid, params, geom)
contrib = state.contrib_mask(params.ghost_face_active)
s = PL.sort_particles(state, key, contrib)
planes = PL.build_planes(s, params, geom)
pvec = K._make_pvec(params, params.dt)

rho_out = K.density_call(planes, pvec, geom, interp)
f_outs = K.force_call(planes, rho_out, pvec, geom, interp)


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf.reshape(-1)[:4])
    t0 = time.time()
    out = f(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf.reshape(-1)[:4])
    dt = (time.time() - t0) / reps * 1e3
    print(f"{name:24s} {dt:8.2f} ms/iter", flush=True)
    return dt


def scanned(body):
    def outer(x0, *args):
        def step(c, _):
            return body(c, *args), None
        out, _ = lax.scan(step, x0, None, length=reps)
        return out
    return outer


# --- sort: perturb pos slightly each iter so sort isn't cached ---
def sort_body(pos, p):
    st = state.replace(pos=pos)
    k2 = PL.compute_keys_ymajor(pos, st.valid, p, geom)
    srt = PL.sort_particles(st, k2, contrib)
    return srt.pos * 1.0000001

timed("keys+sort", scanned(sort_body), state.pos, params)


def planes_body(pos, p, method="butterfly"):
    srt = s._replace(pos=pos)
    pl_ = PL.build_planes(srt, p, geom, method=method)
    return pos + pl_.px[0, 0, 0, :3].sum() * 1e-20

timed("build_planes(bfly)", scanned(planes_body), s.pos, params)
timed("build_planes(mxu)",
      scanned(lambda pos, p: planes_body(pos, p, "mxu")), s.pos, params)


def density_body(pv, pl_):
    r = K.density_call(pl_, pv, geom, interp)
    return pv + r[0, 0, 0, 0] * 1e-20

timed("density_kernel", scanned(density_body), pvec, planes)


def force_body(pv, pl_, rc):
    outs = K.force_call(pl_, rc, pv, geom, interp)
    return pv + outs[0][0, 0, 0, 0] * 1e-20

timed("force_kernel", scanned(force_body), pvec, planes, rho_out)


def xsph_body(pv, pl_, rc, np_, nv_):
    xs = K.xsph_call(pl_, rc, np_, nv_, pv, geom, interp)
    return pv + xs[0][0, 0, 0, 0] * 1e-20

timed("xsph_kernel", scanned(xsph_body), pvec, planes, rho_out,
      tuple(f_outs[0:3]), tuple(f_outs[3:6]))


def gather_body(x, fo, rc, s_):
    # NOTE: fo/rc/s_ must be ARGS — closing over them embeds ~1 GB of
    # array constants in the compile request (HTTP 413 over the tunnel).
    stacked = jnp.stack([fo[0] + x * 1e-20, *fo[1:9],
                         rc, fo[0], fo[1], fo[2], rc], axis=0)
    per = stacked.reshape(14, -1).T[PL.out_flat_index(s_, geom)]
    return (per[:, 0] * 1e-20).sum() + x * 1.0000001

timed("output_gather(rows)", scanned(gather_body), jnp.float32(1.0),
      tuple(f_outs), rho_out, s)


def gather_axis1_body(x, fo, rc, s_):
    stacked = jnp.stack([fo[0] + x * 1e-20, *fo[1:9],
                         rc, fo[0], fo[1], fo[2], rc], axis=0)
    flat = stacked.reshape(14, -1)
    per = flat[:, PL.out_flat_index(s_, geom)]       # [14, N]
    return (per[0] * 1e-20).sum() + x * 1.0000001

timed("output_gather(axis1)", scanned(gather_axis1_body), jnp.float32(1.0),
      tuple(f_outs), rho_out, s)


# (measured failures, do not re-try: a lane-major [..,CW,K] transpose of
# the stacked table OOMs at compile — XLA materializes the K-minor copy
# f32[14,ny,nc,CW,K]{T(8,128)} at 16x tile padding = 18.6 GB (PERF.md
# finding 8); the transposed MXU one-hot gather below runs 67.8 ms at 1M
# vs the 46.5 ms row gather — one-hot matmul work per window is ~170x
# the useful data in either orientation.)


def gather_mxu_body(x, fo, rc, pidx_c, starts):
    from sph_tpu.neighbors import mxu_permute as MX
    stacked = jnp.stack([fo[0] + x * 1e-20, *fo[1:9],
                         rc, fo[0], fo[1], fo[2], rc, pidx_c], axis=0)
    per = MX.gather_call(stacked, starts, geom, s.key.shape[0],
                         lanes_per_block=128, max_p=512, interpret=interp)
    return (per[:, 0] * 1e-20).sum() + x * 1.0000001

from sph_tpu.neighbors import mxu_permute as _MX
_, _, _starts, _ovf = _MX.gather_window_ids(s.key, s.rank, geom, 128, 512)
print(f"gather windows overflow: {bool(_ovf)}", file=sys.stderr)
timed("output_gather(mxu)", scanned(gather_mxu_body), jnp.float32(1.0),
      tuple(f_outs), rho_out, PL.center_from_chunks(planes.pidx, geom),
      _starts)


def full_body(pos, p):
    st = state.replace(pos=pos)
    out = K.substep(st, p, p.dt, sim)
    return out.pos

timed("FULL substep", scanned(full_body), state.pos, params)
