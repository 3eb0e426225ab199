#!/usr/bin/env python
"""Per-stage profiler for the Pallas substep: sort / fluid tables /
ghost tables (per-frame, not per-substep) / density / force+xsph /
gather.  Each stage runs in its own jit with a lax.scan of `reps`
iterations (data dependency threaded), so tunnel round-trips amortize.
Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/profile_pallas.py [config] [reps]
"""
from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable without PYTHONPATH
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
fluid_mask = (state.valid > 0) & (state.ghost == 0)
key = PL.compute_keys_ymajor(state.pos, fluid_mask, params, geom)
contrib = state.contrib_mask(params.ghost_face_active)
s = PL.sort_particles(state, key, contrib)
ft = PL.build_fluid_tables(s, params, geom)
aux = K.build_aux(state, params, sim)
gt = aux if isinstance(aux, PL.GhostTables) else None
occ_rows = ft.occ_rows if gt is None else (
    ft.occ_rows | (gt.occ << PL.GOCC_SHIFT))
pvec = K._make_pvec(params, params.dt)

rho_a, rho_b = K.density_call(ft, occ_rows, gt, pvec, geom, interp)
out_a, out_b, _ = K.force_xsph_call(ft, occ_rows, rho_a, rho_b, gt,
                                    pvec, geom, interp)


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
    k2 = PL.compute_keys_ymajor(pos, fluid_mask, p, geom)
    srt = PL.sort_particles(st, k2, contrib)
    return srt.pos * 1.0000001

timed("keys+sort", scanned(sort_body), state.pos, params)


def tables_body(pos, p, method="butterfly"):
    srt = s._replace(pos=pos)
    t = PL.build_fluid_tables(srt, p, geom, method=method)
    return pos + t.tbl_a[0, 1, 0, 0, :3].sum() * 1e-20

timed("fluid_tables(bfly)", scanned(tables_body), s.pos, params)
timed("fluid_tables(mxu)",
      scanned(lambda pos, p: tables_body(pos, p, "mxu")), s.pos, params)


def ghost_body(pos, p):
    st = state.replace(pos=pos)
    t = PL.build_ghost_tables(st, p, geom)
    return pos + t.tbl_a[0, 1, 0, 0, :3].sum() * 1e-20

timed("ghost_tables(frame)", scanned(ghost_body), state.pos, params)


def density_body(pv, t, g, occ):
    ra, rb = K.density_call(t, occ, g, pv, geom, interp)
    return pv + (ra[0, 0, 0, 0] + rb[0, 0, 0, 0]) * 1e-20

timed("density_kernel", scanned(density_body), pvec, ft, gt, occ_rows)


def force_body(pv, t, g, occ, ra, rb):
    oa, ob, _ = K.force_xsph_call(t, occ, ra, rb, g, pv, geom, interp)
    return pv + (oa[0, 0, 0, 0, 0] + ob[0, 0, 0, 0, 0]) * 1e-20

timed("force+xsph_kernel", scanned(force_body), pvec, ft, gt, occ_rows,
      rho_a, rho_b)

# --- compact-grid sweep variants (PERF.md roofline fix #2) ---
ma = K._max_active(geom, sim)
if ma:
    qc_l, n_act = K.active_block_list(occ_rows, geom, ma)
    print(f"active blocks: {int(np.asarray(n_act))}/"
          f"{geom.nyq * geom.n_chunks} (cap {ma})", file=sys.stderr)

    def density_compact(pv, t, g, occ, qc):
        ra, rb = K.density_call(t, occ, g, pv, geom, interp,
                                qc=qc, n_prog=ma)
        return pv + (ra[0, 0, 0, 0] + rb[0, 0, 0, 0]) * 1e-20

    timed("density_kernel(cmpct)", scanned(density_compact), pvec, ft,
          gt, occ_rows, qc_l)

    def force_compact(pv, t, g, occ, ra, rb, qc):
        oa, ob, _ = K.force_xsph_call(t, occ, ra, rb, g, pv, geom,
                                      interp, qc=qc, n_prog=ma)
        return pv + (oa[0, 0, 0, 0, 0] + ob[0, 0, 0, 0, 0]) * 1e-20

    timed("force+xsph(cmpct)", scanned(force_compact), pvec, ft, gt,
          occ_rows, rho_a, rho_b, qc_l)


def gather_body(x, oa, ob, ra, rb, s_):
    # NOTE: these must be ARGS — closing over them embeds ~1 GB of
    # array constants in the compile request (HTTP 413 over the tunnel).
    sa = jnp.concatenate([oa + x * 1e-20, ra[None]], axis=0).reshape(10, -1)
    sb = jnp.concatenate([ob, rb[None]], axis=0).reshape(10, -1)
    per = jnp.concatenate([sa, sb], axis=1).T[PL.out_flat_index(s_, geom)]
    return (per[:, 0] * 1e-20).sum() + x * 1.0000001

timed("output_gather(rows)", scanned(gather_body), jnp.float32(1.0),
      out_a, out_b, rho_a, rho_b, s)


def gather_cols_body(x, oa, ob, ra, rb, s_):
    # per-field two-gather + select: no concat / no [T,10] transpose
    # materialization (the rows variant copies ~1.7 GB of table before
    # gathering 44 MB of payload)
    idx = PL.out_flat_index(s_, geom)
    t = geom.nyq * geom.n_chunks * geom.s_slots * geom.cw
    ia = jnp.minimum(idx, t - 1)
    ib = jnp.maximum(idx - t, 0)
    sel = idx < t
    cols = []
    for f in range(10):
        fa = (oa[f] if f < 9 else ra).reshape(-1)
        fb = (ob[f] if f < 9 else rb).reshape(-1)
        cols.append(jnp.where(sel, fa[ia], fb[ib]))
    per = jnp.stack(cols, axis=1)
    return (per[:, 0] * 1e-20).sum() + x * 1.0000001

timed("output_gather(cols)", scanned(gather_cols_body), jnp.float32(1.0),
      out_a, out_b, rho_a, rho_b, s)

# --- row-emit variant (PERF.md roofline fix #4): force+xsph with the
# in-kernel particle-row emit + the monotone reorder replacing the
# table row gather ---
if getattr(sim, "emit_rows", True):
    from sph_tpu.neighbors import mxu_permute as MX
    tile_e = int(getattr(sim, "emit_tile", 64))
    pc_e = PL.padded_cell_index(s.key, geom)
    key_pe = jnp.where(s.key < geom.num_cells, pc_e, geom.padded_cells)
    win_e, slot_e, wst_e, wdst_e = MX.emit_window_ids(key_pe, s.rank,
                                                      geom, tile_e)
    n_emit = s.key.shape[0] + tile_e * (wst_e.shape[0] - 1)
    erows = MX.emit_rows_build(slot_e, tile_e)

    def force_emit(pv, t, g, occ, ra, rb, er, ws, wd):
        oa, ob, em = K.force_xsph_call(
            t, occ, ra, rb, g, pv, geom, interp,
            emit=(er, ws, wd, n_emit, tile_e))
        return pv + (oa[0, 0, 0, 0, 0] + em[0, 0]) * 1e-20

    timed("force+xsph(emit)", scanned(force_emit), pvec, ft, gt,
          occ_rows, rho_a, rho_b, erows, wst_e, wdst_e)

    _, _, em_once = jax.jit(
        lambda t, occ, ra, rb, er, ws, wd: K.force_xsph_call(
            t, occ, ra, rb, gt, pvec, geom, interp,
            emit=(er, ws, wd, n_emit, tile_e))
    )(ft, occ_rows, rho_a, rho_b, erows, wst_e, wdst_e)

    def reorder_body(x, em, ws, wd, wn, s_):
        n_ = s_.key.shape[0]
        iota = jnp.arange(n_, dtype=jnp.int32)
        # thread the scan dependency through the (tiny) starts array,
        # not the 1 GB emit buffer
        ws = ws + (x * 1e-20).astype(jnp.int32)
        dst = jnp.clip(wd[wn] + (iota - ws[wn]), 0, n_emit - 1)
        per = em[dst, :10]
        return (per[:, 0] * 1e-20).sum() + x * 1.0000001

    timed("emit_reorder(mono)", scanned(reorder_body), jnp.float32(1.0),
          em_once, wst_e, wdst_e, win_e, s)


# --- exact-overflow fallback decomposition (round 4: ghost_1m pays
# ~40 ms/substep at 170 steady overflow — find out where) ---
movf = K._movf_bound(s.key.shape[0], sim)
if movf:
    m_ = PL.unpack_meta(s.meta)
    ofl_ = (m_.valid > 0) & (m_.ghost == 0) & ~ft.in_bin
    n_ovf = int(np.asarray(jnp.sum(ofl_.astype(jnp.int32))))
    print(f"overflow rows: {n_ovf} (movf {movf})", file=sys.stderr)

    def compact_body(x, ofl):
        ofl = ofl ^ (x.astype(jnp.int32) % 2 == 99)
        didx, dmask = K._overflow_compact(ofl, movf)
        return x * 1.0000001 + (didx[0] * 1e-20).astype(jnp.float32)

    timed("ovf_compact(sort)", scanned(compact_body), jnp.float32(1.0),
          ofl_)

    for B in (512, 4096):
        if B >= movf:
            break

        def nbr_body(x, s_, ofl, t, ra, rb, g, B=B):
            ra = ra + x * 1e-20
            out = K._overflow_nbr(s_, ofl, t, ra, rb, g, params,
                                  params.dt, geom, B, movf)
            return x * 1.0000001 + (out[2][0, 0] * 1e-20)

        timed(f"ovf_nbr(B={B})", scanned(nbr_body), jnp.float32(1.0),
              s, ofl_, ft, rho_a, rho_b, gt)

    def scatters_body(x, pos, vel, acc, rho, pres, foam, ofl):
        # real compacted (scattered) didx + all six outputs folded into
        # the carry — a didx=arange + outs[0]-only form let XLA DCE 5 of
        # the scatters and time a contiguous pattern production never
        # uses (ADVICE r4)
        ofl = ofl ^ (x.astype(jnp.int32) % 2 == 99)
        didx, dmask = K._overflow_compact(ofl, movf)
        z3 = jnp.zeros((movf, 3), jnp.float32) + x * 1e-20
        z1 = jnp.zeros((movf,), jnp.float32)

        def put(dst, src):
            sel = dmask[:, None] if src.ndim == 2 else dmask
            return dst.at[didx].set(jnp.where(sel, src, dst[didx]),
                                    unique_indices=True)

        outs = (put(pos, z3), put(vel, z3), put(acc, z3), put(rho, z1),
                put(pres, z1), put(foam, z1))
        return x * 1.0000001 + sum(
            o.reshape(-1)[0] * 1e-20 for o in outs)

    timed("ovf_put(6 scatters)", scanned(scatters_body),
          jnp.float32(1.0), s.pos, s.vel, s.pos, s.foam, s.foam, s.foam,
          ofl_)


def full_body(st, p, ax):
    # thread EVERY output field into the carry: a pos-only carry lets
    # XLA dead-code the density/pressure/foam/acc puts and parts of the
    # reassembly — the round-4 "FULL substep 201 ms" under-measured the
    # true substep by exactly the bench-vs-profiler gap it created
    out = K.substep(st, p, p.dt, sim, aux=ax)
    return st.replace(pos=out.pos, vel=out.vel, acc=out.acc,
                      density=out.density, pressure=out.pressure,
                      foam=out.foam)

timed("FULL substep", scanned(full_body), state, params, aux)
