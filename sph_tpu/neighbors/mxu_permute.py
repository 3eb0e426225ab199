"""MXU one-hot permutation kernels — scatter/gather as matmuls.

XLA's row scatter/gather serialize at ~40 ns/row on TPU (50+45 ms per
substep at 1M particles just MOVING data between particle order and the
cell-slot tables).  But both movements are *permutations with holes*,
and a permutation is a matmul: for a window of table slots S and the
contiguous run of sorted particles P that lands in it,

    table_block[S, F]  = onehot[S, P] @ particle_rows[P, F]   (expand)
    particle_rows[P,F] = onehot[P, S] @ table_block[S, F]     (gather)

where ``onehot[p, s] = (slot_of[p] == s)``.  Sorted particle order makes
each window's particles a CONTIGUOUS run (windows follow cell-key
order), so the kernels stream fixed-size particle tiles with dynamic-
offset DMAs and the one-hot build is a single broadcasted-iota compare.
The matmuls run on the MXU at ``precision=HIGHEST`` — every output
element is 1.0 * value + zeros, and the 3-term bf16 expansion of an f32
is exact, so the permutation is bit-exact.

Window capacity ``max_p`` is a static bound; if any window holds more
particles, callers ``lax.cond`` into their slow-but-general path (same
contract as the butterfly expand's overflow fallback).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sph_tpu.neighbors.planes import PlaneGeom

_HIGH = lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# expand: sorted particle rows -> padded-cell slot table
# ---------------------------------------------------------------------------

def expand_windows(geom: PlaneGeom, cells_per_block: int = 128
                   ) -> Tuple[int, int, int]:
    """(n_windows_per_row, n_windows, S_blk) over the PADDED cell space;
    windows tile each padded y-row's cps = nzp*nxp cells."""
    cps = geom.nzp * geom.nxp
    nsc = -(-cps // cells_per_block)
    return nsc, geom.nyp * nsc, cells_per_block * geom.cap


def expand_window_ids(key_p: jax.Array, rank: jax.Array, geom: PlaneGeom,
                      cells_per_block: int, max_p: int
                      ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per sorted particle: (window id, slot-in-window, starts[NW+1],
    overflow flag).  Slot numbering is RANK-MAJOR (slot = rank*cpb +
    cell_in_block) so a window's [S_blk] column unfolds directly to the
    plane block's [K, cpb]."""
    cpb = cells_per_block
    nsc, nw, s_blk = expand_windows(geom, cpb)
    cps = geom.nzp * geom.nxp
    yp = key_p // cps
    cir = key_p - yp * cps                      # cell in row
    chunk = jnp.minimum(cir // cpb, nsc - 1)
    win = jnp.where(key_p >= geom.padded_cells, nw,
                    yp * nsc + chunk)
    in_slot = jnp.where(
        (rank < geom.cap) & (win < nw),
        rank * cpb + (cir - chunk * cpb),
        s_blk)                                   # out of range -> dropped
    counts = jnp.zeros((nw + 1,), jnp.int32).at[win].add(1, mode="drop")
    starts = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(counts[:nw], dtype=jnp.int32)])
    overflow = jnp.max(counts[:nw]) > max_p
    return win, in_slot, starts, overflow


def _expand_kernel(s_blk: int, max_p: int, f: int, cap: int, cpb: int,
                   starts_ref, hole_ref, rows_hbm, out_ref,
                   scratch, sem):
    w = pl.program_id(0)
    st = starts_ref[w]
    cnt = starts_ref[w + 1] - st
    cp = pltpu.make_async_copy(rows_hbm.at[pl.ds(st, max_p)], scratch, sem)
    cp.start()
    cp.wait()
    tile = scratch[...]                              # [max_p, 128]
    vals = tile[:, :f]
    slots = tile[:, f].astype(jnp.int32)
    p_ok = lax.broadcasted_iota(jnp.int32, (max_p, 1), 0) < cnt
    # (select in f32, then cast: a bf16-valued select on this mask shape
    # trips a Mosaic i1 relayout bug)
    oh = jnp.where(
        p_ok & (slots[:, None]
                == lax.broadcasted_iota(jnp.int32, (max_p, s_blk), 1)),
        1.0, 0.0).astype(jnp.bfloat16)               # [max_p, s_blk]
    # blk[f, s] = sum_p vals[p, f] * oh[p, s]  (contraction over p).
    # Exact permutation in 3 bf16 passes instead of precision=HIGHEST's
    # 6: the one-hot is exactly 0/1 in bf16 and the 3-term bf16
    # expansion of an f32 is exact, so sum_i (1.0 * v_i) == v bit-exact.
    v1 = vals.astype(jnp.bfloat16)
    r1 = vals - v1.astype(jnp.float32)
    v2 = r1.astype(jnp.bfloat16)
    v3 = (r1 - v2.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((0,), (0,)), ((), ()))

    def bf16dot(v):
        return lax.dot_general(v, oh, dn,
                               preferred_element_type=jnp.float32)

    blk = bf16dot(v1) + bf16dot(v2) + bf16dot(v3)    # [f, s_blk]
    # each slot holds at most one particle -> max == sum, exact in bf16
    filled = jnp.max(oh, axis=0)[None, :].astype(jnp.float32)
    blk = blk + hole_ref[...] * (1.0 - filled)
    out_ref[...] = blk.reshape(f, 1, cap, cpb)


def expand_call(packed: jax.Array, in_slot: jax.Array, starts: jax.Array,
                geom: PlaneGeom, hole_fill: jax.Array,
                cells_per_block: int = 128, max_p: int = 512,
                interpret: bool = False) -> jax.Array:
    """[N, F] sorted rows -> [F, nyp, K, nsc*cpb] slot planes.

    The trailing lane dim covers nsc*cpb >= cps padded cells; callers
    slice [..., :nzx-equivalent] as needed.  Valid only when no window
    overflowed max_p (see ``expand_window_ids``)."""
    n, f = packed.shape
    cpb = cells_per_block
    nsc, nw, s_blk = expand_windows(geom, cpb)

    # minor dim padded to a full 128-lane tile: Mosaic requires sliced
    # HBM DMAs to span whole tiles
    rows = jnp.zeros((n + max_p, 128), jnp.float32)
    rows = rows.at[:n, :f].set(packed)
    rows = rows.at[:, f].set(jnp.concatenate(
        [in_slot.astype(jnp.float32),
         jnp.full((max_p,), float(s_blk), jnp.float32)]))

    hole = jnp.broadcast_to(hole_fill[:, None], (f, s_blk)).astype(
        jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nw,),
        in_specs=[
            pl.BlockSpec((f, s_blk), lambda w, st: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (f, 1, geom.cap, cpb),
            lambda w, st: (0, w // nsc, 0, w % nsc),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((max_p, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ])
    return pl.pallas_call(
        functools.partial(_expand_kernel, s_blk, max_p, f, geom.cap, cpb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (f, geom.nyp, geom.cap, nsc * cpb), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(starts, hole, rows)


# ---------------------------------------------------------------------------
# gather: kernel-output slot tables -> sorted particle rows
# ---------------------------------------------------------------------------

def gather_windows(geom: PlaneGeom, lanes_per_block: int = 128
                   ) -> Tuple[int, int, int]:
    """(slices per chunk, n_windows, S_blk) over the INTERIOR kernel-
    output layout [ny, nc, K, CW]."""
    nsl = -(-geom.cw // lanes_per_block)
    return nsl, geom.ny * geom.n_chunks * nsl, lanes_per_block * geom.cap


def gather_window_ids(key: jax.Array, rank: jax.Array, geom: PlaneGeom,
                      lanes_per_block: int, max_p: int
                      ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per sorted particle (interior key): window id + slot-in-window over
    the kernel-output layout; plus starts and the overflow flag."""
    lpb = lanes_per_block
    nsl, nw, s_blk = gather_windows(geom, lpb)
    x = key % geom.nx
    z = (key // geom.nx) % geom.nz
    y = key // (geom.nx * geom.nz)
    lane = (z + 1) * geom.nxp + (x + 1)
    c = jnp.minimum(lane // geom.cw, geom.n_chunks - 1)
    li = lane - c * geom.cw
    sl = jnp.minimum(li // lpb, nsl - 1)
    win = jnp.where(key >= geom.num_cells, nw,
                    (y * geom.n_chunks + c) * nsl + sl)
    in_slot = jnp.where(
        (rank < geom.cap) & (win < nw),
        rank * lpb + (li - sl * lpb),
        s_blk)
    counts = jnp.zeros((nw + 1,), jnp.int32).at[win].add(1, mode="drop")
    starts = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(counts[:nw], dtype=jnp.int32)])
    overflow = jnp.max(counts[:nw]) > max_p
    return win, in_slot, starts, overflow


def _gather_kernel(s_blk: int, max_p: int, f: int, cap: int, lpb: int,
                   starts_ref, blk_ref, out_hbm,
                   rows_scr, sem_out):
    w = pl.program_id(0)
    st = starts_ref[w]
    blk15 = blk_ref[...].reshape(f + 1, s_blk)       # [F+1, K*lpb]
    # slot -> sorted-particle index rides as the last field (planes.py
    # packs it as packed[:, 7]; empty slots carry -1), so the one-hot
    # builds from the BLOCK side — no per-particle side-channel DMA.
    pidx = blk15[f].astype(jnp.int32)                # [s_blk]
    rel = pidx - st
    # (mask stays int32 until the 2D compare: an i1 vector minor-dim
    # insertion is unsupported by Mosaic)
    ok = (pidx >= 0).astype(jnp.int32)
    oh = jnp.where(
        (ok[:, None] > 0)
        & (rel[:, None]
           == lax.broadcasted_iota(jnp.int32, (s_blk, max_p), 1)),
        1.0, 0.0).astype(jnp.bfloat16)               # [s_blk, max_p]
    # TRANSPOSED contraction: rows_t[f, p] = sum_s vals[f, s] * oh[s, p].
    # The streamed MXU dim is F (~14 rows) instead of the padded-to-128
    # lane dim of the naive  oh[P,S] @ vals[S,F]  form — measured 9x
    # less MXU work — and the 3-term bf16 expansion (exact: the one-hot
    # is 0/1 in bf16) halves the passes vs precision=HIGHEST.
    fpad = -(-(f) // 8) * 8
    vals = jnp.concatenate(
        [blk15[:f], jnp.zeros((fpad - f, s_blk), jnp.float32)], axis=0)
    v1 = vals.astype(jnp.bfloat16)
    r1 = vals - v1.astype(jnp.float32)
    v2 = r1.astype(jnp.bfloat16)
    v3 = (r1 - v2.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))

    def bf16dot(v):
        return lax.dot_general(v, oh, dn,
                               preferred_element_type=jnp.float32)

    rows_t = bf16dot(v1) + bf16dot(v2) + bf16dot(v3)  # [fpad, max_p]
    # the HBM row store must span full 128-lane tiles (Mosaic DMA slice
    # alignment), so rows pad to 128 lanes
    rows_scr[:, :fpad] = rows_t.T
    cout = pltpu.make_async_copy(rows_scr,
                                 out_hbm.at[pl.ds(st, max_p)], sem_out)
    cout.start()
    cout.wait()


def gather_call(stacked: jax.Array, starts: jax.Array,
                geom: PlaneGeom, n_out: int,
                lanes_per_block: int = 128, max_p: int = 512,
                interpret: bool = False) -> jax.Array:
    """[F+1, ny, nc, K, CW] stacked kernel outputs (LAST field = the
    sorted-particle index planes, ``Planes.pidx`` interior view) ->
    [n_out, F] rows in sorted particle order.

    Windows follow sorted order, so each program writes a contiguous
    row range [starts[w], starts[w]+max_p); programs run sequentially on
    TPU and starts ascend, so the garbage tail of window w is overwritten
    by window w+1 (ascending-overwrite stitch, as in expand.py).  Valid
    only when no window overflowed max_p."""
    f = stacked.shape[0] - 1
    lpb = lanes_per_block
    nsl, nw, s_blk = gather_windows(geom, lpb)

    # pad CW up to nsl*lpb so lane blocks are static slices
    pad = nsl * lpb - geom.cw
    stacked_p = jnp.pad(stacked, ((0, 0),) * 4 + ((0, pad),),
                        constant_values=-1.0)

    nc = geom.n_chunks

    def blk_index(w, st):
        yc = w // nsl
        return (0, yc // nc, yc % nc, 0, w % nsl)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nw,),
        in_specs=[
            pl.BlockSpec((f + 1, 1, 1, geom.cap, lpb), blk_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((max_p, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ])
    out = pl.pallas_call(
        functools.partial(_gather_kernel, s_blk, max_p, f, geom.cap, lpb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out + max_p, 128), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(starts, stacked_p)
    return out[:n_out, :f]
