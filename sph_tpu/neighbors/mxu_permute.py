"""MXU one-hot permutation kernel — the table expand as matmuls.

XLA's row scatter serializes at ~40 ns/row on TPU (50-90 ms per substep
at 1M particles just MOVING data from particle order into the cell-slot
tables).  But the expand is a *permutation with holes*, and a
permutation is a matmul: for a window of table slots S and the
contiguous run of sorted particles P that lands in it,

    table_block[S, F] = onehot[S, P] @ particle_rows[P, F]

where ``onehot[p, s] = (slot_of[p] == s)``.  Sorted particle order makes
each window's particles a CONTIGUOUS run (windows follow cell-key
order), so the kernel streams fixed-size particle tiles with dynamic-
offset DMAs and the one-hot build is a single broadcasted-iota compare.
The matmuls run as a 3-term bf16 expansion — exact, because the one-hot
is 0/1 in bf16 and 3x8 mantissa bits cover an f32 — which halves the
MXU passes vs ``precision=HIGHEST`` (PERF.md finding 11).

Window capacity ``max_p`` is a static bound; if any window holds more
particles, callers ``lax.cond`` into their slow-but-general scatter
path (``planes._expand_tables``).

(The mirror-image one-hot GATHER was built and measured in round 1/2 and
LOSES to the XLA row gather in either matmul orientation — 151 ms naive,
67.8 ms transposed, vs 46.5 ms at 1M; the one-hot matmul work per window
is ~170x the useful data.  See PERF.md finding 10; the kernel lived at
git 4383fa0 if ever needed again.)
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


def expand_windows(geom: PlaneGeom, cells_per_block: int = 128
                   ) -> Tuple[int, int, int]:
    """(n_windows_per_row, n_windows, S_blk) over the lane-PADDED cell
    space; windows tile each padded y-row's nzxp lanes exactly (nzxp and
    CW are 128-aligned by construction).  S_blk spans ONE rank class
    (``cap`` slots per cell) — each class expands separately, so the
    nearly-empty spill class costs a small ``max_p`` instead of
    doubling the one-hot matmul work."""
    assert geom.nzxp % cells_per_block == 0, (geom.nzxp, cells_per_block)
    nsc = geom.nzxp // cells_per_block
    return nsc, geom.nyp_pad * nsc, cells_per_block * geom.cap


def expand_window_ids(key_p: jax.Array, rank: jax.Array, geom: PlaneGeom,
                      cells_per_block: int, max_p: int,
                      count_all_ranks: bool = True
                      ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per sorted particle: (window id, slot-in-window, starts[NW+1],
    overflow flag) for ONE rank class (``rank`` is the in-class rank;
    out-of-class ranks write no slot).  Slot numbering is RANK-MAJOR
    (slot = rank*cpb + cell_in_block) so a window's [S_blk] column
    unfolds to the class table's [cap, cpb] block.

    ``count_all_ranks=True`` (default): window membership counts EVERY
    valid-key row regardless of rank — required when the kernel streams
    runs of the full sorted array, where out-of-class rows interleave
    inside a window's span.  Pass False only for arrays pre-compacted
    to one class."""
    cpb = cells_per_block
    nsc, nw, s_blk = expand_windows(geom, cpb)
    cps = geom.nzx
    yp = key_p // cps
    cir = key_p - yp * cps                      # cell (lane) in row
    chunk = cir // cpb                          # < nsc: cir < nzx <= nzxp
    in_class = (rank >= 0) & (rank < geom.cap)
    member = (key_p < geom.padded_cells)
    if not count_all_ranks:
        member = member & in_class
    win = jnp.where(member, yp * nsc + chunk, nw)
    in_slot = jnp.where(
        in_class & (win < nw),
        rank * cpb + (cir - chunk * cpb),
        s_blk)                                   # out of range -> dropped
    counts = jnp.zeros((nw + 1,), jnp.int32).at[win].add(1, mode="drop")
    starts = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(counts[:nw], dtype=jnp.int32)])
    overflow = jnp.max(counts[:nw]) > max_p
    return win, in_slot, starts, overflow


def emit_window_ids(key_p: jax.Array, rank: jax.Array, geom: PlaneGeom,
                    tile: int, cells_per_block: int = 128
                    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Window machinery for the force kernel's ROW-EMIT tail (PERF.md
    roofline fix #4): per sorted particle (window id, COMBINED
    slot-in-window, starts[NW+1], padded dst starts[NW+1]).

    The combined slot spans BOTH rank classes of one window:
    ``[0, cap*cpb)`` = class A (rank-major), ``[cap*cpb, 2*cap*cpb)`` =
    class B, ``2*cap*cpb`` = no slot (overflow ranks emit zero rows).
    Unlike the expand there is NO ``max_p`` bound — the kernel streams
    ``ceil(cnt / tile)`` tiles per window, so ``dst`` regions are
    per-window ``tile``-aligned (disjoint => in-flight DMAs never
    race) and the total emitted bound is the static
    ``n + tile * n_windows``."""
    cpb = cells_per_block
    nsc, nw, s_blk = expand_windows(geom, cpb)
    cps = geom.nzx
    yp = key_p // cps
    cir = key_p - yp * cps
    chunk = cir // cpb
    member = key_p < geom.padded_cells
    win = jnp.where(member, yp * nsc + chunk, nw)
    cell = cir - chunk * cpb
    k2c = 2 * geom.cap
    slot = jnp.where(
        member & (rank < k2c), rank * cpb + cell, k2c * cpb)
    counts = jnp.zeros((nw + 1,), jnp.int32).at[win].add(1, mode="drop")
    starts = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(counts[:nw], dtype=jnp.int32)])
    tiles = -((-counts[:nw]) // tile)           # ceil(cnt / tile)
    dsts = tile * jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(tiles, dtype=jnp.int32)])
    return win, slot, starts, dsts


def emit_rows_build(slot: jax.Array, tile: int) -> jax.Array:
    """[N] combined slots -> the [N_pad, 128] f32 HBM rows array the
    emit tail DMA-streams (col 0 = slot; Mosaic sliced HBM DMAs must
    span whole 128-lane tiles).  Padded by a full ``tile`` so the last
    window's partial tile never reads out of bounds."""
    n = slot.shape[0]
    n_pad = -(-(n + tile) // tile) * tile
    rows = jnp.zeros((n_pad, 128), jnp.float32)
    return rows.at[:n, 0].set(slot.astype(jnp.float32))


def _expand_kernel(s_blk: int, max_p: int, f: int, cap: int, cpb: int,
                   tile_p: int, nsc: int, starts_ref, hole_ref, rows_hbm,
                   out_ref, scratch, sem):
    """Tiled, count-gated expand (PERF.md roofline fix #1): the input
    DMA fetches ``ceil(cnt / tile_p)`` tiles of ``tile_p`` rows instead
    of an unconditional ``max_p``-row block — empty windows (most of
    the grid: mean cnt ~47 vs max_p 512 at 1M) fetch NOTHING and only
    write their hole fill.

    One program handles the PARITY PAIR of windows sharing an output
    block (rows 2q and 2q+1 of chunk window r) and writes the full
    ``2*cap`` slot dim — a ``cap``-sublane out block is illegal below
    cap=8 (Mosaic's divisible-by-8-or-full rule; round-3 verdict weak
    #1), while ``2*cap`` always equals the array's slot dim."""
    t = pl.program_id(0)
    q = lax.div(t, jnp.int32(nsc))
    r = lax.rem(t, jnp.int32(nsc))
    dn = (((0,), (0,)), ((), ()))
    s_iota = lax.broadcasted_iota(jnp.int32, (tile_p, s_blk), 1)

    halves = []
    for parity in range(2):
        win = (2 * q + parity) * jnp.int32(nsc) + r
        st = starts_ref[win]
        cnt = starts_ref[win + 1] - st
        n_tiles = lax.div(cnt + (tile_p - 1), tile_p)

        def tile_term(i, acc, st=st, cnt=cnt):
            blk, filled = acc
            cp = pltpu.make_async_copy(
                rows_hbm.at[pl.ds(st + i * tile_p, tile_p)], scratch, sem)
            cp.start()
            cp.wait()
            tile = scratch[...]                          # [tile_p, 128]
            vals = tile[:, :f]
            slots = tile[:, f].astype(jnp.int32)
            p_ok = (lax.broadcasted_iota(jnp.int32, (tile_p, 1), 0)
                    < cnt - i * tile_p)
            # (select in f32, then cast: a bf16-valued select on this
            # mask shape trips a Mosaic i1 relayout bug)
            oh = jnp.where(p_ok & (slots[:, None] == s_iota),
                           1.0, 0.0).astype(jnp.bfloat16)  # [tile_p, s_blk]
            # blk[f, s] = sum_p vals[p, f] * oh[p, s] (contraction over
            # p).  Exact permutation in 3 bf16 passes instead of
            # precision=HIGHEST's 6: the one-hot is exactly 0/1 in bf16
            # and the 3-term bf16 expansion of an f32 is exact, so
            # sum_i (1.0 * v_i) == v bit-exact.
            v1 = vals.astype(jnp.bfloat16)
            r1 = vals - v1.astype(jnp.float32)
            v2 = r1.astype(jnp.bfloat16)
            v3 = (r1 - v2.astype(jnp.float32)).astype(jnp.bfloat16)

            def bf16dot(v):
                return lax.dot_general(v, oh, dn,
                                       preferred_element_type=jnp.float32)

            blk = blk + bf16dot(v1) + bf16dot(v2) + bf16dot(v3)
            # each slot holds at most one particle -> max == sum, exact
            filled = jnp.maximum(filled, jnp.max(oh, axis=0)[None, :]
                                 .astype(jnp.float32))
            return blk, filled

        blk0 = jnp.zeros((f, s_blk), jnp.float32)
        filled0 = jnp.zeros((1, s_blk), jnp.float32)
        blk, filled = lax.fori_loop(0, n_tiles, tile_term,
                                    (blk0, filled0))
        blk = blk + hole_ref[...] * (1.0 - filled)
        halves.append(blk.reshape(f, cap, cpb))
    out_ref[...] = jnp.concatenate(halves, axis=1).reshape(
        f, 1, 1, 2 * cap, cpb)


def expand_call(packed: jax.Array, in_slot: jax.Array, starts: jax.Array,
                geom: PlaneGeom, hole_fill: jax.Array,
                cells_per_block: int = 128, max_p: int = 512,
                interpret: bool = False, tile_p: int = 64) -> jax.Array:
    """[N, F] sorted rows -> ONE class's [F, nyq, nc, 2*cap, CW]
    stacked dense table (``planes.FluidTables`` layout; windows write
    chunk sub-slices directly since CW is a multiple of
    cells_per_block, and each single-row window writes the parity half
    of its pair's slot dim).  Valid only when no window overflowed
    max_p (see ``expand_window_ids``)."""
    n, f = packed.shape
    cpb = cells_per_block
    nsc, nw, s_blk = expand_windows(geom, cpb)
    wpc = geom.cw // cpb                 # windows per chunk
    tile_p = min(tile_p, max_p)

    # minor dim padded to a full 128-lane tile: Mosaic requires sliced
    # HBM DMAs to span whole tiles
    rows = jnp.zeros((n + max_p, 128), jnp.float32)
    rows = rows.at[:n, :f].set(packed)
    rows = rows.at[:, f].set(jnp.concatenate(
        [in_slot.astype(jnp.float32),
         jnp.full((max_p,), float(s_blk), jnp.float32)]))

    hole = jnp.broadcast_to(hole_fill[:, None], (f, s_blk)).astype(
        jnp.float32)

    def out_index(t, st):
        # raw lax ops: jnp's // and % wrap in jitted sub-jaxprs, and
        # NESTED ones break Mosaic's index-map lowering (MLIR cache
        # KeyError); all operands are non-negative so trunc == floor
        r = lax.rem(t, jnp.int32(nsc))
        return (0, lax.div(t, jnp.int32(nsc)), lax.div(r, jnp.int32(wpc)),
                0, lax.rem(r, jnp.int32(wpc)))

    from sph_tpu.neighbors.blockcheck import check_block
    out_block = (f, 1, 1, geom.s_slots, cpb)
    out_shape = jax.ShapeDtypeStruct(
        (f, geom.nyq, geom.n_chunks, geom.s_slots, geom.cw), jnp.float32)
    check_block(out_block, out_shape.shape, "mxu expand out")
    out_spec = pl.BlockSpec(out_block, out_index,
                            memory_space=pltpu.VMEM)
    assert nw % 2 == 0, nw      # nyp_pad is even by construction
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nw // 2,),
        in_specs=[
            pl.BlockSpec((f, s_blk), lambda t, st: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((tile_p, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ])
    return pl.pallas_call(
        functools.partial(_expand_kernel, s_blk, max_p, f, geom.cap, cpb,
                          tile_p, nsc),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(starts, hole, rows)
