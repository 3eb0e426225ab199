"""Butterfly expand/compact vs numpy oracle.

The monotone butterfly (``neighbors/expand.py``) replaces XLA row
scatter/gather for the bin-table build (the TPU equivalent of the
reference's atomicExchange grid insert, ``shaders/BuildGrid.comp:36``).
These tests drive both the butterfly path (zero cell overflow) and the
``lax.cond`` scatter/gather fallback (overflow > 0) over randomized
occupancy patterns, including adversarial ones (empty slabs, single full
cell, all-in-one-cell).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from sph_tpu.neighbors.expand import (
    ExpandGeom, cell_starts, compact, expand)


def _ranks(key: np.ndarray) -> np.ndarray:
    rank = np.zeros(len(key), np.int32)
    for i in range(1, len(key)):
        rank[i] = rank[i - 1] + 1 if key[i] == key[i - 1] else 0
    return rank


def _oracle_table(fields, key, rank, eg, hole):
    c = eg.ny * eg.cps
    tab = np.broadcast_to(hole, (c, eg.cap, fields.shape[1])).copy()
    for i in range(len(key)):
        if rank[i] < eg.cap and key[i] < c:
            tab[key[i], rank[i]] = fields[i]
    return tab.reshape(eg.ny, eg.cps, eg.cap, fields.shape[1])


def _run_roundtrip(key, eg, rng):
    rank = _ranks(key)
    n = len(key)
    overflow = int(((rank >= eg.cap) & (key < eg.ny * eg.cps)).sum())
    fields = rng.normal(size=(n, 3)).astype(np.float32)
    hole = np.full((3,), -99.0, np.float32)

    tab = expand(jnp.asarray(fields), jnp.asarray(key), jnp.asarray(rank),
                 jnp.asarray(overflow), eg, jnp.asarray(hole))
    oracle = _oracle_table(fields, key, rank, eg, hole)
    np.testing.assert_allclose(np.asarray(tab), oracle, rtol=0, atol=0)

    back = compact(jnp.asarray(oracle), jnp.asarray(key), jnp.asarray(rank),
                   jnp.asarray(overflow), eg, n)
    mask = (rank < eg.cap) & (key < eg.ny * eg.cps)
    np.testing.assert_allclose(np.asarray(back)[mask], fields[mask],
                               rtol=0, atol=0)
    return overflow


@pytest.mark.parametrize("seed", range(6))
def test_no_overflow_random(seed):
    """Butterfly path: random occupancies capped below K."""
    rng = np.random.default_rng(seed)
    ny, cps, cap = int(rng.integers(2, 6)), int(rng.integers(4, 33)), 8
    eg = ExpandGeom(ny=ny, cps=cps, cap=cap)
    c = ny * cps
    counts = rng.integers(0, cap + 1, c)
    key = np.repeat(np.arange(c, dtype=np.int32), counts)
    assert _run_roundtrip(key, eg, rng) == 0


@pytest.mark.parametrize("seed", range(4))
def test_overflow_fallback(seed):
    """Scatter/gather path: at least one cell over capacity."""
    rng = np.random.default_rng(100 + seed)
    ny, cps, cap = 3, int(rng.integers(4, 17)), 8
    eg = ExpandGeom(ny=ny, cps=cps, cap=cap)
    c = ny * cps
    counts = rng.integers(0, cap + 1, c)
    counts[rng.integers(0, c)] = cap + 3
    key = np.repeat(np.arange(c, dtype=np.int32), counts)
    assert _run_roundtrip(key, eg, rng) > 0


def test_adversarial_patterns():
    rng = np.random.default_rng(42)
    eg = ExpandGeom(ny=3, cps=8, cap=8)
    c = eg.ny * eg.cps
    # empty table
    _run_roundtrip(np.zeros((0,), np.int32), eg, rng)
    # everything in the last cell, exactly full
    _run_roundtrip(np.full((eg.cap,), c - 1, np.int32), eg, rng)
    # one particle per cell
    _run_roundtrip(np.arange(c, dtype=np.int32), eg, rng)
    # middle slab empty
    counts = np.full(c, 4)
    counts[eg.cps:2 * eg.cps] = 0
    _run_roundtrip(np.repeat(np.arange(c, dtype=np.int32), counts), eg, rng)


def test_spill_keys_ignored():
    """Rows with the spill key (== num_cells) never land in the table."""
    rng = np.random.default_rng(7)
    eg = ExpandGeom(ny=2, cps=4, cap=8)
    c = eg.ny * eg.cps
    key = np.array([0, 0, 3, c, c, c], np.int32)
    _run_roundtrip(key, eg, rng)


def test_cell_starts():
    key = jnp.asarray([0, 0, 2, 2, 2, 5], jnp.int32)
    start, counts = cell_starts(key, 6)
    np.testing.assert_array_equal(np.asarray(counts), [2, 0, 3, 0, 0, 1])
    np.testing.assert_array_equal(np.asarray(start), [0, 2, 2, 5, 5, 5, 6])
