"""S2PaddedCell fixture ports (s2padded_cell_test.cc:40-160)."""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel import cellid as cid_np
from s2geometry_spark.kernel import coords
from s2geometry_spark.kernel.cell import Cell
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.fractal import random_point
from s2geometry_spark.kernel.padded_cell import PaddedCell

K_ITERS = 250


def random_cell_id(rng) -> CID:
    p = random_point(rng)
    leaf = CID(int(cid_np.from_point(
        np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
    )[0]))
    return leaf.parent(rng.randint(0, 31))


def center_uv(cid: CID) -> tuple[float, float]:
    f, si, ti = cid_np.get_center_siti(np.array([cid.id], dtype=np.uint64))
    return (
        float(coords.st_to_uv(coords.siti_to_st(int(si[0])))),
        float(coords.st_to_uv(coords.siti_to_st(int(ti[0])))),
    )


def compare_cell_to_padded(cell: Cell, pcell: PaddedCell, padding: float):
    assert cell.id == pcell.id
    assert cell.level == pcell.level
    assert padding == pcell.padding
    got = pcell.bound
    assert got[0][0] == cell.u_lo - padding
    assert got[0][1] == cell.u_hi + padding
    assert got[1][0] == cell.v_lo - padding
    assert got[1][1] == cell.v_hi + padding
    cu, cv = center_uv(cell.id)
    mid = pcell.middle()
    assert mid[0] == (cu - padding, cu + padding)
    assert mid[1] == (cv - padding, cv + padding)
    assert np.array_equal(cell.get_center(), pcell.get_center())


def test_s2cell_methods():
    """test.cc:52-74."""
    rng = np.random.RandomState(31)
    for _ in range(K_ITERS):
        cid = random_cell_id(rng)
        padding = math.exp(rng.uniform(math.log(1e-15), 0.0))
        cell = Cell(cid)
        pcell = PaddedCell(cid, padding)
        compare_cell_to_padded(cell, pcell, padding)
        if not cid.is_leaf():
            for pos in range(4):
                i, j = pcell.get_child_ij(pos)
                compare_cell_to_padded(
                    Cell(cid.child(pos)),
                    PaddedCell.child_of(pcell, i, j),
                    padding,
                )


def test_get_entry_exit_vertices():
    """test.cc:76-107."""
    rng = np.random.RandomState(32)
    for _ in range(K_ITERS):
        cid = random_cell_id(rng)
        assert np.array_equal(
            PaddedCell(cid, 0).get_entry_vertex(),
            PaddedCell(cid, 0.5).get_entry_vertex(),
        )
        assert np.array_equal(
            PaddedCell(cid, 0).get_exit_vertex(),
            PaddedCell(cid, 0.5).get_exit_vertex(),
        )
        nxt = CID(int(cid_np.advance_wrap(
            np.array([cid.id], dtype=np.uint64), np.array([1])
        )[0]))
        assert np.array_equal(
            PaddedCell(cid, 0).get_exit_vertex(),
            PaddedCell(nxt, 0).get_entry_vertex(),
        )
        if not cid.is_leaf():
            assert np.array_equal(
                PaddedCell(cid, 0).get_entry_vertex(),
                PaddedCell(cid.child(0), 0).get_entry_vertex(),
            )
            assert np.array_equal(
                PaddedCell(cid, 0).get_exit_vertex(),
                PaddedCell(cid.child(3), 0).get_exit_vertex(),
            )


def test_shrink_to_fit():
    """test.cc:109-158: work backwards from the desired result."""
    rng = np.random.RandomState(33)
    for _ in range(K_ITERS):
        result = random_cell_id(rng)
        rcell = Cell(result)
        result_uv = ((rcell.u_lo, rcell.u_hi), (rcell.v_lo, rcell.v_hi))
        size_u = result_uv[0][1] - result_uv[0][0]
        size_v = result_uv[1][1] - result_uv[1][0]
        max_padding = 0.5 * min(size_u, size_v)
        padding = rng.uniform(0.0, max_padding)
        max_rect = (
            (result_uv[0][0] + padding, result_uv[0][1] - padding),
            (result_uv[1][0] + padding, result_uv[1][1] - padding),
        )
        a = [rng.uniform(*max_rect[0]), rng.uniform(*max_rect[1])]
        b = [rng.uniform(*max_rect[0]), rng.uniform(*max_rect[1])]
        if not result.is_leaf():
            axis = rng.randint(0, 2)
            center = center_uv(result)[axis]
            lo = max(center - padding, max_rect[axis][0])
            hi = min(center + padding, max_rect[axis][1])
            mid = rng.uniform(lo, hi)
            a[axis] = rng.uniform(max_rect[axis][0], mid)
            b[axis] = rng.uniform(mid, max_rect[axis][1])
        rect = (
            (min(a[0], b[0]), max(a[0], b[0])),
            (min(a[1], b[1]), max(a[1], b[1])),
        )
        initial = result.parent(rng.randint(0, result.level() + 1))
        got = PaddedCell(initial, padding).shrink_to_fit(rect)
        assert got == result, (result, got)
