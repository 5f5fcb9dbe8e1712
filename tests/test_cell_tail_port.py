"""s2cell_test.cc closing tranche: UV/IJ edge coordinates, size-IJ
consistency, FromPoint containment consistency (incl. the issue-463
regression point), cell-union bound, and the Is{Max,Min}DistanceLess
boundary behavior.
"""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_spark.kernel import cellid as K
from s2geometry_spark.kernel.cell import (
    Cell,
    cell_cell_distance2,
    cell_cell_max_distance2,
)
from s2geometry_spark.kernel.cid import CID, MAX_LEVEL
from s2geometry_spark.kernel.distance import (
    chord2_predecessor,
    chord2_successor,
)


def _cell(token):
    return Cell(CID.from_token(token))


def _rand_cid(rng):
    face = rng.randint(0, 6)
    level = rng.randint(0, MAX_LEVEL + 1)
    cid = CID.from_face(face)
    for _ in range(level):
        cid = cid.child(rng.randint(0, 4))
    return cid


# --- GetUVCoordOfEdge ------------------------------------------------------


def test_get_uv_coord_of_edge():
    cell0 = [_cell(t) for t in ("0f", "05", "1b", "11")]
    cell4 = [_cell(t) for t in ("8f", "85", "9b", "91")]
    for k in range(4):
        assert cell0[k].get_uv_coord_of_edge(k + 0) == 0
        assert cell0[k].get_uv_coord_of_edge(k + 1) == 0
        assert cell4[k].get_uv_coord_of_edge(k + 0) == 0
        assert cell4[k].get_uv_coord_of_edge(k + 1) == 0


# --- GetIJCoordOfEdge ------------------------------------------------------


def test_get_ij_coord_of_edge():
    rng = np.random.RandomState(7)
    for _ in range(100):
        cid = _rand_cid(rng)
        cell = Cell(cid)
        f, i, j, _ = K.to_face_ij_orientation(
            np.array([cid.id], dtype=np.uint64)
        )
        ij = [int(i[0]), int(j[0])]
        ij_size = cell.get_size_ij()
        bounds = []
        for k in range(2):
            lo = ij[k] & -ij_size
            bounds.append((lo, lo + ij_size))
        # R2Rect vertex k, coordinate (k+1)%2
        verts = [
            (bounds[0][0], bounds[1][0]),
            (bounds[0][1], bounds[1][0]),
            (bounds[0][1], bounds[1][1]),
            (bounds[0][0], bounds[1][1]),
        ]
        for k in range(4):
            want = verts[k][(k + 1) % 2]
            assert cell.get_ij_coord_of_edge(k) == want, (cid, k)


# --- GetSizeIJAgreesWithCellId ---------------------------------------------


def test_get_size_ij_agrees_with_cell_id():
    rng = np.random.RandomState(11)
    for _ in range(100):
        cid = _rand_cid(rng)
        assert Cell(cid).get_size_ij() == 1 << (MAX_LEVEL - cid.level())


# --- ConsistentWithS2CellIdFromPoint ---------------------------------------


def _cid_from_point(p):
    p = np.asarray(p, float)
    return CID(int(K.from_point(
        np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
    )[0]))


def test_consistent_with_s2cellid_from_point():
    """The cell returned by S2CellId(point) contains the point
    (vertex-neighbor perturbations included)."""
    rng = np.random.RandomState(13)
    for _ in range(200):
        v = rng.standard_normal(3)
        p = v / np.linalg.norm(v)
        cell = Cell(_cid_from_point(p))
        assert cell.contains_point(p)


def test_consistent_with_s2cellid_from_point_example1():
    # github.com/google/s2geometry/issues/463
    p = np.array([
        0.38203141040035632, 0.030196609707941954, 0.9236558700239289
    ])
    cell = Cell(_cid_from_point(p))
    assert cell.contains_point(p)


# --- AmbiguousContainsPoint ------------------------------------------------


def test_ambiguous_contains_point():
    """A point on a cell boundary is contained by at least one of the
    adjacent cells at every level (s2cell_test.cc)."""
    from s2geometry_spark.kernel.coords import latlng_to_xyz

    x, y, z = latlng_to_xyz(np.array([0.0]), np.array([0.0]))
    p = np.array([x[0], y[0], z[0]])
    leaf = _cid_from_point(p)
    for level in range(1, MAX_LEVEL + 1):
        cid = leaf.parent(level)
        count = 0
        # the cell itself and its neighbors at this level
        ids = K.all_neighbors(np.array([cid.id], np.uint64), level)
        cand = {int(cid.id)}
        for arr in ids:
            for v in np.atleast_1d(arr):
                cand.add(int(v))
        for c in cand:
            if Cell(CID(c)).contains_point(p):
                count += 1
        assert count >= 1, level


# --- CellUnionBoundIncludesOnlySelf ----------------------------------------


def test_cell_union_bound_includes_only_self():
    cell = _cell("123456789")
    assert cell.get_cell_union_bound() == [cell.id]


# --- IsMaxDistanceLess / IsMaxDistanceLessOrEqual --------------------------


@pytest.mark.parametrize("other", ["104", "0c", "8f"])
def test_is_max_distance_less(other):
    cell1 = _cell("1b")
    cell2 = _cell(other)
    max2 = cell_cell_max_distance2(cell1, cell2)
    eps2 = 1e-10 * 1e-10  # chord2 of ~1e-10 rad
    assert max2 > eps2

    def is_max_distance_less(limit2):
        return cell_cell_max_distance2(cell1, cell2) < limit2

    assert not is_max_distance_less(0.0)
    assert not is_max_distance_less(eps2)
    assert not is_max_distance_less(float(chord2_predecessor(max2)))
    assert not is_max_distance_less(max2)
    assert is_max_distance_less(float(chord2_successor(max2)))

    def is_max_distance_less_or_equal(limit2):
        return cell_cell_max_distance2(cell1, cell2) <= limit2

    assert not is_max_distance_less_or_equal(0.0)
    assert not is_max_distance_less_or_equal(
        float(chord2_predecessor(max2))
    )
    assert is_max_distance_less_or_equal(max2)
    assert is_max_distance_less_or_equal(float(chord2_successor(max2)))
