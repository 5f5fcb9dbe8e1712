"""Cell-union kernel fixtures — port of s2cell_union_test.cc
(IsNormalized :167-173, the AddCells normalization generator :175-262,
UnionIsOr/IntersectionIsAnd/DifferenceIsXAndNotY :331-474 as seeded
properties, LeafCellsCovered :802-835, FromMinMax :640-662,
FromBeginEnd :663-687).  Pure kernel — no Spark session."""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_spark.kernel import cellunion as CU
from s2geometry_spark.kernel.cid import CID, MAX_LEVEL


def _add_cells(rng, cid, selected, input_ids, expected):
    """AddCells (s2cell_union_test.cc:175-245): random test case where
    `input_ids` must normalize to exactly `expected`."""
    if cid is None:
        for face in range(6):
            _add_cells(rng, CID.from_face(face), False, input_ids, expected)
        return
    if cid.is_leaf():
        input_ids.append(cid)
        return
    if not selected and rng.random() < 1.0 / (MAX_LEVEL - cid.level()):
        expected.append(cid)
        selected = True
    added = False
    if selected and rng.random() < 5.0 / 6:
        input_ids.append(cid)
        added = True
    num_children = 0
    child = cid.child_begin()
    for _pos in range(4):
        if rng.random() < 1.0 / (12 if selected else 4) and num_children < 3:
            _add_cells(rng, child, selected, input_ids, expected)
            num_children += 1
        if selected and not added:
            _add_cells(rng, child, selected, input_ids, expected)
        child = child.next()


def test_is_normalized():
    # s2cell_union_test.cc:167-173: four siblings are valid but collapse
    from s2geometry_spark.kernel import cellid as K

    x, y, z = 1.0, 0.0, 0.0
    leaf = CID(int(K.from_point(np.array([x]), np.array([y]), np.array([z]))[0]))
    parent = leaf.parent(10)
    children = [parent.child(k) for k in range(4)]
    assert CU.normalize(children) == [parent]


def test_normalize_add_cells_cases():
    # the AddCells generator: Normalize(input) == sorted(expected)
    rng = np.random.default_rng(42)
    n_nontrivial = 0
    for _ in range(50):
        input_ids: list[CID] = []
        expected: list[CID] = []
        _add_cells(rng, None, False, input_ids, expected)
        rng.shuffle(input_ids)  # normalization must not depend on order
        got = CU.normalize(list(input_ids))
        assert got == sorted(expected), (len(input_ids), len(expected))
        if len(input_ids) > len(expected):
            n_nontrivial += 1
    assert n_nontrivial > 10


def _contains_leaf(union_ids, leaf: CID) -> bool:
    return any(c.contains(leaf) for c in union_ids)


def test_boolean_ops_are_pointwise():
    # UnionIsOr / IntersectionIsAnd / DifferenceIsXAndNotY
    # (s2cell_union_test.cc:331-474): check pointwise semantics on
    # random leaf probes
    rng = np.random.default_rng(7)
    from s2geometry_spark.kernel import cellid as K

    for _ in range(10):
        xi: list[CID] = []
        yi: list[CID] = []
        _add_cells(rng, None, False, xi, [])
        _add_cells(rng, None, False, yi, [])
        x = CU.normalize(xi)
        y = CU.normalize(yi)
        x_or_y = CU.union(x, y)
        x_and_y = CU.intersection(x, y)
        x_minus_y = CU.difference(x, y)

        lat = rng.uniform(-89, 89, 200)
        lng = rng.uniform(-180, 180, 200)
        leafs = [CID(int(c)) for c in K.from_latlng(lat, lng)]
        for leaf in leafs:
            in_x = _contains_leaf(x, leaf)
            in_y = _contains_leaf(y, leaf)
            assert _contains_leaf(x_or_y, leaf) == (in_x or in_y)
            assert _contains_leaf(x_and_y, leaf) == (in_x and in_y)
            assert _contains_leaf(x_minus_y, leaf) == (in_x and not in_y)


def test_leaf_cells_covered():
    # s2cell_union_test.cc:802-835, exact expected bit arithmetic
    assert CU.leaf_cells_covered([]) == 0

    ids = [CID.from_face(0).child_begin(MAX_LEVEL)]
    assert CU.leaf_cells_covered(CU.normalize(list(ids))) == 1

    ids.append(CID.from_face(0))
    u = CU.normalize(list(ids))
    assert CU.leaf_cells_covered(u) == 1 << 60

    u = CU.expand_level(u, 0)
    assert CU.leaf_cells_covered(u) == 5 << 60
    u = CU.expand_level(u, 0)
    assert CU.leaf_cells_covered(u) == 6 << 60

    ids += [
        CID.from_face(1).child_begin(1),
        CID.from_face(2).child_begin(2),
        CID.from_face(2).child_end(2).prev(),
        CID.from_face(3).child_begin(14),
        CID.from_face(4).child_begin(27),
        CID.from_face(4).child_end(15).prev(),
        CID.from_face(5).child_begin(30),
    ]
    expected = (
        1
        + (1 << 6)
        + (1 << 30)
        + (1 << 32)
        + (2 << 56)
        + (1 << 58)
        + (1 << 60)
    )
    assert CU.leaf_cells_covered(CU.normalize(list(ids))) == expected


def _test_from_min_max(min_id: CID, max_id: CID):
    # TestFromMinMax (s2cell_union_test.cc:620-639): the result is a
    # normalized union covering exactly [min, max]
    u = CU.from_begin_end(min_id, max_id.next())
    assert len(u) > 0
    assert u[0].range_min() == min_id
    assert u[-1].range_max() == max_id
    # normalized: normalizing again is a no-op
    assert CU.normalize(list(u)) == u


def test_from_min_max():
    # s2cell_union_test.cc:640-662
    face0 = CID.from_face(0)
    _test_from_min_max(face0.range_min(), face0.range_min())
    _test_from_min_max(face0.range_min(), face0.range_max())
    face5 = CID.from_face(5)
    _test_from_min_max(face5.range_min(), face5.range_max())
    _test_from_min_max(face5.range_max(), face5.range_max())

    rng = np.random.default_rng(42)
    from s2geometry_spark.kernel import cellid as K

    for _ in range(100):
        lat = rng.uniform(-89, 89, 2)
        lng = rng.uniform(-180, 180, 2)
        a, b = (CID(int(c)) for c in K.from_latlng(lat, lng))
        if a > b:
            a, b = b, a
        _test_from_min_max(a, b)


def test_from_begin_end():
    # s2cell_union_test.cc:663-687
    begin = CID.from_face(0).child_begin(MAX_LEVEL)
    end = CID.from_face(5).child_end(MAX_LEVEL)
    # empty ranges
    assert CU.from_begin_end(begin, begin) == []
    assert CU.from_begin_end(end, end) == []
    # full sphere = six face cells
    u = CU.from_begin_end(begin, end)
    assert len(u) == 6
    assert all(c.is_face() for c in u)


# ----------------- s2cell_union_test.cc long-tail semantic cases


def test_duplicate_cells_not_valid():
    """DuplicateCellsNotValid: a verbatim union with a repeated leaf."""
    from s2geometry_spark.kernel import cellid as cid_np
    from s2geometry_spark.kernel import cellunion as CU
    from s2geometry_spark.kernel.cid import CID

    leaf = cid_np.from_point(
        np.array([1.0]), np.array([0.0]), np.array([0.0])
    )
    cid = CID(int(leaf[0]))
    assert not CU.is_valid([cid, cid])


def test_unsorted_cells_not_valid():
    """UnsortedCellsNotValid."""
    from s2geometry_spark.kernel import cellid as cid_np
    from s2geometry_spark.kernel import cellunion as CU
    from s2geometry_spark.kernel.cid import CID

    leaf = cid_np.from_point(
        np.array([1.0]), np.array([0.0]), np.array([0.0])
    )
    cid = CID(int(leaf[0])).parent(10)
    assert not CU.is_valid([cid, cid.prev()])


def test_invalid_cell_id_not_valid():
    """InvalidCellIdNotValid: S2CellId::None() invalidates the union."""
    from s2geometry_spark.kernel import cellunion as CU
    from s2geometry_spark.kernel.cid import CID

    assert not CID.none().is_valid()
    assert not CU.is_valid([CID.none()])


def test_whole_sphere():
    """WholeSphere: covers 6 * 2^60 leaves; Expand(0) is a no-op."""
    from s2geometry_spark.kernel import cellunion as CU

    ws = CU.whole_sphere()
    assert CU.leaf_cells_covered(ws) == 6 * (1 << 60)
    assert CU.expand_level(ws, 0) == CU.whole_sphere()


def test_s2cellid_constructor():
    """S2CellIdConstructor: a one-cell union keeps the face cell."""
    from s2geometry_spark.kernel import cellunion as CU
    from s2geometry_spark.kernel.cid import CID

    face1 = CID.from_face(1)
    u = CU.normalize([face1])
    assert len(u) == 1 and u[0] == face1


def test_to_string():
    """ToStringEmpty / OneCell / TwoCells / Over500Cells."""
    from s2geometry_spark.kernel import cellunion as CU
    from s2geometry_spark.kernel.cid import CID

    assert CU.to_string([]) == "Size:0 S2CellIds:"
    assert CU.to_string([CID.from_face(1)]) == "Size:1 S2CellIds:3"
    assert (
        CU.to_string([CID.from_face(1), CID.from_face(2)])
        == "Size:2 S2CellIds:3,5"
    )
    ids = CU.denormalize([CID.from_face(1)], 6, 1)  # 4096 cells
    s = CU.to_string(ids)
    assert s.count(",") == 500
    assert s.endswith(",...")


def test_empty_and_non_empty_boolean_ops():
    """EmptyAndNonEmptyBooleanOps: the full Contains/Intersects/Union/
    Intersection/Difference matrix over the empty union and {face 1}."""
    from s2geometry_spark.kernel import cellunion as CU
    from s2geometry_spark.kernel.cid import CID

    empty: list = []
    face1 = CID.from_face(1)
    ne = [face1]

    assert not CU.contains_id(empty, face1)
    assert CU.contains_id(ne, face1)
    assert CU.contains_union(empty, empty)
    assert CU.contains_union(ne, empty)
    assert not CU.contains_union(empty, ne)
    assert CU.contains_union(ne, ne)

    assert not CU.intersects(empty, [face1])
    assert CU.intersects(ne, [face1])
    assert not CU.intersects(empty, empty)
    assert not CU.intersects(ne, empty)
    assert not CU.intersects(empty, ne)
    assert CU.intersects(ne, ne)

    assert CU.union(empty, empty) == empty
    assert CU.union(ne, empty) == ne
    assert CU.union(empty, ne) == ne
    assert CU.union(ne, ne) == ne

    assert CU.intersection_id(empty, face1) == empty
    assert CU.intersection_id(ne, face1) == ne
    assert CU.intersection(empty, empty) == empty
    assert CU.intersection(ne, empty) == empty
    assert CU.intersection(empty, ne) == empty
    assert CU.intersection(ne, ne) == ne

    assert CU.difference(empty, empty) == empty
    assert CU.difference(ne, empty) == ne
    assert CU.difference(empty, ne) == empty
    assert CU.difference(ne, ne) == empty


def test_intersection_one_input_normalized():
    """IntersectionOneInputNormalized: face ∩ verbatim children = the
    children verbatim (no renormalization of the other input)."""
    from s2geometry_spark.kernel import cellunion as CU
    from s2geometry_spark.kernel.cid import CID

    fid = CID.from_face(3)
    children = [fid.child(k) for k in range(4)]
    assert CU.intersection([fid], children) == children


def test_intersection_with_cell_id_not_in_union_is_empty():
    """IntersectionWithCellIdNotInUnionIsEmpty: a deep leaf-path cell vs
    a disjoint coarser cell on the same face."""
    from s2geometry_spark.kernel import cellunion as CU
    from s2geometry_spark.kernel.cid import CID

    def mk(s):
        face, path = s.split("/")
        c = CID.from_face(int(face))
        for ch in path:
            c = c.child(int(ch))
        return c

    xcells = [mk("2/1021322000001121003")]
    yid = mk("2/10213223")
    u = CU.intersection_id(xcells, yid)
    assert u == []
    assert not CU.contains_id(u, yid)
