"""S2Cap golden fixtures (s2cap_test.cc): rect bounds and cell relations."""

import math

import numpy as np
import pytest

from s2geometry_spark.kernel import cellid as K
from s2geometry_spark.kernel.cell import Cell, _face_uv_to_xyz
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.coords import latlng_to_xyz
from s2geometry_spark.kernel.metrics import MIN_WIDTH
from s2geometry_spark.kernel.region import Cap, cell_cap_bound

EPS = 1e-15
DEG_EPS = 1e-13


def _pt(lat, lng):
    x, y, z = latlng_to_xyz(np.array([float(lat)]), np.array([float(lng)]))
    return np.array([x[0], y[0], z[0]])


def _deg(r):
    return math.degrees(r)


def test_cap_get_rect_bound():
    """s2cap_test.cc:187-236."""
    assert Cap.empty().get_rect_bound().is_empty()
    # includes the south pole
    rect = Cap.from_center_angle(_pt(-45, 57), math.radians(50)).get_rect_bound()
    assert abs(_deg(rect.lat.lo) - (-90)) < DEG_EPS
    assert abs(_deg(rect.lat.hi) - 5) < DEG_EPS
    assert rect.lng.is_full()
    # tangent to the north pole
    p = np.array([1.0, 0, 1]) / math.sqrt(2)
    rect = Cap.from_center_angle(p, math.pi / 4 + 1e-16).get_rect_bound()
    assert abs(rect.lat.lo - 0) < EPS
    assert abs(rect.lat.hi - math.pi / 2) < EPS
    assert rect.lng.is_full()
    # eastern hemisphere
    rect = Cap.from_center_angle(
        np.array([0.0, 1, 0]), math.pi / 2 + 2e-16
    ).get_rect_bound()
    assert abs(_deg(rect.lat.lo) + 90) < DEG_EPS
    assert abs(_deg(rect.lat.hi) - 90) < DEG_EPS
    assert rect.lng.is_full()
    # centered on the equator
    rect = Cap.from_center_angle(_pt(0, 50), math.radians(20)).get_rect_bound()
    assert abs(_deg(rect.lat.lo) + 20) < DEG_EPS
    assert abs(_deg(rect.lat.hi) - 20) < DEG_EPS
    assert abs(_deg(rect.lng.lo) - 30) < DEG_EPS
    assert abs(_deg(rect.lng.hi) - 70) < DEG_EPS
    # centered on the north pole
    rect = Cap.from_center_angle(_pt(90, 123), math.radians(10)).get_rect_bound()
    assert abs(_deg(rect.lat.lo) - 80) < DEG_EPS
    assert abs(_deg(rect.lat.hi) - 90) < DEG_EPS
    assert rect.lng.is_full()


def _leaf_cell_at_uv(face, u, v):
    p = _face_uv_to_xyz(face, u, v)
    p = p / np.linalg.norm(p)
    leaf = K.from_point(np.array([p[0]]), np.array([p[1]]), np.array([p[2]]))
    return Cell(CID(int(leaf[0])))


def test_cap_s2cell_methods():
    """s2cap_test.cc:237-303 — the full cap×cell relation sweep."""
    face_radius = math.atan(math.sqrt(2))
    norms = [_face_uv_to_xyz(f, 0, 0) for f in range(6)]
    for face in range(6):
        root_cell = Cell(CID.from_face(face))
        edge_cell = _leaf_cell_at_uv(face, 0, 1 - EPS)
        corner_cell = _leaf_cell_at_uv(face, 1 - EPS, 1 - EPS)

        assert Cap.full().contains_cell(root_cell)
        assert not Cap.empty().may_intersect_cell(root_cell)

        # caps of Hilbert-adjacent leaf cells vs the corner cell
        first = K.advance(np.array([corner_cell.id.id], dtype=np.uint64), np.array([-3]))[0]
        cid = CID(int(first))
        for _ in range(7):
            cell = Cell(cid)
            cb = cell_cap_bound(cell)
            assert (cid == corner_cell.id) == cb.contains_cell(corner_cell)
            assert cid.parent().contains(corner_cell.id) == cb.may_intersect_cell(corner_cell)
            cid = cid.next()

        anti_face = (face + 3) % 6
        for cap_face in range(6):
            center = norms[cap_face]
            covering = Cap.from_center_angle(center, face_radius + EPS)
            assert (cap_face == face) == covering.contains_cell(root_cell)
            assert (cap_face != anti_face) == covering.may_intersect_cell(root_cell)
            assert (float(center @ edge_cell.get_center()) > 0.1) == covering.contains_cell(edge_cell)
            assert covering.may_intersect_cell(edge_cell) == covering.contains_cell(edge_cell)
            assert (cap_face == face) == covering.contains_cell(corner_cell)
            assert (float(center @ corner_cell.get_center()) > 0) == covering.may_intersect_cell(corner_cell)

            bulging = Cap.from_center_angle(center, math.pi / 4 + EPS)
            assert not bulging.contains_cell(root_cell)
            assert (cap_face != anti_face) == bulging.may_intersect_cell(root_cell)
            assert (cap_face == face) == bulging.contains_cell(edge_cell)
            assert (float(center @ edge_cell.get_center()) > 0.1) == bulging.may_intersect_cell(edge_cell)
            assert not bulging.contains_cell(corner_cell)
            assert not bulging.may_intersect_cell(corner_cell)

            singleton = Cap.from_center_angle(center, 0.0)
            assert (cap_face == face) == singleton.may_intersect_cell(root_cell)
            assert not singleton.may_intersect_cell(edge_cell)
            assert not singleton.may_intersect_cell(corner_cell)


def test_cap_cell_union_bound_level1_radius():
    """s2cap_test.cc:305-313: level-1-width cap covered by exactly 3 faces."""
    cap = Cap.from_center_angle(
        np.array([1.0, 1, 1]) / math.sqrt(3), MIN_WIDTH.get_value(1)
    )
    covering = cap.get_cell_union_bound()
    assert len(covering) == 3


def test_cap_expanded():
    cap = Cap.from_center_angle(_pt(0, 0), math.radians(10))
    grown = cap.expanded(math.radians(5))
    assert abs(math.degrees(grown.radius_radians()) - 15) < 1e-12
    assert Cap.empty().expanded(1.0).is_empty()


class TestCapAlgebra:
    """Port of s2cap_test.cc Basic :56-171, Expanded :315-325,
    GetCentroid :326-343 (seeded rng), Union :344-391."""

    def test_basic(self):
        import math

        import numpy as np

        from s2geometry_spark.kernel.region import Cap

        empty = Cap.empty()
        full = Cap.full()
        assert empty.is_empty() and empty.complement().is_full()
        assert full.is_full() and full.complement().is_empty()
        assert full.height() == 2
        assert math.degrees(full.radius_radians()) == pytest.approx(180.0)

        # out-of-range radius constructor
        assert Cap.from_center_angle(np.array([1.0, 0, 0]), -20).is_empty()
        assert Cap.from_center_angle(np.array([1.0, 0, 0]), 5).is_full()

        # containment / intersection of empty and full
        assert empty.contains_cap(empty)
        assert full.contains_cap(empty)
        assert full.contains_cap(full)
        assert not empty.interior_intersects_cap(empty)
        assert full.interior_intersects_cap(full)
        assert not full.interior_intersects_cap(empty)

        # singleton caps
        xaxis = Cap.from_point(np.array([1.0, 0, 0]))
        yaxis = Cap.from_point(np.array([0.0, 1, 0]))
        assert xaxis.contains_point(np.array([1.0, 0, 0]))
        p = np.array([1.0, 1e-20, 0])
        assert not xaxis.contains_point(p)
        assert xaxis.radius_radians() == 0
        assert not yaxis.contains_point(xaxis.center)
        xcomp = xaxis.complement()
        assert xcomp.is_full()
        assert xcomp.contains_point(xaxis.center)
        assert xcomp.complement().is_empty()

        # tiny cap
        k_tiny = 1e-10
        c = np.array([1.0, 2.0, 3.0])
        c /= np.linalg.norm(c)
        tiny = Cap.from_center_angle(c, k_tiny)
        tangent = np.cross(c, np.array([3.0, 2.0, 1.0]))
        tangent /= np.linalg.norm(tangent)
        assert tiny.contains_point(c + 0.99 * k_tiny * tangent)
        assert not tiny.contains_point(c + 1.01 * k_tiny * tangent)

        # hemispherical cap
        h = np.array([1.0, 0, 1.0])
        h /= np.linalg.norm(h)
        hemi = Cap(h, 2.0)
        assert np.allclose(hemi.complement().center, -hemi.center)
        assert hemi.complement().height() == 1.0
        assert hemi.contains_point(np.array([1.0, 0, 0]))
        assert not hemi.complement().contains_point(np.array([1.0, 0, 0]))

        # cap containment
        k_eps = 1e-14
        assert not empty.contains_cap(xaxis)
        assert full.contains_cap(xaxis)
        assert not xaxis.contains_cap(full)
        assert xaxis.contains_cap(xaxis)
        assert xaxis.contains_cap(empty)
        assert not xaxis.interior_intersects_cap(xaxis)
        assert hemi.contains_cap(tiny)
        assert hemi.contains_cap(
            Cap.from_center_angle(np.array([1.0, 0, 0]), math.pi / 4 - k_eps)
        )
        assert not hemi.contains_cap(
            Cap.from_center_angle(np.array([1.0, 0, 0]), math.pi / 4 + k_eps)
        )

    def test_expanded(self):
        import math

        import numpy as np

        from s2geometry_spark.kernel.region import Cap

        assert Cap.empty().expanded(2.0).is_empty()
        assert Cap.full().expanded(2.0).is_full()
        cap50 = Cap.from_center_angle(np.array([1.0, 0, 0]), math.radians(50))
        cap51 = Cap.from_center_angle(np.array([1.0, 0, 0]), math.radians(51))
        assert cap50.expanded(0).approx_equals(cap50)
        assert cap50.expanded(math.radians(1)).approx_equals(cap51)
        assert not cap50.expanded(math.radians(129.99)).is_full()
        assert cap50.expanded(math.radians(130.01)).is_full()

    def test_get_centroid(self):
        import numpy as np

        from s2geometry_spark.kernel.region import Cap

        assert np.array_equal(Cap.empty().get_centroid(), np.zeros(3))
        assert np.linalg.norm(Cap.full().get_centroid()) <= 1e-15
        rng = np.random.default_rng(42)
        for _ in range(100):
            center = rng.normal(size=3)
            center /= np.linalg.norm(center)
            height = float(rng.uniform(0.0, 2.0))
            cap = Cap(center, 2.0 * height)
            centroid = cap.get_centroid()
            expected = center * (1.0 - height / 2.0) * cap.get_area()
            assert np.linalg.norm(expected - centroid) <= 1e-15

    def test_union(self):
        import math

        import numpy as np

        from s2geometry_spark.kernel.coords import latlng_to_xyz
        from s2geometry_spark.kernel.region import Cap

        def pt(lat, lng):
            x, y, z = latlng_to_xyz(np.float64(lat), np.float64(lng))
            return np.array([x, y, z])

        def lat_lng_of(p):
            return (
                math.degrees(math.atan2(p[2], math.hypot(p[0], p[1]))),
                math.degrees(math.atan2(p[1], p[0])),
            )

        a = Cap.from_center_angle(pt(50, 10), math.radians(0.2))
        b = Cap.from_center_angle(pt(50, 10), math.radians(0.3))
        assert b.contains_cap(a)
        assert a.union(b).approx_equals(b)
        assert a.union(Cap.full()).is_full()
        assert a.union(Cap.empty()).approx_equals(a)

        # c entirely encompasses a
        c = Cap.from_center_angle(pt(51, 11), math.radians(1.5))
        assert c.contains_cap(a)
        assert np.array_equal(a.union(c).center, c.center)
        assert a.union(c).length2 == c.length2

        # disjoint caps
        d = Cap.from_center_angle(pt(51, 11), math.radians(0.1))
        assert not d.contains_cap(a)
        assert not d.intersects_cap(a)
        assert a.union(d).approx_equals(d.union(a), 1e-9)
        lat, lng = lat_lng_of(a.union(d).center)
        assert lat == pytest.approx(50.4588, abs=0.001)
        assert lng == pytest.approx(10.4525, abs=0.001)
        assert math.degrees(a.union(d).radius_radians()) == pytest.approx(
            0.7425, abs=0.001
        )

        # partially overlapping caps
        e = Cap.from_center_angle(pt(50.3, 10.3), math.radians(0.2))
        assert not e.contains_cap(a)
        assert e.intersects_cap(a)
        assert a.union(e).approx_equals(e.union(a), 1e-9)
        lat, lng = lat_lng_of(a.union(e).center)
        assert lat == pytest.approx(50.1500, abs=0.001)
        assert lng == pytest.approx(10.1495, abs=0.001)
        assert math.degrees(a.union(e).radius_radians()) == pytest.approx(
            0.3781, abs=0.001
        )

        # radius sum exceeding 180 degrees
        f = Cap.from_center_angle(np.array([0.0, 0, 1.0]), math.radians(150))
        g = Cap.from_center_angle(np.array([0.0, 1.0, 0.0]), math.radians(150))
        assert f.union(g).is_full()

        # antipodal hemispheres
        hemi = Cap(np.array([0.0, 0, 1.0]), 2.0)
        assert hemi.union(hemi.complement()).is_full()


class TestCellGeometry:
    """Port of s2cell_test.cc TestFaces :83-113 and the
    GetDistanceToPoint brute-force property :685-719 (seeded rng)."""

    def test_faces(self):
        import numpy as np

        from s2geometry_spark.kernel.cell import Cell
        from s2geometry_spark.kernel.cid import CID

        edge_counts: dict[tuple, int] = {}
        vertex_counts: dict[tuple, int] = {}
        for face in range(6):
            cell = Cell(CID.from_face(face))
            for k in range(4):
                e = cell.get_edge_raw(k)
                v = cell.get_vertex_raw(k)
                v_next = cell.get_vertex_raw((k + 1) % 4)
                edge_counts[tuple(np.round(e, 12))] = (
                    edge_counts.get(tuple(np.round(e, 12)), 0) + 1
                )
                vertex_counts[tuple(np.round(v, 12))] = (
                    vertex_counts.get(tuple(np.round(v, 12)), 0) + 1
                )
                # edge normal is orthogonal to both endpoints
                assert abs(float(v @ e)) < 1e-15
                assert abs(float(v_next @ e)) < 1e-15
                # and equals the normalized cross product of the vertices
                cr = np.cross(v, v_next)
                cr /= np.linalg.norm(cr)
                en = np.asarray(e, float)
                en = en / np.linalg.norm(en)
                assert abs(float(cr @ en) - 1.0) < 1e-14
        # each cube edge is shared by 2 faces, each vertex by 3
        assert all(c == 2 for c in edge_counts.values())
        assert all(c == 3 for c in vertex_counts.values())

    def test_get_distance_to_point_brute_force(self):
        import numpy as np

        from s2geometry_spark.kernel import cellid as K
        from s2geometry_spark.kernel.cell import (
            Cell,
            _cell_vertices,
            cell_distance2,
        )
        from s2geometry_spark.kernel.cid import CID
        from s2geometry_spark.kernel.distance import point_edge_dist2

        rng = np.random.default_rng(42)
        n_interior = 0
        for _ in range(300):
            lat = rng.uniform(-80, 80)
            lng = rng.uniform(-180, 180)
            level = int(rng.integers(0, 31))
            leaf = K.from_latlng(np.array([lat]), np.array([lng]))
            cell = Cell(CID(int(leaf[0])).parent(level))

            target = rng.normal(size=3)
            target /= np.linalg.norm(target)

            got = cell_distance2(cell, target)
            # brute force: 0 if contained, else min distance to the
            # 4 boundary edges (s2cell_test.cc:662-684)
            if cell.contains_point(target):
                assert got == 0.0
                n_interior += 1
                continue
            v = _cell_vertices(cell)
            d = np.roll(v, -1, axis=0)
            want = float(point_edge_dist2(target[None], v, d).min())
            assert got == pytest.approx(want, abs=1e-15)
        assert n_interior >= 1  # at least one level-0 cell contains it


def test_add_empty_cap_to_non_empty_cap():
    """s2cap_test.cc:173-178."""
    from s2geometry_spark.kernel.region import Cap

    non_empty = Cap.from_center_angle(
        np.array([1.0, 0, 0]), math.radians(10))
    initial_area = non_empty.get_area()
    non_empty.add_cap(Cap.empty())
    assert non_empty.get_area() == initial_area


def test_add_non_empty_cap_to_empty_cap():
    """s2cap_test.cc:180-185."""
    from s2geometry_spark.kernel.region import Cap

    empty = Cap.empty()
    non_empty = Cap.from_center_angle(np.array([1.0, 0, 0]),
                                      math.radians(10))
    empty.add_cap(non_empty)
    assert empty.get_area() == non_empty.get_area()


def test_add_cap_contains_both():
    """AddCap containment guarantee (s2cap.cc:107 'round up')."""
    from s2geometry_spark.kernel.region import Cap

    a = Cap.from_center_angle(np.array([1.0, 0, 0]), math.radians(5))
    b = Cap.from_center_angle(
        np.array([0.0, 1, 0]) / 1.0, math.radians(7))
    a.add_cap(b)
    assert a.contains_cap(b) if hasattr(a, "contains_cap") else True
    # vertex-level containment: sampled boundary points of b are in a
    rng = np.random.RandomState(3)
    z = b.center
    x = np.array([0.0, 0, 1.0]); x = x - (x @ z) * z
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    r = b.radius_radians()
    for t in rng.uniform(0, 2 * math.pi, 20):
        p = (math.cos(r) * z
             + math.sin(r) * (math.cos(t) * x + math.sin(t) * y))
        assert a.contains_point(p / np.linalg.norm(p))
