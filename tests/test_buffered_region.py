"""S2ShapeIndexBufferedRegion fixture ports
(s2shape_index_buffered_region_test.cc), with S2Testing::CheckCovering
as the validation harness.
"""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel.cell import Cell
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.closest_edge import parse_index
from s2geometry_spark.kernel.coverer import RegionCoverer
from s2geometry_spark.kernel.distance import angle_to_chord2
from s2geometry_spark.kernel.point_index import ShapeIndexTarget
from s2geometry_spark.kernel.region import Cap, ShapeIndexBufferedRegion


def check_covering(region, covering: list[CID], check_tight: bool):
    """S2Testing::CheckCovering (s2testing.cc): every leaf-ward path
    either exits the region, is covered, or keeps subdividing."""
    ids = sorted(c.id for c in covering)

    def covering_intersects(cid: CID) -> bool:
        import bisect

        lo = bisect.bisect_left(ids, cid.range_min().id)
        return lo < len(ids) and ids[lo] <= cid.range_max().id

    def covering_contains(cid: CID) -> bool:
        import bisect

        k = bisect.bisect_right(ids, cid.id)
        if k > 0 and CID(ids[k - 1]).range_max().id >= cid.range_max().id \
                and CID(ids[k - 1]).range_min().id <= cid.range_min().id:
            return True
        return False

    def rec(cid: CID, depth: int):
        cell = Cell(cid)
        if not region.may_intersect_cell(cell):
            if check_tight:
                assert not covering_intersects(cid), cid
            return
        if covering_contains(cid):
            return
        assert not region.contains_cell(cell), cid  # uncovered interior
        assert not cid.is_leaf(), cid
        for k in range(4):
            rec(cid.child(k), depth + 1)

    for f in range(6):
        rec(CID.from_face(f), 0)


def test_empty_index():
    region = ShapeIndexBufferedRegion([], math.radians(2))
    assert RegionCoverer().get_covering(region) == []


def test_point_zero_radius():
    """test.cc:102-113: ≤-semantics keep a zero-radius point covered."""
    region = ShapeIndexBufferedRegion(parse_index("34:25 # #"), 0.0)
    covering = RegionCoverer().get_covering(region)
    assert len(covering) == 1
    assert covering[0].is_leaf()


def test_buffered_point_vs_cap():
    """test.cc:115-128: covering of a buffered point ≍ the cap."""
    shapes = parse_index("3:5 # #")
    point = shapes[0].edges_c[0]
    radius = math.radians(2)
    region = ShapeIndexBufferedRegion(shapes, radius)
    covering = RegionCoverer(max_cells=50).get_covering(region)
    cap = Cap.from_center_angle(point, radius)
    check_covering(cap, covering, check_tight=True)


def _test_buffer_index(index_str: str, radius_rad: float, max_cells=100):
    shapes = parse_index(index_str)
    region = ShapeIndexBufferedRegion(shapes, radius_rad)
    covering = RegionCoverer(max_cells=max_cells).get_covering(region)
    assert covering
    # CheckCovering against the buffered region itself (non-tight: the
    # covering may overcount)
    check_covering(region, covering, check_tight=False)
    # (a) the covering contains the original geometry: every vertex's
    # leaf cell is inside some covering cell
    from s2geometry_spark.kernel import cellid as cid_np
    import bisect

    ids = sorted(c.id for c in covering)

    def contained(p) -> bool:
        leaf = int(cid_np.from_point(
            np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
        )[0])
        k = bisect.bisect_right([CID(i).range_max().id for i in ids], leaf)
        return k < len(ids) and CID(ids[k]).range_min().id <= leaf

    for sh in shapes:
        for p in sh.edges_c:
            assert contained(p), p
    # (b) points just inside the buffer distance stay covered
    target = ShapeIndexTarget(shapes, include_interiors=True)
    rng = np.random.RandomState(41)
    for _ in range(50):
        sh = shapes[rng.randint(len(shapes))]
        v = sh.edges_c[rng.randint(len(sh.edges_c))]
        d = rng.uniform(0, 2 * math.pi)
        axis = np.array([math.cos(d), math.sin(d), 0.37])
        axis = axis - axis.dot(v) * v
        axis /= np.linalg.norm(axis)
        t = 0.95 * min(radius_rad, math.pi / 2)
        q = math.cos(t) * v + math.sin(t) * axis
        d2 = target.dist2_to_points(q[None])[0]
        if d2 < region.radius2_successor:
            assert contained(q), q


def test_point_set():
    _test_buffer_index("10:20 | 10:23 | 10:26 # #", math.radians(5))


def test_polyline():
    _test_buffer_index("# 10:5, 20:30, -10:60, -60:100 #", math.radians(2))


def test_polygon_with_hole():
    _test_buffer_index(
        "# # 10:10, 10:100, 70:0; 11:11, 69:0, 11:99", math.radians(2)
    )


def test_huge_buffer_radius():
    shapes = parse_index("10:20 # #")
    region = ShapeIndexBufferedRegion(shapes, math.radians(200))
    covering = RegionCoverer(max_cells=100).get_covering(region)
    assert len(covering) == 6
    assert all(c.is_face() for c in covering)
