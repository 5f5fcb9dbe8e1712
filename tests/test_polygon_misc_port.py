"""Port of the remaining semantic s2polygon_test.cc misc cases:
OverlapFractions, OriginNearPole, PointInBigLoop, PolygonPolygonDistance,
DuplicateEdgesAreInvalid, DefaultPolygonAndEmptyLoopBothValid /
UninitializedIsValid, EmptyIntersectionClearsResult, and
IntersectionPreservesLoopOrder.  Copy/move/clone/encode-size/Sizes/
S2CoderWorks/Fuzz* are C++ value-semantics and sanitizer harnesses
(N/A by design — Parquet is the encoding, Python has no move ctors).
"""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel import booleans as B
from s2geometry_spark.kernel import predicates as P
from s2geometry_spark.kernel.contains import (
    Loop,
    Polygon,
    format_polygon,
    parse_points,
    parse_polygon,
)
from s2geometry_spark.kernel.coords import latlng_to_xyz, xyz_to_latlng

K_OVERLAP3 = "-10:10, 0:10, 0:-10, -10:-10, -10:0"
K_OVERLAP4 = "-10:0, 10:0, 10:-10, -10:-10"
K_NEAR0 = "-1:0, 0:1, 1:0, 0:-1"
K_FAR0 = "0:179, 1:180, 0:-179, 2:-180"
K_FAR1 = "0:179, -1:179, 1:180, -1:-179, 0:-179, 3:-178, 2:-180, 3:178"


def test_overlap_fractions():
    """OverlapFractions (test.cc:319-335): empty/empty -> (1,1);
    empty vs nonempty -> (1,0); two half-overlapping quads -> (.5,.5)."""
    a = parse_polygon("")
    b = parse_polygon("")
    f1, f2 = B.get_overlap_fractions(a, b)
    assert f1 == 1.0 and f2 == 1.0

    b = parse_polygon(K_OVERLAP3)
    f1, f2 = B.get_overlap_fractions(a, b)
    assert f1 == 1.0 and f2 == 0.0

    a = parse_polygon(K_OVERLAP4)
    f1, f2 = B.get_overlap_fractions(a, b)
    assert abs(f1 - 0.5) < 1e-14
    assert abs(f2 - 0.5) < 1e-14


def test_origin_near_pole():
    """OriginNearPole (test.cc:337-344): the canonicalization argument
    requires S2::Origin() at latitude >= 80 degrees."""
    lat, _ = xyz_to_latlng(
        P.ORIGIN[None, 0], P.ORIGIN[None, 1], P.ORIGIN[None, 2]
    )
    assert lat[0] >= 80.0


def test_point_in_big_loop():
    """PointInBigLoop (test.cc:3269-3276): an 80-degree-radius regular
    decagon MUST MayIntersect the leaf cell of its center — the
    historical S2ShapeIndex bug."""
    from s2geometry_spark.kernel import cellid as cid_np
    from s2geometry_spark.kernel.cell import Cell
    from s2geometry_spark.kernel.cid import CID
    from s2geometry_spark.kernel.fractal import make_regular_points
    from s2geometry_spark.kernel.region import ShapeRegion

    lat, lng = math.degrees(0.3), math.degrees(2.0)
    x, y, z = latlng_to_xyz(np.array([lat]), np.array([lng]))
    center = np.array([x[0], y[0], z[0]])
    loop = np.asarray(make_regular_points(center, math.radians(80), 10))
    region = ShapeRegion(polygon=Polygon([Loop(loop)]))
    leaf = cid_np.from_point(center[None, 0], center[None, 1], center[None, 2])
    assert region.may_intersect_cell(Cell(CID(int(leaf[0]))))


def test_polygon_polygon_distance():
    """PolygonPolygonDistance (test.cc): the distance between the near_0
    and far_10 fixture polygons exceeds 175 degrees."""
    from s2geometry_spark.kernel.distance_targets import edge_pair_min_dist2

    def edges(strs):
        out = []
        for s in strs:
            v = parse_points(s)
            for i in range(len(v)):
                out.append((v[i], v[(i + 1) % len(v)]))
        return out

    d2 = min(
        edge_pair_min_dist2(a0, a1, b0, b1)
        for a0, a1 in edges([K_NEAR0])
        for b0, b1 in edges([K_FAR0, K_FAR1])
    )
    angle = 2.0 * math.asin(min(1.0, 0.5 * math.sqrt(d2)))
    assert angle > math.radians(175)


def test_duplicate_edges_are_invalid():
    """DuplicateEdgesAreInvalid (test.cc): two loops tracing the same
    triangle in opposite directions share (reversed) edges -> invalid."""
    from s2geometry_spark.kernel.validation import (
        find_polygon_validation_error,
    )

    tri = np.array([[1.0, 0, 0], [0.0, 1, 0], [0.0, 0, 1]])
    poly = Polygon([Loop(tri), Loop(tri[::-1].copy())])
    assert find_polygon_validation_error(poly) is not None


def test_default_polygon_and_empty_loop_both_valid():
    """DefaultPolygonAndEmptyLoopBothValid + UninitializedIsValid:
    the no-loop polygon and the explicit-empty-loop polygon are both
    valid and empty."""
    from s2geometry_spark.kernel.contains import parse_loop
    from s2geometry_spark.kernel.validation import (
        find_polygon_validation_error,
    )

    p0 = Polygon([])
    assert find_polygon_validation_error(p0) is None
    assert p0.is_empty

    p1 = Polygon([parse_loop("empty")])
    assert find_polygon_validation_error(p1) is None
    assert p1.is_empty


def test_empty_intersection_clears_result():
    """EmptyIntersectionClearsResult (test.cc): polygons with disjoint
    bounds intersect to the empty polygon, with both the default snap
    and an explicit zero-radius IdentitySnapFunction."""
    from s2geometry_spark.kernel.builder import IdentitySnapFunction

    a = parse_polygon("0:0, 0:1, 1:0")
    b = parse_polygon("3:3, 3:4, 4:3")
    assert B.intersection(a, b).is_empty
    assert B.boolean_op_snapped(
        a, b, "intersection", IdentitySnapFunction(0.0)
    ).is_empty


def test_intersection_preserves_loop_order():
    """IntersectionPreservesLoopOrder (test.cc): intersecting a nested
    two-loop polygon with its containing quad returns the loops in the
    original order (textformat equality)."""
    a = parse_polygon("0:0, 0:10, 10:10, 10:0")
    b = parse_polygon("1:1, 1:9, 9:5; 2:2, 2:8, 8:5")
    got = B.intersection(a, b)
    assert format_polygon(got) == format_polygon(b)
