"""s2shapeutil_get_reference_point_test.cc +
s2shapeutil_contains_brute_force_test.cc ports over lax polygon shapes.
"""

from __future__ import annotations

import numpy as np

from s2geometry_spark.kernel import cellid as cid_np
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.contains import Loop, parse_points
from s2geometry_spark.kernel.fractal import make_regular_points, random_point
from s2geometry_spark.kernel.predicates import ORIGIN
from s2geometry_spark.kernel.shapeutil import (
    LaxPolygon,
    contains_brute_force,
    get_reference_point,
)


def test_full_polygon():
    """GetReferencePoint.FullPolygon: one empty loop ⇒ full."""
    shape = LaxPolygon([np.zeros((0, 3))])
    _, contained = get_reference_point(shape)
    assert contained


def test_degenerate_loops():
    """GetReferencePoint.DegenerateLoops: all edges matched ⇒ empty."""
    shape = LaxPolygon([
        parse_points("1:1, 1:2, 2:2, 1:2, 1:3, 1:2, 1:1"),
        parse_points("0:0, 0:3, 0:6, 0:9, 0:6, 0:3, 0:0"),
        parse_points("5:5, 6:6"),
    ])
    _, contained = get_reference_point(shape)
    assert not contained


def test_inverted_loops():
    """GetReferencePoint.InvertedLoops: two CW triangles ⇒ contains
    almost everything, incl. S2::Origin."""
    shape = LaxPolygon([
        parse_points("1:2, 1:1, 2:2"),
        parse_points("3:4, 3:3, 4:4"),
    ])
    assert contains_brute_force(shape, ORIGIN)


def _cell_point(cid: CID) -> np.ndarray:
    x, y, z = cid_np.to_point_raw(np.array([cid.id], dtype=np.uint64))
    p = np.array([x[0], y[0], z[0]])
    return p / np.linalg.norm(p)


def test_partially_degenerate_loops():
    """GetReferencePoint.PartiallyDegenerateLoops: a Hilbert-curve chain
    retraced except for a small triangular loop — the reference point
    must match the triangle's containment."""
    rng = np.random.RandomState(111)
    for _ in range(25):
        num_vertices = 100
        p = random_point(rng)
        start = CID(int(cid_np.from_point(
            np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
        )[0])).parent(29)
        ids = [start]
        for _ in range(num_vertices - 1):
            ids.append(CID(int(cid_np.advance_wrap(
                np.array([ids[-1].id], dtype=np.uint64), np.array([1])
            )[0])))
        loop_idx = rng.randint(1, num_vertices - 1)
        loop_pts: list[np.ndarray] = []
        triangle: list[np.ndarray] = []
        for k, cellid in enumerate(ids):
            if k == loop_idx:
                triangle = [_cell_point(cellid.child(0)),
                            _cell_point(cellid.child(1)),
                            _cell_point(cellid.child(2))]
                loop_pts.extend(triangle)
                loop_pts.append(_cell_point(cellid.child(0)))
            else:
                loop_pts.append(_cell_point(cellid))
        for k in range(num_vertices - 1, 0, -1):
            cellid = ids[k]
            if k == loop_idx:
                loop_pts.append(_cell_point(cellid.child(0)))
            else:
                loop_pts.append(_cell_point(cellid))
        shape = LaxPolygon([np.asarray(loop_pts)])
        ref_point, contained = get_reference_point(shape)
        assert ref_point is not None
        tri = Loop(np.asarray(triangle))
        assert bool(tri.contains(ref_point[None])[0]) == contained


def test_contains_reference_point():
    """ContainsBruteForce.ContainsReferencePoint."""
    shape = LaxPolygon([parse_points("0:0, 0:1, 1:-1, -1:-1, -1e-9:1")])
    ref_point, contained = get_reference_point(shape)
    assert contains_brute_force(shape, ref_point) == contained


def test_consistent_with_s2loop():
    """ContainsBruteForce.ConsistentWithS2Loop: regular loop at
    89:-179, radius 10°, 100 vertices."""
    from s2geometry_spark.kernel.coords import latlng_to_xyz

    x, y, z = latlng_to_xyz(np.array([89.0]), np.array([-179.0]))
    center = np.array([x[0], y[0], z[0]])
    verts = make_regular_points(center, np.radians(10.0), 100)
    loop = Loop(verts)
    shape = LaxPolygon([verts])
    for i in range(len(verts)):
        assert bool(loop.contains(verts[i][None])[0]) == \
            contains_brute_force(shape, verts[i]), i


def test_polyline_never_contains():
    """ContainsBruteForce on a dimension-1 shape is always false."""
    class LaxPolyline:
        dim = 1

    assert not contains_brute_force(LaxPolyline(), parse_points("0:0")[0])
