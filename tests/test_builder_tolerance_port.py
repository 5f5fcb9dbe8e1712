"""s2builder_test.cc intersection-tolerance + simplify-through-Builder
tranche: zero-snap-radius edge snapping (edges snap to sites within
kIntersectionError even when vertices never merge), AddIntersection,
wrong-side-of-site topology preservation, and the simplify_edge_chains
option driven through the Builder facade (multi-layer merged-graph
simplification, sibling-pair/duplicate-edge interaction, forced
vertices, one-loop polygon simplification).

Each test cites its reference source line in s2builder_test.cc.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernel.builder import (
    IdentitySnapFunction,
    IntLatLngSnapFunction,
)
from s2geometry_spark.kernel.contains import parse_points
from s2geometry_spark.kernel.coords import latlng_to_xyz, xyz_to_latlng
from s2geometry_spark.kernel.graph import DIRECTED, DISCARD, MERGE, UNDIRECTED, WALK
from s2geometry_spark.kernel.layers import (
    Builder,
    PolygonLayer,
    PolylineLayer,
    PolylineVectorLayer,
)
from s2geometry_spark.kernel.predicates import crossing_sign

_INTERSECTION_ERROR = 8 * (0.5 * 2.220446049250313e-16)


def _pt(lat, lng):
    x, y, z = latlng_to_xyz(np.float64(lat), np.float64(lng))
    return np.array([float(x), float(y), float(z)])


def _lls(v, nd=6):
    lat, lng = xyz_to_latlng(v[:, 0], v[:, 1], v[:, 2])
    return [(round(float(a), nd), round(float(b), nd))
            for a, b in zip(lat, lng)]


# --- NearbyVerticesSnappedWithZeroSnapRadiusEdgeSplitting (cc:474-502) ------


def test_nearby_vertices_snapped_with_zero_snap_radius_edge_splitting():
    """With split_crossing_edges and snap radius ZERO, edges still snap
    to sites within S2::kIntersectionError (the edge snap radius), while
    vertices are never merged."""
    b = Builder(IdentitySnapFunction(0.0), split_crossing_edges=True)
    layer = PolylineVectorLayer(polyline_type=WALK)
    b.start_layer(layer)
    b.add_polyline(parse_points("0:180, 0:3"))
    # distinct from 0:180 yet so close that 0:180 is the nearest
    # representable S2LatLng (the reference's comment, cc:489-492)
    near180 = _pt(0.0, 179.9999999999999)
    b.add_polyline(np.stack([_pt(90, 180), near180]))
    b.add_polyline(parse_points("10:10, 1e-15:10"))
    err = b.build()
    assert err is None, err
    assert len(layer.polylines) == 3
    tip = _pt(1e-15, 10)
    expected = [
        np.stack([_pt(0, 180), near180, tip, _pt(0, 3)]),
        np.stack([_pt(90, 180), near180]),
        np.stack([_pt(10, 10), tip]),
    ]
    got = {tuple(map(tuple, p)) for p in layer.polylines}
    want = {tuple(map(tuple, p)) for p in expected}
    assert got == want


# --- NearbyIntersectionSnappedWithZeroSnapRadius (cc:505-517) ---------------


def test_nearby_intersection_snapped_with_zero_snap_radius():
    """AddIntersection + intersection_tolerance: the point becomes a
    site and the nearby edge snaps through it."""
    b = Builder(IdentitySnapFunction(0.0),
                intersection_tolerance=_INTERSECTION_ERROR)
    layer = PolylineLayer()
    b.start_layer(layer)
    b.add_polyline(parse_points("0:0, 0:10"))
    b.add_intersection(_pt(1e-16, 5))
    err = b.build()
    assert err is None, err
    expected = np.stack([_pt(0, 0), _pt(1e-16, 5), _pt(0, 10)])
    assert np.array_equal(layer.polyline, expected)


def test_add_intersection_requires_tolerance():
    b = Builder(IdentitySnapFunction(0.0))
    with pytest.raises(AssertionError):
        b.add_intersection(_pt(0, 1))


# --- TopologyPreservedWithZeroSnapRadiusEdgeSplitting (cc:519-580) ----------


def test_topology_preserved_with_zero_snap_radius_edge_splitting():
    """Snapping AB to the forced vertices X, Y moves the segment XY
    further from AB than vertex C; the builder must add a separation
    site Z near C's projection so the snapped edge stays on the correct
    side of C (the check_all_site_crossings branch,
    s2builder.cc:1018-1043)."""
    b = Builder(IdentitySnapFunction(0.0), split_crossing_edges=True,
                idempotent=False)
    layer = PolylineVectorLayer(polyline_type=WALK)
    b.start_layer(layer)
    k_deg = math.degrees(_INTERSECTION_ERROR)
    a = _pt(0, -1)
    bb = _pt(0, 46)
    x = _pt(0.99 * k_deg, 0)
    y = _pt(0.99 * k_deg, 45)
    c = _pt(1.03 * k_deg, 22.5)
    d = _pt(10, 22.5)
    b.add_edge(a, bb)
    b.force_vertex(x)
    b.force_vertex(y)
    b.add_edge(c, d)
    err = b.build()
    assert err is None, err
    assert len(layer.polylines) == 2
    by_len = sorted(layer.polylines, key=len, reverse=True)
    axzyb, cd = by_len[0], by_len[1]
    # the input edge CD is unchanged
    assert np.array_equal(cd, np.stack([c, d]))
    # AB snapped to A, X, Z, Y, B (the reference pins Z printing as
    # "0:22.5"; we assert its projection location)
    assert len(axzyb) == 5
    assert np.array_equal(axzyb[0], a)
    assert np.array_equal(axzyb[1], x)
    assert np.array_equal(axzyb[3], y)
    assert np.array_equal(axzyb[4], bb)
    z = axzyb[2]
    lat_z, lng_z = xyz_to_latlng(z[None, 0], z[None, 1], z[None, 2])
    assert abs(float(lng_z[0]) - 22.5) < 1e-9
    assert abs(float(lat_z[0])) < 2 * k_deg
    # the key topology assertion (cc:576-578): the snapped segment
    # through Z passes on the correct side of C (no crossing with CD)
    assert crossing_sign(axzyb[1], axzyb[2], cd[0], cd[1]) < 0
    assert crossing_sign(axzyb[2], axzyb[3], cd[0], cd[1]) < 0


# --- SimplifyTwoLayers (cc:887-899) -----------------------------------------


@pytest.mark.parametrize("edge_type", [DIRECTED, UNDIRECTED])
def test_simplify_two_layers(edge_type):
    """Two layers that each simplify to one edge alone — but they cross,
    so the intersection vertex must survive in both outputs (the
    InteriorVertexMatcher's cross-layer adjacent-vertex limit)."""
    b = Builder(IdentitySnapFunction(math.radians(0.5)),
                split_crossing_edges=True, simplify_edge_chains=True)
    l1 = PolylineLayer(edge_type=edge_type)
    b.start_layer(l1)
    b.add_polyline(parse_points("-2:-1, -1:0, 1:0, 2:1"))
    l2 = PolylineLayer(edge_type=edge_type)
    b.start_layer(l2)
    b.add_polyline(parse_points("1:-2, 0:-1, 0:1, -1:2"))
    err = b.build()
    assert err is None, err
    assert _lls(l1.polyline) == [(-2.0, -1.0), (0.0, 0.0), (2.0, 1.0)]
    assert _lls(l2.polyline) == [(1.0, -2.0), (0.0, 0.0), (-1.0, 2.0)]


# --- SimplifyOneLoop (cc:901-930) -------------------------------------------


@pytest.mark.parametrize("edge_type", [DIRECTED, UNDIRECTED])
def test_simplify_one_loop(edge_type):
    """A 1000-vertex regular loop of radius 20° simplifies to 10-12
    vertices at a 1° snap radius (simplification tracks input EDGES,
    snapping alone tracks input VERTICES and would keep ~95)."""
    from s2geometry_spark.kernel.fractal import make_regular_points
    from s2geometry_spark.kernel.looprel import boundary_near

    snap_radius = math.radians(1.0)
    loop = np.asarray(
        make_regular_points(np.array([1.0, 0.0, 0.0]),
                            math.radians(20.0), 1000)
    ).reshape(-1, 3)
    b = Builder(IdentitySnapFunction(snap_radius),
                simplify_edge_chains=True)
    layer = PolygonLayer(edge_type=edge_type)
    b.start_layer(layer)
    b.add_loop(loop)
    err = b.build()
    assert err is None, err
    assert len(layer.loops) == 1
    assert 10 <= len(layer.loops[0]) <= 12
    assert boundary_near(layer.loops[0], loop, snap_radius)


# --- SimplifyRemovesSiblingPairs (cc:1052-1070) -----------------------------


def test_simplify_removes_sibling_pairs():
    snap = IntLatLngSnapFunction(0)  # E0 coordinates

    def run(simplify):
        b = Builder(snap, simplify_edge_chains=simplify)
        layer = PolylineVectorLayer(sibling_pairs=DISCARD)
        b.start_layer(layer)
        b.add_polyline(parse_points("0:0, 0:10"))
        b.add_polyline(parse_points("0:10, 0.6:5, 0:0"))
        err = b.build()
        assert err is None, err
        return [_lls(p, 4) for p in layer.polylines]

    # without simplification: no sibling pair (0.6:5 snaps to 1:5)
    assert run(False) == [[(0.0, 0.0), (0.0, 10.0), (1.0, 5.0), (0.0, 0.0)]]
    # with simplification: 0:10, 1:5, 0:0 straightens into the sibling
    # of 0:0, 0:10 and the requested DISCARD removes both
    assert run(True) == []


# --- SimplifyMergesDuplicateEdges (cc:1072-1090) ----------------------------


def test_simplify_merges_duplicate_edges():
    snap = IntLatLngSnapFunction(0)  # E0 coordinates

    def run(simplify):
        b = Builder(snap, simplify_edge_chains=simplify)
        layer = PolylineVectorLayer(duplicate_edges=MERGE)
        b.start_layer(layer)
        b.add_polyline(parse_points("0:0, 0:10"))
        b.add_polyline(parse_points("0:0, 0.6:5, 0:10"))
        err = b.build()
        assert err is None, err
        return sorted(_lls(p, 4) for p in layer.polylines)

    assert run(False) == sorted([
        [(0.0, 0.0), (0.0, 10.0)],
        [(0.0, 0.0), (1.0, 5.0), (0.0, 10.0)],
    ])
    assert run(True) == [[(0.0, 0.0), (0.0, 10.0)]]


# --- SimplifyKeepsForcedVertices through the Builder (cc:1087-1100) ---------


def test_simplify_keeps_forced_vertices_builder():
    b = Builder(IdentitySnapFunction(1e-15), simplify_edge_chains=True)
    layer = PolylineLayer()
    b.start_layer(layer)
    b.add_polyline(parse_points("0:0, 0:1, 0:2, 0:3"))
    b.force_vertex(parse_points("0:1")[0])
    err = b.build()
    assert err is None, err
    assert _lls(layer.polyline) == [(0.0, 0.0), (0.0, 1.0), (0.0, 3.0)]
