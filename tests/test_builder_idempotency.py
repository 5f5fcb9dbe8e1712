"""s2builder_test.cc idempotency/topology tranche: inadequately
separated vertices snap, adequately separated output is a fixed point,
forced vertices preserve topology, and snapping never rotates cyclic
vertex order.
"""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel.builder import (
    IdentitySnapFunction,
    IntLatLngSnapFunction,
    S2CellIdSnapFunction,
)
from s2geometry_spark.kernel.contains import format_points, parse_points
from s2geometry_spark.kernel.graph import WALK
from s2geometry_spark.kernel.layers import (
    Builder,
    PolygonLayer,
    PolylineLayer,
    PolylineVectorLayer,
)
from s2geometry_spark.kernel.predicates import crossing_sign

# S2::kIntersectionError (s2edge_crossings.h): 8 * DBL_ERR radians
K_INTERSECTION_ERROR = 8 * (2.220446049250313e-16 / 2)


def test_idempotency_snaps_inadequately_separated_vertices():
    b = Builder(snap=IdentitySnapFunction(math.radians(1.0)))
    layer = PolylineLayer()
    b.start_layer(layer)
    b.add_polyline(parse_points("0:0, 0:0.9, 0:2"))
    assert b.build() is None
    assert format_points(layer.polyline) == "0:0, 0:2"


def test_idempotency_does_not_snap_adequately_separated_edges():
    """Already-snapped output is a fixed point of re-snapping."""
    def run(loops):
        b = Builder(snap=IntLatLngSnapFunction(0))
        layer = PolygonLayer()
        b.start_layer(layer)
        for lv in loops:
            b.add_loop(lv)
        assert b.build() is None
        return layer.loops

    out1 = run([parse_points("1.49:0, 0:2, 0.49:3")])
    assert len(out1) == 1
    assert format_points(out1[0]) in (
        "1:0, 0:2, 0:3", "0:2, 0:3, 1:0", "0:3, 1:0, 0:2"
    )
    out2 = run(out1)
    assert len(out2) == 1
    got1 = sorted(tuple(v) for v in out1[0])
    got2 = sorted(tuple(v) for v in out2[0])
    assert got1 == got2


def test_topology_preserved_with_forced_vertices():
    """test.cc TopologyPreservedWithForcedVertices: forced vertices pull
    a nearly-coincident edge without creating a crossing."""
    deg = math.degrees(K_INTERSECTION_ERROR)
    b = Builder(snap=IdentitySnapFunction(K_INTERSECTION_ERROR))
    layer = PolylineVectorLayer(polyline_type=WALK)
    b.start_layer(layer)
    a = parse_points("0:-1")[0]
    bb = parse_points("0:46")[0]
    x = parse_points(f"{0.99 * deg}:0")[0]
    y = parse_points(f"{0.99 * deg}:45")[0]
    c = parse_points(f"{1.03 * deg}:22.5")[0]
    d = parse_points("10:22.5")[0]
    b.add_edge(a, bb)
    b.force_vertex(x)
    b.force_vertex(y)
    b.force_vertex(c)
    b.add_edge(c, d)
    assert b.build() is None
    assert len(layer.polylines) == 2
    out0, out1 = layer.polylines
    # AB snapped through X and Y (5 vertices); CD stays separate
    assert len(out0) == 5
    assert len(out1) == 2
    # topology preserved: the snapped AB does not cross CD
    assert crossing_sign(out0[1], out0[2], out1[0], out1[1]) < 0


def test_snapping_does_not_rotate_vertices():
    loops = [
        parse_points(
            "49.9305505:-124.8345463, 49.9307448:-124.8299657, "
            "49.9332101:-124.8301996, 49.9331224:-124.8341368"
        ),
        parse_points(
            "49.9311087:-124.8327042, 49.9318176:-124.8312621, "
            "49.9318866:-124.8334451"
        ),
    ]
    b = Builder(snap=S2CellIdSnapFunction(30))
    layer = PolygonLayer()
    b.start_layer(layer)
    for lv in loops:
        b.add_loop(lv)
    assert b.build() is None
    assert len(layer.loops) == 2
    # same cyclic order: for each output loop there is an input loop
    # whose vertex sequence matches after rotation (within snap radius)
    from s2geometry_spark.kernel.distance import chord2, chord2_to_angle

    for got in layer.loops:
        matched = False
        for want in loops:
            if len(got) != len(want):
                continue
            for r in range(len(want)):
                rolled = np.roll(want, -r, axis=0)
                d = chord2_to_angle(chord2(got, rolled).max())
                if float(d) <= 2 * S2CellIdSnapFunction(30).snap_radius + 1e-15:
                    matched = True
                    break
            if matched:
                break
        assert matched
