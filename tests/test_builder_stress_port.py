"""s2builder_test.cc final tranche: degenerate-edge merging under
simplify_edge_chains (Easy/Hard/MultipleLayers), GraphPersistence, and
reduced-iteration ports of the three randomized stress suites
(HighPrecisionStressTest, SelfIntersectionStressTest,
FractalStressTest) with our own seeded rng per FIXTURES.md policy.

Each test cites its reference source line in s2builder_test.cc.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernel.builder import (
    IdentitySnapFunction,
    IntLatLngSnapFunction,
    S2CellIdSnapFunction,
)
from s2geometry_spark.kernel.clipping import robust_cross_prod
from s2geometry_spark.kernel.contains import Loop, Polygon, parse_points
from s2geometry_spark.kernel.coords import xyz_to_latlng
from s2geometry_spark.kernel.fractal import (
    Fractal,
    frame_at,
    random_point,
    sample_cap_point,
)
from s2geometry_spark.kernel.graph import (
    DIRECTED,
    KEEP,
    UNDIRECTED,
    GraphOptions,
)
from s2geometry_spark.kernel.layers import Builder, PolygonLayer
from s2geometry_spark.kernel.measures import (
    curvature_max_error,
    loop_curvature,
)
from s2geometry_spark.kernel.predicates import sign as s2sign
from s2geometry_spark.kernel.validation import (
    find_loop_validation_error,
    find_polygon_validation_error,
)

_INTERSECTION_ERROR = 8 * (0.5 * 2.220446049250313e-16)
_INTERSECTION_MERGE_RADIUS = 2 * _INTERSECTION_ERROR


def _ll_str(v, nd=6):
    lat, lng = xyz_to_latlng(v[:, 0], v[:, 1], v[:, 2])
    return ", ".join(
        f"{round(float(a), nd)}:{round(float(b), nd)}"
        for a, b in zip(lat, lng)
    )


class _IdCheckingLayer:
    """InputEdgeIdCheckingLayer (cc:1110-1157)."""

    def __init__(self, expected, graph_options):
        self.expected = expected
        self._opts = graph_options

    def graph_options(self):
        return self._opts

    def build(self, g):
        actual = []
        for e in range(g.num_edges()):
            v0, v1 = g.edge(e)
            key = f"{_ll_str(g.vertex(v0)[None])}, {_ll_str(g.vertex(v1)[None])}"
            actual.append((key, tuple(sorted(g.input_edge_ids(e)))))
        want = []
        for s, ids in self.expected:
            pts = parse_points(s)
            key = f"{_ll_str(pts[:1])}, {_ll_str(pts[1:2])}"
            want.append((key, tuple(sorted(ids))))
        assert sorted(actual) == sorted(want), (
            f"\nactual={sorted(actual)}\nwant={sorted(want)}"
        )
        return None


def _test_input_edge_ids(inputs, expected, graph_options, snap=None,
                         **builder_kw):
    b = Builder(snap, **builder_kw)
    b.start_layer(_IdCheckingLayer(expected, graph_options))
    for s in inputs:
        b.add_polyline(parse_points(s))
    err = b.build()
    assert err is None, err


# --- SimplifyDegenerateEdgeMergingEasy (cc:1222-1243) -----------------------


def test_simplify_degenerate_edge_merging_easy():
    """InputEdgeIds on interior degenerate edges transfer to the
    simplified edge; degenerate edges at chain start/end do NOT merge."""
    _test_input_edge_ids(
        ["0:0, 0:0.1, 0:1.1, 0:1, 0:0.9, 0:2, 0:2.1"],
        [
            ("0:0, 0:0", (0,)),
            ("0:0, 0:2", (1, 2, 3, 4)),
            ("0:2, 0:2", (5,)),
        ],
        GraphOptions(degenerate_edges=KEEP),
        snap=IntLatLngSnapFunction(0),
        simplify_edge_chains=True,
    )


# --- SimplifyDegenerateEdgeMergingHard (cc:1245-1274) -----------------------


@pytest.mark.parametrize("edge_type", [DIRECTED, UNDIRECTED])
def test_simplify_degenerate_edge_merging_hard(edge_type):
    """Several overlapping chains in both directions with degenerate
    edges at the shared middle vertex: a degenerate edge contained in
    exactly one chain in input-edge order is assigned to that chain."""
    inputs = [
        "0:1, 0:1.1",                   # degenerate edge defined before chain
        "0:0, 0:1, 0:2",
        "0:0, 0:0.9, 0:1, 0:1.1, 0:2",  # degenerate edge defined in chain
        "0:2, 0:1, 0:0.9, 0:0",         # defined in chain, chain reversed
        "0:2, 0:1, 0:0", "0:1.1, 0:1", "0:1, 0:1.1",  # defined after chain
    ]
    expected = [
        ("0:0, 0:2", (0, 1, 2)),
        ("0:0, 0:2", (3, 4, 5, 6)),
        ("0:2, 0:0", (7, 8, 9)),
        ("0:2, 0:0", (10, 11, 12, 13)),
    ]
    if edge_type == UNDIRECTED:
        # four more simplified sibling edges without input edge ids
        expected += [
            ("0:0, 0:2", ()), ("0:0, 0:2", ()),
            ("0:2, 0:0", ()), ("0:2, 0:0", ()),
        ]
    _test_input_edge_ids(
        inputs, expected, GraphOptions(edge_type=edge_type),
        snap=IntLatLngSnapFunction(0), simplify_edge_chains=True,
    )


# --- SimplifyDegenerateEdgeMergingMultipleLayers (cc:1276-1318) --------------


def test_simplify_degenerate_edge_merging_multiple_layers():
    """Degenerate edges are assigned to an edge in the CORRECT LAYER when
    chains in different layers simplify identically."""
    inputs = [
        [
            "0.1:5, 0:5.2", "0.1:0, 0:9.9",   # defined before chain
            "0:10.1, 0:0.1", "0:3.1, 0:2.9",  # defined after chain
        ],
        [
            "0.1:3, 0:3.2", "-0.1:0, 0:4.1, 0:9.9",  # defined before chain
            "0.1:9.9, 0:7, 0.1:6.9, 0.1:0.2",        # defined inside chain
        ],
        [
            "0.2:0.3, 0.1:6, 0:5.9, 0.1:10.2",       # defined inside chain
            "0.1:0.1, 0:9.8", "0.1:2, 0:2.1",        # defined after chain
        ],
    ]
    expected = [
        [("0:0, 0:10", (0, 1)), ("0:10, 0:0", (2, 3))],
        [("0:0, 0:10", (4, 5, 6)), ("0:10, 0:0", (7, 8, 9))],
        [("0:0, 0:10", (10, 11, 12)), ("0:0, 0:10", (13, 14))],
    ]
    b = Builder(IntLatLngSnapFunction(0), simplify_edge_chains=True)
    for i in range(len(inputs)):
        b.start_layer(_IdCheckingLayer(expected[i], GraphOptions()))
        for s in inputs[i]:
            b.add_polyline(parse_points(s))
    err = b.build()
    assert err is None, err


# --- GraphPersistence (cc:789-806) ------------------------------------------


class _PersistenceLayer:
    """GraphPersistenceLayer analog: records the Graph it was built with
    plus a snapshot, so we can verify the graph remains intact after ALL
    layers have been built (per-layer graphs must not alias mutable
    builder state)."""

    def __init__(self, graphs, snapshots):
        self.graphs = graphs
        self.snapshots = snapshots

    def graph_options(self):
        return GraphOptions()

    def build(self, g):
        self.graphs.append(g)
        self.snapshots.append(
            ([tuple(g.edge(e)) for e in range(g.num_edges())],
             np.array(g.vertices, copy=True))
        )
        return None


def test_graph_persistence():
    rng = np.random.RandomState(20260819)
    graphs: list = []
    snapshots: list = []
    b = Builder()
    for _ in range(20):
        b.start_layer(_PersistenceLayer(graphs, snapshots))
        for _ in range(int(rng.randint(0, 10))):
            b.add_edge(random_point(rng), random_point(rng))
    err = b.build()
    assert err is None, err
    assert len(graphs) == 20
    for g, (edges, verts) in zip(graphs, snapshots):
        assert [tuple(g.edge(e)) for e in range(g.num_edges())] == edges
        assert np.array_equal(np.asarray(g.vertices), verts)


# --- HighPrecisionStressTest (cc:1355-1435, reduced iterations) --------------


def _point_on_line(a: np.ndarray, b: np.ndarray, r_rad: float) -> np.ndarray:
    """S2::GetPointOnLine: the point at distance r from a toward b."""
    d = b - float(a @ b) * a
    n = np.linalg.norm(d)
    if n == 0:
        d = robust_cross_prod(a, b)
        d = d / np.linalg.norm(d)
    else:
        d = d / n
    p = math.cos(r_rad) * a + math.sin(r_rad) * d
    return p / np.linalg.norm(p)


def _interpolate(a: np.ndarray, b: np.ndarray, t: float) -> np.ndarray:
    omega = math.acos(max(-1.0, min(1.0, float(a @ b))))
    return _point_on_line(a, b, t * omega)


def _log_uniform(rng, lo, hi) -> float:
    return math.exp(rng.uniform(math.log(lo), math.log(hi)))


def test_high_precision_stress():
    """Nearly-degenerate triangles with a forced vertex near the
    shortest edge, snapped at kIntersectionMergeRadius: the output must
    still form a single valid loop, and non-degenerate outputs must
    keep the input orientation (sign(v0,v1,v2) > 0 ⟺ IsNormalized)."""
    snap_radius = _INTERSECTION_MERGE_RADIUS
    # the reference also perturbs by snap_radius + S1ChordAngle error
    snap_radius_with_error = snap_radius * (1 + 4 * 2.22e-16) + 1e-30
    rng = np.random.RandomState(181)
    non_degenerate = 0
    num_iters = 150
    for _ in range(num_iters):
        v1 = random_point(rng)
        v0_dir = random_point(rng)
        d0 = _log_uniform(rng, 1e-16, 1.0)
        v0 = _point_on_line(v1, v0_dir, d0)
        d2 = 0.5 * d0 * math.pow(1e-16, rng.uniform(0.0, 1.0) ** 2)
        v2 = _point_on_line(v1, v0_dir, d2)
        v2 = sample_cap_point(rng, v2, 2 * snap_radius)
        if rng.randint(2):
            v0, v2 = v2, v0
        d3 = snap_radius if rng.randint(2) else snap_radius_with_error
        if rng.randint(3) == 0:
            d3 = 1.5 * rng.uniform(0.0, 1.0) * d3
        if rng.uniform() < 0.2:
            v3 = v1 if rng.randint(2) else v2
            v3 = _point_on_line(v3, random_point(rng), d3)
        else:
            v3 = _interpolate(v1, v2, _log_uniform(rng, 1e-16, 1.0))
            n = robust_cross_prod(v1, v2)
            v3 = _point_on_line(v3, n / np.linalg.norm(n), d3)
        b = Builder(IdentitySnapFunction(snap_radius), idempotent=False)
        layer = PolygonLayer()
        b.start_layer(layer)
        b.force_vertex(v3)
        b.add_edge(v0, v1)
        b.add_edge(v1, v2)
        b.add_edge(v2, v0)
        err = b.build()
        if err is not None or not layer.loops:
            continue
        assert len(layer.loops) == 1
        lv = layer.loops[0]
        assert find_loop_validation_error(lv) is None
        is_normalized = loop_curvature(lv) >= -curvature_max_error(lv)
        want_ccw = int(s2sign(v0[None], v1[None], v2[None])[0]) > 0
        assert want_ccw == is_normalized, (d0, d2, d3)
        non_degenerate += 1
    assert non_degenerate >= num_iters // 10


# --- SelfIntersectionStressTest (cc:1437-1487, reduced) ----------------------


def test_self_intersection_stress():
    """Random closed polylines inside tiny caps with
    split_crossing_edges: every output polygon must be valid."""
    rng = np.random.RandomState(433)
    for _ in range(4):
        center = random_point(rng)
        radius = _log_uniform(rng, 1e-14, 1e-2)
        snap = None
        if rng.randint(2):
            min_exp = IntLatLngSnapFunction.exponent_for_max_snap_radius(
                radius
            )
            exponent = min(IntLatLngSnapFunction.MAX_EXPONENT
                           if hasattr(IntLatLngSnapFunction, "MAX_EXPONENT")
                           else 10, min_exp + int(rng.randint(0, 5)))
            snap = IntLatLngSnapFunction(exponent)
        b = Builder(snap, split_crossing_edges=True)
        layer = PolygonLayer(edge_type=UNDIRECTED)
        b.start_layer(layer)
        verts = [sample_cap_point(rng, center, radius) for _ in range(40)]
        verts.append(verts[0])
        b.add_polyline(np.asarray(verts))
        err = b.build()
        assert err is None, err
        poly = Polygon([Loop(lv) for lv in layer.loops])
        assert find_polygon_validation_error(poly) is None


# --- FractalStressTest (cc:1489-1528, reduced) -------------------------------


def test_fractal_stress():
    """Fractal loops built through every snap-function family produce
    valid polygons."""
    rng = np.random.RandomState(997)
    for it in range(6):
        fractal = Fractal(rng)
        fractal.set_level_for_approx_max_edges(192)
        fractal.set_level_for_approx_min_edges(12)
        fractal.set_fractal_dimension(rng.uniform(1.5, 2.0))
        loop = fractal.make_loop(frame_at(rng, random_point(rng)),
                                 math.radians(20.0))
        verts = np.asarray(loop.vertices if hasattr(loop, "vertices")
                           else loop).reshape(-1, 3)
        fam = it % 3
        if fam == 0:
            snap = IntLatLngSnapFunction(int(rng.randint(0, 11)))
        elif fam == 1:
            snap = S2CellIdSnapFunction(int(rng.randint(0, 20)))
        else:
            snap = IdentitySnapFunction(
                math.radians(_log_uniform(rng, 1e-3, 10.0))
            )
        b = Builder(snap)
        layer = PolygonLayer()
        b.start_layer(layer)
        b.add_loop(verts)
        err = b.build()
        assert err is None, err
        poly = Polygon([Loop(lv) for lv in layer.loops])
        assert find_polygon_validation_error(poly) is None
