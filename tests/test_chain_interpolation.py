"""ChainInterpolationQuery fixtures — port of
s2chain_interpolation_query_test.cc:38-330 (SimplePolylines, Distance,
Chains, GetLengthAtEdgeEmpty/Polyline/Polygon, Slice)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernel.coords import latlng_to_xyz, xyz_to_latlng
from s2geometry_spark.kernel.polyline import ChainInterpolationQuery

K_EPS = 1e-8


def _pts(ll):
    x, y, z = latlng_to_xyz(
        np.array([p[0] for p in ll], float), np.array([p[1] for p in ll], float)
    )
    return np.stack([x, y, z], -1)


def _lat_deg(p):
    lat, _ = xyz_to_latlng(
        np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
    )
    return float(lat[0])


def _lls(arr):
    lat, lng = xyz_to_latlng(arr[:, 0], arr[:, 1], arr[:, 2])
    return [(round(a, 6), round(b, 6)) for a, b in zip(lat, lng)]


def test_simple_polylines():
    # s2chain_interpolation_query_test.cc:38-135
    lat_b, lat_c = 1.0, 2.5
    total = lat_c
    a, b, c = _pts([(0, 0)])[0], _pts([(lat_b, 0)])[0], _pts([(lat_c, 0)])[0]

    q_empty = ChainInterpolationQuery(np.zeros((0, 3)))
    q_ac = ChainInterpolationQuery(np.asarray([a, c]))
    q_abc = ChainInterpolationQuery(np.asarray([a, b, c]))
    q_bb = ChainInterpolationQuery(np.asarray([b, b]))
    q_cc = ChainInterpolationQuery(np.asarray([c]))  # 1 vertex, 0 edges

    assert math.degrees(q_empty.get_length()) <= K_EPS
    assert abs(math.degrees(q_ac.get_length()) - total) <= K_EPS
    assert abs(math.degrees(q_abc.get_length()) - total) <= K_EPS
    assert math.degrees(q_bb.get_length()) <= K_EPS
    assert math.degrees(q_cc.get_length()) <= K_EPS

    r_inf = q_ac.at_distance(math.inf)
    assert r_inf.valid
    assert np.linalg.norm(r_inf.point - c) < 1e-12

    distances = [-1.0, 0.0, 1.0e-8, lat_b / 2, lat_b - 1.0e-7, lat_b,
                 lat_b + 1.0e-5, lat_b + 0.5, lat_c - 10.0e-7, lat_c,
                 lat_c + 10.0e-16, 1.0e6]
    for d in distances:
        frac = d / total
        assert not q_empty.at_fraction(frac).valid
        assert not q_cc.at_fraction(frac).valid
        lat = min(max(d, 0.0), total)
        want_edge = 0 if d < lat_b else 1

        r_ac = q_ac.at_fraction(frac)
        r_abc = q_abc.at_fraction(frac)
        r_bb = q_bb.at_fraction(frac)
        assert r_ac.valid and r_abc.valid and r_bb.valid
        assert abs(_lat_deg(r_ac.point) - lat) <= K_EPS
        assert abs(_lat_deg(r_abc.point) - lat) <= K_EPS
        assert np.linalg.norm(r_bb.point - b) < 1e-12
        assert r_ac.edge_id == 0
        assert r_bb.edge_id == 0
        assert r_abc.edge_id == want_edge, d


def test_distance():
    # s2chain_interpolation_query_test.cc:136-190 (degenerate edges,
    # duplicate vertices, tiny edges)
    distances = [-1.0, -1.0e-8, 0.0, 1.0e-8, 0.2, 0.5, 1.0 - 1.0e-8, 1.0,
                 1.0 + 1.0e-8, 1.2, 1.2, 1.2 + 1.0e-10, 1.5, 1.999999, 2.0,
                 2.00000001, 1.0e6]
    lats = [0, 0, 1.0e-7, 0.1, 0.2, 0.2, 0.6, 0.999999, 0.999999, 1, 1,
            1.000001, 1.000001, 1.1, 1.2, 1.2000001, 1.7, 1.99999999, 2]
    vertices = _pts([(lat, 0) for lat in lats])
    q = ChainInterpolationQuery(vertices)
    n_edges = len(vertices) - 1
    total = 2.0

    assert abs(math.degrees(q.get_length()) - total) <= K_EPS
    for d in distances:
        r = q.at_distance(math.radians(d))
        assert r.valid
        lat = _lat_deg(r.point)
        if d < 0:
            assert lat == pytest.approx(0, abs=1e-12)
            assert r.edge_id == 0
            assert math.degrees(r.distance) == pytest.approx(0.0, abs=1e-12)
        elif d > 2:
            assert lat == pytest.approx(2, abs=K_EPS)
            assert r.edge_id == n_edges - 1
            assert math.degrees(r.distance) == pytest.approx(total, abs=K_EPS)
        else:
            assert lat == pytest.approx(d, abs=K_EPS)
            assert 0 <= r.edge_id < n_edges
            assert lats[r.edge_id] <= lat + 1e-12
            assert lat <= lats[r.edge_id + 1] + 1e-12
            assert math.degrees(r.distance) == pytest.approx(d, abs=K_EPS)


def test_chains():
    # s2chain_interpolation_query_test.cc:191-217: two 2-vertex loops
    # (closed chains); chain_id selects one chain's edges
    loops = [_pts([(0, 0), (1, 0)]), _pts([(2, 0), (3, 0)])]
    q = ChainInterpolationQuery(loops, closed=True)
    q0 = ChainInterpolationQuery(loops, closed=True, chain_id=0)
    q1 = ChainInterpolationQuery(loops, closed=True, chain_id=1)

    r = q.at_fraction(0.25)
    r0 = q0.at_fraction(0.25)
    r1 = q1.at_fraction(0.25)
    assert r.valid and r0.valid and r1.valid
    assert _lat_deg(r.point) == pytest.approx(1, abs=K_EPS)
    assert _lat_deg(r0.point) == pytest.approx(0.5, abs=K_EPS)
    assert _lat_deg(r1.point) == pytest.approx(2.5, abs=K_EPS)


def test_get_length_at_edge_empty():
    # s2chain_interpolation_query_test.cc:218-223
    q = ChainInterpolationQuery(np.zeros((0, 3)))
    assert q.get_length_at_edge_end(0) == 0.0


def test_get_length_at_edge_polyline():
    # s2chain_interpolation_query_test.cc:224-241
    v = _pts([(0, 0), (0, 1), (0, 3), (0, 6)])
    q = ChainInterpolationQuery(v)
    assert math.degrees(q.get_length()) == pytest.approx(6.0, abs=1e-9)
    assert q.get_length_at_edge_end(-100) == math.inf
    assert math.degrees(q.get_length_at_edge_end(0)) == pytest.approx(1.0, abs=1e-9)
    assert math.degrees(q.get_length_at_edge_end(1)) == pytest.approx(3.0, abs=1e-9)
    assert math.degrees(q.get_length_at_edge_end(2)) == pytest.approx(6.0, abs=1e-9)
    assert q.get_length_at_edge_end(100) == math.inf


def test_get_length_at_edge_polygon():
    # s2chain_interpolation_query_test.cc:242-296
    loops = [
        _pts([(1, 1), (2, 1), (2, 3), (1, 3)]),
        _pts([(0, 0), (0, 4), (3, 4), (3, 0)]),
    ]
    tol = 0.01
    q0 = ChainInterpolationQuery(loops, closed=True, chain_id=0)
    assert math.degrees(q0.get_length()) == pytest.approx(6.0, abs=tol)
    assert q0.get_length_at_edge_end(-100) == math.inf
    assert math.degrees(q0.get_length_at_edge_end(0)) == pytest.approx(1.0, abs=tol)
    assert math.degrees(q0.get_length_at_edge_end(1)) == pytest.approx(3.0, abs=tol)
    assert math.degrees(q0.get_length_at_edge_end(2)) == pytest.approx(4.0, abs=tol)
    assert math.degrees(q0.get_length_at_edge_end(3)) == pytest.approx(6.0, abs=tol)
    for e in (4, 5, 6, 7, 100):
        assert q0.get_length_at_edge_end(e) == math.inf

    q1 = ChainInterpolationQuery(loops, closed=True, chain_id=1)
    assert math.degrees(q1.get_length()) == pytest.approx(14.0, abs=tol)
    for e in (-100, 0, 1, 2, 3, 100):
        assert q1.get_length_at_edge_end(e) == math.inf
    assert math.degrees(q1.get_length_at_edge_end(4)) == pytest.approx(4.0, abs=tol)
    assert math.degrees(q1.get_length_at_edge_end(5)) == pytest.approx(7.0, abs=tol)
    assert math.degrees(q1.get_length_at_edge_end(6)) == pytest.approx(11.0, abs=tol)
    assert math.degrees(q1.get_length_at_edge_end(7)) == pytest.approx(14.0, abs=tol)


def test_slice():
    # s2chain_interpolation_query_test.cc:297-311
    q_empty = ChainInterpolationQuery(np.zeros((0, 3)))
    assert len(q_empty.slice(0, 1)) == 0

    q = ChainInterpolationQuery(_pts([(0, 0), (0, 1), (0, 2)]))
    assert _lls(q.slice(0, 1)) == [(0, 0), (0, 1), (0, 2)]
    assert _lls(q.slice(0, 0.5)) == [(0, 0), (0, 1)]
    assert _lls(q.slice(1, 0.5)) == [(0, 2), (0, 1)]
    assert _lls(q.slice(0.25, 0.75)) == [(0, 0.5), (0, 1), (0, 1.5)]
