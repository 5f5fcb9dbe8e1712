"""s2edge_clipping_test.cc ports: the FaceClipping property harness
(GetFaceSegments chain exactness + ClipToPaddedFace angle-interval
union) and the EdgeClipping harness (ClipEdge/ClipEdgeBound maximality
against IntersectsRect).
"""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel.cell import _face_uv_to_xyz, _valid_face_xyz_to_uv
from s2geometry_spark.kernel.clipping import (
    EDGE_CLIP_ERROR_UV_COORD,
    FACE_CLIP_ERROR_RADIANS,
    FACE_CLIP_ERROR_UV_DIST,
    INTERSECTS_RECT_ERROR_UV_DIST,
    clip_edge,
    clip_edge_bound,
    clip_to_padded_face,
    get_clipped_edge_bound,
    get_face_segments,
    intersects_rect,
    robust_cross_prod,
)
from s2geometry_spark.kernel.fractal import random_point
from s2geometry_spark.kernel.intervals import S1Interval

DBL_EPSILON = 2.220446049250313e-16
# kEdgeClipErrorUVDist (s2edge_clipping.h:108)
EDGE_CLIP_ERROR_UV_DIST = 2.25 * DBL_EPSILON


def _norm(v):
    v = np.asarray(v, float)
    return v / np.linalg.norm(v)


def _angle(a, b) -> float:
    return math.atan2(np.linalg.norm(np.cross(a, b)), float(a @ b))


def check_face_clipping(rng, a, b):
    """TestFaceClipping (test.cc:24-110)."""
    a, b = _norm(a), _norm(b)
    segments = get_face_segments(a, b)
    n = len(segments)
    assert n >= 1

    # first/last vertices approximately equal A and B
    f0, a0, _ = segments[0]
    fn, _, bn = segments[-1]
    assert _angle(a, _norm(_face_uv_to_xyz(f0, a0[0], a0[1]))) <= \
        FACE_CLIP_ERROR_RADIANS
    assert _angle(b, _norm(_face_uv_to_xyz(fn, bn[0], bn[1]))) <= \
        FACE_CLIP_ERROR_RADIANS
    a_uv = _valid_face_xyz_to_uv(f0, a)
    b_uv = _valid_face_xyz_to_uv(fn, b)
    assert math.hypot(a_uv[0] - a0[0], a_uv[1] - a0[1]) <= \
        FACE_CLIP_ERROR_UV_DIST
    assert math.hypot(b_uv[0] - bn[0], b_uv[1] - bn[1]) <= \
        FACE_CLIP_ERROR_UV_DIST

    norm = _norm(robust_cross_prod(a, b))
    a_tangent = np.cross(norm, a)
    b_tangent = np.cross(b, norm)
    for i, (face, sa, sb) in enumerate(segments):
        assert max(abs(sa[0]), abs(sa[1])) <= 1 + 1e-15
        assert max(abs(sb[0]), abs(sb[1])) <= 1 + 1e-15
        if i == 0:
            continue
        pf, pa, pb = segments[i - 1]
        assert pf != face
        assert np.array_equal(
            _face_uv_to_xyz(pf, pb[0], pb[1]),
            _face_uv_to_xyz(face, sa[0], sa[1]),
        )
        p = _norm(_face_uv_to_xyz(face, sa[0], sa[1]))
        assert abs(float(p @ norm)) <= FACE_CLIP_ERROR_RADIANS
        assert float(p @ a_tangent) >= -FACE_CLIP_ERROR_RADIANS
        assert float(p @ b_tangent) >= -FACE_CLIP_ERROR_RADIANS

    # ClipToPaddedFace angle-interval union
    padding = 0.0 if rng.rand() < 0.1 else math.exp(
        rng.uniform(math.log(1e-15), math.log(1e-10))
    )
    x_axis, y_axis = a, a_tangent
    expected = S1Interval(0.0, _angle(a, b))
    max_angles = expected.expanded(FACE_CLIP_ERROR_RADIANS)
    actual = S1Interval.empty()
    for face in range(6):
        got = clip_to_padded_face(a, b, face, padding)
        if got is None:
            continue
        a_uv, b_uv = got
        a_clip = _norm(_face_uv_to_xyz(face, a_uv[0], a_uv[1]))
        b_clip = _norm(_face_uv_to_xyz(face, b_uv[0], b_uv[1]))
        assert abs(float(a_clip @ norm)) <= FACE_CLIP_ERROR_RADIANS
        assert abs(float(b_clip @ norm)) <= FACE_CLIP_ERROR_RADIANS
        if _angle(a_clip, a) > FACE_CLIP_ERROR_RADIANS:
            assert abs(max(abs(a_uv[0]), abs(a_uv[1])) - (1 + padding)) < 1e-12
        if _angle(b_clip, b) > FACE_CLIP_ERROR_RADIANS:
            assert abs(max(abs(b_uv[0]), abs(b_uv[1])) - (1 + padding)) < 1e-12
        a_ang = math.atan2(float(a_clip @ y_axis), float(a_clip @ x_axis))
        b_ang = math.atan2(float(b_clip @ y_axis), float(b_clip @ x_axis))
        face_angles = S1Interval.from_point_pair(a_ang, b_ang)
        assert max_angles.contains_interval(face_angles)
        actual = actual.union(face_angles)
    assert actual.expanded(FACE_CLIP_ERROR_RADIANS).contains_interval(expected)


def perturbed_corner_or_midpoint(rng, p, q):
    a = rng.randint(-1, 2) * p + rng.randint(-1, 2) * q
    r = rng.rand()
    if r < 0.1:
        a = a + math.exp(rng.uniform(math.log(1e-300), 0.0)) * random_point(rng)
    elif r < 0.55:
        a = a + 4 * DBL_EPSILON * random_point(rng)
    else:
        a = a + math.exp(
            rng.uniform(math.log(1e-25), math.log(1e-10))
        ) * random_point(rng)
    if float(a @ a) < 2.2250738585072014e-308:
        return perturbed_corner_or_midpoint(rng, p, q)
    return a


def test_face_clipping():
    """TEST(S2, FaceClipping) (test.cc:143-181), 250 random iterations
    of nearly-cube-edge edges + the 5 directed fixed cases."""
    rng = np.random.RandomState(51)
    fixed = [
        ([1, -0.5, -0.5], [1, 0.5, 0.5]),
        ([1, 0, 0], [0, 1, 0]),
        ([0.75, 0, -1], [0.75, 0, 1]),
        ([1, 0, 0.75], [0, 1, 0.75]),
        ([1, 0.9, 0.95], [-1, 0.95, 0.9]),
    ]
    for a, b in fixed:
        check_face_clipping(rng, np.array(a, float), np.array(b, float))
        check_face_clipping(rng, np.array(b, float), np.array(a, float))
    biunit = [(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)]
    for _ in range(250):
        face = rng.randint(6)
        i = rng.randint(4)
        j = (i + 1) & 3
        p = _face_uv_to_xyz(face, biunit[i][0], biunit[i][1])
        q = _face_uv_to_xyz(face, biunit[j][0], biunit[j][1])
        a = _norm(perturbed_corner_or_midpoint(rng, p, q))
        b = _norm(perturbed_corner_or_midpoint(rng, p, q))
        check_face_clipping(rng, a, b)


# ----------------------------------------------------------- edge clipping
K_ERROR = EDGE_CLIP_ERROR_UV_DIST + INTERSECTS_RECT_ERROR_UV_DIST


def _rect_tuple(clip, expand=0.0):
    return (
        clip[0][0] - expand, clip[0][1] + expand,
        clip[1][0] - expand, clip[1][1] + expand,
    )


def get_fraction(x, a, b):
    if a == b:
        return 0.0
    d = (b[0] - a[0], b[1] - a[1])
    n = math.hypot(*d)
    dirv = (d[0] / n, d[1] / n)
    ortho = (-dirv[1], dirv[0])
    assert abs((x[0] - a[0]) * ortho[0] + (x[1] - a[1]) * ortho[1]) <= K_ERROR
    return (x[0] - a[0]) * dirv[0] + (x[1] - a[1]) * dirv[1]


def check_point_on_boundary(p, a, clip):
    assert clip[0][0] <= p[0] <= clip[0][1]
    assert clip[1][0] <= p[1] <= clip[1][1]
    if p != a:
        q = (np.nextafter(p[0], a[0]), np.nextafter(p[1], a[1]))
        inside = (clip[0][0] <= q[0] <= clip[0][1]
                  and clip[1][0] <= q[1] <= clip[1][1])
        assert not inside


def choose_rect_point(rng, a, b):
    r = rng.rand()
    if r < 0.2:
        return a if rng.rand() < 0.5 else b
    if r < 0.2 + 0.8 / 3:
        t = rng.rand()
        return (a[0] + t * (b[0] - a[0]), a[1] + t * (b[1] - a[1]))
    return (
        a[0] + rng.rand() * (b[0] - a[0]),
        a[1] + rng.rand() * (b[1] - a[1]),
    )


def check_clip_edge(rng, a, b, clip):
    got = clip_edge(a, b, clip)
    if got is None:
        assert not intersects_rect(a, b, _rect_tuple(clip, -K_ERROR))
    else:
        ac, bc = got
        assert intersects_rect(a, b, _rect_tuple(clip, K_ERROR))
        assert get_fraction(ac, a, b) <= get_fraction(bc, a, b)
        check_point_on_boundary(ac, a, clip)
        check_point_on_boundary(bc, b, clip)
    p1 = choose_rect_point(rng, a, b)
    p2 = choose_rect_point(rng, a, b)
    initial_clip = [
        [min(p1[0], p2[0]), max(p1[0], p2[0])],
        [min(p1[1], p2[1]), max(p1[1], p2[1])],
    ]
    bound = get_clipped_edge_bound(a, b, initial_clip)
    if bound is None:
        return
    max_bound = [
        [max(bound[0][0], clip[0][0]), min(bound[0][1], clip[0][1])],
        [max(bound[1][0], clip[1][0]), min(bound[1][1], clip[1][1])],
    ]
    if not clip_edge_bound(a, b, clip, bound):
        if max_bound[0][0] <= max_bound[0][1] and max_bound[1][0] <= max_bound[1][1]:
            assert not intersects_rect(
                a, b,
                (max_bound[0][0] + K_ERROR, max_bound[0][1] - K_ERROR,
                 max_bound[1][0] + K_ERROR, max_bound[1][1] - K_ERROR),
            )
    else:
        assert intersects_rect(
            a, b,
            (max_bound[0][0] - K_ERROR, max_bound[0][1] + K_ERROR,
             max_bound[1][0] - K_ERROR, max_bound[1][1] + K_ERROR),
        )
        ai = int(a[0] > b[0])
        aj = int(a[1] > b[1])
        check_point_on_boundary(
            (bound[0][ai], bound[1][aj]), a, max_bound
        )
        check_point_on_boundary(
            (bound[0][1 - ai], bound[1][1 - aj]), b, max_bound
        )


def choose_endpoint_1d(rng, lo, hi):
    r = rng.rand()
    if r < 0.2:
        return lo if rng.rand() < 0.5 else hi
    c = rng.randint(3)
    if c == 0:
        return lo - rng.rand()
    if c == 1:
        return hi + rng.rand()
    return rng.uniform(lo, hi)


def choose_endpoint(rng, clip):
    if rng.rand() < 0.1:
        verts = [
            (clip[0][0], clip[1][0]),
            (clip[0][1], clip[1][0]),
            (clip[0][1], clip[1][1]),
            (clip[0][0], clip[1][1]),
        ]
        diag = rng.randint(2)
        t = rng.uniform(-1, 2)
        v0, v2 = verts[diag], verts[diag + 2]
        return ((1 - t) * v0[0] + t * v2[0], (1 - t) * v0[1] + t * v2[1])
    return (
        choose_endpoint_1d(rng, clip[0][0], clip[0][1]),
        choose_endpoint_1d(rng, clip[1][0], clip[1][1]),
    )


def test_edge_clipping():
    """TEST(S2, EdgeClipping) (test.cc:315-340): random rectangles +
    degenerate rectangles."""
    rng = np.random.RandomState(52)
    for _ in range(5):
        p = (rng.uniform(-1, 1), rng.uniform(-1, 1))
        q = (rng.uniform(-1, 1), rng.uniform(-1, 1))
        clip = [
            [min(p[0], q[0]), max(p[0], q[0])],
            [min(p[1], q[1]), max(p[1], q[1])],
        ]
        for _ in range(300):
            a = choose_endpoint(rng, clip)
            b = choose_endpoint(rng, clip)
            check_clip_edge(rng, a, b, clip)
    # degenerate rectangles: a point and a segment
    for clip in ([[0.3, 0.3], [-0.2, -0.2]], [[0.1, 0.4], [0.25, 0.25]]):
        for _ in range(200):
            a = choose_endpoint(rng, clip)
            b = choose_endpoint(rng, clip)
            check_clip_edge(rng, a, b, clip)
