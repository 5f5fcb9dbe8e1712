"""S2Polyline query operations beyond length/interpolate.

Ports (semantics, re-derived in NumPy):
  - Project / UnInterpolate           s2polyline.cc:278-325
  - Intersects(polyline)              s2polyline.cc:356-374
  - SubsampleVertices / FindEndVertex s2polyline.cc:568-657
    (pie-wedge greedy simplification: the ray from each start vertex
    must pass through the tolerance discs of all skipped vertices)
"""

from __future__ import annotations

import math

import numpy as np

from . import predicates as P
from .distance import point_edge_dist2
from .intervals import S1Interval
from .measures import stable_angle
from .predicates import crossing_sign, ortho


def _get_frame(z: np.ndarray) -> np.ndarray:
    """S2::GetFrame (s2pointutil.cc:85-90): columns (x, y, z) with
    y = Ortho(z), x = y × z."""
    y = ortho(z)
    x = np.cross(y, z)
    return np.stack([x, y, z], axis=1)  # columns


def _to_frame(frame: np.ndarray, p: np.ndarray) -> np.ndarray:
    return frame.T @ p


def project(vertices: np.ndarray, point: np.ndarray) -> tuple[np.ndarray, int]:
    """S2Polyline::Project: (closest point on the polyline, next_vertex).

    next_vertex is the index of the vertex *after* the closest point
    (s2polyline.cc:296-325); if the closest point equals vertex(i), the
    reference returns i+1.
    """
    v = np.asarray(vertices, float).reshape(-1, 3)
    x = np.asarray(point, float).reshape(3)
    if len(v) == 1:
        return v[0], 1
    d2 = point_edge_dist2(x[None], v[:-1], v[1:])[0]
    min_index = int(np.argmin(d2)) + 1
    a, b = v[min_index - 1], v[min_index]
    closest = _project_to_edge(x, a, b)
    nxt = min_index + (1 if bool(np.all(closest == b)) else 0)
    return closest, nxt


def _project_to_edge(x: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """S2::Project (s2edge_distances.cc:286-322)."""
    if np.all(x == a):
        return a
    if np.all(x == b):
        return b
    n = np.cross(a, b)
    nn = np.linalg.norm(n)
    if nn == 0:
        return a if ((x - a) ** 2).sum() <= ((x - b) ** 2).sum() else b
    n = n / nn
    p = np.cross(np.cross(n, x), n)
    pn = np.linalg.norm(p)
    if pn == 0:
        return a if ((x - a) ** 2).sum() <= ((x - b) ** 2).sum() else b
    p = p / pn
    # interior test: p strictly between a and b along the great circle
    if float(p @ np.cross(a, n)) < 0 and float(p @ np.cross(b, n)) > 0:
        return p
    return a if ((x - a) ** 2).sum() <= ((x - b) ** 2).sum() else b


def uninterpolate(vertices: np.ndarray, point: np.ndarray, next_vertex: int) -> float:
    """S2Polyline::UnInterpolate (s2polyline.cc:278-294)."""
    v = np.asarray(vertices, float).reshape(-1, 3)
    if len(v) < 2:
        return 0.0
    seg = stable_angle(v[:-1], v[1:])
    length_to_point = float(seg[: next_vertex - 1].sum()) + float(
        stable_angle(v[next_vertex - 1], np.asarray(point, float))
    )
    total = float(seg.sum())
    if total <= 0:
        return 0.0
    return min(1.0, length_to_point / total)


def polylines_intersect(a_vertices: np.ndarray, b_vertices: np.ndarray) -> bool:
    """S2Polyline::Intersects (s2polyline.cc:356-374): any edge pair with
    CrossingSign ≥ 0 (crossing or shared vertex counts as intersecting,
    matching EdgeOrVertexCrossing there — the reference returns true on
    crossing > 0 or vertex-crossing)."""
    a = np.asarray(a_vertices, float).reshape(-1, 3)
    b = np.asarray(b_vertices, float).reshape(-1, 3)
    if len(a) < 2 or len(b) < 2:
        return False
    for i in range(len(a) - 1):
        for j in range(len(b) - 1):
            s = crossing_sign(a[i], a[i + 1], b[j], b[j + 1])
            if s > 0:
                return True
            if s == 0 and P.vertex_crossing(a[i], a[i + 1], b[j], b[j + 1]):
                return True
    return False


def _find_end_vertex(v: np.ndarray, tolerance_rad: float, index: int) -> int:
    """FindEndVertex (s2polyline.cc:568-641)."""
    origin = v[index]
    frame = _get_frame(origin)
    current_wedge = S1Interval.full()
    last_distance = 0.0
    n = len(v)
    index += 1
    while index < n:
        candidate = v[index]
        distance = float(stable_angle(origin, candidate))
        if distance > math.pi / 2 and last_distance > 0:
            break
        if distance < last_distance and last_distance > tolerance_rad:
            break
        last_distance = distance
        if distance <= tolerance_rad:
            index += 1
            continue
        direction = _to_frame(frame, candidate)
        center = math.atan2(direction[1], direction[0])
        if not current_wedge.contains(center):
            break
        half_angle = math.asin(
            min(1.0, math.sin(tolerance_rad) / math.sin(distance))
        )
        target = S1Interval.from_point(center).expanded(half_angle)
        current_wedge = current_wedge.intersection(target)
        index += 1
    return index - 1


def subsample_vertices(vertices: np.ndarray, tolerance_rad: float) -> list[int]:
    """S2Polyline::SubsampleVertices (s2polyline.cc:645-657): greedy
    maximal skips such that the simplified polyline stays within the
    tolerance of every skipped vertex, in order."""
    v = np.asarray(vertices, float).reshape(-1, 3)
    if len(v) == 0:
        return []
    indices = [0]
    tol = max(tolerance_rad, 0.0)
    index = 0
    while index + 1 < len(v):
        next_index = _find_end_vertex(v, tol, index)
        if not np.all(v[next_index] == v[index]):
            indices.append(next_index)
        index = next_index
    return indices
