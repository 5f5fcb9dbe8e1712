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


def point_on_line(a: np.ndarray, b: np.ndarray, angle_rad: float) -> np.ndarray:
    """S2::GetPointOnLine: the point at `angle_rad` from A along the
    great circle through A towards B (may extrapolate past B)."""
    a = np.asarray(a, float).reshape(3)
    b = np.asarray(b, float).reshape(3)
    d = b - (b @ a) * a
    nd = np.linalg.norm(d)
    if nd == 0:
        return a.copy()
    d = d / nd
    return math.cos(angle_rad) * a + math.sin(angle_rad) * d


class ChainInterpolationResult:
    """S2ChainInterpolationQuery::Result (s2chain_interpolation_query.h)."""

    __slots__ = ("valid", "point", "edge_id", "distance")

    def __init__(self, valid=False, point=None, edge_id=-1, distance=0.0):
        self.valid = valid
        self.point = point
        self.edge_id = edge_id
        self.distance = distance


class ChainInterpolationQuery:
    """Port of S2ChainInterpolationQuery (s2chain_interpolation_query.cc):
    locate points at a distance / fraction along the edges of a shape,
    report cumulative lengths at edge ends, and extract vertex slices.

    `chains` is a list of vertex arrays; `closed=True` treats each chain
    as a loop (polygon semantics: the closing edge counts).  Edge ids are
    global across chains in order; `chain_id >= 0` restricts the query to
    one chain's edge range (s2chain_interpolation_query.cc:28-66)."""

    def __init__(self, chains, closed: bool = False, chain_id: int = -1):
        if isinstance(chains, np.ndarray):
            chains = [chains]
        chains = [np.asarray(c, float).reshape(-1, 3) for c in chains]
        self._edges: list[tuple[np.ndarray, np.ndarray]] = []
        chain_ranges = []
        for c in chains:
            start = len(self._edges)
            for i in range(len(c) - 1):
                self._edges.append((c[i], c[i + 1]))
            if closed and len(c) >= 2:
                self._edges.append((c[-1], c[0]))
            chain_ranges.append((start, len(self._edges)))
        if chain_id >= 0:
            self._first, end = chain_ranges[chain_id]
            self._last = end - 1
        else:
            self._first, self._last = 0, len(self._edges) - 1
        cum = []
        acc = 0.0
        from .measures import stable_angle

        for i in range(self._first, self._last + 1):
            cum.append(acc)
            a, b = self._edges[i]
            acc += float(stable_angle(a[None], b[None])[0])
        if cum:
            cum.append(acc)
        self._cum = np.asarray(cum)

    def get_length(self) -> float:
        return 0.0 if len(self._cum) == 0 else float(self._cum[-1])

    def get_length_at_edge_end(self, edge_id: int) -> float:
        """s2chain_interpolation_query.cc:76-86: Infinity for edge ids
        outside the chain's range."""
        if len(self._cum) == 0:
            return 0.0
        if edge_id < self._first or edge_id > self._last:
            return math.inf
        return float(self._cum[edge_id - self._first + 1])

    def at_distance(self, distance_rad: float) -> ChainInterpolationResult:
        """s2chain_interpolation_query.cc:88-117: clamp to [0, length];
        binary search the cumulative values."""
        if len(self._cum) == 0:
            return ChainInterpolationResult()
        i = int(np.searchsorted(self._cum, distance_rad, side="left"))
        if i == 0:
            return ChainInterpolationResult(
                True, self._edges[self._first][0].copy(), self._first,
                float(self._cum[0]),
            )
        if i == len(self._cum):
            return ChainInterpolationResult(
                True, self._edges[self._last][1].copy(), self._last,
                float(self._cum[-1]),
            )
        edge_id = i - 1 + self._first
        a, b = self._edges[edge_id]
        return ChainInterpolationResult(
            True,
            point_on_line(a, b, distance_rad - float(self._cum[i - 1])),
            edge_id,
            float(distance_rad),
        )

    def at_fraction(self, fraction: float) -> ChainInterpolationResult:
        return self.at_distance(fraction * self.get_length())

    def slice(self, begin_fraction: float, end_fraction: float) -> np.ndarray:
        """s2chain_interpolation_query.cc:125-160: the vertex chain
        between two fractions (reversed when begin > end)."""
        if len(self._cum) == 0:
            return np.zeros((0, 3))
        reverse = begin_fraction > end_fraction
        if reverse:
            begin_fraction, end_fraction = end_fraction, begin_fraction
        res = self.at_fraction(begin_fraction)
        out = [res.point]
        last = res.point
        begin_edge = res.edge_id
        res_end = self.at_fraction(end_fraction)
        for edge_id in range(begin_edge, res_end.edge_id):
            v1 = self._edges[edge_id][1]
            if not np.array_equal(last, v1):
                last = v1
                out.append(v1)
        out.append(res_end.point)
        arr = np.asarray(out).reshape(-1, 3)
        return arr[::-1].copy() if reverse else arr


def get_length(vertices: np.ndarray) -> float:
    """S2::GetLength (s2polyline_measures.cc:28-34), radians."""
    v = np.asarray(vertices, float).reshape(-1, 3)
    if len(v) < 2:
        return 0.0
    a, b = v[:-1], v[1:]
    cross = np.linalg.norm(np.cross(a, b), axis=1)
    dots = (a * b).sum(1)
    return float(np.arctan2(cross, dots).sum())


def get_centroid(vertices: np.ndarray) -> np.ndarray:
    """S2::GetCentroid over a polyline (s2polyline_measures.cc:36-43):
    sum of edge TrueCentroids (not normalized)."""
    from .measures import edge_true_centroid

    v = np.asarray(vertices, float).reshape(-1, 3)
    out = np.zeros(3)
    for i in range(1, len(v)):
        out = out + edge_true_centroid(v[i - 1], v[i])
    return out


def get_suffix(vertices: np.ndarray, fraction: float) -> tuple[np.ndarray, int]:
    """S2Polyline::GetSuffix (s2polyline.cc): the interpolated point and
    the next vertex index."""
    v = np.asarray(vertices, float).reshape(-1, 3)
    n = len(v)
    if fraction <= 0:
        return v[0], 1
    target = fraction * get_length(v)
    for i in range(1, n):
        a, b = v[i - 1], v[i]
        length = math.atan2(
            float(np.linalg.norm(np.cross(a, b))), float(a @ b)
        )
        if target < length:
            result = point_on_line(a, b, target)
            nxt = i + 1 if np.array_equal(result, b) else i
            return result, nxt
        target -= length
    return v[n - 1], n


def interpolate(vertices: np.ndarray, fraction: float) -> np.ndarray:
    return get_suffix(vertices, fraction)[0]


def is_on_right(vertices: np.ndarray, point: np.ndarray) -> bool:
    """S2Polyline::IsOnRight (s2polyline.cc): locally right of the
    polyline; polyline vertices themselves are not on the right."""
    from .predicates import ordered_ccw, sign

    v = np.asarray(vertices, float).reshape(-1, 3)
    p = np.asarray(point, float)
    closest, next_vertex = project(v, p)
    if (np.array_equal(closest, v[next_vertex - 1]) and 1 < next_vertex
            < len(v)):
        if np.array_equal(p, v[next_vertex - 1]):
            return False
        return ordered_ccw(
            v[next_vertex - 2], p, v[next_vertex], v[next_vertex - 1]
        )
    if next_vertex == len(v):
        next_vertex -= 1
    return int(sign(p[None], v[next_vertex][None],
                    v[next_vertex - 1][None])[0]) > 0


def approx_equals(a: np.ndarray, b: np.ndarray, max_error_rad: float) -> bool:
    """S2Polyline::ApproxEquals (s2polyline.cc:190-198): identical vertex
    counts with every vertex pair within max_error."""
    a = np.asarray(a, float).reshape(-1, 3)
    b = np.asarray(b, float).reshape(-1, 3)
    if len(a) != len(b):
        return False
    if len(a) == 0:
        return True
    d = np.linalg.norm(a - b, axis=1)
    return bool((2.0 * np.arcsin(np.minimum(1.0, 0.5 * d)) <= max_error_rad).all())


def _next_distinct_vertex(v: np.ndarray, index: int) -> int:
    """NextDistinctVertex (s2polyline.cc:686-694): smallest i > index with
    vertex(i) bit-different from vertex(index); len(v) if none."""
    initial = v[index]
    index += 1
    while index < len(v) and np.array_equal(v[index], initial):
        index += 1
    return index


def nearly_covers(cover: np.ndarray, covered: np.ndarray,
                  max_error_rad: float) -> bool:
    """S2Polyline::NearlyCovers (s2polyline.cc:708-801): true when a car
    can drive along `covered` start-to-end while a second car drives
    monotonically along `cover` staying within max_error — a DFS over
    (i, j, i_in_progress) search states with a visited set, worst case
    O((n*m) log(n*m))."""
    import math

    from .distance import is_edge_b_near_edge_a

    cover = np.asarray(cover, float).reshape(-1, 3)
    covered = np.asarray(covered, float).reshape(-1, 3)
    if len(covered) == 0:
        return True
    if len(cover) == 0:
        return False

    def ang(x, y):
        d = math.sqrt(((x - y) ** 2).sum())
        return 2.0 * math.asin(min(1.0, 0.5 * d))

    pending: list[tuple[int, int, bool]] = []
    done: set[tuple[int, int, bool]] = set()

    # all possible starting states: edges of `cover` within max_error of
    # covered[0]; end vertices excluded except on the last distinct edge
    i = 0
    next_i = _next_distinct_vertex(cover, 0)
    while next_i < len(cover):
        next_next_i = _next_distinct_vertex(cover, next_i)
        closest = _project_to_edge(covered[0], cover[i], cover[next_i])
        if (
            next_next_i == len(cover)
            or not np.array_equal(closest, cover[next_i])
        ) and ang(closest, covered[0]) <= max_error_rad:
            pending.append((i, 0, True))
        i, next_i = next_i, next_next_i

    while pending:
        state = pending.pop()
        if state in done:
            continue
        done.add(state)
        si, sj, i_in_progress = state
        next_i = _next_distinct_vertex(cover, si)
        next_j = _next_distinct_vertex(covered, sj)
        if next_j == len(covered):
            return True
        if next_i == len(cover):
            continue
        if i_in_progress:
            j_begin = covered[sj]
            i_begin = _project_to_edge(j_begin, cover[si], cover[next_i])
        else:
            i_begin = cover[si]
            j_begin = _project_to_edge(i_begin, covered[sj], covered[next_j])
        if is_edge_b_near_edge_a(
            j_begin, covered[next_j], i_begin, cover[next_i], max_error_rad
        ):
            pending.append((next_i, sj, False))
        if is_edge_b_near_edge_a(
            i_begin, cover[next_i], j_begin, covered[next_j], max_error_rad
        ):
            pending.append((si, next_j, True))
    return False


def get_snap_level(vertices: np.ndarray) -> int:
    """S2Polyline::GetSnapLevel (s2polyline.cc:225-241): the single cell
    level every vertex is a center of, else -1."""
    from .coords import xyz_to_face_siti

    v = np.asarray(vertices, float).reshape(-1, 3)
    if len(v) == 0:
        return -1
    _f, _si, _ti, level = xyz_to_face_siti(v[:, 0], v[:, 1], v[:, 2])
    level = np.asarray(level)
    if (level < 0).any():
        return -1
    if (level != level[0]).any():
        return -1
    return int(level[0])


def init_to_simplified(vertices: np.ndarray, snap) -> np.ndarray:
    """S2Polyline::InitToSimplified (s2polyline.cc): builder snap with
    simplify_edge_chains=true — kernel.builder.simplify_snapped_polylines
    over a single layer."""
    from .builder import simplify_snapped_polylines

    out = simplify_snapped_polylines([np.asarray(vertices, float)], snap)
    return out[0] if out else np.zeros((0, 3))
