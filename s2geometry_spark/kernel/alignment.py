"""S2Polyline vertex alignment — Dynamic Timewarp, medoid, DBA consensus.

Ports (semantics, re-derived in NumPy):
  - ColumnStride / Window (validity, Upsample, Dilate, DebugString)
      s2polyline_alignment_internal.h:40-152, s2polyline_alignment.cc:41-158
  - DynamicTimewarp (windowed DP fill + walk-back path recovery)
      s2polyline_alignment.cc:186-252
  - GetExactVertexAlignment / GetExactVertexAlignmentCost
      s2polyline_alignment.cc:273-302
  - GetApproxVertexAlignment (FastDTW: HalfResolution -> recurse ->
      Upsample+Dilate window)                 s2polyline_alignment.cc:304-346
  - HalfResolution                            s2polyline_alignment.cc:253-261
  - GetMedoidPolyline / GetConsensusPolyline (Dynamic Timewarp
      Barycenter Averaging)                   s2polyline_alignment.cc:348-429

Alignment cost is the summed CHORDAL distance ``|a_i - b_j|`` (the
Euclidean norm between the unit vectors, NOT squared and NOT the
spherical angle — s2polyline_alignment.h:100-112) over the warp path.

The reference fills the DP table cell-by-cell:
    table[r][c] = w[r][c] + min(diag, up, left).
A per-cell Python loop would be the row-at-a-time wall this repo
avoids, so each row is evaluated in closed form instead: with
    m[c] = min(prev[c-1], prev[c])        (the diag/up candidates)
the in-row left recursion  c[j] = w[j] + min(m[j], c[j-1])  unrolls to
    c[j] = S[j] + min_{k<=j} (m[k] - S[k-1]),   S = prefix sum of w,
i.e. one cumsum + one minimum.accumulate per row.  The walk-back
re-derives step directions from the finished table with the exact
reference preference order (diag, then up, then left,
s2polyline_alignment.cc:236-250), so tie-breaking matches.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "window_from_warp_path",
    "validate_window",
    "upsample_window",
    "dilate_window",
    "window_debug_string",
    "half_resolution",
    "dynamic_timewarp",
    "exact_alignment_cost",
    "exact_alignment",
    "approx_alignment",
    "medoid_polyline",
    "consensus_polyline",
    "polylines_approx_equal",
]

_INF = np.inf

# Switchover constants, determined experimentally by the reference
# (s2polyline_alignment.cc:308-311).
_SIZE_SWITCHOVER = 32
_DENSITY_SWITCHOVER = 0.85


# ----------------------------------------------------------------- windows
#
# A window is an int64 array of shape (rows, 2): [start, end) column
# strides per row (s2polyline_alignment_internal.h:40-52).


def validate_window(strides: np.ndarray, cols: int) -> bool:
    """Window::IsValid (s2polyline_alignment.cc:140-158): contiguous
    non-empty strides, monotone starts and ends, corner cells filled."""
    s = np.asarray(strides, np.int64).reshape(-1, 2)
    if len(s) == 0 or cols <= 0 or s[0, 0] != 0 or s[-1, 1] != cols:
        return False
    if np.any(s[:, 1] <= s[:, 0]):
        return False
    if np.any(np.diff(s[:, 0]) < 0) or np.any(np.diff(s[:, 1]) < 0):
        return False
    return True


def window_from_warp_path(path: list[tuple[int, int]]) -> np.ndarray:
    """Window(WarpPath) (s2polyline_alignment.cc:51-79): per-row
    [min col, max col + 1] over the path's visits to that row."""
    if not path:
        raise ValueError("cannot construct window from empty warp path")
    if path[0] != (0, 0):
        raise ValueError("warp path must start at (0, 0)")
    p = np.asarray(path, np.int64)
    rows = int(p[-1, 0]) + 1
    strides = np.empty((rows, 2), np.int64)
    # Path rows are non-decreasing; np.minimum/maximum.at folds all
    # visits per row regardless of ordering.
    strides[:, 0] = np.iinfo(np.int64).max
    strides[:, 1] = -1
    np.minimum.at(strides[:, 0], p[:, 0], p[:, 1])
    np.maximum.at(strides[:, 1], p[:, 0], p[:, 1])
    strides[:, 1] += 1
    cols = int(p[-1, 1]) + 1
    if not validate_window(strides, cols):
        raise ValueError("warp path does not induce a valid window")
    return strides


def upsample_window(
    strides: np.ndarray, new_rows: int, new_cols: int
) -> np.ndarray:
    """Window::Upsample (s2polyline_alignment.cc:81-94)."""
    s = np.asarray(strides, np.int64).reshape(-1, 2)
    rows, cols = len(s), int(s[-1, 1])
    if new_rows < rows or new_cols < cols:
        raise ValueError("upsample target smaller than window")
    row_scale = new_rows / rows
    col_scale = new_cols / cols
    rr = np.arange(new_rows, dtype=np.float64)
    src = ((rr + 0.5) / row_scale).astype(np.int64)
    out = np.empty((new_rows, 2), np.int64)
    out[:, 0] = (col_scale * s[src, 0] + 0.5).astype(np.int64)
    out[:, 1] = (col_scale * s[src, 1] + 0.5).astype(np.int64)
    return out


def dilate_window(strides: np.ndarray, radius: int) -> np.ndarray:
    """Window::Dilate (s2polyline_alignment.cc:103-115): square
    structuring element of half-length `radius`."""
    if radius < 0:
        raise ValueError("negative dilation radius")
    s = np.asarray(strides, np.int64).reshape(-1, 2)
    rows, cols = len(s), int(s[-1, 1])
    rr = np.arange(rows)
    prev_row = np.maximum(0, rr - radius)
    next_row = np.minimum(rr + radius, rows - 1)
    out = np.empty_like(s)
    out[:, 0] = np.maximum(0, s[prev_row, 0] - radius)
    out[:, 1] = np.minimum(s[next_row, 1] + radius, cols)
    return out


def window_debug_string(strides: np.ndarray, cols: int | None = None) -> str:
    """Window::DebugString (s2polyline_alignment.cc:118-127)."""
    s = np.asarray(strides, np.int64).reshape(-1, 2)
    if cols is None:
        cols = int(s[-1, 1])
    lines = []
    for start, end in s:
        lines.append(
            "".join(" *" if start <= c < end else " ." for c in range(cols))
        )
    return "\n".join(lines) + "\n"


def half_resolution(vertices: np.ndarray) -> np.ndarray:
    """HalfResolution (s2polyline_alignment.cc:253-261): even-index
    vertices [0, 2, 4, ...]."""
    return np.asarray(vertices, np.float64).reshape(-1, 3)[::2]


# ---------------------------------------------------------------- DTW core


def _row_costs(
    w: np.ndarray, m: np.ndarray, start: int, end: int, out: np.ndarray
) -> None:
    """Fill out[start:end] with the row's DP costs given per-cell base
    costs w and diag/up minima m (both full-width); cells outside the
    stride stay +inf.  Closed-form unroll of the left recursion."""
    ws = w[start:end]
    ms = m[start:end]
    S = np.cumsum(ws)
    # q[k] = m[k] - S[k-1]  (S[-1] = 0)
    q = ms.copy()
    q[1:] -= S[:-1]
    out[start:end] = S + np.minimum.accumulate(q)


def dynamic_timewarp(
    a: np.ndarray, b: np.ndarray, strides: np.ndarray
) -> tuple[float, list[tuple[int, int]]]:
    """DynamicTimewarp (s2polyline_alignment.cc:186-252): windowed DP
    fill + walk-back.  Time proportional to the window cell count."""
    av = np.asarray(a, np.float64).reshape(-1, 3)
    bv = np.asarray(b, np.float64).reshape(-1, 3)
    rows, cols = len(av), len(bv)
    if rows == 0 or cols == 0:
        raise ValueError("empty polyline")
    s = np.asarray(strides, np.int64).reshape(-1, 2)
    table = np.full((rows, cols), _INF)
    m = np.empty(cols)
    for row in range(rows):
        start, end = int(s[row, 0]), int(s[row, 1])
        # chordal distances |a[row] - b[c]| for c in the stride
        d = av[row] - bv[start:end]
        w = np.sqrt(np.einsum("ij,ij->i", d, d))
        wfull = np.empty(cols)
        wfull[start:end] = w
        if row == 0:
            # virtual table[-1][-1] = 0; all other out-of-range = inf
            m[:] = _INF
            m[0] = 0.0
        else:
            prev = table[row - 1]
            m[0] = prev[0]
            np.minimum(prev[:-1], prev[1:], out=m[1:])
        _row_costs(wfull, m, start, end, table[row])

    # Walk-back (s2polyline_alignment.cc:224-250): re-derive directions
    # with the reference preference order diag <= up <= left.
    def cell(r: int, c: int) -> float:
        if r < 0 and c < 0:
            return 0.0
        if r < 0 or c < 0:
            return _INF
        if not (s[r, 0] <= c < s[r, 1]):
            return _INF
        return table[r, c]

    path = []
    row, col = rows - 1, cols - 1
    while row >= 0 and col >= 0:
        path.append((row, col))
        d_cost = cell(row - 1, col - 1)
        u_cost = cell(row - 1, col)
        l_cost = cell(row, col - 1)
        if d_cost <= u_cost and d_cost <= l_cost:
            row -= 1
            col -= 1
        elif u_cost <= l_cost:
            row -= 1
        else:
            col -= 1
    path.reverse()
    return float(table[-1, -1]), path


def exact_alignment_cost(a: np.ndarray, b: np.ndarray) -> float:
    """GetExactVertexAlignmentCost (s2polyline_alignment.cc:275-292):
    O(cols) space — rows are folded without keeping the table."""
    av = np.asarray(a, np.float64).reshape(-1, 3)
    bv = np.asarray(b, np.float64).reshape(-1, 3)
    rows, cols = len(av), len(bv)
    if rows == 0 or cols == 0:
        raise ValueError("empty polyline")
    prev = np.empty(cols)
    cur = np.empty(cols)
    m = np.empty(cols)
    for row in range(rows):
        d = av[row] - bv
        w = np.sqrt(np.einsum("ij,ij->i", d, d))
        if row == 0:
            cur[:] = np.cumsum(w)
        else:
            m[0] = prev[0]
            np.minimum(prev[:-1], prev[1:], out=m[1:])
            S = np.cumsum(w)
            q = m.copy()
            q[1:] -= S[:-1]
            cur[:] = S + np.minimum.accumulate(q)
        prev, cur = cur, prev
    return float(prev[-1])


def exact_alignment(
    a: np.ndarray, b: np.ndarray
) -> tuple[float, list[tuple[int, int]]]:
    """GetExactVertexAlignment (s2polyline_alignment.cc:294-302):
    all-squares window."""
    av = np.asarray(a, np.float64).reshape(-1, 3)
    bv = np.asarray(b, np.float64).reshape(-1, 3)
    strides = np.tile(np.array([[0, len(bv)]], np.int64), (len(av), 1))
    return dynamic_timewarp(av, bv, strides)


def approx_alignment(
    a: np.ndarray, b: np.ndarray, radius: int | None = None
) -> tuple[float, list[tuple[int, int]]]:
    """GetApproxVertexAlignment (s2polyline_alignment.cc:304-346):
    FastDTW — recurse on half-resolution lines, refine on the
    upsampled + dilated projected window.  Default radius =
    max(len)^0.25 (s2polyline_alignment.cc:341-346)."""
    av = np.asarray(a, np.float64).reshape(-1, 3)
    bv = np.asarray(b, np.float64).reshape(-1, 3)
    if radius is None:
        radius = int(max(len(av), len(bv)) ** 0.25)
    if radius < 0:
        raise ValueError("radius is negative")
    a_n, b_n = len(av), len(bv)
    if a_n - radius < _SIZE_SWITCHOVER or b_n - radius < _SIZE_SWITCHOVER:
        return exact_alignment(av, bv)
    if max(a_n, b_n) * (2 * radius + 1) > a_n * b_n * _DENSITY_SWITCHOVER:
        return exact_alignment(av, bv)
    _, proj_path = approx_alignment(
        half_resolution(av), half_resolution(bv), radius
    )
    w = dilate_window(
        upsample_window(window_from_warp_path(proj_path), a_n, b_n), radius
    )
    return dynamic_timewarp(av, bv, w)


# ----------------------------------------------------- medoid / consensus


def _cost_fn(a: np.ndarray, b: np.ndarray, approx: bool) -> float:
    return (
        approx_alignment(a, b)[0] if approx else exact_alignment_cost(a, b)
    )


def medoid_polyline(
    polylines: list[np.ndarray], approx: bool = True
) -> int:
    """GetMedoidPolyline (s2polyline_alignment.cc:352-372): index
    minimizing summed alignment cost to all others; lower index wins
    ties.  Lower-triangle evaluation mirrored across the diagonal."""
    n = len(polylines)
    if n == 0:
        raise ValueError("no polylines")
    costs = np.zeros(n)
    for i in range(n):
        for j in range(i + 1, n):
            c = _cost_fn(polylines[i], polylines[j], approx)
            costs[i] += c
            costs[j] += c
    return int(np.argmin(costs))


def polylines_approx_equal(
    a: np.ndarray, b: np.ndarray, max_error_rad: float = 1e-15
) -> bool:
    """S2Polyline::ApproxEquals (s2polyline.cc:670-678): same vertex
    count, every vertex pair within max_error angle."""
    av = np.asarray(a, np.float64).reshape(-1, 3)
    bv = np.asarray(b, np.float64).reshape(-1, 3)
    if len(av) != len(bv):
        return False
    cross = np.linalg.norm(np.cross(av, bv), axis=1)
    dot = np.einsum("ij,ij->i", av, bv)
    return bool(np.all(np.arctan2(cross, dot) <= max_error_rad))


def consensus_polyline(
    polylines: list[np.ndarray],
    approx: bool = True,
    seed_medoid: bool = False,
    iteration_cap: int = 5,
) -> np.ndarray:
    """GetConsensusPolyline (s2polyline_alignment.cc:393-429): Dynamic
    Timewarp Barycenter Averaging from a seed (first element, or the
    medoid), iterated until ApproxEquals convergence or the cap."""
    n = len(polylines)
    if n == 0:
        raise ValueError("no polylines")
    seed_index = 0
    if seed_medoid:
        seed_index = medoid_polyline(polylines, approx)
    consensus = np.array(polylines[seed_index], np.float64).reshape(-1, 3)
    nc = len(consensus)
    converged = False
    iterations = 0
    align = approx_alignment if approx else exact_alignment
    while not converged and iterations < iteration_cap:
        points = np.zeros((nc, 3))
        for line in polylines:
            lv = np.asarray(line, np.float64).reshape(-1, 3)
            _, path = align(consensus, lv)
            p = np.asarray(path, np.int64)
            np.add.at(points, p[:, 0], lv[p[:, 1]])
        points /= np.linalg.norm(points, axis=1, keepdims=True)
        iterations += 1
        converged = polylines_approx_equal(points, consensus)
        consensus = points
    return consensus
