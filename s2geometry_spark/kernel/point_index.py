"""S2PointIndex + S2ClosestPointQuery (s2point_index.h, s2closest_point_query.h).

The reference stores (point, data) entries in a btree multimap keyed by
leaf S2CellId and answers closest-point queries either brute-force or by
visiting index cells in distance order (s2closest_point_query_base.h).
This port keeps the same OPTIONS SURFACE and result semantics —
max_results, exclusive max_distance, max_error, region filter,
use_brute_force, four target types (point / edge / cell / shape index
with optional interiors) — and replaces the cell-iterator walk with a
vectorized bucket prune: entries group by parent cell, each bucket gets
an exact bounding cap (centroid center, max-angle radius), and buckets
are visited in lower-bound order until the bound passes the dynamic
distance limit.  The bound max(0, d(target, center) − radius) is the
spherical triangle inequality, so the prune is conservative like the
reference's S2Cell distance bound (within the same kMaxPruningError
budget that s2testing.h's CheckDistanceResults allows).

The distributed analogue of this query is operators/knn.knn_join (ring
expansion over a bucketed table); this kernel is the single-node contract
used by fixtures and per-partition logic.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Sequence

import numpy as np

from . import cellid as cid_np
from .cell import (
    Cell,
    cell_cell_distance2,
    cell_distance2,
    cell_edge_distance2,
)
from .cid import CID
from .closest_edge import Shape
from .distance import (
    chord2,
    chord2_successor,
    chord2_to_angle,
    point_edge_dist2,
    s1angle_constructor_max_error,
)

_INF = math.inf
_MAX_RESULTS = 2**31 - 1  # numeric_limits<int>::max, the reference default


# --------------------------------------------------------------- targets
class PointTarget:
    """S2ClosestPointQueryPointTarget (s2closest_point_query.h:221-231)."""

    def __init__(self, p: Sequence[float]):
        self.p = np.asarray(p, dtype=np.float64)

    def dist2_to_points(self, pts: np.ndarray) -> np.ndarray:
        return chord2(pts, self.p)

    def min_angle_to_point(self, c: np.ndarray) -> float:
        return float(chord2_to_angle(chord2(c, self.p)))

    def dist2_to_cell(self, cell: Cell) -> float:
        return cell_distance2(cell, self.p)


class EdgeTarget:
    """S2ClosestPointQueryEdgeTarget: closest points to a great-circle
    edge (a, b)."""

    def __init__(self, a: Sequence[float], b: Sequence[float]):
        self.a = np.asarray(a, dtype=np.float64)
        self.b = np.asarray(b, dtype=np.float64)

    def dist2_to_points(self, pts: np.ndarray) -> np.ndarray:
        return point_edge_dist2(pts, self.a[None], self.b[None])[:, 0]

    def min_angle_to_point(self, c: np.ndarray) -> float:
        d2 = point_edge_dist2(
            np.asarray(c, float)[None], self.a[None], self.b[None]
        )[0, 0]
        return float(chord2_to_angle(d2))

    def dist2_to_cell(self, cell: Cell) -> float:
        return cell_edge_distance2(cell, self.a, self.b)


class CellTarget:
    """S2ClosestPointQueryCellTarget: closest points to an S2Cell
    (including its interior)."""

    def __init__(self, cell: Cell):
        self.cell = cell
        from .cell import _cell_vertices

        self._v = _cell_vertices(cell)
        self._d = np.roll(self._v, -1, axis=0)

    def dist2_to_points(self, pts: np.ndarray) -> np.ndarray:
        pts = np.asarray(pts, float).reshape(-1, 3)
        d2 = point_edge_dist2(pts, self._v, self._d).min(axis=1)
        inside = np.fromiter(
            (self.cell.contains_point(p) for p in pts), bool, len(pts)
        )
        return np.where(inside, 0.0, d2)

    def min_angle_to_point(self, c: np.ndarray) -> float:
        return float(chord2_to_angle(cell_distance2(self.cell, c)))

    def dist2_to_cell(self, cell: Cell) -> float:
        return cell_cell_distance2(cell, self.cell)


class ShapeIndexTarget:
    """S2ClosestPointQueryShapeIndexTarget: closest points to a whole
    shape list; include_interiors adds distance-0 hits for points inside
    polygon shapes (s2min_distance_targets.h)."""

    def __init__(self, shapes: list[Shape], include_interiors: bool = False):
        self.shapes = shapes
        self.include_interiors = include_interiors

    def dist2_to_points(self, pts: np.ndarray) -> np.ndarray:
        pts = np.asarray(pts, float).reshape(-1, 3)
        if not self.shapes:
            return np.full(len(pts), _INF)
        best = np.full(len(pts), _INF)
        for sh in self.shapes:
            if len(sh.edges_c):
                d2 = point_edge_dist2(pts, sh.edges_c, sh.edges_d).min(axis=1)
                best = np.minimum(best, d2)
            if self.include_interiors and sh.polygon is not None:
                best = np.where(sh.polygon.contains(pts), 0.0, best)
        return best

    def min_angle_to_point(self, c: np.ndarray) -> float:
        d2 = self.dist2_to_points(np.asarray(c, float)[None])[0]
        return float(chord2_to_angle(d2)) if np.isfinite(d2) else _INF

    def dist2_to_cell(self, cell: Cell) -> float:
        """include_interiors makes any cell overlapping a polygon's
        interior distance 0: a crossing boundary is caught by the edge
        distance, full containment either way by the vertex probes
        (s2min_distance_targets.cc ShapeIndexTarget)."""
        if not self.shapes:
            return _INF
        from .cell import _cell_vertices

        best = _INF
        for sh in self.shapes:
            for a, b in zip(sh.edges_c, sh.edges_d):
                best = min(best, cell_edge_distance2(cell, a, b))
                if best == 0.0:
                    return 0.0
            if self.include_interiors and sh.polygon is not None:
                if sh.polygon.contains(_cell_vertices(cell)).any():
                    return 0.0
                for loop in sh.polygon.loops:
                    if any(cell.contains_point(v) for v in loop.vertices):
                        return 0.0
        return best


# ----------------------------------------------------------------- index
class PointIndex:
    """S2PointIndex<Data>: a multimap of (point, data) keyed by leaf cell
    (s2point_index.h:60-120).  Arrays are built lazily on first query."""

    def __init__(self):
        self._pts: list[np.ndarray] = []
        self._data: list = []
        self._arrays: tuple | None = None

    def add(self, point: Sequence[float], data) -> None:
        self._pts.append(np.asarray(point, dtype=np.float64))
        self._data.append(data)
        self._arrays = None

    def remove(self, point: Sequence[float], data=None) -> bool:
        """S2PointIndex::Remove (s2point_index.h:95-101): removes ONE
        (point, data) pair if present; returns whether a pair was
        removed."""
        p = np.asarray(point, dtype=np.float64)
        for i in range(len(self._pts)):
            if np.array_equal(self._pts[i], p) and (
                data is None or self._data[i] == data
            ):
                del self._pts[i]
                del self._data[i]
                self._arrays = None
                return True
        return False

    def num_points(self) -> int:
        return len(self._pts)

    def arrays(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(points (N,3), data (N,), leaf ids (N,) uint64), sorted by
        leaf id like the reference's btree iteration order."""
        if self._arrays is None:
            if not self._pts:
                empty = np.zeros((0, 3))
                self._arrays = (empty, np.array([]), np.array([], np.uint64))
            else:
                pts = np.asarray(self._pts, dtype=np.float64)
                ids = cid_np.from_point(pts[:, 0], pts[:, 1], pts[:, 2])
                order = np.argsort(ids, kind="stable")
                self._arrays = (
                    pts[order],
                    np.asarray(self._data, dtype=object)[order],
                    ids[order],
                )
        return self._arrays


# ----------------------------------------------------------------- query
@dataclass
class Options:
    """S2ClosestPointQueryOptions (s2closest_point_query.h:77-141):
    distances are squared chords; max_distance is EXCLUSIVE."""

    max_results: int = _MAX_RESULTS
    max_distance2: float = _INF
    max_error2: float = 0.0
    region: object | None = None  # anything with contains_point(p)
    use_brute_force: bool = False

    def set_max_distance_rad(self, radians: float) -> None:
        s = 2 * math.sin(0.5 * min(math.pi, radians))
        self.max_distance2 = s * s

    def set_max_error_rad(self, radians: float) -> None:
        s = 2 * math.sin(0.5 * min(math.pi, radians))
        self.max_error2 = s * s


@dataclass
class Result:
    distance2: float
    point: np.ndarray
    data: object


class ClosestPointQuery:
    """S2ClosestPointQuery<Data> over a PointIndex."""

    def __init__(self, index: PointIndex, options: Options | None = None):
        self.index = index
        self.options = options or Options()

    # ---- main entry points
    def find_closest_points(self, target) -> list[Result]:
        return self._find(target, self.options)

    def find_closest_point(self, target) -> Result | None:
        opts = _copy_with(self.options, max_results=1)
        res = self._find(target, opts)
        return res[0] if res else None

    def get_distance2(self, target) -> float:
        r = self.find_closest_point(target)
        return r.distance2 if r is not None else _INF

    def is_distance_less(self, target, limit2: float) -> bool:
        opts = _copy_with(
            self.options, max_results=1, max_distance2=limit2, max_error2=4.0
        )
        return bool(self._find(target, opts))

    def is_distance_less_or_equal(self, target, limit2: float) -> bool:
        # limit.Successor() (s2closest_point_query.h:440-452)
        return self.is_distance_less(target, float(chord2_successor(limit2)))

    def is_conservative_distance_less_or_equal(self, target, limit2: float) -> bool:
        # limit.PlusError(GetUpdateMinDistanceMaxError(limit)).Successor()
        # (s2closest_point_query.cc:24-28) — the UpdateMinDistance error
        # bound, NOT just the S1Angle constructor error (too small by
        # ~2 ulps for the worst point pairs:
        # s2closest_edge_query_test.cc:160-182)
        from .distance import get_update_min_distance_max_error

        lim = limit2 + get_update_min_distance_max_error(limit2)
        return self.is_distance_less(target, float(chord2_successor(lim)))

    # ---- implementation
    def _find(self, target, opts: Options) -> list[Result]:
        pts, data, ids = self.index.arrays()
        if len(pts) == 0:
            return []
        if opts.use_brute_force or len(pts) <= 48:
            # brute cutover mirrors the reference's index-size heuristic
            # (s2closest_point_query_base.h kMinPointsToOptimize≈48 spirit)
            d2 = np.asarray(target.dist2_to_points(pts), dtype=np.float64)
            return self._select(pts, data, d2, opts)
        return self._optimized(target, pts, data, ids, opts)

    def _select(self, pts, data, d2, opts: Options) -> list[Result]:
        keep = d2 < opts.max_distance2
        if opts.region is not None:
            inreg = np.fromiter(
                (bool(opts.region.contains_point(p)) for p in pts),
                bool, len(pts),
            )
            keep &= inreg
        idx = np.nonzero(keep)[0]
        if len(idx) == 0:
            return []
        order = idx[np.argsort(d2[idx], kind="stable")]
        order = order[: opts.max_results]
        return [Result(float(d2[i]), pts[i], data[i]) for i in order]

    def _optimized(self, target, pts, data, ids, opts: Options) -> list[Result]:
        # bucket by parent cell: refine until the largest bucket is small
        level = 4
        while level < 30:
            buckets = cid_np.parent(ids, level)
            _, starts, counts = np.unique(
                buckets, return_index=True, return_counts=True
            )
            if counts.max() <= 64 or len(counts) == len(pts):
                break
            level += 2
        # exact bounding cap per bucket (ids sorted ⇒ buckets contiguous)
        n_b = len(starts)
        lb_angle = np.empty(n_b)
        radius = np.empty(n_b)
        centers = np.empty((n_b, 3))
        for k in range(n_b):
            s, c = starts[k], counts[k]
            seg = pts[s: s + c]
            ctr = seg.mean(axis=0)
            nrm = np.linalg.norm(ctr)
            ctr = ctr / nrm if nrm > 0 else seg[0]
            centers[k] = ctr
            radius[k] = chord2_to_angle(chord2(seg, ctr).max())
        for k in range(n_b):
            lb_angle[k] = max(
                0.0, target.min_angle_to_point(centers[k]) - radius[k]
            )
        order = np.argsort(lb_angle, kind="stable")

        max_err_angle = float(chord2_to_angle(min(opts.max_error2, 4.0)))
        results: list[tuple[float, int]] = []  # (d2, row index), kept sorted
        limit2 = opts.max_distance2

        def current_limit2() -> float:
            if len(results) < opts.max_results:
                return limit2
            kth_angle = float(chord2_to_angle(min(results[-1][0], 4.0)))
            adj = max(0.0, kth_angle - max_err_angle)
            s = 2 * math.sin(0.5 * min(math.pi, adj))
            return min(limit2, s * s)

        for k in order:
            lb = lb_angle[k]
            lim2 = current_limit2()
            lim_angle = chord2_to_angle(min(lim2, 4.0)) if lim2 < _INF else _INF
            # conservative break: lb and lim_angle pass through chord->angle
            # conversions that can erase the 1-ulp successor() margin
            # is_distance_less_or_equal depends on; spend the 1e-15 rad
            # pruning budget the reference grants itself (s2testing.h:206)
            # on the skip side so boundary-exact points are never pruned
            if lb - 1e-15 >= lim_angle:
                break
            s, c = starts[k], counts[k]
            seg = pts[s: s + c]
            d2 = np.asarray(target.dist2_to_points(seg), dtype=np.float64)
            keep = d2 < opts.max_distance2
            if opts.region is not None:
                inreg = np.fromiter(
                    (bool(opts.region.contains_point(p)) for p in seg),
                    bool, len(seg),
                )
                keep &= inreg
            for j in np.nonzero(keep)[0]:
                results.append((float(d2[j]), s + int(j)))
            results.sort(key=lambda t: t[0])
            # keep a few extra beyond max_results so max_error trimming
            # stays correct; hard results are trimmed at return
            if len(results) > opts.max_results:
                # entries beyond max_results can only matter for the
                # dynamic limit, which uses results[-1] — trim to k exact
                results = results[: opts.max_results]
        return [
            Result(d2v, pts[i], data[i]) for d2v, i in results[: opts.max_results]
        ]


def _copy_with(opts: Options, **kw) -> Options:
    out = Options(
        max_results=opts.max_results,
        max_distance2=opts.max_distance2,
        max_error2=opts.max_error2,
        region=opts.region,
        use_brute_force=opts.use_brute_force,
    )
    for k, v in kw.items():
        setattr(out, k, v)
    return out


def find_furthest_points(
    index: "PointIndex",
    target_point,
    max_results: int = 1,
    min_distance2: float | None = None,
) -> list[Result]:
    """FurthestPointQuery = S2ClosestPointQueryBase<S2MaxDistance>
    (s2closest_point_query_base_test.cc:40-88).

    S2MaxDistance orders distances in reverse; for a point target the
    reference's S2MaxDistancePointTarget measures via the antipode
    identity |x-p|^2 + |-x-p|^2 = 4 on unit vectors
    (s2max_distance_targets.cc:36-44), so the max-distance query IS the
    min-distance query against -x with d2 mapped through 4 - d2 — which
    lets the same optimized machinery (bucket pruning, dynamic k-th
    limit) serve both directions, exactly as the templated base does.

    min_distance2 is the exclusive lower bound (set_min_distance); it
    maps to an exclusive max_distance2 of 4 - min_distance2 on the
    reflected query.
    """
    x = np.asarray(target_point, dtype=np.float64)
    opts = Options(max_results=max_results)
    if min_distance2 is not None:
        opts.max_distance2 = 4.0 - min_distance2
    res = ClosestPointQuery(index, opts).find_closest_points(PointTarget(-x))
    return [Result(4.0 - r.distance2, r.point, r.data) for r in res]
