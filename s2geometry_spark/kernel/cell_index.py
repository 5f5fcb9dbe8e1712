"""S2CellIndex + S2ClosestCellQuery (s2cell_index.h, s2closest_cell_query.h).

The index is a multimap of (cell_id, label) entries (cells may overlap
arbitrarily and carry duplicate labels); the query returns the closest
entries to a target under the same options surface as the closest-point
query — max_results, exclusive max_distance, max_error, region filter
(applied as region.MayIntersect(cell) like S2ClosestCellQueryBase),
use_brute_force.  Target types are the point-index targets (point,
edge, cell, shape index — each measuring to the FULL cell extent via
its dist2_to_cell, matching S2Cell::GetDistance, s2cell.cc:382-600)
plus CellUnionTarget.

The optimized path prunes with each indexed cell's bounding cap via the
spherical triangle inequality — conservative within the
CheckDistanceResults pruning budget (s2testing.h:206).

The distributed analogue is operators/cell_index.py (label joins as
DataFrames); this kernel is the single-node fixture contract.
"""

from __future__ import annotations

import math

import numpy as np

from .cell import Cell, cell_cell_distance2
from .cid import CID
from .distance import chord2_successor, chord2_to_angle, s1angle_constructor_max_error
from .point_index import Options, _copy_with
from .region import cell_cap_bound

_INF = math.inf


class CellUnionTarget:
    """S2ClosestCellQuery::CellUnionTarget: distance to the nearest cell
    of the union; infinity for an empty union (test.cc:186-201)."""

    def __init__(self, union: list[CID]):
        self.cells = [Cell(cid) for cid in union]

    def dist2_to_cell(self, cell: Cell) -> float:
        if not self.cells:
            return _INF
        return min(cell_cell_distance2(cell, c) for c in self.cells)

    def min_angle_to_point(self, c: np.ndarray) -> float:
        from .cell import cell_distance2

        if not self.cells:
            return _INF
        d2 = min(cell_distance2(u, c) for u in self.cells)
        return float(chord2_to_angle(d2))


class CellIndex:
    """S2CellIndex (s2cell_index.h:70-130): (cell_id, label) entries."""

    def __init__(self):
        self.entries: list[tuple[CID, int]] = []

    def add(self, cell_id: CID, label: int) -> None:
        self.entries.append((cell_id, label))

    def add_cell_union(self, union: list[CID], label: int) -> None:
        for cid in union:
            self.add(cid, label)

    def build(self) -> None:
        # the reference sorts into a (range, contents) structure; the
        # per-entry bounding caps in the query play that role here
        self.entries.sort(key=lambda e: (e[0].id, e[1]))

    def num_cells(self) -> int:
        return len(self.entries)


class CellResult:
    __slots__ = ("distance2", "cell_id", "label")

    def __init__(self, distance2: float, cell_id: CID | None, label: int):
        self.distance2 = distance2
        self.cell_id = cell_id
        self.label = label

    def is_empty(self) -> bool:
        return self.cell_id is None


_EMPTY = CellResult(_INF, None, -1)


class ClosestCellQuery:
    """S2ClosestCellQuery over a CellIndex."""

    def __init__(self, index: CellIndex, options: Options | None = None):
        self.index = index
        self.options = options or Options()
        self._cells: list[Cell] | None = None
        self._caps: list | None = None

    def _geometry(self):
        if self._cells is None:
            self._cells = [Cell(cid) for cid, _ in self.index.entries]
            self._caps = [cell_cap_bound(c) for c in self._cells]
        return self._cells, self._caps

    # ---- entry points (s2closest_cell_query.h:231-320)
    def find_closest_cells(self, target) -> list[CellResult]:
        return self._find(target, self.options)

    def find_closest_cell(self, target) -> CellResult:
        opts = _copy_with(self.options, max_results=1)
        res = self._find(target, opts)
        return res[0] if res else _EMPTY

    def get_distance2(self, target) -> float:
        return self.find_closest_cell(target).distance2

    def is_distance_less(self, target, limit2: float) -> bool:
        opts = _copy_with(
            self.options, max_results=1, max_distance2=limit2, max_error2=4.0
        )
        return bool(self._find(target, opts))

    def is_distance_less_or_equal(self, target, limit2: float) -> bool:
        return self.is_distance_less(target, float(chord2_successor(limit2)))

    def is_conservative_distance_less_or_equal(self, target, limit2: float) -> bool:
        lim = limit2 + float(s1angle_constructor_max_error(limit2))
        return self.is_distance_less(target, float(chord2_successor(lim)))

    # ---- implementation
    def _find(self, target, opts: Options) -> list[CellResult]:
        cells, caps = self._geometry()
        n = len(cells)
        if n == 0:
            return []

        def admit(i: int, d2: float) -> bool:
            if not d2 < opts.max_distance2:
                return False
            if opts.region is not None and not opts.region.may_intersect_cell(
                cells[i]
            ):
                return False
            return True

        results: list[tuple[float, int]] = []
        if opts.use_brute_force or n <= 16:
            for i in range(n):
                d2 = target.dist2_to_cell(cells[i])
                if admit(i, d2):
                    results.append((d2, i))
        else:
            lb = np.empty(n)
            for i, cap in enumerate(caps):
                lb[i] = max(
                    0.0,
                    target.min_angle_to_point(cap.center)
                    - cap.radius_radians(),
                )
            order = np.argsort(lb, kind="stable")
            max_err_angle = float(chord2_to_angle(min(opts.max_error2, 4.0)))
            for i in order:
                lim2 = opts.max_distance2
                if len(results) >= opts.max_results:
                    results.sort(key=lambda t: t[0])
                    kth = results[opts.max_results - 1][0]
                    adj = max(
                        0.0, chord2_to_angle(min(kth, 4.0)) - max_err_angle
                    )
                    s = 2 * math.sin(0.5 * min(math.pi, adj))
                    lim2 = min(lim2, s * s)
                lim_angle = (
                    chord2_to_angle(min(lim2, 4.0)) if lim2 < _INF else _INF
                )
                if lb[i] >= lim_angle:
                    break
                d2 = target.dist2_to_cell(cells[int(i)])
                if admit(int(i), d2):
                    results.append((d2, int(i)))
        results.sort(key=lambda t: t[0])
        return [
            CellResult(d2, self.index.entries[i][0], self.index.entries[i][1])
            for d2, i in results[: opts.max_results]
        ]


class RegionSharder:
    """S2RegionSharder (s2region_sharder.h/.cc): assign a region
    (given as a cell-union covering) to the shard whose covering it
    intersects the most, measured in leaf-cell overlap; ties go to the
    lowest shard index."""

    def __init__(self, coverings_or_index):
        if isinstance(coverings_or_index, CellIndex):
            self.index = coverings_or_index
        else:
            self.index = CellIndex()
            for i, union in enumerate(coverings_or_index):
                self.index.add_cell_union(union, i)
            self.index.build()

    def _intersections(self, covering: list[CID]) -> dict[int, int]:
        """Total leaf-cell overlap per shard label."""
        weights: dict[int, int] = {}
        for c in covering:
            lo, hi = c.range_min().id, c.range_max().id
            for cid, label in self.index.entries:
                slo, shi = cid.range_min().id, cid.range_max().id
                overlap = min(hi, shi) - max(lo, slo)
                if overlap >= 0:
                    # leaf count = range length / 2 + 1
                    weights[label] = weights.get(label, 0) + overlap // 2 + 1
        return weights

    def get_most_intersecting_shard(
        self, covering: list[CID], default: int
    ) -> int:
        weights = self._intersections(covering)
        if not weights:
            return default
        best = max(weights.items(), key=lambda kv: (kv[1], -kv[0]))
        return best[0]

    def get_intersecting_shards(self, covering: list[CID]) -> list[int]:
        return sorted(self._intersections(covering).keys())
