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
        self.cell_tree = None  # (cell_id, label, parent) preorder nodes
        self.range_nodes = None  # (start_leaf_id, contents) boundaries

    def add(self, cell_id: CID, label: int) -> None:
        self.entries.append((cell_id, label))

    def add_cell_union(self, union: list[CID], label: int) -> None:
        for cid in union:
            self.add(cid, label)

    def build(self) -> None:
        """Build (s2cell_index.cc:73-137): the sorted-delta sweep that
        produces the preorder cell tree and leaf-cell range nodes."""
        self.entries.sort(key=lambda e: (e[0].id, e[1]))
        self.cell_tree, self.range_nodes = _build_range_structure(
            self.entries
        )

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
        # limit.PlusError(GetUpdateMinDistanceMaxError(limit)).Successor()
        # (s2closest_cell_query.cc:109-115; same fix as point_index)
        from .distance import get_update_min_distance_max_error

        lim = limit2 + get_update_min_distance_max_error(limit2)
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
                # 1e-15 rad pruning-budget slack (s2testing.h:206): the
                # angle-space bound must not erase successor()'s 1-ulp
                # margin for is_distance_less_or_equal boundary hits
                if lb[i] - 1e-15 >= lim_angle:
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


# --------------------------------------------------------------------------
# The reference's range-node / cell-tree structure (s2cell_index.cc Build):
# boundaries at every cell's range_min and range_max.next() partition the
# leaf-cell space into ranges; each range points at the top of a stack of
# (cell_id, label) nodes (the "contents"), linked through parent indexes
# assigned in preorder.

_SENTINEL = (1 << 64) - 1
_BEGIN_LEAF = CID.from_face(0).range_min().id
_END_LEAF = (CID.from_face(5).range_max().id + 2) & ((1 << 64) - 1)


class RangeIterator:
    """S2CellIndex::RangeIterator (s2cell_index.h:220-300)."""

    def __init__(self, index: "CellIndex"):
        index._ensure_built()
        self._nodes = index.range_nodes
        self._pos = 0

    def begin(self) -> None:
        self._pos = 0

    def finish(self) -> None:
        self._pos = len(self._nodes) - 1

    def done(self) -> bool:
        return self._pos >= len(self._nodes) - 1

    def start_id(self) -> int:
        return self._nodes[self._pos][0]

    def limit_id(self) -> int:
        return self._nodes[self._pos + 1][0]

    def is_empty(self) -> bool:
        return self._nodes[self._pos][1] < 0

    def contents(self) -> int:
        return self._nodes[self._pos][1]

    def next(self) -> None:
        self._pos += 1

    def prev(self) -> bool:
        if self._pos == 0:
            return False
        self._pos -= 1
        return True

    def seek(self, target_leaf_id: int) -> None:
        """Position at the range containing the target leaf cell."""
        import bisect

        starts = [n[0] for n in self._nodes]
        self._pos = bisect.bisect_right(starts, target_leaf_id) - 1


class NonEmptyRangeIterator(RangeIterator):
    """Skips ranges with no contents (s2cell_index.h:302-337)."""

    def begin(self) -> None:
        super().begin()
        while not self.done() and self.is_empty():
            self._pos += 1

    def next(self) -> None:
        self._pos += 1
        while not self.done() and self.is_empty():
            self._pos += 1

    def prev(self) -> bool:
        pos = self._pos
        while self._pos > 0:
            self._pos -= 1
            if not self.is_empty():
                return True
        self._pos = pos
        return False

    def seek(self, target_leaf_id: int) -> None:
        super().seek(target_leaf_id)
        while not self.done() and self.is_empty():
            self._pos += 1


class ContentsIterator:
    """S2CellIndex::ContentsIterator with preorder duplicate suppression
    (s2cell_index.cc:39-65)."""

    def __init__(self, index: "CellIndex"):
        index._ensure_built()
        self._tree = index.cell_tree
        self._node = None
        self._node_cutoff = -1
        self._next_node_cutoff = -1
        self._prev_start_id = -1

    def start_union(self, range_it: RangeIterator) -> None:
        if range_it.start_id() < self._prev_start_id:
            self._node_cutoff = -1  # moving backwards: no suppression
        self._prev_start_id = range_it.start_id()
        contents = range_it.contents()
        if contents <= self._node_cutoff:
            self._node = None
        else:
            self._node = contents
        self._next_node_cutoff = contents

    def done(self) -> bool:
        return self._node is None or self._node < 0

    def cell_id(self) -> int:
        return self._tree[self._node][0]

    def label(self) -> int:
        return self._tree[self._node][1]

    def next(self) -> None:
        """Next (s2cell_index.h:593-601): stop once the parent index was
        already visited (preorder indexes only decrease up the chain)."""
        parent = self._tree[self._node][2]
        if parent <= self._node_cutoff:
            self._node_cutoff = self._next_node_cutoff
            self._node = None
        else:
            self._node = parent

    def clear(self) -> None:
        self._node = None
        self._node_cutoff = -1
        self._next_node_cutoff = -1
        self._prev_start_id = -1


class CellIterator:
    """S2CellIndex::CellIterator: visits every (cell_id, label) pair."""

    def __init__(self, index: "CellIndex"):
        index._ensure_built()
        self._pairs = [
            (n[0], n[1]) for n in index.cell_tree
        ]
        self._pos = 0

    def done(self) -> bool:
        return self._pos >= len(self._pairs)

    def cell_id(self) -> int:
        return self._pairs[self._pos][0]

    def label(self) -> int:
        return self._pairs[self._pos][1]

    def next(self) -> None:
        self._pos += 1


def _build_range_structure(entries):
    """S2CellIndex::Build (s2cell_index.cc:73-137): sorted push/pop
    deltas → preorder cell tree + leaf-cell range nodes."""
    deltas = []
    for cid, label in entries:
        deltas.append((cid.range_min().id, cid.id, label))
        deltas.append(
            ((cid.range_max().id + 2) & ((1 << 64) - 1), _SENTINEL, -1)
        )
    deltas.append((_BEGIN_LEAF, None, -1))
    deltas.append((_END_LEAF, None, -1))
    # sort by start_id, then REVERSE cell_id (pops before pushes, larger
    # cells first), then label; None cell_id sorts like S2CellId::None=0
    deltas.sort(
        key=lambda d: (
            d[0],
            -(d[1] if d[1] is not None else 0),
            d[2],
        )
    )
    cell_tree = []  # (cell_id, label, parent)
    range_nodes = []  # (start_id, contents)
    contents = -1
    i = 0
    n = len(deltas)
    while i < n:
        start_id = deltas[i][0]
        while i < n and deltas[i][0] == start_id:
            if deltas[i][2] >= 0:
                cell_tree.append((deltas[i][1], deltas[i][2], contents))
                contents = len(cell_tree) - 1
            elif deltas[i][1] == _SENTINEL:
                contents = cell_tree[contents][2]
            i += 1
        range_nodes.append((start_id, contents))
    return cell_tree, range_nodes


def _cellindex_ensure_built(self) -> None:
    if getattr(self, "cell_tree", None) is None:
        raise RuntimeError("CellIndex.build() must be called first")


def _cellindex_build_full(self) -> None:
    self.entries.sort(key=lambda e: (e[0].id, e[1]))
    self.cell_tree, self.range_nodes = _build_range_structure(self.entries)


def _cellindex_clear(self) -> None:
    self.entries = []
    self.cell_tree = None
    self.range_nodes = None


def _cellindex_visit_intersecting_cells(self, target: list[CID], visitor) -> bool:
    """VisitIntersectingCells (s2cell_index.h:619-649): target must be a
    normalized cell union (sorted, non-overlapping)."""
    if not target:
        return True
    self._ensure_built()
    it = 0
    contents = ContentsIterator(self)
    rng = RangeIterator(self)
    rng.begin()
    while True:
        t = target[it]
        if rng.limit_id() <= t.range_min().id:
            rng.seek(t.range_min().id)
        while rng.start_id() <= t.range_max().id:
            contents.start_union(rng)
            while not contents.done():
                if not visitor(contents.cell_id(), contents.label()):
                    return False
                contents.next()
            rng.next()
        it += 1
        if it < len(target) and target[it].range_max().id < rng.start_id():
            # binary-search skip over target cells inside the processed range
            import bisect

            keys = [c.id for c in target]
            j = bisect.bisect_left(keys, rng.start_id(), it + 1)
            if target[j - 1].range_max().id >= rng.start_id():
                j -= 1
            it = j
        if it >= len(target):
            return True


def _cellindex_get_intersecting_labels(self, target: list[CID]) -> set:
    labels: set = set()
    self.visit_intersecting_cells(
        target, lambda cid, label: (labels.add(label), True)[1]
    )
    return labels


CellIndex._ensure_built = _cellindex_ensure_built
CellIndex.build_full = _cellindex_build_full
CellIndex.clear = _cellindex_clear
CellIndex.visit_intersecting_cells = _cellindex_visit_intersecting_cells
CellIndex.get_intersecting_labels = _cellindex_get_intersecting_labels


def cell_iterator_join(
    cells_a: list[CID],
    cells_b: list[CID],
    visitor,
    tolerance2: float = 0.0,
) -> bool:
    """S2CellIteratorJoin (s2cell_iterator_join.h): visit pairs from two
    id-sorted cell sequences.  With tolerance 0, visits exactly the
    pairs whose leaf ranges overlap, in (a, b) order via the classic
    range merge; with a positive tolerance (squared chord), visits every
    pair within that distance, left-driven (all pairs for one A cell are
    contiguous).  Stops and returns False when the visitor does."""
    cells_a = sorted(cells_a, key=lambda c: c.id)
    cells_b = sorted(cells_b, key=lambda c: c.id)
    if tolerance2 <= 0.0:
        i = j = 0
        while i < len(cells_a) and j < len(cells_b):
            a, b = cells_a[i], cells_b[j]
            a_min, a_max = a.range_min().id, a.range_max().id
            b_min, b_max = b.range_min().id, b.range_max().id
            if a_max < b_min:
                i += 1
            elif b_max < a_min:
                j += 1
            else:
                if not visitor(a, b):
                    return False
                if a_max < b_max:
                    i += 1
                elif b_max < a_max:
                    j += 1
                else:
                    i += 1
                    j += 1
        return True
    # tolerant join: left-driven distance scan
    from .cell import cell_cell_distance2

    b_cells = [Cell(c) for c in cells_b]
    for a in cells_a:
        ca = Cell(a)
        for b, cb in zip(cells_b, b_cells):
            if cell_cell_distance2(ca, cb) < tolerance2:
                if not visitor(a, b):
                    return False
    return True


def find_furthest_cells(
    index: CellIndex,
    target_point,
    max_results: int = 1,
    min_distance2: float | None = None,
) -> list[CellResult]:
    """FurthestCellQuery = S2ClosestCellQueryBase<S2MaxDistance>
    (s2closest_cell_query_base_test.cc:42-91).

    Same reflection as find_furthest_points: on unit vectors
    |x-p|^2 + |-x-p|^2 = 4 pointwise, so the maximum squared chord from
    x to any point of a cell equals 4 minus the minimum from -x
    (s2max_distance_targets.cc UpdateMinDistance on S2MaxDistance).
    The closest-cell machinery against -x therefore answers the
    furthest-cell query with d2 mapped through 4 - d2, preserving order.
    """
    from .point_index import PointTarget

    x = np.asarray(target_point, dtype=np.float64)
    opts = Options(max_results=max_results)
    if min_distance2 is not None:
        opts.max_distance2 = 4.0 - min_distance2
    res = ClosestCellQuery(index, opts).find_closest_cells(PointTarget(-x))
    return [CellResult(4.0 - r.distance2, r.cell_id, r.label) for r in res]
