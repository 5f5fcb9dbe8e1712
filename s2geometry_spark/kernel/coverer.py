"""Exact port of S2RegionCoverer (s2region_coverer.cc) — driver-side.

Used for query shapes (10s-1000s of polygons); bulk per-row coverings use
fixed-level cell assignment in the data plane.  The priority formula,
candidate logic, traversal order and canonicalization are ported verbatim
so coverings bit-match this reference snapshot (the output is documented
as version-unstable, s2region_coverer.h:60-62 — we pin THIS snapshot).
"""

from __future__ import annotations

import heapq

import numpy as np
from dataclasses import dataclass, field

from . import cellunion
from .cell import Cell
from .cid import CID, MAX_LEVEL


@dataclass
class Candidate:
    cell: Cell
    is_terminal: bool
    children: list = field(default_factory=list)


class RegionCoverer:
    """Options per s2region_coverer.h:72-162 (defaults: max_cells 8)."""

    def __init__(
        self,
        max_cells: int = 8,
        min_level: int = 0,
        max_level: int = MAX_LEVEL,
        level_mod: int = 1,
    ):
        self.max_cells = max_cells
        self.min_level = max(0, min(MAX_LEVEL, min_level))
        self.max_level = max(0, min(MAX_LEVEL, max_level))
        self.level_mod = max(1, min(3, level_mod))
        self._region = None
        self._pq: list = []
        self._result: list[CID] = []
        self._interior = False
        self._counter = 0

    # ------------------------------------------------------------ internals
    def _max_children_shift(self) -> int:
        return 2 * self.level_mod

    def true_max_level(self) -> int:
        if self.level_mod == 1:
            return self.max_level
        return self.max_level - (self.max_level - self.min_level) % self.level_mod

    def _new_candidate(self, cell: Cell) -> Candidate | None:
        """NewCandidate (s2region_coverer.cc:90-111)."""
        if not self._region.may_intersect_cell(cell):
            return None
        is_terminal = False
        if cell.level >= self.min_level:
            if self._interior:
                if self._region.contains_cell(cell):
                    is_terminal = True
                elif cell.level + self.level_mod > self.max_level:
                    return None
            else:
                if (
                    cell.level + self.level_mod > self.max_level
                    or self._region.contains_cell(cell)
                ):
                    is_terminal = True
        return Candidate(cell, is_terminal)

    def _expand_children(self, candidate: Candidate, cell: Cell, num_levels: int) -> int:
        """ExpandChildren (s2region_coverer.cc:122-142)."""
        num_levels -= 1
        num_terminals = 0
        for child_cell in cell.children():
            if num_levels > 0:
                if self._region.may_intersect_cell(child_cell):
                    num_terminals += self._expand_children(
                        candidate, child_cell, num_levels
                    )
                continue
            child = self._new_candidate(child_cell)
            if child is not None:
                candidate.children.append(child)
                if child.is_terminal:
                    num_terminals += 1
        return num_terminals

    def _add_candidate(self, candidate: Candidate | None) -> None:
        """AddCandidate (s2region_coverer.cc:144-187)."""
        if candidate is None:
            return
        if candidate.is_terminal:
            self._result.append(candidate.cell.id)
            return
        num_levels = (
            1 if candidate.cell.level < self.min_level else self.level_mod
        )
        num_terminals = self._expand_children(candidate, candidate.cell, num_levels)
        shift = self._max_children_shift()
        if not candidate.children:
            pass
        elif (
            not self._interior
            and num_terminals == (1 << shift)
            and candidate.cell.level >= self.min_level
        ):
            candidate.is_terminal = True
            self._add_candidate(candidate)
        else:
            # Smaller key pops first (heapq); the reference negates and uses
            # a max-heap — identical order.  Tie-break by insertion counter
            # (the C++ tie-break is pointer order: unspecified; fixtures do
            # not depend on it).
            priority = (
                ((candidate.cell.level << shift) + len(candidate.children)) << shift
            ) + num_terminals
            self._counter += 1
            heapq.heappush(self._pq, (priority, self._counter, candidate))

    def _adjust_level(self, level: int) -> int:
        if self.level_mod > 1 and level > self.min_level:
            level -= (level - self.min_level) % self.level_mod
        return level

    def _adjust_cell_levels(self, cells: list[CID]) -> list[CID]:
        """AdjustCellLevels (s2region_coverer.cc:195-210)."""
        if self.level_mod == 1:
            return cells
        out: list[CID] = []
        for cid in cells:
            level = cid.level()
            new_level = self._adjust_level(level)
            if new_level != level:
                cid = cid.parent(new_level)
            if out and out[-1].contains(cid):
                continue
            while out and cid.contains(out[-1]):
                out.pop()
            out.append(cid)
        return out

    def _get_initial_candidates(self) -> None:
        """GetInitialCandidates (s2region_coverer.cc:212-224)."""
        tmp = RegionCoverer(
            max_cells=min(4, self.max_cells), max_level=self.max_level
        )
        cells = tmp.get_fast_covering(self._region)
        cells = self._adjust_cell_levels(cells)
        for cid in cells:
            self._add_candidate(self._new_candidate(Cell(cid)))

    def _get_covering_internal(self, region) -> None:
        assert self.min_level <= self.max_level
        self._pq = []
        self._result = []
        self._region = region
        self._counter = 0
        self._get_initial_candidates()
        while self._pq and (
            not self._interior or len(self._result) < self.max_cells
        ):
            _, _, candidate = heapq.heappop(self._pq)
            # (s2region_coverer.cc:262-283)
            if (
                self._interior
                or candidate.cell.level < self.min_level
                or len(candidate.children) == 1
                or len(self._result) + len(self._pq) + len(candidate.children)
                <= self.max_cells
            ):
                for child in candidate.children:
                    if self._interior and len(self._result) >= self.max_cells:
                        pass
                    else:
                        self._add_candidate(child)
            else:
                candidate.is_terminal = True
                candidate.children = []
                self._add_candidate(candidate)
        self._pq = []
        self._region = None
        self._result = cellunion.normalize(self._result)
        if self.min_level > 0 or self.level_mod > 1:
            self._result = cellunion.denormalize(
                self._result, self.min_level, self.level_mod
            )

    # ------------------------------------------------------------ public
    def get_covering(self, region) -> list[CID]:
        self._interior = False
        self._get_covering_internal(region)
        return list(self._result)

    def get_interior_covering(self, region) -> list[CID]:
        self._interior = True
        self._get_covering_internal(region)
        return list(self._result)

    def get_fast_covering(self, region) -> list[CID]:
        """GetFastCovering (s2region_coverer.cc:333-337)."""
        cells = list(region.get_cell_union_bound())
        self.canonicalize_covering(cells_ref := cells)
        return cells_ref

    def is_canonical(self, covering: list[CID]) -> bool:
        """IsCanonical (s2region_coverer.cc:343-385)."""
        min_level = self.min_level
        max_level = self.true_max_level()
        level_mod = self.level_mod
        too_many = len(covering) > self.max_cells
        same_parent_count = 1
        prev: CID | None = None
        for cid in covering:
            if not cid.is_valid():
                return False
            level = cid.level()
            if level < min_level or level > max_level:
                return False
            if level_mod > 1 and (level - min_level) % level_mod != 0:
                return False
            if prev is not None:
                if prev.range_max().id >= cid.range_min().id:
                    return False
                if too_many and cid.common_ancestor_level(prev) >= min_level:
                    return False
                plevel = level - level_mod
                if (
                    plevel < min_level
                    or level != prev.level()
                    or cid.parent(plevel) != prev.parent(plevel)
                ):
                    same_parent_count = 1
                else:
                    same_parent_count += 1
                    if same_parent_count == (1 << (2 * level_mod)):
                        return False
            prev = cid
        return True

    def _contains_all_children(self, covering: list[CID], cid: CID) -> bool:
        import bisect

        i = bisect.bisect_left(covering, cid.range_min())
        level = cid.level() + self.level_mod
        child = cid.child_begin(level)
        end = cid.child_end(level)
        while child != end:
            if i >= len(covering) or covering[i] != child:
                return False
            i += 1
            child = child.next()
        return True

    @staticmethod
    def _replace_cells_with_ancestor(covering: list[CID], cid: CID) -> None:
        import bisect

        begin = bisect.bisect_left(covering, cid.range_min())
        end = bisect.bisect_right(covering, cid.range_max())
        covering[begin:end] = [cid]

    def canonicalize_covering(self, covering: list[CID]) -> None:
        """CanonicalizeCovering (s2region_coverer.cc:417-486), in place."""
        if self.max_level < MAX_LEVEL or self.level_mod > 1:
            for idx, cid in enumerate(covering):
                level = cid.level()
                new_level = self._adjust_level(min(level, self.max_level))
                if new_level != level:
                    covering[idx] = cid.parent(new_level)
        covering[:] = cellunion.normalize(covering)
        if self.min_level > 0 or self.level_mod > 1:
            covering[:] = cellunion.denormalize(
                covering, self.min_level, self.level_mod
            )
        excess = len(covering) - self.max_cells
        if excess <= 0 or self.is_canonical(covering):
            return
        if excess * len(covering) > 10000:
            covering[:] = self.get_covering(
                __import__(
                    "s2geometry_spark.kernel.region", fromlist=["CellUnionRegion"]
                ).CellUnionRegion(covering)
            )
        else:
            while len(covering) > self.max_cells:
                best_index, best_level = -1, -1
                for i in range(len(covering) - 1):
                    level = covering[i].common_ancestor_level(covering[i + 1])
                    level = self._adjust_level(level)
                    if level > best_level:
                        best_level = level
                        best_index = i
                if best_level < self.min_level:
                    break
                cid = covering[best_index].parent(best_level)
                self._replace_cells_with_ancestor(covering, cid)
                while best_level > self.min_level:
                    best_level -= self.level_mod
                    cid = cid.parent(best_level)
                    if not self._contains_all_children(covering, cid):
                        break
                    self._replace_cells_with_ancestor(covering, cid)


def flood_fill(region, start: CID) -> list[CID]:
    """S2RegionCoverer::FloodFill (s2region_coverer.cc:380-402): all
    cells at start.level() connected to `start` that intersect
    `region`."""
    from . import cellid as K

    all_ids = {start.id}
    frontier = [start]
    output: list[CID] = []
    while frontier:
        cid = frontier.pop()
        if not region.may_intersect_cell(Cell(cid)):
            continue
        output.append(cid)
        nbrs = K.edge_neighbors(np.array([cid.id], dtype=np.uint64))[0]
        for n in nbrs:
            if int(n) not in all_ids:
                all_ids.add(int(n))
                frontier.append(CID(int(n)))
    return output


def simple_covering(region, start: np.ndarray, level: int) -> list[CID]:
    """S2RegionCoverer::GetSimpleCovering (s2region_coverer.cc:404-408):
    flood fill at a fixed level from the cell containing `start`."""
    from . import cellid as K

    p = np.asarray(start, np.float64)
    leaf = K.from_point(
        np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
    )
    return flood_fill(region, CID(int(leaf[0])).parent(level))
