"""S2DensityTree (s2density_tree.h/.cc): a spatial histogram over S2
cells, used to cluster skewed spatial datasets into equal-weight shards.

A density tree maps S2CellIds to weights with the invariant that every
ancestor of a present cell is present; a cell's weight is the sum of
the weights of the shapes INTERSECTING it (so parent weight is not the
sum of child weights — shared shapes are counted once per cell).

Ported pieces:
  - BreadthFirstTreeBuilder (cc:560-620): Hilbert-range BFS with a
    size budget; negative weights mean "all shapes contain this cell"
    and stop the descent
  - InitToShapeDensity / InitToSumDensity weight functions
  - GetCellWeight / GetNormalCellWeight (cc:352-404): the normal
    weight scales a cell's weight by the product of
    weight/sum-of-siblings up the path, removing multi-counting
  - Normalize (cc:912-949), Leaves, GetPartitioning (cc:406-500):
    pointless-split collapsing, child→parent replacement, and
    first-fit binning at max_weight

The distributed analogue (operators/density.py builds per-level
rollups as DataFrames; plans/sharder.py consumes partitionings); this
kernel is the driver-side contract + fixture surface.
"""

from __future__ import annotations

import bisect
import math
from typing import Callable

from .cid import CID

KMAX_WEIGHT = (2**63 - 1) >> 4  # kMaxWeight (s2density_tree.h:117)

ENTER, SKIP, STOP = 1, 0, -1


class DensityTree:
    def __init__(self, weights: dict[int, int] | None = None):
        # uint64 cell id -> weight; ancestors-present invariant
        self.weights: dict[int, int] = dict(weights or {})

    # ---- basic access
    def weight(self, cid: CID) -> int:
        return self.weights.get(cid.id, 0)

    def children(self, cid: CID) -> list[CID]:
        if cid.is_leaf():
            return []
        return [c for c in (cid.child(k) for k in range(4))
                if c.id in self.weights]

    def has_children(self, cid: CID) -> bool:
        return bool(self.children(cid))

    def get_cell_weight(self, cid: CID) -> int:
        """DecodedPath::GetCell resolution (s2density_tree.cc:634-741
        fixtures): a cell resolves to its deepest present ancestor; if
        that ancestor is a LEAF of the tree the cell inherits its
        weight, otherwise (the branch diverged) the weight is 0."""
        if cid.id in self.weights:
            return self.weights[cid.id]
        node = cid
        while not node.is_face():
            node = node.parent()
            if node.id in self.weights:
                return 0 if self.has_children(node) else self.weights[node.id]
        return 0

    def resolved_has_children(self, cid: CID) -> bool:
        return cid.id in self.weights and self.has_children(cid)

    # ---- traversal (VisitCells, preorder over faces in Hilbert order)
    def visit_cells(self, fn: Callable[[CID], int]) -> bool:
        """Returns False iff the visitor STOPped (the reference's
        VisitCells bool contract, s2density_tree.h); an uninitialized
        (empty) tree visits nothing and returns True."""
        def rec(cid: CID) -> bool:
            action = fn(cid)
            if action == STOP:
                return False
            if action == ENTER:
                for c in self.children(cid):
                    if not rec(c):
                        return False
            return True

        for face in range(6):
            f = CID.from_face(face)
            if f.id in self.weights:
                if not rec(f):
                    return False
        return True

    def decode(self) -> dict[int, int]:
        return dict(self.weights)

    def leaves(self) -> list[CID]:
        out: list[CID] = []

        def fn(cid: CID) -> int:
            if self.has_children(cid):
                return ENTER
            out.append(cid)
            return SKIP

        self.visit_cells(fn)
        return out

    # ---- normal weights (cc:384-404)
    def normal_cell_weight(self, cid: CID) -> int:
        w = self.weight(cid)
        if w == 0:
            return 0
        scale = 1.0
        node = cid
        while not node.is_face():
            weight = self.weight(node)
            parent = node.parent()
            sibling_sum = sum(
                self.weight(parent.child(k)) for k in range(4)
            )
            scale *= weight / sibling_sum
            node = parent
        return round(scale * self.weight(node))

    def normalize(self) -> "DensityTree":
        """Normalize (cc:912-949): top-down, integer arithmetic
        weight' = (weight * parent' - 1) // sum(siblings) + 1."""
        out: dict[int, int] = {}

        def fn(cid: CID) -> int:
            w = self.weight(cid)
            if not cid.is_face():
                parent = cid.parent()
                sibling_sum = sum(
                    self.weight(parent.child(k)) for k in range(4)
                )
                w = (w * out[parent.id] - 1) // sibling_sum + 1
            out[cid.id] = w
            return ENTER

        self.visit_cells(fn)
        return DensityTree(out)

    # ---- partitioning (cc:406-500)
    def _weighted_children(self, cid: CID) -> list[CID]:
        return self.children(cid)

    def _all_children_have_same_weight(self, cid: CID) -> bool:
        kids = self.children(cid)
        return len(kids) >= 2 and all(
            self.weight(k) == self.weight(cid) for k in kids
        )

    def get_partitioning(self, max_weight: int) -> list[list[CID]]:
        target_weight = max_weight // 16
        candidates: list[CID] = []

        def fn(cid: CID) -> int:
            if self.weight(cid) > target_weight and self.has_children(cid):
                return ENTER
            candidates.append(cid)
            return SKIP

        self.visit_cells(fn)
        candidates.sort()

        nodes: list[CID] = []  # kept sorted by cell id

        def last() -> CID | None:
            return nodes[-1] if nodes else None

        for node in candidates:
            if nodes and nodes[-1].intersects(node):
                continue
            # collapse pointless splits upward
            while not node.is_face() and self._all_children_have_same_weight(
                node.parent()
            ):
                node = node.parent()
                while nodes and nodes[-1].intersects(node):
                    nodes.pop()
            bisect.insort(nodes, node)
            # replace complete child sets with the parent when cheap
            while not node.is_face():
                parent = node.parent()
                if self.weight(parent) == 0:
                    break
                if self.normal_cell_weight(parent) >= max_weight // 4:
                    break
                kids = self.children(parent)
                if len(kids) < 2:
                    break
                if not all(k in nodes for k in kids):
                    break
                for k in kids:
                    nodes.remove(k)
                bisect.insort(nodes, parent)
                node = parent

        partitioning: list[list[CID]] = []
        cover: list[CID] = []
        current = 0
        for node in nodes:
            nw = self.normal_cell_weight(node)
            if cover and current + nw >= max_weight:
                partitioning.append(cover)
                cover = []
                current = 0
            cover.append(node)
            current += nw
        if cover:
            partitioning.append(cover)
        return partitioning


# -------------------------------------------------------------- builders
def build_density_tree(
    weight_fn: Callable[[CID], int],
    approximate_size_bytes: int = 10_000,
    max_level: int = 30,
) -> DensityTree:
    """BreadthFirstTreeBuilder::Build (cc:560-620).  weight_fn returns
    the cell weight; NEGATIVE means |weight| with no need to descend
    (every contributing shape fully contains the cell)."""
    weights: dict[int, int] = {}
    size_estimate = 0
    # level 0: the 6 faces; deeper levels only under positive cells
    frontier: list[CID] = [CID.from_face(f) for f in range(6)]
    level = 0
    while frontier and level <= max_level and (
        size_estimate < approximate_size_bytes
    ):
        next_frontier: list[CID] = []
        for cid in frontier:
            w = weight_fn(cid)
            if w == 0:
                continue
            descend = w > 0
            w = min(abs(w), KMAX_WEIGHT)
            weights[cid.id] = w
            size_estimate += 4 + _varint_size(w)
            if descend and level < max_level and not cid.is_leaf():
                next_frontier.extend(cid.child(k) for k in range(4))
        frontier = next_frontier
        level += 1
    return DensityTree(weights)


def _varint_size(w: int) -> int:
    return max(1, (w.bit_length() + 6) // 7)


def shape_density_weight_fn(shapes_with_weights) -> Callable[[CID], int]:
    """IndexCellWeightFunction (cc:550-560): sum of weights of shapes
    that may intersect the cell; negated when every such shape fully
    contains the cell.  `shapes_with_weights` is [(region, weight)]
    where region has may_intersect_cell/contains_cell."""
    from .cell import Cell

    def fn(cid: CID) -> int:
        cell = Cell(cid)
        total = 0
        all_contained = True
        for region, w in shapes_with_weights:
            if region.may_intersect_cell(cell):
                total = min(total + w, KMAX_WEIGHT)
                all_contained &= region.contains_cell(cell)
        return -total if (all_contained and total) else total

    return fn


def sum_density_weight_fn(trees: list[DensityTree]) -> Callable[[CID], int]:
    """InitToSumDensity weight function (cc:235-268)."""

    def fn(cid: CID) -> int:
        total = 0
        contained = True
        for t in trees:
            total = min(total + t.get_cell_weight(cid), KMAX_WEIGHT)
            contained &= not t.resolved_has_children(cid)
        return -total if (contained and total) else total

    return fn


def sum_density_trees(
    trees: list[DensityTree],
    approximate_size_bytes: int = 10_000_000,
    max_level: int = 30,
) -> DensityTree:
    return build_density_tree(
        sum_density_weight_fn(trees), approximate_size_bytes, max_level
    )


# ----------------------------------------------------- wire format
# (s2density_tree.cc:694-860 + s2density_tree_internal.h): version
# magic, then per level a varint(mask) of present faces/children
# followed by the encoded lengths of all present entries EXCEPT the
# last (inferable), then the entries in increasing face/child order.
# The reference writes everything reversed for single-pass encoding;
# the forward layout below is byte-identical.

TREE_VERSION = b"S2DensityTree0"
CHILD_MASK_BITS = 4


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode_cell(cid: CID, weight: int, weights: dict) -> bytes:
    mask = 0
    parts = []
    if not cid.is_leaf():
        for i in range(4):
            child = cid.child(i)
            if child.id in weights:
                mask |= 1 << i
                parts.append(_encode_cell(child, weights[child.id], weights))
    head = _varint((weight << CHILD_MASK_BITS) | mask)
    out = bytearray(head)
    for p in parts[:-1]:
        out += _varint(len(p))
    for p in parts:
        out += p
    return bytes(out)


def encode_tree(weights: dict[int, int]) -> bytes:
    """TreeEncoder::Build: cell-id → weight map (every ancestor present)
    → the S2DensityTree wire bytes."""
    if not weights:
        return b""
    out = bytearray(TREE_VERSION)
    mask = 0
    parts = []
    for face in range(6):
        fc = CID.from_face(face)
        if fc.id in weights:
            mask |= 1 << face
            parts.append(_encode_cell(fc, weights[fc.id], weights))
    out += _varint(mask)
    for p in parts[:-1]:
        out += _varint(len(p))
    for p in parts:
        out += p
    return bytes(out)


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    v = 0
    while True:
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7


def _decode_cell(data: bytes, pos: int, end: int, cid: CID,
                 out: dict) -> None:
    mv, pos = _read_varint(data, pos)
    out[cid.id] = mv >> CHILD_MASK_BITS
    mask = mv & ((1 << CHILD_MASK_BITS) - 1)
    present = [i for i in range(4) if mask & (1 << i)]
    lengths = []
    for _ in range(max(0, len(present) - 1)):
        ln, pos = _read_varint(data, pos)
        lengths.append(ln)
    for k, i in enumerate(present):
        sub_end = pos + lengths[k] if k < len(lengths) else end
        _decode_cell(data, pos, sub_end, cid.child(i), out)
        pos = sub_end


def decode_tree(data: bytes) -> dict[int, int]:
    """S2DensityTree::Decode over the wire bytes → cell-id → weight."""
    if not data:
        return {}
    if data[:len(TREE_VERSION)] != TREE_VERSION:
        raise ValueError("bad S2DensityTree version")
    pos = len(TREE_VERSION)
    mask, pos = _read_varint(data, pos)
    present = [f for f in range(6) if mask & (1 << f)]
    lengths = []
    for _ in range(max(0, len(present) - 1)):
        ln, pos = _read_varint(data, pos)
        lengths.append(ln)
    out: dict[int, int] = {}
    for k, f in enumerate(present):
        sub_end = pos + lengths[k] if k < len(lengths) else len(data)
        _decode_cell(data, pos, sub_end, CID.from_face(f), out)
        pos = sub_end
    return out


def sum_to_root(leaf_weights: dict[int, int]) -> dict[int, int]:
    """SumToRoot (test helper formalized): propagate each cell's weight
    into every ancestor up to its face cell."""
    out: dict[int, int] = {}
    for raw, w in leaf_weights.items():
        cid = CID(raw)
        for level in range(cid.level(), -1, -1):
            p = cid.parent(level)
            out[p.id] = out.get(p.id, 0) + w
    return out


def dilate_tree(tree: DensityTree, radius_rad: float,
                max_level_diff: int) -> DensityTree:
    """S2DensityTree::Dilate (s2density_tree.cc:967-1066): add each
    output leaf's all-neighbors (at the dilation level) that fall in
    the halo = Expand(leaves, radius) − leaves, with the leaf's weight
    propagated to every ancestor so the tree stays valid.  Existing
    nodes deeper than the dilation level are dropped (SKIP)."""
    import numpy as np

    from . import cellunion as CU
    from .cellid import all_neighbors as cid_all_neighbors
    from .metrics import MIN_WIDTH

    leaves = tree.leaves()
    if not leaves:
        return DensityTree({})
    radius_level = MIN_WIDTH.get_level_for_min_value(radius_rad)
    expanded = CU.expand_radius(
        CU.normalize(list(leaves)), radius_rad, max_level_diff)
    dilation_cells = CU.difference(expanded, CU.normalize(list(leaves)))
    weights: dict[int, int] = {}

    def visit(cid: CID) -> int:
        w = max(weights.get(cid.id, 0), tree.weight(cid))
        weights[cid.id] = w
        if tree.has_children(cid) and cid.level() < radius_level:
            return ENTER
        dilate_level = min(radius_level, max_level_diff + cid.level())
        nbrs = cid_all_neighbors(
            np.array([cid.id], dtype=np.uint64), dilate_level)[0]
        for raw in nbrs:
            nb = CID(int(raw))
            if not CU.intersects(dilation_cells, [nb]):
                continue
            while weights.get(nb.id, 0) < w:
                weights[nb.id] = w
                if nb.level() == 0:
                    break
                nb = nb.parent(nb.level() - 1)
        return SKIP

    tree.visit_cells(visit)
    return DensityTree(weights)


def feature_density_weight_fn(
    shape_features: list, feature_weights: dict
) -> Callable[[CID], int]:
    """InitToFeatureDensity weight function (s2density_tree.h:184-232):
    shapes mapping to the SAME feature are not double-counted within a
    cell — the cell weight sums each DISTINCT intersecting feature's
    weight once.  shape_features: (region, feature_key) pairs."""
    from .cell import Cell

    def fn(cid: CID) -> int:
        cell = Cell(cid)
        seen = set()
        all_contained = True
        total = 0
        for region, feat in shape_features:
            if region.may_intersect_cell(cell):
                if feat not in seen:
                    seen.add(feat)
                    total = min(total + feature_weights[feat], KMAX_WEIGHT)
                all_contained &= region.contains_cell(cell)
        return -total if (all_contained and total) else total

    return fn
