"""S2DensityTree fixture ports (s2density_tree_test.cc).

Covers: max-weight clamping, normalize (balancing / disjoint paths /
overflow), leaves, DecodedPath weight resolution, GetPartitioning
(pointless splits, child→parent replacement, oversize cells), and the
InitToSumDensity matrix (one/nested/disjoint/leaves/level-limited/
max-level/empty+nonempty).
"""

from __future__ import annotations

import numpy as np

from s2geometry_spark.kernel import cellid as cid_np
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.density_tree import (
    KMAX_WEIGHT,
    DensityTree,
    build_density_tree,
    shape_density_weight_fn,
    sum_density_trees,
)
from s2geometry_spark.kernel.fractal import random_point


def face(f: int) -> CID:
    return CID.from_face(f)


def fpl(f: int, level: int) -> CID:
    """S2CellId::FromFacePosLevel(f, 0, level)."""
    return face(f).child_begin(level)


def sum_to_root(bases: dict[CID, int]) -> dict[int, int]:
    """s2density_tree_test.cc:74-89."""
    out: dict[int, int] = {}
    for cell, weight in bases.items():
        for level in range(cell.level() + 1):
            p = cell.parent(level)
            out[p.id] = out.get(p.id, 0) + weight
    return out


def leaf_of(p: np.ndarray) -> CID:
    return CID(int(cid_np.from_point(
        np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
    )[0]))


def point_weight_fn(points: list[np.ndarray]):
    """InitToVertexDensity weight function: one weight per point whose
    leaf cell intersects the cell (points never contain a cell)."""
    ids = np.sort(np.array([leaf_of(p).id for p in points], dtype=np.uint64))

    def fn(cid: CID) -> int:
        lo = np.searchsorted(ids, np.uint64(cid.range_min().id), "left")
        hi = np.searchsorted(ids, np.uint64(cid.range_max().id), "right")
        return int(hi - lo)

    return fn


def test_limits_to_max_weight():
    """test.cc:295-315: weights clamp to kMaxWeight."""
    pts = [np.array(v) / np.linalg.norm(v)
           for v in ([1, 2, 3], [1, 4, 9], [1, 6, 10])]
    regions = []
    from s2geometry_spark.kernel.region import ShapeRegion

    for p in pts:
        regions.append((ShapeRegion(points=[p]), KMAX_WEIGHT))
    tree = build_density_tree(shape_density_weight_fn(regions), 10000, 30)
    assert tree.weights
    for w in tree.weights.values():
        assert w == KMAX_WEIGHT


def _random_points_tree(n=400, seed=9, size=10_000, max_level=20):
    rng = np.random.RandomState(seed)
    pts = [random_point(rng) for _ in range(n)]
    tree = build_density_tree(point_weight_fn(pts), size, max_level)
    return tree, pts


def test_can_normalize_tree():
    """test.cc:472-521: normalize keeps the cell set and makes every
    parent's weight the sum of its children (within +1)."""
    tree, pts = _random_points_tree()
    assert len(tree.weights) > len(pts) // 2
    normalized = tree.normalize()
    assert set(tree.weights) == set(normalized.weights)

    def fn(cid):
        kids = normalized.children(cid)
        if kids:
            child_sum = sum(normalized.weight(k) for k in kids)
            w = normalized.weight(cid)
            assert w == child_sum or w + 1 == child_sum, (w, child_sum)
        return 1

    normalized.visit_cells(fn)


def test_normalize_balances():
    """test.cc:523-556: children heavier than the parent rebalance."""
    tree = DensityTree(sum_to_root({
        face(0): 3, face(0).child(0): 2, face(0).child(1): 4,
    }))
    # the reference's gate compares cell SETS (TreeCells drops weights);
    # the exact normalized weights are (w*parent-1)//siblings+1 → 3, 6
    expected = DensityTree({
        face(0).id: 9,
        face(0).child(0).id: 3,
        face(0).child(1).id: 6,
    })
    got = tree.normalize()
    assert got.weights == expected.weights


def test_normalize_does_not_affect_disjoint_paths():
    """test.cc:558-580."""
    tree = DensityTree(sum_to_root({
        face(0).child(0): 1,
        face(0).child(1).child(2): 1,
        face(0).child(2): 1,
    }))
    assert tree.normalize().weights == tree.weights


def test_normalize_does_not_overflow():
    """test.cc:582-607: perfectly divided int64-scale weights."""
    kmax32 = 2**31 - 1
    kmax64 = 2**63 - 1
    tree = DensityTree(sum_to_root({
        face(0).child(1).child(2): kmax32,
        face(0).child(1).child(3): kmax64 - kmax32 - 1,
        face(0).child(2): 1,
    }))
    assert tree.normalize().weights == tree.weights


def test_leaves_returns_leaves_of_tree():
    """test.cc:609-632."""
    tree, _ = _random_points_tree(seed=10)
    leaves = tree.leaves()
    want = [CID(c) for c in tree.weights
            if not tree.has_children(CID(c))]
    assert sorted(l.id for l in leaves) == sorted(l.id for l in want)
    # leaves are disjoint and cover every deepest path
    ids = sorted(l.id for l in leaves)
    for a, b in zip(ids, ids[1:]):
        assert not CID(a).intersects(CID(b))


def test_decoder_scales_weights_based_on_parent():
    """test.cc:634-663: 4 children sharing the parent's weight each
    normalize to 25% of it."""
    parent = fpl(0, 5)
    weights = sum_to_root({parent: 100})
    for i in range(4):
        weights[parent.child(i).id] = 100
    tree = DensityTree(weights)
    for i in range(4):
        assert tree.normal_cell_weight(parent.child(i)) == 25
        assert tree.get_cell_weight(parent.child(i)) == 100


def test_decodes_paths_correctly():
    """test.cc:665-741: weight resolution through absent branches and
    below leaves."""
    kface0 = face(1)
    kface2 = face(2)
    kcell22 = kface2.child(2)
    weights = sum_to_root({kcell22.child(2): 100, kcell22.child(3): 120})
    tree = DensityTree(weights)

    for f in range(6):
        if f != 2:
            assert tree.get_cell_weight(face(f)) == 0
    assert tree.get_cell_weight(face(2)) == 220
    assert tree.get_cell_weight(kface0.child(0)) == 0
    assert tree.get_cell_weight(kface0.child(1)) == 0
    assert tree.get_cell_weight(kface2.child(2)) == 220
    assert tree.get_cell_weight(kface2.child(3)) == 0
    assert tree.get_cell_weight(kcell22.child(0)) == 0
    assert tree.get_cell_weight(kcell22.child(1)) == 0
    assert tree.get_cell_weight(kcell22.child(2)) == 100
    assert tree.get_cell_weight(kcell22.child(3)) == 120

    rng = np.random.RandomState(11)

    def random_descendant(cid: CID) -> CID:
        cnt = rng.randint(0, 30 - (cid.level() + 1))
        for _ in range(cnt):
            cid = cid.child(rng.randint(0, 4))
        return cid

    for _ in range(100):
        assert tree.get_cell_weight(random_descendant(kface2.child(3))) == 0
    for _ in range(100):
        assert tree.get_cell_weight(random_descendant(kcell22.child(2))) == 100
        assert tree.get_cell_weight(random_descendant(kcell22.child(3))) == 120


def test_partitioning_removes_pointless_splits():
    """test.cc:743-768."""
    base = fpl(0, 4)
    weights = sum_to_root({base: 20})
    for i in range(4):
        weights[base.child(i).id] = 20
    tree = DensityTree(weights)
    for cover in tree.get_partitioning(100):
        for cell in cover:
            assert cell.level() == 4


def test_partitioning_replaces_children_with_parent():
    """test.cc:770-812: merge when the parent is small enough, keep
    children when it is not."""
    b0, b1 = fpl(0, 4), fpl(1, 4)
    weights = sum_to_root({b0: 20, b1: 40})
    for i in range(4):
        weights[b0.child(i).id] = 18
        weights[b1.child(i).id] = 18
    tree = DensityTree(weights)
    for cover in tree.get_partitioning(100):
        for cell in cover:
            if cell.face() == 0:
                assert cell.level() == 4
            elif cell.face() == 1:
                assert cell.level() == 5
            else:
                raise AssertionError(f"unexpected face {cell.face()}")


def test_partitioning_oversize_cells():
    """test.cc:814-833: oversize cells become singleton partitions."""
    weights = sum_to_root({fpl(i, 10): 1000 for i in range(6)})
    tree = DensityTree(weights)
    partitioning = tree.get_partitioning(10)
    assert len(partitioning) == 6
    for cover in partitioning:
        assert len(cover) == 1


# ----------------------------------------------------- sum density trees
WEIGHTS = {}


def _weights():
    return {
        face(1): 3,
        face(1).child(1): 1,
        face(1).child(2): 2,
        fpl(1, 30): 4,
        face(2): 4,
        face(3): 2,
        face(3).child(0): 2,
        fpl(3, 30): 2,
    }


def _insert(weights_map, out, cell):
    if cell in weights_map:
        out[cell.id] = weights_map[cell]
        if not cell.is_leaf():
            for i in range(4):
                _insert(weights_map, out, cell.child(i))


def _make_tree(weights_map, root: CID) -> DensityTree:
    out: dict[int, int] = {}
    _insert(weights_map, out, root)
    w = weights_map[root]
    node = root
    while node.level() > 0:
        node = node.parent()
        out[node.id] = w
    return DensityTree(out)


def check_sum(expected: dict[int, int], roots: list[CID], max_level=30):
    wm = _weights()
    trees = [_make_tree(wm, r) for r in roots]
    got = sum_density_trees(trees, 1_000_000, max_level)
    assert got.weights == expected


def test_sum_empty():
    check_sum({}, [])


def test_sum_one():
    check_sum(
        {face(1).id: 3, face(1).child(1).id: 1, face(1).child(2).id: 2},
        [face(1)],
    )


def test_sum_nested():
    check_sum(
        {face(1).id: 4, face(1).child(1).id: 2, face(1).child(2).id: 2},
        [face(1), face(1).child(1)],
    )


def test_sum_disjoint():
    check_sum(
        {face(2).id: 4, face(3).id: 2, face(3).child(0).id: 2},
        [face(2), face(3)],
    )


def test_sum_leaves():
    check_sum(
        sum_to_root({fpl(1, 30): 4, fpl(3, 30): 2}),
        [fpl(1, 30), fpl(3, 30)],
    )


def test_sum_leaves_level_limited():
    check_sum(
        sum_to_root({fpl(1, 20): 4, fpl(3, 20): 2}),
        [fpl(1, 30), fpl(3, 30)],
        max_level=20,
    )


def test_sum_max_level():
    """test.cc:979-998: a 0/1 intersects weight function truncated at
    every level."""
    cell = face(5).child(2).child(1).child(0)
    for max_level in range(cell.level() + 1):
        tree = build_density_tree(
            lambda cid: int(cid.intersects(cell)), 10_000, max_level
        )
        assert tree.weights == sum_to_root({cell.parent(max_level): 1})


def test_sum_empty_and_nonempty():
    """test.cc:1000-1027."""
    rng = np.random.RandomState(12)
    p = random_point(rng)
    tree = build_density_tree(point_weight_fn([p]), 1_000, 10)
    assert tree.weights
    got = sum_density_trees([tree, DensityTree()], 1_000_000, 10)
    assert got.weights == tree.weights


def test_polygon_density_descends_only_into_boundary():
    """IndexCellWeightFunction semantics (cc:550-560): cells fully
    inside a polygon weigh the polygon but stop the descent."""
    from s2geometry_spark.kernel.contains import Loop, Polygon, parse_points
    from s2geometry_spark.kernel.region import ShapeRegion

    poly = Polygon([Loop(parse_points("0:0, 0:20, 20:20, 20:0"))])
    region = ShapeRegion(polygon=poly)
    tree = build_density_tree(
        shape_density_weight_fn([(region, 7)]), 100_000, 6
    )
    assert tree.weights
    from s2geometry_spark.kernel.cell import Cell

    interior_leaves = 0
    for c, w in tree.weights.items():
        cid = CID(c)
        assert w == 7
        assert region.may_intersect_cell(Cell(cid))
        if region.contains_cell(Cell(cid)) and cid.level() < 6:
            # contained cells are tree leaves — the builder stopped
            assert not tree.has_children(cid)
            interior_leaves += 1
    assert interior_leaves > 0
