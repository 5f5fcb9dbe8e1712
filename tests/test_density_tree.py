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


# ---------------------------------------------------- wire format
# (TreeEncoderTest, s2density_tree_test.cc:221-293 + Encode at :351-379)


def _roundtrip(leaf_weights):
    from s2geometry_spark.kernel.density_tree import (
        decode_tree,
        encode_tree,
        sum_to_root,
    )

    expected = sum_to_root(leaf_weights)
    raw = encode_tree(expected)
    assert decode_tree(raw) == expected
    return raw


def test_encode_empty():
    from s2geometry_spark.kernel.density_tree import decode_tree, encode_tree

    assert encode_tree({}) == b""
    assert decode_tree(b"") == {}


def test_encode_one_face():
    from s2geometry_spark.kernel.density_tree import decode_tree, encode_tree

    w = {CID.from_face(3).id: 17}
    got = decode_tree(encode_tree(w))
    assert got == w


def test_encode_one_leaf():
    from s2geometry_spark.kernel import cellid as K

    leaf = int(K.from_point(np.array([0.0]), np.array([1.0]),
                            np.array([0.0]))[0])
    _roundtrip({leaf: 123})


def test_encode_one_branch():
    from s2geometry_spark.kernel import cellid as K

    split = CID(int(K.from_face_ij(1, np.array([1 << 10]),
                                   np.array([2 << 10]))[0])).parent(10)
    _roundtrip({split.child_begin(20).id: 1, split.child_end(20).id: 17})


def test_encode_each_face():
    from s2geometry_spark.kernel.density_tree import decode_tree, encode_tree

    w = {CID.from_face(i).id: 10 + i for i in range(6)}
    assert decode_tree(encode_tree(w)) == w


def test_encode_random_branches():
    rng = np.random.RandomState(20260819)
    for weight in range(1, 1000, 37):
        leaves = {}
        for _ in range(50):
            level = int(rng.randint(0, 31))
            face = int(rng.randint(0, 6))
            pos = (int(rng.randint(0, 1 << 30)) << 31
                   | int(rng.randint(0, 1 << 31)))
            cid = CID(((face << 61) | pos | 1) & ((1 << 64) - 1))
            leaves[cid.parent(level).id] = weight
        _roundtrip(leaves)


def test_encode_deterministic():
    """test.cc:351-379 Encode: re-encoding yields identical bytes."""
    from s2geometry_spark.kernel.density_tree import encode_tree, sum_to_root

    rng = np.random.RandomState(5)
    leaves = {}
    for _ in range(10):
        p = rng.randn(3)
        p /= np.linalg.norm(p)
        from s2geometry_spark.kernel import cellid as K

        leaves[int(K.from_point(*[np.array([v]) for v in p])[0])] = 1
    w = sum_to_root(leaves)
    assert encode_tree(w) == encode_tree(dict(reversed(list(w.items()))))


# ------------------------------------------------- Dilate (cc:967-1066)


def _dbg(s):
    return CID(int(cid_np.from_debug_string(s)))


def _tree_nodes(tree, leaves_only=False):
    if leaves_only:
        ids = [l.id for l in tree.leaves()]
    else:
        ids = list(tree.weights)
    return sorted(
        cid_np.to_debug_string(np.array(ids, dtype=np.uint64)))


EARTH_M = 6371010.0


def test_dilation_at_face_center():
    """test.cc:1326-1359: two level-16 cells near the face-0 center
    dilated by 300 m (level 14) — a 4x3 grid of level-14 leaves."""
    from s2geometry_spark.kernel.density_tree import (
        DensityTree,
        dilate_tree,
        sum_to_root,
    )

    w = sum_to_root({CID.from_token(t).id: 1
                     for t in ("0ffffffd5", "10000002b")})
    d = dilate_tree(DensityTree(w), 300 / EARTH_M, 0)
    toks = sorted(
        cid_np.to_token(np.array([l.id for l in d.leaves()],
                                 dtype=np.uint64)))
    assert toks == sorted([
        "0fffffe5", "0fffffe3", "1000001d", "1000001b", "0ffffffb",
        "0ffffffd", "10000003", "10000005", "0ffffff9", "0fffffff",
        "10000001", "10000007"])


def test_small_dilation_constrained_to_leaf_level():
    """test.cc:1173-1205: 1 km dilation with max_level_diff 0 adds the
    7 level-2 neighbors of each corner leaf."""
    from s2geometry_spark.kernel.density_tree import DensityTree, dilate_tree

    w = {_dbg("1/").id: 4, _dbg("1/1").id: 2, _dbg("1/11").id: 2,
         _dbg("1/3").id: 2, _dbg("1/33").id: 2}
    d = dilate_tree(DensityTree(w), 1000 / EARTH_M, 0)
    assert _tree_nodes(d) == sorted([
        "0/", "0/2", "0/22", "0/23", "1/", "1/1", "1/10", "1/11", "1/12",
        "1/13", "1/3", "1/30", "1/31", "1/32", "1/33", "2/", "2/0", "2/00",
        "2/01", "3/", "3/1", "3/10", "3/11", "5/", "5/1", "5/11", "5/12"])


def test_small_dilation_relative_to_leaf_size():
    """test.cc:1207-1229: max_level_diff 1 → 11 extra level-3 cells per
    leaf, 24 leaves total."""
    from s2geometry_spark.kernel.density_tree import DensityTree, dilate_tree

    w = {_dbg("1/").id: 4, _dbg("1/1").id: 2, _dbg("1/11").id: 2,
         _dbg("1/3").id: 2, _dbg("1/33").id: 2}
    d = dilate_tree(DensityTree(w), 1000 / EARTH_M, 1)
    assert len(d.leaves()) == 24


def test_dilation_uses_maximum():
    """test.cc:1231-1286: the common neighbor 3b gets the MAXIMUM
    dilated weight from either distribution."""
    from s2geometry_spark.kernel.density_tree import DensityTree, dilate_tree

    t1 = DensityTree({CID.from_token("3").id: 10, CID.from_token("3c").id: 2,
                      CID.from_token("3d").id: 2, CID.from_token("34").id: 8,
                      CID.from_token("31").id: 8})
    t2 = DensityTree({CID.from_token("3").id: 10, CID.from_token("3c").id: 8,
                      CID.from_token("3d").id: 8, CID.from_token("34").id: 2,
                      CID.from_token("31").id: 2})
    b = CID.from_token("3b")
    for t in (t1, t2):
        d = dilate_tree(t, 1000 / EARTH_M, 0)
        assert d.weight(b) == 8, cid_np.to_token(
            np.array([b.id], dtype=np.uint64))


def test_dilation_larger_than_leaf_size():
    """test.cc:1288-1324: a 1000 km radius caps the dilation level at 2;
    deeper nodes are dropped and level-2 neighbors added."""
    from s2geometry_spark.kernel.density_tree import DensityTree, dilate_tree

    w = {_dbg("1/").id: 4, _dbg("1/1").id: 2, _dbg("1/11").id: 2,
         _dbg("1/111").id: 2, _dbg("1/1111").id: 2, _dbg("1/11111").id: 2,
         _dbg("1/13").id: 2, _dbg("1/133").id: 2, _dbg("1/1333").id: 2,
         _dbg("1/13333").id: 2}
    d = dilate_tree(DensityTree(w), 1000 * 1000 / EARTH_M, 4)
    assert _tree_nodes(d) == sorted([
        "1/", "1/0", "1/02", "1/03", "1/1", "1/10", "1/11", "1/12",
        "1/13", "1/2", "1/20", "1/21", "1/3", "1/31", "3/", "3/1",
        "3/10", "3/11", "5/", "5/1", "5/11", "5/12"])


def test_init_to_feature_density():
    """test.cc:416-471: a feature with two shapes is not double-counted
    per cell — expected exactly {face(p): 6, parent1(p): 6,
    parent1(q): 1}."""
    from s2geometry_spark.kernel import cellid as K
    from s2geometry_spark.kernel.density_tree import (
        build_density_tree,
        feature_density_weight_fn,
    )
    from s2geometry_spark.kernel.region import CellUnionRegion

    p_cid = CID(int(K.from_latlng(np.array([5.0]), np.array([5.0]))[0]))
    q_cid = CID(int(K.from_latlng(np.array([-5.0]), np.array([5.0]))[0]))
    p_region = CellUnionRegion([p_cid])
    q_region = CellUnionRegion([q_cid])
    shape_features = [(p_region, "TwoShapes"), (q_region, "TwoShapes"),
                      (p_region, "OneShapes")]
    weights = {"TwoShapes": 1, "OneShapes": 5}
    tree = build_density_tree(
        feature_density_weight_fn(shape_features, weights), 100, 1)
    got = dict(tree.weights)
    assert got == {
        p_cid.parent(0).id: 6,
        p_cid.parent(1).id: 6,
        q_cid.parent(1).id: 1,
    }


def test_shape_index_coverings():
    """CoveringsTest ShapeIndexPoint/Line/Polygon/Multiple
    (test.cc:1035-1171): the cell-weight function agrees with region
    intersects/contains over a covering of the shapes — intersecting
    cover cells weigh ±sum, complement cells weigh 0."""
    import math

    from s2geometry_spark.kernel.cell import Cell
    from s2geometry_spark.kernel.contains import Loop, Polygon
    from s2geometry_spark.kernel.coverer import RegionCoverer
    from s2geometry_spark.kernel.density_tree import (
        shape_density_weight_fn,
    )
    from s2geometry_spark.kernel.fractal import (
        make_regular_points,
        random_point,
    )
    from s2geometry_spark.kernel.region import (
        CellUnionRegion,
        RegionUnion,
        ShapeRegion,
    )

    rng = np.random.RandomState(20260819)
    km = 1.0 / 6371.01

    def poly_region(center, radius_km, n):
        return ShapeRegion(polygon=Polygon(
            [Loop(make_regular_points(center, radius_km * km, n))]))

    cases = [
        [(CellUnionRegion([CID(int(cid_np.from_point(
            *[np.array([v]) for v in random_point(rng)])[0]))]), 1)],
        [(poly_region(random_point(rng), 1.0, 3), 1)],   # line-ish ring
        [(poly_region(random_point(rng), 10.0, 16), 3)],
        [(poly_region(random_point(rng), 5.0, 8), 2),
         (poly_region(random_point(rng), 2.0, 6), 7)],
    ]
    for shapes in cases:
        fn = shape_density_weight_fn(shapes)
        cover = RegionCoverer(max_cells=64).get_covering(
            RegionUnion([r for r, _ in shapes]))
        for cid in cover:
            got = fn(cid)
            cell = Cell(cid)
            hits = [(r, w) for r, w in shapes
                    if r.may_intersect_cell(cell)]
            expect = sum(w for _, w in hits)
            # all_contained is over INTERSECTING shapes only (the
            # reference's IndexCellWeightFunction visits intersecting
            # shapes, s2density_tree.cc:539-556)
            if expect and all(r.contains_cell(cell) for r, _ in hits):
                expect = -expect
            assert got == expect, cid.id
            assert got != 0


def test_visitor_cancellation():
    """VisitorCancellation (test.cc:317-333): a STOP from the visitor
    makes VisitCells return False (no error)."""
    from s2geometry_spark.kernel.density_tree import STOP, sum_to_root

    leaf = int(cid_np.from_point(
        np.array([1.0 / np.sqrt(14)]), np.array([2.0 / np.sqrt(14)]),
        np.array([3.0 / np.sqrt(14)]))[0])
    tree = DensityTree(sum_to_root({leaf: 1}))
    assert tree.visit_cells(lambda cid: STOP) is False


def test_visit_uninitialized_tree():
    """VisitUninitializedTree (test.cc:335-349): visiting an empty tree
    visits zero cells and completes (returns True)."""
    from s2geometry_spark.kernel.density_tree import ENTER

    tree = DensityTree()
    count = 0

    def fn(cid):
        nonlocal count
        count += 1
        return ENTER

    assert tree.visit_cells(fn) is True
    assert count == 0
