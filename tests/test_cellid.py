"""Golden + property tests for the S2CellId kernel.

Ports the deterministic fixtures of the reference's s2cell_id_test.cc /
src/python/s2cell_id_test.py (see FIXTURES.md §2, §6).  Randomized cases
use np.random.default_rng(42) — abseil BitGen streams are not reproducible
outside abseil, so we port the *properties*, not the exact streams.
"""

import numpy as np
import pytest

from s2geometry_spark.kernel import cellid as C
from s2geometry_spark.kernel import coords
from s2geometry_spark.kernel.hilbert import (
    MAX_SIZE,
    from_face_ij,
    to_face_ij_orientation,
)

RNG = np.random.default_rng(42)


def _random_cellids(n, rng=None):
    """Random valid cell ids at random levels (analog of s2random::CellId)."""
    rng = rng or RNG
    lat = rng.uniform(-90, 90, n)
    lng = rng.uniform(-180, 180, n)
    leaf = C.from_latlng(lat, lng)
    lvl = rng.integers(0, 31, n)
    return C.parent(leaf, lvl)


# ---------------------------------------------------------------- faces
def test_face_of_latlng_probes():
    # s2cell_id_test.cc:89-96
    lat = np.array([0.0, 0, 90, 0, 0, -90])
    lng = np.array([0.0, 90, 0, 180, -90, 0])
    assert C.face(C.from_latlng(lat, lng)).tolist() == [0, 1, 2, 3, 4, 5]


def test_from_face_properties():
    ids = C.from_face(np.arange(6))
    assert C.is_face(ids).all()
    assert C.is_valid(ids).all()
    assert (C.level(ids) == 0).all()
    assert C.face(ids).tolist() == [0, 1, 2, 3, 4, 5]


# ---------------------------------------------------------------- tokens
def test_tokens_golden():
    # s2cell_id_test.py:64-67; s2cell_id_test.cc:340-369
    assert C.to_token(C.from_face([0]))[0] == "1"
    assert C.to_token(C.from_face([3]))[0] == "7"
    assert C.to_token(np.array([0], dtype=np.uint64))[0] == "X"
    assert C.from_token(["X"])[0] == 0
    for bad in ["876b e99", "876bee99\n", "876[ee99", " 876bee99"]:
        assert C.from_token([bad])[0] == 0
    # >16 chars invalid
    assert C.from_token(["0" * 17])[0] == 0


def test_token_roundtrip_random():
    ids = _random_cellids(2000)
    toks = C.to_token(ids)
    assert (C.from_token(toks) == ids).all()
    # order-preserving (s2cell_id.h:415)
    order_ids = np.argsort(ids)
    order_tok = sorted(range(len(toks)), key=lambda k: toks[k])
    assert (ids[order_ids] == ids[order_tok]).all()


def test_debug_strings():
    # s2cell_id_test.py:357-367
    assert C.to_debug_string(C.from_face([0]))[0] == "0/"
    assert C.to_debug_string(C.child(C.child(C.from_face([3]), 0), 2))[0] == "3/02"
    rt = C.from_debug_string("3/02")
    assert C.to_debug_string(rt)[0] == "3/02"


# ---------------------------------------------------------------- hierarchy
def test_from_face_ij_roundtrip():
    n = 20000
    f = RNG.integers(0, 6, n)
    i = RNG.integers(0, MAX_SIZE, n)
    j = RNG.integers(0, MAX_SIZE, n)
    ids = from_face_ij(f, i, j)
    f2, i2, j2, _ = to_face_ij_orientation(ids)
    assert (f2 == f).all() and (i2 == i).all() and (j2 == j).all()
    assert C.is_leaf(ids).all()
    assert C.is_valid(ids).all()


def test_parent_child_inverses():
    ids = _random_cellids(5000)
    lvl = C.level(ids)
    m = lvl < 30
    ids, lvl = ids[m], lvl[m]
    for k in range(4):
        ch = C.child(ids, k)
        assert (C.level(ch) == lvl + 1).all()
        assert (C.immediate_parent(ch) == ids).all()
        assert (C.child_position(ch, lvl + 1) == k).all()
        assert C.contains(ids, ch).all()
    # parent at ancestor levels
    anc_lvl = (lvl * 0.5).astype(int)
    par = C.parent(ids, anc_lvl)
    assert (C.level(par) == anc_lvl).all()
    assert C.contains(par, ids).all()


def test_range_containment():
    ids = _random_cellids(5000)
    assert (C.range_min(ids) <= ids).all()
    assert (C.range_max(ids) >= ids).all()
    assert C.contains(ids, ids).all()
    assert C.intersects(ids, ids).all()
    # children partition the parent's range
    m = C.level(ids) < 30
    sub = ids[m]
    assert (C.range_min(sub) == C.range_min(C.child(sub, 0))).all()
    assert (C.range_max(sub) == C.range_max(C.child(sub, 3))).all()
    # leaf range bounds are odd leaf ids → consecutive sibling ranges differ by 2
    assert (
        C.range_max(C.child(sub, 0)) + np.uint64(2) == C.range_min(C.child(sub, 1))
    ).all()


def test_center_siti_bit_patterns():
    # s2cell_id_test.cc:160-196: center si/ti of a level-k cell ends in a 1
    # followed by 30-k zeros.
    ids = _random_cellids(2000)
    lvl = C.level(ids)
    _, si, ti = C.get_center_siti(ids)
    expect_lsb = np.int64(1) << (30 - lvl)
    assert ((si & (2 * expect_lsb - 1)) == expect_lsb).all()
    assert ((ti & (2 * expect_lsb - 1)) == expect_lsb).all()


def test_next_prev_advance():
    ids = _random_cellids(1000)
    # keep away from the global begin/end of each level
    inner = (C.face(ids) >= 1) & (C.face(ids) <= 3) & (C.level(ids) >= 1)
    ids = ids[inner]
    nxt = C.next_id(ids)
    assert (C.prev_id(nxt) == ids).all()
    assert (C.level(nxt) == C.level(ids)).all()
    ones = np.ones(len(ids), dtype=np.int64)
    assert (C.advance(ids, ones) == nxt).all()
    assert (C.advance(ids, -ones) == C.prev_id(ids)).all()
    assert (C.advance(nxt, -ones) == ids).all()
    # advance by 4 at level l == next sibling group (s2cell_id.cc:119-137)
    assert (C.advance(ids, 4 * ones) == C.next_id(C.next_id(C.next_id(nxt)))).all()


def test_common_ancestor_level():
    f0 = C.from_face([0])
    assert C.common_ancestor_level(f0, f0)[0] == 0
    leaf = C.from_latlng(np.array([10.0]), np.array([20.0]))
    assert C.common_ancestor_level(leaf, leaf)[0] == 30
    assert C.common_ancestor_level(leaf, C.parent(leaf, 5))[0] == 5
    f1 = C.from_face([1])
    assert C.common_ancestor_level(f0, f1)[0] == -1
    # siblings → parent's level
    ids = _random_cellids(1000)
    m = C.level(ids) < 30
    c0, c1 = C.child(ids[m], 0), C.child(ids[m], 1)
    assert (C.common_ancestor_level(c0, c1) == C.level(ids[m])).all()


def test_maximum_tile():
    # Covering [range_min(cell), range_max(cell)+1) tiles back to the cell.
    ids = _random_cellids(500)
    lo = C.range_min(ids)
    # exclusive end = leaf one past range_max: leaf ids are odd, so +2
    limit = C.range_max(ids) + np.uint64(2)
    assert (C.maximum_tile(lo, limit) == ids).all()
    # tiling a half range yields child(0..1) coverage start
    m = C.level(ids) < 30
    half_limit = C.range_max(C.child(ids[m], 1)) + np.uint64(2)
    assert (C.maximum_tile(lo[m], half_limit) == C.child(ids[m], 0)).all()


# ---------------------------------------------------------------- centers
def test_face_cell_centers():
    # s2cell_id_test.py:127-172
    x, y, z = C.to_point(C.from_face([0]))
    np.testing.assert_allclose([x[0], y[0], z[0]], [1, 0, 0], atol=1e-15)
    u_lo, u_hi, v_lo, v_hi = C.get_bound_uv(C.from_face([0]))
    assert (u_lo[0], u_hi[0], v_lo[0], v_hi[0]) == (-1.0, 1.0, -1.0, 1.0)


def test_size_ij():
    assert C.get_size_ij(0) == 2**30
    assert C.get_size_ij(30) == 1


def test_latlng_roundtrip_via_leaf_center():
    # s2cell_id_test.py:135-142: agree to 1e-5 degrees through leaf center
    lat = RNG.uniform(-89.9, 89.9, 5000)
    lng = RNG.uniform(-180, 180, 5000)
    ids = C.from_latlng(lat, lng)
    lat2, lng2 = C.to_latlng(ids)
    assert np.abs(lat2 - lat).max() < 1e-5
    dlng = np.abs(((lng2 - lng + 180) % 360) - 180)
    # meridians converge at the poles: scale longitude error by cos(lat)
    assert (dlng * np.cos(np.radians(lat))).max() < 1e-5


def test_hilbert_curve_continuity():
    # s2cell_id_test.cc:505-560: consecutive leaf cells are adjacent
    ids = _random_cellids(200)
    leaves = C.parent(ids, 30)
    nxt = C.next_id(leaves)
    ok = C.is_valid(nxt)
    x1, y1, z1 = C.to_point(leaves[ok])
    x2, y2, z2 = C.to_point(nxt[ok])
    # max distance between neighboring leaf centers is tiny (~ leaf diag)
    chord2 = (x1 - x2) ** 2 + (y1 - y2) ** 2 + (z1 - z2) ** 2
    max_leaf_diag = 2.5e-9  # ~ sqrt(2)*pi/2^30 with slack
    assert chord2.max() < max_leaf_diag**2


# ---------------------------------------------------------------- neighbors
def _dbg(s):
    return C.from_debug_string(s)[0]


def test_edge_neighbors_face1():
    # s2cell_id_test.cc:598-605
    nbrs = C.edge_neighbors(C.from_face([1]))[0]
    assert C.is_face(nbrs).all()
    assert C.face(nbrs).tolist() == [5, 3, 2, 0]


def test_edge_neighbors_corner_all_levels():
    # s2cell_id_test.cc:607-622
    kMaxIJ = MAX_SIZE - 1
    for lvl in range(1, 31):
        cid = C.parent(from_face_ij([1], [0], [0]), lvl)
        nbrs = C.edge_neighbors(cid)[0]
        size_ij = int(C.get_size_ij(lvl))
        expect = [
            C.parent(from_face_ij([5], [kMaxIJ], [kMaxIJ]), lvl)[0],
            C.parent(from_face_ij([1], [size_ij], [0]), lvl)[0],
            C.parent(from_face_ij([1], [0], [size_ij]), lvl)[0],
            C.parent(from_face_ij([0], [kMaxIJ], [0]), lvl)[0],
        ]
        assert nbrs.tolist() == [int(e) for e in expect]


def test_vertex_neighbors_face2_center():
    # s2cell_id_test.cc:624-633
    leaf = C.from_point(np.array([0.0]), np.array([0.0]), np.array([1.0]))
    nbrs = sorted(C.vertex_neighbors(leaf, 5)[0].tolist())
    expect = sorted(
        int(C.parent(from_face_ij([2], [(1 << 29) - (i < 2)], [(1 << 29) - (i == 0 or i == 3)]), 5)[0])
        for i in range(4)
    )
    assert nbrs == expect


def test_vertex_neighbors_cube_corner():
    # s2cell_id_test.cc:636-645: corner leaf of face 0 → 3 neighbors at level 0
    corner = C.range_min(C.from_face([0]))  # FromFacePosLevel(0, 0, 30)
    nbrs = sorted(C.vertex_neighbors(corner, 0)[0].tolist())
    expect = sorted(int(v) for v in C.from_face([0, 4, 5]))
    assert nbrs == expect


def test_all_neighbors_corner_cell_7():
    # s2cell_id_test.cc:663-679 CornerCellHas7Neighbors (multiset!)
    cid = C.from_debug_string("3/0000")
    out = C.all_neighbors(cid, int(C.level(cid)[0]))[0]
    expect = sorted(
        int(_dbg(s))
        for s in ["1/2221", "1/2222", "2/3330", "2/3333", "2/3333", "3/0001", "3/0002", "3/0003"]
    )
    assert sorted(out.tolist()) == expect


def test_all_neighbors_top_level_face():
    # s2cell_id_test.cc:680-692
    out = C.all_neighbors(C.from_debug_string("3/"), 0)[0]
    expect = sorted(int(_dbg(s)) for s in ["1/", "2/", "2/", "2/", "4/", "5/", "5/", "5/"])
    assert sorted(out.tolist()) == expect


def test_all_neighbors_zurich():
    # s2cell_id_test.cc:693-710
    cid = C.from_debug_string("2/033020001100")
    out = C.all_neighbors(cid, int(C.level(cid)[0]))[0]
    expect = sorted(
        int(_dbg(s))
        for s in [
            "2/033020001030", "2/033020001033", "2/033020001101", "2/033020001102",
            "2/033020001103", "2/033031110010", "2/033031110011", "2/033031110322",
        ]
    )
    assert sorted(out.tolist()) == expect


def test_all_neighbors_contains_vertex_neighbors():
    # consistency property (s2cell_id_test.cc:561-593 TestAllNeighbors)
    ids = _random_cellids(50)
    ids = ids[C.level(ids) < 29]
    for one in ids:
        arr = np.array([one], dtype=np.uint64)
        lvl = int(C.level(arr)[0])
        nbr_lvl = min(30, lvl + 2)
        allnb = set(C.all_neighbors(arr, nbr_lvl)[0].tolist())
        # every edge neighbor's descendants adjacent to the cell appear
        en = C.edge_neighbors(arr)[0]
        for e in en:
            assert C.intersects(
                np.array([e], dtype=np.uint64).repeat(len(allnb)),
                np.array(sorted(allnb), dtype=np.uint64),
            ).any()


# ---------------------------------------------------------------- bias codec
def test_bias_codec_order_preserving():
    ids = _random_cellids(5000)
    b = C.bias(ids)
    assert (C.unbias(b) == ids).all()
    order_u = np.argsort(ids, kind="stable")
    order_s = np.argsort(b, kind="stable")
    assert (order_u == order_s).all()
    # faces 4-7 set the MSB: raw int64 view would invert order without bias
    hi = C.from_face([5])
    lo = C.from_face([0])
    assert C.bias(hi)[0] > C.bias(lo)[0]


def test_is_valid_rejects_garbage():
    bad = np.array([0, 2**63 + 2**62, 0x6], dtype=np.uint64)  # face>5 / even lsb
    v = C.is_valid(np.array([C.from_face([2])[0], bad[0]], dtype=np.uint64))
    assert v.tolist() == [True, False]
