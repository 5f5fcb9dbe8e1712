"""S2Loop relation matrix — ported from s2loop_test.cc:699-917
(LoopRelations + LoopRelationsWhenSameExceptPiecesStickingOutAndIn,
with the TestNestedPair/TestDisjointPair/TestCoveringPair/
TestOverlappingPair identity machinery)."""

import numpy as np
import pytest

from s2geometry_spark.kernel.contains import Loop, parse_loop
from s2geometry_spark.kernel.looprel import (
    boundary_equals,
    compare_boundary,
    contains_nested,
    invert,
    loop_contains,
    loop_intersects,
)

CONTAINS, CONTAINED, DISJOINT, COVERS = 0x01, 0x02, 0x04, 0x08


def _loops():
    # s2loop_test.cc:135-280 (S2LoopTestBase member loops)
    L = {
        "empty": Loop(np.array([[0.0, 0.0, 1.0]])),
        "full": Loop(np.array([[0.0, 0.0, -1.0]])),
        "north_hemi": parse_loop("0:-180, 0:-90, 0:0, 0:90"),
        "north_hemi3": parse_loop("0:-180, 0:-60, 0:60"),
        "south_hemi": parse_loop("0:90, 0:0, 0:-90, 0:-180"),
        "west_hemi": parse_loop("0:-180, -90:0, 0:0, 90:0"),
        "east_hemi": parse_loop("90:0, 0:0, -90:0, 0:-180"),
        "near_hemi": parse_loop("0:-90, -90:0, 0:90, 90:0"),
        "far_hemi": parse_loop("90:0, 0:90, -90:0, 0:-90"),
        "candy_cane": parse_loop("-20:150, -20:-70, 0:70, 10:-150, 10:70, -10:-70"),
        "small_ne_cw": parse_loop("35:20, 45:20, 40:25"),
        "arctic_80": parse_loop("80:-150, 80:-30, 80:90"),
        "antarctic_80": parse_loop("-80:120, -80:0, -80:-120"),
        "loop_a": parse_loop("0:178, -1:180, 0:-179, 1:-180"),
        "loop_b": parse_loop("0:179, -1:180, 0:-178, 1:-180"),
        "a_intersect_b": parse_loop("0:179, -1:180, 0:-179, 1:-180"),
        "a_union_b": parse_loop("0:178, -1:180, 0:-178, 1:-180"),
        "a_minus_b": parse_loop("0:178, -1:180, 0:179, 1:-180"),
        "b_minus_a": parse_loop("0:-179, -1:180, 0:-178, 1:-180"),
        "loop_c": parse_loop("0:178, 0:180, -1:180, 0:-179, 1:-179, 1:-180"),
        "loop_d": parse_loop("0:178, -1:178, -1:180, 0:-179, 1:-179, 1:-180"),
        "loop_e": parse_loop("0:30, 0:34, 0:36, 0:39, 0:41, 0:44, 30:44, 30:30"),
        "loop_f": parse_loop("0:30, -30:30, -30:44, 0:44, 0:41, 0:39, 0:36, 0:34"),
        "loop_g": parse_loop(
            "0:30, 0:34, 10:34, 10:36, 0:36, 0:39, 10:39, 10:41, 0:41, 0:44, "
            "30:44, 30:30"
        ),
        "loop_h": parse_loop(
            "0:30, 0:34, -10:34, -10:36, 0:36, 0:39, 10:39, 10:41, 0:41, "
            "0:44, 30:44, 30:30"
        ),
        "loop_i": parse_loop("10:34, 0:34, -10:34, -10:36, 0:36, 10:36"),
    }
    return L


LOOPS = _loops()


# -------- identity helpers, 1:1 with s2loop_test.cc:671-750 --------
def one_nested(a, b):
    assert loop_contains(a, b)
    assert boundary_equals(a, b) == loop_contains(b, a)
    assert loop_intersects(a, b) == (not b.is_empty)
    assert loop_intersects(b, a) == (not b.is_empty)


def one_disjoint(a, b):
    assert not loop_intersects(a, b)
    assert not loop_intersects(b, a)
    assert loop_contains(a, b) == b.is_empty
    assert loop_contains(b, a) == a.is_empty


def one_covering(a, b):
    assert loop_contains(a, b) == a.is_full
    assert loop_contains(b, a) == b.is_full
    complementary = boundary_equals(invert(a), b)
    assert loop_intersects(a, b) == (not complementary)
    assert loop_intersects(b, a) == (not complementary)


def one_overlapping(a, b):
    assert not loop_contains(a, b)
    assert not loop_contains(b, a)
    assert loop_intersects(a, b)
    assert loop_intersects(b, a)


def nested_pair(a, b):
    a1, b1 = invert(a), invert(b)
    one_nested(a, b)
    one_nested(b1, a1)
    one_disjoint(a1, b)
    one_covering(a, b1)


def disjoint_pair(a, b):
    nested_pair(invert(a), b)


def covering_pair(a, b):
    nested_pair(a, invert(b))


def overlapping_pair(a, b):
    a1, b1 = invert(a), invert(b)
    one_overlapping(a, b)
    one_overlapping(a1, b1)
    one_overlapping(a1, b)
    one_overlapping(a, b1)


def check_relation(a, b, flags, shared_edge):
    if flags & CONTAINS:
        nested_pair(a, b)
    if flags & CONTAINED:
        nested_pair(b, a)
    if flags & COVERS:
        covering_pair(a, b)
    if flags & DISJOINT:
        disjoint_pair(a, b)
    elif not (flags & (CONTAINS | CONTAINED | COVERS)):
        overlapping_pair(a, b)
    if not shared_edge and (flags & (CONTAINS | CONTAINED | DISJOINT)):
        assert loop_contains(a, b) == contains_nested(a, b)
    comparison = 0
    if (flags & CONTAINS) or ((flags & COVERS) and not shared_edge):
        comparison = 1
    if (flags & DISJOINT) or ((flags & CONTAINED) and not shared_edge):
        comparison = -1
    if not a.is_empty and not b.is_empty:
        assert compare_boundary(a, b) == comparison


# (a, b, flags, shared_edge): s2loop_test.cc:805-895 LoopRelations
RELATIONS = [
    ("full", "full", CONTAINS | CONTAINED | COVERS, True),
    ("full", "north_hemi", CONTAINS | COVERS, False),
    ("full", "empty", CONTAINS | DISJOINT | COVERS, False),
    ("north_hemi", "full", CONTAINED | COVERS, False),
    ("north_hemi", "empty", CONTAINS | DISJOINT, False),
    ("empty", "full", CONTAINED | DISJOINT | COVERS, False),
    ("empty", "north_hemi", CONTAINED | DISJOINT, False),
    ("empty", "empty", CONTAINS | CONTAINED | DISJOINT, False),
    ("north_hemi", "north_hemi", CONTAINS | CONTAINED, True),
    ("north_hemi", "south_hemi", DISJOINT | COVERS, True),
    ("north_hemi", "east_hemi", 0, False),
    ("north_hemi", "arctic_80", CONTAINS, False),
    ("north_hemi", "antarctic_80", DISJOINT, False),
    ("north_hemi", "candy_cane", 0, False),
    ("north_hemi3", "north_hemi3", CONTAINS | CONTAINED, True),
    ("north_hemi3", "east_hemi", 0, False),
    ("north_hemi3", "arctic_80", CONTAINS, False),
    ("north_hemi3", "antarctic_80", DISJOINT, False),
    ("north_hemi3", "candy_cane", 0, False),
    ("south_hemi", "north_hemi", DISJOINT | COVERS, True),
    ("south_hemi", "south_hemi", CONTAINS | CONTAINED, True),
    ("south_hemi", "far_hemi", 0, False),
    ("south_hemi", "arctic_80", DISJOINT, False),
    ("south_hemi", "antarctic_80", CONTAINS, False),
    ("south_hemi", "candy_cane", 0, False),
    ("candy_cane", "north_hemi", 0, False),
    ("candy_cane", "south_hemi", 0, False),
    ("candy_cane", "arctic_80", DISJOINT, False),
    ("candy_cane", "antarctic_80", DISJOINT, False),
    ("candy_cane", "candy_cane", CONTAINS | CONTAINED, True),
    ("near_hemi", "west_hemi", 0, False),
    ("small_ne_cw", "south_hemi", CONTAINS, False),
    ("small_ne_cw", "west_hemi", CONTAINS, False),
    ("small_ne_cw", "north_hemi", COVERS, False),
    ("small_ne_cw", "east_hemi", COVERS, False),
    ("loop_a", "loop_a", CONTAINS | CONTAINED, True),
    ("loop_a", "loop_b", 0, False),
    ("loop_a", "a_intersect_b", CONTAINS, True),
    ("loop_a", "a_union_b", CONTAINED, True),
    ("loop_a", "a_minus_b", CONTAINS, True),
    ("loop_a", "b_minus_a", DISJOINT, True),
    ("loop_b", "loop_a", 0, False),
    ("loop_b", "loop_b", CONTAINS | CONTAINED, True),
    ("loop_b", "a_intersect_b", CONTAINS, True),
    ("loop_b", "a_union_b", CONTAINED, True),
    ("loop_b", "a_minus_b", DISJOINT, True),
    ("loop_b", "b_minus_a", CONTAINS, True),
    ("a_intersect_b", "loop_a", CONTAINED, True),
    ("a_intersect_b", "loop_b", CONTAINED, True),
    ("a_intersect_b", "a_intersect_b", CONTAINS | CONTAINED, True),
    ("a_intersect_b", "a_union_b", CONTAINED, False),
    ("a_intersect_b", "a_minus_b", DISJOINT, True),
    ("a_intersect_b", "b_minus_a", DISJOINT, True),
    ("a_union_b", "loop_a", CONTAINS, True),
    ("a_union_b", "loop_b", CONTAINS, True),
    ("a_union_b", "a_intersect_b", CONTAINS, False),
    ("a_union_b", "a_union_b", CONTAINS | CONTAINED, True),
    ("a_union_b", "a_minus_b", CONTAINS, True),
    ("a_union_b", "b_minus_a", CONTAINS, True),
    ("a_minus_b", "loop_a", CONTAINED, True),
    ("a_minus_b", "loop_b", DISJOINT, True),
    ("a_minus_b", "a_intersect_b", DISJOINT, True),
    ("a_minus_b", "a_union_b", CONTAINED, True),
    ("a_minus_b", "a_minus_b", CONTAINS | CONTAINED, True),
    ("a_minus_b", "b_minus_a", DISJOINT, False),
    ("b_minus_a", "loop_a", DISJOINT, True),
    ("b_minus_a", "loop_b", CONTAINED, True),
    ("b_minus_a", "a_intersect_b", DISJOINT, True),
    ("b_minus_a", "a_union_b", CONTAINED, True),
    ("b_minus_a", "a_minus_b", DISJOINT, False),
    ("b_minus_a", "b_minus_a", CONTAINS | CONTAINED, True),
]

# s2loop_test.cc:897-916 — loop crossings on two ends of a shared
# boundary segment.
RELATIONS_STICKING = [
    ("loop_a", "loop_c", 0, True),
    ("loop_c", "loop_a", 0, True),
    ("loop_a", "loop_d", CONTAINED, True),
    ("loop_d", "loop_a", CONTAINS, True),
    ("loop_e", "loop_f", DISJOINT, True),
    ("loop_e", "loop_g", CONTAINS, True),
    ("loop_e", "loop_h", 0, True),
    ("loop_e", "loop_i", 0, False),
    ("loop_f", "loop_g", DISJOINT, True),
    ("loop_f", "loop_h", 0, True),
    ("loop_f", "loop_i", 0, False),
    ("loop_g", "loop_h", CONTAINED, True),
    ("loop_h", "loop_g", CONTAINS, True),
    ("loop_g", "loop_i", DISJOINT, True),
    ("loop_h", "loop_i", CONTAINS, True),
]


@pytest.mark.parametrize(
    "an,bn,flags,shared", RELATIONS, ids=[f"{a}-vs-{b}" for a, b, _, _ in RELATIONS]
)
def test_loop_relations(an, bn, flags, shared):
    check_relation(LOOPS[an], LOOPS[bn], flags, shared)


@pytest.mark.parametrize(
    "an,bn,flags,shared",
    RELATIONS_STICKING,
    ids=[f"{a}-vs-{b}" for a, b, _, _ in RELATIONS_STICKING],
)
def test_loop_relations_pieces_sticking_out_and_in(an, bn, flags, shared):
    check_relation(LOOPS[an], LOOPS[bn], flags, shared)


def _make_cell_loop(begin, end):
    """MakeCellLoop (s2loop_test.cc:917-951): CCW loop whose boundary is
    the union of the cell ids in [begin, end) — add each cell's edges,
    cancelling any already present in the opposite direction, then
    follow the remaining single loop."""
    from s2geometry_spark.kernel.cell import Cell

    edges = {}
    cid = begin
    while cid != end:
        cell = Cell(cid)
        for k in range(4):
            a = tuple(cell.get_vertex(k))
            b = tuple(cell.get_vertex(k + 1))
            if a in edges.get(b, ()):
                edges[b].discard(a)
                if not edges[b]:
                    del edges[b]
            else:
                edges.setdefault(a, set()).add(b)
        cid = cid.next()
    if not edges:
        return None
    vertices = []
    p = next(iter(edges))
    while edges:
        if p not in edges or len(edges[p]) != 1:
            return None  # not a single loop
        nxt = next(iter(edges[p]))
        vertices.append(p)
        del edges[p]
        p = nxt
    return Loop(np.array(vertices))


def test_loop_relations2():
    """LoopRelations2 (s2loop_test.cc:952-982): loops built from ranges
    of adjacent same-level cell ids — containment/intersection must
    equal the range arithmetic.  Deterministic RNG stands in for the
    reference's seeded BitGen."""
    from s2geometry_spark.kernel.cid import CID, MAX_LEVEL

    rng = np.random.default_rng(20260817)
    checked = 0
    for _ in range(400):
        if checked >= 60:
            break
        begin = CID((int(rng.integers(0, 1 << 63)) * 2 + 1) | 1)
        if not begin.is_valid():
            continue
        begin = begin.parent(int(rng.integers(0, MAX_LEVEL)))

        def skewed():
            return int(rng.integers(0, 1 << int(rng.integers(0, 7))))

        def adv(c, n):
            return CID((c.id + n * (c.lsb() << 1)) & ((1 << 64) - 1))

        a_begin = adv(begin, skewed())
        a_end = adv(a_begin, skewed() + 1)
        b_begin = adv(begin, skewed())
        b_end = adv(b_begin, skewed() + 1)
        if not (a_end.is_valid() and b_end.is_valid()):
            continue
        if max((a_end.id - a_begin.id), (b_end.id - b_begin.id)) > 64 * (
            begin.lsb() << 1
        ):
            continue  # keep loops small enough for the scalar walk
        a = _make_cell_loop(a_begin, a_end)
        b = _make_cell_loop(b_begin, b_end)
        if a is None or b is None:
            continue
        contained = a_begin <= b_begin and b_end <= a_end
        intersects = a_begin < b_end and b_begin < a_end
        assert loop_contains(a, b) == contained, (a_begin, a_end, b_begin, b_end)
        assert loop_intersects(a, b) == intersects, (a_begin, a_end, b_begin, b_end)
        checked += 1
    assert checked >= 40


def test_point_contains():
    """s2loop_test.cc:540-594 (Contains): empty/full special vertices,
    hemisphere axis points under all vertex rotations, and the
    cell-partition property — every cell center/vertex is contained by
    EXACTLY ONE of the level's cell loops (SEMI_OPEN consistency)."""
    from s2geometry_spark.kernel.cell import Cell
    from s2geometry_spark.kernel.cid import CID

    def pt(loop, p):
        return bool(loop.contains(np.asarray(p, float)[None])[0])

    assert not pt(LOOPS["empty"], [0.0, 0.0, 1.0])
    assert pt(LOOPS["full"], [0.0, 0.0, -1.0])
    from s2geometry_spark.kernel.contains import parse_points

    assert pt(LOOPS["candy_cane"], parse_points("5:71")[0])

    for name, inside, outside in [
        ("north_hemi", [0, 0, 1], [0, 0, -1]),
        ("south_hemi", [0, 0, -1], [0, 0, 1]),
        ("west_hemi", [0, -1, 0], [0, 1, 0]),
        ("east_hemi", [0, 1, 0], [0, -1, 0]),
    ]:
        v = LOOPS[name].vertices
        for r in range(4):
            rot = Loop(np.roll(v, -r, axis=0))
            assert pt(rot, inside), (name, r)
            assert not pt(rot, outside), (name, r)

    for lvl in range(3):
        loops, points = [], {}
        cid = CID.from_face(0).child_begin(lvl)
        end = CID.from_face(5).child_end(lvl)
        while cid != end:
            cell = Cell(cid)
            verts = [cell.get_vertex(k) for k in range(4)]
            points[tuple(cell.get_center())] = 0
            for v in verts:
                points[tuple(v)] = 0
            loops.append(Loop(np.array(verts)))
            cid = cid.next()
        parr = np.array(list(points))
        counts = np.zeros(len(parr), dtype=int)
        for loop in loops:
            counts += loop.contains(parr).astype(int)
        assert (counts == 1).all(), (lvl, int((counts != 1).sum()))


def test_contains_matches_crossing_sign():
    """s2loop_test.cc:600-670: an S2Cell-based loop and the edge from a
    grandchild vertex a0 to Origin — CrossingSign per edge must be
    consistent with Contains (the historical too-tight-bound bug)."""
    from s2geometry_spark.kernel.cell import Cell
    from s2geometry_spark.kernel.cid import CID
    from s2geometry_spark.kernel import cellid as cids
    from s2geometry_spark.kernel import predicates as P
    from s2geometry_spark.kernel.predicates import ORIGIN

    cid = CID(
        int(cids.parent(cids.from_point(
            np.array([1.0]) / np.sqrt(3),
            np.array([1.0]) / np.sqrt(3),
            np.array([1.0]) / np.sqrt(3),
        ), 21)[0])
    )
    verts = []
    for k in range(4):
        child = Cell(cid.child(k))
        c = child.get_center()
        verts.append(c / np.linalg.norm(c))
    loop = Loop(np.array(verts))
    v0 = Cell(cid.child(0).child(2)).get_vertex(0)
    # the reference gets a probe 1 ulp from verts[0] for free because its
    # GetCenter().Normalize() and GetVertex() round differently; this
    # engine's tower computes both to the SAME double (and whether they
    # differ proved microarch-dependent), so construct the probe
    # explicitly one ulp inside vertex 0 — the same configuration
    centroid = np.array(verts).mean(axis=0)
    centroid /= np.linalg.norm(centroid)
    d = centroid - v0
    a0 = v0 + 1e-15 * (d / np.linalg.norm(d))
    a0 = a0 / np.linalg.norm(a0)
    assert not np.array_equal(a0, verts[0])

    origin = np.asarray(ORIGIN, float)
    expected = [-1, 1, -1, -1]
    for k in range(4):
        got = P.crossing_sign(a0, origin, verts[k], verts[(k + 1) % 4])
        assert got == expected[k], k
    assert not bool(loop.contains(origin[None])[0])
    assert bool(loop.contains(a0[None])[0])


def test_invert_roundtrip_and_boundary_equals():
    for name, loop in LOOPS.items():
        inv2 = invert(invert(loop))
        assert boundary_equals(inv2, loop), name
    assert invert(LOOPS["empty"]).is_full
    assert invert(LOOPS["full"]).is_empty
