"""Port of s2cell_iterator_join_test.cc over
kernel/cell_index.cell_iterator_join.  The b299938257 regression pins a
count for a specific absl-random fractal (not reproducible); its
end-of-iterator condition is exercised by the seek and property tests
here."""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel.cell import Cell, cell_cell_distance2
from s2geometry_spark.kernel.cell_index import cell_iterator_join
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.contains import Loop, Polygon
from s2geometry_spark.kernel.fractal import Fractal
from s2geometry_spark.kernel.region import ShapeRegion
from s2geometry_spark.kernel.shape_index_cells import build_index_cells

CENTRAL_PARK_A = [
    "89c2589", "89c258a1", "89c258a3", "89c258bc",
    "89c258c1", "89c258ec", "89c258f4",
]
CENTRAL_PARK_B = [
    "89c2589", "89c258a03", "89c258a1c", "89c258a3", "89c258bd",
    "89c258be1",
]


def tok(t: str) -> CID:
    return CID.from_token(t)


def chord2_deg(deg: float) -> float:
    s = 2 * math.sin(0.5 * math.radians(deg))
    return s * s


def test_exact_join_works():
    """ExactJoinWorks (test.cc:102-130): overlapping pairs in order."""
    rows = []

    def visit(a, b):
        rows.append((a, b))
        assert a.contains(b)
        return True

    assert cell_iterator_join(
        [tok(t) for t in CENTRAL_PARK_A],
        [tok(t) for t in CENTRAL_PARK_B],
        visit,
    )
    truth = [
        ("89c2589", "89c2589"),
        ("89c258a1", "89c258a03"),
        ("89c258a1", "89c258a1c"),
        ("89c258a3", "89c258a3"),
        ("89c258bc", "89c258bd"),
        ("89c258bc", "89c258be1"),
    ]
    assert len(rows) == len(truth)
    for (a, b), (ta, tb) in zip(rows, truth):
        assert a == tok(ta) and b == tok(tb)


def test_exact_false_join_returns_immediately():
    """test.cc:132-146."""
    rows = []
    cancelled = cell_iterator_join(
        [tok(t) for t in CENTRAL_PARK_A],
        [tok(t) for t in CENTRAL_PARK_B],
        lambda a, b: (rows.append((a, b)), False)[1],
    )
    assert not cancelled
    assert len(rows) == 1


def test_tolerant_false_join_returns_immediately():
    """test.cc:148-166."""
    rows = []
    cancelled = cell_iterator_join(
        [tok(t) for t in CENTRAL_PARK_A],
        [tok(t) for t in CENTRAL_PARK_B],
        lambda a, b: (rows.append((a, b)), False)[1],
        tolerance2=chord2_deg(0.001),
    )
    assert not cancelled
    assert len(rows) == 1


def test_exact_join_seeking_works():
    """test.cc:168-196: 2d5e3 overlaps nothing and is skipped."""
    map_a = ["2d5dd7", "2d5ddc", "2d5e3", "2d5e801", "2d5e803"]
    map_b = ["2d5d", "2d5e84"]
    truth = [
        ("2d5dd7", "2d5d"),
        ("2d5ddc", "2d5d"),
        ("2d5e801", "2d5e84"),
        ("2d5e803", "2d5e84"),
    ]
    rows = []
    cell_iterator_join(
        [tok(t) for t in map_a],
        [tok(t) for t in map_b],
        lambda a, b: (rows.append((a, b)), True)[1],
    )
    assert len(rows) == len(truth)
    for (a, b), (ta, tb) in zip(rows, truth):
        assert a == tok(ta) and b == tok(tb)


def test_near_join_works():
    """NearJoinWorks (test.cc:198-260): exact results plus the
    documented extra within-tolerance pairs."""
    tol2 = chord2_deg(1)
    rows = set()
    cell_iterator_join(
        [tok(t) for t in CENTRAL_PARK_A],
        [tok(t) for t in CENTRAL_PARK_B],
        lambda a, b: (rows.add((a.id, b.id)), True)[1],
        tolerance2=tol2,
    )
    truth = [
        ("89c2589", "89c2589"),
        ("89c258a1", "89c258a03"),
        ("89c258a1", "89c258a1c"),
        ("89c258a3", "89c258a3"),
        ("89c258bc", "89c258bd"),
        ("89c258bc", "89c258be1"),
    ]
    for ta, tb in truth:
        assert (tok(ta).id, tok(tb).id) in rows
        assert (
            cell_cell_distance2(Cell(tok(ta)), Cell(tok(tb))) <= tol2
        )
    tolerant_truth = [
        ("89c258a1", "89c258bd"),
        ("89c258a1", "89c258be1"),
        ("89c258a3", "89c258a03"),
        ("89c258a3", "89c258be1"),
        ("89c258bc", "89c258a03"),
        ("89c258bc", "89c258a1c"),
        ("89c258c1", "89c258a03"),
        ("89c258c1", "89c258a1c"),
        ("89c258c1", "89c258a3"),
        ("89c258c1", "89c258bd"),
        ("89c258c1", "89c258be1"),
        ("89c258ec", "89c258a03"),
        ("89c258ec", "89c258a1c"),
        ("89c258ec", "89c258a3"),
        ("89c258ec", "89c258bd"),
        ("89c258ec", "89c258be1"),
        ("89c258f4", "89c258a03"),
        ("89c258f4", "89c258a1c"),
        ("89c258f4", "89c258a3"),
        ("89c258f4", "89c258bd"),
        ("89c258f4", "89c258be1"),
    ]
    for ta, tb in tolerant_truth:
        assert (tok(ta).id, tok(tb).id) in rows, (ta, tb)


def _fractal_index_cells(seed: int, lng: float, max_edges: int) -> list[CID]:
    rng = np.random.default_rng(seed)
    fractal = Fractal(rng)
    fractal.set_level_for_approx_max_edges(max_edges)
    z = np.array(
        [math.cos(math.radians(lng)), math.sin(math.radians(lng)), 0.0]
    )
    x = np.cross(z, [0.0, 0.0, 1.0])
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    frame = np.column_stack([x, y, z])
    loop = fractal.make_loop(frame, math.radians(10))
    region = ShapeRegion(
        polygon=Polygon([Loop(np.asarray(loop.vertices, float))])
    )
    return build_index_cells([region])


def test_tolerant_join_is_left_driven():
    """test.cc:263-292: all pairs for one A cell are contiguous."""
    cells = _fractal_index_cells(20260818, -45.0, 100)
    assert len(cells) > 1
    seen = set()
    state = {"curr": None}

    def visit(a, b):
        if a.id != state["curr"]:
            assert a.id not in seen
            state["curr"] = a.id
            seen.add(a.id)
        return True

    assert cell_iterator_join(cells, cells, visit, chord2_deg(2))


def test_all_pairs_seen():
    """test.cc:296-338: the tolerant join returns exactly the brute-force
    within-tolerance pair set."""
    cells = _fractal_index_cells(7, -45.0, 400)
    tol2 = chord2_deg(2)
    cobjs = [Cell(c) for c in cells]
    brute = set()
    for c0, o0 in zip(cells, cobjs):
        for c1, o1 in zip(cells, cobjs):
            if cell_cell_distance2(o0, o1) < tol2:
                brute.add((c0.id, c1.id))
    join_pairs = set()
    cell_iterator_join(
        cells, cells,
        lambda a, b: (join_pairs.add((a.id, b.id)), True)[1],
        tol2,
    )
    assert join_pairs == brute


def test_b299938257_regression():
    """s2cell_iterator_join_test.cc:340-372: the join must check for
    iterator end before dereferencing — a fractal polygon index joined
    with 4 points straddling face boundaries at 0.5 degrees."""
    import math

    from s2geometry_spark.kernel import cellid as K
    from s2geometry_spark.kernel.fractal import Fractal
    from s2geometry_spark.kernel.mutable_index import MutableIndex
    from s2geometry_spark.kernel.polyline import _get_frame
    from s2geometry_spark.kernel.shapeutil import LaxPolygon

    pts = np.array([
        [0.998782953991165789, -0.034851647907011431, -0.034899476426537568],
        [1.000000000000000000, -0.000000000000005489, -0.000000000000005494],
        [0.998782953991165789, -0.034851647907011431, 0.034899476426537568],
        [1.000000000000000000, -0.000000000000005489, 0.000000000000005494],
    ])
    point_cells = [
        CID(int(K.from_point(np.array([p[0]]), np.array([p[1]]),
                             np.array([p[2]]))[0]))
        for p in pts
    ]
    rng = np.random.RandomState(20260819)
    fractal = Fractal(rng)
    fractal.set_level_for_approx_max_edges(100)
    frame = _get_frame(np.array([1.0, 0.0, 0.0]))
    loop = fractal.make_loop(frame, math.radians(1.0))
    index = MutableIndex()
    index.add(LaxPolygon([loop.vertices]))
    index_cells = [cid for cid, _ in index.cells()]
    tol = 2 * math.sin(0.5 * math.radians(0.5))
    count = 0

    def visit(_a, _b):
        nonlocal count
        count += 1
        return True

    ok = cell_iterator_join(index_cells, point_cells, visit, tol * tol)
    assert ok
    assert count > 0
