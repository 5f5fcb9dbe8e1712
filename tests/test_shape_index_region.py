"""Port of s2shape_index_region_test.cc over
kernel/shape_index_cells.IndexRegion."""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel import cellid as CI
from s2geometry_spark.kernel.cell import Cell, _face_uv_to_xyz
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.clipping import (
    FACE_CLIP_ERROR_UV_COORD,
    INTERSECTS_RECT_ERROR_UV_DIST,
)
from s2geometry_spark.kernel.contains import Loop, Polygon
from s2geometry_spark.kernel.fractal import Fractal, make_regular_points
from s2geometry_spark.kernel.region import ShapeRegion
from s2geometry_spark.kernel.shape_index_cells import IndexRegion

# Pad by at least twice the maximum error for reliable results.
PADDING = 2 * (FACE_CLIP_ERROR_UV_COORD + INTERSECTS_RECT_ERROR_UV_DIST)


def make_cell_id(s: str) -> CID:
    return CID(int(np.asarray(CI.from_debug_string(s)).reshape(-1)[0]))


def new_padded_cell_region(cid: CID, padding_uv: float) -> ShapeRegion:
    """NewPaddedCell (test.cc:72-81): the cell boundary expanded (or
    shrunk) by padding_uv in UV space, as a 4-vertex loop."""
    ids = np.array([np.uint64(cid.id)])
    from s2geometry_spark.kernel.hilbert import to_face_ij_orientation

    f, i, j, _ = to_face_ij_orientation(ids)
    face, i, j = int(f[0]), int(i[0]), int(j[0])
    u0, u1, v0, v1 = (float(x[0]) for x in CI.get_bound_uv(ids))
    u0 -= padding_uv
    v0 -= padding_uv
    u1 += padding_uv
    v1 += padding_uv
    corners = [(u0, v0), (u1, v0), (u1, v1), (u0, v1)]
    vertices = []
    for u, v in corners:
        p = _face_uv_to_xyz(face, u, v)
        vertices.append(p / np.linalg.norm(p))
    return ShapeRegion(polygon=Polygon([Loop(np.asarray(vertices))]))


TEST_ID = "3/0123012301230123012301230123"


def test_get_cap_bound():
    """test.cc:83-96."""
    cid = make_cell_id(TEST_ID)
    region = IndexRegion([new_padded_cell_region(cid, -PADDING)])
    from s2geometry_spark.kernel.region import cell_cap_bound
    cell_bound = cell_cap_bound(Cell(cid))
    index_bound = region.get_cap_bound()
    assert index_bound.contains_cap(cell_bound)
    assert index_bound.radius_radians() <= 1.00001 * max(
        cell_bound.radius_radians(), 1e-300
    )


def test_get_rect_bound():
    """test.cc:98-107: exact equality with the cell's rect bound."""
    cid = make_cell_id(TEST_ID)
    region = IndexRegion([new_padded_cell_region(cid, -PADDING)])
    cell_bound = Cell(cid).get_rect_bound()
    index_bound = region.get_rect_bound()
    assert index_bound.lat.lo == cell_bound.lat.lo
    assert index_bound.lat.hi == cell_bound.lat.hi
    assert index_bound.lng.lo == cell_bound.lng.lo
    assert index_bound.lng.hi == cell_bound.lng.hi


def test_get_cell_union_bound_multiple_faces():
    """test.cc:109-117."""
    ids = [make_cell_id("3/00123"), make_cell_id("2/11200013")]
    region = IndexRegion(
        [new_padded_cell_region(cid, -PADDING) for cid in ids]
    )
    covering = region.get_cell_union_bound()
    assert sorted(c.id for c in ids) == [c.id for c in covering]


def test_get_cell_union_bound_one_face():
    """test.cc:119-142: per level-1 child, the smallest covering cell
    of the index cells within it."""
    input_ids = [
        make_cell_id("5/010"),
        make_cell_id("5/0211030"),
        make_cell_id("5/110230123"),
        make_cell_id("5/11023021133"),
        make_cell_id("5/311020003003030303"),
        make_cell_id("5/311020023"),
    ]
    expected = [
        make_cell_id("5/0"),
        make_cell_id("5/110230"),
        make_cell_id("5/3110200"),
    ]
    regions = []
    for cid in input_ids:
        # add each shape 3 times to force the index to subdivide
        for _copy in range(3):
            regions.append(new_padded_cell_region(cid, -PADDING))
    covering = IndexRegion(regions).get_cell_union_bound()
    assert [c.id for c in expected] == [c.id for c in covering]


def test_contains_cell_multiple_shapes():
    """test.cc:144-162."""
    cid = make_cell_id(TEST_ID)
    smaller = new_padded_cell_region(cid, -PADDING)
    assert not IndexRegion([smaller]).contains_cell(Cell(cid))

    larger = new_padded_cell_region(cid, PADDING)
    region = IndexRegion([smaller, larger])
    assert region.contains_cell(Cell(cid))
    child = cid.child_begin()
    for _ in range(4):
        assert region.contains_cell(Cell(child))
        child = child.next()


def test_intersects_shrunken_cell():
    """test.cc:164-180."""
    target = make_cell_id(TEST_ID)
    region = IndexRegion([new_padded_cell_region(target, -PADDING)])
    assert region.may_intersect_cell(Cell(target))
    nbrs = CI.all_neighbors(
        np.array([np.uint64(target.id)]), target.level()
    )[0]
    for nid in nbrs:
        assert not region.may_intersect_cell(Cell(CID(int(nid))))


def test_intersects_exact_cell():
    """test.cc:182-196."""
    target = make_cell_id(TEST_ID)
    region = IndexRegion([new_padded_cell_region(target, 0.0)])
    assert region.may_intersect_cell(Cell(target))
    nbrs = CI.all_neighbors(
        np.array([np.uint64(target.id)]), target.level()
    )[0]
    for nid in nbrs:
        assert region.may_intersect_cell(Cell(CID(int(nid))))


# ------------------------------------------- VisitIntersectingShapes


def run_visit_consistency(regions: list[ShapeRegion], rng, max_cells=400):
    """VisitIntersectingShapesTest (test.cc:202-269): visit results are
    consistent with per-shape MayIntersect/Contains; walk from the face
    cells, descending into cells that intersect any shape."""
    index = IndexRegion(regions)
    tested = 0

    def test_cell(cell: Cell) -> None:
        nonlocal tested
        if tested >= max_cells:
            return
        tested += 1
        seen: dict[int, bool] = {}
        assert index.visit_intersecting_shape_ids(
            cell, lambda sid, cont: (seen.__setitem__(sid, cont), True)[1]
        )
        for sid, r in enumerate(regions):
            if not r.may_intersect_cell(cell):
                assert sid not in seen
            else:
                assert seen[sid] == r.contains_cell(cell)
        # descend while any shape intersects and the cell is coarse
        cid = cell.id
        if cid.level() >= 8 or not seen:
            return
        if cid.level() >= 4 and rng.random() < 1 / 3:
            return
        for k in range(4):
            test_cell(Cell(cid.child(k)))

    for face in range(6):
        test_cell(Cell(CID.from_face(face)))
    assert tested > 6


def test_visit_intersecting_shapes_points():
    """test.cc:271-281 (reduced point count)."""
    rng = np.random.default_rng(20260818)
    pts = rng.standard_normal((40, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    run_visit_consistency([ShapeRegion(points=pts)], rng)


def test_visit_intersecting_shapes_polylines():
    """test.cc:283-301 (reduced to 12 polylines)."""
    rng = np.random.default_rng(7)
    regions = []
    for _ in range(12):
        center = np.array([1.0, 0, 0]) + 0.5 * rng.standard_normal(3)
        center /= np.linalg.norm(center)
        if rng.random() < 0.1:
            vertices = np.array([center, center])
        else:
            vertices = np.asarray(
                make_regular_points(
                    center, rng.uniform(0, 1), int(rng.integers(3, 23))
                )
            )
        regions.append(ShapeRegion(polylines=[vertices]))
    run_visit_consistency(regions, rng)


def test_visit_intersecting_shapes_polygons():
    """test.cc:303-320 (reduced to 4 fractals + the face-0 quad)."""
    rng = np.random.default_rng(13)
    regions = []
    for _ in range(4):
        fractal = Fractal(rng)
        fractal.set_level_for_approx_max_edges(48)
        center = np.array([1.0, 0, 0]) + 0.5 * rng.standard_normal(3)
        center /= np.linalg.norm(center)
        x = np.cross(center, [0.0, 0, 1])
        x /= np.linalg.norm(x)
        y = np.cross(center, x)
        frame = np.column_stack([x, y, center])
        loop = fractal.make_loop(frame, rng.uniform(0.05, 1.0))
        regions.append(
            ShapeRegion(polygon=Polygon([Loop(np.asarray(loop.vertices))]))
        )
    regions.append(new_padded_cell_region(CID.from_face(0), 0.0))
    run_visit_consistency(regions, rng)
