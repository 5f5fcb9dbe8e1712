"""S2ClosestEdgeQuery semantics over shape lists (driver + batch kernel).

Shapes follow the reference's S2Shape model (s2shape.h): dimension 0/1/2,
edges grouped per shape; polygons add interior semantics — a target
inside a polygon reports (shape_id, edge_id=-1, distance 0) when
include_interiors is set (s2closest_edge_query.h:108-130).

The fixture scale uses brute force over edges, exactly like the
reference below its cutovers (120/60/30/25 edges,
s2closest_edge_query.cc:35-62); the batch path vectorizes all
(target × edge) distances as one einsum per shape.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .contains import Loop, Polygon, parse_points
from .distance import point_edge_dist2


@dataclass
class Shape:
    shape_id: int
    dim: int
    edges_c: np.ndarray  # (E,3)
    edges_d: np.ndarray  # (E,3)
    polygon: Polygon | None = None


def parse_index(s: str) -> list[Shape]:
    """MakeIndex text DSL: "points # polylines # polygons", shapes within
    a section separated by '|' (s2text_format.h:63-92).  Shape ids are
    assigned in order of appearance, like MutableS2ShapeIndex::Add."""
    sections = s.split("#")
    while len(sections) < 3:
        sections.append("")
    shapes: list[Shape] = []
    sid = 0
    pts_str = sections[0].strip()
    if pts_str:
        # the reference DSL separates points with '|' (s2text_format.h);
        # they still form ONE S2PointVectorShape
        pts = parse_points(pts_str.replace("|", ","))
        # a multipoint is ONE shape of dimension 0 with degenerate edges
        shapes.append(Shape(sid, 0, pts, pts))
        sid += 1
    for line in sections[1].split("|"):
        line = line.strip()
        if not line:
            continue
        v = parse_points(line)
        shapes.append(Shape(sid, 1, v[:-1], v[1:]))
        sid += 1
    for poly_str in sections[2].split("|"):
        poly_str = poly_str.strip()
        if not poly_str:
            continue
        if poly_str == "empty":
            loops = []
        else:
            from .contains import parse_loop

            loops = [parse_loop(l) for l in poly_str.split(";") if l.strip()]
        poly = Polygon(loops)
        cs, ds = [], []
        for loop in poly.loops:
            v = loop.vertices
            if not loop.is_empty_or_full and len(v) >= 3:
                cs.append(v)
                ds.append(np.roll(v, -1, axis=0))
        c = np.concatenate(cs) if cs else np.zeros((0, 3))
        d = np.concatenate(ds) if ds else np.zeros((0, 3))
        shapes.append(Shape(sid, 2, c, d, polygon=poly))
        sid += 1
    return shapes


def find_closest_edges(
    shapes: list[Shape],
    targets: np.ndarray,
    k: int = 1,
    max_distance_rad: float | None = None,
    include_interiors: bool = False,
) -> list[list[tuple[int, int, float]]]:
    """Per target: up to k (shape_id, edge_id, dist2) sorted by distance.

    max_distance is an *exclusive* upper bound on distance like the
    reference's max_distance option (converted via < comparison on the
    squared chord).
    """
    targets = np.asarray(targets, dtype=np.float64).reshape(-1, 3)
    n = len(targets)
    limit2 = None
    if max_distance_rad is not None:
        import math

        s = 2 * math.sin(0.5 * min(math.pi, max_distance_rad))
        limit2 = s * s
    cand: list[list[tuple[float, int, int]]] = [[] for _ in range(n)]
    for shape in shapes:
        if include_interiors and shape.polygon is not None:
            inside = shape.polygon.contains(targets)
            for i in np.nonzero(inside)[0]:
                cand[i].append((0.0, shape.shape_id, -1))
        if len(shape.edges_c):
            d2 = point_edge_dist2(targets, shape.edges_c, shape.edges_d)
            for i in range(n):
                row = d2[i]
                sel = (
                    np.nonzero(row < limit2)[0]
                    if limit2 is not None
                    else np.arange(len(row))
                )
                for e in sel:
                    # a target inside the polygon already has the interior
                    # result; edge results still apply if within limit
                    cand[i].append((float(row[e]), shape.shape_id, int(e)))
    out = []
    for i in range(n):
        best = sorted(cand[i])[:k]
        # de-dup: an interior hit (dist 0) subsumes coincident edge hits
        out.append([(sid, eid, d) for d, sid, eid in best])
    return out


def closest_to_shape_targets(
    points: np.ndarray,
    target_shapes: list[Shape],
    max_distance_rad: float | None = None,
    include_interiors: bool = True,
) -> list[tuple[int, float]]:
    """S2ClosestEdgeQuery with a ShapeIndexTarget over indexed points
    (s2closest_edge_query_test.cc TargetPolygonContainingIndexedPoints):
    for each point, the min squared-chord distance to the target geometry
    (0 when inside a target polygon and include_interiors) — (point_idx,
    dist2) for points within max_distance."""
    import math

    points = np.asarray(points, dtype=np.float64).reshape(-1, 3)
    best = np.full(len(points), 4.0)
    for shape in target_shapes:
        if include_interiors and shape.polygon is not None:
            inside = shape.polygon.contains(points)
            best = np.where(inside, 0.0, best)
        if len(shape.edges_c):
            d2 = point_edge_dist2(points, shape.edges_c, shape.edges_d).min(axis=1)
            best = np.minimum(best, d2)
    limit2 = None
    if max_distance_rad is not None:
        s = 2 * math.sin(0.5 * min(math.pi, max_distance_rad))
        limit2 = s * s
    out = []
    for i, d in enumerate(best):
        if limit2 is None or d < limit2:
            out.append((i, float(d)))
    return out


def find_furthest_edges(
    shapes: list[Shape],
    targets: np.ndarray,
    k: int = 1,
    include_interiors: bool = False,
    min_distance_rad: float | None = None,
) -> list[list[tuple[int, int, float]]]:
    """S2FurthestEdgeQuery analog.

    Uses the antipode-reflection identity of UpdateMaxDistance
    (s2edge_distances.cc:236-249): the maximum angle from x to any point
    of edge AB equals π minus the minimum angle from -x, so in squared
    chord form max_d2 = 4 − min_d2(−x, AB).  On unit vectors
    |x−v|² + |−x−v|² = 4 exactly, so the vertex-maximum case is covered
    by the same identity, and an edge whose interior passes near the
    target's antipode (angle > 90°) reports the true interior maximum
    the old vertex-only formula missed.

    include_interiors (s2furthest_edge_query.h Options): a polygon whose
    interior contains the target's ANTIPODE reports
    (shape_id, edge_id=-1, Straight = 4.0).  min_distance_rad keeps only
    results with distance strictly greater (set_min_distance)."""
    import math

    targets = np.asarray(targets, dtype=np.float64).reshape(-1, 3)
    cand: list[list[tuple[float, int, int]]] = [[] for _ in range(len(targets))]
    for shape in shapes:
        if include_interiors and shape.dim == 2 and shape.polygon is not None:
            inside = shape.polygon.contains(-targets)
            for i in range(len(targets)):
                if inside[i]:
                    cand[i].append((4.0, shape.shape_id, -1))
        if len(shape.edges_c):
            d2 = 4.0 - point_edge_dist2(-targets, shape.edges_c, shape.edges_d)
            for i in range(len(targets)):
                for e in range(d2.shape[1]):
                    cand[i].append((float(d2[i, e]), shape.shape_id, e))
    if min_distance_rad is not None:
        s = 2 * math.sin(0.5 * min(math.pi, min_distance_rad))
        min_d2 = s * s
        cand = [[t for t in c if t[0] > min_d2] for c in cand]
    return [
        [(sid, eid, d) for d, sid, eid in sorted(c, reverse=True)[:k]]
        for c in cand
    ]


def shape_index_target_distance2(
    index_shapes: list[Shape],
    target_shapes: list[Shape],
    include_interiors: bool = True,
) -> float:
    """S2ClosestEdgeQuery::GetDistance with a ShapeIndexTarget
    (s2closest_edge_query.h ShapeIndexTarget; s2min_distance_targets.cc
    S2MinDistanceShapeIndexTarget): the minimum squared-chord distance
    between the index geometry and the target geometry.  Returns 0.0
    when interiors intersect (include_interiors on both sides, like the
    reference's target.set_include_interiors(true) + query option) and
    math.inf when either side has no geometry — the reference's
    S1ChordAngle::Infinity() (s2closest_edge_query_test.cc:551-573
    FullS2PolygonTarget exercises the full-polygon special case, whose
    "full" has interior but no edges)."""
    import math

    from .predicates import crossing_sign

    def _verts(shapes: list[Shape]) -> np.ndarray:
        vs = [s.edges_c for s in shapes if len(s.edges_c)]
        vs += [s.edges_d for s in shapes if len(s.edges_d)]
        return np.concatenate(vs) if vs else np.zeros((0, 3))

    def _nonempty(shapes: list[Shape]) -> bool:
        return any(
            len(s.edges_c)
            or (s.polygon is not None and not s.polygon.is_empty)
            for s in shapes
        )

    if not _nonempty(index_shapes) or not _nonempty(target_shapes):
        return math.inf

    best = math.inf
    iv, tv = _verts(index_shapes), _verts(target_shapes)
    # vertex-of-one to edge-of-other: the min distance between two
    # non-crossing geodesic edges is attained at one of the four
    # vertices (s2edge_distances.cc UpdateEdgePairMinDistance)
    for s in index_shapes:
        if len(s.edges_c) and len(tv):
            best = min(best, float(point_edge_dist2(tv, s.edges_c, s.edges_d).min()))
    for t in target_shapes:
        if len(t.edges_c) and len(iv):
            best = min(best, float(point_edge_dist2(iv, t.edges_c, t.edges_d).min()))
    if best > 0.0:
        # crossing edges → distance 0
        for s in index_shapes:
            for t in target_shapes:
                if not (len(s.edges_c) and len(t.edges_c)):
                    continue
                for e in range(len(s.edges_c)):
                    for f in range(len(t.edges_c)):
                        if crossing_sign(
                            s.edges_c[e], s.edges_d[e], t.edges_c[f], t.edges_d[f]
                        ) > 0:
                            return 0.0
    if include_interiors and best > 0.0:
        # interior-containment: any vertex of one side inside a polygon
        # of the other, plus the vertex-free full-polygon case
        for s in index_shapes:
            if s.polygon is None or s.polygon.is_empty:
                continue
            if s.polygon.is_full:
                return 0.0
            if len(tv) and bool(s.polygon.contains(tv).any()):
                return 0.0
        for t in target_shapes:
            if t.polygon is None or t.polygon.is_empty:
                continue
            if t.polygon.is_full:
                return 0.0
            if len(iv) and bool(t.polygon.contains(iv).any()):
                return 0.0
    return best


def shape_index_target_max_distance2(
    index_shapes: list[Shape],
    target_shapes: list[Shape],
    include_interiors: bool = True,
) -> float:
    """S2FurthestEdgeQuery::GetDistance with a ShapeIndexTarget
    (s2furthest_edge_query.h; s2max_distance_targets.cc): the MAXIMUM
    squared-chord distance between index and target geometry, via the
    antipode-reflection identity max_d2(x, e) = 4 − min_d2(−x, e)
    (s2edge_distances.cc:236-249).  Returns -1.0 — S1ChordAngle::
    Negative() — when either side has no geometry
    (s2furthest_edge_query_test.cc EmptyPolygonTarget), and 4.0
    (Straight) when a polygon interior contains the other side's
    antipode (incl. the vertex-free full-polygon cases,
    FullLaxPolygonTarget / FullS2PolygonTarget)."""
    import math

    def _verts(shapes: list[Shape]) -> np.ndarray:
        vs = [s.edges_c for s in shapes if len(s.edges_c)]
        vs += [s.edges_d for s in shapes if len(s.edges_d)]
        return np.concatenate(vs) if vs else np.zeros((0, 3))

    def _nonempty(shapes: list[Shape]) -> bool:
        return any(
            len(s.edges_c)
            or (s.polygon is not None and not s.polygon.is_empty)
            for s in shapes
        )

    if not _nonempty(index_shapes) or not _nonempty(target_shapes):
        return -1.0

    iv, tv = _verts(index_shapes), _verts(target_shapes)
    best = -1.0
    min_opposed = math.inf
    for s in index_shapes:
        if len(s.edges_c) and len(tv):
            min_opposed = min(
                min_opposed, float(point_edge_dist2(-tv, s.edges_c, s.edges_d).min())
            )
    for t in target_shapes:
        if len(t.edges_c) and len(iv):
            min_opposed = min(
                min_opposed, float(point_edge_dist2(-iv, t.edges_c, t.edges_d).min())
            )
    if min_opposed < math.inf:
        best = 4.0 - min_opposed
    if include_interiors:
        for s in index_shapes:
            if s.polygon is None or s.polygon.is_empty:
                continue
            if s.polygon.is_full:
                return 4.0
            if len(tv) and bool(s.polygon.contains(-tv).any()):
                return 4.0
        for t in target_shapes:
            if t.polygon is None or t.polygon.is_empty:
                continue
            if t.polygon.is_full:
                return 4.0
            if len(iv) and bool(t.polygon.contains(-iv).any()):
                return 4.0
    return best


def furthest_edges_to_shape_target(
    index_shapes: list[Shape],
    target_shapes: list[Shape],
    include_target_interiors: bool = True,
    min_distance_rad: float | None = None,
) -> list[tuple[int, int, float]]:
    """S2FurthestEdgeQuery::FindFurthestEdges with a ShapeIndexTarget:
    one result per INDEX edge — (shape_id, edge_id, max_d2) — ordered by
    decreasing distance with ties broken by increasing (shape_id,
    edge_id) like the reference's S2MaxDistance result ordering
    (s2furthest_edge_query_test.cc TargetPolygonContainingIndexedPoints /
    AntipodalPolygonContainingIndexedPoints).  min_distance is an
    exclusive lower bound (set_min_distance)."""
    import math

    results: list[tuple[float, int, int]] = []
    for s in index_shapes:
        for e in range(len(s.edges_c)):
            refl = Shape(0, 1, -s.edges_c[e][None], -s.edges_d[e][None])
            d2min = shape_index_target_distance2(
                [refl], target_shapes, include_interiors=include_target_interiors
            )
            if d2min == math.inf:
                continue
            results.append((4.0 - d2min, s.shape_id, int(e)))
    if min_distance_rad is not None:
        w = 2 * math.sin(0.5 * min(math.pi, min_distance_rad))
        results = [r for r in results if r[0] > w * w]
    results.sort(key=lambda r: (-r[0], r[1], r[2]))
    return [(sid, eid, d2) for d2, sid, eid in results]


def get_crossing_edges(
    shapes: list[Shape], a0: np.ndarray, a1: np.ndarray, interior_only: bool = False
) -> list[tuple[int, int]]:
    """S2CrossingEdgeQuery::GetCrossingEdges (s2crossing_edge_query.h:47-92):
    all indexed edges that cross the query edge (a0, a1).
    CrossingType::ALL includes shared-vertex crossings (sign >= 0);
    INTERIOR keeps proper crossings only (sign > 0).  Vectorized
    crossing_sign per shape — the distributed analog prunes candidates
    with the covering cell join first (operators/spatial_join.py)."""
    from .predicates import crossing_sign

    a0 = np.asarray(a0, float).reshape(3)
    a1 = np.asarray(a1, float).reshape(3)
    out: list[tuple[int, int]] = []
    for shape in shapes:
        for e in range(len(shape.edges_c)):
            s = crossing_sign(a0, a1, shape.edges_c[e], shape.edges_d[e])
            if s > 0 or (s == 0 and not interior_only):
                out.append((shape.shape_id, int(e)))
    return out


def visit_closest_edges(
    shapes: list[Shape],
    target: np.ndarray,
    visitor,
    max_distance_rad: float | None = None,
    max_results: int | None = None,
    include_interiors: bool = True,
    shape_filter=None,
):
    """S2ClosestEdgeQuery::VisitClosestEdges (s2closest_edge_query.h):
    streams (shape_id, edge_id, dist2) results to `visitor` in
    nondecreasing distance order until the visitor returns False or the
    supply is exhausted.  Interior hits are reported as edge_id -1 with
    distance Zero.  `shape_filter(shape_id)` is consulted lazily as each
    result is about to be visited, so a filter that updates during the
    visit (e.g. one-result-per-shape) behaves like the reference's
    ShapeFilter.  Returns the number of results visited."""
    import math

    target = np.asarray(target, float).reshape(1, 3)
    cand: list[tuple[float, int, int]] = []
    for shape in shapes:
        if (
            include_interiors
            and shape.polygon is not None
            and bool(shape.polygon.contains(target)[0])
        ):
            cand.append((0.0, shape.shape_id, -1))
        if len(shape.edges_c):
            d2 = point_edge_dist2(target, shape.edges_c, shape.edges_d)[0]
            for e in range(len(d2)):
                cand.append((float(d2[e]), shape.shape_id, int(e)))
    cand.sort()
    limit2 = None
    if max_distance_rad is not None:
        s = 2 * math.sin(0.5 * min(math.pi, max_distance_rad))
        limit2 = s * s
    count = 0
    for d2, sid, eid in cand:
        if limit2 is not None and not (d2 < limit2):
            break
        if max_results is not None and count >= max_results:
            break
        if shape_filter is not None and not shape_filter(sid):
            continue
        count += 1
        if not visitor(sid, eid, d2):
            break
    return count


def visit_closest_shapes(
    shapes: list[Shape],
    target: np.ndarray,
    visitor,
    **kw,
):
    """S2ClosestEdgeQuery::VisitClosestShapes: the closest result of
    each shape, in nondecreasing distance order (implemented with an
    updating shape filter exactly like the reference)."""
    seen: set[int] = set()

    def filt(sid: int) -> bool:
        return sid not in seen

    def wrap(sid, eid, d2):
        seen.add(sid)
        return visitor(sid, eid, d2)

    user_filter = kw.pop("shape_filter", None)
    if user_filter is not None:
        inner = filt

        def filt2(sid):
            return inner(sid) and user_filter(sid)

        return visit_closest_edges(
            shapes, target, wrap, shape_filter=filt2, **kw
        )
    return visit_closest_edges(
        shapes, target, wrap, shape_filter=filt, **kw
    )
