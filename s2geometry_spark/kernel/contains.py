"""Point-in-loop / point-in-polygon via crossing parity, vectorized.

Port of the reference's containment semantics:
  - loop containment = parity of crossings of the segment Origin→P with
    the loop's edges, seeded by origin_inside
    (S2Loop::BruteForceContains, s2loop.cc:605-617);
  - origin_inside initialisation exactly as S2Loop::InitOriginAndBound
    (s2loop.cc:271-303) via AngleContainsVertex;
  - polygon containment = XOR (parity) of loop containments over nested
    loops (S2Polygon::Contains, s2polygon.cc:704-729);
  - vertex model SEMI_OPEN is what crossing parity from a fixed origin
    yields inherently (s2contains_point_query.h:37-54).

The batch kernel evaluates all (point × edge) orientation determinants as
one einsum; only pairs with uncertain triage or shared vertices fall back
to the robust scalar path (predicates.exact_sign).
"""

from __future__ import annotations

import numpy as np

from . import predicates as P
from .coords import latlng_to_xyz

__all__ = ["Loop", "Polygon", "parse_loop", "parse_polygon", "contains_points"]


def _close_ring(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """edges (C, D) of the closed ring over vertex rows."""
    return v, np.roll(v, -1, axis=0)


class Loop:
    """Closed vertex ring on the sphere; vertices (n,3) unit float64."""

    def __init__(self, vertices: np.ndarray):
        self.vertices = np.asarray(vertices, dtype=np.float64).reshape(-1, 3)
        n = len(self.vertices)
        if n == 1:
            # empty loop = single vertex with z ≥ 0; full = z < 0
            self.is_empty_or_full = True
            self.origin_inside = bool(self.vertices[0, 2] < 0)
        elif n < 3:
            self.is_empty_or_full = False
            self.origin_inside = False
        else:
            self.is_empty_or_full = False
            v0, v1, v2 = self.vertices[0], self.vertices[1], self.vertices[2]
            keys = {tuple(v) for v in self.vertices}
            if len(keys) < n:
                # Lax ring with repeated vertices (e.g. the degenerate
                # meridian sliver of s2boolean_operation_test.cc
                # MeridianSplitting): the single-wedge v1 probe below
                # assumes v1 occurs once, so derive the origin state via
                # the sibling-pair-aware GetReferencePoint walk instead
                # (s2shapeutil_get_reference_point.cc:34-81).
                from .shapeutil import LaxPolygon, contains_brute_force

                self.origin_inside = contains_brute_force(
                    LaxPolygon([self.vertices]), P.ORIGIN
                )
                return
            v1_inside = (
                tuple(v0) != tuple(v1)
                and tuple(v2) != tuple(v1)
                and P.angle_contains_vertex(v0, v1, v2)
            )
            self.origin_inside = False
            got = bool(self.contains(v1[None])[0])
            if v1_inside != got:
                self.origin_inside = True

    @property
    def is_empty(self) -> bool:
        return self.is_empty_or_full and not self.origin_inside

    @property
    def is_full(self) -> bool:
        return self.is_empty_or_full and self.origin_inside

    def contains(self, points: np.ndarray) -> np.ndarray:
        return contains_points(self.vertices, self.origin_inside, points,
                               self.is_empty_or_full)


class Polygon:
    """Nested loops, even-odd semantics (hole = odd depth)."""

    def __init__(self, loops: list[Loop]):
        # Drop explicitly-empty loops like the reference's InitNested does.
        self.loops = [l for l in loops if not l.is_empty]

    def contains(self, points: np.ndarray) -> np.ndarray:
        points = np.asarray(points, dtype=np.float64).reshape(-1, 3)
        inside = np.zeros(len(points), dtype=bool)
        for loop in self.loops:
            inside ^= loop.contains(points)
        return inside

    @property
    def is_empty(self) -> bool:
        return not self.loops

    @property
    def is_full(self) -> bool:
        return len(self.loops) == 1 and self.loops[0].is_full


def contains_points(
    vertices: np.ndarray,
    origin_inside: bool,
    points: np.ndarray,
    is_empty_or_full: bool = False,
) -> np.ndarray:
    """Vectorized BruteForceContains for N points against one ring."""
    points = np.asarray(points, dtype=np.float64).reshape(-1, 3)
    n_pts = len(points)
    if is_empty_or_full or len(vertices) < 3:
        return np.full(n_pts, origin_inside)
    C, D = _close_ring(vertices)
    n_edges = len(C)

    # Vectorized triage of the four orientation signs per (point, edge).
    o_cross_p = np.cross(P.ORIGIN[None, :], points)  # (N,3)
    det_opv = o_cross_p @ vertices.T  # (N,M): sign(O,P,V_m) triage dets
    s_opv = P.triage_sign_det(det_opv)
    s_opc = s_opv
    s_opd = np.roll(s_opv, -1, axis=1)

    c_cross_d = np.cross(C, D)  # (M,3)
    det_cdp = points @ c_cross_d.T  # (N,M): sign(C,D,P)
    s_cdp = P.triage_sign_det(det_cdp)
    det_cdo = c_cross_d @ P.ORIGIN  # (M,)
    s_cdo = P.triage_sign_det(det_cdo)[None, :]

    acb = -s_opc
    bda = s_opd
    cbd = -s_cdp
    dac = np.broadcast_to(s_cdo, acb.shape)

    # A pair is decided by triage iff all four signs are certain, or two
    # certain opposite signs already rule out a crossing — and the point is
    # not bit-equal to an edge endpoint (vertex-crossing tie-break needed).
    shared = (points[:, None, :] == C[None, :, :]).all(-1) | (
        points[:, None, :] == D[None, :, :]
    ).all(-1)
    all_certain = (s_opc != 0) & (s_opd != 0) & (s_cdp != 0) & (dac != 0)
    certain_no = (s_opc != 0) & (s_opd != 0) & (acb != bda)
    decided = (all_certain | certain_no) & ~shared
    crossing = decided & (acb == bda) & (cbd == acb) & (dac == acb)
    fallback = ~decided

    crossings = crossing.astype(np.int64)
    if fallback.any():
        idx_n, idx_m = np.nonzero(fallback)
        for ni, mi in zip(idx_n.tolist(), idx_m.tolist()):
            crossings[ni, mi] = int(
                P.edge_or_vertex_crossing(P.ORIGIN, points[ni], C[mi], D[mi])
            )
    parity = crossings.sum(axis=1) & 1
    return np.asarray(origin_inside ^ parity.astype(bool))


# ---------------------------------------------------------------- textformat
def parse_points(s: str) -> np.ndarray:
    """"lat:lng, lat:lng, …" → (n,3) unit vectors (s2text_format.h:63-92)."""
    lat, lng = [], []
    for tok in s.split(","):
        tok = tok.strip()
        if not tok:
            continue
        a, _, b = tok.partition(":")
        lat.append(float(a))
        lng.append(float(b))
    x, y, z = latlng_to_xyz(np.array(lat), np.array(lng))
    return np.stack([x, y, z], axis=-1)


def parse_loop(s: str) -> Loop:
    s = s.strip()
    if s == "empty":
        return Loop(np.array([[0.0, 0.0, 1.0]]))
    if s == "full":
        return Loop(np.array([[0.0, 0.0, -1.0]]))
    return Loop(parse_points(s))


def parse_polygon(s: str, normalize: bool = False) -> Polygon:
    """";"-separated loop strings (MakePolygon, s2text_format.h).

    normalize=True matches s2textformat::MakePolygon (s2text_format.cc:
    185-203): each loop is inverted if it encloses more than half the
    sphere (S2Loop::Normalize); loops at exactly a hemisphere keep the
    given orientation (turning angle 0 counts as normalized).
    """
    s = s.strip()
    if not s or s == "empty":
        return Polygon([])
    if s == "full":
        return Polygon([parse_loop("full")])
    loops = [parse_loop(part) for part in s.split(";") if part.strip()]
    if normalize:
        from .measures import loop_signed_area

        fixed = []
        for loop in loops:
            if not loop.is_empty_or_full and len(loop.vertices) >= 3:
                sa = loop_signed_area(loop.vertices)
                if sa < 0 and abs(abs(sa) - 2 * np.pi) > 1e-9:
                    loop = Loop(loop.vertices[::-1].copy())
            fixed.append(loop)
        loops = fixed
    return Polygon(loops)


def parse_lax_polygon(s: str) -> Polygon:
    """MakeLaxPolygonOrDie analog (s2text_format.cc MakeLaxPolygon):
    loops keep their given orientation and the interior is the region
    locally on the LEFT of every boundary edge, decided by the
    GetReferencePoint vote (s2shapeutil_get_reference_point.cc) — NOT
    the XOR-of-independent-loop-interiors reading of Polygon.contains.

    For properly nested loop sets the two readings agree and this is
    parse_polygon verbatim.  For seam arrangements whose left-regions
    overlap — s2boolean_operation_test.cc's k6FaceAlmostEmpty1
    ("k6FaceShell1Minus; k6FaceHole1") is the canonical case — the XOR
    reading is the global COMPLEMENT of the lax interior.  The
    complement bit is representable without touching the boundary:
    append one full loop (edge-free, flips XOR parity everywhere).
    """
    return lax_polygon_reading(parse_polygon(s))


def lax_polygon_reading(poly: Polygon) -> Polygon:
    """The GetReferencePoint complement vote of parse_lax_polygon over an
    already-constructed Polygon: when the XOR-of-oriented-loop-interiors
    reading is the global complement of the lax (interior-on-left)
    reading — e.g. holes wound CW — append one full loop to flip the
    parity everywhere without touching the boundary."""
    if not poly.loops or any(l.is_empty_or_full for l in poly.loops):
        # single-loop case still votes: a lone CW loop's lax interior is
        # the COMPLEMENT of its XOR reading (interior-on-left, e.g.
        # s2boolean_operation_test.cc
        # PolygonEdgeIsolatedStartVertexPlusInteriorCrossing's CW "a")
        return poly
    from .shapeutil import LaxPolygon, contains_brute_force

    shape = LaxPolygon([l.vertices for l in poly.loops])
    verts = np.concatenate([l.vertices for l in poly.loops])
    # any off-boundary probe determines the constant complement bit
    # (both readings are crossing-parity over the SAME edge set)
    for lat, lng in ((37.1234567, -42.7654321), (-53.19, 111.73), (5.5, 5.5)):
        x, y, z = latlng_to_xyz(np.array([lat]), np.array([lng]))
        probe = np.array([x[0], y[0], z[0]])
        if (verts == probe).all(axis=1).any():
            continue
        if contains_brute_force(shape, probe) != bool(
            poly.contains(probe[None])[0]
        ):
            return Polygon(poly.loops + [parse_loop("full")])
        return poly
    return poly


def format_point(p, roundtrip_precision: bool = False) -> str:
    """s2textformat ToString vertex (s2text_format.cc:251-265):
    "%.15g:%.15g" lat:lng degrees ("%.17g" for exact round trips)."""
    from .coords import xyz_to_latlng

    p = np.asarray(p, float).reshape(3)
    lat, lng = xyz_to_latlng(
        np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
    )
    fmt = "%.17g:%.17g" if roundtrip_precision else "%.15g:%.15g"
    return fmt % (float(lat[0]), float(lng[0]))


def format_points(points, roundtrip_precision: bool = False) -> str:
    """s2textformat ToString point list (s2text_format.cc:267-285)."""
    pts = np.asarray(points, float).reshape(-1, 3)
    return ", ".join(format_point(p, roundtrip_precision) for p in pts)


def format_polygon(
    polygon: "Polygon",
    roundtrip_precision: bool = False,
    loop_separator: str = "; ",
) -> str:
    """s2textformat ToString polygon (s2text_format.cc ToString(S2Polygon,
    loop_separator)): loops joined by the separator (the reference
    default is ";\\n"; this module keeps '; ' for historical callers),
    with the "empty" / "full" sentinels."""
    if not polygon.loops:
        return "empty"
    if polygon.is_full:
        return "full"
    return loop_separator.join(
        format_points(loop.vertices, roundtrip_precision)
        for loop in polygon.loops
    )


def format_latlngs(latlngs) -> str:
    """s2textformat ToString(Span<const S2LatLng>): "%.15g:%.15g" pairs
    joined by ', ' (s2text_format.cc)."""
    return ", ".join("%.15g:%.15g" % (lat, lng) for lat, lng in latlngs)


def format_lax_polygon(loops, loop_separator: str = ";\n") -> str:
    """s2textformat ToString(S2LaxPolygonShape): same loop join, but a
    zero-vertex loop renders as "full" and a lax polygon with no loops
    as "empty"."""
    if not len(loops):
        return "empty"
    return loop_separator.join(
        "full" if len(lv) == 0 else format_points(lv) for lv in loops
    )


def _shape_chains(sh) -> list:
    """Chains of a duck-typed shape: dim 0 → one single-vertex chain per
    point; dim 1 → one chain of all vertices; dim 2 → one chain per loop
    (a zero-vertex chain is the full loop)."""
    if sh.dim == 0:
        return [p[None] for p in np.asarray(sh.points, float)]
    if sh.dim == 1:
        return [np.asarray(sh.vertices, float)]
    return [np.asarray(lv, float).reshape(-1, 3) for lv in sh.loops]


def format_shape(sh) -> str:
    """s2textformat ToString(S2Shape) (s2text_format.cc:359-385): the
    single-shape index form — points as "p | p ##", polylines as
    "# v, v #", polygons as "## loop; loop"."""
    separator = "; " if sh.dim == 2 else " | "
    out = "# " if sh.dim == 1 else "## " if sh.dim == 2 else ""
    out += separator.join(format_points(c) for c in _shape_chains(sh))
    if sh.dim == 1:
        out += " #"
    if sh.dim == 0:
        out += " ##"
    return out


def format_index(shapes, roundtrip_precision: bool = False) -> str:
    """s2textformat ToString(S2ShapeIndex) (s2text_format.cc:409-439):
    "points # polylines # polygons", dimension sections separated by
    '#', same-dimension shapes by ' | ', polygon chains by '; ', with a
    zero-length chain rendered as "full"."""
    out = ""
    for dim in range(3):
        if dim > 0:
            out += "#"
        count = 0
        for sh in shapes:
            if sh.dim != dim:
                continue
            out += " | " if count > 0 else (" " if dim > 0 else "")
            for i, chain in enumerate(_shape_chains(sh)):
                if i > 0:
                    out += "; " if dim == 2 else " | "
                if len(chain) == 0:
                    out += "full"
                else:
                    out += format_points(chain, roundtrip_precision)
                count += 1
        if dim == 1 or (dim == 0 and count > 0):
            out += " "
    return out
