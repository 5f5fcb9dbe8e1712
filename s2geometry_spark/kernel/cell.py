"""Driver-side S2Cell (s2cell.h/.cc): id + face/level/uv-rect geometry."""

from __future__ import annotations

import math

import numpy as np

from . import coords
from .cid import CID, MAX_LEVEL
from .hilbert import to_face_ij_orientation
from .intervals import PI, R1Interval, S1Interval

DBL_EPSILON = 2.220446049250313e-16
POLE_MIN_LAT = math.asin(math.sqrt(1.0 / 3)) - 0.5 * DBL_EPSILON


def _unorm(face: int, u: float) -> np.ndarray:
    """GetUNorm (s2coords.h:440-452)."""
    return np.array(
        [
            (u, -1, 0), (1, u, 0), (1, 0, u),
            (-u, 0, 1), (0, -u, 1), (0, -1, -u),
        ][face],
        dtype=np.float64,
    )


def _vnorm(face: int, v: float) -> np.ndarray:
    """GetVNorm (s2coords.h:454-466)."""
    return np.array(
        [
            (-v, 0, 1), (0, -v, 1), (0, -1, -v),
            (v, -1, 0), (1, v, 0), (1, 0, v),
        ][face],
        dtype=np.float64,
    )


def _face_uv_to_xyz(face: int, u: float, v: float) -> np.ndarray:
    return np.array(
        [
            (1, u, v), (-u, 1, v), (-u, -v, 1),
            (-1, -v, -u), (v, -1, -u), (v, u, -1),
        ][face],
        dtype=np.float64,
    )


def face_xyz_to_uv(face: int, p: np.ndarray):
    """FaceXYZtoUV (s2coords.h:421-431): None if p is not on face's side."""
    w = p[face % 3]
    if face < 3:
        if w <= 0:
            return None
    else:
        if w >= 0:
            return None
    return _valid_face_xyz_to_uv(face, p)


def _valid_face_xyz_to_uv(face: int, p: np.ndarray):
    x, y, z = float(p[0]), float(p[1]), float(p[2])
    if face == 0:
        return y / x, z / x
    if face == 1:
        return -x / y, z / y
    if face == 2:
        return -x / z, -y / z
    if face == 3:
        return z / x, y / x
    if face == 4:
        return z / y, -x / y
    return -y / z, -x / z


def face_xyz_to_uvw(face: int, p: np.ndarray) -> np.ndarray:
    """FaceXYZtoUVW: express p in the (u,v,w) frame of face
    (kFaceUVWAxes, s2coords_internal.h:84-117)."""
    return coords.FACE_UVW_AXES[face] @ p


GET_NORM = [_face_uv_to_xyz(f, 0, 0) for f in range(6)]


def get_uvw_face(face: int, axis: int, direction: int) -> int:
    """GetUVWFace via kFaceUVWFaces (s2coords_internal.h:120-128)."""
    return int(coords.FACE_UVW_FACES[face][axis][direction])


class Cell:
    """S2Cell: face, level, orientation, uv bound (s2cell.cc:64-71)."""

    __slots__ = ("id", "face", "level", "orientation", "u_lo", "u_hi", "v_lo", "v_hi")

    def __init__(self, cid: CID):
        self.id = cid
        ids = np.array([cid.id], dtype=np.uint64)
        f, i, j, orient = to_face_ij_orientation(ids)
        self.face = int(f[0])
        self.orientation = int(orient[0])
        self.level = cid.level()
        size = 1 << (MAX_LEVEL - self.level)
        i_lo = int(i[0]) & -size
        j_lo = int(j[0]) & -size
        lim = 1.0 / (1 << MAX_LEVEL)
        self.u_lo = float(coords.st_to_uv(lim * i_lo))
        self.u_hi = float(coords.st_to_uv(lim * (i_lo + size)))
        self.v_lo = float(coords.st_to_uv(lim * j_lo))
        self.v_hi = float(coords.st_to_uv(lim * (j_lo + size)))

    # ---- size / edge coordinates (s2cell.h:129-181)
    def get_size_ij(self) -> int:
        return 1 << (MAX_LEVEL - self.level)

    def _uv_vertex(self, k: int):
        """GetBoundUV().GetVertex(k): CCW from (u_lo, v_lo)."""
        k &= 3
        u = self.u_hi if (k == 1 or k == 2) else self.u_lo
        v = self.v_hi if (k >= 2) else self.v_lo
        return u, v

    def get_uv_coord_of_edge(self, k: int) -> float:
        """The constant U or V coordinate of boundary k
        (s2cell.h:148-154): edges 0/2 are constant in V, 1/3 in U."""
        k %= 4
        u, v = self._uv_vertex(k)
        return v if k % 2 == 0 else u

    def get_ij_coord_of_edge(self, k: int) -> int:
        """The constant I or J coordinate of boundary k
        (s2cell.h:167-181), rounded to the IJ lattice."""
        lim = 1 << MAX_LEVEL
        import math as _math

        return int(
            _math.floor(
                lim * float(coords.uv_to_st(self.get_uv_coord_of_edge(k)))
                + 0.5
            )
        )

    def get_cell_union_bound(self) -> list:
        """GetCellUnionBound (s2cell.cc): the cell covers itself."""
        return [self.id]

    # ---- geometry
    def get_vertex_raw(self, k: int) -> np.ndarray:
        """uv rect corner k, CCW from lower-left (s2cell.h:136-140)."""
        k &= 3
        j = (k >> 1) & 1
        i = j ^ (k & 1)
        u = self.u_hi if i else self.u_lo
        v = self.v_hi if j else self.v_lo
        return _face_uv_to_xyz(self.face, u, v)

    def get_vertex(self, k: int) -> np.ndarray:
        v = self.get_vertex_raw(k)
        return v / np.linalg.norm(v)

    def get_edge_raw(self, k: int) -> np.ndarray:
        """Inward normal of edge k (s2cell.cc:73-84)."""
        k &= 3
        if k == 0:
            return _vnorm(self.face, self.v_lo)  # bottom
        if k == 1:
            return _unorm(self.face, self.u_hi)  # right
        if k == 2:
            return -_vnorm(self.face, self.v_hi)  # top
        return -_unorm(self.face, self.u_lo)  # left

    def get_center_raw(self) -> np.ndarray:
        from . import cellid as K

        x, y, z = K.to_point_raw(np.array([self.id.id], dtype=np.uint64))
        return np.array([x[0], y[0], z[0]])

    def get_center(self) -> np.ndarray:
        c = self.get_center_raw()
        return c / np.linalg.norm(c)

    def children(self) -> list["Cell"]:
        return [Cell(self.id.child(k)) for k in range(4)]

    def contains_point(self, p: np.ndarray) -> bool:
        """S2Cell::Contains(S2Point) (s2cell.cc:291-320) with the
        (5/3)·ε uv-bound expansion."""
        uv = face_xyz_to_uv(self.face, p)
        if uv is None:
            return False
        u, v = uv
        eps = (5.0 / 3.0) * DBL_EPSILON
        return (
            self.u_lo - eps <= u <= self.u_hi + eps
            and self.v_lo - eps <= v <= self.v_hi + eps
        )

    # ---- lat/lng bound (s2cell.cc GetRectBound)
    def _get_latitude(self, i: int, j: int) -> float:
        p = _face_uv_to_xyz(
            self.face, self.u_hi if i else self.u_lo, self.v_hi if j else self.v_lo
        )
        return math.atan2(p[2] + 0.0, math.sqrt(p[0] * p[0] + p[1] * p[1]))

    def _get_longitude(self, i: int, j: int) -> float:
        p = _face_uv_to_xyz(
            self.face, self.u_hi if i else self.u_lo, self.v_hi if j else self.v_lo
        )
        return math.atan2(p[1] + 0.0, p[0] + 0.0)

    def get_rect_bound(self):
        from .region import LatLngRect

        if self.level > 0:
            u = self.u_lo + self.u_hi
            v = self.v_lo + self.v_hi
            # GetUAxis(face)[2]==0 / GetVAxis(face)[2]==0 tests
            u_axis_z = float(coords.FACE_UVW_AXES[self.face][0][2])
            v_axis_z = float(coords.FACE_UVW_AXES[self.face][1][2])
            i = int(u < 0) if u_axis_z == 0 else int(u > 0)
            j = int(v < 0) if v_axis_z == 0 else int(v > 0)
            lat = R1Interval.from_point_pair(
                self._get_latitude(i, j), self._get_latitude(1 - i, 1 - j)
            )
            lng = S1Interval.from_point_pair(
                self._get_longitude(i, 1 - j), self._get_longitude(1 - i, j)
            )
            return LatLngRect(lat, lng).expanded_radians(
                2 * DBL_EPSILON, 2 * DBL_EPSILON
            ).polar_closure()
        bounds = [
            (R1Interval(-PI / 4, PI / 4), S1Interval(-PI / 4, PI / 4)),
            (R1Interval(-PI / 4, PI / 4), S1Interval(PI / 4, 3 * PI / 4)),
            (R1Interval(POLE_MIN_LAT, PI / 2), S1Interval.full()),
            (R1Interval(-PI / 4, PI / 4), S1Interval(3 * PI / 4, -3 * PI / 4)),
            (R1Interval(-PI / 4, PI / 4), S1Interval(-3 * PI / 4, -PI / 4)),
            (R1Interval(-PI / 2, -POLE_MIN_LAT), S1Interval.full()),
        ]
        lat, lng = bounds[self.face]
        return LatLngRect(lat, lng).expanded_radians(DBL_EPSILON, 0.0)

    def get_bound_uv_expanded(self, pad: float):
        return (self.u_lo - pad, self.u_hi + pad, self.v_lo - pad, self.v_hi + pad)


# ---- areas & distances (s2cell.cc:120-160, 382-560) ----
def _cell_vertices(cell: "Cell"):
    import numpy as _np

    return _np.stack([cell.get_vertex(k) for k in range(4)])


def average_area(level: int) -> float:
    from . import metrics

    return metrics.AVG_AREA.get_value(level)


def approx_area(cell: "Cell") -> float:
    """S2Cell::ApproxArea (s2cell.cc:127-144)."""
    import math

    import numpy as _np

    if cell.level < 2:
        return average_area(cell.level)
    v = _cell_vertices(cell)
    flat_area = 0.5 * float(
        _np.linalg.norm(_np.cross(v[2] - v[0], v[3] - v[1]))
    )
    return flat_area * 2 / (1 + math.sqrt(1 - min(flat_area / math.pi, 1.0)))


def exact_area(cell: "Cell") -> float:
    """S2Cell::ExactArea (s2cell.cc:146-157): two triangles."""
    from .measures import triangle_area

    v = _cell_vertices(cell)
    return float(triangle_area(v[0], v[1], v[2])) + float(
        triangle_area(v[0], v[2], v[3])
    )


def cell_distance2(cell: "Cell", p) -> float:
    """Min squared-chord distance from point p to the cell (0 if inside)
    — S2Cell::GetDistance semantics (s2cell.cc:434-470)."""
    import numpy as _np

    from .distance import point_edge_dist2

    if cell.contains_point(_np.asarray(p, float)):
        return 0.0
    v = _cell_vertices(cell)
    d = _np.roll(v, -1, axis=0)
    return float(point_edge_dist2(_np.asarray(p, float)[None], v, d).min())


def cell_edge_distance2(cell: "Cell", a, b) -> float:
    """Min squared-chord distance from edge (a, b) to the cell —
    S2Cell::GetDistance(a, b) (s2cell.cc:460-499): endpoint distances,
    then boundary crossings, then cell-vertex-to-edge-interior."""
    import numpy as _np

    from .distance import point_edge_dist2
    from .predicates import crossing_sign

    a = _np.asarray(a, float)
    b = _np.asarray(b, float)
    min_d2 = min(cell_distance2(cell, a), cell_distance2(cell, b))
    if min_d2 == 0.0:
        return 0.0
    v = _cell_vertices(cell)
    for i in range(4):
        if crossing_sign(a, b, v[i - 1], v[i]) >= 0:
            return 0.0
    d2 = point_edge_dist2(v, a[None], b[None])[:, 0].min()
    return float(min(min_d2, d2))


def cell_cell_distance2(cell: "Cell", target: "Cell") -> float:
    """Min squared-chord distance between two cells —
    S2Cell::GetDistance(S2Cell) general form (s2cell.cc:575-590): zero
    when the id ranges intersect, else the 32 (vertex, edge) pairs.
    (The reference's same-face UV pruning is a fast path, not a
    semantic difference.)"""
    import numpy as _np

    from .distance import point_edge_dist2

    if cell.id.intersects(target.id):
        return 0.0
    va = _cell_vertices(cell)
    vb = _cell_vertices(target)
    d1 = point_edge_dist2(va, vb, _np.roll(vb, -1, axis=0)).min()
    d2 = point_edge_dist2(vb, va, _np.roll(va, -1, axis=0)).min()
    return float(min(d1, d2))


def edge_point_max_dist2(x, a, b) -> float:
    """UpdateMaxDistance for a point vs an edge (s2edge_distances.cc):
    max at an endpoint unless the antipode's projection lands in the
    edge interior, in which case it is π − d(−x, ab).  Uses the exact
    identity chord²(π−θ) = 4 − chord²(θ)."""
    import numpy as _np

    from .distance import chord2, point_edge_dist2

    x = _np.asarray(x, float)
    a = _np.asarray(a, float)
    b = _np.asarray(b, float)
    d2 = max(float(chord2(x, a)), float(chord2(x, b)))
    if d2 > 2.0:
        d2 = 4.0 - float(point_edge_dist2((-x)[None], a[None], b[None])[0, 0])
    return d2


def cell_point_max_distance2(cell: "Cell", p) -> float:
    """S2Cell::GetMaxDistance(S2Point) (s2cell.cc:442-458)."""
    import numpy as _np

    from .distance import chord2

    p = _np.asarray(p, float)
    v = _cell_vertices(cell)
    d2 = float(chord2(v, p).max())
    if d2 <= 2.0:
        return d2
    return 4.0 - cell_distance2(cell, -p)


def cell_edge_max_distance2(cell: "Cell", a, b) -> float:
    """S2Cell::GetMaxDistance(a, b) (s2cell.cc:501-511)."""
    import numpy as _np

    a = _np.asarray(a, float)
    b = _np.asarray(b, float)
    d2 = max(cell_point_max_distance2(cell, a),
             cell_point_max_distance2(cell, b))
    if d2 <= 2.0:
        return d2
    return 4.0 - cell_edge_distance2(cell, -a, -b)


def cell_cell_max_distance2(cell: "Cell", target: "Cell") -> float:
    """S2Cell::GetMaxDistance(S2Cell) (s2cell.cc:601-630): Straight when
    the antipodal target intersects; else the 32 (vertex, edge) pairs
    under UpdateMaxDistance."""
    import numpy as _np

    opposite_face = target.face - 3 if target.face >= 3 else target.face + 3
    if cell.face == opposite_face:
        # antipodal UV is the TRANSPOSE of the original UV
        au = (cell.u_lo, cell.u_hi)
        av = (cell.v_lo, cell.v_hi)
        bu = (target.v_lo, target.v_hi)
        bv = (target.u_lo, target.u_hi)
        if au[0] <= bu[1] and bu[0] <= au[1] and av[0] <= bv[1] and bv[0] <= av[1]:
            return 4.0
    va = _cell_vertices(cell)
    vb = _cell_vertices(target)
    best = -1.0
    for i in range(4):
        for j in range(4):
            best = max(
                best,
                edge_point_max_dist2(va[i], vb[j], vb[(j + 1) & 3]),
                edge_point_max_dist2(vb[i], va[j], va[(j + 1) & 3]),
            )
    return best
