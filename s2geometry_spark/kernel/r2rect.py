"""R2Rect (r2rect.h/.cc) and S2R2Rect (s2r2rect.h/.cc): an axis-aligned
rectangle in (x,y) / face-0 (s,t) space, the 2-D bound type used by the
edge clipper and padded cells.  R2Rect composes two R1Intervals; S2R2Rect
interprets the rectangle in the ST coordinates of cube face 0 and
implements the S2Region interface (cap/cell bounds, point and cell
containment)."""

from __future__ import annotations

import math

import numpy as np

from .intervals import R1Interval


class R2Rect:
    """R2Rect: x and y R1Intervals; empty iff either interval is empty
    (r2rect.h:38-212)."""

    __slots__ = ("x", "y")

    def __init__(self, lo=None, hi=None):
        if lo is None:
            self.x = R1Interval.empty()
            self.y = R1Interval.empty()
        elif isinstance(lo, R1Interval):
            self.x = R1Interval(lo.lo, lo.hi)
            self.y = R1Interval(hi.lo, hi.hi)
        else:
            self.x = R1Interval(float(lo[0]), float(hi[0]))
            self.y = R1Interval(float(lo[1]), float(hi[1]))

    # ---- constructors
    @staticmethod
    def empty() -> "R2Rect":
        return R2Rect()

    @staticmethod
    def from_center_size(center, size) -> "R2Rect":
        return R2Rect(
            (center[0] - 0.5 * size[0], center[1] - 0.5 * size[1]),
            (center[0] + 0.5 * size[0], center[1] + 0.5 * size[1]),
        )

    @staticmethod
    def from_point(p) -> "R2Rect":
        return R2Rect(p, p)

    @staticmethod
    def from_point_pair(p1, p2) -> "R2Rect":
        r = R2Rect()
        r.x = R1Interval.from_point_pair(float(p1[0]), float(p2[0]))
        r.y = R1Interval.from_point_pair(float(p1[1]), float(p2[1]))
        return r

    @staticmethod
    def from_intervals(x: R1Interval, y: R1Interval) -> "R2Rect":
        r = R2Rect()
        r.x = R1Interval(x.lo, x.hi)
        r.y = R1Interval(y.lo, y.hi)
        return r

    # ---- accessors
    def lo(self) -> tuple:
        return (self.x.lo, self.y.lo)

    def hi(self) -> tuple:
        return (self.x.hi, self.y.hi)

    def __getitem__(self, i: int) -> R1Interval:
        return (self.x, self.y)[i]

    def __setitem__(self, i: int, v: R1Interval) -> None:
        if i == 0:
            self.x = v
        elif i == 1:
            self.y = v
        else:
            raise IndexError(i)

    def is_valid(self) -> bool:
        return self.x.is_empty() == self.y.is_empty()

    def is_empty(self) -> bool:
        return self.x.is_empty()

    def get_vertex(self, k: int) -> tuple:
        """CCW order: lo, (hi.x,lo.y), hi, (lo.x,hi.y) (r2rect.h:102)."""
        k &= 3
        return self.get_vertex_ij(k >> 1 ^ (k & 1), k >> 1)

    def get_vertex_ij(self, i: int, j: int) -> tuple:
        return (
            self.x.hi if i == 1 else self.x.lo,
            self.y.hi if j == 1 else self.y.lo,
        )

    def get_center(self) -> tuple:
        return (self.x.get_center(), self.y.get_center())

    def get_size(self) -> tuple:
        return (self.x.get_length(), self.y.get_length())

    # ---- predicates
    def contains_point(self, p) -> bool:
        return self.x.contains(float(p[0])) and self.y.contains(float(p[1]))

    def interior_contains_point(self, p) -> bool:
        return (
            self.x.interior_contains(float(p[0]))
            and self.y.interior_contains(float(p[1]))
        )

    def contains(self, other: "R2Rect") -> bool:
        return (
            self.x.contains_interval(other.x)
            and self.y.contains_interval(other.y)
        )

    def interior_contains(self, other: "R2Rect") -> bool:
        return (
            self.x.interior_contains_interval(other.x)
            and self.y.interior_contains_interval(other.y)
        )

    def intersects(self, other: "R2Rect") -> bool:
        return self.x.intersects(other.x) and self.y.intersects(other.y)

    def interior_intersects(self, other: "R2Rect") -> bool:
        return (
            self.x.interior_intersects(other.x)
            and self.y.interior_intersects(other.y)
        )

    # ---- mutators / algebra
    def add_point(self, p) -> None:
        self.x.add_point(float(p[0]))
        self.y.add_point(float(p[1]))

    def add_rect(self, other: "R2Rect") -> None:
        self.x.add_interval(other.x)
        self.y.add_interval(other.y)

    def project(self, p) -> tuple:
        return (self.x.project(float(p[0])), self.y.project(float(p[1])))

    def expanded(self, margin) -> "R2Rect":
        """Expanded by (margin.x, margin.y) or a scalar; any resulting
        empty interval empties the rectangle (r2rect.cc:55-62)."""
        if np.isscalar(margin):
            mx = my = float(margin)
        else:
            mx, my = float(margin[0]), float(margin[1])
        xx = self.x.expanded(mx)
        yy = self.y.expanded(my)
        if xx.is_empty() or yy.is_empty():
            return R2Rect.empty()
        return R2Rect.from_intervals(xx, yy)

    def union(self, other: "R2Rect") -> "R2Rect":
        return R2Rect.from_intervals(
            self.x.union(other.x), self.y.union(other.y)
        )

    def intersection(self, other: "R2Rect") -> "R2Rect":
        xx = self.x.intersection(other.x)
        yy = self.y.intersection(other.y)
        if xx.is_empty() or yy.is_empty():
            return R2Rect.empty()
        return R2Rect.from_intervals(xx, yy)

    def approx_equals(self, other: "R2Rect", max_error: float = 1e-15) -> bool:
        return (
            abs(self.x.lo - other.x.lo) <= max_error
            and abs(self.x.hi - other.x.hi) <= max_error
            and abs(self.y.lo - other.y.lo) <= max_error
            and abs(self.y.hi - other.y.hi) <= max_error
        )

    def __eq__(self, other) -> bool:
        if not isinstance(other, R2Rect):
            return NotImplemented
        return (
            self.x.lo == other.x.lo
            and self.x.hi == other.x.hi
            and self.y.lo == other.y.lo
            and self.y.hi == other.y.hi
        ) or (self.is_empty() and other.is_empty())

    def __hash__(self):
        if self.is_empty():
            return hash(("R2Rect", "empty"))
        return hash(("R2Rect", self.x.lo, self.x.hi, self.y.lo, self.y.hi))

    def __repr__(self):
        return f"R2Rect[Lo{self.lo()}, Hi{self.hi()}]"


class S2R2Rect:
    """S2R2Rect: an R2Rect in the (s,t) space of cube face 0, as an
    S2Region (s2r2rect.h/.cc)."""

    __slots__ = ("rect",)

    def __init__(self, lo=None, hi=None):
        if isinstance(lo, R2Rect):
            self.rect = lo
        else:
            self.rect = R2Rect(lo, hi)

    # ---- constructors
    @staticmethod
    def empty() -> "S2R2Rect":
        return S2R2Rect(R2Rect.empty())

    @staticmethod
    def from_center_size(center, size) -> "S2R2Rect":
        return S2R2Rect(R2Rect.from_center_size(center, size))

    @staticmethod
    def from_point(p) -> "S2R2Rect":
        return S2R2Rect(R2Rect.from_point(p))

    @staticmethod
    def from_point_pair(p1, p2) -> "S2R2Rect":
        return S2R2Rect(R2Rect.from_point_pair(p1, p2))

    @staticmethod
    def from_cid(cid) -> "S2R2Rect":
        """FromCellId: the cell's (s,t) bounding square
        (s2r2rect.cc:40-45)."""
        from . import cellid as cid_np

        ids = np.array([cid.id], dtype=np.uint64)
        _f, si, ti = cid_np.get_center_siti(ids)
        center = (float(si[0]) / 2**31, float(ti[0]) / 2**31)
        size = float(cid_np.get_size_ij(np.array([cid.level()]))[0]) / 2**30
        return S2R2Rect.from_center_size(center, (size, size))

    @staticmethod
    def to_s2point(p) -> np.ndarray:
        """ST point on face 0 → unit sphere point (s2r2rect.cc:49-51)."""
        from .cell import _face_uv_to_xyz
        from .coords import st_to_uv

        xyz = _face_uv_to_xyz(
            0, float(st_to_uv(np.float64(p[0]))),
            float(st_to_uv(np.float64(p[1]))),
        )
        return xyz / np.linalg.norm(xyz)

    # ---- R2Rect delegation
    def x(self) -> R1Interval:
        return self.rect.x

    def y(self) -> R1Interval:
        return self.rect.y

    def __getitem__(self, i: int) -> R1Interval:
        return self.rect[i]

    def lo(self):
        return self.rect.lo()

    def hi(self):
        return self.rect.hi()

    def is_valid(self) -> bool:
        return self.rect.is_valid()

    def is_empty(self) -> bool:
        return self.rect.is_empty()

    def get_vertex(self, k: int):
        return self.rect.get_vertex(k)

    def get_vertex_ij(self, i: int, j: int):
        return self.rect.get_vertex_ij(i, j)

    def get_center(self):
        return self.rect.get_center()

    def contains_st(self, p) -> bool:
        return self.rect.contains_point(p)

    def interior_contains_st(self, p) -> bool:
        return self.rect.interior_contains_point(p)

    def contains(self, other: "S2R2Rect") -> bool:
        return self.rect.contains(other.rect)

    def interior_contains(self, other: "S2R2Rect") -> bool:
        return self.rect.interior_contains(other.rect)

    def intersects(self, other: "S2R2Rect") -> bool:
        return self.rect.intersects(other.rect)

    def interior_intersects(self, other: "S2R2Rect") -> bool:
        return self.rect.interior_intersects(other.rect)

    def add_point(self, p) -> None:
        self.rect.add_point(p)

    def add_rect(self, other: "S2R2Rect") -> None:
        self.rect.add_rect(other.rect)

    def project(self, p):
        return self.rect.project(p)

    def expanded(self, margin) -> "S2R2Rect":
        return S2R2Rect(self.rect.expanded(margin))

    def union(self, other: "S2R2Rect") -> "S2R2Rect":
        return S2R2Rect(self.rect.union(other.rect))

    def intersection(self, other: "S2R2Rect") -> "S2R2Rect":
        return S2R2Rect(self.rect.intersection(other.rect))

    def approx_equals(self, other: "S2R2Rect",
                      max_error: float = 1e-15) -> bool:
        return self.rect.approx_equals(other.rect, max_error)

    def __eq__(self, other) -> bool:
        if not isinstance(other, S2R2Rect):
            return NotImplemented
        return self.rect == other.rect

    def __hash__(self):
        return hash(("S2R2Rect", self.rect))

    def __repr__(self):
        return f"S2R2Rect[Lo{self.lo()}, Hi{self.hi()}]"

    # ---- S2Region interface
    def get_cap_bound(self):
        """Vertex cap centered on the (s,t) center (s2r2rect.cc:59-72)."""
        from .region import Cap

        if self.is_empty():
            return Cap.empty()
        cap = Cap(S2R2Rect.to_s2point(self.get_center()), 0.0)
        for k in range(4):
            cap.add_point(S2R2Rect.to_s2point(self.get_vertex(k)))
        return cap

    def get_rect_bound(self):
        return self.get_cap_bound().get_rect_bound()

    def contains_point(self, p) -> bool:
        """Contains(S2Point): face-0 membership then ST containment
        (s2r2rect.cc:84-89)."""
        from .coords import get_face, uv_to_st

        p = np.asarray(p, float)
        if int(get_face(np.array([p[0]]), np.array([p[1]]),
                        np.array([p[2]]))[0]) != 0:
            return False
        from .cell import _valid_face_xyz_to_uv

        u, v = _valid_face_xyz_to_uv(0, p)
        return self.contains_st(
            (float(uv_to_st(np.float64(u))), float(uv_to_st(np.float64(v))))
        )

    def contains_cell(self, cell) -> bool:
        if cell.face != 0:
            return False
        return self.contains(S2R2Rect.from_cid(cell.id))

    def may_intersect_cell(self, cell) -> bool:
        if cell.face != 0:
            return False
        return self.intersects(S2R2Rect.from_cid(cell.id))
