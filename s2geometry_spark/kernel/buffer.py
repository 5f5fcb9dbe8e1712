"""S2BufferOperation — buffer points/polylines/polygons by a (signed)
radius (s2buffer_operation.h/.cc).

The algorithm is the reference's: walk every input boundary generating
the OFFSET CURVE (edge arcs offset by the radius, vertex arcs at convex
turns, routing through the input vertex at concave turns), while a
"sweep edge" from the input boundary to the offset curve tracks how the
winding number of a fixed reference point changes
(s2buffer_operation.cc:359-436).  The offset paths are then resolved by
S2WindingOperation with rule POSITIVE (kernel/winding.py).  A negative
radius buffers the boundary towards the interior (edge axes flip sign);
radius 0 passes geometry through, keeping points/polylines as degenerate
loops so they can be recovered from the output.

Snap functions are applied as vertex snapping in front of the winding
operation (the reference threads them through S2Builder; full snap
composition incl. edge splitting lives in kernel/booleans.
boolean_op_snapped / kernel/builder).
"""

from __future__ import annotations

import math

import numpy as np

from . import predicates as P
from .clipping import robust_cross_prod
from .distance import chord2, chord2_add, chord2_sub, chord2_to_angle
from .shapeutil import LaxPolygon, contains_brute_force
from .winding import WindingRule, winding_operation

DBL_ERR = 0.5 * 2.220446049250313e-16
SQRT3 = math.sqrt(3.0)

# kMinRequestedError (s2buffer_operation.cc:132): the spacing between
# representable S2Points, below which extra precision buys nothing.
MIN_REQUESTED_ERROR = 2 * DBL_ERR

# kMaxAbsoluteInterpolationError = kGetPointOnLineError +
# kGetPointOnRayPerpendicularError (s2buffer_operation.cc:142-143;
# s2edge_distances.h:179-211; kRobustCrossProdError = 6·DBL_ERR).
GET_POINT_ON_LINE_ERROR = (4 + 2 / SQRT3) * DBL_ERR + 6 * DBL_ERR
GET_POINT_ON_RAY_PERPENDICULAR_ERROR = 3 * DBL_ERR
MAX_ABSOLUTE_INTERPOLATION_ERROR = (
    GET_POINT_ON_LINE_ERROR + GET_POINT_ON_RAY_PERPENDICULAR_ERROR
)

_RIGHT2 = 2.0  # S1ChordAngle::Right().length2()
_STRAIGHT2 = 4.0


def _norm(v: np.ndarray) -> np.ndarray:
    return v / np.linalg.norm(v)


def point_on_ray(origin: np.ndarray, direction: np.ndarray, chord2_r: float) -> np.ndarray:
    """S2::GetPointOnRay(origin, dir, S1ChordAngle r)
    (s2edge_distances.cc): origin and dir perpendicular unit vectors."""
    r = chord2_to_angle(chord2_r)
    return math.cos(r) * origin + math.sin(r) * direction


class BufferOptions:
    """S2BufferOperation::Options (s2buffer_operation.h:63-200)."""

    MIN_ERROR_FRACTION = 1e-6  # kMinErrorFraction
    MAX_CIRCLE_SEGMENTS = 1570.7968503979573  # kMaxCircleSegments

    def __init__(self, buffer_radius_rad: float = 0.0):
        from .builder import IdentitySnapFunction

        self.buffer_radius = float(buffer_radius_rad)
        self.error_fraction = 0.01
        self.end_cap_style = "round"  # EndCapStyle::ROUND
        self.polyline_side = "both"  # PolylineSide::BOTH
        self.snap = IdentitySnapFunction(0.0)

    def set_error_fraction(self, error_fraction: float) -> None:
        self.error_fraction = max(
            self.MIN_ERROR_FRACTION, min(1.0, float(error_fraction))
        )

    def max_error(self) -> float:
        """Options::max_error (cc:192-198): requested + absolute
        interpolation + builder max_edge_deviation (split_crossing_edges
        implies edge snap radius = snap_radius + kIntersectionError)."""
        from .builder import max_edge_deviation

        intersection_error = 8 * DBL_ERR  # kIntersectionError
        edge_snap_radius = self.snap.snap_radius + intersection_error
        return (
            max(
                MIN_REQUESTED_ERROR,
                self.error_fraction * abs(self.buffer_radius),
            )
            + MAX_ABSOLUTE_INTERPOLATION_ERROR
            + max_edge_deviation(edge_snap_radius)
        )

    def circle_segments(self) -> float:
        """cc:200-208 (midline-vertex formula)."""
        return math.pi / math.acos(1 - self.error_fraction)

    def set_circle_segments(self, circle_segments: float) -> None:
        """cc:210-237: convert via planar geometry, rounding up."""
        circle_segments = max(
            2.0, min(self.MAX_CIRCLE_SEGMENTS, float(circle_segments))
        )
        self.set_error_fraction(
            1 - math.cos(math.pi / circle_segments) + 1e-15
        )


class BufferResult:
    """The output 'lax polygon': loops may be degenerate (1-vertex point
    shells, 2-vertex sibling pairs) exactly as LaxPolygonLayer emits
    them."""

    def __init__(self, loops: list, full: bool):
        self.loops = loops
        self.full = full

    def is_full(self) -> bool:
        return self.full and not self.loops

    def is_empty(self) -> bool:
        return not self.full and not self.loops

    def num_vertices(self) -> int:
        return sum(len(l) for l in self.loops)


class BufferOperation:
    """S2BufferOperation (s2buffer_operation.cc:276-768)."""

    def __init__(self, options: BufferOptions | None = None):
        self.options = options or BufferOptions()
        o = self.options
        self._ref_point = P.ORIGIN
        self._ref_winding = 0
        self._have_input_start = False
        self._have_offset_start = False
        self._num_polygon_layers = 0
        self._path: list[np.ndarray] = []
        self._paths: list[np.ndarray] = []

        r = o.buffer_radius
        self._buffer_sign = (r > 0) - (r < 0)
        abs_radius = abs(r)
        requested_error = max(
            MIN_REQUESTED_ERROR, o.error_fraction * abs_radius
        )
        max_error = MAX_ABSOLUTE_INTERPOLATION_ERROR + requested_error
        self._edge_step2 = 0.0
        if abs_radius <= max_error:
            # Buffering by less than the error could shrink instead of
            # expand; return the original geometry instead (cc:295-302).
            self._abs_radius2 = 0.0
            self._buffer_sign = 0
        elif abs_radius + max_error >= math.pi:
            self._abs_radius2 = _STRAIGHT2
        else:
            self._abs_radius2 = self._chord2_of(abs_radius)
            vertex_step = self._get_max_edge_span(abs_radius, requested_error)
            self._vertex_step2 = self._chord2_of(vertex_step)
            # points buffer as REGULAR polygons: step adjusted up so no
            # tiny extra edge appears (cc:312-316)
            self._point_step2 = self._chord2_of(
                2 * math.pi / math.ceil(2 * math.pi / vertex_step) + 1e-15
            )
            # edges contribute only if radius (with error) < 90°
            edge_radius = math.pi / 2 - abs_radius
            if edge_radius > max_error:
                self._edge_step2 = self._chord2_of(
                    self._get_max_edge_span(edge_radius, requested_error)
                )
        # degeneracies kept only for radius exactly 0 requested >= 0
        self._include_degeneracies = (
            self._buffer_sign == 0 and o.buffer_radius >= 0
        )

    @staticmethod
    def _chord2_of(radians: float) -> float:
        s = 2.0 * math.sin(0.5 * min(math.pi, radians))
        return s * s

    def _get_max_edge_span(self, radius: float, requested_error: float) -> float:
        """GetMaxEdgeSpan (cc:344-357)."""
        step = 2 * math.pi / 3 + 1e-15
        min_radius = radius - requested_error
        assert min_radius >= 0
        if radius < math.pi / 2:
            step = min(
                step, 2 * math.acos(min(1.0, math.tan(min_radius) / math.tan(radius)))
            )
        elif min_radius > math.pi / 2:
            step = min(
                step, 2 * math.acos(min(1.0, math.tan(radius) / math.tan(min_radius)))
            )
        return step

    # ------------------------------------------------ sweep machinery
    def _set_input_vertex(self, new_a: np.ndarray) -> None:
        if self._have_input_start:
            self._update_ref_winding(self._sweep_a, self._sweep_b, new_a)
        else:
            self._input_start = new_a
            self._have_input_start = True
        self._sweep_a = new_a

    def _add_offset_vertex(self, new_b: np.ndarray) -> None:
        self._path.append(new_b)
        if self._have_offset_start:
            self._update_ref_winding(self._sweep_a, self._sweep_b, new_b)
        else:
            self._offset_start = new_b
            self._have_offset_start = True
        self._sweep_b = new_b

    def _close_buffer_region(self) -> None:
        if self._have_offset_start and self._have_input_start:
            self._update_ref_winding(
                self._sweep_a, self._sweep_b, self._input_start
            )
            self._update_ref_winding(
                self._input_start, self._sweep_b, self._offset_start
            )

    def _output_path(self) -> None:
        if self._path:
            self._paths.append(np.asarray(self._path, float))
        self._path = []
        self._have_input_start = False
        self._have_offset_start = False

    def _update_ref_winding(self, a, b, c) -> None:
        """cc:411-436: triangle ABC just covered by the sweep edge."""
        sign = int(P.sign(a[None], b[None], c[None])[0])
        if sign == 0:
            return
        inside = P.angle_contains_vertex(a, b, c) == (sign > 0)
        r = self._ref_point
        inside ^= P.edge_or_vertex_crossing(b, r, a, b)
        inside ^= P.edge_or_vertex_crossing(b, r, b, c)
        inside ^= P.edge_or_vertex_crossing(b, r, c, a)
        if inside:
            self._ref_winding += sign

    def add_full_polygon(self) -> None:
        self._ref_winding += 1

    # ------------------------------------------------------ inputs
    def add_point(self, point: np.ndarray) -> None:
        """cc:443-478."""
        point = np.asarray(point, float)
        if self._buffer_sign < 0:
            return
        if self._abs_radius2 >= _STRAIGHT2:
            return self.add_full_polygon()
        if self._buffer_sign == 0:
            self._path.append(point)
        else:
            # generate the circle in four 90° increments (S1ChordAngle
            # can only represent 0..180°)
            self._set_input_vertex(point)
            start = P.ortho(point)
            angle2 = 0.0
            for _quadrant in range(4):
                rotate_dir = _norm(np.cross(point, start))
                while angle2 < _RIGHT2:
                    direction = point_on_ray(start, rotate_dir, angle2)
                    self._add_offset_vertex(
                        point_on_ray(point, direction, self._abs_radius2)
                    )
                    angle2 = chord2_add(angle2, self._point_step2)
                angle2 = chord2_sub(angle2, _RIGHT2)
                start = rotate_dir
            self._close_buffer_region()
        self._output_path()

    def _get_edge_axis(self, a, b) -> np.ndarray:
        assert self._buffer_sign != 0
        return self._buffer_sign * _norm(robust_cross_prod(b, a))

    def _add_vertex_arc(self, v, start, end) -> None:
        """Semi-open CCW offset arc around vertex V (cc:491-500)."""
        rotate_dir = self._buffer_sign * _norm(np.cross(v, start))
        angle2, span2 = 0.0, chord2(start, end)
        while True:
            direction = point_on_ray(start, rotate_dir, angle2)
            self._add_offset_vertex(
                point_on_ray(v, direction, self._abs_radius2)
            )
            angle2 = chord2_add(angle2, self._vertex_step2)
            if angle2 >= span2:
                break

    def _close_vertex_arc(self, v, end) -> None:
        self._add_offset_vertex(point_on_ray(v, end, self._abs_radius2))

    def _add_edge_arc(self, a, b) -> None:
        """Semi-open offset arc for edge AB (cc:508-528)."""
        ab_axis = self._get_edge_axis(a, b)
        if self._edge_step2 == 0.0:
            # radius > 90°: edges don't contribute; route through the
            # edge normal to keep winding numbers correct
            self._add_offset_vertex(ab_axis)
        else:
            rotate_dir = self._buffer_sign * _norm(np.cross(a, ab_axis))
            angle2, span2 = 0.0, chord2(a, b)
            while True:
                p = point_on_ray(a, rotate_dir, angle2)
                self._add_offset_vertex(
                    point_on_ray(p, ab_axis, self._abs_radius2)
                )
                angle2 = chord2_add(angle2, self._edge_step2)
                if angle2 >= span2:
                    break
        self._set_input_vertex(b)

    def _close_edge_arc(self, a, b) -> None:
        if self._edge_step2 != 0.0:
            self._add_offset_vertex(
                point_on_ray(b, self._get_edge_axis(a, b), self._abs_radius2)
            )

    def _buffer_edge_and_vertex(self, a, b, c) -> None:
        """cc:546-576."""
        assert self._buffer_sign != 0
        self._add_edge_arc(a, b)
        if self._buffer_sign * int(P.sign(a[None], b[None], c[None])[0]) >= 0:
            # convex turn: offset arc around b
            start = self._get_edge_axis(a, b)
            end = self._get_edge_axis(b, c)
            self._add_vertex_arc(b, start, end)
            if self._edge_step2 == 0.0:
                self._close_vertex_arc(b, end)
        else:
            # concave turn: route the offset path through the input
            # vertex to keep winding numbers correct everywhere
            self._close_edge_arc(a, b)
            self._add_offset_vertex(b)

    def _add_start_cap(self, a, b) -> None:
        """cc:580-599."""
        axis = self._get_edge_axis(a, b)
        if self.options.end_cap_style == "flat":
            if self.options.polyline_side == "both":
                self._add_offset_vertex(
                    point_on_ray(a, -axis, self._abs_radius2)
                )
        else:
            if self.options.polyline_side == "both":
                self._add_vertex_arc(a, -axis, axis)  # semicircle
            else:
                self._add_vertex_arc(a, _norm(np.cross(axis, a)), axis)

    def _add_end_cap(self, a, b) -> None:
        """cc:603-621."""
        axis = self._get_edge_axis(a, b)
        if self.options.end_cap_style == "flat":
            self._close_edge_arc(a, b)
        else:
            if self.options.polyline_side == "both":
                self._add_vertex_arc(b, axis, -axis)  # semicircle
            else:
                end = _norm(np.cross(b, axis))
                self._add_vertex_arc(b, axis, end)
                self._close_vertex_arc(b, end)

    def _buffer_loop(self, loop: np.ndarray) -> None:
        """cc:624-650."""
        loop = np.asarray(loop, float).reshape(-1, 3)
        n = len(loop)
        if n == 0:
            return
        if n == 1:
            return self.add_point(loop[0])
        if self._abs_radius2 >= _STRAIGHT2:
            if self._buffer_sign > 0:
                self.add_full_polygon()
            return
        if self._buffer_sign == 0:
            self._path.extend(loop)
        else:
            self._set_input_vertex(loop[0])
            for i in range(n):
                self._buffer_edge_and_vertex(
                    loop[i], loop[(i + 1) % n], loop[(i + 2) % n]
                )
            self._close_buffer_region()
        self._output_path()

    def add_polyline(self, polyline: np.ndarray) -> None:
        """cc:652-710."""
        polyline = np.asarray(polyline, float).reshape(-1, 3)
        if self.options.polyline_side == "left":
            polyline = polyline[::-1].copy()
        if self._buffer_sign < 0:
            return  # polylines are discarded
        n = len(polyline)
        if n <= 1:
            return
        if n == 2 and np.array_equal(polyline[0], polyline[1]):
            return self.add_point(polyline[0])
        if self._abs_radius2 >= _STRAIGHT2:
            return self.add_full_polygon()
        if self._buffer_sign == 0:
            # degenerate loop: forward then reversed (sibling pairs)
            self._path.extend(polyline[:-1])
            self._path.extend(polyline[::-1][:-1])
        else:
            self._set_input_vertex(polyline[0])
            self._add_start_cap(polyline[0], polyline[1])
            for i in range(n - 2):
                self._buffer_edge_and_vertex(
                    polyline[i], polyline[i + 1], polyline[i + 2]
                )
            self._add_edge_arc(polyline[n - 2], polyline[n - 1])
            self._add_end_cap(polyline[n - 2], polyline[n - 1])
            if self.options.polyline_side == "both":
                for i in range(n - 3, -1, -1):
                    self._buffer_edge_and_vertex(
                        polyline[i + 2], polyline[i + 1], polyline[i]
                    )
                self._add_edge_arc(polyline[1], polyline[0])
                self._close_buffer_region()
            else:
                # the other side is the reversed polyline itself
                self._path.extend(polyline[::-1])
        self._output_path()

    def add_loop(self, loop) -> None:
        """cc:712-722."""
        loop = np.asarray(loop, float).reshape(-1, 3)
        if len(loop) == 0:
            return
        self._buffer_loop(loop)
        self._ref_winding += contains_brute_force(
            LaxPolygon([loop]), self._ref_point
        )
        self._num_polygon_layers += 1

    def _buffer_shape(self, shape: LaxPolygon) -> None:
        """cc:724-741 for dim-2 LaxPolygon shapes."""
        for loop in shape.loops:
            if len(loop) == 0:
                continue
            self._buffer_loop(loop)

    def add_shape(self, shape: LaxPolygon) -> None:
        """cc:743-747 (dim-2 shapes; use add_point/add_polyline for
        lower dimensions)."""
        self._buffer_shape(shape)
        self._ref_winding += contains_brute_force(shape, self._ref_point)
        self._num_polygon_layers += 1

    def add_shape_index(
        self,
        points: list | None = None,
        polylines: list | None = None,
        polygons: list | None = None,
    ) -> None:
        """cc:749-758: buffer every shape; containment of the reference
        point is the index-level (any-shape) test."""
        for p in points or []:
            self.add_point(p)
        for pl in polylines or []:
            self.add_polyline(pl)
        max_dim = 1 if (points or polylines) else -1
        contained = False
        for poly in polygons or []:
            self._buffer_shape(poly)
            contained = contained or contains_brute_force(
                poly, self._ref_point
            )
            max_dim = 2
        self._ref_winding += contained
        self._num_polygon_layers += max_dim == 2

    # ------------------------------------------------------- build
    def build(self) -> BufferResult:
        """cc:760-768 + the LaxPolygonLayer convention for degenerate
        outputs (1-vertex point shells, 2-vertex sibling pairs)."""
        if self._buffer_sign < 0 and self._num_polygon_layers > 1:
            raise ValueError(
                "Negative buffer radius requires at most one polygon layer"
            )
        paths = self._paths
        if self.options.snap.snap_radius > 0:
            paths = [self.options.snap.snap(p) for p in paths]
        out = winding_operation(
            paths,
            self._ref_point,
            self._ref_winding,
            WindingRule.POSITIVE,
            include_degeneracies=self._include_degeneracies,
        )
        if self._include_degeneracies:
            loops, full, degens = out
            loops = list(loops)
            loops.extend(np.asarray(p, float)[None] for p in degens["points"])
            loops.extend(
                np.asarray([a, b], float)
                for a, b in degens["sibling_edges"]
            )
        else:
            loops, full = out
        return BufferResult(loops, full)
