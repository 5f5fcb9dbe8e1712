"""Constrained polyline simplification (s2polyline_simplifier.h/.cc).

Computes a maximal output edge from a source vertex that passes through
a sequence of target discs while avoiding a second sequence of discs,
conservatively with respect to floating-point error: the acceptable
bearings from the source form an S1Interval window that every
target/avoid constraint narrows.

  - PolylineSimplifier.init/extend/target_disc/avoid_disc mirror
    S2PolylineSimplifier (s2polyline_simplifier.h:68-145)
  - GetDirection / GetSemiwidth error bounds per
    s2polyline_simplifier.cc:160-247
  - the deferred ranges_to_avoid_ mechanism (discs cannot be processed
    until a target disc shrinks the window below 180°) per
    s2polyline_simplifier.cc:105-132

Distances are squared chord lengths throughout (kernel/distance.py
conventions); `radius2` arguments are S1ChordAngle::length2() values.

This kernel powers the builder's simplify pass
(kernel/builder.py:simplify_snapped_polylines) — the Spark-facing
operator is operators/polyline_ops.simplify_polylines.
"""

from __future__ import annotations

import math

import numpy as np

from .intervals import S1Interval

DBL_ERR = 0.5 * 2.220446049250313e-16  # 0.5 * DBL_EPSILON
_CHORD2_RIGHT = 2.0  # S1ChordAngle::Right().length2()


def angle_to_chord2(radians: float) -> float:
    s = 2.0 * math.sin(0.5 * min(math.pi, radians))
    return s * s


class PolylineSimplifier:
    """Port of S2PolylineSimplifier (s2polyline_simplifier.cc:29-247)."""

    __slots__ = ("src", "_x_dir", "_y_dir", "_window", "_ranges_to_avoid")

    def __init__(self) -> None:
        self.src = np.zeros(3)
        self._x_dir = np.zeros(3)
        self._y_dir = np.zeros(3)
        self._window = S1Interval.full()
        self._ranges_to_avoid: list[tuple[S1Interval, bool]] = []

    def init(self, src: np.ndarray) -> None:
        """Start a new simplified edge at `src`
        (s2polyline_simplifier.cc:29-60): precompute unnormalized
        tangent-space basis vectors, reset the angle window."""
        src = np.asarray(src, float).reshape(3)
        self.src = src
        self._window = S1Interval.full()
        self._ranges_to_avoid = []
        # index of the component of smallest magnitude
        a = np.abs(src)
        i = (0 if a[0] < a[2] else 2) if a[0] < a[1] else (1 if a[1] < a[2] else 2)
        j = 0 if i == 2 else i + 1
        k = 2 if i == 0 else i - 1
        y = np.zeros(3)
        y[i] = 0.0
        y[j] = src[k]
        y[k] = -src[j]
        x = np.zeros(3)
        x[i] = src[j] * src[j] + src[k] * src[k]
        x[j] = -src[j] * src[i]
        x[k] = -src[k] * src[i]
        self._x_dir = x
        self._y_dir = y

    def extend(self, dst: np.ndarray) -> bool:
        """True iff the edge (src, dst) satisfies every constraint so
        far; False for edges longer than 90° (unsupported)
        (s2polyline_simplifier.cc:62-76)."""
        dst = np.asarray(dst, float).reshape(3)
        if float(((self.src - dst) ** 2).sum()) > _CHORD2_RIGHT:
            return False
        direction = self._get_direction(dst)
        if not self._window.contains(direction):
            return False
        for interval, _on_left in self._ranges_to_avoid:
            if interval.contains(direction):
                return False
        return True

    def target_disc(self, p: np.ndarray, radius2: float) -> bool:
        """Require the output edge to pass through the disc
        (s2polyline_simplifier.cc:78-102).  `radius2` = squared chord
        radius."""
        p = np.asarray(p, float).reshape(3)
        semiwidth = self._get_semiwidth(p, radius2, -1)
        if semiwidth >= math.pi:
            return True  # the target disc contains src
        if semiwidth < 0:
            self._window = S1Interval.empty()
            return False
        center = self._get_direction(p)
        target = S1Interval.from_point(center).expanded(semiwidth)
        self._window = self._window.intersection(target)
        for interval, on_left in self._ranges_to_avoid:
            self._avoid_range(interval, on_left)
        self._ranges_to_avoid = []
        return not self._window.is_empty()

    def avoid_disc(self, p: np.ndarray, radius2: float, disc_on_left: bool) -> bool:
        """Require the output edge to avoid the disc, passing on the
        side given by `disc_on_left` (s2polyline_simplifier.cc:104-132)."""
        p = np.asarray(p, float).reshape(3)
        semiwidth = self._get_semiwidth(p, radius2, +1)
        if semiwidth >= math.pi:
            self._window = S1Interval.empty()
            return False  # the disc to avoid contains src
        center = self._get_direction(p)
        dleft = 0.5 * math.pi if disc_on_left else semiwidth
        dright = semiwidth if disc_on_left else 0.5 * math.pi
        avoid_interval = S1Interval(
            math.remainder(center - dright, 2 * math.pi),
            math.remainder(center + dleft, 2 * math.pi),
        )
        if self._window.is_full():
            # cannot process until a TargetDisc call shrinks the window
            # below 180° (s2polyline_simplifier.cc:117-121)
            self._ranges_to_avoid.append((avoid_interval, disc_on_left))
            return True
        self._avoid_range(avoid_interval, disc_on_left)
        return not self._window.is_empty()

    def _avoid_range(self, avoid_interval: S1Interval, disc_on_left: bool) -> None:
        """s2polyline_simplifier.cc:134-158: when the avoid interval is a
        proper subset of the window, keep only the subinterval on the
        topologically correct side; otherwise intersect with the
        complement."""
        assert not self._window.is_full()
        if self._window.contains_interval(avoid_interval):
            if disc_on_left:
                self._window = S1Interval(self._window.lo, avoid_interval.lo)
            else:
                self._window = S1Interval(avoid_interval.hi, self._window.hi)
        else:
            self._window = self._window.intersection(avoid_interval.complement())

    def _get_direction(self, p: np.ndarray) -> float:
        return math.atan2(float(p @ self._y_dir), float(p @ self._x_dir))

    def _get_semiwidth(self, p: np.ndarray, r2: float, round_direction: int) -> float:
        """Half-angle subtended at src by a disc of squared-chord radius
        r2 at p, rounded conservatively (s2polyline_simplifier.cc:160-247
        with the full error budget derivation)."""
        a2 = float(((self.src - p) ** 2).sum())
        a2 -= 64 * DBL_ERR * DBL_ERR * round_direction
        if a2 <= r2:
            return math.pi  # the disc contains src
        sin2_r = r2 * (1 - 0.25 * r2)
        sin2_a = a2 * (1 - 0.25 * a2)
        semiwidth = math.asin(math.sqrt(sin2_r / sin2_a))
        error = (2 * 10 + 4) * DBL_ERR + 17 * DBL_ERR * semiwidth
        return semiwidth + round_direction * error


def simplify_polyline_indices(
    vertices: np.ndarray,
    tolerance_rad: float,
    avoid: np.ndarray | None = None,
    avoid_on_left: np.ndarray | None = None,
) -> list[int]:
    """Greedy maximal-edge simplification driver
    (s2polyline_simplifier.h:28-41 usage sketch): walk the polyline,
    targeting a disc of `tolerance_rad` around every skipped vertex, and
    emit a new edge whenever Extend fails.  Optional `avoid` points (with
    per-point side flags) are constrained per the AvoidDisc contract.

    Returns indices of kept vertices (always keeps first and last).
    Unlike SubsampleVertices (kernel/polyline.py:143), this guarantees
    every *output edge* stays within tolerance of the vertices it
    replaces using conservative arithmetic."""
    v = np.asarray(vertices, float).reshape(-1, 3)
    n = len(v)
    if n <= 2:
        return list(range(n))
    r2 = angle_to_chord2(tolerance_rad)
    avoid = None if avoid is None else np.asarray(avoid, float).reshape(-1, 3)

    s = PolylineSimplifier()
    kept = [0]
    s.init(v[0])
    if avoid is not None:
        for ai in range(len(avoid)):
            s.avoid_disc(avoid[ai], r2, bool(avoid_on_left[ai]))
    for i in range(1, n):
        if not s.extend(v[i]):
            kept.append(i - 1)
            s.init(v[i - 1])
            if avoid is not None:
                for ai in range(len(avoid)):
                    s.avoid_disc(avoid[ai], r2, bool(avoid_on_left[ai]))
        s.target_disc(v[i], r2)
    if kept[-1] != n - 1:
        kept.append(n - 1)
    return kept


class EdgeChainSimplifier:
    """Port of S2Builder::EdgeChainSimplifier (s2builder.cc:1443-2050):
    simplifies a merged multigraph of snapped edges from all layers,
    replacing maximal chains of interior vertices by single edges while
    honoring the simplifier's target/avoid constraints.

    Graph form: `sites` is an (N, 3) array of vertex coordinates;
    `edges[e] = (v0, v1)` directed site-id pairs; `layers[e]` the layer
    each edge came from; `input_ids[e]` the input-edge ids merged into
    the edge (used to order reconstruction, IdSetLexicon analog);
    `site_inputs[v]` the list of INPUT vertex coordinates snapped to
    site v (site_vertices_ analog, for TargetInputVertices).

    Radii are squared chord lengths: `edge_snap_r2` (edge_snap_radius),
    `min_sep_r2` (min_edge_site_separation), `near_r2` (the
    max_edge_deviation + min_edge_vertex_separation query radius used to
    build per-edge nearby-site lists), `max_len2`
    (min_edge_length_to_split)."""

    def __init__(
        self,
        sites: np.ndarray,
        edges: list[tuple[int, int]],
        layers: list[int],
        input_ids: list[list[int]],
        site_inputs: dict[int, list[np.ndarray]],
        edge_snap_r2: float,
        min_sep_r2: float,
        near_r2: float,
        max_len2: float,
        forced: set[int] | None = None,
    ) -> None:
        self.forced = forced or set()
        self.S = np.asarray(sites, float).reshape(-1, 3)
        self.edges = edges
        self.layers = layers
        self.input_ids = input_ids
        self.site_inputs = site_inputs
        self.edge_snap_r2 = edge_snap_r2
        self.min_sep_r2 = min_sep_r2
        self.near_r2 = near_r2
        self.max_len2 = max_len2

        n = len(self.S)
        self.out_ids: list[list[int]] = [[] for _ in range(n)]
        self.in_ids: list[list[int]] = [[] for _ in range(n)]
        for e, (v0, v1) in enumerate(edges):
            self.out_ids[v0].append(e)
            self.in_ids[v1].append(e)
        # stable layer-order iteration (the reference's graphs are built
        # in layer order; our edge ids are assigned in that order)
        self.used = [False] * len(edges)
        self.is_interior = [self._compute_interior(v) for v in range(n)]
        self.new_edges: list[tuple[int, int]] = []
        self.new_layers: list[int] = []
        self.new_input_ids: list[list[int]] = []

    # -- IsInterior / InteriorVertexMatcher (s2builder.cc:1706-1787) ----
    def _compute_interior(self, v: int) -> bool:
        if len(self.out_ids[v]) == 0:
            return False
        if len(self.out_ids[v]) != len(self.in_ids[v]):
            return False
        if v in self.forced:
            return False  # keep forced vertices (s2builder.cc:1764)
        by_layer: dict[int, list[tuple[int, bool]]] = {}
        for e in self.out_ids[v]:
            by_layer.setdefault(self.layers[e], []).append((self.edges[e][1], True))
        for e in self.in_ids[v]:
            by_layer.setdefault(self.layers[e], []).append((self.edges[e][0], False))
        # v1/v2 persist ACROSS layers (InteriorVertexMatcher resets only
        # the counters in StartLayer, s2builder.cc:1710-1713): every
        # layer passing through v0 must connect the SAME two neighbors,
        # else the chain walk would merge edges from divergent paths
        # (the EdgesOverlap partially-shared-boundary case)
        v1 = v2 = -1
        too_many = False
        for _layer in sorted(by_layer):
            tallies = by_layer[_layer]
            excess_out = n0 = n1 = n2 = 0
            for w, outgoing in tallies:
                excess_out += 1 if outgoing else -1
                if w == v:
                    n0 += 1
                else:
                    if v1 < 0:
                        v1 = w
                    if v1 == w:
                        n1 += 1
                    else:
                        if v2 < 0:
                            v2 = w
                        if v2 == w:
                            n2 += 1
                        else:
                            too_many = True
            if too_many or excess_out != 0 or n1 != n2 or (n0 != 0 and n1 == 0):
                return False
        return True

    # -- helpers --------------------------------------------------------
    def _out_edge_ids(self, v0: int, v1: int) -> list[int]:
        return [e for e in self.out_ids[v0] if self.edges[e][1] == v1]

    def _output_edge(self, e: int) -> None:
        self.new_edges.append(self.edges[e])
        self.new_layers.append(self.layers[e])
        self.new_input_ids.append(list(self.input_ids[e]))
        self.used[e] = True

    def _follow_chain(self, v0: int, v1: int) -> int:
        # s2builder.cc:1838-1846
        for e in self.out_ids[v1]:
            v = self.edges[e][1]
            if v != v0 and v != v1:
                return v
        raise RuntimeError("could not find next edge in edge chain")

    def _target_input_vertices(self, v: int, simp: PolylineSimplifier) -> bool:
        for q in self.site_inputs.get(v, ()):
            if not simp.target_disc(q, self.edge_snap_r2):
                return False
        return True

    def _avoid_sites(
        self, v0: int, v1: int, v2: int, used_vertices: set, simp: PolylineSimplifier
    ) -> bool:
        """s2builder.cc:1867-1940 with the nearby-site list computed
        directly from the graph edge (the reference's per-input-edge
        lists are a cached superset of the same query)."""
        from .distance import point_edge_dist2
        from .predicates import ordered_ccw, sign

        S = self.S
        p0, p1, p2 = S[v0], S[v1], S[v2]
        r1 = float(((p0 - p1) ** 2).sum())
        r2 = float(((p0 - p2) ** 2).sum())
        if r2 < r1:
            return False  # chains must move monotonically away from p0
        if r2 >= self.max_len2:
            return False  # would break the max_edge_deviation guarantee
        d2 = point_edge_dist2(S, p1[None], p2[None])[:, 0]
        for sid in np.nonzero(d2 <= self.near_r2)[0].tolist():
            p = S[sid]
            if float(((p0 - p) ** 2).sum()) >= r2:
                continue  # not relevant yet
            if sid in used_vertices:
                continue
            used_vertices.add(sid)
            if v1 == v0:
                disc_on_left = float(sign(p1[None], p2[None], p[None])[0]) > 0
            else:
                disc_on_left = bool(ordered_ccw(p0, p2, p, p1))
            if not simp.avoid_disc(p, self.min_sep_r2, disc_on_left):
                return False
        return True

    # -- SimplifyChain (s2builder.cc:1789-1835) -------------------------
    def _simplify_chain(self, v0: int, v1: int) -> None:
        """Follows the chain starting with (v0, v1), simplifying maximal
        subchains; on a subchain break, v0/v1 already name the next edge
        (the reference's do/while structure, s2builder.cc:1795-1834)."""
        vstart = v0
        simp = PolylineSimplifier()
        done = False
        while True:
            chain = [v0]
            used_vertices = {v0}
            simp.init(self.S[v0])
            simplify = self._avoid_sites(v0, v0, v1, used_vertices, simp)
            while True:
                chain.append(v1)
                used_vertices.add(v1)
                done = (not self.is_interior[v1]) or v1 == vstart
                if done:
                    break
                vprev = v0
                v0 = v1
                v1 = self._follow_chain(vprev, v0)
                if not (
                    simplify
                    and self._target_input_vertices(v0, simp)
                    and self._avoid_sites(chain[0], v0, v1, used_vertices, simp)
                    and simp.extend(self.S[v1])
                ):
                    break
            if len(chain) == 2:
                for e in self._out_edge_ids(chain[0], chain[1]):
                    self._output_edge(e)
                for e in self._out_edge_ids(chain[1], chain[0]):
                    self._output_edge(e)
            else:
                self._merge_chain(chain)
            if done:
                return

    # -- MergeChain (s2builder.cc:1946-2013) ----------------------------
    def _merge_chain(self, vertices: list[int]) -> None:
        merged_input_ids: list[list[int]] = []
        degenerate_ids: list[int] = []
        num_out = 0
        for i in range(1, len(vertices)):
            v0, v1 = vertices[i - 1], vertices[i]
            out_edges = self._out_edge_ids(v0, v1)
            in_edges = self._out_edge_ids(v1, v0)
            if i == 1:
                num_out = len(out_edges)
                merged_input_ids = [[] for _ in range(num_out + len(in_edges))]
            else:
                for e in self._out_edge_ids(v0, v0):
                    degenerate_ids.extend(self.input_ids[e])
                    self.used[e] = True
            j = 0
            for e in out_edges:
                merged_input_ids[j].extend(self.input_ids[e])
                self.used[e] = True
                j += 1
            for e in in_edges:
                merged_input_ids[j].extend(self.input_ids[e])
                self.used[e] = True
                j += 1
            assert j == len(merged_input_ids)
        if degenerate_ids:
            # AssignDegenerateEdges simplified: append to the output edge
            # whose input-id range is closest (the reference's heuristic
            # for non-overlapping ranges, s2builder.cc:2015-2050)
            degenerate_ids.sort()
            for did in degenerate_ids:
                best = min(
                    range(len(merged_input_ids)),
                    key=lambda k: min(
                        (abs(did - x) for x in merged_input_ids[k]), default=1 << 60
                    ),
                )
                merged_input_ids[best].append(did)
        v0, v1, vb = vertices[0], vertices[1], vertices[-1]
        for e in self._out_edge_ids(v0, v1):
            self.new_edges.append((v0, vb))
            self.new_layers.append(self.layers[e])
        for e in self._out_edge_ids(v1, v0):
            self.new_edges.append((vb, v0))
            self.new_layers.append(self.layers[e])
        for ids in merged_input_ids:
            self.new_input_ids.append(sorted(set(ids)))

    # -- Run (s2builder.cc:1614-1666) -----------------------------------
    def run(self) -> tuple[list[tuple[int, int]], list[int], list[list[int]]]:
        for e in range(len(self.edges)):
            if self.used[e]:
                continue
            v0, v1 = self.edges[e]
            if self.is_interior[v0]:
                continue
            if not self.is_interior[v1]:
                self._output_edge(e)  # edge between two non-interior vertices
            else:
                self._simplify_chain(v0, v1)
        # remaining edges form loops whose vertices are all interior
        for e in range(len(self.edges)):
            if self.used[e]:
                continue
            v0, v1 = self.edges[e]
            if v0 == v1:
                self._output_edge(e)
            else:
                self._simplify_chain(v0, v1)
        return self.new_edges, self.new_layers, self.new_input_ids
