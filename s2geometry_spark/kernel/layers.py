"""S2Builder output layers (s2builderutil_s2polyline_layer.cc,
s2builderutil_s2polyline_vector_layer.cc,
s2builderutil_s2point_vector_layer.cc) plus the Builder facade that
feeds them: snap input edges to a shared site set (reusing the exact
Voronoi machinery in kernel/builder.py), normalize with
Graph.process_edges under each layer's GraphOptions, then assemble.

A layer is any object with `graph_options() -> GraphOptions` and
`build(graph) -> None` that records its output; Builder.build() returns
an error string (or None) like the reference's S2Error codes.
"""

from __future__ import annotations

import math

import numpy as np

from .builder import (
    IdentitySnapFunction,
    SnapFunction,
    add_extra_sites,
    choose_sites,
    snap_edge_chain,
)
from .graph import (
    DIRECTED,
    DISCARD,
    KEEP,
    UNDIRECTED,
    Graph,
    GraphOptions,
    IdSetLexicon,
    LabelFetcher,
    PATH,
    WALK,
    process_edges,
)


def resolve_is_full(value) -> bool:
    """Graph::IsFullPolygon (s2builder_graph.h): the is-full-polygon
    predicate is invoked only at the point a layer needs the decision.
    `value` is either the resolved bool or a zero-arg callable."""
    return bool(value()) if callable(value) else bool(value)


class Builder:
    """S2Builder facade: collects labeled input edges/points, snaps, and
    hands a Graph to the layer.  Labels follow the reference's
    set_label/push_label/clear_labels surface (s2builder.h:730-760)."""

    def __init__(self, snap: SnapFunction | None = None,
                 split_crossing_edges: bool = False,
                 idempotent: bool = True,
                 simplify_edge_chains: bool = False,
                 intersection_tolerance: float = 0.0):
        self.snap = snap or IdentitySnapFunction(0.0)
        self.split_crossing_edges = split_crossing_edges
        self.idempotent = idempotent
        self.simplify_edge_chains = simplify_edge_chains
        self.intersection_tolerance = intersection_tolerance
        self._labels: list[int] = []
        self._edges: list[tuple[np.ndarray, np.ndarray]] = []
        self._edge_labels: list[tuple[int, ...]] = []
        self._layer = None
        self._layers: list = []
        self._layer_begins: list[int] = []
        self._is_full = False
        self._forced: list[np.ndarray] = []
        self._intersections: list[np.ndarray] = []

    def _edge_snap_radius(self) -> float:
        """edge_snap_radius() (s2builder.h:300-320): snap_radius plus the
        intersection tolerance; split_crossing_edges implies a tolerance
        of at least kIntersectionError, so that edges snap to the
        (slightly inexact) intersection sites created for crossings."""
        from .booleans import _INTERSECTION_ERROR

        itol = self.intersection_tolerance
        if self.split_crossing_edges:
            itol = max(itol, _INTERSECTION_ERROR)
        return self.snap.snap_radius + itol

    # ---- labels
    def set_label(self, label: int) -> None:
        self._labels = [label]

    def push_label(self, label: int) -> None:
        self._labels.append(label)

    def pop_label(self) -> None:
        self._labels.pop()

    def clear_labels(self) -> None:
        self._labels = []

    # ---- geometry
    def start_layer(self, layer) -> None:
        self._layer = layer
        self._layers.append(layer)
        self._layer_begins.append(len(self._edges))

    def force_vertex(self, p) -> None:
        """S2Builder::ForceVertex: p becomes a site unconditionally."""
        self._forced.append(np.asarray(p, float))

    def add_intersection(self, p) -> None:
        """S2Builder::AddIntersection (s2builder.h:560-580): the point
        becomes a site, and (with intersection_tolerance set) nearby
        edges snap to it just like split_crossing_edges intersections."""
        assert self.intersection_tolerance > 0.0 or self.split_crossing_edges
        self._intersections.append(np.asarray(p, float))

    def input_edge(self, input_edge_id: int):
        """S2Builder::input_edge accessor."""
        return self._edges[input_edge_id]

    def add_point(self, p) -> None:
        p = np.asarray(p, float)
        self._edges.append((p, p))
        self._edge_labels.append(tuple(self._labels))

    def add_edge(self, a, b) -> None:
        self._edges.append((np.asarray(a, float), np.asarray(b, float)))
        self._edge_labels.append(tuple(self._labels))

    def add_polyline(self, vertices: np.ndarray) -> None:
        v = np.asarray(vertices, float).reshape(-1, 3)
        for i in range(len(v) - 1):
            self.add_edge(v[i], v[i + 1])

    def add_loop(self, vertices: np.ndarray) -> None:
        v = np.asarray(vertices, float).reshape(-1, 3)
        for i in range(len(v)):
            self.add_edge(v[i], v[(i + 1) % len(v)])

    def add_polygon(self, loops: list[np.ndarray]) -> None:
        for lv in loops:
            self.add_loop(lv)

    def add_is_full_polygon_predicate(self, is_full) -> None:
        """Accepts the resolved bool or a zero-arg callable — the
        reference's IsFullPolygonPredicate is invoked only when a layer
        actually needs the empty-vs-full decision (Graph::IsFullPolygon,
        s2builder_graph.h), so callables are resolved lazily at the
        consumption sites (resolve_is_full)."""
        self._is_full = is_full

    def _snapping_not_needed(self, all_v) -> bool:
        """The idempotent short-circuit (s2builder.cc ChooseSites /
        snapping_needed_): when every input vertex is already at a snap
        site, sites satisfy min_vertex_separation, and every site is at
        least min_edge_vertex_separation from every non-incident edge,
        the input is a valid output of a previous snapping pass and is
        used verbatim.  Without this, re-snapping valid output can
        collapse it (a vertex within snap_radius of a non-incident edge
        splits that edge into a sibling pair)."""
        if not self.idempotent or self.split_crossing_edges:
            return False
        if self._intersections or self.intersection_tolerance > 0.0:
            # AddIntersection / a nonzero tolerance means edges must snap
            # to the (inexact) intersection sites (s2builder.h:560-580)
            return False
        if self._forced:
            # forced vertices void the idempotency guarantee: they may
            # sit within min_edge_vertex_separation of existing edges
            # BY DESIGN (s2builder.h ForceVertex)
            return False
        if self.snap.snap_radius == 0.0:
            return False
        if len(self._edges) > 10_000:
            return False  # fixture-scale check; large inputs just snap
        import numpy as _np

        from .distance import point_edge_dist2 as _ped

        if len(all_v) == 0:
            return True
        uniq = _np.unique(all_v.round(20), axis=0)
        uniq = _np.asarray(
            sorted({tuple(v) for v in all_v}), float
        ).reshape(-1, 3)
        snapped = self.snap.snap(uniq)
        if not _np.array_equal(snapped, uniq):
            return False
        min_sep = self.snap.min_vertex_separation()
        if len(uniq) > 1:
            d = uniq[:, None, :] - uniq[None, :, :]
            d2 = (d * d).sum(-1)
            _np.fill_diagonal(d2, _np.inf)
            s = 2 * math.sin(0.5 * min(math.pi, min_sep))
            if float(d2.min()) < s * s:
                return False
        try:
            min_ev = self.snap.min_edge_vertex_separation()
        except AttributeError:
            min_ev = 0.5 * self.snap.snap_radius
        s = 2 * math.sin(0.5 * min(math.pi, min_ev))
        lim2 = s * s
        for a, b in self._edges:
            if _np.all(a == b):
                continue
            d2 = _ped(uniq, a[None], b[None])[:, 0]
            close = d2 < lim2
            for i in _np.nonzero(close)[0]:
                v = uniq[i]
                if not (_np.array_equal(v, a) or _np.array_equal(v, b)):
                    return False
        return True

    # ---- build
    def build(self) -> str | None:
        """Build EVERY layer started since construction over ONE shared
        snap pass (S2Builder::Build → BuildLayers, s2builder.cc:1290-1360):
        vertices from all layers snap to a single site set, per-edge site
        chains use edge_snap_radius() (snap_radius + the intersection
        tolerance, s2builder.h:300-320), simplify_edge_chains runs the
        EdgeChainSimplifier over the merged multigraph (SimplifyEdgeChains,
        s2builder.cc:1516-1546), and each layer then assembles its own
        Graph under its GraphOptions.  Returns the first error (or None)."""
        assert self._layers
        begins = self._layer_begins + [len(self._edges)]

        verts = []
        for a, b in self._edges:
            verts.append(a)
            verts.append(b)
        extra: list[np.ndarray] = [
            np.asarray(p, float) for p in self._intersections
        ]
        if self.split_crossing_edges:
            extra += self._crossing_sites()
        all_v = (
            np.asarray(verts + extra).reshape(-1, 3)
            if (verts or extra)
            else np.zeros((0, 3))
        )
        sites, vmap = choose_sites(all_v, self.snap, forced=self._forced)
        snapping_not_needed = (
            self.snap.snap_radius == 0.0
            and not self.split_crossing_edges
            and not self._intersections
            and self.intersection_tolerance == 0.0
        ) or self._snapping_not_needed(all_v)
        r_edge = self._edge_snap_radius()
        if not snapping_not_needed and len(self._edges) <= 10_000:
            # AddExtraSites: separation sites + deviation splits keep
            # every site ≥ min_edge_vertex_separation from non-incident
            # snapped edges (s2builder.cc:888-1010); fixture-scale gate.
            # check_all_site_crossings (s2builder.cc:279-283): explicit
            # wrong-side-of-site checks when edges can snap further than
            # vertices (max_edge_deviation > edge_snap_radius + min_sep —
            # only with a nonzero intersection tolerance and a tiny
            # snap radius), and always for forced vertices.
            from .builder import max_edge_deviation, min_edge_vertex_separation

            check_all = max_edge_deviation(r_edge) > (
                r_edge + min_edge_vertex_separation(self.snap)
            ) and (self.intersection_tolerance > 0.0
                   or self.split_crossing_edges)
            sites = add_extra_sites(
                sites, [e for e in self._edges], self.snap,
                edge_snap_radius_rad=r_edge,
                forced_count=len(self._forced),
                check_all_site_crossings=check_all,
            )

        # ---- per-edge snapped site chains, tagged by layer ------------
        # merged[k] = ((site0, site1), layer, [input edge ids])
        merged: list[tuple[tuple[int, int], int, list[int]]] = []
        li = 0
        for iid, (a, b) in enumerate(self._edges):
            while li + 1 < len(begins) and iid >= begins[li + 1]:
                li += 1
            va, vb = int(vmap[2 * iid]), int(vmap[2 * iid + 1])
            if np.all(a == b):
                merged.append(((va, va), li, [iid]))
                continue
            if snapping_not_needed:
                # snapping not needed (s2builder.cc snapping_needed_): with
                # radius 0 edges map verbatim — an exactly-collinear vertex
                # does NOT split an edge unless split_crossing_edges is set
                merged.append(((va, vb), li, [iid]))
                continue
            chain = snap_edge_chain(a, b, sites, r_edge)
            if len(chain) <= 1:
                s = int(chain[0]) if chain else va
                merged.append(((s, s), li, [iid]))
            else:
                for k in range(len(chain) - 1):
                    merged.append(
                        ((int(chain[k]), int(chain[k + 1])), li, [iid])
                    )

        if self.simplify_edge_chains and merged:
            merged = self._simplify_merged(sites, merged, all_v, r_edge)

        # ---- per-layer graph assembly ----------------------------------
        first_error: str | None = None
        for layer_idx, layer in enumerate(self._layers):
            opts = layer.graph_options()
            undirected = opts.edge_type == UNDIRECTED
            lexicon = IdSetLexicon()
            label_sets: dict[int, tuple[int, ...]] = {}
            graph_edges: list[tuple[int, int]] = []
            input_ids: list[int] = []
            for (v0, v1), lyr, iids in merged:
                if lyr != layer_idx:
                    continue
                for iid in iids:
                    if self._edge_labels[iid]:
                        label_sets[iid] = self._edge_labels[iid]
                graph_edges.append((v0, v1))
                input_ids.append(lexicon.add(iids))
                if undirected:
                    # the reference adds the unlabeled reverse IMMEDIATELY
                    # after each forward edge (s2builder.cc AddEdge); this
                    # insertion order decides sibling pairing among
                    # duplicate edges (stable sort), which the walk
                    # assembler's used-marking depends on
                    graph_edges.append((v1, v0))
                    input_ids.append(IdSetLexicon.EMPTY_SET_ID)

            out_opts, out_edges, out_ids, error = process_edges(
                opts, graph_edges, input_ids, lexicon
            )
            if error:
                first_error = first_error or error
                continue
            order = sorted(
                range(len(out_edges)), key=lambda i: (out_edges[i], i)
            )
            g = Graph(
                out_opts,
                sites,
                [out_edges[i] for i in order],
                [out_ids[i] for i in order],
                lexicon,
                label_sets,
            )
            g.is_full_polygon = self._is_full
            err = layer.build(g)
            first_error = first_error or err
        return first_error

    def _simplify_merged(
        self,
        sites: np.ndarray,
        merged: list[tuple[tuple[int, int], int, list[int]]],
        all_v: np.ndarray,
        r_edge: float,
    ) -> list[tuple[tuple[int, int], int, list[int]]]:
        """SimplifyEdgeChains (s2builder.cc:1516-1546): merge all layers'
        snapped edges into one multigraph sorted lexicographically by
        (edge, input ids) (MergeLayerEdges), run the EdgeChainSimplifier,
        and return the simplified (edge, layer, input-ids) triples."""
        from .builder import (
            _angle2chord2,
            max_edge_deviation,
            min_edge_length_to_split_rad,
            min_edge_vertex_separation,
        )
        from .simplifier import EdgeChainSimplifier

        merged = sorted(merged, key=lambda t: (t[0], t[2]))
        edges = [t[0] for t in merged]
        layers = [t[1] for t in merged]
        input_ids = [t[2] for t in merged]

        edge_snap_r2 = _angle2chord2(r_edge)
        # site_vertices_ analog: input vertices snapped to each site
        site_inputs: dict[int, list[np.ndarray]] = {}
        if len(all_v) and len(sites):
            d2v = ((all_v[:, None, :] - sites[None, :, :]) ** 2).sum(-1)
            nearest = d2v.argmin(axis=1)
            for i, sid in enumerate(nearest.tolist()):
                if d2v[i, sid] <= edge_snap_r2 * (1 + 1e-9) + 1e-30:
                    site_inputs.setdefault(sid, []).append(all_v[i])
        # forced sites come FIRST in choose_sites, so their ids are 0..n-1
        forced_ids = set(range(len(self._forced)))
        sep = min_edge_vertex_separation(self.snap)
        simplifier = EdgeChainSimplifier(
            sites,
            edges,
            layers,
            input_ids,
            site_inputs,
            forced=forced_ids,
            edge_snap_r2=edge_snap_r2,
            min_sep_r2=_angle2chord2(sep),
            near_r2=_angle2chord2(
                max_edge_deviation(self.snap.snap_radius) + sep
            ),
            max_len2=_angle2chord2(
                min_edge_length_to_split_rad(self.snap.snap_radius)
            ),
        )
        new_edges, new_layers, new_input_ids = simplifier.run()
        return [
            ((int(e0), int(e1)), int(lyr), list(ids))
            for (e0, e1), lyr, ids in zip(new_edges, new_layers, new_input_ids)
        ]

    def _crossing_sites(self) -> list[np.ndarray]:
        """split_crossing_edges (s2builder.h:250-290): add the
        intersection point of every proper edge crossing as a site."""
        from .booleans import _intersection_point
        from .predicates import crossing_sign

        pts: list[np.ndarray] = []
        n = len(self._edges)
        for i in range(n):
            a, b = self._edges[i]
            if np.all(a == b):
                continue
            for j in range(i + 1, n):
                c, d = self._edges[j]
                if np.all(c == d):
                    continue
                if crossing_sign(a, b, c, d) > 0:
                    pts.append(_intersection_point(a, b, c, d))
        return pts


# ------------------------------------------------------------- validation
def polyline_validation_error(vertices: np.ndarray) -> str | None:
    """S2Polyline::FindValidationError (s2polyline.cc): unit vertices, no
    identical or antipodal adjacent pairs."""
    v = np.asarray(vertices, float).reshape(-1, 3)
    for i in range(len(v)):
        if abs(float((v[i] * v[i]).sum()) - 1.0) > 1e-10:
            return "NOT_UNIT_LENGTH"
    for i in range(len(v) - 1):
        if np.all(v[i] == v[i + 1]):
            return "DUPLICATE_VERTICES"
        if np.all(v[i] == -v[i + 1]):
            return "ANTIPODAL_VERTICES"
    return None


# ------------------------------------------------------------------ layers
class PolylineLayer:
    """S2PolylineLayer: assembles edges into ONE polyline via WALK
    (s2builderutil_s2polyline_layer.cc:74-115).  Output in
    self.polyline (M,3); labels in self.label_set_ids/lexicon when
    with_labels."""

    def __init__(self, edge_type: str = DIRECTED, validate: bool = False,
                 with_labels: bool = False):
        self.edge_type = edge_type
        self.validate = validate
        self.with_labels = with_labels
        self.polyline: np.ndarray | None = None
        self.label_set_ids: list[int] = []
        self.label_set_lexicon = IdSetLexicon()

    def graph_options(self) -> GraphOptions:
        return GraphOptions(self.edge_type, DISCARD, KEEP, KEEP)

    def build(self, g: Graph) -> str | None:
        if g.num_edges() == 0:
            self.polyline = np.zeros((0, 3))
            return None
        edge_polylines = g.get_polylines(WALK)
        if len(edge_polylines) != 1:
            return "BUILDER_EDGES_DO_NOT_FORM_POLYLINE"
        ep = edge_polylines[0]
        verts = [g.vertex(g.edge(ep[0])[0])]
        verts.extend(g.vertex(g.edge(e)[1]) for e in ep)
        if self.with_labels:
            fetcher = LabelFetcher(g, self.edge_type)
            for e in ep:
                self.label_set_ids.append(
                    self.label_set_lexicon.add(fetcher.fetch(e))
                )
        self.polyline = np.asarray(verts)
        if self.validate:
            return polyline_validation_error(self.polyline)
        return None


class LaxPolylineLayer:
    """LaxPolylineLayer (s2builderutil_lax_polyline_layer.cc:75-105):
    assembles edges into ONE lax polyline via WALK.  Identical to
    PolylineLayer except DegenerateEdges::KEEP (a lax polyline admits
    degenerate/duplicate vertices) and no validation pass."""

    def __init__(self, edge_type: str = DIRECTED, with_labels: bool = False):
        self.edge_type = edge_type
        self.with_labels = with_labels
        self.polyline: np.ndarray | None = None
        self.label_set_ids: list[int] = []
        self.label_set_lexicon = IdSetLexicon()

    def graph_options(self) -> GraphOptions:
        return GraphOptions(self.edge_type, KEEP, KEEP, KEEP)

    def build(self, g: Graph) -> str | None:
        if g.num_edges() == 0:
            self.polyline = np.zeros((0, 3))
            return None
        edge_polylines = g.get_polylines(WALK)
        if len(edge_polylines) != 1:
            return "BUILDER_EDGES_DO_NOT_FORM_POLYLINE"
        ep = edge_polylines[0]
        verts = [g.vertex(g.edge(ep[0])[0])]
        verts.extend(g.vertex(g.edge(e)[1]) for e in ep)
        if self.with_labels:
            fetcher = LabelFetcher(g, self.edge_type)
            for e in ep:
                self.label_set_ids.append(
                    self.label_set_lexicon.add(fetcher.fetch(e))
                )
        self.polyline = np.asarray(verts)
        return None


class PolylineVectorLayer:
    """S2PolylineVectorLayer (s2builderutil_s2polyline_vector_layer.cc):
    assembles edges into as few polylines as possible; options mirror
    the reference (polyline_type PATH|WALK, duplicate_edges,
    sibling_pairs, validate)."""

    def __init__(
        self,
        edge_type: str = DIRECTED,
        polyline_type: str = PATH,
        duplicate_edges: str = KEEP,
        sibling_pairs: str = KEEP,
        validate: bool = False,
        with_labels: bool = False,
    ):
        self.edge_type = edge_type
        self.polyline_type = polyline_type
        self.duplicate_edges = duplicate_edges
        self.sibling_pairs = sibling_pairs
        self.validate = validate
        self.with_labels = with_labels
        self.polylines: list[np.ndarray] = []
        self.label_set_ids: list[list[int]] = []
        self.label_set_lexicon = IdSetLexicon()

    def graph_options(self) -> GraphOptions:
        return GraphOptions(self.edge_type, DISCARD, self.duplicate_edges,
                            self.sibling_pairs)

    def build(self, g: Graph) -> str | None:
        error = None
        for ep in g.get_polylines(self.polyline_type):
            verts = [g.vertex(g.edge(ep[0])[0])]
            verts.extend(g.vertex(g.edge(e)[1]) for e in ep)
            pl = np.asarray(verts)
            if self.validate:
                error = polyline_validation_error(pl) or error
            self.polylines.append(pl)
            if self.with_labels:
                fetcher = LabelFetcher(g, self.edge_type)
                self.label_set_ids.append(
                    [self.label_set_lexicon.add(fetcher.fetch(e)) for e in ep]
                )
        return error


class PointVectorLayer:
    """S2PointVectorLayer (s2builderutil_s2point_vector_layer.cc):
    collects degenerate edges as points; non-degenerate edges are an
    error."""

    def __init__(self, duplicate_edges: str = "MERGE",
                 with_labels: bool = False):
        self.duplicate_edges = duplicate_edges
        self.with_labels = with_labels
        self.points: list[np.ndarray] = []
        self.label_set_ids: list[int] = []
        self.label_set_lexicon = IdSetLexicon()

    def graph_options(self) -> GraphOptions:
        return GraphOptions(DIRECTED, KEEP, self.duplicate_edges, KEEP)

    def build(self, g: Graph) -> str | None:
        error = None
        fetcher = LabelFetcher(g, DIRECTED)
        for e in range(g.num_edges()):
            v0, v1 = g.edge(e)
            if v0 != v1:
                error = "INVALID_ARGUMENT: Found non-degenerate edges"
                continue
            self.points.append(g.vertex(v0))
            if self.with_labels:
                self.label_set_ids.append(
                    self.label_set_lexicon.add(fetcher.fetch(e))
                )
        return error


class PolygonLayer:
    """S2PolygonLayer (s2builderutil_s2polygon_layer.cc:60-205): directed
    loops via the left-turn map (SIMPLE), undirected via complementary
    components (slot 0), each loop normalized to enclose at most half
    the sphere.  Output: self.loops (list of (N,3) vertex arrays, each
    CCW-normalized); per-loop per-edge labels in self.label_set_ids when
    with_labels.  validate maps reference error codes:
    LOOP_SELF_INTERSECTION / POLYGON_LOOPS_SHARE_EDGE /
    OVERLAPPING_GEOMETRY."""

    def __init__(self, edge_type: str = DIRECTED, validate: bool = False,
                 with_labels: bool = False):
        self.edge_type = edge_type
        self.validate = validate
        self.with_labels = with_labels
        self.loops: list[np.ndarray] = []
        self.is_full = False
        self.label_set_ids: list[list[int]] = []
        self.label_set_lexicon = IdSetLexicon()

    def graph_options(self) -> GraphOptions:
        # prevent degenerate edges and sibling pairs; keep duplicates for
        # more comprehensible validation errors (layer .cc:82-89)
        from .graph import DISCARD as _D

        return GraphOptions(self.edge_type, _D, KEEP, _D)

    def build(self, g: Graph) -> str | None:
        from .graph import (
            SIMPLE,
            get_directed_loops,
            get_undirected_components,
        )
        from .measures import loop_signed_area

        if g.num_edges() == 0:
            self.is_full = resolve_is_full(
                getattr(g, "is_full_polygon", False)
            )
            return None
        if g.options.edge_type == DIRECTED:
            edge_loops, error = get_directed_loops(g, SIMPLE)
            if error:
                return error
            loop_sets = [edge_loops]
        else:
            components, error = get_undirected_components(g, SIMPLE)
            if error:
                return error
            loop_sets = [c[0] for c in components]
        fetcher = LabelFetcher(g, self.edge_type) if self.with_labels else None
        raw: list[tuple[np.ndarray, list[int] | None]] = []
        for edge_loops in loop_sets:
            for ep in edge_loops:
                verts = np.asarray([g.vertex(g.edge(e)[0]) for e in ep])
                labels = (
                    [self.label_set_lexicon.add(fetcher.fetch(e)) for e in ep]
                    if fetcher
                    else None
                )
                raw.append((verts, labels))

        def invert(verts, labels):
            # S2Loop::Invert reverses all edges except the last, so
            # labels reverse the same way (layer .cc:140-146)
            verts = verts[::-1]
            if labels:
                labels = labels[-2::-1] + [labels[-1]]
            return verts, labels

        if g.options.edge_type == DIRECTED:
            # S2Polygon::InitOriented (s2polygon.cc:429-520): loop
            # orientation is MEANINGFUL (interior on the left).  Normalize
            # loops to make them nestable, then restore the polygon's
            # orientation by inverting one minimal-curvature top-level
            # shell when the origin-containment parity flipped.
            from .contains import Loop as _Loop
            from .measures import curvature_max_error, loop_curvature

            norm: list[tuple[np.ndarray, list[int] | None, bool]] = []
            for verts, labels in raw:
                orig_contains = _Loop(verts).origin_inside
                ang = loop_curvature(verts)
                if abs(ang) > curvature_max_error(verts):
                    flip = ang < 0
                else:
                    # near-zero curvature: ensure the loop does not
                    # contain the origin
                    flip = orig_contains
                if flip:
                    verts, labels = invert(verts, labels)
                norm.append((verts, labels, orig_contains))
            if norm:
                flags = [_Loop(v).origin_inside for v, _l, _o in norm]
                polygon_contains_origin = False
                origin_idx = 0
                for i, f in enumerate(flags):
                    if f:
                        polygon_contains_origin ^= True
                        origin_idx = i
                if norm[origin_idx][2] != polygon_contains_origin:
                    # Invert the polygon: complement one top-level shell
                    # with minimal curvature (S2Polygon::Invert semantics
                    # over the flat even-odd loop set)
                    loops_obj = [_Loop(v) for v, _l, _o in norm]
                    depths = [
                        sum(
                            1
                            for j, lj in enumerate(loops_obj)
                            if j != i
                            and bool(lj.contains(loops_obj[i].vertices[:1])[0])
                        )
                        for i in range(len(norm))
                    ]
                    shells = [i for i, d in enumerate(depths) if d == 0]
                    best = min(
                        shells, key=lambda i: loop_curvature(norm[i][0])
                    )
                    v, l, o = norm[best]
                    v, l = invert(v, l)
                    norm[best] = (v, l, o)
            raw = [(v, l) for v, l, _o in norm]
        else:
            # undirected: complement choice is arbitrary, so normalize
            # every loop to enclose at most half the sphere
            # (layer .cc:180-196)
            raw = [
                invert(verts, labels)
                if loop_signed_area(verts) < 0
                else (verts, labels)
                for verts, labels in raw
            ]

        for verts, labels in raw:
            self.loops.append(verts)
            if labels is not None:
                self.label_set_ids.append(labels)
        if self.validate:
            return self._validation_error()
        return None

    def _validation_error(self) -> str | None:
        from .contains import Loop, Polygon
        from .validation import find_loop_validation_error

        for lv in self.loops:
            if find_loop_validation_error(lv) is not None:
                return "LOOP_SELF_INTERSECTION"
        # duplicate edges shared between loops (undirected: either way)
        seen: set[tuple] = set()
        for lv in self.loops:
            for i in range(len(lv)):
                a = tuple(lv[i])
                b = tuple(lv[(i + 1) % len(lv)])
                if (a, b) in seen or (b, a) in seen:
                    return "POLYGON_LOOPS_SHARE_EDGE"
                seen.add((a, b))
        from .relations import _proper_crossing

        for i in range(len(self.loops)):
            for j in range(i + 1, len(self.loops)):
                a = Polygon([Loop(self.loops[i])])
                b = Polygon([Loop(self.loops[j])])
                if _proper_crossing(a, b):
                    return "OVERLAPPING_GEOMETRY"
        return None


class LaxPolygonLayer:
    """s2builderutil::LaxPolygonLayer
    (s2builderutil_lax_polygon_layer.cc:56-217): assembles a lax polygon
    (loops may be degenerate) from the builder graph, with the
    DegenerateBoundaries policy — DISCARD drops all degeneracies,
    DISCARD_HOLES / DISCARD_SHELLS classify each degenerate edge with
    FindPolygonDegeneracies and drop one kind, KEEP keeps everything.

    Output: self.loops (list of (N,3) arrays; the empty array is the
    full loop) and per-loop per-edge label set ids when with_labels."""

    DISCARD = "DISCARD"
    DISCARD_HOLES = "DISCARD_HOLES"
    DISCARD_SHELLS = "DISCARD_SHELLS"
    KEEP = "KEEP"

    def __init__(self, edge_type: str = DIRECTED,
                 degenerate_boundaries: str = "DISCARD",
                 with_labels: bool = False):
        self.edge_type = edge_type
        self.degenerate_boundaries = degenerate_boundaries
        self.with_labels = with_labels
        self.loops: list[np.ndarray] = []
        self.label_set_ids: list[list[int]] = []
        self.label_set_lexicon = IdSetLexicon()

    def graph_options(self) -> GraphOptions:
        from .graph import DISCARD as _D
        from .graph import DISCARD_EXCESS as _DE

        if self.degenerate_boundaries == self.DISCARD:
            return GraphOptions(self.edge_type, _D, KEEP, _D)
        # keep at most one copy of each sibling pair / isolated vertex
        return GraphOptions(self.edge_type, _DE, KEEP, _DE)

    def build(self, g: Graph) -> str | None:
        from .degeneracies import (
            find_polygon_degeneracies,
            is_fully_degenerate,
        )
        from .graph import get_directed_loops

        if g.options.edge_type != DIRECTED:
            return "UNIMPLEMENTED: undirected edges not supported yet"
        db = self.degenerate_boundaries
        # IsFullPolygonPredicateNotCalled contract (layer test .cc): the
        # predicate is consulted ONLY when the graph has no
        # non-degenerate loop, so resolve it lazily at each use site.
        raw_full = getattr(g, "is_full_polygon", False)

        def is_full() -> bool:
            return resolve_is_full(raw_full)

        loops: list[np.ndarray] = []
        if db == self.DISCARD:
            if g.num_edges() == 0 and is_full():
                loops.append(np.empty((0, 3)))
        elif db == self.KEEP:
            if is_fully_degenerate(g.edges) and is_full():
                loops.append(np.empty((0, 3)))
        else:
            discard_holes = db == self.DISCARD_HOLES
            degeneracies = find_polygon_degeneracies(
                g.vertices, g.edges,
                is_full() if is_fully_degenerate(g.edges) else False,
            )
            if len(degeneracies) == g.num_edges():
                if not degeneracies:
                    if is_full():
                        loops.append(np.empty((0, 3)))
                elif degeneracies[0][1]:  # is_hole
                    loops.append(np.empty((0, 3)))
            discard = sorted(
                e for e, is_hole in degeneracies if is_hole == discard_holes
            )
            if discard:
                dset = set(discard)
                new_edges = []
                new_ids = []
                for e in range(g.num_edges()):
                    if e in dset:
                        continue
                    new_edges.append(g.edges[e])
                    new_ids.append(g.input_id_set_ids[e])
                g = Graph(
                    g.options, g.vertices, new_edges, new_ids, g.lexicon,
                    g.label_sets,
                )
                g.is_full_polygon = raw_full
        edge_loops, error = get_directed_loops(g, "CIRCUIT")
        if error:
            return error
        fetcher = LabelFetcher(g, self.edge_type) if self.with_labels else None
        for ep in edge_loops:
            loops.append(np.asarray([g.vertex(g.edge(e)[0]) for e in ep]))
            if fetcher:
                self.label_set_ids.append(
                    [self.label_set_lexicon.add(fetcher.fetch(e)) for e in ep]
                )
            elif self.with_labels:
                self.label_set_ids.append([])
        self.loops = loops
        return None
