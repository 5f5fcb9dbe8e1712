"""GetSnappedWindingDelta (s2builderutil_get_snapped_winding_delta.h/.cc):
the change in winding number of a reference point caused by snapping —
the missing piece for computing winding numbers of arbitrary points
AFTER an S2Builder snapping pass (used by S2WindingOperation with
snapping).

Requirements mirror the reference (h:40-80): DIRECTED edges, degenerate
edges KEPT, sibling pairs KEEP/REQUIRE/CREATE, no simplify_edge_chains;
the input edges incident to the snapped reference vertex (after
filtering) must form loops.
"""

from __future__ import annotations

import numpy as np

from .clipping import robust_cross_prod
from .graph import Graph
from .predicates import ortho, signed_edge_or_vertex_crossing

K_ERROR = None  # errors are raised as ValueError


class _EdgeSnap:
    __slots__ = ("v0", "v1", "v_in", "v_out")

    def __init__(self):
        self.v0 = None
        self.v1 = None
        self.v_in = -1
        self.v_out = -1


def _edge_winding_delta(a, b, chain: list[np.ndarray]) -> int:
    """GetEdgeWindingDelta (cc:85-96): signed crossings of edge AB with
    a vertex chain."""
    delta = 0
    for i in range(1, len(chain)):
        delta += signed_edge_or_vertex_crossing(a, b, chain[i - 1], chain[i])
    return delta


def _get_connector(b0, b1, b1_snapped) -> np.ndarray:
    """GetConnector (cc:98-108): a proxy vertex on (b0, b1) within 90°
    of b1_snapped."""
    if float(np.dot(b1_snapped, b1)) >= 0:
        return b1
    x = np.cross(robust_cross_prod(b0, b1), b1_snapped)
    x = x / np.linalg.norm(x)
    mid = b0 + b1
    mid = mid / np.linalg.norm(mid)
    return x if float(np.dot(x, mid)) >= 0 else -x


def _build_chain(ref_v: int, g: Graph, input_vertex_edge_map: list):
    """BuildChain (cc:30-84): one input chain through the reference
    vertex's Voronoi region and its snapped image.  Mutates the map
    (a list of (v0_key, snap) pairs)."""
    chain_in: list[np.ndarray] = []
    chain_out: list[np.ndarray] = []
    pick = None
    for k, (key, snap) in enumerate(input_vertex_edge_map):
        if snap.v_in >= 0:
            chain_out.append(g.vertex(snap.v_in))
            pick = k
            break
    if pick is None:
        pick = 0
    _, snap = input_vertex_edge_map.pop(pick)
    chain_in.append(snap.v0)
    chain_in.append(snap.v1)
    chain_out.append(g.vertex(ref_v))
    if snap.v_out >= 0:
        chain_out.append(g.vertex(snap.v_out))
        return chain_in, chain_out
    while not np.array_equal(chain_in[-1], chain_in[0]):
        nxt = None
        for k, (key, s) in enumerate(input_vertex_edge_map):
            if key == tuple(chain_in[-1]):
                nxt = k
                break
        if nxt is None:
            raise ValueError(
                "Input edges (after filtering) do not form loops"
            )
        _, snap = input_vertex_edge_map.pop(nxt)
        chain_in.append(snap.v1)
        if snap.v_out >= 0:
            chain_out.append(g.vertex(snap.v_out))
            break
    return chain_in, chain_out


def get_incident_edges(ref_v: int, g: Graph) -> list[int]:
    return [
        e for e in range(g.num_edges())
        if g.edge(e)[0] == ref_v or g.edge(e)[1] == ref_v
    ]


def get_snapped_winding_delta(
    ref_in: np.ndarray,
    ref_v: int,
    builder,
    g: Graph,
    input_edge_filter=None,
    incident_edges: list[int] | None = None,
) -> int:
    """GetSnappedWindingDelta (cc:120-315)."""
    if incident_edges is None:
        incident_edges = get_incident_edges(ref_v, g)

    # group incident snapped edges by input edge id
    input_id_edge_map: dict[int, _EdgeSnap] = {}
    for e in incident_edges:
        v0, v1 = g.edge(e)
        for input_id in g.input_edge_ids(e):
            if input_edge_filter and input_edge_filter(input_id):
                continue
            snap = input_id_edge_map.setdefault(input_id, _EdgeSnap())
            a, b = builder.input_edge(input_id)
            snap.v0, snap.v1 = np.asarray(a, float), np.asarray(b, float)
            if v0 != ref_v:
                snap.v_in = v0
            if v1 != ref_v:
                snap.v_out = v1

    # regroup by the input edge's starting vertex
    input_vertex_edge_map = [
        (tuple(snap.v0), snap)
        for _, snap in sorted(input_id_edge_map.items())
    ]

    ref_out = g.vertex(ref_v)
    winding_delta = 0
    while input_vertex_edge_map:
        chain_in, chain_out = _build_chain(ref_v, g, input_vertex_edge_map)
        if len(chain_out) == 1:
            # closed input chain, fully collapsed onto ref_out
            z = ortho(ref_out)
            winding_delta += 0 - _edge_winding_delta(z, ref_in, chain_in)
        else:
            assert len(chain_out) == 3
            za = robust_cross_prod(chain_in[0], chain_in[1])
            za = za / np.linalg.norm(za)
            zb = robust_cross_prod(chain_in[-2], chain_in[-1])
            zb = zb / np.linalg.norm(zb)
            if float(np.dot(za, ref_out)) > 0:
                za = -za
            if float(np.dot(zb, ref_out)) > 0:
                zb = -zb
            a0_connector = _get_connector(
                chain_in[1], chain_in[0], chain_out[0]
            )
            b1_connector = _get_connector(
                chain_in[-2], chain_in[-1], chain_out[2]
            )
            chain_z = [chain_out[0], chain_out[1], chain_in[1], chain_in[0],
                       a0_connector, chain_out[0]]
            winding_delta += _edge_winding_delta(za, zb, chain_z)
            chain_diff = list(chain_out)
            chain_diff.append(b1_connector)
            chain_diff.extend(reversed(chain_in))
            chain_diff.append(a0_connector)
            chain_diff.append(chain_out[0])
            winding_delta += _edge_winding_delta(zb, ref_in, chain_diff)
            winding_delta += _edge_winding_delta(ref_in, ref_out, chain_out)
    return winding_delta


def find_first_vertex_id(input_edge_id: int, g: Graph) -> int:
    """FindFirstVertexId (cc:318-346): the output vertex the source of
    the given input edge snapped to."""
    excess: dict[int, int] = {}
    for e in range(g.num_edges()):
        if input_edge_id in g.input_edge_ids(e):
            v0, v1 = g.edge(e)
            excess[v0] = excess.get(v0, 0) + 1
            excess[v1] = excess.get(v1, 0) - 1
    if not excess:
        return -1
    for v in sorted(excess):
        if excess[v] == 1:
            return v
    assert len(excess) == 1
    return next(iter(excess))
