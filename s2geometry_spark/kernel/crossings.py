"""Crossing-edge-pair enumeration and polygon validity crossings
(s2shapeutil_visit_crossing_edge_pairs.cc).

  - get_crossing_edge_pairs: all pairs of edges (within one shape list
    or across two) with CrossingSign >= 0 (ALL) or > 0 (INTERIOR) —
    VisitCrossings/GetCrossingEdgePairs (:93-180)
  - find_self_intersection: S2Polygon validity semantics over loops —
    interior crossings, duplicate vertices within a loop, shared or
    reversed edges between loops, and vertex crossings via the
    double-wedge test (FindCrossingError :397-460)

Kernel scale is brute force over edge pairs, exactly like the reference
below its index cutovers; the distributed analog prunes candidates with
the covering cell join (operators/spatial_join.py) before the same
per-pair predicate.
"""

from __future__ import annotations

import numpy as np

from .closest_edge import Shape
from .looprel import WEDGE_PROPERLY_OVERLAPS, get_wedge_relation
from .predicates import crossing_sign


def get_crossing_edge_pairs(
    shapes: list[Shape],
    interior_only: bool = False,
    other: list[Shape] | None = None,
) -> list[tuple[tuple[int, int], tuple[int, int]]]:
    """All crossing edge pairs, as ((shape_id, edge_id), ...) tuples.

    One shape list: unordered pairs over all its edges.  With `other`:
    pairs (edge of shapes, edge of other).  INTERIOR keeps proper
    crossings (sign > 0); ALL also keeps shared-vertex pairs (sign 0)."""
    def edges_of(ss):
        out = []
        for s in ss:
            for e in range(len(s.edges_c)):
                out.append((s.shape_id, e, s.edges_c[e], s.edges_d[e]))
        return out

    ea = edges_of(shapes)
    pairs = []
    if other is None:
        for i in range(len(ea)):
            for j in range(i + 1, len(ea)):
                s = crossing_sign(ea[i][2], ea[i][3], ea[j][2], ea[j][3])
                if s > 0 or (s == 0 and not interior_only):
                    pairs.append(((ea[i][0], ea[i][1]), (ea[j][0], ea[j][1])))
    else:
        eb = edges_of(other)
        for i in range(len(ea)):
            for j in range(len(eb)):
                s = crossing_sign(ea[i][2], ea[i][3], eb[j][2], eb[j][3])
                if s > 0 or (s == 0 and not interior_only):
                    pairs.append(((ea[i][0], ea[i][1]), (eb[j][0], eb[j][1])))
    return pairs


def find_self_intersection(loops: list[np.ndarray]) -> bool:
    """True if any loop self-intersects or any two loops cross — the
    S2Polygon::FindValidationError crossing semantics
    (FindCrossingError, s2shapeutil_visit_crossing_edge_pairs.cc:397-460):

      - a proper interior crossing between any two edges;
      - a duplicate vertex within one loop (two chain edges ending at
        the same vertex);
      - a shared or reversed edge between two loops;
      - a vertex crossing where each wedge properly overlaps both the
        other wedge and its complement.

    Edge pairs adjacent within the flattened chain order (a.v1 == b.v0)
    are skipped, as in VisitCrossings with need_adjacent=false."""
    loops = [np.asarray(l, float).reshape(-1, 3) for l in loops]
    # flatten: (chain_id, offset, v0, v1)
    edges = []
    for ci, v in enumerate(loops):
        n = len(v)
        for i in range(n):
            edges.append((ci, i, v[i], v[(i + 1) % n]))

    def next_v1(ci, offset):
        n = len(loops[ci])
        nxt = (offset + 1) % n
        return loops[ci][(nxt + 1) % n]

    for i in range(len(edges)):
        ai, ao, a0, a1 = edges[i]
        for j in range(i + 1, len(edges)):
            bi, bo, b0, b1 = edges[j]
            if np.array_equal(a1, b0):
                continue  # adjacent chain edges (AB, BC)
            s = crossing_sign(a0, a1, b0, b1)
            if s > 0:
                return True  # edges cross
            if s < 0:
                continue
            # shared vertex: only check pairs with the same END vertex
            if not np.array_equal(a1, b1):
                continue
            if ai == bi:
                return True  # duplicate vertex within one loop
            a2 = next_v1(ai, ao)
            b2 = next_v1(bi, bo)
            if np.array_equal(a0, b0) or np.array_equal(a0, b2):
                return True  # loops share (or reverse-share) an edge
            if (
                get_wedge_relation(a0, a1, a2, b0, b2)
                == WEDGE_PROPERLY_OVERLAPS
                and get_wedge_relation(a0, a1, a2, b2, b0)
                == WEDGE_PROPERLY_OVERLAPS
            ):
                return True  # vertex crossing
    return False
