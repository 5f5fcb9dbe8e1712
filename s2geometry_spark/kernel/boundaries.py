"""BuildPolygonBoundaries — group non-crossing loops into polygons.

Port of s2shapeutil::BuildPolygonBoundaries
(s2shapeutil_build_polygon_boundaries.cc:38-127): the input is a set of
connected components, each a subdivision of the sphere (one loop facing
"outward" plus the loops facing each enclosed region); the output groups
loops into polygons whose interiors do not intersect.

Algorithm (identical to the reference, re-expressed over this repo's
Loop containment):
  1. Index every loop that does NOT contain the point at infinity
     (S2::Origin — our Loop.origin_inside is exactly that bit), leaving
     one "outer" loop per component.
  2. Each component's depth = number of indexed loops containing its
     outer loop's first vertex (SEMI_OPEN containment, as
     S2ContainsPointQuery's default).
  3. Assign each outer loop to the containing indexed loop whose
     component depth is one less; depth-0 outer loops form the final
     face together.

Loops are identified by (component_idx, loop_idx) pairs in the result.
"""

from __future__ import annotations

import numpy as np

from .contains import Loop

__all__ = ["build_polygon_boundaries"]


def build_polygon_boundaries(
    components: list[list[Loop]],
) -> list[list[tuple[int, int]]]:
    """Returns one face per indexed loop (its children outer loops plus
    itself, in input order) plus one final face holding the depth-0
    outer loops — the reference's output layout
    (s2shapeutil_build_polygon_boundaries.cc:113-124)."""
    if not components:
        return []

    indexed: list[tuple[int, int, Loop]] = []
    comp_of_indexed: list[int] = []
    outer: list[tuple[int, int, Loop]] = []
    for i, comp in enumerate(components):
        for j, loop in enumerate(comp):
            if len(comp) > 1 and not loop.origin_inside:
                indexed.append((i, j, loop))
                comp_of_indexed.append(i)
            else:
                outer.append((i, j, loop))
        if len(outer) != i + 1:
            raise ValueError(f"component {i} is not a subdivision")

    # Depth of each component: indexed loops containing the outer
    # loop's first vertex.
    ancestors: list[list[int]] = []
    for _ci, _cj, loop in outer:
        p = loop.vertices[0][None]
        ancestors.append(
            [k for k, (_, _, il) in enumerate(indexed) if bool(il.contains(p)[0])]
        )

    children: dict[int, list[tuple[int, int]]] = {}
    for i, (ci, cj, _loop) in enumerate(outer):
        ancestor_id = -1
        depth = len(ancestors[i])
        if depth > 0:
            for cand in ancestors[i]:
                if len(ancestors[comp_of_indexed[cand]]) == depth - 1:
                    if ancestor_id != -1:
                        raise ValueError("ambiguous parent — not a subdivision")
                    ancestor_id = cand
            if ancestor_id < 0:
                raise ValueError("no parent at depth-1 — not a subdivision")
        children.setdefault(ancestor_id, []).append((ci, cj))

    faces: list[list[tuple[int, int]]] = []
    for k, (ci, cj, _loop) in enumerate(indexed):
        face = list(children.get(k, []))
        face.append((ci, cj))
        faces.append(face)
    faces.append(children.get(-1, []))
    return faces
