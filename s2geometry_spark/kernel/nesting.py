"""S2ShapeNestingQuery — shell/hole classification of a shape's chains.

Port (semantics, re-derived in NumPy):
  - ClosestOfNPoints                    s2shape_nesting_query.cc:43-65
  - ComputeShapeNesting                 s2shape_nesting_query.cc:97-288
      * datum-relative seeding via OrderedCCW interior checks
      * crossing-parity toggles along one segment per chain
        (CrossingType::INTERIOR == proper crossings only)
      * single-parent transitive reduction with the reference's
        re-visit backup semantics
      * even/odd depth rule: even-depth chains detach into shells

ChainRelation surface (s2shape_nesting_query.h:108-160): parent_id
(−1 = shell), holes (ascending chain ids).  As in the reference, the
even/odd detach step clears a chain's parent but does NOT remove it
from the old parent's hole list (ClearParent never touches holes_) —
hole lists are only meaningful for shells, which can only hold
odd-depth children, so the asymmetry is unobservable through the
documented API and we keep it bit-faithful.

The query supports 2D geometry without degeneracies (chains of length
≥ 3, no degenerate edges) — the reference's own restriction
(s2shape_nesting_query.h:73-76).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .predicates import ordered_ccw
from .parity import paths_cross_edges

__all__ = ["ChainRelation", "shape_nesting"]


@dataclass
class ChainRelation:
    parent_id: int = -1
    holes: list[int] = field(default_factory=list)

    @property
    def is_shell(self) -> bool:
        return self.parent_id < 0

    @property
    def is_hole(self) -> bool:
        return not self.is_shell


def _closest_of_n_points(
    target: np.ndarray, chain: np.ndarray, num_points: int
) -> int:
    """ClosestOfNPoints (s2shape_nesting_query.cc:43-65): among
    num_points equally spaced chain vertices, the index closest to
    target (squared chordal distance, first minimum wins)."""
    n = len(chain)
    step = max(1, n // num_points)
    idx = (np.arange(num_points) * step) % n
    d2 = ((chain[idx] - target) ** 2).sum(axis=1)
    return int(idx[int(np.argmin(d2))])


def shape_nesting(
    chains: list[np.ndarray], datum: int = 0
) -> list[ChainRelation]:
    """ComputeShapeNesting (s2shape_nesting_query.cc:97-288) for one
    shape given its chains as (n_i, 3) vertex arrays.  `datum` is the
    S2DatumStrategy result (default FIRST_CHAIN = 0)."""
    num_chains = len(chains)
    if num_chains == 0:
        return []
    if num_chains == 1:
        return [ChainRelation()]
    chains = [np.asarray(c, np.float64).reshape(-1, 3) for c in chains]
    for c in chains:
        if len(c) < 3:
            raise ValueError("degenerate chains are not supported")

    parents = np.zeros((num_chains, num_chains), dtype=bool)
    children = np.zeros((num_chains, num_chains), dtype=bool)

    dv = chains[datum]
    vertices = dv[:3]
    start_point = vertices[1]

    # All edges of the shape, tagged by owning chain, for the crossing
    # sweep (S2CrossingEdgeQuery restricted to this shape).
    all_c = np.concatenate(chains)
    all_d = np.concatenate([np.roll(c, -1, axis=0) for c in chains])
    owner = np.concatenate(
        [np.full(len(c), i, dtype=np.int64) for i, c in enumerate(chains)]
    )

    for chain in range(num_chains):
        if chain == datum:
            continue
        cv = chains[chain]
        end_idx = _closest_of_n_points(start_point, cv, 4)
        end_point = cv[end_idx]
        start_end_same = bool(np.all(end_point == start_point))

        nxt = cv[(end_idx + 1) % len(cv)]
        prev = cv[end_idx - 1]

        # Segment starts into the datum shell's interior?
        safe_end = prev if start_end_same else end_point
        if ordered_ccw(vertices[2], safe_end, vertices[0], start_point):
            parents[chain, datum] = True
            children[datum, chain] = True

        # Segment arrives from the target chain's interior?
        safe_start = vertices[0] if start_end_same else start_point
        if ordered_ccw(nxt, safe_start, prev, end_point):
            parents[chain, chain] = True

        if not start_end_same:
            # Proper (INTERIOR) crossings of the segment against every
            # edge of the shape toggle the corresponding chain bits.
            hits = paths_cross_edges(
                start_point[None], end_point[None], all_c, all_d,
                mode="proper",
            )[0].astype(bool)
            for other in owner[hits]:
                parents[chain, other] ^= True
                if other != chain:
                    children[other, chain] ^= True

        parents[chain, datum] = parents[chain, datum] and parents[chain, chain]
        parents[chain, chain] = False

    # Transitive reduction: a chain with exactly one parent removes that
    # parent from its own children, re-visiting any child this collapses
    # to a single parent (s2shape_nesting_query.cc:222-256).
    current_chain = 0
    while current_chain < num_chains:
        if parents[current_chain].sum() != 1:
            current_chain += 1
            continue
        parent_chain = int(np.argmax(parents[current_chain]))
        next_chain = current_chain
        for child in np.nonzero(children[current_chain])[0]:
            if parents[child, parent_chain]:
                parents[child, parent_chain] = False
                if parents[child].sum() == 1 and child < next_chain:
                    next_chain = int(child)
        if next_chain != current_chain:
            current_chain = next_chain
        else:
            current_chain += 1

    relations = [ChainRelation() for _ in range(num_chains)]
    for chain in range(num_chains):
        row = np.nonzero(parents[chain])[0]
        assert len(row) <= 1
        if len(row):
            relations[chain].parent_id = int(row[0])
            relations[int(row[0])].holes.append(chain)

    # Even/odd rule: detach even-depth chains into shells.  Depth is
    # computed and the parent cleared inside ONE sequential loop, as in
    # the reference (s2shape_nesting_query.cc:272-286) — an earlier
    # chain's detach shortens the ancestor path of later chains.
    for chain in range(num_chains):
        depth, current = -1, chain
        while True:
            depth += 1
            current = relations[current].parent_id
            if current < 0 or depth >= num_chains:
                break
        if depth and depth % 2 == 0:
            relations[chain].parent_id = -1
    return relations
