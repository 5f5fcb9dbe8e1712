"""S2HausdorffDistanceQuery (s2hausdorff_distance_query.h/.cc): directed
and undirected Hausdorff distance between two shape indexes,
approximated exactly as the reference does — closest-point distances
from the VERTICES of the target index to the EDGES (and optionally
interiors) of the source index.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from .closest_edge import Shape, find_closest_edges

INF2 = math.inf


@dataclass
class DirectedResult:
    """S2HausdorffDistanceQuery::DirectedResult: the achieved distance
    (squared chord) and the target point where it is achieved."""

    distance2: float
    target_point: np.ndarray

    def distance_rad(self) -> float:
        return 2.0 * math.asin(0.5 * math.sqrt(min(self.distance2, 4.0)))


@dataclass
class Result:
    """Result = max of the two directed results (h.target_to_source /
    source_to_target accessors)."""

    target_to_source: DirectedResult
    source_to_target: DirectedResult

    @property
    def distance2(self) -> float:
        return max(
            self.target_to_source.distance2, self.source_to_target.distance2
        )

    def distance_rad(self) -> float:
        return 2.0 * math.asin(0.5 * math.sqrt(min(self.distance2, 4.0)))


def _target_vertices(shapes: list[Shape]) -> np.ndarray:
    """All vertices of the target index (chain vertices; degenerate
    point-shape edges contribute their point once)."""
    vs = []
    for s in shapes:
        if s.dim == 0:
            vs.append(s.edges_c)
        elif len(s.edges_c):
            vs.append(s.edges_c)
            vs.append(s.edges_d)
    if not vs:
        return np.empty((0, 3))
    return np.concatenate(vs)


class HausdorffDistanceQuery:
    """cc:61-180.  include_interiors defaults to True like the
    reference's Options."""

    def __init__(self, include_interiors: bool = True):
        self.include_interiors = include_interiors

    def get_directed_result(
        self, target: list[Shape], source: list[Shape]
    ) -> DirectedResult | None:
        """GetDirectedResult (cc:101-128): max over target vertices of
        the closest-edge distance to the source; None when the target
        has no vertices (empty or full geometry)."""
        verts = _target_vertices(target)
        if len(verts) == 0:
            return None
        results = find_closest_edges(
            source, verts, k=1, include_interiors=self.include_interiors
        )
        max_d2 = -1.0
        max_point = None
        for v, res in zip(verts, results):
            if not res:
                continue  # empty source: no closest edge
            d2 = res[0][2]
            if d2 > max_d2:
                max_d2 = d2
                max_point = v
        if max_point is None:
            return None
        return DirectedResult(max_d2, max_point)

    def get_directed_distance2(
        self, target: list[Shape], source: list[Shape]
    ) -> float:
        r = self.get_directed_result(target, source)
        return r.distance2 if r is not None else INF2

    def get_result(
        self, target: list[Shape], source: list[Shape]
    ) -> Result | None:
        """GetResult (cc:77-91): both directions must exist."""
        t2s = self.get_directed_result(target, source)
        if t2s is None:
            return None
        s2t = self.get_directed_result(source, target)
        if s2t is None:
            return None
        return Result(t2s, s2t)

    def get_distance2(self, target: list[Shape], source: list[Shape]) -> float:
        r = self.get_result(target, source)
        return r.distance2 if r is not None else INF2

    def is_directed_distance_less(
        self, target: list[Shape], source: list[Shape], limit2: float
    ) -> bool:
        """IsDirectedDistanceLess (cc:130-157): inclusive comparison;
        false when the target has no vertices."""
        d2 = self.get_directed_distance2(target, source)
        if d2 == INF2:
            return False
        return d2 <= limit2

    def is_distance_less(
        self, target: list[Shape], source: list[Shape], limit2: float
    ) -> bool:
        """IsDistanceLess (cc:159-164): both directions."""
        return self.is_directed_distance_less(
            target, source, limit2
        ) and self.is_directed_distance_less(source, target, limit2)
