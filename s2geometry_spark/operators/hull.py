"""Convex hull on the sphere (S2ConvexHullQuery, s2convex_hull_query.h).

Per-group hulls via applyInPandas: the classic gnomonic-projection Graham
scan — project the group's points onto the tangent plane at their
centroid direction, scan in 2D, map the hull order back.  Valid whenever
the group fits in an open hemisphere around its centroid (the reference
solves the general case with a cap bound; hemispheric groups cover the
practical per-key hull workload).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _hull_indices(points: np.ndarray) -> list[int]:
    """Graham scan in the gnomonic plane; returns CCW hull indices."""
    c = points.mean(axis=0)
    n = np.linalg.norm(c)
    if n == 0:
        return list(range(min(len(points), 1)))
    c = c / n
    # tangent basis at c
    ref = np.array([0.0, 0.0, 1.0]) if abs(c[2]) < 0.9 else np.array([1.0, 0.0, 0.0])
    u = np.cross(c, ref)
    u /= np.linalg.norm(u)
    v = np.cross(c, u)
    w = points @ c
    w = np.where(w <= 1e-12, 1e-12, w)  # hemisphere guard
    px = (points @ u) / w
    py = (points @ v) / w
    pts2 = np.stack([px, py], -1)
    order = np.lexsort((pts2[:, 1], pts2[:, 0]))

    def cross(o, a, b):
        return (pts2[a, 0] - pts2[o, 0]) * (pts2[b, 1] - pts2[o, 1]) - (
            pts2[a, 1] - pts2[o, 1]
        ) * (pts2[b, 0] - pts2[o, 0])

    lower: list[int] = []
    for i in order:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], i) <= 0:
            lower.pop()
        lower.append(int(i))
    upper: list[int] = []
    for i in order[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], i) <= 0:
            upper.pop()
        upper.append(int(i))
    return lower[:-1] + upper[:-1]


def convex_hulls(points: DataFrame, group_col: str = "group_id") -> DataFrame:
    """(group_id, hull_idx, x, y, z, status) — per-group spherical convex
    hull via the exact S2ConvexHullQuery port (kernel/hull.py): valid for
    ANY point distribution, not just hemispheric groups.  status is
    'loop' for ordinary hulls; 'full'/'empty' groups emit one marker row
    with hull_idx = -1 (s2convex_hull_query.cc:117-146 semantics)."""

    def hull(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernel.hull import EMPTY, FULL, convex_hull_of_points

        pts = pdf[["x", "y", "z"]].to_numpy(np.float64)
        result = convex_hull_of_points(pts)
        if isinstance(result, str):
            return pd.DataFrame(
                {
                    group_col: [key[0]],
                    "hull_idx": [-1],
                    "x": [0.0],
                    "y": [0.0],
                    "z": [0.0],
                    "status": [FULL if result == FULL else EMPTY],
                }
            )
        return pd.DataFrame(
            {
                group_col: key[0],
                "hull_idx": range(len(result)),
                "x": result[:, 0],
                "y": result[:, 1],
                "z": result[:, 2],
                "status": "loop",
            }
        )

    return points.groupBy(group_col).applyInPandas(
        hull,
        f"{group_col} string, hull_idx int, x double, y double, z double,"
        " status string",
    )
