"""S2EdgeTessellator analog (s2edge_tessellator.cc): subdivide geodesic
edges so their projected image approximates the geodesic within a
tolerance, and vice versa (projected straight lines → geodesic chains).

Recursive-bisection formulation: split an edge while the projected
midpoint of the endpoints deviates from the projection of the geodesic
midpoint by more than the tolerance.  Used for raster↔vector rendering
of cell/polygon boundaries in Plate Carrée / Mercator space.
"""

from __future__ import annotations

import math

import numpy as np

from .coords import latlng_to_xyz, xyz_to_latlng


def _slerp(a: np.ndarray, b: np.ndarray, t: float) -> np.ndarray:
    omega = math.atan2(float(np.linalg.norm(np.cross(a, b))), float(a @ b))
    if omega == 0:
        return a
    sa = math.sin((1 - t) * omega) / math.sin(omega)
    sb = math.sin(t * omega) / math.sin(omega)
    out = sa * a + sb * b
    return out / np.linalg.norm(out)


def tessellate_geodesic(
    a: np.ndarray,
    b: np.ndarray,
    project,
    tolerance: float,
    max_depth: int = 20,
) -> list[tuple[float, float]]:
    """Projected vertex chain (including both endpoints) approximating
    the geodesic AB in the projection `project(lat_deg, lng_deg) → (x, y)`
    to within `tolerance` in projected units."""

    def proj(p):
        lat, lng = xyz_to_latlng(
            np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
        )
        x, y = project(lat, lng)
        return float(x[0]), float(y[0])

    out = [proj(a)]

    def recurse(p, q, pp, pq, depth):
        mid_geo = _slerp(p, q, 0.5)
        pm = proj(mid_geo)
        lin = ((pp[0] + pq[0]) / 2, (pp[1] + pq[1]) / 2)
        err = math.hypot(pm[0] - lin[0], pm[1] - lin[1])
        if err <= tolerance or depth >= max_depth:
            out.append(pq)
        else:
            recurse(p, mid_geo, pp, pm, depth + 1)
            recurse(mid_geo, q, pm, pq, depth + 1)

    recurse(np.asarray(a, float), np.asarray(b, float), out[0], proj(b), 0)
    return out
