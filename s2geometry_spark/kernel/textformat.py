"""Safe (non-aborting) s2textformat parsers.

The reference exposes two parsing surfaces: MakeXOrDie (crashes on bad
input; our parse_* helpers raise instead) and bool-returning Make*/
Parse* overloads that report failure (s2text_format.h:107-260).  This
module is the safe surface: every function returns None on invalid
input instead of raising.

Validity mirrors the reference: coordinates must parse as finite
numbers with |lat| <= 90 (S2LatLng::is_valid); debug-string cell ids
need a face in [0,5], child digits in [0,3], and at most 30 levels;
cell-union tokens are comma-separated single ids.
"""

from __future__ import annotations

import math

import numpy as np

from .cid import CID, MAX_LEVEL


def safe_parse_latlngs(s: str):
    """ParseLatLngs: 'lat:lng, ...' → [(lat_deg, lng_deg)] or None."""
    out = []
    s = s.strip()
    if not s:
        return out
    for tok in s.split(","):
        parts = tok.split(":")
        if len(parts) != 2:
            return None
        try:
            lat = float(parts[0])
            lng = float(parts[1])
        except ValueError:
            return None
        if not (math.isfinite(lat) and math.isfinite(lng)):
            return None
        if abs(lat) > 90.0:
            return None
        out.append((lat, lng))
    return out


def safe_parse_points(s: str):
    """ParsePoints → (N, 3) unit vectors or None."""
    lls = safe_parse_latlngs(s)
    if lls is None:
        return None
    from .coords import latlng_to_xyz

    if not lls:
        return np.zeros((0, 3))
    lat = np.array([a for a, _ in lls])
    lng = np.array([b for _, b in lls])
    x, y, z = latlng_to_xyz(lat, lng)
    return np.stack([x, y, z], axis=-1)


def safe_make_latlng(s: str):
    """MakeLatLng → (lat_deg, lng_deg) or None."""
    lls = safe_parse_latlngs(s)
    if not lls or len(lls) != 1:
        return None
    return lls[0]


def safe_make_latlng_rect(s: str):
    """MakeLatLngRect: 'lo, hi' → LatLngRect or None."""
    lls = safe_parse_latlngs(s)
    if not lls or len(lls) != 2:
        return None
    from .region import LatLng, LatLngRect

    return LatLngRect.from_point_pair(
        LatLng.from_degrees(*lls[0]), LatLng.from_degrees(*lls[1])
    )


def safe_make_cellid(s: str):
    """MakeCellId from a debug string 'face/digits' → CID or None."""
    parts = s.split("/")
    if len(parts) != 2:
        return None
    if parts[0] not in "012345" or len(parts[0]) != 1:
        return None
    digits = parts[1]
    if len(digits) > MAX_LEVEL:
        return None
    cid = CID.from_face(int(parts[0]))
    for ch in digits:
        if ch not in "0123":
            return None
        cid = cid.child(int(ch))
    return cid


def safe_make_cell_union(s: str):
    """MakeCellUnion: comma-separated debug strings → [CID] or None."""
    out = []
    s = s.strip()
    if not s:
        return out
    for tok in s.split(","):
        cid = safe_make_cellid(tok.strip())
        if cid is None or " " in tok.strip():
            return None
        out.append(cid)
    return out


def safe_make_loop(s: str):
    """MakeLoop → vertex array (or the 'full'/'empty' sentinels) or
    None."""
    s = s.strip()
    if s in ("full", "empty"):
        return s
    v = safe_parse_points(s)
    if v is None or len(v) == 0:
        return None
    return v


def safe_make_polyline(s: str):
    v = safe_parse_points(s)
    if v is None:
        return None
    return v


safe_make_lax_polyline = safe_make_polyline


def safe_make_polygon(s: str, normalize: bool = True):
    """MakePolygon → Polygon or None; loops separated by ';'.
    An empty string or 'empty' is the empty polygon; 'full' the full
    polygon (s2text_format.cc MakePolygon)."""
    from .contains import Polygon, parse_loop

    loops = []
    for tok in s.split(";"):
        tok = tok.strip()
        if not tok or tok == "empty":
            continue
        if tok == "full":
            loops.append(parse_loop("full"))
            continue
        v = safe_parse_points(tok)
        if v is None or len(v) == 0:
            return None
        loops.append(parse_loop(tok))
    return Polygon(loops)


def safe_make_verbatim_polygon(s: str):
    return safe_make_polygon(s, normalize=False)


def safe_make_lax_polygon(s: str):
    """MakeLaxPolygon → list of vertex arrays (loops; [] = full loop)
    or None."""
    loops = []
    for tok in s.split(";"):
        tok = tok.strip()
        if not tok or tok == "empty":
            continue
        if tok == "full":
            loops.append(np.zeros((0, 3)))
            continue
        v = safe_parse_points(tok)
        if v is None:
            return None
        loops.append(v)
    return loops


def safe_make_index(s: str):
    """MakeIndex → closest_edge.Shape list or None."""
    sections = s.split("#")
    if len(sections) != 3:
        return None
    for i, sec in enumerate(sections):
        for tok in sec.split("|"):
            tok = tok.strip()
            if not tok:
                continue
            if i == 2 and tok in ("full", "empty"):
                continue
            probe = tok if i != 2 else tok.replace(";", ",")
            if safe_parse_points(probe) is None:
                return None
    from .closest_edge import parse_index

    return parse_index(s)
