"""Fixtures for the geo_encode_vectors contract query.

Each fixture is (vec_id, kind, elements, ref_bytes) where ref_bytes is
the REFERENCE's own expected encoded size from its test suites
(encoded_s2cell_id_vector_test.cc, encoded_s2point_vector_test.cc,
encoded_string_vector_test.cc, encoded_uint_vector_test.cc) — the
distributed job and the DuckDB oracle must both reproduce it exactly.
"""

from __future__ import annotations

import numpy as np

_MASK64 = (1 << 64) - 1
SENTINEL = _MASK64

# encoded_s2cell_id_vector_test.cc:217-252 (CoveringCells, 488 bytes)
COVERING_CELLS = [
    0x414A617F00000000, 0x414A61C000000000, 0x414A624000000000,
    0x414A63C000000000, 0x414A647000000000, 0x414A64C000000000,
    0x414A653000000000, 0x414A704000000000, 0x414A70C000000000,
    0x414A714000000000, 0x414A71B000000000, 0x414A7A7C00000000,
    0x414A7AC000000000, 0x414A8A4000000000, 0x414A8BC000000000,
    0x414A8C4000000000, 0x414A8D7000000000, 0x414A8DC000000000,
    0x414A914000000000, 0x414A91C000000000, 0x414A924000000000,
    0x414A942C00000000, 0x414A95C000000000, 0x414A96C000000000,
    0x414AB0C000000000, 0x414AB14000000000, 0x414AB34000000000,
    0x414AB3C000000000, 0x414AB44000000000, 0x414AB4C000000000,
    0x414AB6C000000000, 0x414AB74000000000, 0x414AB8C000000000,
    0x414AB94000000000, 0x414ABA1000000000, 0x414ABA3000000000,
    0x414ABBC000000000, 0x414ABE4000000000, 0x414ABEC000000000,
    0x414ABF4000000000, 0x46B5454000000000, 0x46B545C000000000,
    0x46B5464000000000, 0x46B547C000000000, 0x46B5487000000000,
    0x46B548C000000000, 0x46B5494000000000, 0x46B54A5400000000,
    0x46B54AC000000000, 0x46B54B4000000000, 0x46B54BC000000000,
    0x46B54C7000000000, 0x46B54C8004000000, 0x46B54EC000000000,
    0x46B55AD400000000, 0x46B55B4000000000, 0x46B55BC000000000,
    0x46B55C4000000000, 0x46B55C8100000000, 0x46B55DC000000000,
    0x46B55E4000000000, 0x46B5604000000000, 0x46B560C000000000,
    0x46B561C000000000, 0x46CA424000000000, 0x46CA42C000000000,
    0x46CA43C000000000, 0x46CA444000000000, 0x46CA45C000000000,
    0x46CA467000000000, 0x46CA469000000000, 0x46CA5FC000000000,
    0x46CA604000000000, 0x46CA60C000000000, 0x46CA674000000000,
    0x46CA679000000000, 0x46CA67F000000000, 0x46CA684000000000,
    0x46CA855000000000, 0x46CA8C4000000000, 0x46CA8CC000000000,
    0x46CA8E5400000000, 0x46CA8EC000000000, 0x46CA8F0100000000,
    0x46CA8FC000000000, 0x46CA900400000000, 0x46CA98C000000000,
    0x46CA994000000000, 0x46CA99C000000000, 0x46CA9A4000000000,
    0x46CA9AC000000000, 0x46CA9BD500000000, 0x46CA9E4000000000,
    0x46CA9EC000000000, 0x46CAF34000000000, 0x46CAF4C000000000,
    0x46CAF54000000000,
]


def _cid(s: str) -> int:
    from ..kernel import cellid as K

    return int(K.from_debug_string(s)[0])


def _cell_point(raw_id: int) -> tuple[float, float, float]:
    from ..kernel import cellid as K

    x, y, z = K.to_point(np.asarray([raw_id], dtype=np.uint64))
    return float(x[0]), float(y[0]), float(z[0])


def _norm(v) -> tuple[float, float, float]:
    v = np.asarray(v, dtype=np.float64)
    v = v / np.sqrt((v * v).sum())
    return float(v[0]), float(v[1]), float(v[2])


def _norm_ref(v):
    """Vector3::Normalize: reciprocal multiply (util/math/vector.h:191)."""
    import math

    v = np.asarray(v, dtype=np.float64)
    return v * (1.0 / math.sqrt(float((v * v).sum())))


def _regular_loop(center, radius_deg: float, n: int) -> np.ndarray:
    """S2Loop::MakeRegularLoop (s2loop.cc:1466-1491), bit-faithful."""
    import math

    from ..kernel.polyline import _get_frame

    frame = _get_frame(_norm_ref(center))
    radius = math.radians(radius_deg)
    r, z = math.sin(radius), math.cos(radius)
    step = 2 * math.pi / n
    return np.asarray([
        _norm_ref(frame @ np.array(
            [r * math.cos(i * step), r * math.sin(i * step), z]))
        for i in range(n)
    ])


def _latlng_pts(spec: str) -> list[tuple[float, float, float]]:
    from ..kernel import coords as C

    out = []
    for tok in spec.split(","):
        lat, lng = (float(x) for x in tok.strip().split(":"))
        x, y, z = C.latlng_to_xyz(np.array([lat]), np.array([lng]))
        out.append((float(x[0]), float(y[0]), float(z[0])))
    return out


def shape_index_fixtures():
    """(index_id, shapes, ref_bytes_or_None, ref_hex_or_None) — shapes
    are (kind, chains) tuples; ref values come from
    encoded_s2shape_index_test.cc where the reference publishes them."""
    return [
        ("idx_one_edge",
         [("polyline", [_latlng_pts("1:1, 2:2")])], 8, None),
        ("idx_java_compat",
         [("released", []),
          ("polyline", [_latlng_pts("1:1, 2:2")])],
         9, "28C809010408020010"),
        ("idx_regular_4",
         [("polygon", [_regular_loop([3, 2, 1], 0.1, 4)])], 8, None),
        ("idx_regular_16",
         [("polygon", [_regular_loop([3, 2, 1], 0.1, 16)])], 16, None),
        ("idx_regular_64",
         [("polygon", [_regular_loop([3, 2, 1], 0.1, 64)])], 77, None),
        ("idx_regular_256",
         [("polygon", [_regular_loop([3, 2, 1], 0.1, 256)])], 327, None),
        ("idx_mixed",
         [("polyline", [_latlng_pts("10:10, 10:20, 20:20")]),
          ("polygon", [_regular_loop([1, 0.5, 0.25], 3.0, 32)]),
          ("polyline", [_latlng_pts("-5:100, 5:120")])], None, None),
        # the ShrinkToFitOptimization geometry
        # (mutable_s2shape_index_test.cc:468-480): edges confined to one
        # subcell, interior covering almost all of face 0 — exercises
        # the SkipCellRange interior-entry path in the distributed job
        ("idx_shrink_interior",
         [("polygon", [_regular_loop([1, 0.5, 0.5], 89.0, 100)])],
         None, None),
    ]


def fixtures() -> list[tuple[str, str, list, int]]:
    from ..kernel import cellid as K

    six_faces = [int(K.from_face([f])[0]) for f in range(6)]
    parent = K.from_debug_string("3/012301230")
    cur = K.child_begin(parent)
    level10_children = [int(cur[0])]
    for _ in range(3):
        cur = K.next_id(cur)
        level10_children.append(int(cur[0]))

    multi_level_points = [
        _cell_point(_cid("2/11001310230102")),
        _cell_point(_cid("1/23322")),
        _cell_point(_cid("3/3")),
        _cell_point(_cid("1/23323")),
        _cell_point(_cid("2/12101023022012")),
    ]
    exc_points = [_cell_point(_cid("1/23")), _norm([0.1, 0.2, 0.3])]

    return [
        # --- EncodedS2CellIdVector (reference sizes) ---
        ("cells_covering", "cellid_vector", COVERING_CELLS, 488),
        ("cells_six_faces", "cellid_vector", six_faces, 8),
        ("cells_leaf_1byte", "cellid_vector", [0x3, 0x7, 0x177], 5),
        ("cells_level10_children", "cellid_vector", level10_children, 8),
        ("cells_none_sentinel_none", "cellid_vector", [0, SENTINEL, 0], 26),
        ("cells_mixed_prefix", "cellid_vector",
         [0x1234567800000300, 0x1234567800001C00,
          0x1234567800007000, 0x123456780000FF00], 10),
        # --- EncodedS2PointVector ---
        ("points_one_fast", "point_vector_fast",
         [(1.0, 0.0, 0.0)], 25),
        ("points_one_compact", "point_vector_compact",
         [(1.0, 0.0, 0.0)], 6),
        ("points_multi_level", "point_vector_compact",
         multi_level_points, 83),
        ("points_cellid_with_exception", "point_vector_compact",
         exc_points, 31),
        # --- EncodedStringVector / EncodedUintVector ---
        ("strings_two", "string_vector", ["fuji", "mutsu"], 12),
        ("uints_two_bytes", "uint_vector", [0, 255, 256, 254], 9),
    ]
