"""Port of s2point_compression_test.cc: compressed point codec
roundtrips and exact encoded sizes."""

import math

import numpy as np
import pytest

from s2geometry_spark.kernel import cellid as K
from s2geometry_spark.kernel import coords
from s2geometry_spark.kernel import point_compression as PC
from s2geometry_spark.kernel.encodings import Decoder
from s2geometry_spark.kernel.polyline import _get_frame

MAX_LEVEL = 30
EARTH_RADIUS_KM = 6371.01  # s2testing KmToAngle denominator


def _norm(p):
    x, y, z = (float(v) for v in p)
    n = (x * x + y * y + z * z) ** 0.5
    return np.array([x / n, y / n, z / n])


def _snap_to_level(points, level):
    """SnapPointToLevel: S2CellId(point).parent(level).ToPoint()
    (s2point_compression_test.cc:51-61)."""
    p = np.asarray(points, dtype=np.float64).reshape(-1, 3)
    ids = K.from_point(p[:, 0], p[:, 1], p[:, 2])
    ids = K.parent(ids, level)
    x, y, z = K.to_point(ids)
    return np.stack([x, y, z], -1)


def _make_regular_points_unsnapped(center, radius_rad, n):
    """S2Loop::MakeRegularLoop vertex generation, transcribed exactly
    (s2loop.cc:1472-1490): r = sin(radius), z = cos(radius),
    angle_i = i * (2*pi/n), vertex = FromFrame(frame, (r cos, r sin, z))
    normalized."""
    frame = _get_frame(_norm(center))
    r = math.sin(radius_rad)
    z = math.cos(radius_rad)
    step = 2 * math.pi / n
    out = np.zeros((n, 3))
    for i in range(n):
        a = i * step
        local = np.array([r * math.cos(a), r * math.sin(a), z])
        out[i] = _norm(frame @ local)
    return out


def _make_regular_points(n, radius_km, level):
    center = _norm((1.0, 1.0, 1.0))
    radius_rad = radius_km / EARTH_RADIUS_KM
    return _snap_to_level(
        _make_regular_points_unsnapped(center, radius_rad, n), level)


@pytest.fixture(scope="module")
def fixtures():
    center = _norm((1.0, 1.0, 1.0))
    radius = 0.1 / EARTH_RADIUS_KM
    loop_4 = _make_regular_points(4, 0.1, MAX_LEVEL)
    loop_4_unsnapped = _make_regular_points_unsnapped(center, radius, 4)
    loop_4_level_14 = _make_regular_points(4, 0.1, 14)
    loop_100 = _make_regular_points(100, 0.1, MAX_LEVEL)
    loop_100_unsnapped = _make_regular_points_unsnapped(center, radius, 100)
    loop_100_mixed_15 = loop_100_unsnapped.copy()
    for i in range(15):
        loop_100_mixed_15[3 * i] = _snap_to_level(
            loop_100_mixed_15[3 * i][None], MAX_LEVEL)[0]
    loop_100_mixed_25 = loop_100_unsnapped.copy()
    for i in range(25):
        loop_100_mixed_25[4 * i] = _snap_to_level(
            loop_100_mixed_25[4 * i][None], MAX_LEVEL)[0]
    loop_100_level_22 = _make_regular_points(100, 0.1, 22)

    multi_face = np.zeros((6, 3))
    for i, (f, u, v) in enumerate([(0, -0.5, 0.5), (1, -0.5, 0.5),
                                   (1, 0.5, -0.5), (2, -0.5, 0.5),
                                   (2, 0.5, -0.5), (2, 0.5, 0.5)]):
        x, y, z = coords.face_uv_to_xyz(np.int64(f), np.float64(u),
                                        np.float64(v))
        multi_face[i] = _norm((float(x), float(y), float(z)))
    loop_multi_face = _snap_to_level(multi_face, MAX_LEVEL)

    line = np.zeros((100, 3))
    for i in range(100):
        s = 0.01 + 0.005 * i
        t = 0.01 + 0.009 * i
        u = float(coords.st_to_uv(np.float64(s)))
        v = float(coords.st_to_uv(np.float64(t)))
        x, y, z = coords.face_uv_to_xyz(np.int64(0), np.float64(u),
                                        np.float64(v))
        line[i] = _norm((float(x), float(y), float(z)))
    line = _snap_to_level(line, MAX_LEVEL)

    return {
        "loop_4": loop_4,
        "loop_4_unsnapped": loop_4_unsnapped,
        "loop_4_level_14": loop_4_level_14,
        "loop_100": loop_100,
        "loop_100_unsnapped": loop_100_unsnapped,
        "loop_100_mixed_15": loop_100_mixed_15,
        "loop_100_mixed_25": loop_100_mixed_25,
        "loop_100_level_22": loop_100_level_22,
        "loop_multi_face": loop_multi_face,
        "line": line,
    }


def _roundtrip(points, level):
    enc = PC.encode_points_compressed(points, level)
    got = PC.decode_points_compressed(Decoder(bytes(enc.buf)), level,
                                      len(points))
    assert np.array_equal(got, points)
    return len(enc.buf)


def test_roundtrips_empty():
    enc = PC.encode_points_compressed(np.zeros((0, 3)), MAX_LEVEL)
    got = PC.decode_points_compressed(Decoder(bytes(enc.buf)), MAX_LEVEL, 0)
    assert got.shape == (0, 3)


def test_roundtrips_four_vertex_loop(fixtures):
    _roundtrip(fixtures["loop_4"], MAX_LEVEL)


def test_roundtrips_four_vertex_loop_unsnapped(fixtures):
    _roundtrip(fixtures["loop_4_unsnapped"], MAX_LEVEL)


def test_four_vertex_loop_size(fixtures):
    """32 bytes uncompressed -> 39 with the off-center escape
    (s2point_compression_test.cc:207-211)."""
    enc = PC.encode_points_compressed(fixtures["loop_4"], MAX_LEVEL)
    assert len(enc.buf) == 39


def test_roundtrips_four_vertex_level_14_loop(fixtures):
    _roundtrip(fixtures["loop_4_level_14"], 14)


def test_four_vertex_level_14_loop_size(fixtures):
    enc = PC.encode_points_compressed(fixtures["loop_4_level_14"], 14)
    assert len(enc.buf) == 23


def test_roundtrips_100_vertex_loop(fixtures):
    _roundtrip(fixtures["loop_100"], MAX_LEVEL)


def test_roundtrips_100_vertex_loop_unsnapped(fixtures):
    _roundtrip(fixtures["loop_100_unsnapped"], MAX_LEVEL)


def test_roundtrips_100_vertex_loop_mixed_15(fixtures):
    size = _roundtrip(fixtures["loop_100_mixed_15"], MAX_LEVEL)
    assert size == 2381


def test_roundtrips_100_vertex_loop_mixed_25(fixtures):
    size = _roundtrip(fixtures["loop_100_mixed_25"], MAX_LEVEL)
    assert size == 2131


def test_one_hundred_vertex_loop_size(fixtures):
    enc = PC.encode_points_compressed(fixtures["loop_100"], MAX_LEVEL)
    assert len(enc.buf) == 257


def test_one_hundred_vertex_loop_unsnapped_size(fixtures):
    enc = PC.encode_points_compressed(fixtures["loop_100_unsnapped"],
                                      MAX_LEVEL)
    assert len(enc.buf) == 2756


def test_roundtrips_100_vertex_level_22_loop(fixtures):
    _roundtrip(fixtures["loop_100_level_22"], 22)


def test_one_hundred_vertex_loop_level_22_size(fixtures):
    enc = PC.encode_points_compressed(fixtures["loop_100_level_22"], 22)
    assert len(enc.buf) == 148


def test_multi_face_loop(fixtures):
    _roundtrip(fixtures["loop_multi_face"], MAX_LEVEL)


def test_straight_line_compresses_well(fixtures):
    size = _roundtrip(fixtures["line"], MAX_LEVEL)
    assert size == len(fixtures["line"]) + 17


def test_first_point_on_face_edge():
    """The SiTitoPiQi clamp bug (s2point_compression_test.cc:273-305):
    first point exactly on a face edge (ti == kMaxSiTi) must not try to
    encode 2^level in level bits."""
    points = np.array([
        [0.054299323861222645, -0.70606358900180299, 0.70606358900180299],
        [0.056482651436986935, -0.70781701406865505, 0.70413406726388494],
    ])
    face = np.array([2, 4])
    si = np.array([956301312, 4194304], dtype=np.int64)
    ti = np.array([2147483648, 1195376640], dtype=np.int64)
    cell_level = np.array([-1, 8])
    enc = PC.encode_points_compressed(points, 8,
                                      face_siti=(face, si, ti, cell_level))
    got = PC.decode_points_compressed(Decoder(bytes(enc.buf)), 8, 2)
    assert np.array_equal(got, points)
