"""s2cell_id_test.cc closing tranche: face definitions, position-field
bounds, parent/child relationships, curve iteration, common ancestors,
center (si,ti) coordinates, top-level/Zurich neighbor sets, and the
wire + legacy-token coders.
"""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_spark.kernel import cellid as K
from s2geometry_spark.kernel.cid import CID, MAX_LEVEL, NUM_FACES
from s2geometry_spark.kernel.coords import latlng_to_xyz
from s2geometry_spark.kernel.encodings import Decoder, Encoder


def _cell_id(lat, lng):
    x, y, z = latlng_to_xyz(np.array([lat]), np.array([lng]))
    return CID(int(K.from_point(x, y, z)[0]))


# --- FaceDefinitions (cc) --------------------------------------------------


def test_face_definitions():
    assert _cell_id(0, 0).face() == 0
    assert _cell_id(0, 90).face() == 1
    assert _cell_id(90, 0).face() == 2
    assert _cell_id(0, 180).face() == 3
    assert _cell_id(0, -90).face() == 4
    assert _cell_id(-90, 0).face() == 5


# --- MaxPositionIsValid / PositionAboveMaxIsInvalid ------------------------


def test_max_position_is_valid():
    assert CID.MAX_POSITION == ((1 << 64) - 1) >> CID.FACE_BITS
    for face in range(NUM_FACES):
        cid = CID.from_face_pos_level(face, CID.MAX_POSITION, 0)
        assert cid.is_valid()
        assert cid.face() == face


def test_position_above_max_is_invalid():
    face = 5
    overflow_pos = CID.MAX_POSITION + 1
    overflow_id = CID((face << 61) + (overflow_pos | 1))
    assert not overflow_id.is_valid()


# --- ParentChildRelationships ----------------------------------------------


def test_parent_child_relationships():
    cid = CID.from_face_pos_level(3, 0x12345678, MAX_LEVEL - 4)
    assert cid.is_valid()
    assert cid.face() == 3
    assert cid.pos() == 0x12345700
    assert cid.level() == MAX_LEVEL - 4
    assert not cid.is_leaf()

    assert cid.child_begin(cid.level() + 2).pos() == 0x12345610
    assert cid.child_begin().pos() == 0x12345640
    assert cid.parent().pos() == 0x12345400
    assert cid.parent(cid.level() - 2).pos() == 0x12345000

    assert cid.child_begin() < cid
    assert cid.child_end() > cid
    assert (
        cid.child_end()
        == cid.child_begin().next().next().next().next()
    )
    assert cid.range_min() == cid.child_begin(MAX_LEVEL)
    assert cid.range_max().next() == cid.child_end(MAX_LEVEL)

    # cells are represented by the center of their Hilbert interval
    assert 2 * cid.id == cid.range_min().id + cid.range_max().id


# --- SentinelRangeMinMax ---------------------------------------------------


def test_sentinel_range_min_max():
    assert CID.sentinel().range_min() == CID.sentinel()
    assert CID.sentinel().range_max() == CID.sentinel()


# --- DistanceFromBegin -----------------------------------------------------


def test_distance_from_begin():
    assert CID.end(0).distance_from_begin() == 6
    assert CID.end(10).distance_from_begin() == 6 * (1 << 20)
    assert CID.end(MAX_LEVEL).distance_from_begin() == 6 * (
        1 << (2 * MAX_LEVEL)
    )
    assert CID.begin(0).distance_from_begin() == 0
    assert CID.begin(MAX_LEVEL).distance_from_begin() == 0

    cid = CID.from_face_pos_level(3, 0x12345678, MAX_LEVEL - 4)
    assert (
        CID.begin(cid.level()).advance(cid.distance_from_begin()) == cid
    )


# --- GetCommonAncestorLevel ------------------------------------------------


def test_get_common_ancestor_level():
    f = CID.from_face
    assert f(0).common_ancestor_level(f(0)) == 0
    assert (
        f(0).child_begin(30).common_ancestor_level(f(0).child_begin(30))
        == 30
    )
    assert f(0).child_begin(30).common_ancestor_level(f(0)) == 0
    assert (
        f(5).common_ancestor_level(f(5).child_end(30).prev()) == 0
    )
    assert f(0).common_ancestor_level(f(5)) == -1
    assert (
        f(2).child_begin(30).common_ancestor_level(f(3).child_end(20))
        == -1
    )
    assert (
        f(5).child_begin(9).next().child_begin(15).common_ancestor_level(
            f(5).child_begin(9).child_begin(20)
        )
        == 8
    )
    assert (
        f(0).child_begin(2).child_begin(30).common_ancestor_level(
            f(0).child_begin(2).next().child_begin(5)
        )
        == 1
    )


# --- CenterSiTi ------------------------------------------------------------


def test_center_si_ti():
    cid = CID.from_face_pos_level(3, 0x12345678, MAX_LEVEL)
    cases = [
        (MAX_LEVEL, 0),       # leaf: ends in 1
        (MAX_LEVEL - 1, 1),
        (MAX_LEVEL - 2, 2),
        (MAX_LEVEL - 10, 10),
        (MAX_LEVEL - 20, 20),
        (0, 30),
    ]
    for level, shift in cases:
        _, si, ti = cid.parent(level).center_si_ti()
        mask = (1 << (shift + 1)) - 1
        assert si & mask == 1 << shift, (level, si)
        assert ti & mask == 1 << shift, (level, ti)


# --- AllTopLevelFaceNeighbors / AllNeighborsForZurich ----------------------


def _all_neighbors(debug_str):
    ids = K.from_debug_string(debug_str)
    lvl = int(K.level(ids)[0])
    out = K.all_neighbors(ids, lvl)
    got = sorted(int(x) for arr in out for x in np.atleast_1d(arr))
    return got


def test_all_top_level_face_neighbors():
    got = _all_neighbors("3/")
    want = sorted(
        int(K.from_debug_string(s)[0])
        for s in ["1/", "2/", "2/", "2/", "4/", "5/", "5/", "5/"]
    )
    assert got == want


def test_all_neighbors_for_zurich():
    got = _all_neighbors("2/033020001100")
    want = sorted(
        int(K.from_debug_string(s)[0])
        for s in [
            "2/033020001030", "2/033020001033", "2/033020001101",
            "2/033020001102", "2/033020001103", "2/033031110010",
            "2/033031110011", "2/033031110322",
        ]
    )
    assert got == want


# --- wire + legacy-token coders --------------------------------------------


def test_encode_decode_none_cell():
    enc = Encoder()
    CID.none().encode(enc)
    assert CID.decode(Decoder(bytes(enc.buf))) == CID.none()


def test_legacy_coder():
    cid = CID(0x7837423)
    enc = Encoder()
    cid.coder_encode(enc)
    assert CID.coder_decode(Decoder(bytes(enc.buf))) == cid


def test_legacy_coder_token_invalid():
    # token too long
    with pytest.raises(Exception):
        CID.coder_decode(Decoder(b"000000000000000404"))
    # max-length token without nul terminator
    with pytest.raises(Exception):
        CID.coder_decode(Decoder(b"0000000000000004"))
    # shorter token without nul terminator
    with pytest.raises(Exception):
        CID.coder_decode(Decoder(b"000000004"))
    # empty input
    with pytest.raises(Exception):
        CID.coder_decode(Decoder(b""))


def test_legacy_coder_none_cell():
    enc = Encoder()
    CID.none().coder_encode(enc)
    assert CID.coder_decode(Decoder(bytes(enc.buf))) == CID.none()


def test_legacy_coder_many():
    enc = Encoder()
    for lvl in range(MAX_LEVEL + 1):
        CID.from_face_pos_level(0, 0, lvl).coder_encode(enc)
        CID.none().coder_encode(enc)
    dec = Decoder(bytes(enc.buf))
    for lvl in range(MAX_LEVEL + 1):
        assert CID.coder_decode(dec) == CID.from_face_pos_level(0, 0, lvl)
        assert CID.coder_decode(dec) == CID.none()
