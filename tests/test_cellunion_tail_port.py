"""s2cell_union_test.cc closing tranche: AddCells-driven containment
contracts, the set-algebra inclusion-exclusion identity, the wire
coder (incl. the decode size guard), empty-union mutable ops, and
ToString.
"""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_spark.kernel import cellunion as CU
from s2geometry_spark.kernel import cellid as K
from s2geometry_spark.kernel.cid import CID, MAX_LEVEL
from s2geometry_spark.kernel.encodings import (
    Decoder,
    Encoder,
    decode_cell_union,
    encode_cell_union,
)
from tests.test_cellunion_fixtures import _add_cells


def _gen(rng):
    input_ids: list[CID] = []
    expected: list[CID] = []
    _add_cells(rng, None, False, input_ids, expected)
    return input_ids, expected


def _contains_point(ids, p):
    leaf = CID(int(K.from_point(
        np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
    )[0]))
    return CU.contains_id(ids, leaf)


# --- ContainsExpectedCells (generator contract) -----------------------------


def test_contains_expected_cells():
    rng = np.random.default_rng(20260819)
    for _ in range(20):
        input_ids, expected = _gen(rng)
        assert CU.normalize(input_ids) == sorted(expected)


# --- ContainsInputCells ------------------------------------------------------


def test_contains_input_cells():
    rng = np.random.default_rng(7)
    for _ in range(10):
        input_ids, _ = _gen(rng)
        u = CU.normalize(input_ids)
        for cid in input_ids:
            assert CU.contains_id(u, cid)
            x, y, z = K.to_point(np.array([cid.id], np.uint64))
            assert _contains_point(u, (x[0], y[0], z[0]))
            assert CU.intersects(u, [cid])
            if not cid.is_face():
                assert CU.intersects(u, [cid.parent()])
                if cid.level() > 1:
                    assert CU.intersects(u, [cid.parent().parent()])
                    assert CU.intersects(u, [cid.parent(0)])
            if not cid.is_leaf():
                assert CU.contains_id(u, cid.child_begin())
                assert CU.intersects(u, [cid.child_begin()])
                assert CU.contains_id(u, cid.child_end().prev())
                assert CU.intersects(u, [cid.child_end().prev()])
                assert CU.contains_id(u, cid.child_begin(MAX_LEVEL))
                assert CU.intersects(u, [cid.child_begin(MAX_LEVEL)])


# --- DoesNotContainParentsOfExpectedCell ------------------------------------


def test_does_not_contain_parents_of_expected_cell():
    rng = np.random.default_rng(11)
    for _ in range(10):
        input_ids, expected = _gen(rng)
        u = CU.normalize(input_ids)
        for cid in expected:
            if not cid.is_face():
                assert not CU.contains_id(u, cid.parent())
                assert not CU.contains_id(u, cid.parent(0))


# --- DifferenceInclusionExclusion -------------------------------------------


def test_difference_inclusion_exclusion():
    rng = np.random.default_rng(13)
    for _ in range(10):
        input_ids, _ = _gen(rng)
        x = CU.normalize(
            [c for c in input_ids if rng.random() < 0.5]
        )
        y = CU.normalize(
            [c for c in input_ids if rng.random() < 0.5]
        )
        x_minus_y = CU.difference(x, y)
        y_minus_x = CU.difference(y, x)
        x_and_y = CU.intersection(x, y)
        x_or_y = CU.union(x, y)
        got = CU.union(CU.union(x_minus_y, y_minus_x), x_and_y)
        assert got == x_or_y


# --- wire coder --------------------------------------------------------------


def test_encode_decode():
    ids = [0x33, 0x8E3748FAB, 0x91230ABCDEF83427]
    enc = encode_cell_union(ids)
    got = decode_cell_union(Decoder(bytes(enc.buf)))
    assert got == ids


def test_encode_decode_empty():
    enc = encode_cell_union([])
    assert decode_cell_union(Decoder(bytes(enc.buf))) == []


def test_refuse_to_decode():
    n = 1_000_001
    enc = Encoder()
    enc.put8(1)
    enc.put64(n)
    first = CID.begin(MAX_LEVEL)
    # The size guard fires on the count alone, before any ids are read,
    # exactly like the reference's FLAGS_s2cell_union_decode_max_num_cells.
    enc.put64(first.id)
    with pytest.raises(ValueError):
        decode_cell_union(Decoder(bytes(enc.buf)))


# --- EmptyMutableOps ----------------------------------------------------------


def test_empty_mutable_ops():
    empty: list[CID] = []
    assert CU.normalize(empty) == []
    assert CU.denormalize(empty, 0, 2) == []
    assert CU.expand_radius(empty, 1.0, 20) == []
    assert CU.expand_level(empty, 10) == []


# --- InvalidCellIdNotValidWithDebugFlag ---------------------------------------


def test_invalid_cell_id_not_valid():
    assert not CID.none().is_valid()
    assert not CU.is_valid([CID.none()])


# --- ToString -----------------------------------------------------------------


def test_to_string_one_cell():
    assert CU.to_string([CID.from_face(1)]) == "Size:1 S2CellIds:3"


def test_to_string_two_cells():
    assert (
        CU.to_string([CID.from_face(1), CID.from_face(2)])
        == "Size:2 S2CellIds:3,5"
    )


def test_to_string_over_500_cells():
    ids = CU.denormalize([CID.from_face(1)], 6, 1)  # 4096 cells
    result = CU.to_string(ids)
    assert result.count(",") == 500
    assert result.endswith(",...")
