"""Exact port of the IsCanonical / CanonicalizeCovering option fixtures
(s2region_coverer_test.cc:356-533)."""

import pytest

from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.coverer import RegionCoverer


def _ids(strs):
    from s2geometry_spark.kernel import cellid as K

    return [CID(int(K.from_debug_string(s)[0])) for s in strs]


def _is_canonical(strs, **opts):
    return RegionCoverer(**opts).is_canonical(_ids(strs))


def test_is_canonical_unsorted():
    assert _is_canonical(["1/1", "1/3"])
    assert not _is_canonical(["1/3", "1/1"])


def test_is_canonical_overlapping():
    assert _is_canonical(["1/2", "1/33"])
    assert not _is_canonical(["1/3", "1/33"])


def test_is_canonical_min_level():
    assert _is_canonical(["1/31"], min_level=2)
    assert not _is_canonical(["1/3"], min_level=2)


def test_is_canonical_max_level():
    assert _is_canonical(["1/31"], max_level=2)
    assert not _is_canonical(["1/312"], max_level=2)


def test_is_canonical_level_mod():
    assert _is_canonical(["1/31"], level_mod=2)
    assert not _is_canonical(["1/312"], level_mod=2)


def test_is_canonical_max_cells():
    assert _is_canonical(["1/1", "1/3"], max_cells=2)
    assert not _is_canonical(["1/1", "1/3", "2/"], max_cells=2)
    assert _is_canonical(["1/123", "2/1", "3/0122"], max_cells=2)


def test_is_canonical_normalized():
    assert _is_canonical(["1/01", "1/02", "1/03", "1/10", "1/11"])
    assert not _is_canonical(["1/00", "1/01", "1/02", "1/03", "1/10"])
    assert _is_canonical(["0/22", "1/01", "1/02", "1/03", "1/10"])
    assert not _is_canonical(["0/22", "1/00", "1/01", "1/02", "1/03"])
    opts = dict(max_cells=20, level_mod=2)
    assert _is_canonical(
        ["1/1101", "1/1102", "1/1103", "1/1110", "1/1111", "1/1112",
         "1/1113", "1/1120", "1/1121", "1/1122", "1/1123", "1/1130",
         "1/1131", "1/1132", "1/1133", "1/1200"], **opts)
    assert not _is_canonical(
        ["1/1100", "1/1101", "1/1102", "1/1103", "1/1110", "1/1111",
         "1/1112", "1/1113", "1/1120", "1/1121", "1/1122", "1/1123",
         "1/1130", "1/1131", "1/1132", "1/1133"], **opts)


def _check_canonicalize(input_str, expected_str, **opts):
    cov = RegionCoverer(**opts)
    actual = _ids(input_str)
    assert not cov.is_canonical(actual)
    cov.canonicalize_covering(actual)
    assert cov.is_canonical(actual)
    assert actual == _ids(expected_str)


def test_canonicalize_unsorted_duplicate_cells():
    _check_canonicalize(
        ["1/200", "1/13122", "1/20", "1/131", "1/13100"], ["1/131", "1/20"]
    )


def test_canonicalize_max_level_exceeded():
    _check_canonicalize(
        ["0/3001", "0/3002", "4/012301230123"], ["0/30", "4/01"], max_level=2
    )


def test_canonicalize_wrong_level_mod():
    _check_canonicalize(
        ["0/0", "1/11", "2/222", "3/3333"],
        ["0/0", "1/1", "2/2", "3/3333"],
        min_level=1, level_mod=3,
    )


def test_canonicalize_replaced_by_parent():
    _check_canonicalize(
        ["0/00", "0/01", "0/02", "0/03", "0/10", "0/11", "0/12", "0/13",
         "0/20", "0/21", "0/22", "0/23", "0/30", "0/31", "0/32", "0/33"],
        ["0/"], level_mod=2,
    )


def test_canonicalize_denormalized_cell_union():
    _check_canonicalize(
        ["0/", "1/130", "1/131", "1/132", "1/133"],
        ["0/0", "0/1", "0/2", "0/3", "1/130", "1/131", "1/132", "1/133"],
        min_level=1, level_mod=2,
    )


def test_canonicalize_max_cells_merges_smallest():
    _check_canonicalize(
        ["0/", "1/0", "1/1", "2/01300", "2/0131313"],
        ["0/", "1/", "2/013"], max_cells=3,
    )


def test_canonicalize_max_cells_merges_repeatedly():
    _check_canonicalize(
        ["0/0121", "0/0123", "1/0", "1/1", "1/2", "1/30", "1/32", "1/33",
         "1/311", "1/312", "1/313", "1/3100", "1/3101", "1/3103",
         "1/31021", "1/31023"],
        ["0/0121", "0/0123", "1/"], max_cells=8,
    )
