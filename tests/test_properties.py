"""Hypothesis property tests over the cell-id kernel (SURVEY §5 item 2)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from s2geometry_spark.kernel import cellid as C
from s2geometry_spark.kernel.cid import CID

lat_st = st.floats(min_value=-89.999, max_value=89.999, allow_nan=False)
lng_st = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False,
                   exclude_max=True)
level_st = st.integers(min_value=0, max_value=30)


@settings(max_examples=200, deadline=None)
@given(lat_st, lng_st, level_st)
def test_hierarchy_invariants(lat, lng, level):
    leaf = C.from_latlng(np.array([lat]), np.array([lng]))
    cell = C.parent(leaf, level)
    assert C.is_valid(cell)[0]
    assert C.level(cell)[0] == level
    assert C.contains(cell, leaf)[0]
    tok = C.to_token(cell)
    assert C.from_token(tok)[0] == cell[0]
    # scalar CID agrees with the vectorized kernel
    cid = CID(int(leaf[0])).parent(level)
    assert cid.id == int(cell[0])
    assert cid.token() == tok[0]
    # range bounds nest monotonically up the hierarchy
    if level > 0:
        par = C.parent(cell, level - 1)
        assert C.range_min(par)[0] <= C.range_min(cell)[0]
        assert C.range_max(par)[0] >= C.range_max(cell)[0]


@settings(max_examples=100, deadline=None)
@given(lat_st, lng_st)
def test_center_roundtrip_stays_in_cell(lat, lng):
    leaf = C.from_latlng(np.array([lat]), np.array([lng]))
    for level in (4, 10, 16, 24):
        cell = C.parent(leaf, level)
        clat, clng = C.to_latlng(cell)
        leaf2 = C.from_latlng(clat, clng)
        assert C.contains(cell, leaf2)[0]


@settings(max_examples=100, deadline=None)
@given(lat_st, lng_st, st.integers(min_value=0, max_value=29))
def test_neighbors_are_symmetric(lat, lng, level):
    cell = C.parent(C.from_latlng(np.array([lat]), np.array([lng])), level)
    nbrs = C.edge_neighbors(cell)[0]
    me = int(cell[0])
    for n in nbrs.tolist():
        back = C.edge_neighbors(np.array([n], dtype=np.uint64))[0].tolist()
        assert me in back
