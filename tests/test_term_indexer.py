"""S2RegionTermIndexer fixture ports (s2region_term_indexer_test.cc):
the random-caps guarantee harness (query region intersects an indexed
region iff they share a term) across the six option combinations, plus
MarkerCharacter and MaxLevelSetLoosely.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernel import cellunion as CU
from s2geometry_spark.kernel.cell import average_area
from s2geometry_spark.kernel.coverer import RegionCoverer
from s2geometry_spark.kernel.fractal import random_point
from s2geometry_spark.kernel.region import Cap
from s2geometry_spark.kernel.term_indexer import TermIndexer, TermIndexerOptions

ITERS = 60


def random_cap(rng, min_area: float, max_area: float) -> Cap:
    """s2random::Cap: log-uniform area in [min_area, max_area]."""
    area = max_area * (min_area / max_area) ** rng.uniform()
    return Cap(random_point(rng), area / math.pi)


def unions_intersect(a, b) -> bool:
    return bool(CU.intersection(a, b))


def run_random_caps(options: TermIndexerOptions, query_type: str, seed: int):
    rng = np.random.RandomState(seed)
    indexer = TermIndexer(options)
    coverer = RegionCoverer(
        max_cells=options.max_cells, min_level=options.min_level,
        max_level=options.max_level, level_mod=options.level_mod,
    )
    caps, coverings = [], []
    index: dict[str, list[int]] = {}
    for i in range(ITERS):
        if options.index_contains_points_only:
            cap = Cap.from_point(random_point(rng))
            terms = indexer.get_index_terms_point(cap.center)
        else:
            cap = random_cap(
                rng,
                0.3 * average_area(options.max_level),
                4.0 * average_area(options.min_level),
            )
            terms = indexer.get_index_terms_region(cap)
        caps.append(cap)
        coverings.append(coverer.get_covering(cap))
        for t in terms:
            index.setdefault(t, []).append(i)
    for _ in range(ITERS):
        if query_type == "POINT":
            cap = Cap.from_point(random_point(rng))
            terms = indexer.get_query_terms_point(cap.center)
        else:
            cap = random_cap(
                rng,
                0.3 * average_area(options.max_level),
                4.0 * average_area(options.min_level),
            )
            terms = indexer.get_query_terms_region(cap)
        covering = coverer.get_covering(cap)
        expected = {
            j for j in range(len(caps))
            if unions_intersect(covering, coverings[j])
        }
        actual: set[int] = set()
        for t in terms:
            actual.update(index.get(t, ()))
        assert expected == actual


def test_index_regions_query_regions_optimize_time():
    run_random_caps(
        TermIndexerOptions(min_level=0, max_level=16, max_cells=20),
        "CAP", seed=101,
    )


def test_index_regions_query_points_optimize_time():
    run_random_caps(
        TermIndexerOptions(min_level=0, max_level=16, max_cells=20),
        "POINT", seed=102,
    )


def test_index_regions_query_regions_optimize_time_with_level_mod():
    run_random_caps(
        TermIndexerOptions(min_level=6, max_level=12, level_mod=3),
        "CAP", seed=103,
    )


def test_index_regions_query_regions_optimize_space():
    run_random_caps(
        TermIndexerOptions(min_level=4, max_level=30, max_cells=8,
                           optimize_for_space=True),
        "CAP", seed=104,
    )


def test_index_points_query_regions_optimize_time():
    run_random_caps(
        TermIndexerOptions(min_level=0, max_level=30, level_mod=2,
                           max_cells=20, index_contains_points_only=True),
        "CAP", seed=105,
    )


def test_index_points_query_regions_optimize_space():
    run_random_caps(
        TermIndexerOptions(optimize_for_space=True,
                           index_contains_points_only=True),
        "CAP", seed=106,
    )


def test_marker_character():
    """test.cc:205-220: exact tokens for 10:20 at level 20."""
    from s2geometry_spark.kernel.contains import parse_points

    options = TermIndexerOptions(min_level=20, max_level=20)
    indexer = TermIndexer(options)
    point = parse_points("10:20")[0]
    assert indexer.options.marker == "$"
    assert indexer.get_query_terms_point(point) == [
        "11282087039", "$11282087039"
    ]
    indexer.options.marker = ":"
    assert indexer.get_query_terms_point(point) == [
        "11282087039", ":11282087039"
    ]


def test_max_level_set_loosely():
    """test.cc:222-247: (max_level − min_level) not a multiple of
    level_mod yields identical terms."""
    o1 = TermIndexerOptions(min_level=1, level_mod=2, max_level=19)
    o2 = TermIndexerOptions(min_level=1, level_mod=2, max_level=20)
    i1, i2 = TermIndexer(o1), TermIndexer(o2)
    rng = np.random.RandomState(107)
    p = random_point(rng)
    assert i1.get_index_terms_point(p) == i2.get_index_terms_point(p)
    assert i1.get_query_terms_point(p) == i2.get_query_terms_point(p)
    cap = random_cap(rng, 1e-10, 1.0)
    assert i1.get_index_terms_region(cap) == i2.get_index_terms_region(cap)
    assert i1.get_query_terms_region(cap) == i2.get_query_terms_region(cap)
