"""Cell-union set algebra: DataFrame ops vs exact kernel."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2geometry_spark.kernel import cellunion as CU
from s2geometry_spark.kernel.cid import CID
from s2geometry_spark.operators import unionops as U

RNG = np.random.default_rng(42)


def _random_union(n) -> list[CID]:
    from s2geometry_spark.kernel import cellid as K

    lat = RNG.uniform(-80, 80, n)
    lng = RNG.uniform(-180, 180, n)
    leafs = K.from_latlng(lat, lng)
    lvls = RNG.integers(4, 14, n)
    return CU.normalize([CID(int(c)) for c in K.parent(leafs, lvls)])


def _df(spark, regions: dict[str, list[CID]]):
    rows = [
        (rid, c.id - (1 << 63)) for rid, cells in regions.items() for c in cells
    ]
    return spark.createDataFrame(rows, "region_id string, cell_id_s long")


def test_normalize_collapses_siblings(spark):
    f0 = CID.from_face(0)
    children = [f0.child(k) for k in range(4)]
    df = _df(spark, {"r": children})
    out = U.normalize_unions(df).collect()
    assert len(out) == 1
    assert CID(out[0].cell_id_s + (1 << 63)) == f0


def test_union_intersect_subtract_match_kernel(spark):
    for trial in range(3):
        ua = _random_union(30)
        ub = _random_union(30)
        da = _df(spark, {"r": ua})
        db = _df(spark, {"r": ub})

        got_union = sorted(
            r.cell_id_s + (1 << 63) for r in U.union_unions(da, db).collect()
        )
        want_union = sorted(c.id for c in CU.union(ua, ub))
        assert got_union == want_union, f"union trial {trial}"

        got_int = sorted(
            r.cell_id_s + (1 << 63) for r in U.intersect_unions(da, db).collect()
        )
        want_int = sorted(c.id for c in CU.intersection(ua, ub))
        assert got_int == want_int, f"intersection trial {trial}"

        got_diff = sorted(
            r.cell_id_s + (1 << 63) for r in U.subtract_unions(da, db).collect()
        )
        want_diff = sorted(c.id for c in CU.difference(ua, ub))
        assert got_diff == want_diff, f"difference trial {trial}"


def test_kernel_set_op_invariants():
    ua = _random_union(20)
    ub = _random_union(20)
    inter = CU.intersection(ua, ub)
    diff = CU.difference(ua, ub)
    # a = (a ∩ b) ∪ (a \ b) as leaf coverage
    def leaves(cells):
        total = 0
        for c in cells:
            total += (c.range_max().id - c.range_min().id) // 2 + 1
        return total

    assert leaves(inter) + leaves(diff) == leaves(ua)
    # intersection is symmetric
    assert [c.id for c in CU.intersection(ub, ua)] == [c.id for c in inter]


def test_contains_points_join(spark):
    from s2geometry_spark.kernel import cellid as K

    union = _random_union(10)
    df = _df(spark, {"r": union})
    lat = RNG.uniform(-80, 80, 500)
    lng = RNG.uniform(-180, 180, 500)
    leafs = K.from_latlng(lat, lng)
    pts = spark.createDataFrame(
        [(int(i), int(c) - (1 << 63)) for i, c in enumerate(leafs)],
        "pid long, cell_id_s long",
    )
    got = sorted(r.pid for r in U.contains_points_join(df, pts).collect())
    want = sorted(
        i for i, c in enumerate(leafs) if CU.contains_id(union, CID(int(c)))
    )
    assert got == want
