"""Port of s2region_sharder_test.cc over kernel/cell_index.RegionSharder."""

from __future__ import annotations

from s2geometry_spark.kernel.cell_index import CellIndex, RegionSharder
from s2geometry_spark.kernel.cid import CID


def from_face_pos_level(face: int, pos: int, level: int) -> CID:
    """S2CellId::FromFacePosLevel."""
    raw = ((face << 61) | (pos & ((1 << 61) - 1))) & ((1 << 64) - 1)
    return CID(raw | 1).parent(level)


def index_from_coverings(coverings) -> CellIndex:
    index = CellIndex()
    for i, union in enumerate(coverings):
        index.add_cell_union(union, i)
    index.build()
    return index


COVERINGS = [
    [from_face_pos_level(0, 0, 10)],
    [from_face_pos_level(1, 1, 9), from_face_pos_level(3, 0, 8)],
    [from_face_pos_level(5, 0, 10)],
]


def test_store_in_map():
    """StoreInMap (test.cc:47-80): sharders work as dict values, built
    either from coverings or from an external index."""
    for sharder in (
        RegionSharder(COVERINGS),
        RegionSharder(index_from_coverings(COVERINGS)),
    ):
        sharders = {"testing": sharder}
        assert (
            sharders["testing"].get_most_intersecting_shard(
                [from_face_pos_level(0, 0, 11)], 42
            )
            == 0
        )


def test_get_most_intersecting_shard():
    """test.cc:82-126."""
    for sharder in (
        RegionSharder(index_from_coverings(COVERINGS)),
        RegionSharder(COVERINGS),
    ):
        # overlap with only one shard
        assert (
            sharder.get_most_intersecting_shard(
                [from_face_pos_level(0, 0, 11)], 42
            )
            == 0
        )
        # multiple shards: picks the one with more overlap
        assert (
            sharder.get_most_intersecting_shard(
                [
                    from_face_pos_level(0, 0, 10),
                    from_face_pos_level(3, 0, 9),
                    from_face_pos_level(3, 1, 9),
                ],
                42,
            )
            == 1
        )
        # no overlap
        assert (
            sharder.get_most_intersecting_shard(
                [from_face_pos_level(4, 0, 10)], 42
            )
            == 42
        )


def test_get_intersecting_shards():
    """test.cc:128-163."""
    for sharder in (
        RegionSharder(index_from_coverings(COVERINGS)),
        RegionSharder(COVERINGS),
    ):
        assert sharder.get_intersecting_shards(
            [from_face_pos_level(0, 0, 11)]
        ) == [0]
        assert sharder.get_intersecting_shards(
            [
                from_face_pos_level(0, 0, 10),
                from_face_pos_level(3, 0, 9),
                from_face_pos_level(3, 1, 9),
            ]
        ) == [0, 1]
        assert (
            sharder.get_intersecting_shards(
                [from_face_pos_level(4, 0, 10)]
            )
            == []
        )


def test_tie_breaking():
    """GetMostIntersectingShardTieBreaking (test.cc:165-190): equal
    intersection sums pick the lowest shard index."""
    c0 = CID.from_face(0).child(0)
    c1 = CID.from_face(1).child(0)
    assert c0.lsb() == c1.lsb()
    coverings = [[c1], [c0]]
    for _ in range(2):
        sharder = RegionSharder(coverings)
        assert sharder.get_most_intersecting_shard([c0, c1], 42) == 0
        coverings[0], coverings[1] = coverings[1], coverings[0]
