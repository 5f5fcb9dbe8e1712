"""Kernel-level gates for the distributed antimeridian-split operator
(operators/meridian.py; the Spark path is gated row-for-row by the
geo_meridian_split contract oracle).  Split semantics are pinned
against the reference's MeridianSplitting expected strings in
tests/test_mixed_ops.py::test_meridian_splitting."""

import numpy as np

from s2geometry_spark.kernel.coords import latlng_to_xyz
from s2geometry_spark.operators.meridian import _crosses_meridian, split_job
from __spark_entry__ import _meridian_fixtures


def _chains(chains):
    out = []
    for chain in chains:
        lat = np.array([p[0] for p in chain], np.float64)
        lng = np.array([p[1] for p in chain], np.float64)
        x, y, z = latlng_to_xyz(lat, lng)
        out.append(np.stack([x, y, z], -1))
    return out


def test_no_output_edge_crosses_meridian():
    for name, kind, chains in _meridian_fixtures():
        for p in split_job(kind, _chains(chains)):
            assert not _crosses_meridian(p, kind == "polygon"), name


def test_piece_shapes():
    got = {
        name: sorted(len(p) for p in split_job(kind, _chains(chains)))
        for name, kind, chains in _meridian_fixtures()
    }
    assert got == {
        # reference expected strings (test.cc:1753-1795): line gains the
        # 0:180 vertex; hemisphere gains both meridian points + pole;
        # square/annulus split into two shells (+ degenerate residues
        # along the shared meridian segments); world-minus-square keeps
        # both poles
        "equator_line": [3],
        "north_hemisphere": [3, 6],
        "small_square": [4, 5],
        "annulus": [3, 7, 9],
        "world_minus_square": [4, 9],
        "fiji_box": [4, 6],
        "zigzag_line": [7],
        "no_cross": [3],
    }


def test_passthrough_is_identity():
    (name, kind, chains) = _meridian_fixtures()[-1]
    assert name == "no_cross"
    (piece,) = split_job(kind, _chains(chains))
    assert np.allclose(piece, _chains(chains)[0])
