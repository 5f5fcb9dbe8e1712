"""Port of the s2polygon_test.cc InitToSnapped family:
InitToSnappedWithSnapLevel, InitToSnappedIsValid_A/B/C/D,
InitToSnappedSupportsEmptyPolygons, InitToSnappedDoesNotRotateVertices.
InitToSnapped = kernel.booleans.init_to_snapped (full builder snap with
the exact Voronoi edge phase, s2polygon.cc:1048-1056)."""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel import booleans as B
from s2geometry_spark.kernel.builder import S2CellIdSnapFunction
from s2geometry_spark.kernel.contains import Polygon, parse_polygon
from s2geometry_spark.kernel.coords import xyz_to_latlng
from s2geometry_spark.kernel.metrics import MAX_DIAG
from s2geometry_spark.kernel.validation import find_polygon_validation_error

K_MAX_SNAP_RADIUS_RAD = math.radians(70)  # SnapFunction::kMaxSnapRadius


def test_init_to_snapped_with_snap_level():
    """InitToSnappedWithSnapLevel (test.cc): snapping the two-loop
    polygon at EVERY level yields a valid polygon that approximately
    contains the original within min(kMaxDiag(level), kMaxSnapRadius)."""
    poly = parse_polygon("0:0, 0:2, 2:0; 0:0, 0:-2, -2:-2, -2:0")
    for level in range(0, 31):
        snapped = B.init_to_snapped(poly, level)
        assert find_polygon_validation_error(snapped) is None, level
        merge_radius = min(MAX_DIAG.get_value(level), K_MAX_SNAP_RADIUS_RAD)
        assert B.approx_contains(snapped, poly, merge_radius), level


def test_init_to_snapped_is_valid():
    """InitToSnappedIsValid_A/B/C/D (test.cc): four real-world polygons
    whose leaf-level snaps used to produce invalid output."""
    cases = [
        # A
        "53.1328020478452:6.39444903453293, 53.1328019:6.394449, "
        "53.1327091:6.3961766, 53.1313753:6.3958652, 53.1312825:6.3975924, "
        "53.132616:6.3979042, 53.1326161348736:6.39790423150577",
        # B
        "51.6621651:4.9858102, 51.6620965:4.9874227, 51.662028:4.9890355, 51.6619796006122:4.99017864445347, 51.6622335420397:4.98419752545216, 51.6622334:4.9841975; 51.66189957578:4.99206198576131, 51.6618911:4.9922612, 51.6618224:4.9938741, 51.6605122:4.993639, 51.6604437:4.9952519, 51.6603751:4.9968648, 51.6603064:4.9984777, 51.6602379:5.0000907, 51.660169:5.0017037, 51.6601003:5.0033165, 51.6600318:5.0049298, 51.659963:5.0065427, 51.6598943:5.0081561, 51.6612044207178:5.00839208571886, 51.6612732068132:5.00677860122814, 51.6612732:5.0067786, 51.6613418:5.0051654, 51.6614106:5.0035525, 51.6614793:5.0019393, 51.6615479:5.0003263, 51.6615946694783:4.99923124520759, 51.6616389353165:4.99819106536521, 51.6616852:4.9971, 51.6617538:4.995487, 51.661753964726:4.99548702962593",
        # C
        "53.5316236236404:19.5841192796855, 53.5416584:19.5915903, 53.5416584189104:19.5915901888287; 53.5416584:19.5915903, 53.5363122:19.62299, 53.5562817:19.6378935, 53.5616342:19.606474; 53.5616342:19.606474, 53.5916039:19.6288326, 53.5912689:19.6307982, 53.5925176:19.6317308, 53.5928526:19.6297652, 53.6015949:19.6362943, 53.6015950436033:19.6362944072725, 53.6015950814439:19.6362941852262, 53.5616342380536:19.6064737764314",
        # D
        "52.0909316:4.8673826, 52.0909317627574:4.86738262858533, 52.0911338452911:4.86248482549567, 52.0911337:4.8624848, 52.0910665:4.8641176, 52.090999:4.8657502",
    ]
    for name, s in zip("ABCD", cases):
        poly = parse_polygon(s)
        assert find_polygon_validation_error(poly) is None, name
        snapped = B.init_to_snapped(poly)
        assert find_polygon_validation_error(snapped) is None, name


def test_init_to_snapped_supports_empty_polygons():
    """InitToSnappedSupportsEmptyPolygons (test.cc)."""
    snapped = B.init_to_snapped(Polygon([]))
    assert snapped.is_empty


def test_init_to_snapped_does_not_rotate_vertices():
    """InitToSnappedDoesNotRotateVertices (test.cc): leaf-level snapping
    keeps the first vertex FIRST (no cyclic rotation of hole loops), its
    E7 coordinates unchanged, and is idempotent."""
    from s2geometry_spark.kernel.s1angle import S1Angle

    poly = parse_polygon(
        "49.9305505:-124.8345463, 49.9307448:-124.8299657, "
        "49.9332101:-124.8301996, 49.9331224:-124.8341368; "
        "49.9311087:-124.8327042, 49.9318176:-124.8312621, "
        "49.9318866:-124.8334451"
    )
    snapped = B.init_to_snapped(poly)

    def e7_latlng(p):
        lat, lng = xyz_to_latlng(p[None, 0], p[None, 1], p[None, 2])
        return (
            S1Angle.from_degrees(float(lat[0])).get_e7(),
            S1Angle.from_degrees(float(lng[0])).get_e7(),
        )

    assert e7_latlng(poly.loops[0].vertices[0]) == e7_latlng(
        snapped.loops[0].vertices[0]
    )
    # idempotent: snapping the snapped polygon is a bit-exact fixed point
    snapped2 = B.init_to_snapped(snapped)
    assert len(snapped.loops) == len(snapped2.loops)
    for l1, l2 in zip(snapped.loops, snapped2.loops):
        assert np.array_equal(l1.vertices, l2.vertices)
