"""Port of s1angle_test.cc: exact degree/radian/E5/E6/E7 conversion
identities, normalization, arithmetic, trigonometry, encoding."""

import math

import numpy as np
import pytest

from s2geometry_spark.kernel.region import LatLng
from s2geometry_spark.kernel.s1angle import S1Angle


def test_default_constructor():
    assert S1Angle().radians == 0


def test_infinity():
    assert S1Angle.from_radians(1e30) < S1Angle.infinity()
    assert -S1Angle.infinity() < S1Angle.zero()
    assert S1Angle.infinity() == S1Angle.infinity()


def test_zero():
    assert S1Angle.from_radians(0) == S1Angle.zero()


def test_pi_radians_exactly_180_degrees():
    assert S1Angle.from_radians(math.pi).radians == math.pi
    assert S1Angle.from_radians(math.pi).degrees() == 180.0
    assert S1Angle.from_degrees(180).radians == math.pi
    assert S1Angle.from_degrees(180).degrees() == 180.0

    assert S1Angle.from_radians(math.pi / 2).degrees() == 90.0
    assert S1Angle.from_radians(-math.pi / 2).degrees() == -90.0
    assert S1Angle.from_degrees(-45).radians == -math.pi / 4


def test_e5_e6_e7_representations():
    assert S1Angle.e5(-4500000).radians == pytest.approx(
        S1Angle.from_degrees(-45).radians, abs=0, rel=1e-15)
    assert S1Angle.e6(-60000000).radians == pytest.approx(
        S1Angle.from_degrees(-60).radians, abs=0, rel=1e-15)
    assert S1Angle.e7(750000000).radians == pytest.approx(
        S1Angle.from_degrees(75).radians, abs=0, rel=1e-15)
    assert S1Angle.from_degrees(-172.56123).get_e5() == -17256123
    assert S1Angle.from_degrees(12.345678).get_e6() == 12345678
    assert S1Angle.from_degrees(-12.3456789).get_e7() == -123456789


def test_e6_e7_representations_unsigned():
    assert S1Angle.unsigned_e6(60000000).radians == pytest.approx(
        S1Angle.from_degrees(60).radians, abs=0, rel=1e-15)
    assert S1Angle.unsigned_e6((-60000000) & 0xFFFFFFFF).radians == (
        pytest.approx(S1Angle.from_degrees(-60).radians, abs=0, rel=1e-15))
    assert S1Angle.unsigned_e7(750000000).radians == pytest.approx(
        S1Angle.from_degrees(75).radians, abs=0, rel=1e-15)
    assert S1Angle.unsigned_e7((-750000000) & 0xFFFFFFFF).radians == (
        pytest.approx(S1Angle.from_degrees(-75).radians, abs=0, rel=1e-15))


def test_normalize_correctly_canonicalizes_angles():
    assert S1Angle.from_degrees(360.0).normalized().degrees() == (
        pytest.approx(0.0, abs=1e-13))
    assert S1Angle.from_degrees(-90.0).normalized().degrees() == (
        pytest.approx(-90.0))
    assert S1Angle.from_degrees(-180.0).normalized().degrees() == (
        pytest.approx(180.0))
    assert S1Angle.from_degrees(180.0).normalized().degrees() == (
        pytest.approx(180.0))
    assert S1Angle.from_degrees(540.0).normalized().degrees() == (
        pytest.approx(180.0))
    assert S1Angle.from_degrees(-270.0).normalized().degrees() == (
        pytest.approx(90.0))


def test_arithmetic_operations_on_angles():
    assert S1Angle.from_radians(-0.3).abs().radians == pytest.approx(0.3)
    assert abs(S1Angle.from_radians(-0.3)).radians == pytest.approx(0.3)
    assert (-S1Angle.from_radians(0.1)).radians == pytest.approx(-0.1)
    assert (S1Angle.from_radians(0.1)
            + S1Angle.from_radians(0.3)).radians == pytest.approx(0.4)
    assert (S1Angle.from_radians(0.1)
            - S1Angle.from_radians(0.3)).radians == pytest.approx(-0.2)
    assert (2 * S1Angle.from_radians(0.3)).radians == pytest.approx(0.6)
    assert (S1Angle.from_radians(0.3) * 2).radians == pytest.approx(0.6)
    assert (S1Angle.from_radians(0.3) / 2).radians == pytest.approx(0.15)
    assert (S1Angle.from_radians(0.3)
            / S1Angle.from_radians(0.6)) == pytest.approx(0.5)

    tmp = S1Angle.from_radians(1.0)
    tmp += S1Angle.from_radians(0.5)
    assert tmp.radians == pytest.approx(1.5)
    tmp -= S1Angle.from_radians(1.0)
    assert tmp.radians == pytest.approx(0.5)
    tmp *= 5
    assert tmp.radians == pytest.approx(2.5)
    tmp /= 2
    assert tmp.radians == pytest.approx(1.25)


def test_trigonometry():
    assert S1Angle.from_degrees(0).cos() == pytest.approx(1)
    assert S1Angle.from_degrees(90).sin() == pytest.approx(1)
    assert S1Angle.from_degrees(45).tan() == pytest.approx(1)

    # SinCos is exactly (sin, cos) (s1angle_test.cc:136-142).
    for k in range(-1000, 1001):
        angle = S1Angle.from_degrees(k)
        s, c = angle.sin_cos()
        assert s == angle.sin(), k
        assert c == angle.cos(), k


def test_constructors_that_measure_angles():
    assert S1Angle.between_points(
        (1, 0, 0), (0, 0, 2)).radians == pytest.approx(math.pi / 2)
    assert S1Angle.between_points((1, 0, 0), (1, 0, 0)).radians == 0.0
    assert S1Angle.between_latlngs(
        LatLng.from_degrees(20, 20), LatLng.from_degrees(70, 20)
    ).degrees() == pytest.approx(50.0, abs=1e-13)


def test_formatting():
    assert repr(S1Angle.from_degrees(180.0)) == "180.0000000"


def test_roundtrip_encoding_succeeds():
    angle = S1Angle.from_radians(4.4)
    buf = angle.encode()
    assert S1Angle.decode(buf) == angle


def test_decode_fails_with_truncated_buffer():
    buf = S1Angle.from_radians(1.1).encode()
    with pytest.raises(ValueError):
        S1Angle.decode(buf[:-2])


def test_degrees_vs_e6():
    """Exact Degrees(n) == E6(1000000 n) (s1angle_test.cc:233-237)."""
    for i in range(181):
        assert S1Angle.from_degrees(i) == S1Angle.e6(1000000 * i)


def test_degrees_vs_e7():
    for i in range(181):
        assert S1Angle.from_degrees(i) == S1Angle.e7(10000000 * i)


def test_e6_vs_e7():
    """E6(n) == E7(10 n) exactly (s1angle_test.cc:249-256); deterministic
    seed replaces absl::BitGen."""
    rng = np.random.RandomState(5)
    for _ in range(1000):
        i = int(rng.randint(0, 180000000))
        assert S1Angle.e6(i) == S1Angle.e7(10 * i)


def test_degrees_vs_radians():
    """The exact identities documented in s1angle.h:56-66."""
    for k in range(-8, 9):
        assert S1Angle.from_degrees(45 * k) == (
            S1Angle.from_radians(k * math.pi / 4))
        assert S1Angle.from_degrees(45 * k).degrees() == 45 * k
    for k in range(31):
        n = 1 << k
        assert S1Angle.from_degrees(180.0 / n) == (
            S1Angle.from_radians(math.pi / n))
        assert S1Angle.from_degrees(60.0 / n) == (
            S1Angle.from_radians(math.pi / (3.0 * n)))
        assert S1Angle.from_degrees(36.0 / n) == (
            S1Angle.from_radians(math.pi / (5.0 * n)))
        assert S1Angle.from_degrees(20.0 / n) == (
            S1Angle.from_radians(math.pi / (9.0 * n)))
        assert S1Angle.from_degrees(4.0 / n) == (
            S1Angle.from_radians(math.pi / (45.0 * n)))
    # Spot-check non-identities.
    assert S1Angle.from_degrees(3) != S1Angle.from_radians(math.pi / 60)
    assert S1Angle.from_degrees(60).degrees() != 60


def test_hash_distinct():
    angles = [
        S1Angle.zero(),
        S1Angle.from_radians(1),
        S1Angle.from_radians(-1),
        S1Angle.from_degrees(90),
        S1Angle.from_degrees(180),
        S1Angle.from_degrees(-90),
        S1Angle.infinity(),
    ]
    assert len({hash(a) for a in angles}) == len(angles)
    assert hash(S1Angle.from_degrees(90)) == hash(S1Angle.from_degrees(90))
