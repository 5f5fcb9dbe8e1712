"""s2metrics_test.cc + s1chord_angle_test.cc ports: the full metric
table consistency matrix (min ≤ avg ≤ max, aspect bounds, level
round-trips at every boundary) and S1ChordAngle arithmetic /
trigonometry / successor semantics.
"""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernel import metrics as M
from s2geometry_spark.kernel.distance import (
    angle_to_chord2,
    chord2_add,
    chord2_cos,
    chord2_plus_error,
    chord2_predecessor,
    chord2_sin,
    chord2_sub,
    chord2_successor,
    chord2_tan,
    chord2_to_angle,
)

MAX_LEVEL = 30


def test_metrics_table():
    """TEST(S2, Metrics) (s2metrics_test.cc:34-118)."""
    bundles = [
        (M.MIN_ANGLE_SPAN, M.MAX_ANGLE_SPAN, M.AVG_ANGLE_SPAN),
        (M.MIN_WIDTH, M.MAX_WIDTH, M.AVG_WIDTH),
        (M.MIN_EDGE, M.MAX_EDGE, M.AVG_EDGE),
        (M.MIN_DIAG, M.MAX_DIAG, M.AVG_DIAG),
        (M.MIN_AREA, M.MAX_AREA, M.AVG_AREA),
    ]
    for mn, mx, av in bundles:
        assert mn.deriv <= av.deriv <= mx.deriv

    assert 1 <= M.MAX_EDGE_ASPECT <= M.MAX_EDGE.deriv / M.MIN_EDGE.deriv
    assert 1 <= M.MAX_DIAG_ASPECT <= M.MAX_DIAG.deriv / M.MIN_DIAG.deriv

    def leq(a, b):
        assert a[0].deriv <= b[0].deriv
        assert a[1].deriv <= b[1].deriv
        assert a[2].deriv <= b[2].deriv

    width = (M.MIN_WIDTH, M.MAX_WIDTH, M.AVG_WIDTH)
    angle_span = (M.MIN_ANGLE_SPAN, M.MAX_ANGLE_SPAN, M.AVG_ANGLE_SPAN)
    edge = (M.MIN_EDGE, M.MAX_EDGE, M.AVG_EDGE)
    diag = (M.MIN_DIAG, M.MAX_DIAG, M.AVG_DIAG)
    leq(width, angle_span)
    leq(width, edge)
    leq(edge, diag)

    assert M.MIN_AREA.deriv >= M.MIN_WIDTH.deriv * M.MIN_EDGE.deriv - 1e-15
    assert M.MAX_AREA.deriv <= M.MAX_WIDTH.deriv * M.MAX_EDGE.deriv + 1e-15

    assert M.MIN_WIDTH.get_level_for_max_value(-1) == MAX_LEVEL
    assert M.MAX_WIDTH.get_level_for_max_value(-1) == MAX_LEVEL
    assert M.MIN_WIDTH.get_level_for_max_value(0) == MAX_LEVEL
    assert M.MAX_WIDTH.get_level_for_max_value(0) == MAX_LEVEL
    assert M.MIN_WIDTH.get_level_for_min_value(4) == 0
    assert M.MAX_WIDTH.get_level_for_min_value(4) == 0
    assert M.MIN_WIDTH.get_level_for_min_value(math.inf) == 0
    assert M.MAX_WIDTH.get_level_for_min_value(math.inf) == 0

    for level in range(-2, MAX_LEVEL + 4):
        width = M.MIN_WIDTH.deriv * 2.0 ** (-level)
        if level >= MAX_LEVEL + 3:
            width = 0
        expected = max(0, min(MAX_LEVEL, level))
        assert M.MIN_WIDTH.get_level_for_max_value(width) == expected
        assert M.MIN_WIDTH.get_level_for_min_value(width) == expected
        assert M.MIN_WIDTH.get_closest_level(width) == expected
        assert M.MIN_WIDTH.get_level_for_max_value(1.2 * width) == expected
        assert M.MIN_WIDTH.get_level_for_min_value(0.8 * width) == expected
        assert M.MIN_WIDTH.get_closest_level(1.2 * width) == expected
        assert M.MIN_WIDTH.get_closest_level(0.8 * width) == expected

        area = M.MIN_AREA.deriv * 4.0 ** (-level)
        if level <= -3:
            area = 0
        assert M.MIN_AREA.get_level_for_max_value(area) == expected
        assert M.MIN_AREA.get_level_for_min_value(area) == expected
        assert M.MIN_AREA.get_closest_level(area) == expected
        assert M.MIN_AREA.get_level_for_max_value(1.2 * area) == expected
        assert M.MIN_AREA.get_level_for_min_value(0.8 * area) == expected
        assert M.MIN_AREA.get_closest_level(1.2 * area) == expected
        assert M.MIN_AREA.get_closest_level(0.8 * area) == expected


# --------------------------------------------------------- chord angles
def deg2(d: float) -> float:
    return float(angle_to_chord2(math.radians(d)))


def to_deg(l2: float) -> float:
    return math.degrees(float(chord2_to_angle(l2)))


def test_successor_predecessor():
    """s1chord_angle_test.cc:139-160 (finite domain: our kernel clamps
    at [0, 4] rather than modeling Negative/Infinity sentinels)."""
    x = 0.0
    for _ in range(10):
        nxt = float(chord2_successor(x))
        assert nxt > x or x >= 4.0
        x = nxt
    x = 4.0
    for _ in range(10):
        prev = float(chord2_predecessor(x))
        assert prev < x or x <= 0.0
        x = prev
    assert chord2_successor(4.0) == 4.0
    assert chord2_predecessor(0.0) == -1.0  # Negative sentinel


def test_arithmetic():
    """s1chord_angle_test.cc:161-196."""
    zero = 0.0
    d30, d60, d90, d120 = deg2(30), deg2(60), deg2(90), deg2(120)
    d180 = 4.0
    assert to_deg(chord2_add(zero, zero)) == 0
    assert to_deg(chord2_sub(zero, zero)) == 0
    assert to_deg(chord2_sub(d60, d60)) == 0
    assert to_deg(chord2_sub(d180, d180)) == 0
    assert to_deg(chord2_sub(zero, d60)) == 0
    assert to_deg(chord2_sub(d30, d90)) == 0
    assert abs(to_deg(chord2_add(d60, zero)) - 60) < 1e-12
    assert abs(to_deg(chord2_sub(d60, zero)) - 60) < 1e-12
    assert abs(to_deg(chord2_add(zero, d60)) - 60) < 1e-12
    assert abs(to_deg(chord2_add(d30, d60)) - 90) < 1e-12
    assert abs(to_deg(chord2_add(d60, d30)) - 90) < 1e-12
    assert abs(to_deg(chord2_sub(d90, d30)) - 60) < 1e-12
    assert abs(to_deg(chord2_sub(d90, d60)) - 30) < 1e-12
    assert to_deg(chord2_add(d180, zero)) == 180
    assert to_deg(chord2_sub(d180, zero)) == 180
    assert to_deg(chord2_add(d90, d90)) == 180
    assert to_deg(chord2_add(d120, d90)) == 180
    assert to_deg(chord2_add(d120, d120)) == 180
    assert to_deg(chord2_add(d30, d180)) == 180
    assert to_deg(chord2_add(d180, d180)) == 180


def test_arithmetic_precision():
    """s1chord_angle_test.cc:197-212: accuracy near π/2."""
    eps_rad = 1e-15
    k_eps = float(angle_to_chord2(eps_rad))
    k90 = 2.0
    k_max_error = 2 * 2.220446049250313e-16
    k90_minus = chord2_sub(k90, k_eps)
    k90_plus = chord2_add(k90, k_eps)
    assert abs(
        float(chord2_to_angle(k90_minus)) - (math.pi / 2 - eps_rad)
    ) <= k_max_error
    assert abs(
        float(chord2_to_angle(k90_plus)) - (math.pi / 2 + eps_rad)
    ) <= k_max_error
    assert abs(
        float(chord2_to_angle(chord2_sub(k90, k90_minus))) - eps_rad
    ) <= k_max_error
    assert abs(
        float(chord2_to_angle(chord2_sub(k90_plus, k90))) - eps_rad
    ) <= k_max_error
    assert abs(
        float(chord2_to_angle(chord2_add(k90_minus, k_eps))) - math.pi / 2
    ) <= k_max_error


def test_trigonometry():
    """s1chord_angle_test.cc:213-246."""
    k_iters = 20
    for i in range(k_iters + 1):
        radians = math.pi * i / k_iters
        l2 = float(angle_to_chord2(radians))
        assert abs(math.sin(radians) - chord2_sin(l2)) <= 1e-15
        assert abs(math.cos(radians) - chord2_cos(l2)) <= 1e-15
        assert abs(
            math.atan(math.tan(radians)) - math.atan(chord2_tan(l2))
        ) <= 1e-15
    assert chord2_sin(2.0) == 1
    assert chord2_cos(2.0) == 0
    assert chord2_tan(2.0) == math.inf
    assert chord2_sin(4.0) == 0
    assert chord2_cos(4.0) == -1
    assert chord2_tan(4.0) == 0


def test_plus_error():
    """s1chord_angle_test.cc:247-257."""
    assert chord2_plus_error(-1.0, 5) == -1.0  # Negative stays
    assert chord2_plus_error(math.inf, -5) == math.inf
    assert chord2_plus_error(4.0, 5) == 4.0
    assert chord2_plus_error(0.0, -5) == 0.0
    assert chord2_plus_error(1.0, 0.25) == 1.25
    assert chord2_plus_error(1.0, -0.25) == 0.75


def test_from_length2():
    # s1chord_angle_test.cc:86-92: length2 clamps to 4 (=180 degrees)
    import math

    from s2geometry_spark.kernel.distance import chord2_to_angle

    assert math.degrees(float(chord2_to_angle(0.0))) == 0
    assert abs(math.degrees(float(chord2_to_angle(1.0))) - 60) < 1e-13
    assert abs(math.degrees(float(chord2_to_angle(2.0))) - 90) < 1e-13
    assert math.degrees(float(chord2_to_angle(min(4.0, 4.0)))) == 180
    assert math.degrees(float(chord2_to_angle(min(4.0, 5.0)))) == 180


def test_to_from_s1angle():
    import math

    from s2geometry_spark.kernel.distance import (
        angle_to_chord2,
        chord2_to_angle,
    )

    assert float(chord2_to_angle(angle_to_chord2(0.0))) == 0
    assert float(angle_to_chord2(math.pi)) == 4
    assert float(chord2_to_angle(4.0)) == math.pi
    assert abs(float(chord2_to_angle(angle_to_chord2(1.0))) - 1.0) < 1e-15


def test_two_point_constructor():
    # s1chord_angle_test.cc:72-84 over deterministic frames
    import math

    import numpy as np

    from s2geometry_spark.kernel.distance import chord2, chord2_to_angle
    from s2geometry_spark.kernel.polyline import _get_frame

    rng = np.random.RandomState(3)
    for _ in range(100):
        z = rng.randn(3)
        z /= np.linalg.norm(z)
        frame = _get_frame(z)
        x, y = frame[:, 0], frame[:, 1]
        assert float(chord2(z[None], z[None])[0]) == 0.0
        anti = np.minimum(4.0, chord2((-z)[None], z[None]))
        assert abs(float(chord2_to_angle(anti)[0]) - math.pi) < 1e-7
        assert abs(float(chord2_to_angle(chord2(x[None], z[None]))[0])
                   - math.pi / 2) < 1e-15 * math.pi
        w = (y + z) / np.linalg.norm(y + z)
        assert abs(float(chord2_to_angle(chord2(w[None], z[None]))[0])
                   - math.pi / 4) < 4e-16 * math.pi


def test_s2point_constructor_max_error_bound():
    # s1chord_angle_test.cc:258-277, with the exact comparison replaced
    # by an 80-bit longdouble re-derivation of the true chord length:
    # the claimed bound must cover the observed error for every pair
    import numpy as np

    from s2geometry_spark.kernel.distance import (
        chord2_plus_error,
        s2point_constructor_max_error,
    )

    rng = np.random.RandomState(77)
    for it in range(20000):
        x = rng.randn(3)
        x /= np.linalg.norm(x)
        y = rng.randn(3)
        y /= np.linalg.norm(y)
        if it % 10 == 0:
            # nearly identical or antipodal pairs
            t = 1e-15 * rng.uniform()
            y = x + t * (y - x)
            y /= np.linalg.norm(y)
            if it % 20 == 0:
                y = -y
        d2 = min(4.0, float(((x - y) ** 2).sum()))
        err = float(s2point_constructor_max_error(d2))
        # true chord^2 between the EXACT unit projections of x and y,
        # in longdouble
        xl = x.astype(np.longdouble)
        yl = y.astype(np.longdouble)
        xl /= np.sqrt((xl * xl).sum())
        yl /= np.sqrt((yl * yl).sum())
        true_d2 = float(((xl - yl) ** 2).sum())
        assert true_d2 <= chord2_plus_error(d2, err) + 1e-30, it
