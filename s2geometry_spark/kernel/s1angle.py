"""S1Angle (s1angle.h/.cc): a 1-D angle as a double in radians, with the
reference's exact degree/radian identities and E5/E6/E7 integer forms.

The data plane works in raw radian columns (functions/columns.py,
kernel/distance.py); this value class is the driver-side API surface with
the exact conversion guarantees documented in s1angle.h:46-66:
Degrees(n) == E6(1000000*n) == E7(10000000*n), Degrees(180) == Radians(pi),
and Degrees(45*k) == Radians(k*pi/4) for k in 0..8.
"""

from __future__ import annotations

import math
import struct

import numpy as np

_PI = math.pi


class S1Angle:
    """Angle in radians (s1angle.h:70-230)."""

    __slots__ = ("radians",)

    def __init__(self, radians: float = 0.0):
        self.radians = float(radians)

    # ---- constructors (s1angle.h:355-385)
    @staticmethod
    def from_radians(r: float) -> "S1Angle":
        return S1Angle(r)

    @staticmethod
    def from_degrees(d: float) -> "S1Angle":
        """Degrees: (M_PI / 180) * degrees (s1angle.h:363-365)."""
        return S1Angle((_PI / 180) * d)

    @staticmethod
    def e5(e5: int) -> "S1Angle":
        return S1Angle.from_degrees(1e-5 * e5)

    @staticmethod
    def e6(e6: int) -> "S1Angle":
        return S1Angle.from_degrees(1e-6 * e6)

    @staticmethod
    def e7(e7: int) -> "S1Angle":
        return S1Angle.from_degrees(1e-7 * e7)

    @staticmethod
    def unsigned_e6(e6: int) -> "S1Angle":
        """UnsignedE6: reinterpret a uint32 bit pattern as int32
        (s1angle.h:379-381)."""
        return S1Angle.e6(int(np.int32(np.uint32(e6))))

    @staticmethod
    def unsigned_e7(e7: int) -> "S1Angle":
        return S1Angle.e7(int(np.int32(np.uint32(e7))))

    @staticmethod
    def zero() -> "S1Angle":
        return S1Angle(0.0)

    @staticmethod
    def infinity() -> "S1Angle":
        return S1Angle(math.inf)

    @staticmethod
    def between_points(x, y) -> "S1Angle":
        """S1Angle(S2Point, S2Point): atan2(|x cross y|, x dot y)
        (s1angle.cc:30-32, vector.h Angle)."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        c = np.cross(x, y)
        return S1Angle(math.atan2(float(np.linalg.norm(c)),
                                  float(np.dot(x, y))))

    @staticmethod
    def between_latlngs(x, y) -> "S1Angle":
        """S1Angle(S2LatLng, S2LatLng) (s1angle.cc:34-36)."""
        return S1Angle(x.get_distance(y))

    # ---- accessors
    def degrees(self) -> float:
        """(180 / M_PI) * radians (s1angle.h:239-241)."""
        return (180 / _PI) * self.radians

    def get_e5(self) -> int:
        """MathUtil::Round<int32>(1e5 * degrees()) — round-half-even like
        std::rint (s1angle.h:248-252)."""
        return int(np.rint(1e5 * self.degrees()))

    def get_e6(self) -> int:
        return int(np.rint(1e6 * self.degrees()))

    def get_e7(self) -> int:
        return int(np.rint(1e7 * self.degrees()))

    # ---- normalization (s1angle.cc:38-47)
    def is_normalized(self) -> bool:
        return -_PI < self.radians <= _PI

    def normalized(self) -> "S1Angle":
        r = math.remainder(self.radians, 2.0 * _PI)
        if r <= -_PI:
            r = _PI
        return S1Angle(r)

    # ---- arithmetic (s1angle.h:275-330)
    def __neg__(self) -> "S1Angle":
        return S1Angle(-self.radians)

    def __abs__(self) -> "S1Angle":
        return S1Angle(abs(self.radians))

    def abs(self) -> "S1Angle":
        return S1Angle(abs(self.radians))

    def __add__(self, o: "S1Angle") -> "S1Angle":
        return S1Angle(self.radians + o.radians)

    def __sub__(self, o: "S1Angle") -> "S1Angle":
        return S1Angle(self.radians - o.radians)

    def __mul__(self, s) -> "S1Angle":
        return S1Angle(self.radians * float(s))

    __rmul__ = __mul__

    def __truediv__(self, o):
        """angle / scalar -> angle; angle / angle -> double ratio
        (s1angle.h:303-309)."""
        if isinstance(o, S1Angle):
            return self.radians / o.radians
        return S1Angle(self.radians / float(o))

    # ---- comparisons (total order on radians)
    def __eq__(self, o) -> bool:
        if not isinstance(o, S1Angle):
            return NotImplemented
        return self.radians == o.radians

    def __lt__(self, o: "S1Angle") -> bool:
        return self.radians < o.radians

    def __le__(self, o: "S1Angle") -> bool:
        return self.radians <= o.radians

    def __gt__(self, o: "S1Angle") -> bool:
        return self.radians > o.radians

    def __ge__(self, o: "S1Angle") -> bool:
        return self.radians >= o.radians

    def __hash__(self):
        return hash(("S1Angle", self.radians))

    # ---- trigonometry (s1angle.h:331-345)
    def sin(self) -> float:
        return math.sin(self.radians)

    def cos(self) -> float:
        return math.cos(self.radians)

    def tan(self) -> float:
        return math.tan(self.radians)

    def sin_cos(self) -> tuple[float, float]:
        """SinCosPair — exactly (sin, cos) (s1angle.h:187-196)."""
        return (math.sin(self.radians), math.cos(self.radians))

    # ---- formatting / encoding
    def __repr__(self) -> str:
        """operator<<: degrees with 7 digits after the point
        (s1angle.cc:64-66)."""
        return f"{self.degrees():.7f}"

    def encode(self) -> bytes:
        """Coder::Encode: the raw little-endian double (s1angle.cc:49-52)."""
        return struct.pack("<d", self.radians)

    @staticmethod
    def decode(buf: bytes) -> "S1Angle":
        """Coder::Decode; raises ValueError on a truncated buffer
        (s1angle.cc:54-62)."""
        if len(buf) < 8:
            raise ValueError("Could not decode S1Angle.")
        return S1Angle(struct.unpack("<d", buf[:8])[0])
