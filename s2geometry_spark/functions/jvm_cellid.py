"""Pure-JVM leaf-cell encoder: lat/lng → biased S2 cell id with zero
Python in the path.

The whole pipeline of s2cell_id.cc:309-317 — trig, cube-face projection,
quadratic ST, quantization, and the 8-round Hilbert lookup — expressed
as Column expressions, with the 1024-entry lookup table inlined as an
array literal (the JVM constant-folds it; gathers stay inside
whole-stage codegen).

Status: CORRECT (bit-identical to the Arrow kernel on 200k random
points, leaf level included) but NOT the production path.  Measured
~60× slower than the Arrow pUDF: the i/j/u/v sub-expressions are
re-inlined into each of the 8 Hilbert rounds by Catalyst's project
collapsing, exploding the codegen tree (no cross-round common
subexpression elimination).  Kept as the documented experiment that
justifies the Arrow-batched NumPy kernel (functions/udfs.py, ~3.6M
rows/s at 16 cores) as the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..kernel.hilbert import LOOKUP_POS

_MAX = 1 << 30


def _lut() -> Column:
    # A single foldable array Literal (NOT F.array(*lits), which is a
    # CreateArray expression re-evaluated per row — 35× slower measured).
    return F.lit([int(v) for v in LOOKUP_POS])


def leaf_cell_jvm(lat_deg: Column, lng_deg: Column) -> Column:
    """Biased int64 leaf cell id, 100% JVM."""
    phi = F.radians(lat_deg)
    theta = F.radians(lng_deg)
    cosphi = F.cos(phi)
    x = F.cos(theta) * cosphi
    y = F.sin(theta) * cosphi
    z = F.sin(phi)

    ax, ay, az = F.abs(x), F.abs(y), F.abs(z)
    axis = F.when((ax > ay) & (ax > az), 0).when(ay > az, 1).otherwise(2)
    comp = F.when(axis == 0, x).when(axis == 1, y).otherwise(z)
    face = (F.when(comp < 0, axis + 3).otherwise(axis)).cast("int")

    # ValidFaceXYZtoUV (s2coords.h:389-403)
    u = (
        F.when(face == 0, y / x)
        .when(face == 1, -x / y)
        .when(face == 2, -x / z)
        .when(face == 3, z / x)
        .when(face == 4, z / y)
        .otherwise(-y / z)
    )
    v = (
        F.when(face == 0, z / x)
        .when(face == 1, z / y)
        .when(face == 2, -y / z)
        .when(face == 3, y / x)
        .when(face == 4, -x / y)
        .otherwise(-x / z)
    )

    def uv_to_st(w):
        return F.when(w >= 0, 0.5 * F.sqrt(1.0 + 3.0 * w)).otherwise(
            1.0 - 0.5 * F.sqrt(1.0 - 3.0 * w)
        )

    def st_to_ij(s):
        scaled = F.floor(F.lit(float(_MAX)) * s).cast("long")
        return F.greatest(F.lit(0), F.least(F.lit(_MAX - 1), scaled))

    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))

    # FromFaceIJ (s2cell_id.cc:267-307), 8 lookup rounds; pos accumulates
    # the 60 Hilbert bits; final biased id = (face-4)·2^61 + pos·2 + 1.
    lut = _lut()
    bits = face.bitwiseAND(F.lit(1)).cast("long")
    pos = F.lit(0).cast("long")
    for k in range(7, -1, -1):
        key = (
            F.shiftright(i, 4 * k).bitwiseAND(F.lit(15)) * F.lit(64)
            + F.shiftright(j, 4 * k).bitwiseAND(F.lit(15)) * F.lit(4)
            + bits
        )
        val = F.element_at(lut, (key + 1).cast("int")).cast("long")
        pos = pos + F.shiftleft(F.shiftright(val, 2), 8 * k)
        bits = val.bitwiseAND(F.lit(3))
    return (
        (face.cast("long") - 4) * F.lit(1 << 61) + pos * 2 + 1
    ).cast("long")
