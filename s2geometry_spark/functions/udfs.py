"""Vectorized pandas/Arrow UDFs wrapping the NumPy cell-math kernel.

Every UDF operates on whole Arrow batches via NumPy — never per-row
Python.  The Hilbert lookup tables are module-level (built once per
executor process, 4 KB, L1-resident like the reference's
s2cell_id.cc:71-75).

Naming: ``*_s`` columns are biased int64 cell ids (functions/columns.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..kernel import cellid as K


@F.pandas_udf(LongType())
def s2_cell_from_latlng(lat: pd.Series, lng: pd.Series) -> pd.Series:
    """lat/lng degrees → biased leaf cell id (s2cell_id.cc:309-317 path)."""
    ids = K.from_latlng(lat.to_numpy(np.float64), lng.to_numpy(np.float64))
    return pd.Series(K.bias(ids))


def s2_cell_at_level(lat_col, lng_col, level: int):
    """Column helper: leaf from lat/lng, then JVM-side parent to `level`."""
    from . import columns as CC

    leaf = s2_cell_from_latlng(lat_col, lng_col)
    if level >= 30:
        return leaf
    return CC.parent(leaf, level)


@F.pandas_udf(StructType([
    StructField("lat", DoubleType()),
    StructField("lng", DoubleType()),
]))
def s2_cell_center_latlng(cell_s: pd.Series) -> pd.DataFrame:
    """Cell center (ToLatLng, s2cell_id.cc:375-393), degrees."""
    ids = K.unbias(cell_s.to_numpy(np.int64))
    lat, lng = K.to_latlng(ids)
    return pd.DataFrame({"lat": lat, "lng": lng})


@F.pandas_udf(StructType([
    StructField("x", DoubleType()),
    StructField("y", DoubleType()),
    StructField("z", DoubleType()),
]))
def s2_latlng_to_xyz(lat: pd.Series, lng: pd.Series) -> pd.DataFrame:
    """Unit direction vector (s2latlng.cc:68-76)."""
    x, y, z = __import__(
        "s2geometry_spark.kernel.coords", fromlist=["latlng_to_xyz"]
    ).latlng_to_xyz(lat.to_numpy(np.float64), lng.to_numpy(np.float64))
    return pd.DataFrame({"x": x, "y": y, "z": z})


@F.pandas_udf(StructType([
    StructField("x", DoubleType()),
    StructField("y", DoubleType()),
    StructField("z", DoubleType()),
]))
def s2_cell_center_xyz(cell_s: pd.Series) -> pd.DataFrame:
    ids = K.unbias(cell_s.to_numpy(np.int64))
    x, y, z = K.to_point(ids)
    return pd.DataFrame({"x": x, "y": y, "z": z})


@F.pandas_udf(StructType([
    StructField("cell", LongType()),
    StructField("x", DoubleType()),
    StructField("y", DoubleType()),
    StructField("z", DoubleType()),
]))
def s2_cell_and_xyz(lat: pd.Series, lng: pd.Series) -> pd.DataFrame:
    """Leaf cell id AND unit vector in ONE Python pass — the kNN query
    side needs both, and two separate UDFs pay the per-stage Python
    boundary twice.  Identical values: the cell id is derived from the
    same xyz the separate UDFs compute."""
    from ..kernel import coords

    x, y, z = coords.latlng_to_xyz(
        lat.to_numpy(np.float64), lng.to_numpy(np.float64)
    )
    ids = K.bias(K.from_point(x, y, z))
    return pd.DataFrame({"cell": ids, "x": x, "y": y, "z": z})


@F.pandas_udf(StringType())
def s2_token_py(cell_s: pd.Series) -> pd.Series:
    """Python-side token (tests/interop; prefer columns.token for hot path)."""
    return pd.Series(K.to_token(K.unbias(cell_s.to_numpy(np.int64))))


@F.pandas_udf(LongType())
def s2_from_token(tok: pd.Series) -> pd.Series:
    return pd.Series(K.bias(K.from_token(tok.tolist())))


def make_neighbors_udf(nbr_level: int):
    """All-neighbors ring at `nbr_level` (s2cell_id.cc:556-598) as an
    array<bigint> UDF — the kNN ring-expansion primitive.  Level is bound at
    plan-build time so the UDF body stays a pure batch kernel."""

    @F.pandas_udf(ArrayType(LongType()))
    def s2_all_neighbors(cell_s: pd.Series) -> pd.Series:
        ids = K.unbias(cell_s.to_numpy(np.int64))
        rings = K.all_neighbors(ids, nbr_level)
        return pd.Series([K.bias(r).tolist() for r in rings])

    return s2_all_neighbors


@F.pandas_udf(IntegerType())
def s2_level_py(cell_s: pd.Series) -> pd.Series:
    ids = K.unbias(cell_s.to_numpy(np.int64))
    return pd.Series(K.level(ids).astype(np.int32))


@F.pandas_udf(StructType([
    StructField("face", IntegerType()),
    StructField("i", LongType()),
    StructField("j", LongType()),
]))
def s2_cell_to_face_ij(cell_s: pd.Series) -> pd.DataFrame:
    """ToFaceIJOrientation decode (s2cell_id.cc:319-373) — (face, i, j)
    of the leaf cell, the Hilbert-free coordinate form used by the
    face/i/j histogram oracle."""
    from ..kernel.hilbert import to_face_ij_orientation

    ids = K.unbias(cell_s.to_numpy(np.int64))
    face, i, j, _ = to_face_ij_orientation(ids)
    return pd.DataFrame(
        {"face": face.astype(np.int32), "i": i.astype(np.int64), "j": j.astype(np.int64)}
    )
