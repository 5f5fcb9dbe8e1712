"""Multimodal (image/audio/video) column plumbing.

Binary payloads ride as opaque `binary` columns with typed metadata
structs.  The Spark-side plumbing — schema, batch iteration, partition
sizing — is real and tested; the actual codec calls are stubbed behind
deterministic fakes because the image/audio libraries are not available
in this environment (clearly marked below).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("sha1", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feat_dim", IntegerType()),
        StructField("feat_norm", StringType()),
    ]
)


def synthesize_media(spark, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic fake media table: payload bytes are a pure function
    of media_id (so the pipeline is testable end-to-end)."""
    df = spark.range(0, n, 1, partitions)
    payload = F.encode(
        F.concat(F.lit("MEDIA"), F.col("id").cast("string")), "UTF-8"
    )
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("id") % 3).cast("int") + 1,
    )
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        (F.col("id") % 640 + 1).cast("int").alias("width"),
        (F.col("id") % 480 + 1).cast("int").alias("height"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.sha1(payload).alias("sha1"),
    )


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """STUB: real deployments decode with PIL/ffmpeg here.  This
    deterministic fake derives a feature vector from the payload hash so
    the distributed plumbing (batching, schema, shuffles) is exercised
    with stable values.  Raise NotImplementedError for unknown kinds the
    way a real codec registry would."""
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no codec for kind={kind!r}")
    h = hashlib.sha256(payload).digest()
    return np.frombuffer(h, dtype=np.uint8).astype(np.float64) / 255.0


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, features out.

    The UDF signature / batch shape is production-real; only the decode
    call is the deterministic stub above.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(bytes(p), k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            norms = [f"{float(np.linalg.norm(f)):.6f}" for f in feats]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "feat_dim": [len(f) for f in feats],
                    "feat_norm": norms,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)
