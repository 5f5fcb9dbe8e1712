"""JVM leaf-cell encoder: bit-equivalence with the Arrow kernel."""

from pyspark.sql import functions as F

from s2geometry_spark.functions.jvm_cellid import leaf_cell_jvm
from s2geometry_spark.functions.udfs import s2_cell_from_latlng
from s2geometry_spark.sources.pages import extract_mentions, synthesize_pages


def test_jvm_encoder_matches_arrow_kernel(spark):
    pages = synthesize_pages(spark, 2000, partitions=4)
    m = extract_mentions(pages)
    both = m.select(
        s2_cell_from_latlng(F.col("lat"), F.col("lng")).alias("a"),
        leaf_cell_jvm(F.col("lat"), F.col("lng")).alias("b"),
    )
    assert both.filter(F.col("a") != F.col("b")).count() == 0
    assert both.count() > 0
