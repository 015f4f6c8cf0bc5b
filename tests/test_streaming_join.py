"""Stream-stream interval join golden: the streaming funnel join must
produce exactly the pairs the batch interval join produces."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sh_design_spark.session import read_events
from etl_sh_design_spark.streaming.joins import streaming_funnel_pairs
from tests.conftest import SF_SMOKE

_GAP_US = 600_000_000


def test_streaming_funnel_equals_batch(spark):
    got = streaming_funnel_pairs(spark, SF_SMOKE, query_name="funnel_t1")
    e = read_events(spark, SF_SMOKE)
    c = e.filter(F.col("event_type") == "click").select(
        "user_id", F.unix_micros("ts").alias("c_us")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.unix_micros("ts").alias("p_us")
    )
    want = c.join(
        p,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("p_us") > F.col("c_us"))
        & (F.col("p_us") <= F.col("c_us") + _GAP_US),
    ).select("user_id", "c_us", "p_us")

    g = sorted(tuple(r) for r in got.collect())
    w = sorted(tuple(r) for r in want.collect())
    assert g == w
    assert len(g) > 0


def test_streaming_enrichment_equals_batch(spark):
    from etl_sh_design_spark.streaming.joins import streaming_enriched_segment_counts

    got = streaming_enriched_segment_counts(spark, SF_SMOKE, query_name="enrich_t1")

    import os

    customers = spark.read.parquet(os.path.join(SF_SMOKE, "customer.parquet")).select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    want = (
        read_events(spark, SF_SMOKE)
        .join(customers, "user_id")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )
    g = sorted(tuple(r) for r in got.collect())
    w = sorted(tuple(r) for r in want.collect())
    assert g == w
    assert len(g) > 0
