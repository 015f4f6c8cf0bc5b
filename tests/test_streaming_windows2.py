"""Round-2 streaming goldens: sliding windows (stream == batch) and
watermarked streaming deduplication."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sh_design_spark.session import read_events
from etl_sh_design_spark.streaming.windows import (
    read_events_stream,
    sliding_agg,
    streaming_sliding_counts,
)
from tests.conftest import SF_SMOKE


def test_streaming_sliding_equals_batch(spark):
    got = streaming_sliding_counts(spark, SF_SMOKE, query_name="sliding_t2")
    want = sliding_agg(read_events(spark, SF_SMOKE))
    g = {r["win_start_us"]: (r["n_events"], r["sum_value"]) for r in got.collect()}
    w = {r["win_start_us"]: (r["n_events"], r["sum_value"]) for r in want.collect()}
    assert g == w and len(g) > 0


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark drops re-deliveries arriving in a
    later micro-batch: feed the same rows twice (two files, one file
    per trigger) and expect each event_id to survive exactly once."""
    ev = read_events(spark, SF_SMOKE).limit(500)
    src = str(tmp_path / "dedup_src")
    ev.coalesce(1).write.mode("overwrite").parquet(src)
    ev.coalesce(1).write.mode("append").parquet(src)  # duplicate delivery

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_t2")
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = len(q.recentProgress)
    finally:
        q.stop()
    assert n_batches >= 2
    out = spark.sql("SELECT event_id FROM dedup_t2")
    assert out.count() == ev.count()
    assert out.distinct().count() == ev.count()
