"""foreachBatch lake sink — the idempotent micro-batch upsert pattern
(§2.9 extension, labeled as such).

Structured Streaming's exactly-once story for arbitrary sinks is
`foreachBatch` + an idempotent write keyed on `batch_id`: each
micro-batch's partial aggregate lands in its own `batch_id=` partition
with dynamic partition overwrite, so a replayed batch overwrites
itself instead of double-counting. The queryable table is the rollup
of the partials — the classic "partial aggregates in the lake, merge
on read (or compact on schedule)" shape.

At 100 TB this is how a streaming pipeline feeds the batch engine:
partials are small (|keys| rows per batch), the rollup is an
any-time-correct aggregation, and a scheduled compaction (rewrite the
rollup, drop consumed partitions) bounds read amplification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_sh_design_spark.streaming.windows import read_events_stream


def stream_user_totals_to_lake(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Stream events into per-batch partial per-user totals under
    `out_dir`, idempotently (batch_id partition + dynamic overwrite)."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy("user_id")
            .agg(F.sum("value").alias("psum"), F.count(F.lit(1)).alias("pcnt"))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    stream = read_events_stream(spark, sf_dir)
    writer = stream.writeStream.foreachBatch(upsert).outputMode("update")
    q = writer.start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def read_lake_totals(spark: SparkSession, out_dir: str) -> DataFrame:
    """Merge-on-read rollup of the partial aggregates."""
    partials = spark.read.parquet(out_dir)
    return partials.groupBy("user_id").agg(
        F.sum("psum").alias("sum_value"), F.sum("pcnt").alias("n_events")
    )
