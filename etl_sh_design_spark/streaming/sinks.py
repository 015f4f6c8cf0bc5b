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

import glob
import json
import os
import shutil

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
    """Merge-on-read rollup: compacted base (if any) + the partial
    partitions the last compaction has not consumed. Without a
    manifest this is the plain all-partials rollup."""
    m = _read_manifest(out_dir)
    if m is None:
        partials = spark.read.parquet(out_dir).select("user_id", "psum", "pcnt")
    else:
        base = spark.read.parquet(
            os.path.join(out_dir, "_compacted", m["base"])
        ).select(
            "user_id",
            F.col("sum_value").alias("psum"),
            F.col("n_events").alias("pcnt"),
        )
        live = [
            d
            for d in glob.glob(os.path.join(out_dir, "batch_id=*"))
            if int(d.rsplit("=", 1)[1]) > m["consumed_max_batch"]
        ]
        partials = base
        if live:
            partials = partials.unionByName(
                spark.read.option("basePath", out_dir)
                .parquet(*live)
                .select("user_id", "psum", "pcnt")
            )
    return partials.groupBy("user_id").agg(
        F.sum("psum").alias("sum_value"), F.sum("pcnt").alias("n_events")
    )


# ------------------------------------------------------- scheduled compaction
# The "compact on schedule" step of the partial-aggregate lake above,
# made real: fold every partial partition up to the current max
# batch_id (plus any previous base) into one new base snapshot, then
# COMMIT by atomically replacing a single-file JSON manifest
# (os.replace — the same commit primitive log-structured table formats
# rely on). Readers resolve the manifest first, so a crash anywhere
# before the replace leaves the previous view intact (an orphaned
# base_v directory is garbage, never wrong data), and consumed partial
# partitions stay correct-but-redundant until `gc=True` removes them.
# Assumes monotonic batch ids, i.e. a checkpointed stream — the
# contract foreachBatch already requires for its idempotent overwrite.

_MANIFEST = "_compacted/manifest.json"


def _read_manifest(out_dir: str) -> dict | None:
    path = os.path.join(out_dir, _MANIFEST)
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def compact_lake_totals(
    spark: SparkSession, out_dir: str, gc: bool = False
) -> dict:
    """Compact the partial-aggregate lake: one new base snapshot
    (user_id-keyed rollup) replaces base + all partials up to the
    current max batch_id. Returns the committed manifest. Idempotent:
    re-running with no new partials commits an equal snapshot. At
    100 TB this bounds merge-on-read amplification to (1 base + the
    partials since the last schedule tick) instead of every batch
    since stream start."""
    prev = _read_manifest(out_dir)
    prev_max = prev["consumed_max_batch"] if prev else -1
    live = {
        int(d.rsplit("=", 1)[1]): d
        for d in glob.glob(os.path.join(out_dir, "batch_id=*"))
        if int(d.rsplit("=", 1)[1]) > prev_max
    }
    if prev is not None and not live:
        return prev  # nothing new since the last snapshot
    if prev is None and not live:
        raise ValueError(f"no partial partitions to compact under {out_dir}")
    consumed_max = max(live)
    version = (prev["version"] + 1) if prev else 1
    base_name = f"base_v{version}"
    rollup = (
        spark.read.option("basePath", out_dir)
        .parquet(*live.values())
        .groupBy("user_id")
        .agg(F.sum("psum").alias("sum_value"), F.sum("pcnt").alias("n_events"))
    )
    if prev is not None:
        old = spark.read.parquet(os.path.join(out_dir, "_compacted", prev["base"]))
        rollup = (
            rollup.unionByName(old)
            .groupBy("user_id")
            .agg(
                F.sum("sum_value").alias("sum_value"),
                F.sum("n_events").alias("n_events"),
            )
        )
    rollup.write.mode("overwrite").parquet(
        os.path.join(out_dir, "_compacted", base_name)
    )
    manifest = {
        "version": version,
        "base": base_name,
        "consumed_max_batch": int(consumed_max),
    }
    tmp = os.path.join(out_dir, "_compacted", f".manifest.v{version}.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(out_dir, _MANIFEST))  # the atomic commit
    if gc:
        for d in glob.glob(os.path.join(out_dir, "batch_id=*")):
            if int(d.rsplit("=", 1)[1]) <= consumed_max:
                shutil.rmtree(d)
        for d in glob.glob(os.path.join(out_dir, "_compacted", "base_v*")):
            if os.path.basename(d) != base_name:
                shutil.rmtree(d)
    return manifest
