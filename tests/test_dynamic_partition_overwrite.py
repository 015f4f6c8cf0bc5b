"""Dynamic partition overwrite — the lake-maintenance contract a
100 TB partitioned table depends on: re-writing ONE partition with
mode("overwrite") must replace only the partitions present in the
incoming frame, never truncate the table. Spark's default
(partitionOverwriteMode=STATIC) silently deletes every other
partition — this test pins both behaviors so the engine's sinks are
used with the dynamic mode deliberately, not by luck."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _write_partitioned(spark, path):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    docs.write.mode("overwrite").partitionBy("source").parquet(path)
    return docs


def test_dynamic_mode_replaces_only_incoming_partitions(spark, tmp_path):
    path = str(tmp_path / "docs_part")
    docs = _write_partitioned(spark, path)
    sources = [r["source"] for r in docs.select("source").distinct().collect()]
    target = sorted(sources)[0]
    before_total = docs.count()
    before_target = docs.filter(F.col("source") == target).count()

    patch = (
        docs.filter(F.col("source") == target)
        .limit(max(1, before_target // 2))
        .withColumn("text", F.lit("PATCHED"))
    )
    n_patch = patch.count()
    (
        patch.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("source")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    # untouched partitions survive in full
    assert back.filter(F.col("source") != target).count() == before_total - before_target
    # the target partition is exactly the patch
    got = back.filter(F.col("source") == target)
    assert got.count() == n_patch
    assert got.filter(F.col("text") == "PATCHED").count() == n_patch


def test_static_mode_truncates_other_partitions(spark, tmp_path):
    """The default STATIC mode's destructive behavior, pinned so the
    contrast with the test above stays visible."""
    path = str(tmp_path / "docs_part_static")
    docs = _write_partitioned(spark, path)
    sources = sorted(r["source"] for r in docs.select("source").distinct().collect())
    assert len(sources) > 1
    target = sources[0]
    patch = docs.filter(F.col("source") == target).limit(1)
    (
        patch.write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("source")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    # static overwrite removed every other partition
    assert [r["source"] for r in back.select("source").distinct().collect()] == [target]
    assert back.count() == 1
