"""Schema evolution across ingest epochs — the contract a 100 TB
table accumulating files over months depends on: later files may add
columns, and a mergeSchema read must surface the union schema with
NULLs for the missing values, while the default read keys its schema
off one footer (cheap but blind to the new column). Both behaviors
pinned so the engine's readers opt in deliberately."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_merge_schema_surfaces_union_with_nulls(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    path = str(tmp_path / "evolving")
    v1 = docs.select("doc_id", "text").filter(F.col("doc_id") < 100)
    v2 = (
        docs.select("doc_id", "text")
        .filter(F.col("doc_id") >= 100)
        .withColumn("quality", F.lit(0.5))
    )
    v1.write.parquet(path + "/epoch=1")
    v2.write.parquet(path + "/epoch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) >= {"doc_id", "text", "quality"}
    n1 = v1.count()
    # old-epoch rows surface with NULL quality, new-epoch rows keep it
    assert merged.filter(F.col("quality").isNull()).count() == n1
    assert merged.filter(F.col("quality") == 0.5).count() == v2.count()
    assert merged.count() == n1 + v2.count()


def test_default_read_misses_late_column(spark, tmp_path):
    """Without mergeSchema, Spark reads the schema from one footer —
    if that footer predates the new column, the column silently
    vanishes. Pinned as the hazard the option exists to avoid."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    path = str(tmp_path / "evolving2")
    docs.select("doc_id", "text").write.parquet(path + "/epoch=1")
    docs.select("doc_id", "text").withColumn(
        "quality", F.lit(1.0)
    ).write.parquet(path + "/epoch=2")
    plain = spark.read.parquet(path)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    # the union schema always carries the column; the plain read may
    # or may not, depending on which footer Spark samples — assert
    # the CONTRACT difference, not footer luck: merged is a superset
    assert set(plain.columns) <= set(merged.columns)
    assert "quality" in merged.columns
