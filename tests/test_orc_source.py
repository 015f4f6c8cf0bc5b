"""ORC source/sink roundtrip + plan contract (§2.1 breadth): the
engine's columnar-format guarantees (exact roundtrip, predicate
pushdown, column pruning) hold for ORC exactly as the Parquet tests
pin them for Parquet."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sh_design_spark.sources.io import read_orc, write_orc
from tests.conftest import SF_SMOKE


def test_orc_roundtrip_exact(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path, sort_col="doc_id")
    back = read_orc(spark, path)
    assert back.schema == docs.schema
    a = sorted(map(tuple, docs.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_orc_scan_pushes_filters_and_prunes_columns(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    path = str(tmp_path / "docs_orc2")
    write_orc(docs, path)
    q = read_orc(spark, path).filter(F.col("doc_id") > 100).select("doc_id", "source")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # pushdown reaches the ORC scan, and the read schema carries only
    # the two projected columns
    assert "PushedFilters: [" in plan and "doc_id" in plan.split("PushedFilters")[1][:80]
    read_schema = plan.split("ReadSchema:")[1][:120]
    assert "doc_id" in read_schema and "source" in read_schema
    assert "text" not in read_schema
