"""Bucketing: pre-shuffled storage layout so equi-joins on the bucket
key run WITHOUT an exchange on either side (SURVEY.md §4 / the 100 TB
co-located-join strategy). local[*] writes real bucket files; the
plan assertion is exactly what holds on a cluster."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucket_db(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucketdb")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{loc}'")
    yield "bucketdb"
    spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucket_db):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(f"{bucket_db}.li_b")
    )
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(f"{bucket_db}.o_b")
    )
    a = spark.table(f"{bucket_db}.li_b")
    b = spark.table(f"{bucket_db}.o_b")
    # hint the merge join: at sf0.001 the optimizer would broadcast,
    # which hides the property under test (at scale neither side
    # broadcasts and bucketing is what saves the shuffle)
    joined = a.hint("merge").join(b, a.l_orderkey == b.o_orderkey).groupBy(
        "o_orderstatus"
    ).agg(F.sum("l_quantity").alias("qty"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located: the join itself needs no shuffle of either side —
    # the only exchange allowed is the final tiny aggregation
    join_part = plan.split("HashAggregate")[-1]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    # and results are right
    total = joined.agg(F.sum("qty")).collect()[0][0]
    expected = li.agg(F.sum("l_quantity")).collect()[0][0]
    assert abs(total - expected) < 1e-6
