"""Live proofs of the three runtime plan re-optimizations the 100 TB
deployment leans on, each asserted on an executed plan with results
unchanged:

1. runtime bloom-filter join pruning (InjectRuntimeFilter) — a
   selective dim-side predicate builds a bloom filter applied to the
   fact SCAN before its shuffle. Size-gated, so dormant at test scale
   by default; both sides of the gate are proven.
2. AQE skew-join split (OptimizeSkewedJoin) — a hot join-key
   partition is split at map-output granularity at runtime.
3. dynamic partition pruning — a dim-side predicate prunes the
   partitioned fact scan's PartitionFilters via a reused broadcast
   subquery (the partitioned-data-lake scan path; the flat test
   parquet can't show it, so the test writes a partitioned copy).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

_SF = "/root/testdata/sf0.1"

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join bloom targets
}


def _join(spark):
    li = spark.read.parquet(f"{_SF}/lineitem.parquet")
    o = spark.read.parquet(f"{_SF}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()


def _with_confs(spark, confs):
    # get(k) is None for confs with no default (e.g. AQE's
    # autoBroadcastJoinThreshold falls back to the non-AQE one) —
    # restore must unset those, set(None) throws
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    return saved


def _restore_confs(spark, saved):
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bloom_filter_injects_past_size_gate(spark):
    assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    baseline = _join(spark).collect()
    saved = _with_confs(spark, _CONFS)
    try:
        df = _join(spark)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # creation side: bloom built from the FILTERED orders keys
        assert "bloom_filter_agg" in plan
        # application side: might_contain lands above the lineitem scan,
        # BEFORE its exchange (scan-side pruning, not post-shuffle)
        mc = plan.index("might_contain")
        assert "might_contain" in plan
        assert plan.index("Exchange", mc) > mc
        # and the pruned plan is still exactly correct
        assert df.collect() == baseline
    finally:
        _restore_confs(spark, saved)


def test_bloom_filter_stays_out_of_tiny_plans(spark):
    # default thresholds: the sf0.1 scan is far below the 10 GB
    # application-side gate, so no bloom stage is spent on it
    plan = _join(spark)._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" not in plan


_SKEW_CONFS = {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


def test_aqe_splits_skewed_join_partition(spark):
    """AQE's OptimizeSkewedJoin — the other runtime re-optimization the
    100 TB plan leans on (session.py turns skewJoin.enabled on). One
    join key carries 75% of the fact rows; with the size gates scaled
    down to test data, the FINAL adaptive plan must show the hot
    partition split (`AQEShuffleRead skewed`, join marked skew=true)
    and the result must be unchanged.

    Two traps this test encodes: the skew payload must SURVIVE column
    pruning into the shuffle (aggregate over it — a count() prunes the
    fact to its 8-byte key and nothing is skewed in bytes), and AQE's
    own autoBroadcastJoinThreshold must be disabled separately or the
    runtime re-plan turns the dim side into a broadcast join and skew
    handling becomes moot (which is ALSO the right outcome, just not
    the one under test).
    """
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    fact = spark.range(200_000).select(
        F.when(F.col("id") < 150_000, F.lit(0))
        .otherwise((F.col("id") % 99) + 1)
        .alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("pay"),
    )
    dim = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    agg = lambda: (  # noqa: E731
        fact.join(dim, "k").groupBy().agg(
            F.sum(F.length("pay") + F.col("w")).alias("s")
        )
    )
    baseline = agg().collect()
    saved = _with_confs(spark, _SKEW_CONFS)
    try:
        df = agg()
        assert df.collect() == baseline
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
        assert "AQEShuffleRead skewed" in plan
    finally:
        _restore_confs(spark, saved)


def test_dynamic_partition_pruning_on_partitioned_layout(spark, tmp_path_factory):
    """DPP: with the fact laid out partitioned-by-key (the 100 TB data
    lake layout), a selective dim predicate must reach the fact scan as
    a `dynamicpruningexpression` PartitionFilter fed by a (reused)
    broadcast subquery — scan-level pruning decided at RUNTIME from the
    dim's surviving keys, before any fact bytes are read. The flat
    driver parquet cannot exhibit this (no partition columns), so the
    test writes a partitioned copy once."""
    assert (
        spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
        == "true"
    )
    dst = os.path.join(str(tmp_path_factory.mktemp("dpp")), "orders_part")
    o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    o.withColumn("opri", F.col("o_orderpriority")).write.partitionBy(
        "opri"
    ).parquet(dst)
    fact = spark.read.parquet(dst)
    dim = spark.createDataFrame(
        [
            ("1-URGENT", 1),
            ("2-HIGH", 0),
            ("3-MEDIUM", 0),
            ("4-NOT SPECIFIED", 0),
            ("5-LOW", 0),
        ],
        "opri string, flag int",
    ).filter(F.col("flag") == 1)
    df = fact.join(F.broadcast(dim), "opri").groupBy("flag").count()
    expect = o.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert [tuple(r) for r in df.collect()] == [(1, expect)]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan
    assert "SubqueryBroadcast" in plan or "SubqueryAdaptiveBroadcast" in plan
