"""Runtime bloom-filter join pruning (Spark's InjectRuntimeFilter) —
the 100 TB shuffle-reduction path for selective dim-fact joins.

At cluster scale, a selective predicate on the orders side of a
q5/q12-shaped join builds a bloom filter over the join key that is
applied to the lineitem SCAN before its shuffle, cutting shuffle
bytes by the predicate's selectivity. The feature is size-gated
(creationSideThreshold max / applicationSideScanSizeThreshold min),
so at test scale it stays off by default — correct behavior, not a
missing feature. These tests prove both sides of the gate: it
injects (and stays correct) once sizes cross the thresholds, and it
stays out of tiny local plans.
"""

from __future__ import annotations

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
