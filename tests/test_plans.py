"""Physical-plan assertions — the scale contract (SURVEY.md §4):
filters and projections must reach the parquet scan, dimension joins
must broadcast, containment joins must not degrade to a pure nested
loop when an equi-key exists, and partial aggregation must precede the
shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_pushdown(spark):
    """S2/§4.2: predicate + column pruning reach the parquet scan."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    df = li.filter(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)" in plan
    # ReadSchema must be pruned to the two referenced columns
    assert "l_extendedprice" not in plan.split("ReadSchema")[1][:200]


def test_q5_join_broadcasts_dims(spark):
    """Q5-shaped join: every dimension side is a BroadcastHashJoin —
    the fact table never shuffles before the final aggregate."""
    from etl_sh_design_spark.registry import QUERIES

    df = QUERIES["q5_region_revenue"](spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_containment_join_uses_layer_hash_key(spark):
    """J1: the layer equi-conjunct must make the containment join a
    BroadcastHashJoin (range predicate as post-condition), NOT a
    BroadcastNestedLoopJoin over everything."""
    from etl_sh_design_spark.plans.acceptance import ray_hits

    plan = _plan(ray_hits(spark, 1000))
    assert "BroadcastHashJoin" in plan


def test_binned_containment_is_pure_hash_join(spark):
    """The scale-out strategy: spatial binning leaves NO nested-loop
    join anywhere in the plan."""
    from etl_sh_design_spark.plans.acceptance import ray_hits

    plan = _plan(ray_hits(spark, 1000, strategy="binned"))
    # at most the one 4-row layers cross join; the sensors join must be
    # a hash join on (layer, cell_x, cell_y)
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert any(
        k in plan for k in ("BroadcastHashJoin", "ShuffledHashJoin", "SortMergeJoin")
    )


def test_partial_aggregation_before_shuffle(spark):
    """A-series: groupBy compiles to partial HashAggregate -> Exchange
    -> final HashAggregate (map-side combine, bins-sized shuffle)."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    df = li.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    plan = _plan(df)
    first_agg = plan.index("HashAggregate")
    exchange = plan.index("Exchange")
    assert plan.count("HashAggregate") >= 2
    assert first_agg < exchange


def test_binned_equals_broadcast_strategy(spark):
    """Both J1 physical strategies produce identical results."""
    from etl_sh_design_spark.plans.acceptance import ray_hits

    a = sorted(tuple(r) for r in ray_hits(spark, 3000).collect())
    b = sorted(tuple(r) for r in ray_hits(spark, 3000, strategy="binned").collect())
    assert a == b


def test_incremental_dedup_broadcasts_key_side(spark):
    """The existing-corpus side must broadcast (key column only) —
    the incoming batch never shuffles for the anti-join."""
    from etl_sh_design_spark.registry import queries

    df = queries()["incremental_dedup"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_top_bigrams_partial_agg(spark):
    """Hot-key (stop-bigram) skew is absorbed map-side: partial
    HashAggregate must precede the exchange."""
    from etl_sh_design_spark.registry import queries

    plan = _plan(queries()["top_bigrams"](spark, SF_SMOKE))
    assert plan.count("HashAggregate") >= 2
    assert plan.index("HashAggregate") < plan.index("Exchange")


def test_funnel_filter_pushdown(spark):
    """The event_type filters must reach the parquet scan on both join
    sides."""
    from etl_sh_design_spark.registry import queries

    plan = _plan(queries()["funnel_interval_join"](spark, SF_SMOKE))
    assert "EqualTo(event_type,click)" in plan
    assert "EqualTo(event_type,purchase)" in plan


def test_zorder_key_stays_in_codegen(spark):
    """The Morton bit-interleave must compile into whole-stage codegen
    (no python workers, no BatchEvalPython in the plan)."""
    from etl_sh_design_spark.registry import queries

    plan = _plan(queries()["zorder_layout"](spark, SF_SMOKE))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the interleave is a JVM catalyst expression over the scan output
    assert "shiftleft" in plan
    assert plan.count("HashAggregate") >= 2  # partial agg before shuffle


def test_scd2_single_exchange(spark):
    """SCD2 build: the lag-compaction and lead-expiry windows share the
    (user_id) partitioning, so the whole dimension build needs exactly
    one shuffle exchange."""
    from etl_sh_design_spark import registry

    plan = _plan(registry.queries()["scd2_user_history"](spark, SF_SMOKE))
    assert plan.count("Exchange") == 1, plan


def test_q13_outer_join_keeps_on_clause_filter(spark):
    """Q13: the o_orderpriority predicate must appear as a pushed scan
    filter on the orders side (it is an ON-clause filter of a left
    join, still pushable to the non-preserved side's scan)."""
    from etl_sh_design_spark import registry

    plan = _plan(registry.queries()["q13_custdist"](spark, SF_SMOKE))
    assert "1-URGENT" in plan
    assert "PushedFilters" in plan


def test_q22_anti_join_and_broadcast_scalar(spark):
    """Q22: the NOT EXISTS compiles to a broadcast anti join (the
    urgent-orders side is small) and the scalar average arrives via a
    broadcast, never a shuffle of the customer table for the scalar."""
    from etl_sh_design_spark import registry

    plan = _plan(registry.queries()["q22_idle_customers"](spark, SF_SMOKE))
    assert "LeftAnti" in plan, plan


def test_regression_stats_partial_agg(spark):
    """Moment aggregates must partial-aggregate before the exchange
    (map-side combine), so the shuffle carries |groups| rows."""
    from etl_sh_design_spark import registry

    plan = _plan(registry.queries()["regression_stats"](spark, SF_SMOKE))
    first_agg = plan.index("HashAggregate")
    first_exchange = plan.index("Exchange")
    assert first_agg > first_exchange or "partial" in plan.lower()


def test_vocab_coverage_no_window_exec(spark):
    """The cumulative sum runs as a broadcast theta-join over the
    checkpointed top-k (bounded rows) — there must be NO WindowExec in
    the plan at all (an unpartitioned window would be a global
    single-partition sort)."""
    from etl_sh_design_spark import registry

    plan = _plan(registry.queries()["vocab_coverage"](spark, SF_SMOKE))
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_top_bigrams_no_window_exec(spark):
    """Same invariant for the top-bigrams rank: broadcast theta-join
    rank over the TakeOrdered top-k, no WindowExec anywhere."""
    from etl_sh_design_spark import registry

    plan = _plan(registry.queries()["top_bigrams"](spark, SF_SMOKE))
    assert "Window" not in plan


def test_ntile_no_global_sort(spark):
    """ntile_acctbal must not funnel all rows through one partition:
    every WindowExec in the plan must carry a partition spec (the
    distributed rank windows are partitioned by range-partition id)."""
    from etl_sh_design_spark import registry

    plan = _plan(registry.queries()["ntile_acctbal"](spark, SF_SMOKE))
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line.lower():
            assert "partitionBy" not in line or "pid" in line
    # the giveaway of a global window is an Exchange SinglePartition
    # feeding a Window/Sort; the only SinglePartition allowed here is
    # a scalar aggregate (there is none in this query)
    assert "Exchange SinglePartition" not in plan


def test_q8_fact_never_sortmerges(spark):
    """Q8 shape: all five dimensions broadcast; the lineitem side must
    reach the final aggregate without a SortMergeJoin (one exchange:
    the groupBy)."""
    from etl_sh_design_spark.registry import queries

    plan = _plan(queries()["q8_market_share"](spark, SF_SMOKE))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 5


def test_q10_fact_fact_first_then_custkey_shuffle(spark):
    """Q10 join-order contract: nation broadcasts, and the plan
    carries no more than the two intended fact exchanges (orderkey for
    orders|><|lineitem, custkey for the customer join) plus the final
    agg/sort exchanges — customer must NOT ride the orderkey shuffle."""
    from etl_sh_design_spark.registry import QUERIES

    plan = _plan(QUERIES["q10_returned_revenue"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan  # nation (and, at sf-small, AQE dims)


def test_q2_groupwise_min_broadcasts_dims(spark):
    """Q2 shape: part/supplier/nation/region sides broadcast; the only
    shuffles key on (l_partkey[, l_suppkey]) for the two aggs."""
    from etl_sh_design_spark.registry import QUERIES

    plan = _plan(QUERIES["q2_min_cost_supplier"](spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_q21_no_self_join_explosion(spark):
    """Q21 shape: the double-correlated EXISTS must be one per-order
    aggregate joined back — no nested-loop or cartesian anywhere."""
    from etl_sh_design_spark.registry import QUERIES

    plan = _plan(QUERIES["q21_waiting_suppliers"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q11_threshold_is_broadcast_scalar(spark):
    """Q11 shape: the global total joins back as a broadcast (1-row),
    never a shuffle."""
    from etl_sh_design_spark.registry import QUERIES

    plan = _plan(QUERIES["q11_important_parts"](spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_token_frequency_join_keys_on_token(spark):
    """The unigram join must be token-keyed (hash/SMJ on tok) — never
    a nested loop; the vocab side need not broadcast at scale."""
    from etl_sh_design_spark.registry import QUERIES

    plan = _plan(QUERIES["token_frequency_scores"](spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_semdedup_centroids_broadcast_pairs_stay_hash_keyed(spark):
    """SemDeDup scale shape, asserted per stage (the Lloyd rounds sit
    behind localCheckpoints, so the final plan only shows the pairwise
    stage): (a) centroid assignment broadcasts the k-row centroid side
    — the vector side carries no Exchange before the join; (b) the
    quadratic cosine stage is an equi-join keyed on the cell id —
    never an unkeyed product over all pairs."""
    from pyspark.sql import functions as F

    from etl_sh_design_spark.operators.kmeans import _as_double, _assign

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    vecs = emb.select(F.col("vec_id"), _as_double("embedding").alias("v"))
    cents = vecs.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cluster"), F.col("v").alias("c")
    )
    aplan = _plan(_assign(vecs, cents))
    assert "BroadcastNestedLoopJoin" in aplan  # 8-row side broadcast
    join_part = aplan.split("BroadcastNestedLoopJoin")[1]
    # the big (vector) side streams straight from the scan: the only
    # Exchange below the join is the broadcast of the centroid side
    assert "Exchange hashpartitioning" not in join_part.split("Scan parquet")[0]

    from etl_sh_design_spark import registry

    df = registry.queries()["semantic_dedup"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin [cluster" in plan or "ShuffledHashJoin [cluster" in plan


def test_quantile_sketch_partial_agg_and_bounded_window(spark):
    """Two-level sketch: the shard histogram must partial-aggregate
    before its shuffle (HashAggregate below the Exchange), and the
    quantile-extraction window must be partitioned by event_type —
    no global single-partition window."""
    from etl_sh_design_spark import registry

    df = registry.queries()["quantile_sketch_events"](spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.index("HashAggregate") < plan.index("Exchange")
    assert "No Partition Defined for Window" not in plan


def test_budget_selection_no_global_window(spark):
    """token_budget_selection's cumulative sum must never funnel
    through one partition: every WindowExec is partitioned by the
    range-partition id, and no Exchange SinglePartition feeds a
    Window/Sort (the only driver-side step is the P-row subtotal
    collect)."""
    from etl_sh_design_spark import registry

    plan = _plan(registry.queries()["token_budget_selection"](spark, SF_SMOKE))
    for line in plan.splitlines():
        if "windowspecdefinition" in line.lower():
            assert "pid" in line
    assert "Exchange SinglePartition" not in plan


def test_snapshot_diff_is_single_equi_join(spark):
    """corpus_snapshot_diff must diff the version manifests with a
    plain doc_id-keyed equi-join — no nested-loop/cartesian anywhere
    (a cross product over two corpus versions would be the classic
    diff-gone-wrong plan)."""
    from etl_sh_design_spark import registry

    plan = _plan(registry.queries()["corpus_snapshot_diff"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "FullOuter" in plan and (
        "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    )


def test_boilerplate_cluster_table_joins_hash_keyed(spark):
    """The prefix-cluster-size table joins back to the docs on the
    prefix key — hash-keyed (broadcast or shuffled), never a nested
    loop; the cluster table is aggregated (distinct-prefix-sized)
    before the join."""
    from etl_sh_design_spark import registry

    plan = _plan(
        registry.queries()["boilerplate_prefix_clusters"](spark, SF_SMOKE)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


def test_mad_outliers_medians_broadcast(spark):
    """Per-type median/MAD tables are group-count-sized and must
    broadcast back onto the events side — the events scan should never
    shuffle for the join legs."""
    from etl_sh_design_spark import registry

    plan = _plan(registry.queries()["mad_outliers_events"](spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 2


def test_srp_signature_is_map_only(spark):
    """SRP signatures are pure per-row array math: the plane matrix is
    a driver-side literal, so the plan has NO exchange and NO explode
    (the previous posexplode->groupBy x2 formulation shuffled
    N*dim*n_planes rows twice)."""
    from etl_sh_design_spark.operators.similarity import srp_signature

    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    plan = _plan(srp_signature(e).select("vec_id", "bucket"))
    assert "Exchange" not in plan
    assert "Generate" not in plan


def test_srp_python_plane_matches_sql_md5(spark):
    """The driver-side plane literals must be byte-identical to the
    md5 expression the oracle SQL (and the old exploded path) uses."""
    from etl_sh_design_spark.operators.dedup import md5_int64
    from etl_sh_design_spark.operators.similarity import _srp_sign

    probes = [(j, d) for j in range(4) for d in (0, 1, 7, 63)]
    row = spark.range(1).select(
        *[
            ((md5_int64(F.lit(f"{j}:{d}")) % 2) * 2 - 1).alias(f"s_{j}_{d}")
            for j, d in probes
        ]
    ).first()
    for j, d in probes:
        assert row[f"s_{j}_{d}"] == _srp_sign(j, d), (j, d)


def test_bloom_decon_probes_before_candidate_distinct(spark):
    """The corpus gram stream must hit the (broadcast) bloom word
    joins BEFORE the only corpus-keyed exchange — i.e. the candidate
    distinct consumes the probe output, so only bloom survivors are
    ever shuffled. In the top-down plan print, the doc_id+gram
    hash-partitioning therefore appears ABOVE the first broadcast
    probe join."""
    from etl_sh_design_spark import registry

    plan = _plan(registry.queries()["bloom_decontamination"](spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 3  # word0, word1, confirm-mark
    i_distinct = plan.find("hashpartitioning(doc_id")
    i_probe = plan.find("BroadcastHashJoin [word0")
    assert i_distinct != -1 and i_probe != -1
    assert i_distinct < i_probe


def test_knn_label_corpus_never_sortmerges(spark):
    """kNN label eval: the probe side broadcasts into the corpus scan
    (inside cosine_topk); the vote/label joins are candidate-sized.
    The corpus must never reach a sort-merge join."""
    from etl_sh_design_spark import registry

    plan = _plan(registry.queries()["knn_label_accuracy"](spark, SF_SMOKE))
    assert "SortMergeJoin" not in plan


def test_class_separation_cohesion_join_broadcasts(spark):
    """The assembled centroid table (L rows) must broadcast onto the
    vector side for the cohesion pass; rows never shuffle for it."""
    from etl_sh_design_spark import registry

    plan = _plan(registry.queries()["class_separation"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
