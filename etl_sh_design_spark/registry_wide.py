"""Optimizer-pattern breadth batch: as-of join, CUBE marginals,
window frames (running + sliding), ntile bucketing, deterministic
hash-stratified sampling, correlated-EXISTS (TPC-H Q4 shape), and the
scalar-subquery agg-join (TPC-H Q17 shape).

These round out the §2 surface with the plan shapes a 100 TB engine
leans on: single-shuffle as-of (vs range-join explosion), partial-agg
cube, frame-based windows, hash sampling that needs no second scan,
semi-join EXISTS rewrites, and broadcast agg-joins.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etl_sh_design_spark.registry import _t, query


@query(
    "asof_events",
    """
WITH clicks AS (SELECT * FROM events WHERE event_type = 'click'),
purch AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase')
SELECT c.event_id, c.user_id,
       CAST(CASE WHEN p.ts IS NULL THEN 0 ELSE 1 END AS INT) AS has_prior,
       CAST(CASE WHEN p.ts IS NULL THEN -1
                 ELSE floor(epoch(c.ts)) - floor(epoch(p.ts)) END AS BIGINT) AS gap_s,
       round(coalesce(p.value, -1.0), 4) AS prior_value
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.ts >= p.ts
""",
)
def q_asof_events(spark, sf_dir):
    """Backward as-of join (extension): each click matched to the same
    user's most recent prior purchase. Spark side is the union+window
    single-shuffle formulation (operators/asof.py); oracle is DuckDB's
    native ASOF LEFT JOIN. Deterministic: (user_id, ts) is unique in
    the events table."""
    from etl_sh_design_spark.operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click")
    purch = e.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    j = asof_join(clicks, purch, on="user_id", left_ts="ts", right_ts="ts",
                  payload_cols=["value"])
    return j.select(
        "event_id",
        "user_id",
        F.when(F.col("asof_ts").isNull(), 0).otherwise(1).cast("int").alias("has_prior"),
        F.when(F.col("asof_ts").isNull(), F.lit(-1))
        .otherwise(F.unix_timestamp("ts") - F.unix_timestamp("asof_ts"))
        .cast("bigint")
        .alias("gap_s"),
        F.round(F.coalesce(F.col("asof_value"), F.lit(-1.0)), 4).alias("prior_value"),
    )


@query(
    "cube_qty_marginals",
    """
SELECT coalesce(l_returnflag, 'ALL') AS rf,
       coalesce(l_linestatus, 'ALL') AS ls,
       count(*) AS n,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q_cube_marginals(spark, sf_dir):
    """A12 marginalization generalized: CUBE over (returnflag,
    linestatus) — all 2^2 grouping sets in one pass (partial aggs +
    a single expand, no re-scan per marginal). Grouping keys are
    non-null in the data, so 'ALL' is an unambiguous subtotal label."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "n",
            "sum_qty",
        )
    )


@query(
    "window_frames_orders",
    """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING), 2) AS running_total,
       round(avg(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS ma3
FROM orders
""",
)
def q_window_frames(spark, sf_dir):
    """Explicit window frames (the reference never needs one — SURVEY
    §2.5 note): per-customer running order total + 3-row moving
    average. Order pinned by (o_orderdate, o_orderkey) so float
    accumulation order is identical cross-engine."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 2
        ).alias("running_total"),
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias("ma3"),
    )


@query(
    "ntile_acctbal",
    """
WITH q AS (
  SELECT c_acctbal,
         CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INT) AS quartile
  FROM customer
)
SELECT quartile, count(*) AS n,
       round(min(c_acctbal), 2) AS lo,
       round(max(c_acctbal), 2) AS hi,
       round(avg(c_acctbal), 4) AS mean_bal
FROM q GROUP BY 1
""",
)
def q_ntile(spark, sf_dir):
    """Quantile bucketing with exact ntile(4) semantics, computed
    WITHOUT a global single-partition sort: rows are range-partitioned
    on the sort key, ranked locally per partition (window partitioned
    by partition id — P balanced groups, not one), and local ranks are
    shifted by broadcast per-partition offsets; the ntile bucket is
    then a closed-form expression of the global rank (first n%4 buckets
    take floor(n/4)+1 rows). Every shuffle is P-way; nothing ever
    funnels through one task, so the same plan holds at fact scale.
    Tie-broken by c_custkey for determinism."""
    c = _t(spark, sf_dir, "customer").select("c_acctbal", "c_custkey")
    p = spark.sparkContext.defaultParallelism
    parts = c.repartitionByRange(p, "c_acctbal", "c_custkey").withColumn(
        "pid", F.spark_partition_id()
    )
    # Range partitioning guarantees partition i's keys all sort before
    # partition i+1's, so global rank = (rows in earlier partitions) +
    # local rank — regardless of where the sampled boundaries fell.
    counts = sorted(
        (r["pid"], r["cnt"])
        for r in parts.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    n = sum(cnt for _, cnt in counts)
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    off_df = spark.createDataFrame(offsets, schema="pid int, _offset long")
    wlocal = W.partitionBy("pid").orderBy("c_acctbal", "c_custkey")
    ranked = (
        parts.withColumn("_lrk", F.row_number().over(wlocal))
        .join(F.broadcast(off_df), "pid")
        .withColumn("_rank", F.col("_offset") + F.col("_lrk"))
    )
    base, rem = n // 4, n % 4
    cut = rem * (base + 1)
    quartile = F.when(
        F.col("_rank") <= cut, (F.col("_rank") - 1) / max(base + 1, 1)
    ).otherwise(rem + (F.col("_rank") - cut - 1) / max(base, 1))
    q = ranked.select(
        "c_acctbal", (F.floor(quartile) + 1).cast("int").alias("quartile")
    )
    return q.groupBy("quartile").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("c_acctbal"), 2).alias("lo"),
        F.round(F.max("c_acctbal"), 2).alias("hi"),
        F.round(F.avg("c_acctbal"), 4).alias("mean_bal"),
    )


@query(
    "stratified_sample_customers",
    """
SELECT c_mktsegment, count(*) AS n_sampled,
       round(sum(c_acctbal), 2) AS sampled_bal
FROM customer
WHERE CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT) % 10 = 0
GROUP BY 1
""",
)
def q_stratified_sample(spark, sf_dir):
    """Deterministic hash sampling (1-in-10 by md5(c_custkey)) with a
    per-stratum summary. Unlike TABLESAMPLE, the hash predicate is
    reproducible across engines AND across runs, needs no extra scan
    or sort, and pushes down as an ordinary filter — the 100 TB way
    to carve a stable sample."""
    from etl_sh_design_spark.operators.dedup import md5_int64

    c = _t(spark, sf_dir, "customer")
    sampled = c.filter(md5_int64(F.col("c_custkey").cast("string")) % 10 == 0)
    return sampled.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.round(F.sum("c_acctbal"), 2).alias("sampled_bal"),
    )


@query(
    "q4_priority_exists",
    """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY 1
""",
)
def q4_exists(spark, sf_dir):
    """TPC-H Q4 shape: correlated EXISTS rewritten as a left-semi join
    with a compound (equi + inequality) condition — Catalyst keeps the
    equi part as the hash key and evaluates the inequality as a join
    residual, so this stays a shuffled-hash/SMJ, never a nested loop."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "leftsemi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "q17_below_avg_qty",
    """
WITH pa AS (
  SELECT l_partkey, 0.2 * avg(l_quantity) AS qlim
  FROM lineitem GROUP BY 1
)
SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_weekly,
       count(*) AS n_items
FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
WHERE l.l_quantity < pa.qlim
""",
)
def q17_below_avg(spark, sf_dir):
    """TPC-H Q17 shape: scalar-subquery-per-group rewritten as an
    aggregate + self-join (Spark broadcasts the per-part averages —
    an agg-join, not a correlated re-scan). Float-safe: l_quantity is
    integral and per-part sums are exact in double, so 0.2*avg is
    bit-identical cross-engine."""
    li = _t(spark, sf_dir, "lineitem")
    pa = li.groupBy("l_partkey").agg((0.2 * F.avg("l_quantity")).alias("qlim"))
    j = li.join(pa, "l_partkey").filter(F.col("l_quantity") < F.col("qlim"))
    return j.agg(
        F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_weekly"),
        F.count(F.lit(1)).alias("n_items"),
    )
