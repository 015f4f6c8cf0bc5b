"""Relational breadth batch: sessionization (session_window),
pivot, INTERSECT, ordered-statistics aggregates, and the TPC-H Q6
shape — rounding out the §2.4/§2.6/§2.8 surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sh_design_spark.registry import _t, query

_GAP_MIN = 30


@query(
    "sessionization_events",
    f"""
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         -- floor(epoch()) matches Spark's unix_timestamp (truncating);
         -- bare epoch() keeps fractional seconds and CAST would round
         CASE WHEN lag(ts) OVER w IS NULL
                   OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > {_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
       count(*) AS n_events,
       round(sum(value), 4) AS session_value
FROM sess
GROUP BY 1, 2
""",
)
def q_sessionization(spark, sf_dir):
    """Sessionization (30-min inactivity gap) via lag + running sum —
    the batch twin of streaming `session_window` (OLAP pattern from the
    engine's streaming layer, §2.9 extension)."""
    from pyspark.sql import Window as W

    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
                > _GAP_MIN * 60
            ),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)).cast("bigint"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.unix_timestamp(F.min("ts")).alias("session_start"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("session_value"),
    )


@query(
    "pivot_returnflag_status",
    """
SELECT l_returnflag,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2) AS O,
       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2) AS F
FROM lineitem
GROUP BY 1
""",
)
def q_pivot(spark, sf_dir):
    """Pivot: quantity by returnflag x linestatus spread to columns."""
    li = _t(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .sum("l_quantity")
    )
    return out.select(
        "l_returnflag",
        F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("O"),
        F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("F"),
    )


@query(
    "intersect_customers",
    """
SELECT count(*) AS n_both
FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
""",
)
def q_intersect(spark, sf_dir):
    """SO set layer completeness: INTERSECT (customers with both open
    and finished orders). LAZY single-row aggregate — building the
    DataFrame triggers no job (the former eager .count() executed at
    queries()-construction time; regression-tested by
    tests/test_monitoring.py::test_query_construction_runs_no_jobs)."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b).agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))


@query(
    "stats_summary",
    """
SELECT l_returnflag,
       round(min(l_extendedprice), 2) AS min_price,
       round(max(l_extendedprice), 2) AS max_price,
       round(avg(l_extendedprice), 4) AS mean_price,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
       round(stddev_samp(l_extendedprice), 2) AS sd_price,
       count(DISTINCT l_partkey) AS n_parts
FROM lineitem
GROUP BY 1
""",
)
def q_stats(spark, sf_dir):
    """Ordered-statistics aggregate battery: exact interpolated median
    (matches quantile_cont), sample stddev, count distinct.

    The median comes from operators/percentile.grouped_percentiles —
    the sort-spillable rank plan — NOT the buffering `percentile(...)`
    aggregate: l_returnflag has 3 values over ALL of lineitem, exactly
    the huge-group shape that OOMs the buffering form at 100 TB
    (plan-linted: rule EXACT_PERCENTILE)."""
    from etl_sh_design_spark.operators.percentile import grouped_percentiles

    li = _t(spark, sf_dir, "lineitem")
    med = grouped_percentiles(
        li, ["l_returnflag"], "l_extendedprice", {"median_price": 0.5}
    )
    base = li.groupBy("l_returnflag").agg(
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.avg("l_extendedprice"), 4).alias("mean_price"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )
    return base.join(
        med.select("l_returnflag", F.round("median_price", 4).alias("median_price")),
        "l_returnflag",
    ).select(
        "l_returnflag",
        "min_price",
        "max_price",
        "mean_price",
        "median_price",
        "sd_price",
        "n_parts",
    )


@query(
    "salted_agg_events",
    """
SELECT event_type, round(sum(value), 4) AS sum_value, count(*) AS cnt
FROM events
GROUP BY 1
""",
)
def q_salted_agg(spark, sf_dir):
    """Skew-salted two-phase aggregation — the oracle is the plain
    groupBy (the salting must be semantics-preserving). event_type has
    ~5 values over all rows: exactly the hot-key shape salting exists
    for."""
    from etl_sh_design_spark.operators.skew import salted_sum_count

    e = _t(spark, sf_dir, "events")
    out = salted_sum_count(e, ["event_type"], "value", n_salts=16)
    return out.select(
        "event_type",
        F.round("sum_value", 4).alias("sum_value"),
        "cnt",
    )


@query("approx_stats", None)  # sketches are engine-specific: rows-only check
def q_approx_stats(spark, sf_dir):
    """Approximate-aggregate surface (HLL++ count-distinct, GK
    quantile sketch) — exposed per SURVEY §2.4 note; sketch outputs
    are engine-specific so this is a rows-only contract, with the
    sanity bounds asserted in tests."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx_median"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "merge_upsert_customers",
    """
WITH updates AS (
  SELECT c_custkey, c_name, c_nationkey, round(c_acctbal + 100.0, 2) AS c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal, 'NEWSEG'
  FROM customer WHERE c_custkey % 97 = 0
),
kept AS (
  SELECT c.* FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = c.c_custkey)
),
merged AS (SELECT * FROM kept UNION ALL SELECT * FROM updates)
SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS total_bal
FROM merged GROUP BY 1
""",
)
def q_merge_upsert(spark, sf_dir):
    """MERGE-INTO emulation (CDC upsert): anti-join + union, verified
    by post-merge per-segment aggregates."""
    from etl_sh_design_spark.operators.merge import merge_upsert

    c = _t(spark, sf_dir, "customer")
    updated = c.filter(F.col("c_custkey") % 10 == 0).withColumn(
        "c_acctbal", F.round(F.col("c_acctbal") + 100.0, 2)
    )
    new_rows = (
        c.filter(F.col("c_custkey") % 97 == 0)
        .withColumn("c_custkey", F.col("c_custkey") + 1000000)
        .withColumn("c_mktsegment", F.lit("NEWSEG"))
    )
    merged = merge_upsert(c, updated.unionByName(new_rows), "c_custkey")
    return merged.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


@query(
    "q6_revenue_change",
    """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue_delta,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6(spark, sf_dir):
    """TPC-H Q6 shape: pure scan-filter-aggregate — every predicate
    must reach the parquet scan (pushdown asserted in test_plans)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1996-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue_delta"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )
