"""operators/percentile.grouped_percentiles: exact-value parity with
the buffering percentile aggregate (which it replaces at scale) and
the EXACT_PERCENTILE plan-lint rule that bans the buffering form."""

from __future__ import annotations

import random
import sys

from pyspark.sql import functions as F

from etl_sh_design_spark.operators.percentile import grouped_percentiles

sys.path.insert(0, "tools")
from plan_lint import lint_plan  # noqa: E402


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k STRING, v DOUBLE")


def test_matches_buffering_percentile(spark):
    rng = random.Random(7)
    rows = [
        (k, round(rng.uniform(-100, 100), 3))
        for k in ("a", "b", "c")
        for _ in range(rng.randint(1, 200))
    ]
    df = _mk(spark, rows)
    got = {
        r.k: (r.p25, r.p50, r.p95)
        for r in grouped_percentiles(
            df, ["k"], "v", {"p25": 0.25, "p50": 0.5, "p95": 0.95}
        ).collect()
    }
    want = {
        r.k: (r.p25, r.p50, r.p95)
        for r in df.groupBy("k")
        .agg(
            F.expr("percentile(v, 0.25)").alias("p25"),
            F.expr("percentile(v, 0.5)").alias("p50"),
            F.expr("percentile(v, 0.95)").alias("p95"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in got:
        for g, w in zip(got[k], want[k]):
            assert abs(g - w) < 1e-9, (k, got[k], want[k])


def test_duplicates_and_single_value(spark):
    df = _mk(spark, [("a", 5.0)] * 10 + [("b", 1.0), ("b", 2.0)])
    got = {r.k: r.med for r in grouped_percentiles(df, ["k"], "v", {"med": 0.5}).collect()}
    assert got["a"] == 5.0
    assert abs(got["b"] - 1.5) < 1e-12


def test_nulls_ignored(spark):
    df = _mk(spark, [("a", None), ("a", 1.0), ("a", 3.0), ("n", None)])
    rows = grouped_percentiles(df, ["k"], "v", {"med": 0.5}).collect()
    got = {r.k: r.med for r in rows}
    assert got == {"a": 2.0}  # all-null group produces no row


def test_no_buffering_aggregate_in_plan(spark):
    df = _mk(spark, [("a", 1.0)])
    lazy = grouped_percentiles(df, ["k"], "v", {"med": 0.5})
    assert not any(r == "EXACT_PERCENTILE" for r, _ in lint_plan(lazy))
    buffering = df.groupBy("k").agg(F.expr("percentile(v, 0.5)").alias("med"))
    assert any(r == "EXACT_PERCENTILE" for r, _ in lint_plan(buffering))
