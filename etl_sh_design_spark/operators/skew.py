"""Skew mitigation: salted two-phase aggregation (SURVEY.md §4 /
100 TB checklist: "skewed keys -> salting or AQE skew-join").

AQE handles skewed JOINS automatically; skewed AGGREGATION keys still
funnel into one reducer when a single group dominates. `salted_agg`
splits each group into `n_salts` subgroups (random-free: salt =
hash(row_id) % n), partially aggregates, then merges — two small
shuffles instead of one hot one. Works for any algebraic aggregate
(sum/count/min/max, and avg via sum+count)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation -> (group_cols..., sum_<v>, cnt).

    Phase 1 groups on (keys, salt) — the hot key's rows spread over
    n_salts reducers; phase 2 merges the n_salts partials per key (a
    tiny shuffle)."""
    salt = (F.xxhash64(*[F.col(c) for c in group_cols], F.monotonically_increasing_id()) % n_salts).alias("_salt")
    partial = (
        df.select(*group_cols, F.col(value_col), salt)
        .groupBy(*group_cols, "_salt")
        .agg(
            F.sum(value_col).alias("_psum"),
            F.count(F.lit(1)).alias("_pcnt"),
        )
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("_psum").alias(f"sum_{value_col}"),
        F.sum("_pcnt").alias("cnt"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    row_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-proof equi-join: replicate the small side n_salts times and
    spread the big side's rows of ANY single key across n_salts
    reducers (salt = hash of a row-unique column, so it is
    deterministic and needs no random source).

    Semantically identical to `big.join(small, key)` — the salt is a
    partitioning trick, not a filter — which is exactly what the
    oracle query checks. Use when one key holds a disproportionate
    share of the big side and the small side is too large to broadcast
    (otherwise broadcast wins and salting is pointless); AQE's skew
    handling covers sort-merge joins, but salting also fixes skewed
    SHUFFLED HASH joins and pre-AQE engines, and bounds the worst
    reducer at |hot key| / n_salts rows."""
    salted_big = big.withColumn("_salt", F.pmod(F.xxhash64(F.col(row_col)), F.lit(n_salts)))
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    )
    return salted_big.join(salted_small, [key, "_salt"]).drop("_salt")
