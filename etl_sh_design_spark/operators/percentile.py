"""Scalable EXACT grouped percentiles (the percentile_cont semantics)
without executor-side buffering.

Spark's exact `percentile(...)` aggregate collects every value of a
group into one in-memory buffer — at 100 TB a handful of huge groups
(e.g. 3 l_returnflag values over all of lineitem) is an executor OOM,
which is why tools/plan_lint.py bans it (rule EXACT_PERCENTILE).

This operator computes the SAME interpolated result from a
sort-spillable plan instead:

1. groupBy(keys, col).count()        -- distinct values + multiplicity
                                        (map-side combined; the only
                                        full-data shuffle)
2. one (keys)-partitioned window     -- cumulative count = the 0-based
   over the DISTINCT values             position range each value covers
3. per requested fraction p: target position pos = (n-1)*p; pick the
   values covering floor(pos) / ceil(pos) with conditional aggregates
   and linearly interpolate — identical to percentile_cont / DuckDB
   quantile_cont / Spark percentile.

Memory: the window sorts DISTINCT values per key (Spark sort is
disk-spillable) and holds O(1) running state — no value buffering. A
key with billions of DISTINCT values would still funnel through one
sort task; for that shape use percentile_approx (the engine's sketch
surface, `approx_stats`) — the exact/sketch trade is now an explicit
choice instead of a silent OOM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def grouped_percentiles(
    df: DataFrame,
    keys: list[str],
    col: str,
    fracs: dict[str, float],
) -> DataFrame:
    """Exact interpolated percentiles per key group.

    Returns one row per key combination with a column per entry of
    `fracs` (name -> fraction in [0, 1]). Null-valued rows are ignored
    (matching the percentile aggregate); a group with no non-null
    values produces no row.
    """
    vals = df.filter(F.col(col).isNotNull()).groupBy(*keys, col).agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    w = W.partitionBy(*keys).orderBy(col)
    wall = W.partitionBy(*keys)
    ranked = vals.select(
        *keys,
        F.col(col).alias("_v"),
        (F.sum("_cnt").over(w) - F.col("_cnt")).alias("_lo"),  # first 0-based pos
        (F.sum("_cnt").over(w) - 1).alias("_hi"),  # last 0-based pos
        F.sum("_cnt").over(wall).alias("_n"),
    )
    aggs = []
    for name, frac in fracs.items():
        pos = (F.col("_n") - 1) * F.lit(float(frac))
        lo_pos, hi_pos = F.floor(pos), F.ceil(pos)
        v_lo = F.max(
            F.when((F.col("_lo") <= lo_pos) & (lo_pos <= F.col("_hi")), F.col("_v"))
        )
        v_hi = F.max(
            F.when((F.col("_lo") <= hi_pos) & (hi_pos <= F.col("_hi")), F.col("_v"))
        )
        # recompute the weight from the same expressions (pos is per-key)
        weight = F.max(pos - F.floor(pos))
        aggs.append((v_lo + weight * (v_hi - v_lo)).alias(name))
    return ranked.groupBy(*keys).agg(*aggs)
