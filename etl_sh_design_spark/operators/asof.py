"""As-of (backward temporal) join — a training-pipeline staple the
reference lacks (its only temporal-ish value is a derived metric,
SURVEY §1.3); provided as a first-class extension operator.

Semantics: for each left row, attach the single most recent right row
with the same key and ``right_ts <= left_ts`` (backward as-of, ties on
timestamp resolve to the right row, i.e. <= not <).

Scale design: the naive formulation is a range join (left x right on
key + inequality) whose worst case is O(|L|x|R|) per key, or a
per-key collect. Instead we UNION the two sides tagged by origin, sort
once within each key partition by (ts, origin), and carry the last
seen right payload forward with ``last(..., ignorenulls=True)`` over a
running window. That is ONE shuffle on the join key, no row
explosion, no skew amplification beyond the key's own cardinality —
the same plan shape Flink/kdb use for as-of. At 100 TB: both sides
hash-partition by key; AQE handles hot keys; memory per task is O(1)
beyond the sort (which spills).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join. Returns every ``left`` row plus
    ``prefix + c`` for each payload column of the matched right row
    (NULL when no right row precedes the left row).

    ``payload_cols`` must not include the key; the matched right
    timestamp is exposed as ``prefix + right_ts``.
    """
    payload = F.struct(
        F.col(right_ts).alias(right_ts), *[F.col(c).alias(c) for c in payload_cols]
    )
    # A NULL right timestamp can never satisfy right_ts <= left_ts;
    # keeping such rows would let them sort first and spuriously match
    # NULL-ts left rows. Left rows with a NULL timestamp survive with a
    # NULL match (they precede every right row in the asc sort).
    right = right.filter(F.col(right_ts).isNotNull())
    r2 = right.select(
        F.col(on).alias(on),
        F.col(right_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_is_right"),
        payload.alias("_asof_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != on],
    )
    l2 = left.select(
        F.col(on).alias(on),
        F.col(left_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_is_right"),
        F.lit(None).cast(r2.schema["_asof_payload"].dataType).alias("_asof_payload"),
        *[F.col(c) for c in left.columns if c != on],
    )
    # Right rows sort BEFORE left rows at an equal timestamp so that a
    # left row sees a same-instant right row (<= semantics). The payload
    # struct is the final tie-breaker: when several right rows share
    # (key, ts), ``last`` deterministically picks the struct-max one
    # instead of whichever the shuffle happened to order last.
    w = (
        W.partitionBy(on)
        .orderBy(
            F.col("_asof_ts").asc(),
            F.col("_asof_is_right").desc(),
            F.col("_asof_payload").asc_nulls_first(),
        )
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = r2.unionByName(l2).withColumn(
        "_asof_match", F.last("_asof_payload", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("_asof_is_right") == 0)
    matched: Column = F.col("_asof_match")
    out = out.select(
        on,
        *[c for c in left.columns if c != on],
        matched[right_ts].alias(prefix + right_ts),
        *[matched[c].alias(prefix + c) for c in payload_cols],
    )
    return out
