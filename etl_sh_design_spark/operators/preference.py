"""Pairwise-preference aggregation: Bradley-Terry strengths via MM
iterations (Hunter 2004, "MM algorithms for generalized Bradley-Terry
models") — the RLHF/reward-data curation shape the battery still
lacked: a stream of pairwise preferences (A beat B) reduced to
per-item strengths, the computation behind preference-data quality
audits (annotator drift, option bias) and reward-model data mixing.

Scale contract (the 100 TB shape): the comparison stream is N-sized
map/window work — ONE user-keyed exchange for the adjacency window —
and everything after the wins aggregation lives on a |items|²-bounded
matrix (items = distinct labels ≪ N), so each MM round costs
|items|², however large the comparison log. No iteration ever touches
the raw stream again.

Determinism contract (what makes the DuckDB oracle hash-match): the
per-round MM denominator D_i = Σ_j n_ij/(p_i+p_j) quantizes every
term to integer micro-units BEFORE the sum (round(n_ij·1e6/(p_i+p_j))
as BIGINT — the same order-free integer-add trick as the PQ ADC
path), the update p_i = W_i·1e6/D_i divides exact integers (< 2^53),
and strengths round to 6dp per round. Comparisons order by (ts,
event_id) — a total order — and drop ties and same-item pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def preference_pairs(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    item_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """(winner, loser) per comparison: within each user's (ts, id)-
    ordered stream, each ADJACENT pair of events with distinct items
    and distinct values is one preference, won by the higher value.
    One user-keyed window — N rows in, < N comparisons out."""
    w = W.partitionBy(user_col).orderBy(ts_col, id_col)
    lagged = events.select(
        F.col(item_col).alias("cur_item"),
        F.col(value_col).alias("cur_value"),
        F.lag(item_col).over(w).alias("prev_item"),
        F.lag(value_col).over(w).alias("prev_value"),
    ).filter(
        F.col("prev_item").isNotNull()
        & (F.col("prev_item") != F.col("cur_item"))
        & (F.col("prev_value") != F.col("cur_value"))
    )
    return lagged.select(
        F.when(F.col("cur_value") > F.col("prev_value"), F.col("cur_item"))
        .otherwise(F.col("prev_item"))
        .alias("winner"),
        F.when(F.col("cur_value") > F.col("prev_value"), F.col("prev_item"))
        .otherwise(F.col("cur_item"))
        .alias("loser"),
    )


def bradley_terry_strengths(
    events: DataFrame, rounds: int = 3, **pair_kw
) -> DataFrame:
    """Per-item (n_wins, n_games, strength): `rounds` MM iterations of
    the Bradley-Terry model over the aggregated win matrix, strengths
    normalized to sum 1 at the end (BT is scale-invariant, so the
    normalization fixes the gauge). See the module docstring for the
    determinism and scale contracts."""
    pairs = preference_pairs(events, **pair_kw)
    wins = pairs.groupBy("winner", "loser").agg(
        F.count(F.lit(1)).alias("w")
    ).localCheckpoint(eager=False)
    # symmetric game counts n_ij (i < j once, then mirrored)
    games = (
        wins.select(F.col("winner").alias("a"), F.col("loser").alias("b"), "w")
        .unionByName(
            wins.select(
                F.col("loser").alias("a"), F.col("winner").alias("b"), "w"
            )
        )
        .groupBy("a", "b")
        .agg(F.sum("w").alias("n"))
        .localCheckpoint(eager=False)
    )
    totals = games.groupBy("a").agg(F.sum("n").alias("n_games"))
    w_tot = wins.groupBy("winner").agg(F.sum("w").alias("n_wins"))
    items = totals.join(
        w_tot, totals.a == w_tot.winner, "left"
    ).select(
        F.col("a").alias("item"),
        F.coalesce("n_wins", F.lit(0)).cast("bigint").alias("n_wins"),
        F.col("n_games").cast("bigint").alias("n_games"),
    ).localCheckpoint(eager=False)

    p = items.select("item", F.lit(1.0).alias("p"))
    for _ in range(rounds):
        pi = p.select(F.col("item").alias("a"), F.col("p").alias("p_a"))
        pj = p.select(F.col("item").alias("b"), F.col("p").alias("p_b"))
        # integer micro-unit terms -> order-free sum (module docstring)
        d = (
            games.join(F.broadcast(pi), "a")
            .join(F.broadcast(pj), "b")
            .select(
                "a",
                F.round(F.col("n") * 1e6 / (F.col("p_a") + F.col("p_b")))
                .cast("bigint")
                .alias("t_micro"),
            )
            .groupBy("a")
            .agg(F.sum("t_micro").alias("d_micro"))
        )
        p = (
            items.join(d, items.item == d.a)
            .select(
                "item",
                F.round(
                    F.col("n_wins").cast("double") * 1e6 / F.col("d_micro"), 6
                ).alias("p"),
            )
        )
    # gauge fix: normalize over the exact micro-unit total
    pm = p.select("item", F.round(F.col("p") * 1e6).cast("bigint").alias("pm"))
    tot = pm.agg(F.sum("pm").alias("tot"))
    out = pm.crossJoin(F.broadcast(tot)).select(
        "item",
        F.round(F.col("pm").cast("double") / F.col("tot"), 6).alias("strength"),
    )
    return (
        items.join(out, "item")
        .select(
            F.col("item").alias("event_type"), "n_wins", "n_games", "strength"
        )
    )


def bradley_terry_oracle_sql(rounds: int = 3) -> str:
    """DuckDB twin over the `events` view: the adjacency comparisons,
    the win/game matrices, `rounds` unrolled MM iterations with the
    same micro-unit quantization, and the final gauge normalization."""
    mm = """
p{k} AS (
  SELECT items.item,
         round(CAST(items.n_wins AS DOUBLE) * 1e6 / d.d_micro, 6) AS p
  FROM items JOIN (
    SELECT g.a, CAST(sum(CAST(round(g.n * 1e6 / (pa.p + pb.p)) AS BIGINT))
                     AS BIGINT) AS d_micro
    FROM games g
    JOIN p{km1} pa ON pa.item = g.a
    JOIN p{km1} pb ON pb.item = g.b
    GROUP BY g.a
  ) d ON d.a = items.item
)"""
    chain = ",".join(mm.format(k=k, km1=k - 1) for k in range(1, rounds + 1))
    return f"""
WITH ordered AS (
  SELECT user_id, event_type, value,
         lag(event_type) OVER w AS prev_item,
         lag(value) OVER w AS prev_value
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
pairs AS (
  SELECT CASE WHEN value > prev_value THEN event_type ELSE prev_item END AS winner,
         CASE WHEN value > prev_value THEN prev_item ELSE event_type END AS loser
  FROM ordered
  WHERE prev_item IS NOT NULL
    AND prev_item <> event_type AND prev_value <> value
),
wins AS (SELECT winner, loser, count(*) AS w FROM pairs GROUP BY 1, 2),
games AS (
  SELECT a, b, CAST(sum(w) AS BIGINT) AS n FROM (
    SELECT winner AS a, loser AS b, w FROM wins
    UNION ALL
    SELECT loser AS a, winner AS b, w FROM wins
  ) GROUP BY 1, 2
),
items AS (
  SELECT g.a AS item,
         CAST(coalesce(wt.n_wins, 0) AS BIGINT) AS n_wins,
         CAST(g.n_games AS BIGINT) AS n_games
  FROM (SELECT a, sum(n) AS n_games FROM games GROUP BY 1) g
  LEFT JOIN (SELECT winner, sum(w) AS n_wins FROM wins GROUP BY 1) wt
    ON wt.winner = g.a
),
p0 AS (SELECT item, CAST(1.0 AS DOUBLE) AS p FROM items),
{chain},
pm AS (SELECT item, CAST(round(p * 1e6) AS BIGINT) AS pm FROM p{rounds})
SELECT items.item AS event_type, items.n_wins, items.n_games,
       round(CAST(pm.pm AS DOUBLE) / (SELECT sum(pm) FROM pm), 6) AS strength
FROM items JOIN pm ON pm.item = items.item
"""
