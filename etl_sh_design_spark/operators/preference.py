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
    events: DataFrame,
    rounds: int = 3,
    comparisons: DataFrame | None = None,
    **pair_kw,
) -> DataFrame:
    """Per-item (n_wins, n_games, strength): `rounds` MM iterations of
    the Bradley-Terry model over the aggregated win matrix, strengths
    normalized to sum 1 at the end (BT is scale-invariant, so the
    normalization fixes the gauge). See the module docstring for the
    determinism and scale contracts.

    `comparisons`: a precomputed `_rater_comparisons` frame — the
    battery's ONE user-keyed exchange, shared across all its queries
    when the registry passes the memoized sub-plan (result-identical
    to recomputing; `preference_pairs` is that frame minus the rater/
    position columns)."""
    pairs = (
        comparisons.select("winner", "loser")
        if comparisons is not None
        else preference_pairs(events, **pair_kw)
    )
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


# The shared rater-attributed comparisons SQL: one adjacency window
# over the events stream, keeping the rater and which POSITION won
# (prev = the option the rater saw FIRST).
_COMPARISONS_CTE = """
ordered AS (
  SELECT user_id, event_type, value,
         lag(event_type) OVER w AS prev_item,
         lag(value) OVER w AS prev_value
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
comparisons AS (
  SELECT user_id AS rater,
         CASE WHEN value > prev_value THEN event_type ELSE prev_item END AS winner,
         CASE WHEN value > prev_value THEN prev_item ELSE event_type END AS loser,
         CASE WHEN prev_value > value THEN 1 ELSE 0 END AS first_won
  FROM ordered
  WHERE prev_item IS NOT NULL
    AND prev_item <> event_type AND prev_value <> value
)"""


def _rater_comparisons(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    item_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """(rater, winner, loser, first_won): `preference_pairs` with the
    rater kept and the POSITION of the winner recorded (first_won = 1
    iff the previously-seen option won). Same window, same filters."""
    w = W.partitionBy(user_col).orderBy(ts_col, id_col)
    lagged = events.select(
        F.col(user_col).alias("rater"),
        F.col(item_col).alias("cur_item"),
        F.col(value_col).alias("cur_value"),
        F.lag(item_col).over(w).alias("prev_item"),
        F.lag(value_col).over(w).alias("prev_value"),
    ).filter(
        F.col("prev_item").isNotNull()
        & (F.col("prev_item") != F.col("cur_item"))
        & (F.col("prev_value") != F.col("cur_value"))
    )
    first_won = F.col("prev_value") > F.col("cur_value")
    return lagged.select(
        "rater",
        F.when(first_won, F.col("prev_item"))
        .otherwise(F.col("cur_item"))
        .alias("winner"),
        F.when(first_won, F.col("cur_item"))
        .otherwise(F.col("prev_item"))
        .alias("loser"),
        first_won.cast("int").alias("first_won"),
    )


def position_bias_audit(
    events: DataFrame,
    comparisons: DataFrame | None = None,
    **pair_kw,
) -> DataFrame:
    """Per-rater first-position win rate vs the 50% null — the RLHF
    annotation-quality audit next to `bradley_terry_strengths`: human
    raters measurably over-prefer the option shown FIRST, and a rater
    whose first-position rate sits far from 0.5 is injecting position,
    not preference, into the reward data. Per rater:

    - n_comparisons, n_first_wins — integer-exact counts;
    - first_win_rate             — n_first_wins / n_comparisons (6dp);
    - z_vs_null                  — (2·W − n)/√n, the normal-approx
                                   z-score against Binomial(n, 0.5)
                                   (6dp): |z| > 2 is the conventional
                                   flag.

    Scale contract: the one user-keyed adjacency window the BT
    pipeline already pays, then a |raters|-bounded aggregate — no
    matrix, no iteration. Deterministic: counts are integers, the two
    derived columns are single IEEE double expressions rounded 6dp
    identically on both engines."""
    c = (
        comparisons
        if comparisons is not None
        else _rater_comparisons(events, **pair_kw)
    )
    return c.groupBy("rater").agg(
        F.count(F.lit(1)).alias("n_comparisons"),
        F.sum("first_won").cast("bigint").alias("n_first_wins"),
        F.round(
            F.sum("first_won") / F.count(F.lit(1)), 6
        ).alias("first_win_rate"),
        F.round(
            (2.0 * F.sum("first_won") - F.count(F.lit(1)))
            / F.sqrt(F.count(F.lit(1))),
            6,
        ).alias("z_vs_null"),
    )


def position_bias_audit_oracle_sql() -> str:
    """DuckDB twin of `position_bias_audit` over the `events` view."""
    return f"""
WITH {_COMPARISONS_CTE}
SELECT rater,
       count(*) AS n_comparisons,
       CAST(sum(first_won) AS BIGINT) AS n_first_wins,
       round(CAST(sum(first_won) AS DOUBLE) / count(*), 6) AS first_win_rate,
       round((2.0 * sum(first_won) - count(*)) / sqrt(count(*)), 6) AS z_vs_null
FROM comparisons
GROUP BY 1
"""


def rater_agreement_kappa(
    events: DataFrame,
    comparisons: DataFrame | None = None,
    **pair_kw,
) -> DataFrame:
    """Per-rater Cohen's kappa against the majority verdict — the
    inter-annotator-agreement audit of the preference battery: a
    rater whose judgments agree with the pooled majority no more than
    chance (kappa ~ 0) is adding noise to the reward data, however
    high their raw agreement rate reads on skewed pairs. The kappa
    fraction is multiplied through by n² so numerator and denominator
    are EXACT integers on both engines (no float-cancellation −0.0).

    Every judgment is binary-recoded as "chose the lexicographically
    SMALLER item of the pair" so one category pair spans all item
    pairs (the standard recoding that makes kappa well-defined across
    heterogeneous pairs). The majority verdict per (small, big) item
    pair pools ALL raters' judgments; ties break to the smaller item
    (deterministic). Per rater: kappa = (p_o − p_e) / (1 − p_e) with
    p_o their agreement rate vs the majority and p_e the chance
    agreement of their marginal with the majority's marginal over the
    pairs THEY judged; p_e = 1 (both marginals degenerate and equal)
    returns kappa = 1.

    Scale contract: the adjacency window + one groupBy on the
    |items|²-bounded pair key (broadcast back to the N-sized judgment
    stream) + one |raters|-bounded aggregate. Deterministic: all
    inputs to the kappa expression are exact integer counts; the
    expression is evaluated in the same literal shape on both
    engines and rounded 6dp."""
    c = (
        comparisons
        if comparisons is not None
        else _rater_comparisons(events, **pair_kw)
    ).select(
        "rater",
        F.least("winner", "loser").alias("small"),
        F.greatest("winner", "loser").alias("big"),
        (F.col("winner") == F.least("winner", "loser"))
        .cast("int")
        .alias("chose_small"),
    )
    maj = c.groupBy("small", "big").agg(
        (2 * F.sum("chose_small") >= F.count(F.lit(1)))
        .cast("int")
        .alias("maj_small")
    )
    j = c.join(F.broadcast(maj), ["small", "big"])
    agg = j.groupBy("rater").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("chose_small") == F.col("maj_small")).cast("int")).alias(
            "n_agree"
        ),
        F.sum("chose_small").alias("n_small"),
        F.sum("maj_small").alias("n_maj_small"),
    )
    # kappa multiplied through by n²: num = n·agree − (s·m + (n−s)(n−m)),
    # den = n² − (s·m + (n−s)(n−m)) — BOTH exact integers, so the
    # expression can never produce an engine-dependent −0.0 (the first
    # sf0.1 replay caught exactly that: a rater with p_o == p_e rounded
    # to −0.0 in DuckDB and +0.0 in Spark). den = 0 ⇔ p_e = 1.
    n = F.col("n")
    s_ = F.col("n_small")
    m = F.col("n_maj_small")
    chance = s_ * m + (n - s_) * (n - m)
    num = n * F.col("n_agree") - chance
    den = n * n - chance
    return agg.select(
        "rater",
        F.col("n").alias("n_judgments"),
        F.col("n_agree").cast("bigint").alias("n_agree"),
        F.round(F.col("n_agree") / n, 6).alias("agreement_rate"),
        F.when(den == 0, F.lit(1.0))
        .otherwise(F.round(num.cast("double") / den, 6))
        .alias("kappa"),
    )


def rater_agreement_kappa_oracle_sql() -> str:
    """DuckDB twin of `rater_agreement_kappa` over the `events` view —
    the kappa expression is written in the same literal shape so the
    IEEE double evaluation matches bit-for-bit before the 6dp round."""
    return f"""
WITH {_COMPARISONS_CTE},
coded AS (
  SELECT rater,
         least(winner, loser) AS small,
         greatest(winner, loser) AS big,
         CASE WHEN winner = least(winner, loser) THEN 1 ELSE 0 END AS chose_small
  FROM comparisons
),
maj AS (
  SELECT small, big,
         CASE WHEN 2 * sum(chose_small) >= count(*) THEN 1 ELSE 0 END AS maj_small
  FROM coded GROUP BY 1, 2
),
agg AS (
  SELECT rater,
         count(*) AS n,
         sum(CASE WHEN chose_small = maj_small THEN 1 ELSE 0 END) AS n_agree,
         sum(chose_small) AS n_small,
         sum(maj_small) AS n_maj_small
  FROM coded JOIN maj USING (small, big)
  GROUP BY 1
)
SELECT rater,
       n AS n_judgments,
       CAST(n_agree AS BIGINT) AS n_agree,
       round(CAST(n_agree AS DOUBLE) / n, 6) AS agreement_rate,
       CASE WHEN n * n - (n_small * n_maj_small + (n - n_small) * (n - n_maj_small)) = 0
            THEN 1.0
            ELSE round(CAST(n * n_agree - (n_small * n_maj_small + (n - n_small) * (n - n_maj_small)) AS DOUBLE)
                       / (n * n - (n_small * n_maj_small + (n - n_small) * (n - n_maj_small))), 6)
       END AS kappa
FROM agg
"""


def pairwise_winrate_ci(
    events: DataFrame,
    comparisons: DataFrame | None = None,
    **pair_kw,
) -> DataFrame:
    """Per item pair: win rate of the smaller item with its Wilson
    95% lower bound — the ranking-confidence audit of the preference
    battery (how sure is 'A beats B' given n judgments?). The Wilson
    interval is the standard small-n-safe choice (a plain normal CI
    degenerates at rates near 0/1). Per (item_a < item_b):

    - n_comparisons, n_wins_a — integer-exact;
    - win_rate_a              — n_wins_a / n (6dp);
    - wilson_low_a            — Wilson lower bound at z = 1.96 (6dp):
                                a pair ranks confidently only when
                                wilson_low_a > 0.5 (or, symmetric, the
                                upper bound < 0.5).

    Scale contract: the adjacency window + ONE groupBy on the
    |items|²-bounded pair key. Deterministic: the Wilson expression is
    a single IEEE double formula over integer counts, written in the
    same literal shape on both engines, rounded 6dp."""
    c = (
        comparisons
        if comparisons is not None
        else _rater_comparisons(events, **pair_kw)
    )
    agg = c.groupBy(
        F.least("winner", "loser").alias("item_a"),
        F.greatest("winner", "loser").alias("item_b"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("winner") == F.least("winner", "loser")).cast("int")
        ).alias("w"),
    )
    z2 = 1.96 * 1.96
    p = F.col("w") / F.col("n")
    n = F.col("n")
    low = (
        p
        + z2 / (2 * n)
        - 1.96 * F.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
    ) / (1 + z2 / n)
    return agg.select(
        "item_a",
        "item_b",
        F.col("n").alias("n_comparisons"),
        F.col("w").cast("bigint").alias("n_wins_a"),
        F.round(p, 6).alias("win_rate_a"),
        F.round(low, 6).alias("wilson_low_a"),
    )


def pairwise_winrate_ci_oracle_sql() -> str:
    """DuckDB twin of `pairwise_winrate_ci` — the Wilson expression in
    the same literal shape."""
    return f"""
WITH {_COMPARISONS_CTE},
agg AS (
  SELECT least(winner, loser) AS item_a,
         greatest(winner, loser) AS item_b,
         count(*) AS n,
         sum(CASE WHEN winner = least(winner, loser) THEN 1 ELSE 0 END) AS w
  FROM comparisons GROUP BY 1, 2
)
SELECT item_a, item_b,
       n AS n_comparisons,
       CAST(w AS BIGINT) AS n_wins_a,
       round(CAST(w AS DOUBLE) / n, 6) AS win_rate_a,
       round((CAST(w AS DOUBLE) / n
              + (1.96 * 1.96) / (2 * n)
              - 1.96 * sqrt((CAST(w AS DOUBLE) / n) * (1 - CAST(w AS DOUBLE) / n) / n
                            + (1.96 * 1.96) / (4 * n * n)))
             / (1 + (1.96 * 1.96) / n), 6) AS wilson_low_a
FROM agg
"""


def preference_cycle_audit(
    events: DataFrame,
    comparisons: DataFrame | None = None,
    **pair_kw,
) -> DataFrame:
    """Global transitivity audit: the fraction of item TRIPLES whose
    pooled majority directions form a cycle (A beats B, B beats C,
    C beats A) — Condorcet-cyclic preference data has no consistent
    ranking, and a reward model fit on it learns the annotators'
    noise. One row: n_triples_complete (triples where all three pairs
    have a STRICT majority), n_cyclic, cycle_rate (6dp; 0.0 when no
    complete triple exists).

    Scale contract: the adjacency window + one |items|²-bounded
    majority matrix + a three-way self-join on the |items|³-bounded
    triple space (items = distinct labels ≪ N — for label spaces
    where |items|³ is real work, bound it upstream with a label cap).
    All counts integer-exact; ties are EXCLUDED (a tied pair has no
    majority direction), so the audit is deterministic with no
    tie-break convention."""
    c = (
        comparisons
        if comparisons is not None
        else _rater_comparisons(events, **pair_kw)
    )
    m = (
        c.groupBy(
            F.least("winner", "loser").alias("a"),
            F.greatest("winner", "loser").alias("b"),
        )
        .agg(
            F.sum(
                (F.col("winner") == F.least("winner", "loser")).cast("int")
            ).alias("w_small"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(2 * F.col("w_small") != F.col("n"))  # strict majority only
        .select(
            "a",
            "b",
            (2 * F.col("w_small") > F.col("n")).cast("int").alias("a_beats_b"),
        )
    )
    ij = m.select(
        F.col("a").alias("i"), F.col("b").alias("j"), F.col("a_beats_b").alias("d_ij")
    )
    jk = m.select(
        F.col("a").alias("j"), F.col("b").alias("k"), F.col("a_beats_b").alias("d_jk")
    )
    ik = m.select(
        F.col("a").alias("i"), F.col("b").alias("k"), F.col("a_beats_b").alias("d_ik")
    )
    triples = ij.join(jk, "j").join(ik, ["i", "k"])
    cyclic = (
        (F.col("d_ij") == 1) & (F.col("d_jk") == 1) & (F.col("d_ik") == 0)
    ) | ((F.col("d_ij") == 0) & (F.col("d_jk") == 0) & (F.col("d_ik") == 1))
    return triples.agg(
        F.count(F.lit(1)).alias("n_triples_complete"),
        F.coalesce(F.sum(cyclic.cast("int")), F.lit(0))
        .cast("bigint")
        .alias("n_cyclic"),
        F.when(F.count(F.lit(1)) == 0, F.lit(0.0))
        .otherwise(F.round(F.sum(cyclic.cast("int")) / F.count(F.lit(1)), 6))
        .alias("cycle_rate"),
    )


def preference_cycle_audit_oracle_sql() -> str:
    """DuckDB twin of `preference_cycle_audit`."""
    return f"""
WITH {_COMPARISONS_CTE},
m AS (
  SELECT a, b, CASE WHEN 2 * w_small > n THEN 1 ELSE 0 END AS a_beats_b
  FROM (
    SELECT least(winner, loser) AS a,
           greatest(winner, loser) AS b,
           sum(CASE WHEN winner = least(winner, loser) THEN 1 ELSE 0 END) AS w_small,
           count(*) AS n
    FROM comparisons GROUP BY 1, 2
  ) WHERE 2 * w_small <> n
),
triples AS (
  SELECT ij.a_beats_b AS d_ij, jk.a_beats_b AS d_jk, ik.a_beats_b AS d_ik
  FROM m ij
  JOIN m jk ON jk.a = ij.b
  JOIN m ik ON ik.a = ij.a AND ik.b = jk.b
)
SELECT count(*) AS n_triples_complete,
       CAST(coalesce(sum(CASE WHEN (d_ij = 1 AND d_jk = 1 AND d_ik = 0)
                             OR (d_ij = 0 AND d_jk = 0 AND d_ik = 1)
                          THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_cyclic,
       CASE WHEN count(*) = 0 THEN 0.0
            ELSE round(CAST(sum(CASE WHEN (d_ij = 1 AND d_jk = 1 AND d_ik = 0)
                                    OR (d_ij = 0 AND d_jk = 0 AND d_ik = 1)
                                 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
       END AS cycle_rate
FROM triples
"""


def best_of_n_curve(
    events: DataFrame,
    ns: tuple[int, ...] = (1, 2, 4, 8),
    min_pool: int = 8,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Exact best-of-n expected-reward curve — the rejection-sampling
    analytics of the RLHF battery: each user's events are a candidate
    pool (one prompt's sampled generations, `value` the reward score)
    and the curve reports, for each n in `ns`, the EXPECTED MAXIMUM
    score of a uniformly-random n-subset, averaged over pools — i.e.
    how much reward best-of-n selection buys as n grows, computed in
    closed form over the WHOLE pool instead of by Monte-Carlo
    subsampling. Order statistics: with pool scores sorted ascending
    (rank k of N), P(max of an n-subset is the rank-k score) =
    C(k-1, n-1)/C(N, n) = n·∏_{i=1}^{n-1}(k-i) / ∏_{i=0}^{n-1}(N-i),
    so E[max] is one weighted sum per pool — no sampling, no variance.
    Output per n: (n_samples, n_pools, avg_expected_max). Pools with
    fewer than `min_pool` candidates are excluded from ALL n so the
    curve compares the same pools at every n (and max(ns) must be
    ≤ min_pool or the weight denominator hits zero).

    Scale contract (the 100 TB shape): ONE user-keyed window (rank +
    pool size), a map-side weight expression per n, and ONE global
    aggregate — no joins, no iteration, output |ns| rows however
    large the event stream.

    Determinism contract: ranks total-order by (value, id); each
    term value·w·1e6 quantizes to an integer micro-unit BEFORE the
    sum (the BT trick), so the per-pool and cross-pool sums are
    order-free integer adds; the weight polynomial is evaluated
    left-associated in the same literal shape on both engines."""
    if max(ns) > min_pool:
        raise ValueError(f"max(ns)={max(ns)} exceeds min_pool={min_pool}")
    w = W.partitionBy(user_col).orderBy(value_col, id_col)
    ranked = events.select(
        F.col(user_col).alias("pool"),
        F.col(value_col).cast("double").alias("score"),
        F.row_number().over(w).alias("k"),
        F.count(F.lit(1)).over(W.partitionBy(user_col)).alias("n_cand"),
    ).filter(F.col("n_cand") >= min_pool)
    kd = F.col("k").cast("double")
    nd = F.col("n_cand").cast("double")
    terms = []
    for n in ns:
        num = F.lit(float(n))
        for i in range(1, n):
            num = num * (kd - F.lit(float(i)))
        den = nd
        for i in range(1, n):
            den = den * (nd - F.lit(float(i)))
        terms.append(
            F.round(F.col("score") * (num / den) * F.lit(1e6))
            .cast("bigint")
            .alias(f"t{n}")
        )
    agg = ranked.select("pool", *terms).agg(
        F.countDistinct("pool").alias("n_pools"),
        *[F.sum(f"t{n}").alias(f"s{n}") for n in ns],
    )
    rows = [
        F.struct(
            F.lit(n).alias("n_samples"),
            F.col("n_pools").alias("n_pools"),
            F.round(
                F.col(f"s{n}").cast("double")
                / (F.lit(1e6) * F.col("n_pools")),
                6,
            ).alias("avg_expected_max"),
        )
        for n in ns
    ]
    return agg.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def best_of_n_curve_oracle_sql(
    ns: tuple[int, ...] = (1, 2, 4, 8), min_pool: int = 8
) -> str:
    """DuckDB twin of `best_of_n_curve` over the `events` view — the
    weight polynomials are generated in the same left-associated
    literal shape, each term micro-unit-quantized before the sum."""

    def w_expr(n: int) -> str:
        num = f"{float(n)}"
        for i in range(1, n):
            num = f"{num} * (kd - {float(i)})"
        den = "nd"
        for i in range(1, n):
            den = f"{den} * (nd - {float(i)})"
        return f"({num}) / ({den})"

    term_cols = ",\n         ".join(
        f"CAST(round(score * ({w_expr(n)}) * 1e6) AS BIGINT) AS t{n}"
        for n in ns
    )
    sum_cols = ", ".join(f"sum(t{n}) AS s{n}" for n in ns)
    selects = "\n  UNION ALL\n".join(
        f"  SELECT {n} AS n_samples, n_pools, "
        f"round(CAST(s{n} AS DOUBLE) / (1e6 * n_pools), 6) "
        f"AS avg_expected_max FROM agg"
        for n in ns
    )
    return f"""
WITH ranked AS (
  SELECT user_id AS pool,
         CAST(value AS DOUBLE) AS score,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY value, event_id)
              AS DOUBLE) AS kd,
         count(*) OVER (PARTITION BY user_id) AS n_cand
  FROM events
),
terms AS (
  SELECT pool,
         {term_cols}
  FROM (SELECT pool, score, kd, CAST(n_cand AS DOUBLE) AS nd
        FROM ranked WHERE n_cand >= {min_pool})
),
agg AS (SELECT count(DISTINCT pool) AS n_pools, {sum_cols} FROM terms)
{selects}
"""


def dpo_pair_construction(
    events: DataFrame,
    min_margin: float = 0.0,
    user_col: str = "user_id",
    id_col: str = "event_id",
    item_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Chosen/rejected pair extraction — the preference-data PREP op
    (DPO/reward-model training pairs): per user pool (one prompt's
    scored generations), emit the highest-scored candidate as
    `chosen` and the lowest as `rejected`, with the score margin, and
    keep only pairs whose margin strictly exceeds `min_margin` (a
    zero-margin "pair" is two indistinguishable generations — noise,
    not signal, as training data). Ties break deterministically to
    the smaller id on both ends. Output per kept pool: prompt_id,
    chosen_id/item/score, rejected_id/item/score, margin (6dp),
    n_candidates.

    Scale contract: one user-keyed exchange (two sorted windows over
    the SAME partitioning — one shuffle, two sorts) + a user-bounded
    self-join of the two rank-1 slices. Output ≤ |users| rows
    however large the stream. Determinism: total orders via the id
    tie-break; the margin is one double subtraction of input values,
    identical on both engines."""
    wd = W.partitionBy(user_col).orderBy(
        F.col(value_col).desc(), F.col(id_col).asc()
    )
    wa = W.partitionBy(user_col).orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    ranked = events.select(
        F.col(user_col).alias("prompt_id"),
        F.col(id_col).alias("cand_id"),
        F.col(item_col).alias("cand_item"),
        F.col(value_col).cast("double").alias("cand_score"),
        F.row_number().over(wd).alias("rd"),
        F.row_number().over(wa).alias("ra"),
        F.count(F.lit(1)).over(W.partitionBy(user_col)).alias("n_candidates"),
    )
    chosen = ranked.filter(F.col("rd") == 1).select(
        "prompt_id",
        F.col("cand_id").alias("chosen_id"),
        F.col("cand_item").alias("chosen_item"),
        F.col("cand_score").alias("chosen_score"),
        "n_candidates",
    )
    rejected = ranked.filter(F.col("ra") == 1).select(
        "prompt_id",
        F.col("cand_id").alias("rejected_id"),
        F.col("cand_item").alias("rejected_item"),
        F.col("cand_score").alias("rejected_score"),
    )
    return (
        chosen.join(rejected, "prompt_id")
        .filter(
            (F.col("n_candidates") >= 2)
            & (
                F.col("chosen_score") - F.col("rejected_score")
                > F.lit(float(min_margin))
            )
        )
        .select(
            "prompt_id",
            "chosen_id",
            "chosen_item",
            "chosen_score",
            "rejected_id",
            "rejected_item",
            "rejected_score",
            F.round(
                F.col("chosen_score") - F.col("rejected_score"), 6
            ).alias("margin"),
            "n_candidates",
        )
    )


def dpo_pair_construction_oracle_sql(min_margin: float = 0.0) -> str:
    """DuckDB twin of `dpo_pair_construction` over the `events` view."""
    return f"""
WITH ranked AS (
  SELECT user_id AS prompt_id, event_id AS cand_id,
         event_type AS cand_item, CAST(value AS DOUBLE) AS cand_score,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id ASC) AS rd,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value ASC, event_id ASC) AS ra,
         count(*) OVER (PARTITION BY user_id) AS n_candidates
  FROM events
)
SELECT c.prompt_id,
       c.cand_id AS chosen_id, c.cand_item AS chosen_item,
       c.cand_score AS chosen_score,
       r.cand_id AS rejected_id, r.cand_item AS rejected_item,
       r.cand_score AS rejected_score,
       round(c.cand_score - r.cand_score, 6) AS margin,
       c.n_candidates
FROM (SELECT * FROM ranked WHERE rd = 1) c
JOIN (SELECT * FROM ranked WHERE ra = 1) r USING (prompt_id)
WHERE c.n_candidates >= 2
  AND c.cand_score - r.cand_score > {float(min_margin)}
"""


def preference_label_noise(
    events: DataFrame,
    rounds: int = 3,
    comparisons: DataFrame | None = None,
    **pair_kw,
) -> DataFrame:
    """Per item pair: how many comparisons CONTRADICT the fitted
    Bradley-Terry ranking (the winner has strictly lower final
    strength than the loser) — the standard reward-data cleaning
    signal: a pair whose judgments keep disagreeing with the global
    model is either genuinely close (strengths nearly equal) or
    label noise, and both deserve a second look before the reward
    model trains on them. Output per (item_a < item_b):

    - n_comparisons, n_against_model — integer-exact;
    - frac_against_model             — 6dp.

    Scale contract: the BT pipeline's own cost (N-sized window +
    |items|²-bounded MM rounds) + one broadcast of the |items|-row
    strength vector back onto the comparison stream + one
    |items|²-bounded aggregate. Determinism: strengths are the
    hash-oracled 6dp BT outputs; the contradiction test is a strict
    < on those."""
    c = (
        comparisons
        if comparisons is not None
        else _rater_comparisons(events, **pair_kw)
    )
    st = bradley_terry_strengths(
        events, rounds=rounds, comparisons=comparisons, **pair_kw
    ).select(
        F.col("event_type").alias("item"), "strength"
    )
    sw = st.select(F.col("item").alias("winner"), F.col("strength").alias("s_w"))
    sl = st.select(F.col("item").alias("loser"), F.col("strength").alias("s_l"))
    j = c.join(F.broadcast(sw), "winner").join(F.broadcast(sl), "loser")
    against = (F.col("s_w") < F.col("s_l")).cast("int")
    return (
        j.groupBy(
            F.least("winner", "loser").alias("item_a"),
            F.greatest("winner", "loser").alias("item_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_comparisons"),
            F.sum(against).cast("bigint").alias("n_against_model"),
            F.round(F.sum(against) / F.count(F.lit(1)), 6).alias(
                "frac_against_model"
            ),
        )
    )


def preference_label_noise_oracle_sql(rounds: int = 3) -> str:
    """DuckDB twin: the full BT oracle chain nested as a CTE (its
    inner WITH is scoped inside the parentheses, so its `ordered`
    does not collide with the comparisons CTE), joined back onto the
    rater-attributed comparison stream."""
    return f"""
WITH bt AS ({bradley_terry_oracle_sql(rounds)}),
{_COMPARISONS_CTE}
SELECT least(c.winner, c.loser) AS item_a,
       greatest(c.winner, c.loser) AS item_b,
       count(*) AS n_comparisons,
       CAST(sum(CASE WHEN sw.strength < sl.strength THEN 1 ELSE 0 END) AS BIGINT)
         AS n_against_model,
       round(CAST(sum(CASE WHEN sw.strength < sl.strength THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS frac_against_model
FROM comparisons c
JOIN bt sw ON sw.event_type = c.winner
JOIN bt sl ON sl.event_type = c.loser
GROUP BY 1, 2
"""
