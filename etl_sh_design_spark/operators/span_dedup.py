"""Exact duplicated-span detection and trim audit (substring-level
dedup, after Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better": remove every repeated >=N-token span from a
corpus, keeping only its first occurrence).

Pipeline shape (all sizes linear in token count — no all-pairs term):
1. stride-1 N-token shingles are built MAP-SIDE inside the token
   array (one struct list per doc; the explode never leaves the map
   task until the gram shuffle),
2. ONE gram-keyed shuffle feeds a window over g that computes both
   the occurrence count and the winner (min(struct(doc_id, pos)))
   in the same pass — losing occurrences filter out in place, so the
   corpus text is scanned exactly once (no groupBy + join-back
   recompute),
3. each losing occurrence marks its [pos, pos+N) token range covered,
4. covered ranges union per doc via gaps-and-islands (window
   partitioned BY DOC — bounded, never global),
5. the audit aggregates kept/trimmed token mass per source.

At 100 TB the dominant cost is the gram shuffle, the same cost class
as any shingle-based dedup in `operators/dedup.py`; hot grams (boiler-
plate) are capped by `max_gram_freq` exactly like `max_shingle_freq`
caps n-gram Jaccard — a gram occurring everywhere is dropped from
trimming (it would otherwise hollow out every doc AND skew one
reducer).

Hashes are md5-derived 60-bit ints (`dedup.md5_int64`) so the DuckDB
oracle computes identical keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from etl_sh_design_spark.operators.dedup import MD5_INT64_SQL

N_SPAN = 8

# struct list of (pos, gram-hash) per doc; guarded so short docs
# produce an empty list (Spark's sequence() DESCENDS for a negative
# span — the CASE is load-bearing, not defensive)
_GRAMS_SPARK = (
    "CASE WHEN size(toks) >= {n} THEN"
    " transform(sequence(0, size(toks) - {n}),"
    "   i -> struct(i AS pos,"
    "     CAST(conv(substring(md5(concat_ws(' ', slice(toks, i + 1, {n}))), 1, 15), 16, 10)"
    "       AS BIGINT) AS g))"
    " ELSE array() END"
)

_GRAMS_DUCK = (
    "list_transform(range(0, greatest(len(toks) - {n} + 1, 0)),"
    " i -> struct_pack(pos := i,"
    "   g := " + MD5_INT64_SQL.format(x="array_to_string(toks[i + 1 : i + {n}], ' ')") + "))"
)


def covered_spans(tokenized: DataFrame, max_gram_freq: int = 10_000) -> DataFrame:
    """(doc_id, toks) -> (doc_id, pos, end): the to-trim occurrences.

    A span occurrence loses if its gram occurs more than once corpus-
    wide and it is not the min(doc_id, pos) occurrence. Grams above
    `max_gram_freq` are treated as boilerplate and exempted."""
    occ = tokenized.select(
        "doc_id", F.explode(F.expr(_GRAMS_SPARK.format(n=N_SPAN))).alias("o")
    ).select("doc_id", F.col("o.pos").alias("pos"), F.col("o.g").alias("g"))
    # winner + count via a window over g rather than groupBy+join-back:
    # ONE pass over the exploded grams (the corpus text is scanned
    # once), one g-keyed exchange, no recompute of the explode for the
    # join side (plan-audited: the join formulation scanned the text
    # twice)
    wg = W.partitionBy("g")
    return (
        occ.withColumn("w", F.min(F.struct("doc_id", "pos")).over(wg))
        .withColumn("n", F.count(F.lit(1)).over(wg))
        .filter(
            (F.col("n") > 1)
            & (F.col("n") <= max_gram_freq)
            & (
                (F.col("doc_id") != F.col("w.doc_id"))
                | (F.col("pos") != F.col("w.pos"))
            )
        )
        .select("doc_id", "pos", (F.col("pos") + N_SPAN).alias("end"))
    )


def trim_audit(docs: DataFrame, toks_expr: str, max_gram_freq: int = 10_000) -> DataFrame:
    """Per-source trim audit: how many tokens would substring-dedup
    remove. `toks_expr` is a Spark SQL expression producing the token
    array from `text`."""
    tokenized = docs.select(
        "doc_id", "source", F.expr(toks_expr).alias("toks")
    ).withColumn("n_tokens", F.size("toks").cast("bigint"))
    spans = covered_spans(tokenized.select("doc_id", "toks"), max_gram_freq)

    # gaps-and-islands union of [pos, end) per doc: bounded window
    w = W.partitionBy("doc_id").orderBy("pos", "end")
    run_end = F.max("end").over(w.rowsBetween(W.unboundedPreceding, -1))
    islands = (
        spans.withColumn(
            "new_island",
            F.when(F.col("pos") > F.coalesce(run_end, F.lit(-1)), 1).otherwise(0),
        )
        .withColumn("island", F.sum("new_island").over(w))
        .groupBy("doc_id", "island")
        .agg((F.max("end") - F.min("pos")).alias("covered"))
        .groupBy("doc_id")
        .agg(F.sum("covered").cast("bigint").alias("covered"))
    )
    per_doc = tokenized.join(islands, "doc_id", "left").select(
        "source",
        "n_tokens",
        F.coalesce("covered", F.lit(0)).cast("bigint").alias("covered"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("covered").cast("bigint").alias("trimmed_tokens"),
        F.sum((F.col("covered") > 0).cast("int")).cast("bigint").alias("n_docs_trimmed"),
        F.round(
            F.lit(1.0) - F.sum("covered").cast("double") / F.sum("n_tokens"), 6
        ).alias("kept_fraction"),
    )


def trim_audit_oracle_sql(docs_cte: str, toks_duck: str, max_gram_freq: int = 10_000) -> str:
    """DuckDB twin of `trim_audit`. `docs_cte`: full SELECT producing
    (doc_id, source, text); `toks_duck`: token-array expression."""
    grams = _GRAMS_DUCK.replace("{n}", str(N_SPAN))
    return f"""
WITH docs AS ({docs_cte}),
tokenized AS (
  SELECT doc_id, source, {toks_duck} AS toks FROM docs
),
occ AS (
  SELECT doc_id, o.pos AS pos, o.g AS g
  FROM (SELECT doc_id, unnest({grams}) AS o FROM tokenized)
),
winners AS (
  SELECT g, min(struct_pack(doc_id := doc_id, pos := pos)) AS w,
         count(*) AS n
  FROM occ GROUP BY g
),
spans AS (
  SELECT occ.doc_id, occ.pos, occ.pos + {N_SPAN} AS "end"
  FROM occ JOIN winners USING (g)
  WHERE winners.n > 1 AND winners.n <= {max_gram_freq}
    AND (occ.doc_id <> winners.w.doc_id OR occ.pos <> winners.w.pos)
),
flagged AS (
  SELECT doc_id, pos, "end",
         CASE WHEN pos > coalesce(max("end") OVER (
                PARTITION BY doc_id ORDER BY pos, "end"
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_island
  FROM spans
),
grouped AS (
  SELECT doc_id, pos, "end",
         sum(new_island) OVER (
           PARTITION BY doc_id ORDER BY pos, "end"
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
),
islands AS (
  SELECT doc_id, CAST(sum(covered) AS BIGINT) AS covered
  FROM (
    SELECT doc_id, island, max("end") - min(pos) AS covered
    FROM grouped GROUP BY doc_id, island
  ) GROUP BY doc_id
),
per_doc AS (
  SELECT t.source, CAST(len(t.toks) AS BIGINT) AS n_tokens,
         CAST(coalesce(i.covered, 0) AS BIGINT) AS covered
  FROM tokenized t LEFT JOIN islands i USING (doc_id)
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(covered) AS BIGINT) AS trimmed_tokens,
       CAST(sum(CASE WHEN covered > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_trimmed,
       round(1.0 - CAST(sum(covered) AS DOUBLE) / sum(n_tokens), 6) AS kept_fraction
FROM per_doc GROUP BY source
"""
