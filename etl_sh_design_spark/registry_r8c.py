"""Round-8c extension registry: the selection / normalization /
preprocessing curation shapes the pipeline family still lacked.

- `perplexity_buckets` — the CCNet head/middle/tail corpus partition
  (Wenzek et al. 2020): exact tercile thresholds of the per-doc
  bigram-LM NLL via the sort-spillable rank plan, broadcast scalars,
  map-side bucketing. Completes `bigram_lm_perplexity` (which scores)
  with the SELECTION step CCNet actually ships.
- `quality_retention_curve` — the filter-design curve: docs kept and
  token share retained at every quality-score threshold 0.00..0.90,
  one corpus scan. This is the artifact a data engineer reads to pick
  the cut before running `quality_filter_chain`/`token_budget_selection`.
- `normalized_dedup` — exact dedup AFTER aggressive text
  normalization (lowercase, strip punctuation, collapse whitespace —
  the C4/CCNet dedup key), audited against raw exact dedup on a corpus
  with planted case/whitespace variants.
- `embedding_dim_stats` — per-dimension mean/std/min/max over the
  embedding corpus: the whitening/centering statistics the ANN ladder
  (IVF/PQ) consumes as a preprocessing table.
- `source_cap_sample` — per-source document cap (the FineWeb-style
  per-domain cap): keep the top-K docs per source by quality, report
  the kept count and retained token share per source.
- `dup_ngram_fraction` — the LAST Gopher repetition rule
  (completing `doc_repetition` = duplicate passages and
  `top_ngram_coverage` = top n-gram share): fraction of document
  characters inside DUPLICATE word n-grams for n in 5..10, with the
  published per-n breach thresholds 0.15/0.14/0.13/0.12/0.11/0.10.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etl_sh_design_spark.functions import text
from etl_sh_design_spark.operators.percentile import grouped_percentiles
from etl_sh_design_spark.registry import _t, query
from etl_sh_design_spark.registry_pipeline import _TOKS, _TOKS_DUCK
from etl_sh_design_spark.registry_r5b import _scored_docs_sql
from etl_sh_design_spark.registry_r8b import DOC_NLL_CTES, doc_nll_df

# ------------------------------------------------ perplexity buckets
# Exact double literals for the tercile fractions: Python repr round-
# trips, and the SAME literal is pasted into the DuckDB SQL, so both
# engines compute pos = (n-1)*p from bit-identical inputs.
_P33 = 1.0 / 3.0
_P66 = 2.0 / 3.0

_PPLB_SQL = f"""
WITH {DOC_NLL_CTES},
thr AS (
  SELECT round(quantile_cont(doc_nll, {_P33!r}), 6) AS t33,
         round(quantile_cont(doc_nll, {_P66!r}), 6) AS t66
  FROM pd
),
b AS (
  SELECT CASE WHEN doc_nll <= t33 THEN 'head'
              WHEN doc_nll <= t66 THEN 'middle'
              ELSE 'tail' END AS bucket,
         doc_nll, round(power(2.0, doc_nll), 4) AS ppl
  FROM pd CROSS JOIN thr
)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(doc_nll), 6) AS mean_nll,
       round(avg(ppl), 4) AS mean_ppl
FROM b GROUP BY 1
"""


@query("perplexity_buckets", _PPLB_SQL)
def q_perplexity_buckets(spark, sf_dir):
    """CCNet head/middle/tail corpus partition: bucket every document
    by its bigram-LM NLL against the exact corpus terciles (head =
    most fluent third). CCNet ships exactly this split and trains on
    head+middle; `bigram_lm_perplexity` provides the score, this
    provides the selection.

    Scale shape: the per-doc NLL sub-plan is shared with
    bigram_lm_perplexity (registry_r8b.doc_nll_df). The terciles come
    from operators/percentile.grouped_percentiles — the sort-spillable
    rank plan, NOT the banned buffering percentile — over the per-doc
    score table (corpus-sized, but one row per DOCUMENT not per
    token). The two thresholds are a 1-row broadcast crossJoin
    (lint-whitelisted); bucketing and the final 3-group rollup are
    map-side. Float discipline: thresholds and doc_nll are both
    rounded to 6 dp before the <= comparisons, and the tercile
    fractions are pasted as identical double literals into both
    engines, so pos=(n-1)*p and the interpolation are bit-identical
    (verified: the rank plan's v_lo + w*(v_hi - v_lo) equals DuckDB's
    quantile_cont on shared doubles)."""
    pd = doc_nll_df(spark, sf_dir)
    thr = (
        grouped_percentiles(
            pd.withColumn("_g", F.lit(1)), ["_g"], "doc_nll",
            {"t33": _P33, "t66": _P66},
        )
        .select(
            F.round("t33", 6).alias("t33"), F.round("t66", 6).alias("t66")
        )
    )
    b = pd.crossJoin(F.broadcast(thr)).select(
        F.when(F.col("doc_nll") <= F.col("t33"), F.lit("head"))
        .when(F.col("doc_nll") <= F.col("t66"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
        "doc_nll",
        F.round(F.pow(F.lit(2.0), F.col("doc_nll")), 4).alias("ppl"),
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("doc_nll"), 6).alias("mean_nll"),
        F.round(F.avg("ppl"), 4).alias("mean_ppl"),
    )


# ------------------------------------------- quality retention curve
_QRC_SQL = f"""
WITH s AS ({_scored_docs_sql()}),
f AS (SELECT unnest([0, 10, 20, 30, 40, 50, 60, 70, 80, 90]) AS thr_pct),
x AS (SELECT thr_pct, score, n_tok FROM s CROSS JOIN f)
SELECT thr_pct,
       CAST(count(CASE WHEN score >= thr_pct / 100.0e0 THEN 1 END)
            AS BIGINT) AS n_docs_kept,
       CASE WHEN sum(n_tok) > 0 THEN
         round(CAST(sum(CASE WHEN score >= thr_pct / 100.0e0
                        THEN n_tok ELSE 0 END) AS DOUBLE)
               / sum(n_tok), 6) END AS token_retention
FROM x GROUP BY 1
"""


@query("quality_retention_curve", _QRC_SQL)
def q_quality_retention_curve(spark, sf_dir):
    """The filter-design selection curve: for every quality-score
    threshold in {0.00, 0.10, ..., 0.90}, how many documents survive
    `score >= thr` and what fraction of corpus TOKENS they retain.
    This is the one-scan artifact read to choose the cut point before
    committing to `quality_filter_chain` — published pipelines (C4,
    Gopher, FineWeb) all tune their quality cuts against exactly this
    doc-vs-token retention trade.

    Scale shape: score and token count are map-side expressions
    (functions/text.quality_score — pure F.* codegen); the 10x
    threshold fan-out is a map-side explode of a literal array; the
    rollup has exactly 10 groups with map-side partials, so the
    shuffle is 10 rows per task regardless of corpus size. Integer
    thresholds (thr_pct) keep the group key and the thr_pct/100.0
    comparison bit-identical cross-engine; score is the fuzzed
    round-6dp composite shared with every other quality query."""
    d = _t(spark, sf_dir, "documents")
    s = d.select(
        text.token_count("text").cast("bigint").alias("n_tok"),
        text.quality_score("text").alias("score"),
    )
    x = s.withColumn(
        "thr_pct", F.explode(F.array(*[F.lit(k) for k in range(0, 100, 10)]))
    )
    kept = F.col("score") >= F.col("thr_pct") / 100.0
    return x.groupBy("thr_pct").agg(
        F.count(F.when(kept, 1)).alias("n_docs_kept"),
        F.when(
            F.sum("n_tok") > 0,
            F.round(
                F.sum(F.when(kept, F.col("n_tok")).otherwise(0)).cast("double")
                / F.sum("n_tok"),
                6,
            ),
        ).alias("token_retention"),
    )


# ------------------------------------------------ normalized dedup
# The C4/CCNet dedup key: lowercase, strip punctuation, collapse
# whitespace. Java and RE2 agree on ASCII [^\w\s].
_NORM_SPARK = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^\\\\w\\\\s]', ''), "
    "'\\\\s+', ' '))"
)
_NORM_DUCK = (
    r"trim(regexp_replace(regexp_replace(lower(text), '[^\w\s]', '', 'g'), "
    r"'\s+', ' ', 'g'))"
)

# Planted fixture (the registry's standard deterministic-variant
# idiom, cf. semantic_decontamination's panel): every doc_id % 10 == 0
# document gets a re-cased, whitespace-padded twin — invisible to raw
# exact dedup, collapsed by the normalized key.
_NORM_PLANT_DUCK = """
SELECT doc_id, source, text FROM documents
UNION ALL
SELECT doc_id + 1000000 AS doc_id, source,
       upper(text) || '  ' AS text
FROM documents WHERE doc_id % 10 = 0
"""

_ND_SQL = f"""
WITH corpus AS ({_NORM_PLANT_DUCK}),
h AS (
  SELECT source, md5(text) AS h_raw, md5({_NORM_DUCK}) AS h_norm
  FROM corpus
),
c AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT h_raw) AS BIGINT) AS n_exact,
         CAST(count(DISTINCT h_norm) AS BIGINT) AS n_norm
  FROM h GROUP BY 1
)
SELECT source, n_docs, n_exact, n_norm,
       round(1.0e0 - CAST(n_norm AS DOUBLE) / n_docs, 6) AS norm_dup_ratio
FROM c
"""


@query("normalized_dedup", _ND_SQL)
def q_normalized_dedup(spark, sf_dir):
    """Exact dedup after aggressive text normalization — the C4/CCNet
    dedup key (lowercase -> strip punctuation -> collapse whitespace),
    audited per source against RAW exact dedup. The corpus is the
    documents table plus a planted re-cased/whitespace-padded twin of
    every doc_id % 10 == 0 document (the registry's deterministic
    near-dup fixture idiom), so the gap n_exact - n_norm is the
    measured catch of the normalization layer: raw hashing misses all
    planted twins, the normalized key collapses every one.

    Scale shape: normalization and both md5 keys are map-side codegen
    expressions; the per-source distinct counts shuffle on
    (source, hash) with partial aggregation (Spark plans the two
    COUNT(DISTINCT) via expand + two-stage agg — no value buffering);
    nothing is corpus-sized on any single node. At 100 TB this is the
    same plan as `dedup_exact` with a cheaper key-side expression."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    planted = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        "source",
        F.concat(F.upper("text"), F.lit("  ")).alias("text"),
    )
    corpus = d.unionByName(planted)
    h = corpus.select(
        "source",
        F.md5("text").alias("h_raw"),
        F.md5(F.expr(_NORM_SPARK)).alias("h_norm"),
    )
    c = h.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("h_raw").alias("n_exact"),
        F.countDistinct("h_norm").alias("n_norm"),
    )
    return c.select(
        "source",
        "n_docs",
        "n_exact",
        "n_norm",
        F.round(
            F.lit(1.0) - F.col("n_norm").cast("double") / F.col("n_docs"), 6
        ).alias("norm_dup_ratio"),
    )


# ---------------------------------------------- embedding dim stats
_EDS_SQL = """
WITH x AS (
  SELECT u.dim AS dim, u.x AS x FROM (
    SELECT unnest(list_transform(range(1, len(embedding) + 1),
           i -> {'dim': i - 1, 'x': CAST(embedding[i] AS DOUBLE)})) AS u
    FROM embeddings)
)
SELECT dim, CAST(count(*) AS BIGINT) AS n,
       round(avg(x), 6) AS mean_x,
       round(stddev_samp(x), 4) AS std_x,
       round(min(x), 6) AS min_x,
       round(max(x), 6) AS max_x
FROM x GROUP BY 1
"""


@query("embedding_dim_stats", _EDS_SQL)
def q_embedding_dim_stats(spark, sf_dir):
    """Per-dimension embedding statistics (mean / sample std / min /
    max): the centering-and-whitening preprocessing table the ANN
    ladder consumes — IVF and PQ train better on centered vectors, and
    a dimension whose std collapses to ~0 is dead weight a projection
    step should drop. One table, D rows, read before building any
    index.

    Scale shape: posexplode is map-side (D rows out per vector, no
    Python); the rollup has exactly D groups (64 here) with map-side
    partials, so the shuffle is D rows per task at any corpus size.
    Float discipline: float->double cast per element; mean/min/max
    rounded 6 dp, the variance-accumulating std rounded 4 dp (the
    engines' merge orders differ; 4 dp absorbs the last-ulp wobble,
    the same contract as stats_summary's stddev)."""
    e = _t(spark, sf_dir, "embeddings")
    x = e.select(F.posexplode("embedding").alias("dim", "xf")).select(
        "dim", F.col("xf").cast("double").alias("x")
    )
    return x.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("x"), 6).alias("mean_x"),
        F.round(F.stddev_samp("x"), 4).alias("std_x"),
        F.round(F.min("x"), 6).alias("min_x"),
        F.round(F.max("x"), 6).alias("max_x"),
    )


# ------------------------------------------------ per-source cap
_CAP_K = 15

_SCS_SQL = f"""
WITH s AS ({_scored_docs_sql()}),
r AS (
  SELECT source, n_tok, score,
         row_number() OVER (PARTITION BY source
                            ORDER BY score DESC, doc_id) AS rn
  FROM s
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(CASE WHEN rn <= {_CAP_K} THEN 1 END) AS BIGINT) AS n_kept,
       CASE WHEN sum(n_tok) > 0 THEN
         round(CAST(sum(CASE WHEN rn <= {_CAP_K} THEN n_tok ELSE 0 END)
                    AS DOUBLE) / sum(n_tok), 6) END AS token_retention
FROM r GROUP BY 1
"""


@query("source_cap_sample", _SCS_SQL)
def q_source_cap_sample(spark, sf_dir):
    """Per-source document cap — the FineWeb/C4 per-domain cap that
    stops any one source from dominating the mixture: keep the top-K
    (K=15) documents per source by (quality score DESC, doc_id),
    report per source how many documents survive and what fraction of
    that source's tokens they retain.

    Scale shape: the rank is a KEYED window (PARTITION BY source) —
    sort-spillable within each source's partitions, never global; the
    rollup groups on the same key, so source skew is the only hazard
    and AQE's skew handling plus the documented salting pattern
    (salted_agg_events) cover it. Ties are impossible cross-engine:
    the order key (round-6dp score, doc_id) is total."""
    d = _t(spark, sf_dir, "documents")
    s = d.select(
        "doc_id",
        "source",
        text.token_count("text").cast("bigint").alias("n_tok"),
        text.quality_score("text").alias("score"),
    )
    w = W.partitionBy("source").orderBy(F.desc("score"), F.asc("doc_id"))
    r = s.withColumn("rn", F.row_number().over(w))
    kept = F.col("rn") <= _CAP_K
    return r.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(kept, 1)).alias("n_kept"),
        F.when(
            F.sum("n_tok") > 0,
            F.round(
                F.sum(F.when(kept, F.col("n_tok")).otherwise(0)).cast("double")
                / F.sum("n_tok"),
                6,
            ),
        ).alias("token_retention"),
    )


# ---------------------------------------------- dup n-gram fraction
# Gopher-published breach thresholds for the duplicate-n-gram rule
_DUP_THR = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}

# stride-1 n-gram stream, duplicates KEPT (unlike the MinHash
# shingler's array_distinct — multiplicity IS the signal here)
_DUP_GRAMS = (
    "transform(sequence(1, size(toks) - n + 1), "
    "i -> concat_ws(' ', slice(toks, i, n)))"
)

_DUP_THR_CASE = " ".join(
    f"WHEN {n} THEN {thr}" for n, thr in _DUP_THR.items()
)

_DUP_SQL = f"""
WITH t AS (SELECT doc_id, source, n_chars, {_TOKS_DUCK} AS toks FROM documents),
nn AS (SELECT doc_id, source, n_chars, toks,
              unnest([5, 6, 7, 8, 9, 10]) AS n FROM t),
g AS (
  SELECT doc_id, source, n_chars, n,
         unnest(list_transform(range(1, len(toks) - n + 2),
                i -> array_to_string(toks[i : i + n - 1], ' '))) AS gram
  FROM nn WHERE len(toks) >= n
),
c AS (
  SELECT doc_id, source, n_chars, n, gram, count(*) AS cnt
  FROM g GROUP BY ALL
),
d AS (
  SELECT doc_id, source, n,
         least(1.0e0,
               CAST(coalesce(sum(CASE WHEN cnt >= 2
                                 THEN cnt * length(gram) END), 0)
                    AS DOUBLE) / max(n_chars)) AS coverage
  FROM c GROUP BY 1, 2, 3
)
SELECT source, n, CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(coverage), 6) AS avg_coverage,
       round(avg(CASE WHEN coverage > (CASE n {_DUP_THR_CASE} END)
                 THEN 1.0e0 ELSE 0.0e0 END), 6) AS breach_ratio
FROM d GROUP BY 1, 2
"""


@query("dup_ngram_fraction", _DUP_SQL)
def q_dup_ngram_fraction(spark, sf_dir):
    """Duplicate n-gram character fraction — the last Gopher
    repetition rule (Rae et al. 2021, Table A1): per document and
    n in 5..10, the fraction of characters covered by word n-grams
    that occur MORE THAN ONCE in the document (all occurrences
    counted, capped at 1.0 since overlapping occurrences can exceed
    the text length), aggregated per source with the published breach
    thresholds (0.15 down to 0.10). Together with `doc_repetition`
    (duplicate passages) and `top_ngram_coverage` (single most
    frequent n-gram) this completes the published repetition battery.

    Scale shape: MAP-ONLY on the Spark side — no gram ever reaches an
    exchange. The n fan-out (x6) is a literal-array explode; the
    stride-1 gram stream stays an IN-ROW array that one
    array_sort + aggregate pass run-length encodes, accumulating
    sum(run * length(gram)) over runs with run >= 2 (the same
    one-sorted-pass idiom as functions/text.char_entropy, staged so
    the tokenizing split evaluates once per row — Catalyst does no
    CSE across HOF lambda bodies). The only shuffle is the 6-groups-
    per-source rollup with map-side partials. The DuckDB twin keeps
    the relational explode/group form — sum over distinct grams of
    cnt * length(gram) with cnt >= 2 is algebraically the run-length
    mass. Coverage is exact-integer until one correctly-rounded
    division, so the breach comparison is bit-deterministic
    cross-engine; the first run-length draft was the shuffle form and
    measured 7.6 s at sf0.1 / 19.1 s at 10x — the map-only form is
    what ships."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "source", "n_chars", F.expr(_TOKS).alias("toks")
    ).withColumn(
        "n", F.explode(F.array(*[F.lit(n) for n in range(5, 11)]))
    )
    grams = toks.filter(F.size("toks") >= F.col("n")).select(
        "source",
        "n_chars",
        "n",
        F.expr(f"array_sort({_DUP_GRAMS})").alias("gs"),
    )
    dup_mass = (
        "aggregate(gs, "
        "struct(CAST('' AS STRING) AS prev, CAST(0 AS BIGINT) AS run, "
        "CAST(0 AS BIGINT) AS mass), "
        "(acc, g) -> struct(g AS prev, "
        "IF(g = acc.prev, acc.run + 1, CAST(1 AS BIGINT)) AS run, "
        "acc.mass + IF(g != acc.prev AND acc.run >= 2, "
        "acc.run * length(acc.prev), CAST(0 AS BIGINT)) AS mass), "
        "acc -> acc.mass + IF(acc.run >= 2, "
        "acc.run * length(acc.prev), CAST(0 AS BIGINT)))"
    )
    cov = grams.select(
        "source",
        "n",
        F.least(
            F.lit(1.0),
            F.expr(dup_mass).cast("double") / F.col("n_chars"),
        ).alias("coverage"),
    )
    thr = F.col("n")
    case = None
    for n, t in _DUP_THR.items():
        case = (
            F.when(thr == n, F.lit(t))
            if case is None
            else case.when(thr == n, F.lit(t))
        )
    return cov.groupBy("source", "n").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("coverage"), 6).alias("avg_coverage"),
        F.round(
            F.avg((F.col("coverage") > case).cast("double")), 6
        ).alias("breach_ratio"),
    )
