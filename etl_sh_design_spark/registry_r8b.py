"""Round-8b extension registry: the remaining canonical
curation-filter shapes the pipeline family lacked.

- `bigram_lm_perplexity` — a TRUE conditional n-gram LM score
  (CCNet-style: per-token -log2 P(w|prev) under an add-alpha-smoothed
  bigram model trained on the corpus itself). `token_frequency_scores`
  (registry_pipeline.py) is documented as the log-free unigram
  STAND-IN for perplexity filtering; this is the real thing, logs and
  all, with the float discipline that keeps DuckDB hash-green.
- `kcenter_coreset` — greedy max-min diversity selection over the
  embeddings table (operators/coreset.py; Gonzalez-style k-center,
  the published baseline for diversity-driven data curation).
- `top_ngram_coverage` — the last Gopher repetition rule not yet in
  the engine: fraction of document characters covered by the single
  most frequent word n-gram, for n in {2,3,4}, with the published
  per-n breach thresholds (0.20 / 0.18 / 0.16). `doc_repetition`
  covers the duplicate-PASSAGE rule; this covers the top-n-gram one.
- `dsir_importance_weights` — hashed-n-gram importance resampling
  (DSIR, Xie et al. 2023): Laplace-smoothed target-vs-raw
  bag-of-buckets models, per-doc importance log-ratio, keep fraction.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etl_sh_design_spark.operators.coreset import kcenter_coreset, kcenter_oracle_sql
from etl_sh_design_spark.operators.dedup import MD5_INT64_SQL, md5_int64
from etl_sh_design_spark.registry import _t, query
from etl_sh_design_spark.registry_pipeline import _TOKS, _TOKS_DUCK

# ------------------------------------------------ bigram LM perplexity
_ALPHA = 0.5  # add-alpha smoothing mass per bigram type

# 1-based positions; position 1's context is the sentence-start token.
_BG_PAIRS = (
    "transform(sequence(1, size(toks)), "
    "i -> struct(CASE WHEN i = 1 THEN '<s>' "
    "ELSE element_at(toks, i - 1) END AS prev, "
    "element_at(toks, i) AS cur))"
)

_BG_PAIRS_DUCK = (
    "list_transform(range(1, len(toks) + 1), "
    "i -> {'prev': CASE WHEN i = 1 THEN '<s>' ELSE toks[i - 1] END, "
    "'cur': toks[i]})"
)

# The per-doc NLL CTE chain (through `pd`), shared with
# registry_r8c's perplexity bucketing.
DOC_NLL_CTES = f"""t AS (
  SELECT doc_id, source, {_TOKS_DUCK} AS toks FROM documents
  WHERE len({_TOKS_DUCK}) > 0
),
bg AS (
  SELECT doc_id, source, u.prev AS prev, u.cur AS cur FROM (
    SELECT doc_id, source, unnest({_BG_PAIRS_DUCK}) AS u FROM t
  )
),
bgc AS (SELECT prev, cur, count(*) AS c_bg FROM bg GROUP BY 1, 2),
ctx AS (SELECT prev, count(*) AS c_prev FROM bg GROUP BY 1),
voc AS (SELECT CAST(count(DISTINCT cur) AS BIGINT) AS v_size FROM bg),
sc AS (
  SELECT b.doc_id, b.source,
         -log2((c_bg + {_ALPHA}) / (c_prev + {_ALPHA} * v_size)) AS nll
  FROM bg b JOIN bgc USING (prev, cur) JOIN ctx USING (prev) CROSS JOIN voc
),
pd AS (
  SELECT doc_id, source, round(avg(nll), 6) AS doc_nll
  FROM sc GROUP BY 1, 2
)"""

_BIGRAM_SQL = f"""
WITH {DOC_NLL_CTES},
pd2 AS (SELECT *, round(power(2.0, doc_nll), 4) AS ppl FROM pd),
g AS (SELECT round(avg(doc_nll), 6) AS corpus_nll FROM pd2)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(ppl), 4) AS mean_ppl,
       round(avg(CASE WHEN doc_nll > corpus_nll + 0.5 THEN 1.0e0
                 ELSE 0.0e0 END), 6) AS outlier_ratio
FROM pd2 CROSS JOIN g GROUP BY 1
"""


def doc_nll_df(spark, sf_dir):
    """The per-doc bigram NLL sub-plan (doc_id, source, doc_nll) —
    the Spark twin of DOC_NLL_CTES, shared by `bigram_lm_perplexity`
    and registry_r8c's `perplexity_buckets`. See
    q_bigram_lm_perplexity's docstring for the scale shape."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", "source", F.expr(_TOKS).alias("toks")).filter(
        F.size("toks") > 0
    )
    bg = toks.select(
        "doc_id", "source", F.explode(F.expr(_BG_PAIRS)).alias("p")
    ).select(
        "doc_id", "source", F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur")
    )
    bgc = bg.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c_bg"))
    ctx = bg.groupBy("prev").agg(F.count(F.lit(1)).alias("c_prev"))
    voc = bg.agg(F.countDistinct("cur").alias("v_size"))
    sc = (
        bg.join(bgc, ["prev", "cur"])
        .join(ctx, "prev")
        .crossJoin(F.broadcast(voc))
        .withColumn(
            "nll",
            -F.log2(
                (F.col("c_bg") + F.lit(_ALPHA))
                / (F.col("c_prev") + F.lit(_ALPHA) * F.col("v_size"))
            ),
        )
    )
    return sc.groupBy("doc_id", "source").agg(
        F.round(F.avg("nll"), 6).alias("doc_nll")
    )


@query("bigram_lm_perplexity", _BIGRAM_SQL)
def q_bigram_lm_perplexity(spark, sf_dir):
    """Bigram-LM perplexity scoring (CCNet-style quality filter, the
    real conditional-probability form): train an add-alpha-smoothed
    bigram model ON the corpus, score every token's -log2 P(w|prev),
    roll up per-doc perplexity, and report per-source mean perplexity
    plus the fraction of docs whose NLL sits > 0.5 bits above the
    corpus mean (the CCNet tail-cut shape).

    Scale shape: the bigram pair stream is map-side (one array
    transform + explode, no window function for the lag — position
    pairing happens inside the row); model training is two
    high-cardinality hash aggs with map-side partials; scoring joins
    shuffle on (prev, cur) / prev like token_frequency_scores (AQE
    broadcasts the model tables when small, handles them keyed when
    vocab-sized); the vocab size and corpus-mean NLL are 1-row scalar
    crossJoins (lint-whitelisted). Float discipline: per-doc NLL is
    rounded to 6 dp before exp/aggregation on BOTH engines; log2 is
    the only libm call and its per-token ulp error is ~1e-16 relative
    against a 6-dp round."""
    pd = doc_nll_df(spark, sf_dir)
    pd2 = pd.withColumn("ppl", F.round(F.pow(F.lit(2.0), F.col("doc_nll")), 4))
    g = pd2.agg(F.round(F.avg("doc_nll"), 6).alias("corpus_nll"))
    return (
        pd2.crossJoin(F.broadcast(g))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("ppl"), 4).alias("mean_ppl"),
            F.round(
                F.avg(
                    (F.col("doc_nll") > F.col("corpus_nll") + 0.5).cast("double")
                ),
                6,
            ).alias("outlier_ratio"),
        )
    )


# ------------------------------------------------ k-center coreset
_K_CENTERS = 8


@query("kcenter_coreset", kcenter_oracle_sql(k=_K_CENTERS))
def q_kcenter_coreset(spark, sf_dir):
    """Greedy k-center diversity coreset over the embeddings table
    (operators/coreset.py — see its docstring for the 100 TB contract:
    k-row broadcast center state, one vector-table pass per round,
    TakeOrdered(1) argmax, lineage cut per round, job-free
    construction)."""
    e = _t(spark, sf_dir, "embeddings")
    return kcenter_coreset(e, k=_K_CENTERS)


# ------------------------------------------------ top n-gram coverage
# Gopher-published breach thresholds per n
_NG_THR = {2: 0.20, 3: 0.18, 4: 0.16}

_NG_GRAMS = (
    "transform(sequence(1, size(toks) - n + 1), "
    "i -> concat_ws(' ', slice(toks, i, n)))"
)

_NG_SQL = f"""
WITH t AS (SELECT doc_id, source, n_chars, {_TOKS_DUCK} AS toks FROM documents),
nn AS (SELECT doc_id, source, n_chars, toks, unnest([2, 3, 4]) AS n FROM t),
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
r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id, n
                               ORDER BY cnt DESC, gram) AS rn
  FROM c
),
top AS (
  SELECT doc_id, source, n,
         CAST(cnt * length(gram) AS DOUBLE) / n_chars AS coverage
  FROM r WHERE rn = 1
)
SELECT source, n, CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(coverage), 6) AS avg_coverage,
       round(avg(CASE WHEN coverage > (CASE n WHEN 2 THEN {_NG_THR[2]}
                                       WHEN 3 THEN {_NG_THR[3]}
                                       ELSE {_NG_THR[4]} END)
                 THEN 1.0e0 ELSE 0.0e0 END), 6) AS breach_ratio
FROM top GROUP BY 1, 2
"""


@query("top_ngram_coverage", _NG_SQL)
def q_top_ngram_coverage(spark, sf_dir):
    """Top n-gram character coverage (the Gopher repetition rule
    `doc_repetition` does NOT cover): per document and n in {2,3,4},
    the fraction of characters covered by the single most frequent
    word n-gram, aggregated per source with the published breach
    thresholds (2-gram > 0.20, 3-gram > 0.18, 4-gram > 0.16).

    Scale shape: the n fan-out (x3) and the n-gram explode are
    map-side array transforms; the gram count shuffles on
    (doc_id, n, gram) — doc-local key space, map-side partials
    collapse repeats; the argmax is a keyed window PARTITION BY
    (doc_id, n) (never global); coverage is exact-integer arithmetic
    until one correctly-rounded division, so the breach comparison is
    bit-deterministic cross-engine."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "source", "n_chars", F.expr(_TOKS).alias("toks")
    ).withColumn("n", F.explode(F.array(F.lit(2), F.lit(3), F.lit(4))))
    grams = toks.filter(F.size("toks") >= F.col("n")).select(
        "doc_id",
        "source",
        "n_chars",
        "n",
        F.explode(F.expr(_NG_GRAMS)).alias("gram"),
    )
    cnt = grams.groupBy("doc_id", "source", "n_chars", "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # argmax as min(struct(-cnt, gram)) instead of a row_number window
    # (round 12, guide §2.4): same row — highest cnt, then lowest gram
    # — but a partial-aggregating groupBy replaces the window's full
    # per-partition sort, and the second exchange carries one row per
    # (doc, n) instead of every distinct gram.
    top = (
        cnt.groupBy("doc_id", "source", "n_chars", "n")
        .agg(F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("gram"))).alias("m"))
        .withColumn(
            "coverage",
            (-F.col("m.nc") * F.length(F.col("m.gram"))).cast("double")
            / F.col("n_chars"),
        )
    )
    thr = (
        F.when(F.col("n") == 2, F.lit(_NG_THR[2]))
        .when(F.col("n") == 3, F.lit(_NG_THR[3]))
        .otherwise(F.lit(_NG_THR[4]))
    )
    return top.groupBy("source", "n").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("coverage"), 6).alias("avg_coverage"),
        F.round(
            F.avg((F.col("coverage") > thr).cast("double")), 6
        ).alias("breach_ratio"),
    )


# ------------------------------------------- DSIR importance weights
_DSIR_B = 256  # hashed-feature buckets

_DSIR_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, lang, unnest({_TOKS_DUCK}) AS tok FROM documents
),
b AS (
  SELECT doc_id, source, lang,
         {MD5_INT64_SQL.format(x='tok')} % {_DSIR_B} AS bucket
  FROM toks
),
raw AS (SELECT bucket, count(*) AS c_r FROM b GROUP BY 1),
tgt AS (SELECT bucket, count(*) AS c_t FROM b WHERE lang = 'en' GROUP BY 1),
tot AS (
  SELECT count(*) AS n_r,
         count(*) FILTER (WHERE lang = 'en') AS n_t
  FROM b
),
model AS (
  SELECT bucket,
         ln((coalesce(c_t, 0) + 1) / (n_t + {_DSIR_B}))
         - ln((c_r + 1) / (n_r + {_DSIR_B})) AS lr
  FROM raw LEFT JOIN tgt USING (bucket) CROSS JOIN tot
),
docb AS (
  SELECT doc_id, source, bucket, count(*) AS c FROM b GROUP BY 1, 2, 3
),
logw AS (
  SELECT doc_id, source, round(sum(c * lr), 6) AS logw
  FROM docb JOIN model USING (bucket) GROUP BY 1, 2
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(logw), 6) AS mean_logw,
       round(avg(CASE WHEN logw > 0 THEN 1.0e0 ELSE 0.0e0 END), 6)
         AS sel_ratio
FROM logw GROUP BY 1
"""


@query("dsir_importance_weights", _DSIR_SQL)
def q_dsir_importance_weights(spark, sf_dir):
    """DSIR-style importance resampling weights (hashed n-gram
    features; Xie et al. 2023, "Data Selection for Language Models
    via Importance Resampling"): hash every token into B=256 feature
    buckets, fit Laplace-smoothed bag-of-buckets models for the
    TARGET distribution (lang='en' docs, the stand-in for a curated
    target corpus) and the RAW distribution (all docs), then score
    each document with the importance log-ratio
    sum_b c_doc(b) * (ln p_target(b) - ln p_raw(b)). Reported per
    source: mean log-weight and the fraction of docs a
    weight-threshold resampler (logw > 0) would keep.

    Scale shape: tokenize/hash/bucket is map-side; both model aggs
    are B-bounded (256 groups) with map-side partials; the model
    table is KB-sized and BROADCAST to the per-doc bucket-count join,
    so the only data-sized shuffle is the (doc_id, bucket) count —
    doc-local keys, partition-parallel at any corpus size. The
    token-total pair is a 1-row scalar crossJoin (lint-whitelisted).
    Float discipline: int/int true division then ln; per-doc log
    weight rounded 6 dp on both engines before thresholding/
    averaging."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "source", "lang", F.explode(F.expr(_TOKS)).alias("tok")
    )
    b = toks.withColumn("bucket", md5_int64(F.col("tok")) % _DSIR_B)
    raw = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_r"))
    tgt = (
        b.filter(F.col("lang") == "en")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c_t"))
    )
    tot = b.agg(
        F.count(F.lit(1)).alias("n_r"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("n_t"),
    )
    model = (
        raw.join(tgt, "bucket", "left")
        .na.fill(0, ["c_t"])
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (
                F.log((F.col("c_t") + 1) / (F.col("n_t") + _DSIR_B))
                - F.log((F.col("c_r") + 1) / (F.col("n_r") + _DSIR_B))
            ).alias("lr"),
        )
    )
    docb = b.groupBy("doc_id", "source", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    logw = (
        docb.join(F.broadcast(model), "bucket")
        .groupBy("doc_id", "source")
        .agg(F.round(F.sum(F.col("c") * F.col("lr")), 6).alias("logw"))
    )
    return logw.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("logw"), 6).alias("mean_logw"),
        F.round(F.avg((F.col("logw") > 0).cast("double")), 6).alias("sel_ratio"),
    )


# ------------------------------------------- semantic decontamination
_SD_DOT = (
    "round(aggregate(zip_with(v, pv, (a, b) -> a * b), "
    "cast(0.0 as double), (acc, x) -> acc + x), 6)"
)
_SD_NORM = (
    "round(aggregate(zip_with({c}, {c}, (a, b) -> a * b), "
    "cast(0.0 as double), (acc, x) -> acc + x), 6)"
)

_SD_DOT_DUCK = (
    "round(list_sum(list_transform(range(1, len(v) + 1), "
    "i -> v[i] * pv[i])), 6)"
)
_SD_NORM_DUCK = (
    "round(list_sum(list_transform(range(1, len({c}) + 1), "
    "i -> {c}[i] * {c}[i])), 6)"
)

_SD_SQL = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
panel AS (SELECT vec_id AS probe_id, v AS pv FROM e
          WHERE vec_id % 50 = 0 AND vec_id < 500),
planted AS (
  SELECT probe_id + 1000000 AS vec_id,
         list_transform(range(1, len(pv) + 1),
                        i -> pv[i] * (1 + 0.01 * (((i - 1) % 2) * 2 - 1))) AS v
  FROM panel
),
train AS (
  SELECT vec_id, v FROM e WHERE vec_id % 50 != 0 OR vec_id >= 500
  UNION ALL SELECT vec_id, v FROM planted
),
scored AS (
  SELECT t.vec_id, p.probe_id,
         round({_SD_DOT_DUCK}
               / (sqrt({_SD_NORM_DUCK.format(c='v')})
                  * sqrt({_SD_NORM_DUCK.format(c='pv')})), 6) AS cos
  FROM train t CROSS JOIN panel p
  WHERE {_SD_NORM_DUCK.format(c='v')} > 0
    AND {_SD_NORM_DUCK.format(c='pv')} > 0
)
SELECT probe_id,
       CAST(count(CASE WHEN cos >= 0.99 THEN 1 END) AS BIGINT)
         AS n_contaminated,
       round(max(cos), 6) AS max_cos
FROM scored GROUP BY 1
"""


@query("semantic_decontamination", _SD_SQL)
def q_semantic_decontamination(spark, sf_dir):
    """Embedding-side benchmark decontamination — the semantic rung
    the n-gram (`decontamination`) and Bloom (`bloom_decontamination`)
    variants cannot catch: paraphrased/perturbed eval leaks that share
    no 8-gram with the eval set. The eval panel is FIXED-SIZE
    (vec_id % 50 == 0 below id 500 — an eval set does not grow with
    the training corpus, which is what keeps the whole query linear
    in corpus size); the training corpus is everything else PLUS a
    planted +-1% perturbation of each panel vector (the registry's
    standard deterministic near-dup fixture, embedding_neardup's
    idiom). For each probe: how many training vectors sit at cosine
    >= 0.99, and the max cosine seen.

    Scale shape: the panel is eval-set-sized (KBs-MBs) and BROADCAST;
    the corpus side is a single map-only scan (zip_with dot + norms
    inside codegen, no vector shuffle); the rollup groups by probe_id
    — panel-bounded. For panels too large to broadcast, step down to
    the bucketed ANN ladder (similarity_ann_ivf / similarity_ann_lsh)
    — same contract as `embedding_neardup`'s documented dispatch.
    Determinism: index-order dot/norm folds rounded 6 dp before the
    division, cosine rounded 6 dp before threshold/max on BOTH
    engines.

    Scoring runs as a BLAS GEMM against the broadcast eval panel
    inside mapInPandas since round 12 (guide §4.2 — same move as
    cosine_topk / hard_negative_mining; the HOF form stays behind
    use_gemm=False as the parity twin). Each Arrow batch emits ONE
    partial row per probe (count of cos >= 0.99 + batch max), so the
    exchange is ~tasks x |panel| rows; all roundings (dot and squared
    norms at 6 dp before the division, cosine at 6 dp before the
    threshold/max) happen batch-side with np.round."""
    return semantic_decontamination_result(spark, sf_dir, use_gemm=True)


def semantic_decontamination_result(spark, sf_dir, use_gemm: bool = True):
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    panel = e.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 500)).select(
        F.col("vec_id").alias("probe_id"), F.col("v").alias("pv")
    )
    planted = panel.select(
        (F.col("probe_id") + 1000000).alias("vec_id"),
        F.transform(
            "pv", lambda x, i: x * (1 + 0.01 * ((i % 2) * 2 - 1))
        ).alias("v"),
    )
    train = e.filter(
        (F.col("vec_id") % 50 != 0) | (F.col("vec_id") >= 500)
    ).unionByName(planted)
    if use_gemm:
        import numpy as np

        from etl_sh_design_spark.operators.similarity import (
            session_broadcast_panel,
        )

        def _build(ppdf):  # eval-panel-sized by contract
            p_ids = ppdf["probe_id"].to_numpy(dtype="int64")
            if len(ppdf):
                pm = np.vstack(
                    [np.asarray(v, dtype="float64") for v in ppdf["pv"]]
                )
            else:
                pm = np.zeros((0, 1))
            # _SD_NORM: squared norms rounded 6 dp BEFORE sqrt/division
            pn2 = np.round((pm * pm).sum(axis=1), 6)
            keep_p = pn2 > 0  # zero-norm guard, same as the HOF path
            p_ids, pm, pn2 = p_ids[keep_p], pm[keep_p], pn2[keep_p]
            return p_ids, pm, np.sqrt(pn2)

        # session-memoized broadcast (similarity module note): repeat
        # constructions reuse one panel instead of leaking a broadcast
        bc, _ = session_broadcast_panel(panel, "semantic_decon", _build)

        def fn(batches):
            import pandas as pd

            pids, qm, qn = bc.value
            for batch in batches:
                if len(batch) == 0 or len(pids) == 0:
                    continue
                cm = np.vstack(
                    [np.asarray(v, dtype="float64") for v in batch["v"]]
                )
                cn2 = np.round((cm * cm).sum(axis=1), 6)
                ok = cn2 > 0
                if not ok.any():
                    continue
                cm, cn2 = cm[ok], cn2[ok]
                dot = np.round(cm @ qm.T, 6)
                cos = np.round(dot / np.outer(np.sqrt(cn2), qn), 6)
                yield pd.DataFrame(
                    {
                        "probe_id": pids,
                        "cnt": (cos >= 0.99).sum(axis=0).astype("int64"),
                        "mx": cos.max(axis=0),
                    }
                )

        partial = train.select("v").mapInPandas(
            fn, "probe_id bigint, cnt bigint, mx double"
        )
        return partial.groupBy("probe_id").agg(
            F.sum("cnt").cast("bigint").alias("n_contaminated"),
            F.round(F.max("mx"), 6).alias("max_cos"),
        )
    scored = (
        train.crossJoin(F.broadcast(panel))
        .withColumn("dot", F.expr(_SD_DOT))
        .withColumn("n_v", F.expr(_SD_NORM.format(c="v")))
        .withColumn("n_p", F.expr(_SD_NORM.format(c="pv")))
        # zero-norm guard: cosine is undefined for the zero vector, and
        # the two engines disagree on double x/0 (ANSI Spark THROWS,
        # DuckDB yields NULL) — excluding zero-norm rows is the one
        # behavior both engines express identically
        .filter((F.col("n_v") > 0) & (F.col("n_p") > 0))
        .withColumn(
            "cos",
            F.round(
                F.col("dot") / (F.sqrt(F.col("n_v")) * F.sqrt(F.col("n_p"))), 6
            ),
        )
    )
    return scored.groupBy("probe_id").agg(
        F.count(F.when(F.col("cos") >= 0.99, 1)).alias("n_contaminated"),
        F.round(F.max("cos"), 6).alias("max_cos"),
    )
