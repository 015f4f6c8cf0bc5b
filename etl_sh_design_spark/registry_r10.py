"""Round-10 extension registry: quality-classifier filtering and the
PQ recall audit — the two measurement surfaces the battery still
lacked as hash-oracled QUERIES (both existed only as weaker forms:
heuristic quality signals without a classifier margin, and PQ/IVF-PQ
top-k without an in-registry recall-vs-exact audit).

- `hashed_quality_margin` — the fastText/CCNet quality-filter shape
  (Joulin et al. 2016, "Bag of Tricks for Efficient Text
  Classification"; Wenzek et al. 2019, CCNet §4.3: a linear
  classifier over hashed bag-of-words features gates every document):
  each token hashes to one of B=1024 feature buckets, each bucket
  carries a weight, a document's margin is the mean token weight, and
  the per-source audit reports mean margin and keep rate at margin>0.
  The WEIGHTS here are a deterministic surrogate (multiplicative-hash
  pseudo-weights in [-500, 500] micro-units) — the same
  clearly-marked-stub discipline as the multimodal decoders: training
  a real classifier is out of engine scope, but the Spark shape
  (map-only hashed featurization, integer-exact margin accumulation,
  one |sources| agg) is the production shape and is what this query
  pins. Swap the weight expression for a broadcast trained-weight
  array without touching the plan.
- `pq_recall_audit` — recall@k of the two compressed-code indexes
  (pq_topk, ivfpq_topk) against EXACT L2 top-k, per query vector.
  PQ ranks by ADC L2 distance, so the ground truth is L2, not cosine
  (the SRP/IVF recall harnesses use cosine truth to match THEIR
  metric). This is the in-registry twin of
  tools/recall_at_scale.py's clustered-fixture ladder rows
  (VERDICT r9 missing #3): the tool measures recall on the
  mixture-of-Gaussians fixtures; this query pins the same computation
  hash-exactly on the shipped corpus, so a regression in either
  index's rounding/tie contract fails the driver gate, not just a
  manual probe.

Scale shapes:
- `hashed_quality_margin` is map-only + one |sources| agg: the token
  walk is an array higher-order fold on the doc row (no explode, no
  per-token exchange), and every accumulation is integer micro-units
  until the final division, so the result is bit-identical across
  engines and partitionings at any scale.
- `pq_recall_audit` inherits the PQ operators' contracts (KB-sized
  broadcast codebooks, map-side encode, bounded top-k state); the
  exact-truth side is one broadcast of the FIXED 10-query panel
  against a linear corpus scan — panel-bounded, same class as
  knn_label_accuracy.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etl_sh_design_spark.operators.dedup import MD5_INT64_SQL
from etl_sh_design_spark.registry import _t, query

# ------------------------------------------- hashed quality margin
# B buckets; pseudo-weight(bucket) = pmod(bucket * M + C, 1001) - 500
# integer micro-units in [-500, 500]. All sums stay integer (exact on
# both engines); the only doubles are the two final divisions, each
# computed from exact integers < 2^53, so IEEE division + HALF_UP
# round are bit-identical cross-engine.
_QB = 1024
_QM, _QC = 2654435761, 12345

# the registry's proven single-space tokenizer pair (registry_r9.py:
# the synthetic corpus is space-delimited, and string_split(' ') is
# what DuckDB can mirror exactly), lowercased for the hashed features
_TOKS = "filter(split(lower(text), ' '), t -> t != '')"
_TOKS_DUCK = "list_filter(string_split(lower(text), ' '), t -> t != '')"
# Spark-side 60-bit md5 int (the SQL-expr twin of dedup.md5_int64 —
# conv(), because Spark cannot CAST a '0x...' literal to BIGINT)
_MD5_SPARK = "CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT)"
_W_SPARK = (
    f"pmod(pmod({_MD5_SPARK}, {_QB}) * {_QM} + {_QC}, 1001) - 500"
)
_W_DUCK = (
    f"(({MD5_INT64_SQL.format(x='t')} % {_QB}) * {_QM} + {_QC}) % 1001 - 500"
)

_HQM_SQL = f"""
WITH d AS (
  SELECT doc_id, source, {_TOKS_DUCK} AS toks FROM documents
),
m AS (
  SELECT doc_id, source, len(toks) AS n_tok,
         CAST(round(
           list_sum(list_transform(toks, t -> {_W_DUCK})) * 1e6
           / (1000.0 * len(toks))) AS BIGINT) AS margin_micro
  FROM d WHERE len(toks) > 0
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(sum(margin_micro) AS DOUBLE) / count(*) / 1e6, 6)
         AS mean_margin,
       CAST(sum(CASE WHEN margin_micro > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       round(CAST(sum(CASE WHEN margin_micro > 0 THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*), 6) AS keep_rate
FROM m GROUP BY 1
"""


@query("hashed_quality_margin", _HQM_SQL)
def q_hashed_quality_margin(spark, sf_dir):
    """fastText-style hashed linear quality margin per source (module
    docstring): tokens -> B=1024 hashed buckets -> surrogate integer
    weights -> per-doc mean margin (integer micro-units) -> per-source
    mean margin + keep rate at margin > 0. Map-only (the token fold is
    an array HOF on the doc row; zero per-token exchange) + one
    |sources|-sized agg."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    m = (
        d.select(
            "doc_id",
            "source",
            F.expr(f"({_TOKS})").alias("toks"),
        )
        .filter(F.size("toks") > 0)
        .select(
            "source",
            F.expr(
                f"CAST(round(aggregate(toks, 0L, (acc, t) -> acc + ({_W_SPARK}))"
                f" * 1e6 / (1000.0 * size(toks))) AS BIGINT)"
            ).alias("margin_micro"),
        )
    )
    return m.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(
            F.sum("margin_micro").cast("double") / F.count(F.lit(1)) / F.lit(1e6),
            6,
        ).alias("mean_margin"),
        F.sum((F.col("margin_micro") > 0).cast("int")).cast("bigint").alias("n_kept"),
        F.round(
            F.sum((F.col("margin_micro") > 0).cast("int")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("keep_rate"),
    )


# ---------------------------------------------------- PQ recall audit
_PQR_K = 5
_PQR_NQ = 10


def _exact_l2_sql() -> str:
    """Exact L2 top-k CTE body (self excluded) over the embeddings
    view — the ground truth both compressed indexes approximate."""
    sqd = (
        "round(list_sum(list_transform(range(1, len(q.v) + 1), "
        "i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i]))), 6)"
    )
    return f"""
  SELECT qid, vec_id FROM (
    SELECT q.vec_id AS qid, c.vec_id AS vec_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY {sqd}, c.vec_id) AS rk
    FROM (SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings WHERE vec_id < {_PQR_NQ}) q
    CROSS JOIN (SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings) c
    WHERE q.vec_id != c.vec_id
  ) WHERE rk <= {_PQR_K}
"""


def _pq_recall_oracle_sql() -> str:
    from etl_sh_design_spark.operators.pq import (
        ivfpq_topk_oracle_sql,
        pq_topk_oracle_sql,
    )

    pq = pq_topk_oracle_sql(k=_PQR_K, n_queries=_PQR_NQ)
    ivfpq = ivfpq_topk_oracle_sql(k=_PQR_K, n_queries=_PQR_NQ)
    return f"""
WITH exact AS ({_exact_l2_sql()}),
pq AS ({pq}),
ivfpq AS ({ivfpq}),
hits AS (
  SELECT 'pq' AS method, e.qid,
         count(p.neighbor_id) AS n_hits
  FROM exact e LEFT JOIN pq p
    ON p.qid = e.qid AND p.neighbor_id = e.vec_id
  GROUP BY 1, 2
  UNION ALL
  SELECT 'ivfpq' AS method, e.qid,
         count(p.neighbor_id) AS n_hits
  FROM exact e LEFT JOIN ivfpq p
    ON p.qid = e.qid AND p.neighbor_id = e.vec_id
  GROUP BY 1, 2
)
SELECT method, CAST(qid AS BIGINT) AS qid,
       CAST(n_hits AS BIGINT) AS n_hits,
       round(CAST(n_hits AS DOUBLE) / {_PQR_K}, 6) AS recall
FROM hits
"""


@query("pq_recall_audit", _pq_recall_oracle_sql())
def q_pq_recall_audit(spark, sf_dir):
    """recall@5 of pq_topk and ivfpq_topk vs exact L2 top-5 per query
    (module docstring). The exact side broadcasts the fixed 10-query
    panel against one linear corpus scan; the index sides inherit the
    PQ operators' bounded-state contracts."""
    from etl_sh_design_spark.operators.pq import _sqdist, ivfpq_topk, pq_topk

    e = _t(spark, sf_dir, "embeddings")
    ev = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    qs = ev.filter(F.col("vec_id") < _PQR_NQ).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    w = W.partitionBy("qid").orderBy("d", "vec_id")
    exact = (
        ev.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("d", _sqdist("qv", "v"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _PQR_K)
        .select("qid", "vec_id")
    )
    parts = []
    for method, fn in (("pq", pq_topk), ("ivfpq", ivfpq_topk)):
        ann = fn(e, k=_PQR_K, n_queries=_PQR_NQ).select(
            F.col("qid").alias("aqid"), F.col("neighbor_id").alias("acid")
        )
        parts.append(
            exact.join(
                ann,
                (exact.qid == ann.aqid) & (exact.vec_id == ann.acid),
                "left",
            )
            .groupBy("qid")
            .agg(F.count("acid").alias("n_hits"))
            .select(
                F.lit(method).alias("method"),
                F.col("qid").cast("bigint").alias("qid"),
                F.col("n_hits").cast("bigint").alias("n_hits"),
                F.round(F.col("n_hits").cast("double") / _PQR_K, 6).alias(
                    "recall"
                ),
            )
        )
    return parts[0].unionByName(parts[1])


# ------------------------------------------------ PQ rerank top-k
# The production deployment shape the recall audit above motivates
# (SCALE.md round-10: raw ADC collapses on deep clusters; shortlist +
# exact re-rank restores recall once R exceeds the tie-class size).
from etl_sh_design_spark.operators.pq import (  # noqa: E402
    pq_rerank_topk,
    pq_rerank_topk_oracle_sql,
)


@query("pq_rerank_topk", pq_rerank_topk_oracle_sql(k=5, shortlist=50, n_queries=10))
def q_pq_rerank_topk(spark, sf_dir):
    """ADC shortlist (R=50) + exact re-rank to top-5 (operator
    docstring: codes prune, floats decide — Jegou et al. 2011 §V)."""
    return pq_rerank_topk(
        _t(spark, sf_dir, "embeddings"), k=5, shortlist=50, n_queries=10
    )


# ------------------------------------------ IVF-PQ multi-probe
from etl_sh_design_spark.operators.pq import (  # noqa: E402
    ivfpq_topk,
    ivfpq_topk_oracle_sql,
)


@query(
    "ivfpq_multiprobe_topk",
    ivfpq_topk_oracle_sql(k=5, n_queries=10, nprobe=2),
)
def q_ivfpq_multiprobe_topk(spark, sf_dir):
    """IVF-PQ probing the query's top-2 coarse cells (operator
    docstring: multi-probe multiplies only the query-side LUT; the
    clustered recall table shows nprobe=1 dropping whole clusters).
    On the shipped near-isotropic corpus the top-5 happens to match
    nprobe=1 — the oracle pins the multi-probe PLAN's semantics
    (probe ranking, per-cell residual LUT, cross-cell ADC merge), and
    the candidate volume is plan-asserted in tests/test_r10.py."""
    return ivfpq_topk(
        _t(spark, sf_dir, "embeddings"), k=5, n_queries=10, nprobe=2
    )


# ----------------------------------------- IVF-PQ rerank top-k
from etl_sh_design_spark.operators.pq import (  # noqa: E402
    ivfpq_rerank_topk,
    ivfpq_rerank_topk_oracle_sql,
)


@query(
    "ivfpq_rerank_topk",
    ivfpq_rerank_topk_oracle_sql(k=5, shortlist=50, n_queries=10, nprobe=2),
)
def q_ivfpq_rerank_topk(spark, sf_dir):
    """Full Faiss deployment stack: IVF-PQ (nprobe=2) shortlist of 50,
    exact L2 re-rank to top-5 (operator docstring)."""
    return ivfpq_rerank_topk(
        _t(spark, sf_dir, "embeddings"), k=5, shortlist=50, n_queries=10,
        nprobe=2,
    )
