"""Round-5 (final) extension registry: label-aware embedding quality
evaluation — the first consumers of the `embeddings.label` column.

Before a pipeline trusts an embedding space for clustering, SemDeDup,
or mixture balancing, it validates the space against whatever labels
exist (topic tags, source domains, weak classifier outputs). Two
standard checks:

- `knn_label_accuracy` — leave-one-out kNN classification: for a
  deterministic FIXED-SIZE probe panel (vec_id % 7 == 0 and
  vec_id < 3500 — ≤500 probes no matter how large the corpus grows,
  so the exact-scoring work stays LINEAR in N; an unbounded %7 panel
  would scale the pair count quadratically, which the 10x probe
  measured at 44x wall-clock before the cap), find the exact top-3
  cosine neighbors (reusing `cosine_topk`, so the probe side is
  broadcast and the corpus is a single linear scan), majority-vote
  their labels (ties -> smallest label), and report per-label probe
  counts / correct counts / accuracy. The standard "is this embedding
  space any good" acceptance metric.
- `class_separation` — per-label centroid cohesion vs nearest-other-
  centroid similarity (a Fisher-style separation margin). Centroids
  are computed distributively (posexplode -> groupBy(label, d) with
  map-side partial aggregation: each executor emits at most
  L×dim partials, so the exchange is sketch-sized regardless of input
  rows); the cohesion pass then scores rows against an
  assembled-array centroid table via a broadcast label join +
  `zip_with` dot product — no second explode, no N×dim shuffle.

Hash discipline follows the repo contract: counts stay BIGINT,
cosines are rounded to 6dp before ranking / averaging on both
engines, votes and ranks are fully tie-broken.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etl_sh_design_spark.operators.similarity import _dot, _dvec, _norm, cosine_topk
from etl_sh_design_spark.registry import _t, query

# Exploded (vec_id, d, v) view of embeddings, double-widened — same
# spelling as registry_ext._VE, kept local so the two modules stay
# independently readable.
_VE = (
    "SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d, "
    "CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings"
)


@query(
    "knn_label_accuracy",
    f"""
WITH ve AS ({_VE}),
norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM ve GROUP BY 1),
dots AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid, sum(q.v * c.v) AS dot
  FROM ve q JOIN ve c ON q.d = c.d AND q.vec_id <> c.vec_id
  WHERE q.vec_id % 7 = 0 AND q.vec_id < 3500
  GROUP BY 1, 2
),
scored AS (
  SELECT qid, cid, round(dot / (nq.nrm * nc.nrm), 6) AS cos
  FROM dots JOIN norms nq ON nq.vec_id = qid JOIN norms nc ON nc.vec_id = cid
),
topk AS (
  SELECT qid, cid FROM (
    SELECT qid, cid,
           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rk
    FROM scored) WHERE rk <= 3
),
lab AS (SELECT vec_id, label FROM embeddings),
votes AS (
  SELECT t.qid, ql.label AS qlabel, cl.label AS clabel, count(*) AS n
  FROM topk t
  JOIN lab ql ON ql.vec_id = t.qid
  JOIN lab cl ON cl.vec_id = t.cid
  GROUP BY 1, 2, 3
),
pred AS (
  SELECT qid, qlabel, clabel AS plabel FROM (
    SELECT qid, qlabel, clabel,
           row_number() OVER (PARTITION BY qid ORDER BY n DESC, clabel ASC) AS vr
    FROM votes) WHERE vr = 1
)
SELECT qlabel AS label, count(*) AS n_probes,
       CAST(sum(CASE WHEN plabel = qlabel THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       round(sum(CASE WHEN plabel = qlabel THEN 1 ELSE 0 END) * 1.0e0 / count(*), 6)
         AS accuracy
FROM pred GROUP BY 1
""",
)
def q_knn_label_accuracy(spark, sf_dir):
    """Leave-one-out 3-NN label accuracy on a fixed ≤500-probe panel.

    The probe side is broadcast inside `cosine_topk`; the corpus is
    scanned once, scored JVM-side, and ranked per probe. The panel is
    capped (vec_id < 3500) so exact-eval cost stays LINEAR in corpus
    size — at 10^9 vectors this is the shape you run on a fixed probe
    panel before trusting the ANN index (`ann_recall_at_k` checks the
    index against the same exact ranking)."""
    e = _t(spark, sf_dir, "embeddings")
    probes = e.filter((F.col("vec_id") % 7 == 0) & (F.col("vec_id") < 3500))
    topk = cosine_topk(probes, e, k=3).select("qid", "cid")
    lab = e.select("vec_id", "label")
    votes = (
        topk.join(
            lab.select(F.col("vec_id").alias("qid"), F.col("label").alias("qlabel")),
            "qid",
        )
        .join(
            lab.select(F.col("vec_id").alias("cid"), F.col("label").alias("clabel")),
            "cid",
        )
        .groupBy("qid", "qlabel", "clabel")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("qid").orderBy(F.col("n").desc(), F.col("clabel").asc())
    pred = (
        votes.withColumn("vr", F.row_number().over(w))
        .filter(F.col("vr") == 1)
        .select("qid", "qlabel", F.col("clabel").alias("plabel"))
    )
    return pred.groupBy(F.col("qlabel").alias("label")).agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(F.when(F.col("plabel") == F.col("qlabel"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_correct"),
        F.round(
            F.sum(F.when(F.col("plabel") == F.col("qlabel"), 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("accuracy"),
    )


@query(
    "class_separation",
    f"""
WITH ve AS (
  SELECT e.vec_id, e.label, v.d, v.v FROM embeddings e
  JOIN ({_VE}) v ON v.vec_id = e.vec_id
),
norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM ve GROUP BY 1),
uv AS (
  SELECT ve.vec_id, ve.label, ve.d, ve.v / n.nrm AS u
  FROM ve JOIN norms n ON n.vec_id = ve.vec_id
),
cent AS (SELECT label, d, avg(u) AS m FROM uv GROUP BY 1, 2),
cnorm AS (SELECT label, sqrt(sum(m * m)) AS cn FROM cent GROUP BY 1),
dots AS (
  SELECT u.vec_id, u.label, sum(u.u * c.m) AS dot
  FROM uv u JOIN cent c ON c.label = u.label AND c.d = u.d
  GROUP BY 1, 2
),
doccos AS (
  SELECT d.label, round(d.dot / cn.cn, 6) AS cos_c
  FROM dots d JOIN cnorm cn USING (label)
),
coh AS (
  -- sum exact integer micro-cosines (cos_c is already 6dp) so the
  -- mean is order-independent — same discipline as bv_totals
  SELECT label, count(*) AS n_vecs,
         round(sum(CAST(round(cos_c * 1e6) AS BIGINT)) / (count(*) * 1e6), 6)
           AS cohesion
  FROM doccos GROUP BY 1
),
cdots AS (
  SELECT a.label AS la, b.label AS lb, sum(a.m * b.m) AS dot
  FROM cent a JOIN cent b ON a.d = b.d AND a.label <> b.label
  GROUP BY 1, 2
),
inter AS (
  SELECT la AS label, max(round(dot / (ca.cn * cb.cn), 6)) AS max_other_sim
  FROM cdots JOIN cnorm ca ON ca.label = la JOIN cnorm cb ON cb.label = lb
  GROUP BY 1
)
SELECT c.label, c.n_vecs, c.cohesion, i.max_other_sim,
       round(c.cohesion - i.max_other_sim, 6) AS margin
FROM coh c JOIN inter i USING (label)
""",
)
def q_class_separation(spark, sf_dir):
    """Per-label centroid cohesion vs nearest-other-centroid
    similarity, and their margin.

    Scale shape: the ONLY input-sized exchange is the centroid
    groupBy(label, d), whose map-side combine caps every partition's
    output at L×dim rows; the cohesion pass joins the assembled
    centroid arrays back by a broadcast label join and scores rows
    with `zip_with` inside codegen (rows never shuffle). The
    centroid×centroid pass is L² — metadata-sized."""
    e = _t(spark, sf_dir, "embeddings")
    u = (
        e.select("vec_id", "label", _dvec("embedding").alias("dv"))
        .withColumn("uv", F.transform("dv", lambda x: x / _norm(F.col("dv"))))
        .select("vec_id", "label", "uv")
    )
    ex = u.select("label", F.posexplode("uv").alias("d", "u"))
    cent = ex.groupBy("label", "d").agg(F.avg("u").alias("m"))
    carr = (
        cent.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("d", "m"))).alias("sm"))
        .withColumn("cv", F.transform("sm", lambda s: s["m"]))
        .select("label", "cv")
        .withColumn("cn", _norm(F.col("cv")))
    )
    doc = u.join(F.broadcast(carr), "label").withColumn(
        "cos_c", F.round(_dot("uv", "cv") / F.col("cn"), 6)
    )
    # exact integer micro-cosine sum -> order-independent mean (the
    # double-sum of 6dp values can straddle a round-6 boundary
    # depending on partial-agg order; the bigint sum cannot)
    coh = doc.withColumn(
        "cos_u", F.round(F.col("cos_c") * 1e6, 0).cast("bigint")
    ).groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.sum("cos_u") / (F.count(F.lit(1)) * 1e6), 6).alias("cohesion"),
    )
    a = carr.select("label", F.col("cv").alias("ca"), F.col("cn").alias("na"))
    b = carr.select(
        F.col("label").alias("lb"), F.col("cv").alias("cb"), F.col("cn").alias("nb")
    )
    inter = (
        a.join(b, F.col("label") != F.col("lb"))
        .withColumn("sim", F.round(_dot("ca", "cb") / (F.col("na") * F.col("nb")), 6))
        .groupBy("label")
        .agg(F.max("sim").alias("max_other_sim"))
    )
    return coh.join(inter, "label").select(
        "label",
        "n_vecs",
        "cohesion",
        "max_other_sim",
        F.round(F.col("cohesion") - F.col("max_other_sim"), 6).alias("margin"),
    )
