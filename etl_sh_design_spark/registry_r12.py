"""Round-12 extension registry: closing the loops the round-11
verdict left open.

1. `pq_rerank_auto` / `ivfpq_rerank_auto` — the auto-R re-rank path
   (VERDICT r11 next #2): shortlist admission by ADC VALUE
   (rank()-with-ties) instead of row position, so the shortlist sizes
   itself to the tie-class depth the r11 audits report — no hand-set
   R — with a fail-loud `max_auto_r` guard fused into the plan.
   Golden (tests/test_r12.py): recall 1.00 on the clustered
   depth-10k-class fixture at the default floor, where the fixed-R
   path measured recall collapse in round 10.

2. `semdedup_horizon_audit` — the SemDeDup observability twin of the
   PQ shortlist audit (VERDICT r11 next #3): per-cell members,
   removal candidates in-horizon, and a `horizon_saturated` flag so a
   user can see when SEMDEDUP_CANDIDATE_CAP starts costing removal
   recall on THEIR corpus instead of trusting the shipped curve.

3. `position_bias_audit` / `rater_agreement_kappa` — the RLHF
   preference battery around `bradley_terry_strengths` (VERDICT r11
   stretch #7): first-position win rate vs the 50% null, and
   per-rater Cohen's kappa against the majority verdict. Both
   relational and bounded by |raters| / one scalar, never
   stream-sized state.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sh_design_spark.operators.pq import (
    ivfpq_rerank_auto_oracle_sql,
    ivfpq_rerank_topk,
    pq_rerank_auto_oracle_sql,
    pq_rerank_topk,
)
from etl_sh_design_spark.registry import _t, query

_AR_K = 5
_AR_FLOOR = 50  # same floor as the fixed-R registry entries
_AR_NQ = 10


@query(
    "pq_rerank_auto",
    pq_rerank_auto_oracle_sql(k=_AR_K, shortlist=_AR_FLOOR, n_queries=_AR_NQ),
)
def q_pq_rerank_auto(spark, sf_dir):
    """PQ shortlist + exact re-rank with tie-class-covering (auto-R)
    admission: rank() over ADC value admits every candidate tied at
    the rank-50 bar, so on clustered corpora the shortlist grows to
    the tie-class depth with no hand-set R (operators/pq.py
    `_auto_r_candidates`; fail-loud past max_auto_r)."""
    return pq_rerank_topk(
        _t(spark, sf_dir, "embeddings"),
        k=_AR_K,
        shortlist=_AR_FLOOR,
        n_queries=_AR_NQ,
        auto_r=True,
    )


@query(
    "ivfpq_rerank_auto",
    ivfpq_rerank_auto_oracle_sql(
        k=_AR_K, shortlist=_AR_FLOOR, n_queries=_AR_NQ, nprobe=2
    ),
)
def q_ivfpq_rerank_auto(spark, sf_dir):
    """The IVF-PQ twin: auto-R admission over the PROBED-cells ADC
    set (nprobe=2), then exact re-rank."""
    return ivfpq_rerank_topk(
        _t(spark, sf_dir, "embeddings"),
        k=_AR_K,
        shortlist=_AR_FLOOR,
        n_queries=_AR_NQ,
        nprobe=2,
        auto_r=True,
    )


# --------------------------------------- semdedup horizon audit
from etl_sh_design_spark.operators.semdedup import (  # noqa: E402
    semdedup_horizon_audit,
    semdedup_horizon_audit_oracle_sql,
)
from etl_sh_design_spark.registry_r5 import _SEMD_VECS_DUCK  # noqa: E402


@query(
    "semdedup_horizon_audit",
    semdedup_horizon_audit_oracle_sql(_SEMD_VECS_DUCK, k=8),
)
def q_semdedup_horizon_audit(spark, sf_dir):
    """Per-cell candidate-horizon saturation for the SAME injected
    corpus semantic_dedup runs on (operator docstring): n_members /
    n_in_horizon / horizon_saturated / the capped regime marker, so a
    user sizes SEMDEDUP_CANDIDATE_CAP from data, not the shipped
    curve. Assignment-only — never runs the pairwise stage."""
    e = _t(spark, sf_dir, "embeddings")
    dup = e.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    inj = e.select("vec_id", "embedding").unionByName(dup)
    return semdedup_horizon_audit(inj, k=8, iterations=2)


# ------------------------------------ RLHF preference battery (stretch)
# Every battery query consumes the memoized shared comparison
# sub-plan (registry_r11.battery_comparisons): one user-keyed
# exchange per session per sf_dir for the whole family.
from etl_sh_design_spark.registry_r11 import battery_comparisons  # noqa: E402
from etl_sh_design_spark.operators.preference import (  # noqa: E402
    position_bias_audit,
    position_bias_audit_oracle_sql,
    rater_agreement_kappa,
    rater_agreement_kappa_oracle_sql,
)


@query("position_bias_audit", position_bias_audit_oracle_sql())
def q_position_bias_audit(spark, sf_dir):
    """Per-rater first-position win rate vs the Binomial(n, 0.5) null
    over the SAME comparison stream bradley_terry_strengths consumes
    (operator docstring): the annotation-quality audit that catches
    raters injecting position, not preference, into reward data."""
    return position_bias_audit(
        _t(spark, sf_dir, "events"),
        comparisons=battery_comparisons(spark, sf_dir),
    )


@query("rater_agreement_kappa", rater_agreement_kappa_oracle_sql())
def q_rater_agreement_kappa(spark, sf_dir):
    """Per-rater Cohen's kappa against the pooled majority verdict
    (binary-recoded across item pairs; operator docstring) — the
    inter-annotator agreement audit of the preference battery."""
    return rater_agreement_kappa(
        _t(spark, sf_dir, "events"),
        comparisons=battery_comparisons(spark, sf_dir),
    )


from etl_sh_design_spark.operators.preference import (  # noqa: E402
    pairwise_winrate_ci,
    pairwise_winrate_ci_oracle_sql,
    preference_cycle_audit,
    preference_cycle_audit_oracle_sql,
)


@query("pairwise_winrate_ci", pairwise_winrate_ci_oracle_sql())
def q_pairwise_winrate_ci(spark, sf_dir):
    """Per item pair: smaller-item win rate with the Wilson 95% lower
    bound (operator docstring) — which pairwise rankings the
    comparison volume actually supports. |items|²-bounded output."""
    return pairwise_winrate_ci(
        _t(spark, sf_dir, "events"),
        comparisons=battery_comparisons(spark, sf_dir),
    )


@query("preference_cycle_audit", preference_cycle_audit_oracle_sql())
def q_preference_cycle_audit(spark, sf_dir):
    """Condorcet-cycle rate over strict-majority item triples
    (operator docstring) — cyclic preference data has no consistent
    ranking for a reward model to learn. One scalar row."""
    return preference_cycle_audit(
        _t(spark, sf_dir, "events"),
        comparisons=battery_comparisons(spark, sf_dir),
    )


# ------------------------------------ LSH band-occupancy audit
from etl_sh_design_spark.registry_ext import (  # noqa: E402
    CORPUS_MUTATED_SQL,
    _H_SEED_SHINGLE,
    _SH,
    dedup_signatures,
)

_LSH_OCC_SQL = f"""
WITH corpus AS ({CORPUS_MUTATED_SQL}),
sh AS ({_SH}),
sig AS (
  SELECT doc_id, seed, min({_H_SEED_SHINGLE}) AS minh
  FROM sh CROSS JOIN (SELECT CAST(range AS INT) AS seed FROM range(0, 16))
  GROUP BY 1, 2
),
bands AS (
  SELECT doc_id, CAST(floor(seed / 4) AS INT) AS band,
         string_agg(CAST(minh AS VARCHAR), ',' ORDER BY seed) AS band_key
  FROM sig GROUP BY 1, 2
),
occ AS (
  SELECT band, band_key, count(*) AS occ FROM bands GROUP BY 1, 2
)
SELECT band,
       count(*) AS n_buckets,
       CAST(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_buckets_multi,
       CAST(max(occ) AS BIGINT) AS max_occupancy,
       CAST(sum(occ * (occ - 1) / 2) AS BIGINT) AS candidate_pairs,
       CAST(max(occ * (occ - 1) / 2) AS BIGINT) AS top_bucket_pairs
FROM occ GROUP BY 1
"""


@query("lsh_band_occupancy_audit", _LSH_OCC_SQL)
def q_lsh_band_occupancy_audit(spark, sf_dir):
    """Per-band LSH bucket-occupancy audit — the in-registry
    observable for the quantity the round-12 `--ngram-100x` probe
    measured offline: banded candidate volume is sum over buckets of
    C(occ, 2), and it explodes exactly when duplicate-cluster depth
    grows with the corpus (max_occupancy tracks cluster depth; it
    stayed FLAT at 8 across three decades in the entities-growth
    regime — SCALE.md round 12). A user watching candidate_pairs and
    top_bucket_pairs drift apart knows hot buckets are forming BEFORE
    the bucket self-join becomes the wall, and sizes band width /
    shingle caps from data. Runs off the session-memoized signature
    table (one signature pass for the whole dedup family); the
    aggregate output is 4 rows (one per band)."""
    sig = dedup_signatures(spark, sf_dir)
    band_structs = [
        F.struct(
            F.lit(j).alias("band"),
            F.concat_ws(
                ",", *[F.col("sig")[i].cast("string") for i in range(j * 4, (j + 1) * 4)]
            ).alias("band_key"),
        )
        for j in range(4)
    ]
    banded = sig.select(
        F.explode(F.array(*band_structs)).alias("bk")
    ).select(F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
    occ = banded.groupBy("band", "band_key").agg(F.count(F.lit(1)).alias("occ"))
    pairs = (F.col("occ") * (F.col("occ") - 1) / 2).cast("bigint")
    return occ.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum((F.col("occ") > 1).cast("int")).cast("bigint").alias("n_buckets_multi"),
        F.max("occ").cast("bigint").alias("max_occupancy"),
        F.sum(pairs).cast("bigint").alias("candidate_pairs"),
        F.max(pairs).cast("bigint").alias("top_bucket_pairs"),
    )


from etl_sh_design_spark.operators.preference import (  # noqa: E402
    preference_label_noise,
    preference_label_noise_oracle_sql,
)


@query("preference_label_noise", preference_label_noise_oracle_sql(rounds=3))
def q_preference_label_noise(spark, sf_dir):
    """Per item pair: comparisons contradicting the fitted BT ranking
    (operator docstring) — the reward-data cleaning signal that closes
    the battery's loop from raw judgments to the model they train."""
    return preference_label_noise(
        _t(spark, sf_dir, "events"),
        rounds=3,
        comparisons=battery_comparisons(spark, sf_dir),
    )


# ------------------------- generation-selection analytics (RLHF prep)
from etl_sh_design_spark.operators.preference import (  # noqa: E402
    best_of_n_curve,
    best_of_n_curve_oracle_sql,
    dpo_pair_construction,
    dpo_pair_construction_oracle_sql,
)


@query("best_of_n_curve", best_of_n_curve_oracle_sql(ns=(1, 2, 4, 8), min_pool=8))
def q_best_of_n_curve(spark, sf_dir):
    """Exact best-of-n expected-reward curve over per-user candidate
    pools (operator docstring): closed-form order statistics — one
    user-keyed window + one global micro-unit-quantized aggregate, no
    Monte-Carlo subsampling — reporting how much reward best-of-n
    selection buys at n = 1/2/4/8. |ns| output rows."""
    return best_of_n_curve(_t(spark, sf_dir, "events"), ns=(1, 2, 4, 8), min_pool=8)


@query("dpo_pair_construction", dpo_pair_construction_oracle_sql(min_margin=0.0))
def q_dpo_pair_construction(spark, sf_dir):
    """Chosen/rejected training-pair extraction per user pool
    (operator docstring): highest- vs lowest-scored candidate with a
    strict-positive margin gate and deterministic id tie-breaks — the
    preference-data PREP stage next to the battery's audits. One
    user-keyed exchange; ≤ |users| output rows."""
    return dpo_pair_construction(_t(spark, sf_dir, "events"), min_margin=0.0)
