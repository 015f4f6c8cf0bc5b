"""Round-13 optimization invariants.

- GEMM panel broadcasts are session-memoized (VERDICT r12 what's-wrong
  #3): repeated query CONSTRUCTIONS over the same panel plan must reuse
  ONE sc.broadcast instead of leaking one per construction, and the
  memoized path must return the same rows as a fresh build.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sh_design_spark.operators import similarity as sim
from tests.conftest import SF_SMOKE


def _emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def test_panel_broadcast_memoized_across_constructions(spark):
    sim._PANEL_MEMO.clear()
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)

    r1 = sorted(
        tuple(r) for r in sim.cosine_topk(q, emb, k=3).collect()
    )
    n_after_first = len(sim._PANEL_MEMO)
    assert n_after_first == 1  # one distinct panel -> one entry

    # an identical re-construction (the best-of-N sweep shape) must HIT
    # the memo: same broadcast object, no second entry, same rows
    bc_first = next(iter(sim._PANEL_MEMO.values()))[0]
    r2 = sorted(
        tuple(r) for r in sim.cosine_topk(q, emb, k=3).collect()
    )
    assert len(sim._PANEL_MEMO) == 1
    assert next(iter(sim._PANEL_MEMO.values()))[0] is bc_first
    assert r1 == r2

    # a DIFFERENT panel gets its own entry (keys are plan-scoped)
    sim.cosine_topk(emb.filter(F.col("vec_id") < 7), emb, k=3).collect()
    assert len(sim._PANEL_MEMO) == 2
    sim._PANEL_MEMO.clear()


def test_panel_memo_empty_panel_stable(spark):
    sim._PANEL_MEMO.clear()
    emb = _emb(spark)
    out = sim.cosine_topk(emb.filter(F.col("vec_id") < 0), emb, k=3)
    assert out.count() == 0
    sim._PANEL_MEMO.clear()


def test_signature_union_split_equals_fused(spark):
    """The round-13 incremental restructure rests on one identity:
    the map-side MinHash is a per-row map, so sig(A UNION B) ==
    sig(A) UNION sig(B) row-for-row. Pin it on the real corpus with
    the incremental_neardup delta shape (dropped-last-token docs)."""
    from etl_sh_design_spark.operators.dedup import minhash_signatures_mapside

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    toks = "filter(split(lower(text), '\\\\s+'), t -> t != '')"
    inc = d.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.expr(
            f"array_join(slice({toks}, 1, greatest(size({toks}) - 1, 0)), ' ')"
        ).alias("text"),
    )
    fused = minhash_signatures_mapside(d.unionByName(inc), k=16, n=3)
    split = minhash_signatures_mapside(d, k=16, n=3).unionByName(
        minhash_signatures_mapside(inc, k=16, n=3)
    )
    rows_f = sorted((r["doc_id"], tuple(r["sig"])) for r in fused.collect())
    rows_s = sorted((r["doc_id"], tuple(r["sig"])) for r in split.collect())
    assert rows_f == rows_s


def test_docs_signatures_memoized(spark):
    from etl_sh_design_spark import registry_ext

    registry_ext._DOCS_SIGS_CACHE.clear()
    a = registry_ext.docs_signatures(spark, SF_SMOKE)
    b = registry_ext.docs_signatures(spark, SF_SMOKE)
    assert a is b  # one documents-side signature build per session
    registry_ext._DOCS_SIGS_CACHE.clear()


def test_docs_signatures_family_registered_half_identical(spark):
    """When the dedup family build runs first, docs_signatures is the
    fused checkpoint filtered to doc_id < 1000000 — its rows must be
    identical to the standalone docs-only build (the oracle path)."""
    from etl_sh_design_spark import registry_ext

    registry_ext._DEDUP_SIGS_CACHE.clear()
    registry_ext._DOCS_SIGS_CACHE.clear()
    registry_ext.dedup_signatures(spark, SF_SMOKE)  # registers the half
    via_family = sorted(
        (r["doc_id"], tuple(r["sig"]))
        for r in registry_ext.docs_signatures(spark, SF_SMOKE).collect()
    )
    registry_ext._DEDUP_SIGS_CACHE.clear()
    registry_ext._DOCS_SIGS_CACHE.clear()
    standalone = sorted(
        (r["doc_id"], tuple(r["sig"]))
        for r in registry_ext.docs_signatures(spark, SF_SMOKE).collect()
    )
    assert via_family == standalone
    registry_ext._DEDUP_SIGS_CACHE.clear()
    registry_ext._DOCS_SIGS_CACHE.clear()
