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
