"""Golden invariants for greedy sequence packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sh_design_spark.operators.packing import greedy_pack
from etl_sh_design_spark.registry import _t
from tests.conftest import SF_SMOKE

BUDGET = 512
TOKS = "size(filter(split(text, '\\\\s+'), t -> t != ''))"


def _tokens(spark):
    d = _t(spark, SF_SMOKE, "documents")
    return d.select("doc_id", F.expr(TOKS).cast("bigint").alias("n_tokens"))


def test_pack_budget_invariant(spark):
    """Every chunk fits the budget unless it holds a single oversized
    document; nothing is dropped or double-counted."""
    toks = _tokens(spark).cache()
    chunks = greedy_pack(toks, budget=BUDGET, n_shards=8).collect()
    assert all(c["sum_tokens"] <= BUDGET or c["n_docs"] == 1 for c in chunks)
    totals = toks.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("tok")
    ).collect()[0]
    assert sum(c["n_docs"] for c in chunks) == totals["n"]
    assert sum(c["sum_tokens"] for c in chunks) == totals["tok"]


def test_pack_oversized_doc_gets_own_chunk(spark):
    df = spark.createDataFrame(
        [(0, 100), (8, 700), (16, 100), (24, 100)], "doc_id long, n_tokens long"
    )
    chunks = {
        c["chunk_id"]: (c["n_docs"], c["sum_tokens"])
        for c in greedy_pack(df, budget=512, n_shards=1).collect()
    }
    # doc 8 (700 tokens) must sit alone; neighbors pack around it
    assert chunks[1] == (1, 700)
    assert chunks[0] == (1, 100)
    assert chunks[2] == (2, 200)
