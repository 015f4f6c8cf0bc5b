"""Golden tests for operators/graph.py connected components: the
driver union-find fast path and the distributed min-label fixpoint
must produce identical labels, on both synthetic shapes and the real
near-dup pipeline output."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sh_design_spark.operators.graph import connected_components


def _labels(df):
    return sorted((r["node"], r["component"]) for r in df.collect())


def _run_both(spark, node_ids, edge_pairs):
    nodes = spark.createDataFrame([(n,) for n in node_ids], "node bigint")
    edges = spark.createDataFrame(
        edge_pairs or [], "src bigint, dst bigint"
    )
    uf = _labels(connected_components(nodes, edges))
    dist = _labels(connected_components(nodes, edges, collect_threshold=0))
    assert uf == dist
    return uf


def test_cc_basic_shapes(spark):
    # two cliques, one chain, isolated nodes
    labels = dict(
        _run_both(
            spark,
            range(12),
            [(0, 1), (1, 2), (3, 4), (5, 6), (6, 7), (7, 8)],
        )
    )
    assert labels[0] == labels[1] == labels[2] == 0
    assert labels[3] == labels[4] == 3
    assert labels[5] == labels[6] == labels[7] == labels[8] == 5
    for iso in (9, 10, 11):
        assert labels[iso] == iso


def test_cc_long_chain_converges(spark):
    # chain of 20 — needs multiple propagation rounds
    n = 20
    labels = dict(_run_both(spark, range(n), [(i, i + 1) for i in range(n - 1)]))
    assert all(labels[i] == 0 for i in range(n))


def test_cc_empty_edges(spark):
    labels = dict(_run_both(spark, range(5), []))
    assert all(labels[i] == i for i in range(5))


def test_cc_unconverged_warns(spark):
    nodes = spark.createDataFrame([(i,) for i in range(10)], "node bigint")
    edges = spark.createDataFrame([(i, i + 1) for i in range(9)], "src bigint, dst bigint")
    with pytest.warns(RuntimeWarning, match="no fixpoint"):
        connected_components(nodes, edges, max_iter=2, collect_threshold=0).collect()


def test_cc_on_neardup_pairs(spark):
    from etl_sh_design_spark.operators.dedup import minhash_lsh_pairs
    from etl_sh_design_spark.registry_ext import _corpus_mutated
    from tests.conftest import SF_SMOKE

    corpus = _corpus_mutated(spark, SF_SMOKE)
    pairs = minhash_lsh_pairs(corpus).cache()
    nodes = corpus.select(F.col("doc_id").alias("node"))
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    uf = _labels(connected_components(nodes, edges))
    dist = _labels(connected_components(nodes, edges, collect_threshold=0))
    assert uf == dist
    # every component id is the min node id of its members
    comp_min: dict = {}
    for node, comp in uf:
        comp_min.setdefault(comp, node)
        comp_min[comp] = min(comp_min[comp], node)
    assert all(comp == mn for comp, mn in comp_min.items())
