"""Goldens for the round-9 line-level curation additions
(registry_r9): the FineWeb line-signal battery and C4 global line
dedup — invariants the hash oracle can't express (plant arithmetic,
cross-query consistency)."""

from __future__ import annotations

import math

from etl_sh_design_spark.registry_r9 import (
    _C4_K,
    _LINE_W,
    q_c4_line_dedup,
    q_line_quality_rules,
)
from tests.conftest import SF_SMOKE


def _doc_tokens(duck):
    return duck.execute(
        """SELECT doc_id, source,
                  len(list_filter(string_split(text, ' '), t -> t != ''))
           FROM documents"""
    ).fetchall()


def test_line_quality_rules_plant_arithmetic(spark, duck):
    """The fixture is fully deterministic, so the line counts and the
    planted punctuation fraction are exactly computable from the raw
    docs: n_lines = ceil(tokens/8) summed, and line j of doc d ends in
    '.' iff (d + j) % 3 == 0."""
    rows = {r["source"]: r for r in q_line_quality_rules(spark, SF_SMOKE).collect()}
    exp_lines: dict[str, int] = {}
    exp_punct: dict[str, int] = {}
    exp_docs: dict[str, int] = {}
    for doc_id, source, n_tok in _doc_tokens(duck):
        n_lines = math.ceil(n_tok / _LINE_W)
        exp_docs[source] = exp_docs.get(source, 0) + 1
        exp_lines[source] = exp_lines.get(source, 0) + n_lines
        exp_punct[source] = exp_punct.get(source, 0) + sum(
            1 for j in range(n_lines) if (doc_id + j) % 3 == 0
        )
    assert set(rows) == set(exp_docs)
    for src, r in rows.items():
        assert r["n_docs"] == exp_docs[src]
        assert r["n_lines"] == exp_lines[src]
        assert abs(
            r["frac_lines_end_punct"] - exp_punct[src] / exp_lines[src]
        ) < 1e-6
        # 8-token lines: words per line in (0, 8], short-line fraction
        # bounded by one trailing short line per doc
        assert 0 < r["mean_words_per_line"] <= _LINE_W
        assert 0.0 <= r["frac_short_lines"] <= exp_docs[src] / exp_lines[src]
        assert 0.0 <= r["mean_dup_line_fraction"] < 1.0


def test_c4_line_dedup_removes_planted_boilerplate(spark, duck):
    """The byte-identical boilerplate line is appended to every
    doc_id % 5 == 0 document, so it occurs far above the k=3 threshold
    and MUST be removed from every one of them: per source,
    n_lines_removed >= #planted docs and n_docs_changed >= #planted
    docs; totals reconcile with line_quality_rules + the plants."""
    rows = {r["source"]: r for r in q_c4_line_dedup(spark, SF_SMOKE).collect()}
    planted: dict[str, int] = {}
    for doc_id, source, _ in _doc_tokens(duck):
        if doc_id % 5 == 0:
            planted[source] = planted.get(source, 0) + 1
    assert sum(planted.values()) >= _C4_K  # the plant actually trips the rule
    lq = {r["source"]: r for r in q_line_quality_rules(spark, SF_SMOKE).collect()}
    for src, r in rows.items():
        # corpus lines = content lines (line_quality fixture) + plants
        assert r["n_lines"] == lq[src]["n_lines"] + planted.get(src, 0)
        assert r["n_lines_removed"] >= planted.get(src, 0)
        assert r["n_docs_changed"] >= planted.get(src, 0)
        assert r["n_docs"] == lq[src]["n_docs"]
        # removal can't exceed the corpus
        assert r["n_lines_removed"] <= r["n_lines"]
        assert 0 <= r["rebuilt_checksum"] < r["n_docs"] * 1000000007


def test_nfc_dedup_collapses_exactly_the_planted_twins(spark, duck):
    """The composed/decomposed plants are the ONLY NFC-collapsible
    texts (the synthetic corpus is pure ASCII, already NFC), so per
    source: n_docs = base + 2*planted, raw distinct = n_docs (every
    plant differs bytewise), nfc distinct = n_docs - planted (each
    plant PAIR collapses to one)."""
    from etl_sh_design_spark.registry_r9 import q_nfc_dedup_audit

    rows = {r["source"]: r for r in q_nfc_dedup_audit(spark, SF_SMOKE).collect()}
    base = dict(
        duck.execute("SELECT source, count(*) FROM documents GROUP BY 1").fetchall()
    )
    planted = dict(
        duck.execute(
            "SELECT source, count(*) FROM documents WHERE doc_id % 11 = 0 GROUP BY 1"
        ).fetchall()
    )
    assert set(rows) == set(base)
    for src, r in rows.items():
        p = planted.get(src, 0)
        assert r["n_docs"] == base[src] + 2 * p
        assert r["n_raw_distinct"] == r["n_docs"]
        assert r["n_nfc_distinct"] == r["n_docs"] - p


def test_clustered_fixture_shows_the_ann_regime(spark, tmp_path):
    """The mixture-of-Gaussians fixture (VERDICT r8 item 4) must keep
    showing the regime ANN bucketing is for: on clustered vectors,
    multi-probe SRP recall@3 is far above the probed fraction (the
    uniform testdata gives ~5/16 = 0.31 there BY CONSTRUCTION). Small
    (500-vec) build so the pin stays cheap; deterministic, so a
    threshold, not a band."""
    from pyspark.sql import functions as F

    from etl_sh_design_spark.operators.similarity import (
        cosine_topk,
        lsh_multiprobe_topk,
    )
    from tools.scale_probe import build_clustered_embeddings

    out = str(tmp_path / "clustered")
    build_clustered_embeddings(spark, out, n_rows=500)
    e = spark.read.parquet(f"{out}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 10)
    brute = cosine_topk(q, e, k=3).select("qid", "cid")
    ann = lsh_multiprobe_topk(q, e, k=3, n_planes=4, dim=64).select(
        F.col("qid").alias("aqid"), F.col("cid").alias("acid")
    )
    hits = brute.join(
        ann, (brute.qid == ann.aqid) & (brute.cid == ann.acid), "left_semi"
    ).count()
    recall = hits / brute.count()
    # measured 1.0 at 2k and 20k rows (SCALE.md round-9 recall table);
    # 0.8 leaves room for small-N bucket noise without ever letting the
    # fixture degrade to the uniform ~0.31 regime unnoticed
    assert recall >= 0.8, recall
    # ground truth really is clustered: every brute top-3 neighbor of
    # query v shares v's mixture component (vec_id % 20)
    same = brute.filter(F.col("qid") % 20 == F.col("cid") % 20).count()
    assert same == brute.count()


def test_c4_line_dedup_untouched_docs_keep_their_text(spark):
    """A doc with no removed line must rebuild to its EXACT line
    concatenation — spot-check by rebuilding one unchanged doc by
    hand: run the pipeline pieces for a doc that is not % 5 == 0 and
    whose lines are all unique corpus-wide."""
    from pyspark.sql import functions as F

    from etl_sh_design_spark.registry_r9 import _LINES_SPARK, _TOKS_SPARK

    d = (
        spark.read.parquet(SF_SMOKE + "/documents.parquet")
        .select("doc_id", "source", "text")
        .filter(F.col("doc_id") % 5 != 0)
        .limit(1)
    )
    row = (
        d.select("doc_id", F.expr(_TOKS_SPARK).alias("toks"))
        .select("doc_id", F.expr(f"({_LINES_SPARK})").alias("lines"))
        .collect()[0]
    )
    # every line is the 8-token slice with the (doc_id + j) % 3 plant
    doc_id, lines = row["doc_id"], row["lines"]
    for j, line in enumerate(lines):
        assert line.endswith(".") == ((doc_id + j) % 3 == 0), (doc_id, j, line)
        words = [w for w in line.rstrip(".").split(" ") if w]
        assert 1 <= len(words) <= 8


def test_c4_line_dedup_forced_shuffle_parity(spark):
    """Forced-path golden for the boiler-set dispatch
    (LINE_DEDUP_BROADCAST_MAX_ROWS): broadcast_max_rows=0 forces the
    shuffle anti-join, the default keeps the broadcast — the two
    plans MUST produce identical audits (left_anti on the same key
    set), and the forced plan must actually drop the broadcast
    (no BroadcastHashJoin/BroadcastNestedLoopJoin anti node)."""
    default = sorted(
        (tuple(r) for r in q_c4_line_dedup(spark, SF_SMOKE).collect())
    )
    forced_df = q_c4_line_dedup(spark, SF_SMOKE, broadcast_max_rows=0)
    plan = forced_df._jdf.queryExecution().executedPlan().toString()
    anti_lines = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
    assert anti_lines, plan
    assert all("Broadcast" not in ln for ln in anti_lines), anti_lines
    forced = sorted(tuple(r) for r in forced_df.collect())
    assert forced == default


def test_c4_line_dedup_default_path_broadcasts(spark):
    """On the smoke corpus the >= 3 set is far below the bound, so the
    default dispatch must keep the broadcast anti-join (the fast
    vocabulary-sized path stays the default)."""
    plan = (
        q_c4_line_dedup(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    anti_lines = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
    assert anti_lines, plan
    assert any("Broadcast" in ln for ln in anti_lines), anti_lines
