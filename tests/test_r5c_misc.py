"""Goldens for the late registry_r5c operators on crafted fixtures —
known-answer tests the cross-engine oracle can't provide (both engines
could share a bug; these pin the SEMANTICS)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sh_design_spark.registry import queries


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(int(i), t, s, len(t)) for i, t, s in rows],
        "doc_id long, text string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(int(e), int(u)) for e, u in rows], "event_id long, user_id long"
    ).select(
        "event_id",
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
        "user_id",
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_zipf_slope_near_minus_one_on_perfect_zipf(spark, tmp_path):
    """A corpus whose token frequencies follow freq(rank) = 96/rank
    exactly must fit slope ~ -1 with r^2 ~ 1."""
    words = []
    for i in range(1, 13):  # 12 distinct tokens, freq 96/i
        words += [f"tok{i:02d}"] * (96 // i)
    # one doc holding the whole stream (scores/fit don't care)
    sf = _write_docs(spark, tmp_path, [(17 * 11 * 13, " ".join(words), "s")])
    out = queries()["zipf_slope_sources"](spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_tokens"] == 12
    # floor(96/i) rounds the tail frequencies down slightly, biasing
    # the fitted slope a few percent past -1
    assert r["zipf_slope"] == pytest.approx(-1.0, abs=0.05)
    assert r["r2"] > 0.99


def test_lpa_finds_two_triangles(spark, tmp_path):
    """Two triangles bridged by a single edge must resolve into 2
    communities after two majority rounds (the bridge can't outvote
    two in-triangle neighbors). Node ids are chosen to survive the
    %197 derivation and the (src*31+dst)%20 thinning."""
    # The query thins DIRECTED edges before symmetrizing, so an edge
    # (u, v) only needs (u*31+v)%20==0 in the direction the event
    # carries it. Pick a passing direction per undirected pair.
    def dir_ok(a, b):
        return a != b and (a * 31 + b) % 20 == 0

    def edge(a, b):
        if dir_ok(a, b):
            return (a, b)
        if dir_ok(b, a):
            return (b, a)
        return None

    tri = []
    for a in range(1, 197):
        for b in range(a + 1, 197):
            if edge(a, b) is None:
                continue
            for c in range(b + 1, 197):
                if edge(a, c) is not None and edge(b, c) is not None:
                    tri.append((a, b, c))
    assert len(tri) >= 2, "fixture search failed"
    t1 = t2 = bridge = None
    for a_ in tri:
        for b_ in tri:
            if set(a_) & set(b_):
                continue
            br = next(
                (e for e in (edge(u, v) for u in a_ for v in b_) if e is not None),
                None,
            )
            if br is not None:
                t1, t2, bridge = a_, b_, br
                break
        if t1 is not None:
            break
    assert t1 is not None, "no bridged disjoint triangle pair found"
    edges = [
        edge(t1[0], t1[1]), edge(t1[0], t1[2]), edge(t1[1], t1[2]),
        edge(t2[0], t2[1]), edge(t2[0], t2[2]), edge(t2[1], t2[2]),
        bridge,
    ]
    # events encode edges as (user_id=src, event_id=dst); ids < 197 so
    # the %197 derivation is the identity
    sf = _write_events(spark, tmp_path, [(dst, src) for src, dst in edges])
    out = queries()["lpa_communities"](spark, sf).collect()
    sizes = sorted(r["n_nodes"] for r in out)
    assert sum(sizes) == 6
    assert len(out) == 2, (out, t1, t2, bridge)


def test_skew_report_flags_planted_hot_key(spark, tmp_path):
    """One user with 60 of 100 events: hot_key row 1 is that user with
    row_share 0.6 and max_over_median reflecting the planted spike."""
    rows = [(i, 7) for i in range(60)]          # hot user 7
    rows += [(100 + i, 10 + i) for i in range(40)]  # 40 singleton users
    sf = _write_events(spark, tmp_path, rows)
    out = queries()["skew_report_events"](spark, sf).collect()
    top = max(out, key=lambda r: r["freq"])
    assert top["hot_key"] == 7
    assert top["freq"] == 60
    assert top["row_share"] == pytest.approx(0.6)
    assert top["median_freq"] == 1
    assert top["max_over_median"] == pytest.approx(60.0)
    assert top["n_keys"] == 41


def test_skew_report_quantile_boundary_matches_quantile_disc(spark, tmp_path):
    """Pin the discrete-quantile convention (rank ceil(p*n), 1-based)
    on a boundary case where p99 lands BETWEEN two distinct count
    values: 99 singleton users + 1 user with 2 events + 1 with 60.
    n_keys=101 -> p99 rank ceil(0.99*101)=100 -> the 2, not 1 or 60;
    median rank ceil(50.5)=51 -> 1. DuckDB quantile_disc agrees
    (verified: element at ceil(p*n) of the ascending sort)."""
    rows = [(i, 1000 + i) for i in range(99)]            # 99 singletons
    rows += [(200 + i, 7) for i in range(2)]             # user 7: 2 events
    rows += [(300 + i, 8) for i in range(60)]            # user 8: 60 events
    sf = _write_events(spark, tmp_path, rows)
    out = queries()["skew_report_events"](spark, sf).collect()
    r = out[0]
    assert r["n_keys"] == 101
    assert r["median_freq"] == 1
    assert r["p99_freq"] == 2
    assert r["max_over_median"] == pytest.approx(60.0)


def test_srp_signature_empty_and_fixed_dim_contract(spark):
    """srp_signature on an empty DataFrame must not crash at
    plan-construction time and must keep the stable output schema."""
    from etl_sh_design_spark.operators.similarity import srp_signature

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = srp_signature(empty, n_planes=4)
    assert out.count() == 0
    assert dict(out.dtypes)["bucket"] == "int"
    # explicit dim still works on empty input too
    out2 = srp_signature(empty, n_planes=4, dim=8)
    assert out2.count() == 0


def test_multiprobe_lsh_dominates_single_probe(spark):
    """Multi-probe SRP-LSH (bucket + Hamming-1 ring) must (a) produce
    a candidate superset of single-probe per query, hence recall@k >=
    the single-probe recall against the same brute-force truth, and
    (b) return no duplicate (qid, cid) pairs (the probes of one query
    are pairwise distinct buckets)."""
    from etl_sh_design_spark.operators.similarity import (
        cosine_topk,
        lsh_bucket_topk,
        lsh_multiprobe_topk,
    )

    e = (
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .limit(400)
        .cache()
    )
    q = e.filter(F.col("vec_id") < 10)
    brute = {(r.qid, r.cid) for r in cosine_topk(q, e, k=3).collect()}
    single = {(r.qid, r.cid) for r in lsh_bucket_topk(q, e, k=3).collect()}
    multi_rows = lsh_multiprobe_topk(q, e, k=3).collect()
    multi = {(r.qid, r.cid) for r in multi_rows}
    assert len(multi_rows) == len(multi)  # no duplicate pairs
    assert len(multi & brute) >= len(single & brute)
    e.unpersist()


def test_ivf_multiprobe_dominates_single_cell(spark):
    """nprobe=2 IVF candidates are a superset of nprobe=1 per query
    (the corpus assignment is identical; the query's probe set grows),
    so each rank's cosine is >= the single-cell result's, and no
    (qid, cid) pair duplicates."""
    from etl_sh_design_spark.operators.similarity import (
        ivf_bucket_topk,
        ivf_multiprobe_topk,
    )

    e = (
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .limit(400)
        .cache()
    )
    q = e.filter(F.col("vec_id") < 10)
    cents = e.filter(F.col("vec_id") < 16)
    one = {}
    for r in ivf_bucket_topk(q, e, cents, k=3).collect():
        one.setdefault(r.qid, []).append(r.cos)
    rows = ivf_multiprobe_topk(q, e, cents, k=3, nprobe=2).collect()
    assert len({(r.qid, r.cid) for r in rows}) == len(rows)
    multi = {}
    for r in rows:
        multi.setdefault(r.qid, []).append(r.cos)
    for qid, cos1 in one.items():
        cos2 = multi[qid]
        assert len(cos2) >= len(cos1)
        for a, b in zip(sorted(cos2, reverse=True), sorted(cos1, reverse=True)):
            assert a >= b, (qid, cos2, cos1)
    e.unpersist()


def test_registry_skips_reference_queries_when_ref_dir_absent(tmp_path):
    """With SPARK_GRAFT_REF_DIR pointing nowhere, the registry must
    import cleanly and simply not register the reference-artifact
    parity queries (VERDICT r5 'what's wrong' #1)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, SPARK_GRAFT_REF_DIR=str(tmp_path / "nope"))
    code = (
        "from etl_sh_design_spark import registry;"
        "q = registry.queries(); o = registry.oracle_sql();"
        "assert 'real_face_physics' not in q and 'real_face_physics' not in o;"
        "assert len(q) > 100"
    )
    subprocess.run([sys.executable, "-c", code], env=env, check=True, cwd="/root/repo")


def test_registry_honors_relocated_reference_dir(tmp_path):
    """SPARK_GRAFT_REF_DIR pointing at a COPY of the reference (not
    /root/reference) must register all reference-gated queries with
    paths under the override — the positive twin of the skip test."""
    import os
    import shutil
    import subprocess
    import sys

    src = "/root/reference"
    if not os.path.isdir(os.path.join(src, "layouts")):
        pytest.skip("reference checkout not available")
    dst = tmp_path / "refcopy"
    dst.mkdir()
    shutil.copytree(os.path.join(src, "layouts"), dst / "layouts")
    shutil.copytree(os.path.join(src, "data"), dst / "data")
    env = dict(os.environ, SPARK_GRAFT_REF_DIR=str(dst))
    code = (
        "from etl_sh_design_spark import registry;"
        "q = registry.queries(); o = registry.oracle_sql();"
        "assert 'real_face_physics' in q and 'real_acceptance_profile' in q;"
        f"assert '{dst}' in o['real_face_physics'], o['real_face_physics'][:200];"
        "assert '/root/reference' not in o['real_face_physics']"
    )
    subprocess.run([sys.executable, "-c", code], env=env, check=True, cwd="/root/repo")
