"""Round-11 goldens: the semdedup capped-k assignment rung (capped
k_eff + centroid-block-sharded GEMM + within-cell candidate horizon)
and its forced-path parity contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _injected(spark):
    emb = spark.read.parquet(SF_SMOKE + "/embeddings.parquet")
    dup = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    return emb.select("vec_id", "embedding").unionByName(dup)


def test_semdedup_capped_k_dispatch_math():
    """The r11 cap: k_eff = min(ceil(n/bound), SEMDEDUP_MAX_K), still
    floored at the caller's k; max_k=0 restores pre-r11 growth. Pins
    the numbers the 100x probe and the registry rely on."""
    from etl_sh_design_spark.operators.semdedup import (
        SEMDEDUP_MAX_K,
        SEMDEDUP_MAX_MEAN_CELL_ROWS,
        semdedup_effective_k,
    )

    bound = SEMDEDUP_MAX_MEAN_CELL_ROWS
    assert SEMDEDUP_MAX_K == 64
    # below the cap: identical to the grow-k rule (sf1 10x corpus)
    assert semdedup_effective_k(24_200, 8, bound) == 25
    assert semdedup_effective_k(64_000, 8, bound) == 64  # exactly at cap
    assert semdedup_effective_k(64_001, 8, bound) == 64  # capped
    assert semdedup_effective_k(242_000, 8, bound) == 64  # the 100x corpus
    assert semdedup_effective_k(242_000, 8, bound, max_k=0) == 242  # no cap
    assert semdedup_effective_k(242_000, 100, bound, max_k=50) == 100  # floor
    assert semdedup_effective_k(242_000, 8, 0) == 8  # dispatch disabled


def test_semdedup_capped_path_saturated_cap_parity(spark):
    """Forced-path parity (the c4_line_dedup standard): the capped
    path at a SATURATED candidate horizon (cap >= max cell rows) must
    be bit-identical to forcing the same k through the plain path —
    the keep-rank window + filter is then a no-op and every pair is
    still compared. bound=30 on the 550-vec corpus grows to 19 cells,
    max_k=5 caps it at 5 (capped regime on), vs caller-k=5 with the
    dispatch disabled (plain pre-r11 path)."""
    from etl_sh_design_spark.operators.semdedup import (
        semantic_dedup_profile,
        semdedup_effective_k,
    )

    inj = _injected(spark)
    n = inj.count()
    assert semdedup_effective_k(n, 2, 30, max_k=5) == 5
    assert semdedup_effective_k(n, 2, 30, max_k=0) > 5  # cap really bites
    # the `capped` regime column differs BY DESIGN across the two
    # paths (True on the capped path, False on the plain one — it is
    # the r12 regime marker, ADVICE r11); the parity contract is on
    # the stats, so drop it before the tuple compare
    capped_run = semantic_dedup_profile(
        inj, k=2, max_mean_cell_rows=30, max_k=5, candidate_cap=10**6
    )
    assert {r["capped"] for r in capped_run.collect()} == {True}
    capped = sorted(tuple(r) for r in capped_run.drop("capped").collect())
    plain_run = semantic_dedup_profile(inj, k=5, max_mean_cell_rows=0)
    assert {r["capped"] for r in plain_run.collect()} == {False}
    plain = sorted(tuple(r) for r in plain_run.drop("capped").collect())
    assert capped == plain
    # the salted cogroup kernel (the default, SEMDEDUP_CELL_SALTS > 1)
    # and the whole-cell kernel (cell_salts=1) must agree with each
    # other and with the plain path — salting only re-shards the same
    # comparisons
    unsalted = sorted(
        tuple(r)
        for r in semantic_dedup_profile(
            inj,
            k=2,
            max_mean_cell_rows=30,
            max_k=5,
            candidate_cap=10**6,
            cell_salts=1,
        )
        .drop("capped")
        .collect()
    )
    assert unsalted == plain


def test_semdedup_candidate_cap_bounds_never_adds(spark):
    """The candidate horizon only MISSES removals, never invents them:
    per cluster, n_removed at a small cap <= n_removed at a saturated
    cap, with identical membership (the cap does not touch the
    assignment). Exact duplicates are still removed at any cap >= 1
    whenever the original sits in the cell's top-cap keep order; the
    saturated run removes exactly the injected copies, so the small-
    cap run can only remove a subset of them."""
    from etl_sh_design_spark.operators.semdedup import semantic_dedup_profile

    inj = _injected(spark)

    def run(cap):
        return {
            r["cluster"]: (r["n_members"], r["n_removed"])
            for r in semantic_dedup_profile(
                inj, k=2, max_mean_cell_rows=30, max_k=5, candidate_cap=cap
            ).collect()
        }

    sat = run(10**6)
    small = run(3)
    assert set(sat) == set(small)
    for c in sat:
        assert small[c][0] == sat[c][0]  # same membership
        assert small[c][1] <= sat[c][1]  # horizon never adds removals


def test_pq_shortlist_audit_fires_exactly_on_tie_class_slice(spark, tmp_path):
    """The saturation guard (VERDICT r10 What's-wrong #2): on the
    clustered fixture — the regime where round-10 measured R=100
    recall collapse to 0.00 — PQ codes saturate at cluster identity,
    whole clusters tie on ADC distance, and an undersized shortlist
    slices the tie class. The audit must (a) flag every query as
    saturated at R=20 on depth-100 clusters, with the tie-class mass
    visible, and (b) the failure it signals must be real: exact
    re-rank recall@3 from the sliced R=20 shortlist is WORSE than
    from a tie-class-covering R, which is perfect."""
    import numpy as np

    from etl_sh_design_spark.operators.pq import (
        pq_rerank_topk,
        pq_shortlist_audit,
    )
    from tools.scale_probe import build_clustered_embeddings

    out = str(tmp_path / "clustered")
    build_clustered_embeddings(spark, out, n_rows=2000)
    emb = spark.read.parquet(out + "/embeddings.parquet")

    audit = {
        r["qid"]: r
        for r in pq_shortlist_audit(emb, shortlist=20, n_queries=5).collect()
    }
    assert len(audit) == 5
    for r in audit.values():
        assert r["shortlist_saturated"] == 1
        assert r["n_at_or_below_cutoff"] > 20  # the bar sliced a tie class
        assert r["n_tied_at_cutoff"] > 1  # and the class itself is visible

    # exact L2 truth (same 6dp rounding + lowest-id tie rule)
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.array([r["embedding"] for r in rows], dtype="float64")
    order = np.argsort(ids)
    ids, V = ids[order], V[order]

    def exact_top3(q):
        d = np.round(((V - V[q]) ** 2).sum(axis=1), 6)
        cand = [(dd, int(i)) for dd, i in zip(d, ids) if i != q]
        cand.sort()
        return {i for _, i in cand[:3]}

    def recall(shortlist):
        got = {}
        res = pq_rerank_topk(
            emb, k=3, shortlist=shortlist, n_queries=5
        ).collect()
        for r in res:
            got.setdefault(r["qid"], set()).add(r["neighbor_id"])
        hits = sum(
            len(got.get(q, set()) & exact_top3(q)) for q in range(5)
        )
        return hits / 15.0

    r_small, r_big = recall(20), recall(500)
    assert r_big == 1.0  # tie-class-covering R restores exact recall
    assert r_small < r_big  # the sliced shortlist really loses truth


def test_pq_shortlist_audit_silent_on_isotropic_corpus(spark):
    """On the shipped near-isotropic corpus (no deep ADC tie classes)
    the PQ guard must stay quiet at the registry's R=50 — the flag is
    a signal, not a constant alarm. The IVF-PQ twin audits the PROBED
    population (~2/8 of 500 ≈ 120 candidates), where R=50 admits ~40%
    and residual-quantized ADC genuinely ties in small classes at the
    bar — there the contract is that the tie classes it reports are
    SHALLOW (tens, the re-rank boundary blur) as opposed to the
    thousands-deep classes on clustered dup corpora (the recall-zero
    regime tools/recall_at_scale.py --pq-100x measures: mean
    n_tied_at_cutoff 9297 at depth 10k)."""
    from etl_sh_design_spark.operators.pq import (
        ivfpq_shortlist_audit,
        pq_shortlist_audit,
    )

    emb = spark.read.parquet(SF_SMOKE + "/embeddings.parquet")
    rows = pq_shortlist_audit(emb, shortlist=50, n_queries=10).collect()
    assert len(rows) == 10
    assert all(r["shortlist_saturated"] == 0 for r in rows)
    rows = ivfpq_shortlist_audit(
        emb, shortlist=50, n_queries=10, nprobe=2
    ).collect()
    assert len(rows) == 10
    assert all(r["n_tied_at_cutoff"] < 50 for r in rows)
    assert all(r["n_at_or_below_cutoff"] < 50 + 50 for r in rows)


def test_phash_banded_equals_brute(spark):
    """The pigeonhole contract (same as simhash_pairs): 7 bands of 8
    bits over the 56-bit signature guarantee every pair within
    hamming 6 shares a band key, so the banded equi-join result EQUALS
    the O(n²) cross-join result — a superset of candidates, filtered
    exactly."""
    from etl_sh_design_spark.operators.multimodal import phash_pairs

    docs = (
        spark.read.parquet(SF_SMOKE + "/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    banded = sorted(tuple(r) for r in phash_pairs(docs).collect())
    brute = sorted(tuple(r) for r in phash_pairs(docs, brute=True).collect())
    assert banded == brute
    assert len(banded) > 0  # the fixture really has near-dup payloads
    # the selectivity knob changes the banding, never the result: a
    # wider band (14 bits -> 4 bands, the scale configuration) with
    # the correspondingly lower guarantee h<=3 must equal the brute
    # result at that threshold
    wide = sorted(
        tuple(r)
        for r in phash_pairs(docs, max_hamming=3, band_w=14).collect()
    )
    brute3 = sorted(
        tuple(r)
        for r in phash_pairs(docs, max_hamming=3, brute=True).collect()
    )
    assert wide == brute3


def test_phash_detects_chunk_local_edits(spark):
    """Locality golden: a payload with ONE substituted character
    differs from its original in at most a couple of grid cells (the
    chunks the edit touches), so the pair must surface within
    hamming 6 — while the 200-doc corpus contributes no full-random
    false friendship at hamming <= 6 beyond its own near-dups."""
    from pyspark.sql import functions as F

    from etl_sh_design_spark.operators.multimodal import phash_pairs

    base = (
        spark.read.parquet(SF_SMOKE + "/documents.parquet")
        .select("doc_id", "text")
        .filter(F.length("text") > 112)  # >= 2 chars per grid cell
        .limit(50)
    )
    # same-length single-char substitution: chunk boundaries unchanged
    edited = base.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(
            F.lit("Z"), F.substring("text", 2, 1_000_000)
        ).alias("text"),
    )
    pairs = phash_pairs(base.unionByName(edited)).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    want = {
        (r["doc_id"], r["doc_id"] + 1_000_000) for r in base.collect()
    }
    assert want <= found  # every edited twin is recovered


def test_bradley_terry_hand_case(spark):
    """Hand-checkable preference stream (one user, five events):
    A(3) -> B(1) -> A(4) -> C(2) -> B(5) gives adjacent comparisons
    A>B, A>B, A>C, B>C — so wins A=3/3 games, B=1/3, C=0/2, and the
    MM strengths must order A > B > C with C exactly 0 (never wins)
    and the gauge normalization summing to 1 within rounding."""
    from etl_sh_design_spark.operators.preference import (
        bradley_terry_strengths,
    )

    rows = [
        (1, "2024-01-01 00:00:01", 1, "A", 3.0),
        (2, "2024-01-01 00:00:02", 1, "B", 1.0),
        (3, "2024-01-01 00:00:03", 1, "A", 4.0),
        (4, "2024-01-01 00:00:04", 1, "C", 2.0),
        (5, "2024-01-01 00:00:05", 1, "B", 5.0),
    ]
    ev = spark.createDataFrame(
        [(i, t, u, it, v) for i, t, u, it, v in rows],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r["event_type"]: r
        for r in bradley_terry_strengths(ev, rounds=3).collect()
    }
    assert (out["A"]["n_wins"], out["A"]["n_games"]) == (3, 3)
    assert (out["B"]["n_wins"], out["B"]["n_games"]) == (1, 3)
    assert (out["C"]["n_wins"], out["C"]["n_games"]) == (0, 2)
    assert out["A"]["strength"] > out["B"]["strength"] > out["C"]["strength"]
    assert out["C"]["strength"] == 0.0
    assert abs(sum(r["strength"] for r in out.values()) - 1.0) < 1e-5


def test_bradley_terry_conservation_on_corpus(spark):
    """On the real events table: every comparison produces exactly one
    win, so sum(n_wins) equals the comparison count and
    sum(n_games) = 2 * sum(n_wins); strengths are a distribution."""
    from etl_sh_design_spark.operators.preference import (
        bradley_terry_strengths,
        preference_pairs,
    )
    from etl_sh_design_spark.session import read_events

    ev = read_events(spark, SF_SMOKE)
    rows = bradley_terry_strengths(ev, rounds=3).collect()
    n_cmp = preference_pairs(ev).count()
    assert sum(r["n_wins"] for r in rows) == n_cmp
    assert sum(r["n_games"] for r in rows) == 2 * n_cmp
    assert abs(sum(r["strength"] for r in rows) - 1.0) < 1e-5
    assert all(r["strength"] >= 0 for r in rows)


def test_gemm_centroid_block_parity(spark):
    """The centroid-block-sharded GEMM kernel must be RESULT-IDENTICAL
    to the unblocked kernel and to the relational fold at any block
    width: within a block argmin takes the first (lowest-id) minimum,
    across blocks the running best updates on strict less-than, so
    ties keep the earlier block — the global first-minimum rule.
    block=3 forces 3 shards over 7 centroids; block=1<<30 is the
    pre-r11 single-shard kernel."""
    from etl_sh_design_spark.operators.kmeans import (
        _as_double,
        _assign,
        _assign_gemm,
    )

    emb = spark.read.parquet(SF_SMOKE + "/embeddings.parquet")
    vecs = emb.select(
        "vec_id", _as_double("embedding").alias("v")
    ).localCheckpoint(eager=False)
    cents = vecs.filter(F.col("vec_id") < 7).select(
        F.col("vec_id").cast("int").alias("cluster"), F.col("v").alias("c")
    )

    def rows(df):
        return sorted(
            (r["vec_id"], r["cluster"], r["dist"]) for r in df.collect()
        )

    rel = rows(_assign(vecs, cents))
    one_shard = rows(_assign_gemm(vecs, cents, block=1 << 30))
    sharded = rows(_assign_gemm(vecs, cents, block=3))
    assert rel == one_shard == sharded
