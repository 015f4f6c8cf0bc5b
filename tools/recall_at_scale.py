#!/usr/bin/env python
"""ANN recall at 1x vs 10x corpus (round-7 verdict item 8): re-run the
recall evaluation harnesses (`ann_recall_at_k`, `lsh_recall_eval`)
on the sf0.1 corpus AND the 10x key-strided/rotated corpus
(tools/scale_probe.py builders), to show bucketed-candidate recall
holds as cells/buckets grow with the corpus. Prints a markdown table
for SCALE.md.

Usage: python tools/recall_at_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import (  # noqa: E402
    CLUSTERED_1X,
    CLUSTERED_10X,
    CLUSTERED_100X,
    SF01,
    SF10X,
    build_10x,
    build_10x_embeddings,
    build_clustered_embeddings,
)


def _mean_recall(rows) -> float:
    vals = [r["recall"] for r in rows]
    return round(sum(vals) / len(vals), 3) if vals else float("nan")


def _ivf_recall(spark, sf_dir: str, k: int = 3, nprobe: int = 2) -> float:
    """recall@k of IVF multi-probe (16 seed centroids, same params as
    the similarity_ivf_multiprobe registry query) vs brute top-k,
    computed in-tool — there is no registry recall harness for IVF."""
    from pyspark.sql import functions as F

    from etl_sh_design_spark.operators.similarity import (
        cosine_topk,
        ivf_multiprobe_topk,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 10)
    cents = e.filter(F.col("vec_id") < 16)
    brute = cosine_topk(q, e, k=k).select("qid", "cid")
    ann = ivf_multiprobe_topk(q, e, cents, k=k, nprobe=nprobe).select(
        F.col("qid").alias("aqid"), F.col("cid").alias("acid")
    )
    hits = brute.join(
        ann, (brute.qid == ann.aqid) & (brute.cid == ann.acid), "left_semi"
    ).count()
    total = brute.count()
    return round(hits / total, 3) if total else float("nan")


def _exact_l2_topk(spark, sf_dir: str, k: int, n_queries: int):
    """Exact squared-L2 top-k (self excluded) — the ground truth the
    PQ ladder approximates (PQ/ADC ranks by L2, not cosine, so its
    recall is measured against L2 truth; SRP/IVF recall above uses
    cosine truth to match THEIR metric)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from etl_sh_design_spark.operators.pq import _sqdist

    ev = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = ev.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    d = (
        ev.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("d", _sqdist("v", "qv"))
    )
    w = W.partitionBy("qid").orderBy("d", "vec_id")
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "vec_id")
    )


def _pq_ladder_recall(
    spark,
    sf_dir: str,
    k: int = 5,
    n_queries: int = 10,
    rerank_rs: tuple = (100, 1000),
):
    """recall@k of pq_topk and ivfpq_topk vs exact L2 top-k (VERDICT
    r9 missing #3: the compressed-code rows were absent from the
    clustered table — residual quantization error concentrates near
    cluster centers, so clustered data is exactly where their recall
    degrades non-obviously)."""
    from pyspark.sql import functions as F

    from etl_sh_design_spark.operators import pq as pqmod
    from etl_sh_design_spark.operators.pq import ivfpq_topk, pq_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = _exact_l2_topk(spark, sf_dir, k, n_queries)
    total = exact.count()

    def recall_of(fn) -> float:
        ann = fn(e, k=k, n_queries=n_queries).select(
            F.col("qid").alias("aqid"), F.col("neighbor_id").alias("acid")
        )
        hits = exact.join(
            ann,
            (exact.qid == ann.aqid) & (exact.vec_id == ann.acid),
            "left_semi",
        ).count()
        spark.catalog.clearCache()
        return round(hits / total, 3) if total else float("nan")

    def recall_rerank(fn, R: int) -> float:
        """ADC shortlist of R candidates, exact re-rank to top-k —
        the production PQ deployment shape (the codes prune, floats
        decide): recall is then bounded by P(true top-k in the
        shortlist), not by quantization resolution."""
        from pyspark.sql import Window as W

        from etl_sh_design_spark.operators.pq import _sqdist

        cand = fn(e, k=R, n_queries=n_queries).select(
            "qid", F.col("neighbor_id").alias("vec_id")
        )
        ev = e.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        qv = ev.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("qid"), F.col("v").alias("qv")
        )
        scored = (
            cand.join(ev, "vec_id")
            .join(F.broadcast(qv), "qid")
            .withColumn("d", _sqdist("qv", "v"))
        )
        w = W.partitionBy("qid").orderBy("d", "vec_id")
        rr = (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("qid", "vec_id")
        )
        hits = exact.join(rr, ["qid", "vec_id"], "left_semi").count()
        spark.catalog.clearCache()
        return round(hits / total, 3) if total else float("nan")

    out = {
        "pq_topk (M=4,K=16)": recall_of(pq_topk),
        "ivfpq_topk (M=4,K=16,nprobe=1)": recall_of(ivfpq_topk),
    }
    for R in rerank_rs:
        out[f"pq+exact-rerank (R={R})"] = recall_rerank(pq_topk, R)
    # the recovery knob, measured: the shipped oracle-twin config
    # (M=4 subspaces x K=16 codes) has 16 codes per 16-dim subspace —
    # FEWER codes than the fixture's 20 cluster modes, so codes
    # saturate at cluster identity, all same-cluster members tie in
    # ADC, and ties break by vec_id: recall collapses as cluster depth
    # grows. M=8 x K=64 (the Faiss-shaped config: 8-dim subspaces,
    # ~3 codes per mode) restores within-cluster resolution. The
    # operators read the module constants at call time, so the knob is
    # a rebind here — the registry/oracle config is untouched.
    out["ivfpq_topk (M=4,K=16,nprobe=2)"] = recall_of(
        lambda *a, **kw: ivfpq_topk(*a, nprobe=2, **kw)
    )
    saved = (pqmod.M, pqmod.SUBDIM, pqmod.KCODES)
    try:
        pqmod.M, pqmod.SUBDIM, pqmod.KCODES = 8, 8, 64
        out["pq_topk (M=8,K=64)"] = recall_of(pq_topk)
        out["ivfpq_topk (M=8,K=64,nprobe=1)"] = recall_of(ivfpq_topk)
        out["ivfpq_topk (M=8,K=64,nprobe=2)"] = recall_of(
            lambda *a, **kw: ivfpq_topk(*a, nprobe=2, **kw)
        )
    finally:
        pqmod.M, pqmod.SUBDIM, pqmod.KCODES = saved
    return out


def main() -> None:
    from etl_sh_design_spark import registry
    from etl_sh_design_spark.session import get_spark

    pq_only = "--pq-only" in sys.argv

    spark = get_spark(app_name="recall_at_scale")
    spark.sparkContext.setLogLevel("ERROR")

    if "--auto-r" in sys.argv:
        # round 12 (VERDICT r11 next #2 closure): the auto-R re-rank
        # path on the clustered decades — recall with NO hand-set R.
        # rank()-with-ties admission covers the ADC tie class at the
        # default floor, so the rows that needed hand-sized R=12000 in
        # round 11 must read 1.00 here with the floor untouched.
        from pyspark.sql import functions as F

        from etl_sh_design_spark.operators.pq import pq_rerank_topk

        build_clustered_embeddings(spark, CLUSTERED_1X, n_rows=2_000)
        build_clustered_embeddings(spark, CLUSTERED_10X, n_rows=20_000)
        build_clustered_embeddings(spark, CLUSTERED_100X, n_rows=200_000)
        print("\n| corpus | wall s | auto-R mean recall@5 (L2 truth) |")
        print("|---|---|---|")
        for label, sf_dir in (
            ("clustered 1x (2k, depth 100)", CLUSTERED_1X),
            ("clustered 10x (20k, depth 1k)", CLUSTERED_10X),
            ("clustered 100x (200k, depth 10k)", CLUSTERED_100X),
        ):
            e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            exact = _exact_l2_topk(spark, sf_dir, 5, 10)
            total = exact.count()
            t0 = time.perf_counter()
            rr = pq_rerank_topk(
                e, k=5, n_queries=10, auto_r=True, max_auto_r=500_000
            ).select("qid", F.col("neighbor_id").alias("vec_id"))
            hits = exact.join(rr, ["qid", "vec_id"], "left_semi").count()
            dt = round(time.perf_counter() - t0, 1)
            print(f"| {label} | {dt} | {round(hits / total, 3)} |")
            spark.catalog.clearCache()
        return

    pq_100x = "--pq-100x" in sys.argv
    if pq_only or pq_100x:
        # clustered PQ/IVF-PQ rows alone (the r10 addition) — the
        # SRP/IVF rows are stable in SCALE.md and cost ~10 min to redo.
        # --pq-100x (round 11, VERDICT r10 item 5) adds the third
        # decade: 200k vectors at depth-10k clusters, where R=1000
        # itself undersizes the ADC tie class — the regime that tests
        # the R-sizing rule and pq_shortlist_audit's flag at scale.
        # The rule-sized row (R=12000 > depth 10k, alpha=1.2) must
        # restore recall 1.0 where both standard Rs fail.
        from etl_sh_design_spark.operators.pq import pq_shortlist_audit

        build_clustered_embeddings(spark, CLUSTERED_1X, n_rows=2_000)
        build_clustered_embeddings(spark, CLUSTERED_10X, n_rows=20_000)
        corpora = [
            ("clustered 1x (2k, depth 100)", CLUSTERED_1X, (100, 1000)),
            ("clustered 10x (20k, depth 1k)", CLUSTERED_10X, (100, 1000)),
        ]
        if pq_100x:
            build_clustered_embeddings(spark, CLUSTERED_100X, n_rows=200_000)
            corpora.append(
                (
                    "clustered 100x (200k, depth 10k)",
                    CLUSTERED_100X,
                    (100, 1000, 12000),
                )
            )
        print("\n| harness | corpus | wall s | mean recall@5 (L2 truth) |")
        print("|---|---|---|---|")
        for label, sf_dir, rs in corpora:
            t0 = time.perf_counter()
            rec = _pq_ladder_recall(spark, sf_dir, rerank_rs=rs)
            dt = round(time.perf_counter() - t0, 1)
            for name, r in rec.items():
                print(f"| {name} | {label} | {dt} | {r} |")
        # the saturation guard at scale: per corpus, the audit's
        # tie-class depth estimate and how many of the 10 query
        # shortlists are saturated at R=1000 (the sizing rule reads
        # n_tied_at_cutoff as the depth estimate -> R = alpha * depth)
        print("\n| corpus | R | mean n_tied_at_cutoff | n saturated / 10 |")
        print("|---|---|---|---|")
        for label, sf_dir, _ in corpora:
            emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            rows = pq_shortlist_audit(emb, shortlist=1000, n_queries=10).collect()
            tied = round(sum(r["n_tied_at_cutoff"] for r in rows) / len(rows))
            sat = sum(r["shortlist_saturated"] for r in rows)
            print(f"| {label} | 1000 | {tied} | {sat}/10 |")
            spark.catalog.clearCache()
        return

    build_10x(spark)
    build_10x_embeddings(spark)

    qs = registry.queries()
    rows = []
    for name in ("ann_recall_at_k", "ann_multiprobe_recall", "lsh_recall_eval"):
        for label, sf_dir in (("1x (sf0.1)", SF01), ("10x", SF10X)):
            t0 = time.perf_counter()
            out = qs[name](spark, sf_dir).collect()
            dt = round(time.perf_counter() - t0, 1)
            for r in out:
                rows.append((name, label, dt, r.asDict()))
            spark.catalog.clearCache()

    print("\n| harness | corpus | wall s | result |")
    print("|---|---|---|---|")
    for name, label, dt, d in rows:
        compact = ", ".join(f"{k}={v}" for k, v in d.items())
        print(f"| {name} | {label} | {dt} | {compact} |")

    # ---------------------------------------------------- clustered
    # same harnesses on the mixture-of-Gaussians fixture (VERDICT r8
    # item 4): the uniform testdata embeddings make SRP recall equal
    # the probed fraction by construction; the clustered fixture shows
    # the regime bucketed ANN exists for. The embedding-based
    # harnesses read {sf_dir}/embeddings.parquet, so the fixture dirs
    # drop in as sf_dir; lsh_recall_eval is text-based and excluded.
    build_clustered_embeddings(spark, CLUSTERED_1X, n_rows=2_000)
    build_clustered_embeddings(spark, CLUSTERED_10X, n_rows=20_000)
    crows = []
    for label, sf_dir in (("clustered 1x (2k)", CLUSTERED_1X),
                          ("clustered 10x (20k)", CLUSTERED_10X)):
        for name in ("ann_recall_at_k", "ann_multiprobe_recall"):
            t0 = time.perf_counter()
            out = [r.asDict() for r in qs[name](spark, sf_dir).collect()]
            dt = round(time.perf_counter() - t0, 1)
            crows.append((name, label, dt, _mean_recall(out)))
            spark.catalog.clearCache()
        t0 = time.perf_counter()
        ivf = _ivf_recall(spark, sf_dir)
        dt = round(time.perf_counter() - t0, 1)
        crows.append(("ivf_multiprobe (in-tool, nprobe=2/16 cells)", label, dt, ivf))
        spark.catalog.clearCache()
        # compressed-code rows (r10): recall vs EXACT L2 truth. One
        # wall reading for the whole ladder (the rungs share the PQ
        # family build, so per-rung walls are not separable here);
        # every ladder row reports that same whole-ladder wall.
        t0 = time.perf_counter()
        ladder = _pq_ladder_recall(spark, sf_dir)
        dt = round(time.perf_counter() - t0, 1)
        for name, r in ladder.items():
            crows.append((f"{name} (vs L2 truth, k=5)", label, dt, r))

    print("\n| harness | corpus | wall s | mean recall@3 |")
    print("|---|---|---|---|")
    for name, label, dt, rec in crows:
        print(f"| {name} | {label} | {dt} | {rec} |")


if __name__ == "__main__":
    main()
