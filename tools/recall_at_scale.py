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


def main() -> None:
    from etl_sh_design_spark import registry
    from etl_sh_design_spark.session import get_spark

    spark = get_spark(app_name="recall_at_scale")
    spark.sparkContext.setLogLevel("ERROR")
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

    print("\n| harness | corpus | wall s | mean recall@3 |")
    print("|---|---|---|---|")
    for name, label, dt, rec in crows:
        print(f"| {name} | {label} | {dt} | {rec} |")


if __name__ == "__main__":
    main()
