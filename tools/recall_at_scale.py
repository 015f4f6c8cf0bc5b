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

from tools.scale_probe import SF01, SF10X, build_10x, build_10x_embeddings  # noqa: E402


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


if __name__ == "__main__":
    main()
