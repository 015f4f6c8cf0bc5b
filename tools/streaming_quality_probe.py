#!/usr/bin/env python
"""Measured scaling probe for the streaming ingest quality gate
(streaming/quality.py): run the full stream — map-side composite
quality_score filter into the complete-mode (lang, source) admission
scoreboard — over the sf0.1 documents table and over the 10x corpus
(tools/scale_probe.build_10x), recording wall time, input rows/s,
admitted-document count, scoreboard row count, and the state-store
row count from the final StreamingQueryProgress. Backs SCALE.md's
streaming-quality section with a measured curve; the load-bearing
claim is that scoreboard STATE is vocabulary-bounded (same row count
at both scales) while admitted counts scale with the corpus.

Usage: python tools/streaming_quality_probe.py   (~1-2 min)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import SF01, SF10X, build_10x
from tools.streaming_dedup_probe import _state_rows


def probe(spark, sf_dir: str, tag: str) -> dict:
    from etl_sh_design_spark.streaming.quality import DEFAULT_THRESHOLD, gate_summary

    path = os.path.join(sf_dir, "documents.parquet")
    n_in = spark.read.parquet(path).count()
    schema = spark.read.parquet(path).schema
    # Same two physical corpus shapes as the dedup probe: single FILE
    # (stream the parent dir + pathGlobFilter) vs Spark-written DIRECTORY.
    reader = spark.readStream.schema(schema)
    if os.path.isdir(path):
        src = reader.parquet(path)
    else:
        src = reader.option("pathGlobFilter", "documents.parquet").parquet(sf_dir)
    name = "qgate_probe_" + tag.replace(".", "_").replace("-", "_")
    t0 = time.perf_counter()
    q = (
        gate_summary(src, DEFAULT_THRESHOLD)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        wall = time.perf_counter() - t0
        state = _state_rows(q)
        batches = len(q.recentProgress)
    finally:
        q.stop()
    agg = spark.sql(
        f"SELECT count(*) AS groups, sum(n_admitted) AS admitted FROM {name}"
    ).collect()[0]
    return {
        "corpus": tag,
        "rows_in": n_in,
        "admitted": int(agg["admitted"]),
        "scoreboard_rows": int(agg["groups"]),
        "state_rows": state,
        "micro_batches": batches,
        "wall_s": round(wall, 2),
        "rows_per_s": round(n_in / wall),
    }


def main() -> None:
    from etl_sh_design_spark.session import get_spark

    spark = get_spark(app_name="streaming-quality-probe")
    build_10x(spark)
    # Warmup pass: the first streaming query in a session pays
    # JIT/codegen + state-store init that would otherwise land on
    # whichever corpus runs first and distort the ratio (measured:
    # 5.6 s cold vs 2.4 s warm for the SAME plan).
    probe(spark, SF01, "warmup")
    rows = [probe(spark, SF01, "sf0.1"), probe(spark, SF10X, "10x")]
    print(
        "| corpus | rows in | admitted | scoreboard rows | state rows "
        "| batches | wall s | rows/s |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['corpus']} | {r['rows_in']} | {r['admitted']} | "
            f"{r['scoreboard_rows']} | {r['state_rows']} | "
            f"{r['micro_batches']} | {r['wall_s']} | {r['rows_per_s']} |"
        )
    ratio = rows[1]["wall_s"] / max(rows[0]["wall_s"], 1e-9)
    print(f"wall ratio at 10x rows: {ratio:.2f}x")


if __name__ == "__main__":
    main()
