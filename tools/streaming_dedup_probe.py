#!/usr/bin/env python
"""Measured scaling probe for the streaming ingest dedup
(streaming/dedup.py): run the full stream — map-side MinHash
signature projection into dropDuplicatesWithinWatermark — over the
sf0.1 documents table and over the shingle-disjoint 10x corpus
(tools/scale_probe.build_10x), recording wall time, input rows/s,
survivor count, micro-batch count, and the state-store row count
from the final StreamingQueryProgress. Backs SCALE.md's streaming-
dedup section with a measured curve.

Usage: python tools/streaming_dedup_probe.py   (~1-2 min)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import SF01, SF10X, build_10x


def _state_rows(query) -> int:
    prog = query.lastProgress
    ops = (prog or {}).get("stateOperators") or []
    return sum(int(op.get("numRowsTotal", 0)) for op in ops)


def probe(spark, sf_dir: str, tag: str) -> dict:
    from pyspark.sql import functions as F

    from etl_sh_design_spark.streaming.dedup import with_signature_key

    path = os.path.join(sf_dir, "documents.parquet")
    n_in = spark.read.parquet(path).count()
    schema = spark.read.parquet(path).schema
    # The two corpora have different physical shapes: the sf tables are
    # single FILES (stream the parent dir with a pathGlobFilter — the file
    # source requires basePath to be a directory), while the 10x table is a
    # Spark-written DIRECTORY (stream it directly; a glob filter naming the
    # directory would match no leaf part-files).
    reader = spark.readStream.schema(schema)
    if os.path.isdir(path):
        src = reader.parquet(path)
    else:
        src = reader.option("pathGlobFilter", "documents.parquet").parquet(sf_dir)
    stream = src.withColumn("ingest_ts", F.timestamp_seconds(F.col("doc_id")))
    keyed = with_signature_key(stream, k=8).withWatermark("ingest_ts", "10 minutes")
    # memory-sink names are SQL identifiers: no dots ("sf0.1" is invalid)
    name = "sigdedup_probe_" + tag.replace(".", "_").replace("-", "_")
    t0 = time.perf_counter()
    q = (
        keyed.dropDuplicatesWithinWatermark(["sig_key"])
        .select("doc_id", "sig_key")
        .writeStream.outputMode("append")
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
    survivors = spark.sql(f"SELECT count(*) AS c FROM {name}").collect()[0]["c"]
    return {
        "corpus": tag,
        "rows_in": n_in,
        "survivors": survivors,
        "state_rows": state,
        "micro_batches": batches,
        "wall_s": round(wall, 2),
        "rows_per_s": round(n_in / wall),
    }


def main() -> None:
    from etl_sh_design_spark.session import get_spark

    spark = get_spark(app_name="streaming-dedup-probe")
    build_10x(spark)
    rows = [probe(spark, SF01, "sf0.1"), probe(spark, SF10X, "10x")]
    print("| corpus | rows in | survivors | state rows | batches | wall s | rows/s |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['corpus']} | {r['rows_in']} | {r['survivors']} | "
            f"{r['state_rows']} | {r['micro_batches']} | {r['wall_s']} | "
            f"{r['rows_per_s']} |"
        )
    ratio = rows[1]["wall_s"] / max(rows[0]["wall_s"], 1e-9)
    print(f"wall ratio at 10x rows: {ratio:.2f}x")


if __name__ == "__main__":
    main()
