#!/usr/bin/env python
"""Measured bucketed-vs-plain join probe: the q3-shaped
lineitem x orders equi-join at sf0.1, run (a) over plain parquet
scans and (b) over pre-bucketed tables on the join key, reporting
wall seconds and SHUFFLE-WRITE BYTES for each. The plan assertion
lives in tests/test_bucketing.py; this quantifies what the bucketed
layout buys — at 100 TB the saved exchange is the fact-table
shuffle itself, usually the single largest network cost in the job.

Usage: python tools/bucketing_probe.py  (prints a markdown table)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def shuffle_write_bytes(spark) -> int:
    """Total shuffle-write bytes across completed stages (REST API,
    same implementation as tools/scale_probe.py)."""
    import json
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def q3_join(li, o):
    from pyspark.sql import functions as F

    return (
        li.hint("merge")
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("rev"),
        )
    )


def main() -> None:
    from etl_sh_design_spark.session import get_spark

    spark = get_spark(app_name="bucketing_probe", cpus=8, ui=True)
    spark.sparkContext.setLogLevel("ERROR")
    # AQE re-plans the merge hint into broadcast at small SF; disable
    # so both runs exercise the shuffle-vs-bucket contrast under test
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")

    import shutil

    spark.sql("DROP DATABASE IF EXISTS bprobe CASCADE")
    shutil.rmtree("/tmp/bprobe_db", ignore_errors=True)
    spark.sql("CREATE DATABASE IF NOT EXISTS bprobe LOCATION '/tmp/bprobe_db'")
    li.write.mode("overwrite").bucketBy(16, "l_orderkey").sortBy(
        "l_orderkey"
    ).saveAsTable("bprobe.li_b")
    o.write.mode("overwrite").bucketBy(16, "o_orderkey").sortBy(
        "o_orderkey"
    ).saveAsTable("bprobe.o_b")

    rows = []
    for tag, (a, b) in {
        "plain parquet": (li, o),
        "bucketed(16)": (spark.table("bprobe.li_b"), spark.table("bprobe.o_b")),
    }.items():
        best, sw_delta = None, None
        for _ in range(3):
            sw0 = shuffle_write_bytes(spark)
            t0 = time.perf_counter()
            q3_join(a, b).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            sw = shuffle_write_bytes(spark) - sw0
            if best is None or dt < best:
                best, sw_delta = dt, sw
        rows.append((tag, best, sw_delta))

    print("\n| layout | q3-join best-of-3 sec | shuffle-write MB |")
    print("|---|---|---|")
    for tag, dt, sw in rows:
        print(f"| {tag} | {dt:.2f} | {sw / 1e6:.1f} |")
    spark.sql("DROP DATABASE IF EXISTS bprobe CASCADE")


if __name__ == "__main__":
    main()
