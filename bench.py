#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from etl_sh_design_spark import registry
    from etl_sh_design_spark.session import get_spark

    spark = get_spark(app_name="bench")

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1)) if m else -1.0

    # warm the JVM (codegen, arrow, python workers) + parquet footers so
    # the first timed query doesn't absorb one-time startup costs
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    from etl_sh_design_spark.plans.acceptance import acceptance_profile

    acceptance_profile(spark, 1000).collect()
    spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).count()

    queries = registry.queries()
    timings: dict[str, float] = {}
    for name in sorted(queries):
        fn = queries[name]
        t0 = time.perf_counter()
        try:
            df = fn(spark, SF_DIR)
            n = df.count()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # keep the bench alive; flag the query
            timings[name] = -1.0
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "engine_headline_queries_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
