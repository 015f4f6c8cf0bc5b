#!/usr/bin/env python
"""Interleaved quiet timing for registered queries (round 13).

This host takes multi-minute invisible co-tenancy bursts (measured in
round 12: single entries inflating 5-40x with ~0% /proc/stat steal), so
single sweeps are not comparable. The honest protocol is: run the
entries ALTERNATING in ONE session, >= 3 reps each, and compare MINIMA
— a burst then lands on some reps of every entry instead of on one
entry's only sample.

Usage:
    python tools/quiet_ab.py [SF_DIR] [--reps N] name [name ...]

Prints one line per entry: min, all samples (rep order), and the
second-best-minus-best spread. Rep 0 pays codegen/JIT; the reported
minimum is the warm floor. Timed action is the noop sink (guide §1.4),
same as bench.py. Family memos are NOT cleared between reps — this
tool measures the query tails exactly as the bench sweep does; use
SPARK_GRAFT_BENCH_ONLY=<family entry> bench runs for build costs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    reps = 3
    if args and args[0] == "--reps":
        args.pop(0)
        reps = int(args.pop(0))
    names = args
    if not names:
        print("usage: quiet_ab.py [SF_DIR] [--reps N] name [name ...]")
        return 2

    from etl_sh_design_spark import registry
    from etl_sh_design_spark.session import get_spark

    spark = get_spark(app_name="quiet_ab")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.queries()
    missing = [n for n in names if n not in queries]
    if missing:
        print(f"unknown queries: {missing}")
        return 2

    samples: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"quiet_ab rep{rep}: {name}")
            t0 = time.perf_counter()
            try:
                df = queries[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                samples[name].append(round(time.perf_counter() - t0, 3))
            except Exception as exc:  # keep going; mark the rep
                samples[name].append(float("nan"))
                print(f"quiet_ab: {name} rep {rep} FAILED: {exc}", file=sys.stderr)
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()
    print(f"# sf_dir={sf_dir} reps={reps} cpus={os.environ.get('SPARK_GRAFT_CPUS')}")
    for name in names:
        vals = sorted(v for v in samples[name] if v == v)
        if not vals:
            print(f"{name:40s} ALL-FAILED")
            continue
        spread = round(vals[1] - vals[0], 3) if len(vals) > 1 else -1.0
        print(
            f"{name:40s} min={vals[0]:7.3f} spread={spread:6.3f} "
            f"samples={samples[name]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
