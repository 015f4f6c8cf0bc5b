#!/usr/bin/env python
"""Self-determinism sweep: run every registered query TWICE in one
session (and once more after a cache clear) and compare the sorted
stringified results with themselves.

The oracle replay proves Spark == DuckDB on one execution; this
proves Spark == Spark across executions — the check that catches
unstable `collect_list` orderings, `any_value`/`first` dependence on
partitioning, float reductions that escaped the rounding discipline,
and accidental reliance on a cached intermediate.

Usage: python tools/determinism_check.py [SF_DIR] [name-substring ...]
Exit 1 on any query whose two runs differ.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import __spark_entry__ as entrymod
    from etl_sh_design_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf = args[0] if args else "/root/testdata/sf0.001"
    only = args[1:]

    spark = get_spark(app_name="determinism_check", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = [n for n in sorted(qs) if not only or any(o in n for o in only)]
    bad: list[str] = []
    for name in names:
        t0 = time.perf_counter()
        try:
            a = sorted(tuple(str(x) for x in r) for r in qs[name](spark, sf).collect())
            b = sorted(tuple(str(x) for x in r) for r in qs[name](spark, sf).collect())
            spark.catalog.clearCache()
            c = sorted(tuple(str(x) for x in r) for r in qs[name](spark, sf).collect())
        except Exception as exc:  # surface, keep sweeping
            print(f"  ERROR      {name}: {exc}")
            bad.append(name)
            continue
        if a == b == c:
            print(f"  ok         {name} ({time.perf_counter() - t0:.1f}s)")
        else:
            where = "run2" if a != b else "post-clearCache"
            print(f"  NONDET     {name}: differs on {where}")
            bad.append(name)
    print(f"\n{len(names) - len(bad)}/{len(names)} deterministic")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
