#!/usr/bin/env python
"""Replay EVERY registered query against its DuckDB oracle at a
chosen SF under a VANILLA SparkSession (the external driver's
environment — none of session.py's tuned configs), with the same
compare the driver uses: row count, sorted column names,
order-insensitive stringified values, plus the dtype-class parity
gate from tests/test_driver_contract.py.

Usage: python tools/verify_all.py [SF_DIR] [name-substring ...]
Prints one line per query and a final summary; exit 1 on any
mismatch. ~4 min for the full registry at sf0.01.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from tests.test_driver_contract import _assert_dtype_parity, _normalize

    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf = args[0] if args else "/root/testdata/sf0.01"
    only = args[1:]

    builder = SparkSession.builder.master("local[8]")  # vanilla
    # SPARK_GRAFT_VERIFY_AQE_OFF=1: the plan-strategy-independence
    # sweep (results must not depend on adaptive re-planning) —
    # round-6 ran this ad-hoc; the flag makes it reproducible
    if os.environ.get("SPARK_GRAFT_VERIFY_AQE_OFF"):
        builder = builder.config("spark.sql.adaptive.enabled", "false")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    names = [n for n in sorted(qs) if not only or any(o in n for o in only)]
    bad: list[str] = []
    for name in names:
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, sf)
            srows = [tuple(r) for r in sdf.collect()]
            sql = osql.get(name)
            if sql is None:
                print(f"  rows-only  {name}: {len(srows)} rows "
                      f"({time.perf_counter() - t0:.1f}s)")
                continue
            _assert_dtype_parity(name, sdf, con, sql)
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            ok = (
                sorted(sdf.columns) == sorted(dcols)
                and len(srows) == len(drows)
                and _normalize(srows, sdf.columns) == _normalize(drows, dcols)
            )
        except Exception as exc:  # noqa: BLE001 — report and continue
            ok = False
            print(f"  ERROR      {name}: {exc}")
        if ok:
            print(f"  ok         {name} ({time.perf_counter() - t0:.1f}s)")
        else:
            bad.append(name)
            print(f"  MISMATCH   {name}")
    print(f"\n{len(names) - len(bad)}/{len(names)} match at {sf}"
          + (f"; FAILING: {bad}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
