#!/usr/bin/env python
"""Driver-order simulation, reproducible form of the closing sweep:
one VANILLA SparkSession (exactly what the external driver builds),
entry() smoke first, then the driver's 50-query window PREFIX in its
exact registry order, each compared against its DuckDB oracle with
the driver-style normalized compare (sorted columns, stringified
order-insensitive values). This catches ordering-dependent breakage
(session-state leaks between queries, memo cross-talk) that the
alphabetical verify_all sweep cannot.

Usage: python tools/driver_sim.py [SF_DIR] [N_PREFIX]
Exit 1 on any mismatch.
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
    from tests.test_driver_contract import _normalize

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_prefix = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    spark = SparkSession.builder.master("local[8]").getOrCreate()  # vanilla
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    n_entry = entrymod.entry(spark).count()
    print(f"  entry() smoke: {n_entry} rows")
    # > 0, not >= 0 (which count() can never fail): the paired pytest
    # smoke expects non-empty output, so the sim should too (ADVICE r8)
    assert n_entry > 0

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    window = list(qs)[:n_prefix]
    bad = []
    for i, name in enumerate(window):
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf)
            scols = sdf.columns
            srows = sdf.collect()
            if name not in osql:
                print(f"  rows-only   [{i+1:2}/{len(window)}] {name} ({len(srows)} rows)")
                continue
            dres = con.execute(osql[name])
            dcols = [c[0] for c in dres.description]
            drows = dres.fetchall()
            a = _normalize([tuple(r) for r in srows], scols)
            b = _normalize(drows, dcols)
            ok = sorted(c.lower() for c in scols) == sorted(
                c.lower() for c in dcols
            ) and a == b
        except Exception as exc:
            ok, s, d = False, repr(exc), None
        dt = time.time() - t0
        print(f"  {'ok' if ok else 'MISMATCH':8} [{i+1:2}/{len(window)}] {name} ({dt:.1f}s)")
        if not ok:
            bad.append(name)
    print(f"\n{len(window) - len(bad)}/{len(window)} window-prefix green at {sf}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
