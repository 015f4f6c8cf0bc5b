"""Ad-hoc single-query oracle check at a chosen SF, mimicking the
driver's compare (rows, sorted-col names, normalized values, dtype
classes). Usage: python tools/check_one.py NAME [SF_DIR]"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from etl_sh_design_spark.session import get_spark
from tests.test_driver_contract import _assert_dtype_parity, _normalize

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    name = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="check-one", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    sdf = entrymod.queries()[name](spark, sf)
    sql = entrymod.oracle_sql().get(name)
    spark_rows = [tuple(r) for r in sdf.collect()]
    print(f"{name}: spark rows={len(spark_rows)}")
    if sql is None:
        print("rows-only query (no oracle)")
        return 0
    _assert_dtype_parity(name, sdf, con, sql)
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(sdf.columns) == sorted(duck_cols), (
        f"cols differ: {sorted(sdf.columns)} vs {sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"rowcount {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _normalize(spark_rows, sdf.columns)
    b = _normalize(duck_rows, duck_cols)
    bad = [(x, y) for x, y in zip(a, b) if x != y]
    print(f"value-diff rows: {len(bad)}")
    for x, y in bad[:3]:
        print(" spark:", x, "\n duck :", y)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
