"""Mimic the driver's verify: for every registered query with an
oracle, run the Spark pipeline AND the DuckDB SQL on the same tables
(sf0.001 — small, fast) and compare row count, sorted column names, and
order-insensitive values. This is the local gate for the real t2 check
at sf0.01."""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE


def _normalize(rows, colnames):
    """Sort columns by name, then rows; stringify floats at full repr
    (values are expected to be bit-identical or pre-rounded)."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                # deliberately NOT normalizing -0.0: a sign-of-zero
                # difference between engines is a real hash hazard
                # (order-dependent cancellation) and must fail here
                vals.append(f"{v:.10g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(name, spark, duck):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_SMOKE)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        # rows-only check, like the driver's weaker path
        assert len(spark_rows) >= 0
        return

    res = duck.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count differs"
    a = _normalize(spark_rows, spark_cols)
    b = _normalize(duck_rows, duck_cols)
    ndiff = sum(1 for x, y in zip(a, b) if x != y)
    assert ndiff == 0, f"{name}: {ndiff}/{len(a)} rows differ; first: " + str(
        next(((x, y) for x, y in zip(a, b) if x != y), None)
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert not math.isnan(rows[0]["eff"])


def test_driver_window_is_priority_list():
    """Regression guard: the external driver verifies the FIRST 50
    entries of queries() — that prefix must stay exactly the curated
    rotation list (a silent reorder would quietly un-verify queries)."""
    from etl_sh_design_spark.registry import _DRIVER_WINDOW_PRIORITY

    names = list(entrymod.queries())
    assert names[: len(_DRIVER_WINDOW_PRIORITY)] == _DRIVER_WINDOW_PRIORITY
    assert len(_DRIVER_WINDOW_PRIORITY) == 50
