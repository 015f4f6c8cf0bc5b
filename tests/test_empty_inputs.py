"""Empty-input robustness sweep: every registered query must PLAN and
EXECUTE against zero-row copies of all ten driver tables without
raising — the degenerate input the oracle gate never exercises (it
always runs at sf>=0.001). Catches eager `.first()`/`np.vstack`
crashes, ANSI divide-by-zero, and 1-based `element_at` on empty
arrays (all three found and fixed by this sweep in round 6).
"""

from __future__ import annotations

import os

import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("empty_sf"))
    src = "/root/testdata/sf0.001"
    for t in TABLES:
        (
            spark.read.parquet(os.path.join(src, f"{t}.parquet"))
            .limit(0)
            .write.mode("overwrite")
            .parquet(os.path.join(dst, f"{t}.parquet"))
        )
    return dst


def test_every_query_survives_empty_tables(spark, empty_sf):
    from etl_sh_design_spark.registry import queries

    fails = []
    for name, fn in sorted(queries().items()):
        try:
            fn(spark, empty_sf).limit(5).collect()
        except Exception as e:  # noqa: BLE001 - collecting all failures
            fails.append((name, str(e).split("\n")[0][:120]))
    assert fails == []
