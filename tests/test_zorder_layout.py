"""Z-order layout golden: after write_zordered, parquet footer min/max
stats must be tight enough to prune — the on-disk proof of the
zorder_layout scale claim."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from etl_sh_design_spark.registry import _t
from etl_sh_design_spark.sources.io import write_zordered
from tests.conftest import SF_SMOKE

_Z = (
    "aggregate(sequence(0, 7), 0L, (acc, i) -> acc"
    " + shiftleft(shiftright(ix, i) & 1L, 2 * i)"
    " + shiftleft(shiftright(iy, i) & 1L, 2 * i + 1))"
)


def _file_ranges(path, col):
    out = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        rg0 = md.row_group(0)
        idx = next(
            j for j in range(rg0.num_columns) if rg0.column(j).path_in_schema == col
        )
        stats = [md.row_group(i).column(idx).statistics for i in range(md.num_row_groups)]
        out.append((min(s.min for s in stats), max(s.max for s in stats)))
    return out


def test_zordered_files_have_tight_stats(spark, tmp_path):
    e = _t(spark, SF_SMOKE, "events").select(
        F.col("user_id").alias("ix"), (F.col("event_id") % 256).alias("iy")
    )
    z = e.select("ix", "iy", F.expr(_Z).alias("zval"))
    path = str(tmp_path / "zsorted")
    write_zordered(z, path, "zval", n_files=8)

    ranges = _file_ranges(path, "zval")
    assert len(ranges) >= 4
    # files must be pairwise non-overlapping in z (range partitioning)
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
    # and the typical file's z-span must be a fraction of the global
    # span, so a z-range predicate prunes most files from footer stats
    # (range partitioning equalizes ROW COUNTS, so a sparse tail region
    # can make one file's span wide — the median is the right claim)
    glo = min(lo for lo, _ in ranges)
    ghi = max(hi for _, hi in ranges)
    spans = sorted(hi - lo for lo, hi in ranges)
    assert spans[len(spans) // 2] < (ghi - glo) / 4
