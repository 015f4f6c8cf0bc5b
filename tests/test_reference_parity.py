"""Source-scanner parity against the reference repo's OWN shipped
artifacts (read-only): the four `data/Face N.txt` TSVs and the two
`layouts/database_*.yaml` databases. Synthetic fixtures can't prove
S1/S3 parity — the real files carry the quirks (trailing pad columns,
!!python/tuple YAML tags, an actual `#REF!` spreadsheet-error row)
that the scanners must absorb the way the reference's loaders do."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_sh_design_spark.sources.io import (
    read_face_tsv,
    read_yaml_layout,
    split_corrupt,
    write_yaml_layout,
)

_REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(f"{_REF}/data"), reason="reference repo not mounted"
)

# (file, clean rows, corrupt rows) — Faces 2/4 each ship ONE row whose
# x/y are the literal spreadsheet error '#REF!' (module 754/same slot);
# PERMISSIVE capture must quarantine exactly that row, not drop it.
_FACES = [
    ("Face 1.txt", 902, 0),
    ("Face 2.txt", 893, 1),
    ("Face 3.txt", 902, 0),
    ("Face 4.txt", 893, 1),
]


@pytest.mark.parametrize("fname,n_clean,n_bad", _FACES)
def test_reference_face_tsv_scan(spark, fname, n_clean, n_bad):
    clean, bad = split_corrupt(read_face_tsv(spark, f"{_REF}/data/{fname}"))
    assert clean.count() == n_clean
    assert bad.count() == n_bad
    if n_bad:
        assert "#REF!" in bad.collect()[0][0]
    stats = clean.agg(
        F.countDistinct("z").alias("nz"),
        F.min("module").alias("lo"),
        F.max("module").alias("hi"),
        F.max(F.abs("x")).alias("maxx"),
        F.max(F.abs("y")).alias("maxy"),
    ).collect()[0]
    # one face = one plane; modules number 1..N contiguously except the
    # quarantined row; coordinates stay inside the half-disk envelope
    assert stats["nz"] == 1
    assert stats["lo"] == 1
    assert stats["hi"] == n_clean + n_bad
    assert stats["maxx"] < 1300 and stats["maxy"] < 1300


@pytest.mark.parametrize(
    "fname,n_rows",
    [("database_TDR.yaml", 8088), ("database_new.yaml", 7180)],
)
def test_reference_yaml_layout_scan(spark, fname, n_rows):
    df = read_yaml_layout(spark, f"{_REF}/layouts/{fname}")
    assert df.count() == n_rows
    assert set(df.columns) == {"layout", "disk", "face", "x", "y"}
    faces = {r[0] for r in df.select("face").distinct().collect()}
    assert {"front", "back"} <= faces


def test_reference_yaml_roundtrip(spark, tmp_path):
    """Read the real TDR database, write it through the S4 sink, read
    it back: identical (layout, disk, face, x, y) multiset."""
    src = read_yaml_layout(spark, f"{_REF}/layouts/database_TDR.yaml")
    out = f"{tmp_path}/tdr_roundtrip.yaml"
    write_yaml_layout(src, out)
    back = read_yaml_layout(spark, out)
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
