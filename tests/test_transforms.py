"""Unit tests for the scalar transform layer (P1-P15)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_sh_design_spark.functions import transforms
from etl_sh_design_spark.operators.histogram import BinSpec


def test_spherical_roundtrip(spark):
    """P1 then P2 recovers (x, y) — forward/inverse consistency."""
    df = spark.createDataFrame(
        [(100.0, 200.0, 3000.0)], "x DOUBLE, y DOUBLE, z DOUBLE"
    )
    sph = transforms.with_spherical(df)
    back = transforms.with_cartesian(sph.select("eta", "phi", "z"))
    row = back.collect()[0]
    assert abs(row["x"] - 100.0) < 1e-9
    assert abs(row["y"] - 200.0) < 1e-9


def test_eta_theta_relation(spark):
    """eta = -ln(tan(theta/2)) at a known point."""
    df = (
        spark.createDataFrame([(1.0,)], "eta DOUBLE")
        .withColumn("z", F.lit(1000.0))
        .withColumn("phi", F.lit(0.0))
    )
    out = transforms.with_cartesian(df, z="z").collect()[0]
    assert abs(out["theta"] - 2 * math.atan(math.exp(-1.0))) < 1e-12


def test_outline_active_area_size(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0, 42.5, 22.0, 0.5)],
        "x DOUBLE, y DOUBLE, height DOUBLE, width DOUBLE, deadspace DOUBLE",
    )
    out = transforms.with_active_area(transforms.with_outline(df))
    row = out.withColumn("area", transforms.active_area_size()).collect()[0]
    assert row["x1"] == -21.25 and row["x2"] == 21.25
    assert row["ax1"] == -20.75 and row["ay2"] == 10.5
    assert abs(row["area"] - (41.5 * 21.0)) < 1e-9


def test_translate_and_scale(spark):
    df = spark.createDataFrame([(1.0, 2.0)], "x DOUBLE, y DOUBLE")
    out = transforms.translate(df, 10.0, -10.0).collect()[0]
    assert out["x"] == 11.0 and out["y"] == -8.0
    cm = df.select(transforms.mm_to_cm("x").alias("v")).collect()[0]["v"]
    assert cm == 0.1


def test_time_resolution_null_for_zero(spark):
    df = spark.createDataFrame([(0,), (4,)], "n INT")
    rows = df.select(transforms.time_resolution("n").alias("t")).collect()
    assert rows[0]["t"] is None
    assert abs(rows[1]["t"] - 22.5) < 1e-12


def test_binspec_parse_and_edges():
    spec = BinSpec.parse("10,0,1")
    assert spec.nbins == 10 and spec.lo == 0.0 and spec.hi == 1.0
    assert abs(spec.width - 0.1) < 1e-15
