"""Coordinate / geometry scalar transforms (SURVEY.md §2.2 P1-P7, P13-P15).

All pure `F.*` column expressions — they stay inside whole-stage codegen,
which is the engine-level equivalent of the reference's NumPy
vectorization of the hot path (ETL.py:752-776).

Reference semantics:
- P1 forward transform: three_vector.__init__ ETL.py:54-62
- P2 inverse transform: three_vector.fromEtaPhi ETL.py:64-74
- P3/P4 outline + active area: ETL.py:90-120
- P13 time resolution: dee_geometry.py:608
- P14 ray -> layer projection: dee_geometry.py:599-601
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_spherical(df: DataFrame, x: str = "x", y: str = "y", z: str = "z") -> DataFrame:
    """P1: (x, y, z) -> r, theta, eta, phi."""
    r = F.sqrt(F.col(x) ** 2 + F.col(y) ** 2)
    theta = F.atan2(r, F.col(z))
    return (
        df.withColumn("r", r)
        .withColumn("theta", theta)
        .withColumn("eta", -F.log(F.tan(theta / 2)))
        .withColumn("phi", F.atan2(F.col(y), F.col(x)))
    )


def with_cartesian(df: DataFrame, eta: str = "eta", phi: str = "phi", z: str = "z") -> DataFrame:
    """P2: (eta, phi, z) -> theta, r, x, y."""
    theta = 2 * F.atan(F.exp(-F.col(eta)))
    r = F.col(z) * F.tan(theta)
    return (
        df.withColumn("theta", theta)
        .withColumn("r", r)
        .withColumn("x", r * F.cos(F.col(phi)))
        .withColumn("y", r * F.sin(F.col(phi)))
    )


def with_outline(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
    height: str = "height",
    width: str = "width",
) -> DataFrame:
    """P3: rectangle outline corners from center + dims.
    height spans x, width spans y (reference convention, ETL.py:90-107)."""
    return (
        df.withColumn("x1", F.col(x) - F.col(height) / 2)
        .withColumn("x2", F.col(x) + F.col(height) / 2)
        .withColumn("y1", F.col(y) - F.col(width) / 2)
        .withColumn("y2", F.col(y) + F.col(width) / 2)
    )


def with_active_area(df: DataFrame, deadspace: str = "deadspace") -> DataFrame:
    """P4: active-area corners = outline inset by deadspace (ETL.py:109-120).
    Requires x1/x2/y1/y2 (apply `with_outline` first)."""
    d = F.col(deadspace)
    return (
        df.withColumn("ax1", F.col("x1") + d)
        .withColumn("ax2", F.col("x2") - d)
        .withColumn("ay1", F.col("y1") + d)
        .withColumn("ay2", F.col("y2") - d)
    )


def active_area_size() -> Column:
    """P5: abs((ax2-ax1)*(ay2-ay1)) (ETL.py:122-123)."""
    return F.abs((F.col("ax2") - F.col("ax1")) * (F.col("ay2") - F.col("ay1")))


def translate(df: DataFrame, dx: float, dy: float, cols_x=("x", "x1", "x2", "ax1", "ax2"), cols_y=("y", "y1", "y2", "ay1", "ay2")) -> DataFrame:
    """P6: move_by — shift every geometry column present (ETL.py:125-135)."""
    for c in cols_x:
        if c in df.columns:
            df = df.withColumn(c, F.col(c) + dx)
    for c in cols_y:
        if c in df.columns:
            df = df.withColumn(c, F.col(c) + dy)
    return df


def mm_to_cm(col: str | Column) -> Column:
    """P7: unit scaling (ETL.py:195, 722)."""
    return (F.col(col) if isinstance(col, str) else col) / 10.0


def time_resolution(n: str | Column = "n", coeff: float = 45.0) -> Column:
    """P13: t = coeff / sqrt(n) ps (dee_geometry.py:54-55, 608)."""
    c = F.col(n) if isinstance(n, str) else n
    return F.when(c > 0, coeff / F.sqrt(c))


def project_to_layer(z_mm: str | Column = "z_mm") -> tuple[Column, Column]:
    """P14: ray (theta, phi) projected to a layer plane at z_mm.

    Returns (x_l, y_l) column expressions; expects `tanth`, `cphi`,
    `sphi` columns (precomputed once per ray — dee_geometry.py:599-601
    recomputes tan/cos per layer; hoisting them is the Spark-side CSE).
    """
    z = F.col(z_mm) if isinstance(z_mm, str) else z_mm
    return z * F.col("tanth") * F.col("cphi"), z * F.col("tanth") * F.col("sphi")
