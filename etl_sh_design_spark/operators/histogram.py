"""Histogram / profile / efficiency operators (SURVEY.md §2.4 A10-A16, J7).

The reference fills yahist/hist histograms eagerly
(bias_voltage.py:272-283, dee_geometry.py:616-699); here a histogram is
a groupBy on a computed bin index — a single partial+final aggregation,
shuffle size = number of bins (tiny) regardless of input scale.

Bin spec mirrors the reference's "nbins,lo,hi" strings.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class BinSpec:
    """Regular binning: nbins in [lo, hi); out-of-range rows are
    DROPPED by histogram1d/2d/profile (via ``in_range``), not clipped.
    ``bin_of`` alone yields out-of-range bin indices (<0 or >=nbins)
    for such rows — always pair it with ``in_range``."""

    nbins: int
    lo: float
    hi: float

    @property
    def width(self) -> float:
        return (self.hi - self.lo) / self.nbins

    def bin_of(self, col: str | Column) -> Column:
        c = F.col(col) if isinstance(col, str) else col
        return F.floor((c - self.lo) / self.width).cast("bigint")

    def center_of(self, bin_col: str | Column) -> Column:
        b = F.col(bin_col) if isinstance(bin_col, str) else bin_col
        return self.lo + (b.cast("double") + 0.5) * self.width

    def in_range(self, col: str | Column) -> Column:
        c = F.col(col) if isinstance(col, str) else col
        return (c >= self.lo) & (c < self.hi)

    @classmethod
    def parse(cls, spec: str) -> "BinSpec":
        """Parse the reference's '10,0,1' bin-spec string."""
        n, lo, hi = spec.split(",")
        return cls(int(n), float(lo), float(hi))

    # SQL fragments for the DuckDB oracle
    def bin_sql(self, expr: str) -> str:
        return f"CAST(floor(({expr} - {self.lo}) / {self.width}) AS BIGINT)"

    def center_sql(self, bin_expr: str) -> str:
        return f"({self.lo} + (CAST({bin_expr} AS DOUBLE) + 0.5) * {self.width})"

    def range_sql(self, expr: str) -> str:
        return f"({expr} >= {self.lo} AND {expr} < {self.hi})"


def histogram1d(df: DataFrame, col: str, spec: BinSpec, weight: str | None = None) -> DataFrame:
    """A10: 1-D histogram -> (bin, bin_center, cnt [, wsum])."""
    out = (
        df.filter(spec.in_range(col))
        .groupBy(spec.bin_of(col).alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            *([F.sum(weight).alias("wsum")] if weight else []),
        )
        .withColumn("bin_center", spec.center_of("bin"))
    )
    cols = ["bin", "bin_center", "cnt"] + (["wsum"] if weight else [])
    return out.select(*cols)


def histogram2d(df: DataFrame, xcol: str, xspec: BinSpec, ycol: str, yspec: BinSpec) -> DataFrame:
    """A11: 2-D histogram -> (bin_x, bin_y, cnt)."""
    return (
        df.filter(xspec.in_range(xcol) & yspec.in_range(ycol))
        .groupBy(
            xspec.bin_of(xcol).alias("bin_x"),
            yspec.bin_of(ycol).alias("bin_y"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def profile(df: DataFrame, bin_cols: list, value: str) -> DataFrame:
    """A12: mean of `value` per bin -> (bins..., cnt, mean_<value>).

    `bin_cols` is a list of (name, Column) pairs or plain column names.
    Marginalization = re-profile with fewer bin columns (or use
    `profile_rollup`).
    """
    keys = [c if isinstance(c, Column) else F.col(c) for c in bin_cols]
    names = [c._jc.toString() if isinstance(c, Column) else c for c in bin_cols]
    return df.groupBy(*[k.alias(n) for k, n in zip(keys, names)]).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.avg(value).alias(f"mean_{value}"),
    )


def profile_rollup(df: DataFrame, bin_cols: list[str], value: str) -> DataFrame:
    """A12 marginalization via ROLLUP: profiles at every prefix of
    `bin_cols` in one pass (grouping-set aggregation — one shuffle)."""
    return (
        df.rollup(*bin_cols)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.avg(value).alias(f"mean_{value}"),
            F.grouping_id().alias("grouping_level"),
        )
    )


def efficiency(
    num: DataFrame, den: DataFrame, on: list[str], n_col: str = "cnt"
) -> DataFrame:
    """J7: per-bin ratio of two histograms with binomial errors
    (example.ipynb cell16-17 `num.divide(den, binomial=True)`).

    Joins numerator to denominator on the bin keys (broadcast — both
    sides are bin-sized), eff = n/d, err = sqrt(eff*(1-eff)/d).
    """
    n = num.select(*on, F.col(n_col).alias("_n"))
    d = den.select(*on, F.col(n_col).alias("_d"))
    eff = F.col("_n") / F.col("_d")
    return (
        d.join(F.broadcast(n), on, "left")
        .fillna({"_n": 0})
        .select(
            *on,
            (eff).alias("eff"),
            F.sqrt(eff * (1 - eff) / F.col("_d")).alias("err"),
            F.col("_n").alias("n_num"),
            F.col("_d").alias("n_den"),
        )
    )


def histogram_mean(hist: DataFrame, center: str = "bin_center", cnt: str = "cnt") -> DataFrame:
    """A16: mean from binned data = sum(center*cnt)/sum(cnt)."""
    return hist.agg(
        (F.sum(F.col(center) * F.col(cnt)) / F.sum(cnt)).alias("hist_mean")
    )
