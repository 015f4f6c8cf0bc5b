"""Study entry points mirroring the reference's CLI scripts
(SURVEY.md §3.2: `bias_voltage.py` and `occupancy.py` semantics) — a
user of the reference runs one function and gets the same family of
result tables, as DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_sh_design_spark import datagen
from etl_sh_design_spark.functions import physics
from etl_sh_design_spark.operators.bv_grouping import (
    bv_totals,
    find_bv_config,
    greedy_bv_groups,
    modules_from_sensors,
)
from etl_sh_design_spark.operators.histogram import BinSpec, histogram1d


def bias_voltage_study(spark: SparkSession) -> dict[str, DataFrame]:
    """§3.2 stage 4a: module reconstruction -> vendor split -> greedy
    BV grouping (W4) + per-SM config search (W7) -> totals (A9) +
    current histogram (A10)."""
    sensors = datagen.sensors(spark)
    modules = modules_from_sensors(sensors).cache()
    groups = greedy_bv_groups(modules)
    configs = find_bv_config(modules)
    current_hist = histogram1d(modules, "current", BinSpec(20, 0.0, 4.0))
    return {
        "modules": modules,
        "bv_groups": groups,
        "bv_configs": configs,
        "bv_totals": bv_totals(groups),
        "current_histogram": current_hist,
    }


def occupancy_study(spark: SparkSession) -> dict[str, DataFrame]:
    """§3.2 stage 4b: per-sensor occupancy (P11) -> per-module means
    (A3) -> occupancy histogram (A10) -> bandwidth totals (A14)."""
    sensors = datagen.sensors(spark).withColumn(
        "r", F.sqrt(F.col("x") * F.col("x") + F.col("y") * F.col("y"))
    )
    occ = sensors.withColumn("occupancy", physics.occupancy("r"))
    per_layer = occ.groupBy("layer").agg(
        F.count(F.lit(1)).alias("n_sensors"),
        F.avg("occupancy").alias("mean_occ"),
    )
    spec = BinSpec(24, 0.0, 1.2)
    hist = histogram1d(occ, "occupancy", spec)
    bw_const = 40 * 256 / 100.0 * 16 * 750e3 / 1e12
    bandwidth = hist.agg(
        F.sum(F.col("bin_center") * bw_const * F.col("cnt")).alias("total_bandwidth_tbs")
    )
    return {
        "sensor_occupancy": occ,
        "per_layer_means": per_layer,
        "occupancy_histogram": hist,
        "bandwidth_totals": bandwidth,
    }
