"""Tiling-pipeline queries (SURVEY.md §2.10 U4, §3.1 stage 4) — the
whole `tile_dee` chain is declarative, so every stage has a full
DuckDB oracle: slots (U4+P18+J3+W6), runs (W5), supermodule placement
(U2 + window placement), flavor counts (A6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sh_design_spark.operators.bv_grouping import find_bv_config, modules_from_sensors
from etl_sh_design_spark.plans import tiling
from etl_sh_design_spark.registry import query
from etl_sh_design_spark import datagen


@query("tile_slots", tiling.SLOTS_SQL)
def q_tile_slots(spark, sf_dir):
    """Slot availability states after containment + blocked-region +
    neighbor rules."""
    return tiling.slots(spark).select(
        "iy", "ix", "state", F.coalesce("available", F.lit(False)).alias("available")
    )


@query("tile_runs", tiling.RUNS_SQL)
def q_tile_runs(spark, sf_dir):
    """W5 gaps-and-islands: contiguous available runs per slot row."""
    return tiling.runs(spark)


@query("tile_supermodules", tiling.SUPERMODULES_SQL)
def q_tile_supermodules(spark, sf_dir):
    """U2 partition join + running-sum placement of readout boards."""
    return tiling.supermodules(spark)


@query("tile_flavor_counts", tiling.FLAVOR_COUNTS_SQL)
def q_tile_flavor_counts(spark, sf_dir):
    """A6 per-flavor board counts x4 mirror factor."""
    return tiling.flavor_counts(spark)


@query("bv_config_search", None)  # W7: not SQL-expressible (exact search)
def q_bv_config(spark, sf_dir):
    """W7 per-supermodule BV config exact search (applyInPandas)."""
    cfg = find_bv_config(modules_from_sensors(datagen.sensors(spark)))
    return cfg.select(
        "layer",
        "band",
        "sm_ordinal",
        "seg_ordinal",
        "n_modules",
        F.round("sum_current", 6).alias("sum_current"),
        F.round("r_min", 6).alias("r_min"),
        F.round("r_max", 6).alias("r_max"),
    )
