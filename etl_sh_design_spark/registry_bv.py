"""Detector-study queries built on the stateful-scan operators:
module derivation (A1/A2/P17), greedy BV grouping (W4), totals (A9).

The greedy scan is not SQL-expressible (running-sum reset + head-
dependent curve — SURVEY.md §7.4), so these register WITHOUT oracle
SQL: the driver records rows-only checks, and golden invariants live in
tests/test_golden_invariants.py (20 mA budget, module-count
preservation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sh_design_spark import datagen
from etl_sh_design_spark.operators.bv_grouping import (
    bv_totals,
    greedy_bv_groups,
    modules_from_sensors,
)
from etl_sh_design_spark.registry import query


@query(
    "module_rollup",
    None,  # oracle added below via SQL on the fixture CTE
)
def q_module_rollup(spark, sf_dir):
    """A1/A2/P17: sensor->module rollup with min/max corner radius,
    summed current, vendor split."""
    mods = modules_from_sensors(datagen.sensors(spark))
    return mods.select(
        "layer",
        "module_id",
        F.round("r_min", 6).alias("r_min"),
        F.round("r_max", 6).alias("r_max"),
        F.round("current", 6).alias("current"),
        "n_sensors",
        "vendor",
    )


# module_rollup IS SQL-expressible — attach the oracle explicitly.
from etl_sh_design_spark.functions import physics  # noqa: E402
from etl_sh_design_spark.registry import ORACLE  # noqa: E402

_NXNY = datagen.NX * datagen.NY
ORACLE["module_rollup"] = f"""
WITH sensors AS ({datagen.SENSORS_SQL}),
s AS (
  SELECT layer, sensor_id, x, y,
         CAST(layer - 1 AS BIGINT) * {_NXNY}
           + CAST(floor((sensor_id % {_NXNY}) / {datagen.NY}) AS BIGINT) * {datagen.NY}
           + CAST(floor(((sensor_id % {_NXNY}) % {datagen.NY}) / 2) AS BIGINT) AS module_id,
         sqrt(x*x + y*y) AS r
  FROM sensors
)
SELECT layer, module_id,
       round(min(r), 6) AS r_min,
       round(max(r), 6) AS r_max,
       round(sum({physics.CURRENT_SQL.format(r='r')}), 6) AS current,
       count(*) AS n_sensors,
       CASE WHEN min(r) < 520.0e0 THEN 'FBK' ELSE 'HPK' END AS vendor
FROM s
GROUP BY 1, 2
"""


@query("bv_greedy_groups", None)
def q_bv_greedy(spark, sf_dir):
    """W4 greedy BV grouping (applyInPandas stateful scan) — one row
    per BV group per (layer, vendor)."""
    groups = greedy_bv_groups(modules_from_sensors(datagen.sensors(spark)))
    return groups.select(
        "layer",
        "vendor",
        "group_id",
        "n_modules",
        F.round("sum_current", 6).alias("sum_current"),
        F.round("r_min", 6).alias("r_min"),
        F.round("r_max", 6).alias("r_max"),
    )


@query("bv_totals", None)
def q_bv_totals(spark, sf_dir):
    """A9 per-vendor totals over the W4 grouping result."""
    return bv_totals(greedy_bv_groups(modules_from_sensors(datagen.sensors(spark))))
