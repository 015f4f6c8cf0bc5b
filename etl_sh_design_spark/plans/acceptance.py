"""Flagship pipeline: Monte-Carlo geometric acceptance (SURVEY.md §3.1
stages 8-9; reference dee_geometry.py:570-700).

Logical plan (all declarative — Catalyst chooses broadcast for the
dimension sides, the per-ray aggregation is the only real shuffle):

    rays(n)  ──crossJoin──  layers(4)          # P14 projection
        │ px = z_mm*tan(theta)*cos(phi), py = ...
        ▼
    inner join sensors ON layer + containment  # J1, broadcast or binned
        ▼
    groupBy event_id -> n = countDistinct(layer)   # J2
        ▼
    rays left-join hits, n -> coalesce 0
        ▼
    groupBy eta_bin -> count / efficiency / mean n / mean t   # A10-A12, J7, P13

Default strategy is the spatially-binned equi-join (J1 scale path):
it cuts per-ray candidate rectangles from ~4k to ~4 and measured 2x
faster than the broadcast nested predicate at 1M rays (6.5s vs 13s on
local[32]); both strategies are proven result-identical in
tests/test_plans.py. The rays side never shuffles under either — the
only wide exchange is the bins-sized final aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_sh_design_spark import datagen
from etl_sh_design_spark.operators.containment import (
    binned_containment_join,
    containment_join,
)
from etl_sh_design_spark.operators.histogram import BinSpec

ETA_BINS = BinSpec(20, datagen.ETA_LO, datagen.ETA_HI)
T_COEFF = 45.0  # ps; dee_geometry.py:608


def ray_hits(spark: SparkSession, n_rays: int, strategy: str = "binned") -> DataFrame:
    """Per-ray hit counts: (event_id, eta, n). n = #layers whose sensor
    active area contains the projected ray point (0..4)."""
    rays = datagen.rays(spark, n_rays)
    layers = datagen.layers(spark)
    sensors = datagen.sensors(spark)

    proj = (
        rays.crossJoin(F.broadcast(layers))
        .withColumn("px", F.col("z_mm") * F.col("tanth") * F.col("cphi"))
        .withColumn("py", F.col("z_mm") * F.col("tanth") * F.col("sphi"))
        .select("event_id", "layer", "px", "py")
    )
    if strategy == "binned":
        # cell >= max rect extent (42.5mm in x) so each rect spans <=2 cells/axis
        hits = binned_containment_join(proj, sensors, cell=50.0, extra_keys=["layer"])
    else:
        hits = proj.join(
            F.broadcast(sensors),
            (proj["layer"] == sensors["layer"])
            & (sensors["ax1"] < proj["px"])
            & (proj["px"] < sensors["ax2"])
            & (sensors["ay1"] < proj["py"])
            & (proj["py"] < sensors["ay2"]),
            "inner",
        ).drop(sensors["layer"])
    n_per_event = hits.groupBy("event_id").agg(F.countDistinct("layer").alias("n"))
    return (
        rays.select("event_id", "eta")
        .join(n_per_event, "event_id", "left")
        .fillna({"n": 0})
    )


def acceptance_profile(
    spark: SparkSession, n_rays: int, strategy: str = "binned"
) -> DataFrame:
    """Flagship result: efficiency + mean hit count + mean time
    resolution per eta bin. All averages are exact-integer sums /
    counts except mean_t (rounded to absorb float-order drift)."""
    per_ray = ray_hits(spark, n_rays, strategy)
    return (
        per_ray.groupBy(ETA_BINS.bin_of("eta").alias("eta_bin"))
        .agg(
            F.count(F.lit(1)).alias("n_rays"),
            F.round(F.avg((F.col("n") > 0).cast("double")), 6).alias("eff"),
            F.round(F.avg(F.col("n").cast("double")), 6).alias("mean_n"),
            F.round(
                F.avg(F.when(F.col("n") > 0, T_COEFF / F.sqrt(F.col("n")))), 6
            ).alias("mean_t"),
        )
    )


def mc_sanity_probe(
    spark: SparkSession, n_rays: int, min_hits: int = 3, strategy: str = "binned"
) -> DataFrame:
    """MC sanity re-probe (reference dee_geometry.py:712-810): take the
    FIRST ray with n >= min_hits hits (the reference picks the first
    v.n>2 vector), re-project it onto every layer, and re-count the
    sensors whose active area contains each projected point — the
    debugging query that confirms high-multiplicity events are real
    geometry, not bookkeeping.

    One row per layer: (event_id, layer, px, py, n_sensors, hit).
    The probe id is a 1-row broadcast; the re-projection re-runs the
    SAME containment predicate as the flagship join, so a bookkeeping
    bug would show as hit=true on a layer with n_sensors=0 (or vice
    versa)."""
    per_ray = ray_hits(spark, n_rays, strategy)
    probe_id = (
        per_ray.filter(F.col("n") >= min_hits)
        .agg(F.min("event_id").alias("event_id"))
    )
    rays = datagen.rays(spark, n_rays).join(F.broadcast(probe_id), "event_id")
    sensors = datagen.sensors(spark)
    proj = (
        rays.crossJoin(F.broadcast(datagen.layers(spark)))
        .withColumn("px", F.col("z_mm") * F.col("tanth") * F.col("cphi"))
        .withColumn("py", F.col("z_mm") * F.col("tanth") * F.col("sphi"))
        .select("event_id", "layer", "px", "py")
    )
    probed = proj.join(
        F.broadcast(sensors),
        (proj["layer"] == sensors["layer"])
        & (sensors["ax1"] < proj["px"])
        & (proj["px"] < sensors["ax2"])
        & (sensors["ay1"] < proj["py"])
        & (proj["py"] < sensors["ay2"]),
        "left",
    )
    return (
        probed.groupBy(proj["event_id"], proj["layer"], "px", "py")
        .agg(F.count(sensors["sensor_id"]).alias("n_sensors"))
        .select(
            "event_id",
            "layer",
            F.round("px", 6).alias("px"),
            F.round("py", 6).alias("py"),
            "n_sensors",
            (F.col("n_sensors") > 0).alias("hit"),
        )
    )


def mc_sanity_probe_sql(n_rays: int, min_hits: int = 3) -> str:
    return (
        _hits_cte(n_rays)
        + f""",
probe AS (SELECT min(event_id) AS event_id FROM per_ray WHERE n >= {min_hits}),
probe_proj AS (
  SELECT p.event_id, p.layer, p.px, p.py
  FROM proj p JOIN probe USING (event_id)
)
SELECT pp.event_id, pp.layer,
       round(pp.px, 6) AS px, round(pp.py, 6) AS py,
       count(s.sensor_id) AS n_sensors,
       count(s.sensor_id) > 0 AS hit
FROM probe_proj pp
LEFT JOIN sensors s
  ON s.layer = pp.layer
 AND s.ax1 < pp.px AND pp.px < s.ax2
 AND s.ay1 < pp.py AND pp.py < s.ay2
GROUP BY 1, 2, pp.px, pp.py
"""
    )


def hit_count_histogram(spark: SparkSession, n_rays: int) -> DataFrame:
    """A10 on the MC result: histogram of n (0..4) — the reference's
    `Hist1D(nHits, "5,-0.5,4.5")` (example.ipynb cell 19)."""
    return (
        ray_hits(spark, n_rays)
        .groupBy(F.col("n").cast("bigint").alias("n"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ------------------------------------------------------------- oracle SQL
def _hits_cte(n_rays: int) -> str:
    return f"""
WITH layers AS ({datagen.LAYERS_SQL}),
sensors AS ({datagen.SENSORS_SQL}),
rays AS ({datagen.rays_sql(n_rays)}),
proj AS (
  SELECT r.event_id, l.layer,
         l.z_mm * r.tanth * r.cphi AS px,
         l.z_mm * r.tanth * r.sphi AS py
  FROM rays r CROSS JOIN layers l
),
hits AS (
  SELECT p.event_id, count(DISTINCT p.layer) AS n
  FROM proj p
  JOIN sensors s
    ON s.layer = p.layer
   AND s.ax1 < p.px AND p.px < s.ax2
   AND s.ay1 < p.py AND p.py < s.ay2
  GROUP BY p.event_id
),
per_ray AS (
  SELECT r.event_id, r.eta, coalesce(h.n, 0) AS n
  FROM rays r LEFT JOIN hits h USING (event_id)
)
"""


def acceptance_profile_sql(n_rays: int) -> str:
    b = ETA_BINS
    return (
        _hits_cte(n_rays)
        + f"""
SELECT {b.bin_sql('eta')} AS eta_bin,
       count(*) AS n_rays,
       round(avg(CASE WHEN n > 0 THEN 1.0 ELSE 0.0 END), 6) AS eff,
       round(avg(CAST(n AS DOUBLE)), 6) AS mean_n,
       round(avg(CASE WHEN n > 0 THEN {T_COEFF} / sqrt(n) END), 6) AS mean_t
FROM per_ray
GROUP BY 1
"""
    )


def hit_count_histogram_sql(n_rays: int) -> str:
    return (
        _hits_cte(n_rays)
        + "SELECT CAST(n AS BIGINT) AS n, count(*) AS cnt FROM per_ray GROUP BY 1"
    )
