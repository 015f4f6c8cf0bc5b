"""Layout-export ETL pipeline (SURVEY.md §3.3: TSV module centers ->
sensor-center YAML database; reference realistic_layout_export.ipynb
semantics).

Stages: S1 TSV scan (PERMISSIVE, corrupt quarantine) -> P3/P4 module
outline + per-module sensor centers (each module row carries two
sensors offset ±(gap/2 + sensor_w/2) in y) -> explode to sensor rows
-> assemble (disk, face) keys -> S4 YAML sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_sh_design_spark.sources import io as src

SENSOR_W = 21.6  # sensor y-extent within a module
SENSOR_GAP = 0.3  # inter-sensor gap


def modules_to_sensor_centers(modules: DataFrame) -> DataFrame:
    """Each module center (x, y) -> two sensor centers at
    y ± (gap + sensor_w) / 2 (module = 1x2 sensor stack)."""
    off = (SENSOR_GAP + SENSOR_W) / 2.0
    return modules.select(
        "module",
        "x",
        F.explode(F.array(F.col("y") - off, F.col("y") + off)).alias("y"),
    )


def export_layout(
    spark: SparkSession,
    tsv_paths: dict[tuple[str, str], str],
    yaml_out: str,
    layout: str = "new",
) -> DataFrame:
    """Full §3.3 pipeline. tsv_paths maps (disk, face) -> TSV path.
    Returns the assembled centers DataFrame (also written to YAML)."""
    parts = []
    for (disk, face), path in tsv_paths.items():
        clean, _bad = src.split_corrupt(src.read_face_tsv(spark, path))
        centers = modules_to_sensor_centers(clean).select(
            F.lit(layout).alias("layout"),
            F.lit(disk).alias("disk"),
            F.lit(face).alias("face"),
            "x",
            "y",
        )
        parts.append(centers)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    src.write_yaml_layout(out, yaml_out)
    return out
