"""Scalar expression library — all JVM-side `pyspark.sql.functions`
compositions (whole-stage-codegen friendly); no Python UDFs here."""

from etl_sh_design_spark.functions import physics, text, transforms  # noqa: F401
