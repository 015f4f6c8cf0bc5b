"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`etl_sh_design_spark.registry` — the engine's
query/oracle registry. The driver runs ``entry(spark)`` as a smoke
check, then each ``queries()[name]`` at sf=0.01 against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_sh_design_spark import registry
from etl_sh_design_spark.plans import acceptance

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: MC geometric-acceptance efficiency profile
    (SURVEY.md §7.1) — rays -> layer projection -> containment join ->
    hit counts -> binned efficiency/mean-n/mean-t profile."""
    return acceptance.acceptance_profile(spark, n_rays=20_000)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted -> rows-only check)."""
    return registry.oracle_sql()
