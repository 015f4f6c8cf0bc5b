"""MERGE / upsert emulation (CDC pattern).

No Delta/Iceberg jars in this environment, so MERGE INTO is emulated
relationally: target rows not matched by updates (anti-join) U updated
rows U brand-new rows. The result is exactly what a MERGE whenMatched-
update / whenNotMatched-insert would produce; at scale both sides
shuffle once on the key (or zero times if bucketed on it —
tests/test_bucketing.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Upsert `updates` into `target` on `key` (update-wins)."""
    kept = target.join(updates.select(key), key, "left_anti")
    return kept.unionByName(updates)
