"""Bias-voltage grouping — the canonical stateful-scan operator
(SURVEY.md §2.5 W4, §2.10 U3; reference semantics bias_voltage.py:449-493,
dee_geometry.py:496-538 — no code copied).

The greedy scan (open a new group when the running current budget would
be exceeded OR the candidate's r_min falls below the breakdown curve of
the group head's r_max) resets on a data-dependent threshold, which a
SQL window cannot express — this is the engine's `applyInPandas`
island. Contract for scale: groups are per (layer, vendor) partitions
(small, bounded), everything heavy is pre-aggregated in DataFrame land
BEFORE entering pandas (SURVEY.md §4.2 item 3).
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_sh_design_spark import datagen
from etl_sh_design_spark.functions import physics

GROUP_SCHEMA = (
    "layer int, vendor string, group_id bigint, n_modules bigint, "
    "sum_current double, r_min double, r_max double"
)

# one breakdown curve per vendor (the 5 fC production rows of
# datagen.bv_curves: fbk_w13_5fc / hpk_split4_5fc, sensors.py:15,29)
CURVES = {"FBK": (435.93, -2251.2), "HPK": (526.14, -2792.0)}


def modules_from_sensors(sensors: DataFrame) -> DataFrame:
    """Derive the module table (2 sensors stacked in y) from the hot
    corner table: (layer, module_id, x, y, r_min, r_max, current, vendor).

    A2 per-module current rollup + P17 vendor split by min radius.
    """
    nxny = datagen.NX * datagen.NY
    s = (
        sensors.withColumn("rem", F.col("sensor_id") % nxny)
        .withColumn("ix", F.floor(F.col("rem") / datagen.NY))
        .withColumn("iy", F.col("rem") % datagen.NY)
        .withColumn("module_id", (F.col("layer") - 1) * nxny + F.col("ix") * datagen.NY + F.floor(F.col("iy") / 2))
        .withColumn("r", F.sqrt(F.col("x") ** 2 + F.col("y") ** 2))
        .withColumn("current", physics.sensor_current_at("r"))
    )
    mods = s.groupBy("layer", "module_id").agg(
        F.avg("x").alias("x"),
        F.avg("y").alias("y"),
        F.min("r").alias("r_min"),
        F.max("r").alias("r_max"),
        F.sum("current").alias("current"),
        F.count(F.lit(1)).alias("n_sensors"),
    )
    return mods.withColumn(
        "vendor", F.when(F.col("r_min") < 520.0, "FBK").otherwise("HPK")
    )


def _scan(pdf: pd.DataFrame) -> pd.DataFrame:
    """Greedy run-segmentation with running-sum reset (per layer+vendor
    group, executed in pandas — inherently sequential)."""
    layer = int(pdf["layer"].iloc[0])
    vendor = str(pdf["vendor"].iloc[0])
    a, b = CURVES[vendor]
    pdf = pdf.sort_values(["r_max", "module_id"], ascending=[False, True])

    rows = []
    gid = -1
    run_current = 0.0
    head_rmax = None
    limit = None
    n = 0
    g_rmin = g_rmax = None

    def flush():
        if n > 0:
            rows.append((layer, vendor, gid, n, run_current, g_rmin, g_rmax))

    for r_min, r_max, cur in zip(pdf["r_min"], pdf["r_max"], pdf["current"]):
        new_group = (
            head_rmax is None
            or run_current + cur > 20.0
            or r_min <= limit
        )
        if new_group:
            flush()
            gid += 1
            run_current = 0.0
            head_rmax = r_max
            limit = a * math.log(head_rmax) + b
            n = 0
            g_rmin, g_rmax = r_min, r_max
        run_current += cur
        n += 1
        g_rmin = min(g_rmin, r_min)
        g_rmax = max(g_rmax, r_max)
    flush()
    return pd.DataFrame(
        rows,
        columns=["layer", "vendor", "group_id", "n_modules", "sum_current", "r_min", "r_max"],
    )


def greedy_bv_groups(modules: DataFrame) -> DataFrame:
    """W4: per (layer, vendor) greedy BV grouping. Returns one row per
    BV group; invariant (golden test): sum_current <= 20 mA."""
    return (
        modules.select("layer", "vendor", "module_id", "r_min", "r_max", "current")
        .groupBy("layer", "vendor")
        .applyInPandas(_scan, GROUP_SCHEMA)
    )


SM_CONFIG_SCHEMA = (
    "layer int, band bigint, sm_ordinal bigint, seg_ordinal int, "
    "n_modules int, sum_current double, r_min double, r_max double"
)


def sm_assignments(modules: DataFrame, sm_size: int = 7) -> DataFrame:
    """Group modules into pseudo-supermodules: per (layer, y-band row),
    consecutive chunks of <= sm_size along x (reference SuperModule =
    one readout-board row, ETL.py:312-533 shape)."""
    from pyspark.sql import Window as W

    m = modules.withColumn("band", F.col("module_id") % datagen.NY)
    w = W.partitionBy("layer", "band").orderBy("x", "module_id")
    return m.withColumn(
        "sm_ordinal", F.floor((F.row_number().over(w) - 1) / sm_size)
    )


from functools import lru_cache


@lru_cache(maxsize=None)
def _segmentations(n: int) -> list[list[tuple[int, int]]]:
    """All consecutive-split segmentations of n ordered items, indexed
    by split mask (mask order = deterministic tie-break), ordered by
    segment count so the first valid hit wins the min-segments
    criterion early."""
    out = []
    for mask in range(1 << (n - 1)) if n > 1 else [0]:
        segs, start = [], 0
        for i in range(n - 1):
            if mask & (1 << i):
                segs.append((start, i + 1))
                start = i + 1
        segs.append((start, n))
        out.append((len(segs), mask, segs))
    out.sort(key=lambda t: (t[0], t[1]))
    return out


def _config_search_factory(budget: float):
    def _one_sm(layer: int, band: int, smo: int, pdf: pd.DataFrame, rows: list) -> None:
        """W7: exact search over consecutive-split configs of one SM
        (<= 7 modules -> <= 64 masks; ETL.py:423-493 semantics): pick
        the valid split with fewest segments, then the most
        current-balanced, then the lowest mask (deterministic).

        Currents are quantized to integer micro-amps up front
        (floor(c*1e6 + 0.5), matching SQL round-half-away on the
        bit-identical module currents), so the budget check, the
        balance tie-break, and the reported segment sums are exact
        integer arithmetic — which is what makes this search
        DuckDB-oracle-checkable instead of rows-only: raw float
        partial sums would knife-edge both the validity predicate and
        the balance comparison across engines."""
        pdf = pdf.sort_values(["r_max", "module_id"], ascending=[False, True])
        cur_micro = [int(math.floor(c * 1e6 + 0.5)) for c in pdf["current"]]
        rmin = list(pdf["r_min"])
        rmax = list(pdf["r_max"])
        n = len(cur_micro)
        budget_micro = int(math.floor(budget * 1e6 + 0.5))
        csum = [0]
        for c in cur_micro:
            csum.append(csum[-1] + c)
        limit_cache = {}
        vendor = pdf["vendor"].iloc[0]

        def seg_ok(a: int, b: int) -> bool:
            if csum[b] - csum[a] > budget_micro:
                return False
            rmx = max(rmax[a:b])
            if rmx not in limit_cache:
                limit_cache[rmx] = _curve_limit(vendor, rmx)
            return min(rmin[a:b]) > limit_cache[rmx]

        best_key, best_segs = None, None
        for n_segs, mask, segs in _segmentations(n):
            if best_key is not None and n_segs > best_key[0]:
                break  # sorted by segment count: no better split remains
            if not all(seg_ok(a, b) for a, b in segs):
                continue
            sums = [csum[b] - csum[a] for a, b in segs]
            key = (n_segs, max(sums) - min(sums), mask)
            if best_key is None or key < best_key:
                best_key, best_segs = key, segs
        if best_segs is None:  # no valid split: every module its own group
            best_segs = [(i, i + 1) for i in range(n)]
        rows.extend(
            (
                layer,
                band,
                smo,
                k,
                (b - a),
                (csum[b] - csum[a]) / 1e6,
                min(rmin[a:b]),
                max(rmax[a:b]),
            )
            for k, (a, b) in enumerate(best_segs)
        )

    def _config_search(pdf: pd.DataFrame) -> pd.DataFrame:
        """One (layer, band) row-batch: loop the per-SM exact search
        over the band's SM chunks. Batching ~6 SMs per pandas call
        (instead of one group per SM) cuts the Arrow/Python per-group
        overhead ~6x — the search itself is unchanged."""
        layer = int(pdf["layer"].iloc[0])
        band = int(pdf["band"].iloc[0])
        rows: list = []
        for smo, sub in pdf.groupby("sm_ordinal", sort=True):
            _one_sm(layer, band, int(smo), sub, rows)
        return pd.DataFrame(
            rows,
            columns=[
                "layer",
                "band",
                "sm_ordinal",
                "seg_ordinal",
                "n_modules",
                "sum_current",
                "r_min",
                "r_max",
            ],
        )

    return _config_search


def _curve_limit(vendor: str, r_max: float) -> float:
    a, b = CURVES[vendor]
    return a * math.log(r_max) + b


def find_bv_config(modules: DataFrame, budget: float = 5.0) -> DataFrame:
    """W7 BV config search per pseudo-supermodule (applyInPandas exact
    search over <= 2^6 consecutive splits)."""
    sm = sm_assignments(modules)
    # mapInPandas over an explicit hash-repartition instead of
    # groupBy().applyInPandas: the grouped-map's own exchange is
    # byte-tiny here, so AQE coalesces it to ONE partition and the
    # per-group Python search runs serially. The CPU cost is in the
    # pandas groups, not the bytes — pinning the partition count keeps
    # all cores busy; repartition(cols) guarantees each (layer, band)
    # lands whole in one partition, so grouping semantics are identical.
    n_part = sm.sparkSession.sparkContext.defaultParallelism
    search = _config_search_factory(budget)

    def run(batches):
        frames = list(batches)
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        if pdf.empty:
            return
        for _, sub in pdf.groupby(["layer", "band"], sort=True):
            yield search(sub)

    return (
        sm.select(
            "layer", "band", "sm_ordinal", "module_id", "vendor", "r_min", "r_max", "current"
        )
        .repartition(n_part, "layer", "band")
        .mapInPandas(run, SM_CONFIG_SCHEMA)
    )


def bv_totals(groups: DataFrame) -> DataFrame:
    """A9: per-vendor BV totals over the grouping result
    (bias_voltage.py:142-159 semantics).

    Cross-engine determinism: the RAW per-group double sums differ in
    last ULPs between engines (pandas sequential add vs the oracle's
    recursive-CTE add), so any quantization of the raw value can land
    on either side of a .5 boundary. The 6dp-rounded group currents,
    however, are proven bit-equal across engines (``bv_greedy_groups``
    hash-matches). So every output here is a function of that rounded
    value only: scale it to integer micro-amps (exact — a 6dp value
    times 1e6 is within ~1e-4 of an integer, nowhere near a tie) and
    sum bigints, which is also order-independent under Spark's
    nondeterministic partial-aggregation order.

    Semantics note: total_current is the sum of 6dp-quantized group
    currents, not round(sum(raw), 6) as the reference reports — a
    deliberate, documented deviation (<= 0.5 micro-amp per group)
    applied identically on both engines.
    """
    micro = F.round(F.round(F.col("sum_current"), 6) * 1e6).cast("bigint")
    return groups.groupBy("vendor").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n_modules").alias("n_modules"),
        F.round(F.sum(micro) / 1e6, 6).alias("total_current"),
        F.round(F.max(F.round("sum_current", 6)), 6).alias("max_group_current"),
    )
