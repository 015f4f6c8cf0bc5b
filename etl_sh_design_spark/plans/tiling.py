"""Dee tiling pipeline — the Spark re-expression of `Dee.populate`
(reference ETL.py:555-715 semantics; SURVEY.md §2.10 U4, §3.1 stage 4).

Stages (all declarative DataFrame ops — no UDFs anywhere):

1. U4  grid generation: slot rows x columns from `range` cross join
2. P18 annulus containment: corner-radius checks -> 'yes'/'maybe'/'no'
3. J3  blocked-region overlap: rectangle-overlap predicate vs a
       broadcast table of exclusion rectangles (the reference uses
       shapely polygons; axis-aligned rectangles keep the predicate in
       whole-stage codegen AND make the whole pipeline SQL-expressible)
4. W6  neighbor rule: a 'maybe' slot is kept only if its outward
       neighbor (ix+1) in the same row is fully available
5. W5  gaps-and-islands: contiguous available runs per row, with the
       reference's TWO-PASS fallback (ETL.py:646-668): a row whose
       maybe-led run cannot be covered by a 7-board is re-tiled under
       the stricter yes-only filter (runs_two_pass_from)
6. U2  partition lookup join: run length -> readout-board flavors
7.     placement: running-sum window positions each board in its run

Scale: every stage is a narrow transform or a bins/rows-sized shuffle;
the blocked-geometry join is a broadcast; windows partition by row.
Tiling a billion-slot grid would shuffle only on (row) — fine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_sh_design_spark.operators.partition import PARTITION_LOOKUP_SQL, partition_lookup

# slot grid: right half-dee, rows of module slots
N_ROWS, N_COLS = 22, 27
SLOT_W, SLOT_H = 43.0, 56.5  # x-extent, y-extent per slot (mm)
R_INNER, R_OUTER = 315.0, 1185.0

# blocked exclusion rectangles (nose, feedthrough, attachment) —
# simplified axis-aligned stand-ins for dee_geometry.py:60-132
BLOCKED = [
    ("nose", 0.0, 130.0, -70.0, 70.0),
    ("feedthrough", 0.0, 1185.0, 590.0, 650.0),
    ("attachment", 860.0, 960.0, -720.0, -620.0),
]

BLOCKED_SQL = (
    "SELECT * FROM (VALUES "
    + ", ".join(f"('{k}', {a!r}::DOUBLE, {b!r}::DOUBLE, {c!r}::DOUBLE, {d!r}::DOUBLE)" for k, a, b, c, d in BLOCKED)
    + ") AS blocked(kind, bx1, bx2, by1, by2)"
)


def slots(spark: SparkSession) -> DataFrame:
    """U4 + P18 + J3 + W6: the slot table with availability state."""
    grid = (
        spark.range(N_ROWS * N_COLS)
        .withColumn("iy", (F.col("id") / N_COLS).cast("int"))
        .withColumn("ix", (F.col("id") % N_COLS).cast("int"))
        .withColumn("x1", F.col("ix").cast("double") * SLOT_W)
        .withColumn("x2", F.col("x1") + SLOT_W)
        .withColumn("y1", (F.col("iy").cast("double") - N_ROWS / 2.0) * SLOT_H)
        .withColumn("y2", F.col("y1") + SLOT_H)
    )
    rmax = F.sqrt(
        F.greatest(F.col("x1") ** 2, F.col("x2") ** 2)
        + F.greatest(F.col("y1") ** 2, F.col("y2") ** 2)
    )
    rmin = F.sqrt(
        F.least(F.col("x1") ** 2, F.col("x2") ** 2)
        + F.least(F.col("y1") ** 2, F.col("y2") ** 2)
    )
    rcen = F.sqrt(((F.col("x1") + F.col("x2")) / 2) ** 2 + ((F.col("y1") + F.col("y2")) / 2) ** 2)

    blocked = F.broadcast(
        slots_blocked_table(spark)
    )
    overlap = (
        (F.col("x1") < F.col("bx2"))
        & (F.col("bx1") < F.col("x2"))
        & (F.col("y1") < F.col("by2"))
        & (F.col("by1") < F.col("y2"))
    )
    n_blocked = (
        grid.join(blocked, overlap, "left")
        .groupBy("iy", "ix", "x1", "x2", "y1", "y2")
        .agg(F.count("kind").alias("n_overlaps"))
    )

    state = (
        F.when((rmax >= R_OUTER) | (F.col("n_overlaps") > 0), "no")
        .when(rmin > R_INNER, "yes")
        .when(rcen > R_INNER, "maybe")
        .otherwise("no")
    )
    st = n_blocked.withColumn("state", state)
    w = W.partitionBy("iy").orderBy("ix")
    return st.withColumn(
        "available",
        (F.col("state") == "yes")
        | ((F.col("state") == "maybe") & (F.lead("state").over(w) == "yes")),
    ).select("iy", "ix", "x1", "x2", "y1", "y2", "state", "available")


def slots_blocked_table(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        BLOCKED, "kind STRING, bx1 DOUBLE, bx2 DOUBLE, by1 DOUBLE, by2 DOUBLE"
    )


def _runs_from(s: DataFrame) -> DataFrame:
    """W5 gaps-and-islands over a pre-filtered slot table, keeping the
    state of each run's first slot (needed by the W6 fallback rule)."""
    w = W.partitionBy("iy").orderBy("ix")
    return (
        s.withColumn("island", F.col("ix") - F.row_number().over(w))
        .groupBy("iy", "island")
        .agg(
            F.min("ix").alias("start_ix"),
            F.count(F.lit(1)).alias("n_slots"),
            F.min_by("state", "ix").alias("first_state"),
        )
        .select("iy", "start_ix", "n_slots", "first_state")
    )


def runs_two_pass_from(s: DataFrame, pl: DataFrame) -> DataFrame:
    """W6 two-pass fallback over an arbitrary slot table
    (reference ETL.py:646-668): pass 1 builds runs over all available
    slots ('yes' + surviving 'maybe'); a ROW fails validation if any of
    its runs starts with a 'maybe' slot whose partition leads with a
    flavor != 7 (getPartition returns largest-first, so ordinal 1 is
    the largest board — a maybe-led run must be covered by a 7-board).
    Failed rows are re-tiled under the stricter yes-only filter.

    Everything is row-key-partitioned DataFrame ops: two
    gaps-and-islands passes, a broadcast lookup join, and an anti/semi
    row split — no collect, no global shuffle; scales with |rows|."""
    pass1 = _runs_from(s.filter(F.col("available")))
    first_flavor = pl.filter(F.col("ordinal") == 1).select(
        "n", F.col("flavor").alias("first_flavor")
    )
    failed_rows = (
        pass1.join(F.broadcast(first_flavor), pass1.n_slots == first_flavor.n, "left")
        .filter((F.col("first_state") == "maybe") & (F.col("first_flavor") != 7))
        .select("iy")
        .distinct()
    )
    kept = pass1.join(failed_rows, "iy", "left_anti")
    redone = _runs_from(s.filter(F.col("state") == "yes")).join(
        F.broadcast(failed_rows), "iy", "left_semi"
    )
    return kept.unionByName(redone).select("iy", "start_ix", "n_slots")


def runs(spark: SparkSession) -> DataFrame:
    """W5 + W6: contiguous available runs per row with the two-pass
    fallback -> (iy, start_ix, n_slots)."""
    return runs_two_pass_from(slots(spark), partition_lookup(spark))


def supermodules(spark: SparkSession) -> DataFrame:
    """U2 + placement: flavors per run with board start offsets ->
    (iy, start_ix, n_slots, ordinal, flavor, sm_start, covered)."""
    r = runs(spark)
    pl = F.broadcast(partition_lookup(spark))
    j = r.join(pl, r.n_slots == pl.n, "inner")
    w = (
        W.partitionBy("iy", "start_ix")
        .orderBy("ordinal")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return j.select(
        "iy",
        "start_ix",
        "n_slots",
        "ordinal",
        "flavor",
        "covered",
        (F.col("start_ix") + F.coalesce(F.sum("flavor").over(w), F.lit(0))).cast("int").alias("sm_start"),
    )


def flavor_counts(spark: SparkSession) -> DataFrame:
    """A6: boards per flavor, x4 mirror factor (half-dee -> 4 faces)."""
    return (
        supermodules(spark)
        .groupBy("flavor")
        .agg((F.count(F.lit(1)) * 4).alias("n_boards_detector"))
    )


# ------------------------------------------------------------- oracle SQL
def _slots_sql() -> str:
    return f"""
grid AS (
  SELECT iy, ix,
         CAST(ix AS DOUBLE) * {SLOT_W!r} AS x1,
         CAST(ix AS DOUBLE) * {SLOT_W!r} + {SLOT_W!r} AS x2,
         (CAST(iy AS DOUBLE) - {N_ROWS / 2.0!r}) * {SLOT_H!r} AS y1,
         (CAST(iy AS DOUBLE) - {N_ROWS / 2.0!r}) * {SLOT_H!r} + {SLOT_H!r} AS y2
  FROM (SELECT CAST(floor(id / {N_COLS}) AS INT) AS iy, CAST(id % {N_COLS} AS INT) AS ix
        FROM (SELECT CAST(range AS BIGINT) AS id FROM range(0, {N_ROWS * N_COLS})))
),
blocked AS ({BLOCKED_SQL}),
novl AS (
  SELECT g.iy, g.ix, g.x1, g.x2, g.y1, g.y2, count(b.kind) AS n_overlaps
  FROM grid g LEFT JOIN blocked b
    ON g.x1 < b.bx2 AND b.bx1 < g.x2 AND g.y1 < b.by2 AND b.by1 < g.y2
  GROUP BY 1, 2, 3, 4, 5, 6
),
staged AS (
  SELECT iy, ix, x1, x2, y1, y2,
         CASE WHEN sqrt(greatest(x1*x1, x2*x2) + greatest(y1*y1, y2*y2)) >= {R_OUTER!r}
                   OR n_overlaps > 0 THEN 'no'
              WHEN sqrt(least(x1*x1, x2*x2) + least(y1*y1, y2*y2)) > {R_INNER!r} THEN 'yes'
              WHEN sqrt(((x1+x2)/2)*((x1+x2)/2) + ((y1+y2)/2)*((y1+y2)/2)) > {R_INNER!r} THEN 'maybe'
              ELSE 'no' END AS state
  FROM novl
),
slots AS (
  SELECT iy, ix, x1, x2, y1, y2, state,
         (state = 'yes' OR (state = 'maybe'
            AND lead(state) OVER (PARTITION BY iy ORDER BY ix) = 'yes')) AS available
  FROM staged
)
"""


SLOTS_SQL = "WITH " + _slots_sql() + " SELECT iy, ix, state, coalesce(available, FALSE) AS available FROM slots"

RUNS_CTE = (
    _slots_sql()
    + f""",
avail AS (SELECT iy, ix, state FROM slots WHERE available),
isl AS (
  SELECT iy, ix, state,
         ix - row_number() OVER (PARTITION BY iy ORDER BY ix) AS island
  FROM avail
),
runs1 AS (
  SELECT iy, CAST(min(ix) AS INT) AS start_ix, count(*) AS n_slots,
         min_by(state, ix) AS first_state
  FROM isl GROUP BY iy, island
),
pl_first AS (SELECT n, flavor FROM ({PARTITION_LOOKUP_SQL}) WHERE ordinal = 1),
failed_rows AS (
  SELECT DISTINCT r.iy
  FROM runs1 r LEFT JOIN pl_first p ON r.n_slots = p.n
  WHERE r.first_state = 'maybe' AND p.flavor != 7
),
strict_isl AS (
  SELECT iy, ix,
         ix - row_number() OVER (PARTITION BY iy ORDER BY ix) AS island
  FROM slots WHERE state = 'yes'
),
strict_runs AS (
  SELECT iy, CAST(min(ix) AS INT) AS start_ix, count(*) AS n_slots
  FROM strict_isl GROUP BY iy, island
),
runs AS (
  SELECT iy, start_ix, n_slots FROM runs1
  WHERE iy NOT IN (SELECT iy FROM failed_rows)
  UNION ALL
  SELECT iy, start_ix, n_slots FROM strict_runs
  WHERE iy IN (SELECT iy FROM failed_rows)
)
"""
)

RUNS_SQL = "WITH " + RUNS_CTE + " SELECT iy, start_ix, n_slots FROM runs"

SUPERMODULES_SQL = (
    "WITH "
    + RUNS_CTE
    + f""",
pl AS ({PARTITION_LOOKUP_SQL}),
sm AS (
  SELECT r.iy, r.start_ix, r.n_slots, p.ordinal, p.flavor, p.covered,
         CAST(r.start_ix + coalesce(sum(p.flavor) OVER (
             PARTITION BY r.iy, r.start_ix ORDER BY p.ordinal
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT) AS sm_start
  FROM runs r JOIN pl p ON r.n_slots = p.n
)
SELECT iy, start_ix, n_slots, ordinal, flavor, covered, sm_start FROM sm
"""
)

FLAVOR_COUNTS_SQL = (
    "WITH "
    + RUNS_CTE
    + f""",
pl AS ({PARTITION_LOOKUP_SQL})
SELECT p.flavor, count(*) * 4 AS n_boards_detector
FROM runs r JOIN pl p ON r.n_slots = p.n
GROUP BY 1
"""
)
