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


def _slot_grid(spark: SparkSession) -> DataFrame:
    """U4: the raw slot grid (iy, ix, x1, x2, y1, y2)."""
    return (
        spark.range(N_ROWS * N_COLS)
        .withColumn("iy", (F.col("id") / N_COLS).cast("int"))
        .withColumn("ix", (F.col("id") % N_COLS).cast("int"))
        .withColumn("x1", F.col("ix").cast("double") * SLOT_W)
        .withColumn("x2", F.col("x1") + SLOT_W)
        .withColumn("y1", (F.col("iy").cast("double") - N_ROWS / 2.0) * SLOT_H)
        .withColumn("y2", F.col("y1") + SLOT_H)
    )


def _with_availability(n_blocked: DataFrame) -> DataFrame:
    """P18 radial classification + W6 neighbor rule over a slot table
    carrying `n_overlaps` (blocked-region hit count)."""
    rmax = F.sqrt(
        F.greatest(F.col("x1") ** 2, F.col("x2") ** 2)
        + F.greatest(F.col("y1") ** 2, F.col("y2") ** 2)
    )
    rmin = F.sqrt(
        F.least(F.col("x1") ** 2, F.col("x2") ** 2)
        + F.least(F.col("y1") ** 2, F.col("y2") ** 2)
    )
    rcen = F.sqrt(((F.col("x1") + F.col("x2")) / 2) ** 2 + ((F.col("y1") + F.col("y2")) / 2) ** 2)
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


# Session memos for the SYNTHETIC tiling chain (round 12): slots ->
# runs -> supermodules -> flavor_counts is re-derived by SIX registry
# queries (tile_slots / tile_runs / tile_supermodules /
# tile_flavor_counts / a5_slot_state_counts / j6_ordinal_join), each
# paying the full grid + blocked-overlap + windows + two-pass-runs
# chain (16-18 Exchange mentions per plan) over a dimension-sized
# (~3k-row) result. One localCheckpoint per table per session — same
# discipline as slots_real's _REAL_MEMO below and the dedup/PQ family
# memos; keyed on applicationId so every bench/oracle invocation
# recomputes from scratch. bench.py owns the build as its own timed
# tiling_family_shared entry.
_SYNTH_MEMO: dict[tuple, DataFrame] = {}


def _synth_memo(spark: SparkSession, name: str, build) -> DataFrame:
    key = (spark.sparkContext.applicationId, name)
    got = _SYNTH_MEMO.get(key)
    if got is None:
        got = build().localCheckpoint(eager=False)
        _SYNTH_MEMO[key] = got
    return got


def slots(spark: SparkSession) -> DataFrame:
    """U4 + P18 + J3 + W6: the slot table with availability state
    (session-memoized; see _SYNTH_MEMO)."""
    return _synth_memo(spark, "slots", lambda: _slots_build(spark))


def _slots_build(spark: SparkSession) -> DataFrame:
    grid = _slot_grid(spark)
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
    return _with_availability(n_blocked)


def slots_blocked_table(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        BLOCKED, "kind STRING, bx1 DOUBLE, bx2 DOUBLE, by1 DOUBLE, by2 DOUBLE"
    )


# =====================================================================
# REAL blocked geometry: the reference's actual 'updated'-layout
# nose / feedthrough / attachment shapes (dee_geometry.py:60-132 and
# the __main__ 'updated' branch, :240-260), built as driver-side
# vertex lists with pure math — no shapely dependency. The polygon
# path (J3/U1) runs the exact rect-polygon overlap via
# operators/polygon.py; the bbox path is its SQL-expressible
# axis-aligned over-approximation (every polygon-blocked slot is
# bbox-blocked, never the reverse — golden-pinned).
# =====================================================================

import math  # noqa: E402

ETL_OUTER = 1185.0  # dee_geometry.py:155
NOSE_R = 302.0      # minimum-size nose, dee_geometry.py:209
FEEDTHROUGH_X = 1120.0  # dee_geometry.py:158


def _rot_cw_translate(pts, angle_deg, dist):
    """shapely `translate(rotate(poly, -angle, origin=(0,0)),
    sin(a)*dist, cos(a)*dist)` in pure math: clockwise rotation by
    `angle_deg` about the origin, then a radial shift of `dist` along
    the angle direction (0 deg = +y, 90 deg = +x)."""
    th = math.radians(angle_deg)
    c, s = math.cos(th), math.sin(th)
    dx, dy = s * dist, c * dist
    return [(x * c + y * s + dx, -x * s + y * c + dy) for x, y in pts]


def _make_inner_attachment(angle, height, width, taper, inner):
    """dee_geometry.py:60-76: tapered quad hanging inward from the
    inner ring, rotated/translated to `angle`."""
    t = math.tan(math.radians(taper))
    pts = [
        (-width / 2, -height),
        (-width / 2 + height * t, 0),
        (width / 2 - height * t, 0),
        (width / 2, -height),
    ]
    return _rot_cw_translate(pts, angle, inner + height)


def _make_outer_attachment(angle, height=107.5, width=68.0, segments=24):
    """dee_geometry.py:78-93: rect with a semicircular cap (the
    shapely union of the rect and a buffer at its inner end),
    discretized: top edge + sides + the inward-pointing semicircle."""
    r = width / 2
    pts = [(-r, 0.0), (-r, -height)]
    # lower semicircle around (0, -height), from 180deg to 360deg
    for i in range(1, segments):
        a = math.pi + math.pi * i / segments
        pts.append((r * math.cos(a), -height + r * math.sin(a)))
    pts += [(r, -height), (r, 0.0)]
    return _rot_cw_translate(pts, angle, ETL_OUTER)


def _circle_polygon(radius, segments):
    return [
        (radius * math.cos(2 * math.pi * i / segments),
         radius * math.sin(2 * math.pi * i / segments))
        for i in range(segments)
    ]


_OUTER_ATT_ANGLES = (2.5, 68.0, 112.0, 177.5, -2.5, -68.0, -112.0, -177.5)


def reference_blocked_polygons(
    circle_segments: int = 64, layout: str = "updated"
) -> dict[str, list]:
    """A dee layout's blocked shapes as vertex lists (the reference's
    `--dee_layout` variants, dee_geometry.py:209-260):

    - 'updated': nose circle, feedthrough band, 4 taper-0 inner
      attachments at 0/90/180/270 deg (dee_geometry.py:246-260), 8
      outer attachments (rect+cap at +-2.5/68/112/177.5 deg).
    - 'baseline': the TAMALES baseline — 6 default tapered inner
      attachments at +-30/90/150 deg (height 84, width 88.5,
      taper 5.4, hung from r=336; dee_geometry.py:233-237), same 8
      outer attachments, nose circle, feedthrough band.
    - 'plain': no attachments at all (annulus + feedthrough only).
    """
    polys: dict[str, list] = {"nose": _circle_polygon(NOSE_R, circle_segments)}
    yft = math.sqrt(ETL_OUTER**2 - FEEDTHROUGH_X**2)
    polys["feedthrough"] = [
        (FEEDTHROUGH_X, yft), (ETL_OUTER, yft),
        (ETL_OUTER, -yft), (FEEDTHROUGH_X, -yft),
    ]
    if layout == "updated":
        for a in (0, 180):
            polys[f"inner_att_{a}"] = _make_inner_attachment(
                a, height=796.0 / 2 - NOSE_R, width=170.0, taper=0.0, inner=NOSE_R
            )
        for a in (90, 270):
            polys[f"inner_att_{a}"] = _make_inner_attachment(
                a, height=395.0 - NOSE_R, width=110.0, taper=0.0, inner=NOSE_R
            )
    elif layout == "baseline":
        for a in (30, 90, 150, -30, -90, -150):
            polys[f"inner_att_{a}"] = _make_inner_attachment(
                a, height=84.0, width=88.5, taper=5.4, inner=336.0
            )
    elif layout == "plain":
        pass
    else:
        raise ValueError(f"unknown layout {layout!r}")
    if layout != "plain":
        for a in _OUTER_ATT_ANGLES:
            polys[f"outer_att_{str(a).replace('-', 'm').replace('.', '_')}"] = (
                _make_outer_attachment(a)
            )
    return polys


def polygon_bboxes(polys: dict[str, list]) -> list[tuple]:
    """(kind, bx1, bx2, by1, by2) axis-aligned bounding boxes — the
    rectangle over-approximation and the SQL-expressible oracle twin
    of the polygon path."""
    return [
        (
            name,
            min(x for x, _ in verts),
            max(x for x, _ in verts),
            min(y for _, y in verts),
            max(y for _, y in verts),
        )
        for name, verts in polys.items()
    ]


# (applicationId, geometry, segments, layout) -> built slot DataFrame.
# Keyed on the JVM-side application id, NOT id(spark): a stopped
# session's CPython address can be reused by a new SparkSession, which
# would hand out DataFrames bound to a dead JVM (ADVICE r7). Rebuilt
# plans also mint fresh expression IDs, defeating the Janino compile
# cache — for this dimension-sized pipeline compile time IS the cost.
_REAL_MEMO: dict[tuple, DataFrame] = {}


def slots_real(
    spark: SparkSession,
    geometry: str = "polygon",
    circle_segments: int = 64,
    layout: str = "updated",
) -> DataFrame:
    """The slot table classified against the REAL 'updated' blocked
    geometry. geometry='polygon' runs the exact vectorized
    rect-polygon overlap (ONE Arrow-batched UDF over all shapes,
    map-only — no shuffle before the neighbor window); geometry='bbox'
    uses the bounding-box over-approximation (pure codegen,
    SQL-expressible). Everything downstream (radial states, neighbor
    rule) is shared with the stand-in path."""
    key = (spark.sparkContext.applicationId, geometry, circle_segments, layout)
    got = _REAL_MEMO.get(key)
    if got is not None:
        return got
    grid = _slot_grid(spark)
    polys = reference_blocked_polygons(circle_segments, layout)
    if geometry == "polygon":
        from etl_sh_design_spark.operators.polygon import rects_overlap_count

        n_blocked = rects_overlap_count(grid, polys)
    elif geometry == "bbox":
        bb = F.broadcast(
            spark.createDataFrame(
                polygon_bboxes(polys),
                "kind STRING, bx1 DOUBLE, bx2 DOUBLE, by1 DOUBLE, by2 DOUBLE",
            )
        )
        overlap = (
            (F.col("x1") < F.col("bx2"))
            & (F.col("bx1") < F.col("x2"))
            & (F.col("y1") < F.col("by2"))
            & (F.col("by1") < F.col("y2"))
        )
        n_blocked = (
            grid.join(bb, overlap, "left")
            .groupBy("iy", "ix", "x1", "x2", "y1", "y2")
            .agg(F.count("kind").alias("n_overlaps"))
        )
    else:
        raise ValueError(f"unknown geometry {geometry!r}")
    out = _with_availability(n_blocked)
    _REAL_MEMO[key] = out
    return out


# The EXACT approximation gap between the real polygons and their
# bounding boxes over the 594-slot stand-in grid: the bbox path
# OVERLAPS these 28 slots that the exact polygon path does not — the
# corners of the nose circle's bounding square and the inner corners
# of the outer-attachment caps at the disk rim. Strict one-way gap
# (no slot is polygon-overlapped but bbox-free). Two of the 28
# ((4,25) and (17,25)) are radially blocked anyway (slot rmax >=
# R_OUTER), so only 26 are visible as STATE differences — that
# 26-slot state diff is what tests/test_polygon_tiling.py pins
# against the Spark pipelines. Verified three independent ways:
# (a) tests/test_polygon_tiling.py re-derives this full 28-slot set
#     with the sequential golden's own scalar rect-overlap
#     implementation (tools/ref_tiling_golden.rect_overlaps_polygon —
#     different code path than the Arrow UDF),
# (b) dense point-grid sampling proves each state-visible slot is
#     outside every exact polygon, and
# (c) the strict-subset property is asserted over all 594 slots.
# This constant makes the polygon tiling SQL-expressible: oracle =
# bbox overlap counts with these slots corrected to unblocked
# (`real_polygon_slots_sql`).
POLY_FREE_BBOX_BLOCKED = {
    (2, 22), (4, 25), (5, 3), (5, 4), (5, 5), (5, 6), (5, 7),
    (6, 5), (6, 6), (6, 7), (7, 6), (7, 7), (8, 7),
    (9, 7), (12, 7), (13, 7), (14, 6), (14, 7),
    (15, 5), (15, 6), (15, 7), (16, 3), (16, 4),
    (16, 5), (16, 6), (16, 7), (17, 25), (19, 22),
}


def real_polygon_slots_sql() -> str:
    """Full-query oracle twin of `slots_real(geometry='polygon')`:
    the bbox slot CTE chain with the pinned 26-slot approximation gap
    (POLY_FREE_BBOX_BLOCKED) corrected back to unblocked before the
    state/availability stages. Because the bbox is a strict
    over-approximation, zeroing exactly the gap set reproduces the
    polygon path's n_overlaps>0 predicate for every slot."""
    fixes = ", ".join(f"({iy}, {ix})" for iy, ix in sorted(POLY_FREE_BBOX_BLOCKED))
    inner = _slots_sql(real_bbox_blocked_sql())
    # rename the bbox chain's novl -> novl_bbox, then re-point the
    # downstream `staged` CTE at the corrected counts
    inner = inner.replace("novl AS (", "novl_bbox AS (")
    corrected = f"""
poly_free AS (SELECT * FROM (VALUES {fixes}) AS pf(iy, ix)),
novl AS (
  SELECT b.iy, b.ix, b.x1, b.x2, b.y1, b.y2,
         CASE WHEN pf.iy IS NOT NULL THEN 0 ELSE b.n_overlaps END AS n_overlaps
  FROM novl_bbox b LEFT JOIN poly_free pf ON b.iy = pf.iy AND b.ix = pf.ix
),"""
    # splice the correction CTEs in right after novl_bbox (i.e. before
    # `staged AS (`)
    return inner.replace("\nstaged AS (", corrected + "\nstaged AS (")


def real_bbox_blocked_sql() -> str:
    """VALUES table of the real-geometry bounding boxes (oracle twin
    of slots_real(geometry='bbox'))."""
    rows = polygon_bboxes(reference_blocked_polygons())
    return (
        "SELECT * FROM (VALUES "
        + ", ".join(
            f"('{k}', {a!r}::DOUBLE, {b!r}::DOUBLE, {c!r}::DOUBLE, {d!r}::DOUBLE)"
            for k, a, b, c, d in rows
        )
        + ") AS blocked(kind, bx1, bx2, by1, by2)"
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
    fallback -> (iy, start_ix, n_slots). Session-memoized (see
    _SYNTH_MEMO); the build itself reads the memoized slots table."""
    return _synth_memo(
        spark,
        "runs",
        lambda: runs_two_pass_from(slots(spark), partition_lookup(spark)),
    )


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
def _slots_sql(blocked_sql: str | None = None) -> str:
    """Slot-table CTE chain; `blocked_sql` overrides the blocked-region
    VALUES table (default: the BLOCKED stand-in rectangles)."""
    BLOCKED_SQL_ = blocked_sql if blocked_sql is not None else BLOCKED_SQL
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
blocked AS ({BLOCKED_SQL_}),
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
