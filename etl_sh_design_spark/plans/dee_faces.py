"""Faithful per-face REAL dee tiling — the Spark re-expression of the
reference's `Dee.populate` driven exactly as `dee_geometry.py.__main__`
drives it for the 'updated' layout, module size 'S' (the flagship
tiling whose counts the reference prints at dee_geometry.py:382-394).

Differs from plans/tiling.py (the stand-in slot pipeline kept for the
SQL-expressible §2 oracles) in three reference-fidelity respects:

1. The slot grid is the reference's: built from a 1-module SuperModule
   (module 43.10x56.50 + PB width 29.5 -> 43.10 x 86.0 slots), centered
   per face config (centerModule/centerPB x above/below,
   ETL.py:411-421, dee_geometry.py:346-351), edge_x=8, 29x29 slots.
2. Availability is the reference's 8-corner annulus condition on the
   SM rect ('yes') or on module[0]'s rect only ('maybe' candidates,
   ETL.py:586-609), gated on polygon overlap with the real 'updated'
   geometry, plus the one-maybe-per-row sliding state machine
   (ETL.py:610-629) — expressed DECLARATIVELY (see below), not as a
   sequential scan.
3. face1 is the special first layer: r_inner=322 and shorter inner
   attachments (dee_geometry.py:244-277).

The sequential reference machine (one maybe per row, sliding outward)
reduces to a closed form over maximal chains of consecutive
module-only slots — proven equivalent by exhaustive property test
(tests/test_faces_tiling.py) and slot-for-slot against the sequential
golden (tools/ref_tiling_golden.py):

  * a chain directly preceded by a 'yes' slot qualifies only if its
    length >= 2 (the first chain slot burns on the prev-yes rule
    without consuming the row's maybe budget);
  * the FIRST qualifying chain in column order wins the row's single
    maybe, placed on its LAST slot (the slide moves it outward);
  * every other module-only slot is 'no'.

Plan shape / scale: grid generation and the annulus conditions are
whole-stage codegen; the polygon overlap flags are ONE Arrow-batched
pandas UDF per face (the polygon set is dimension-sized closure data);
the chain logic is two row-key windows + one broadcast-sized join —
everything shuffles on (face, iy) only, so a 1000x finer grid still
shuffles only row keys. Counting is a partition-lookup broadcast join
+ map-side combine aggregation.

Committed-output validation: the shared algorithm (grid + corner
conditions + partition + counting, no polygons) reproduces FIVE
committed reference notebook numbers exactly — see
tools/ref_tiling_golden.py docstring and tests/test_faces_tiling.py.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_sh_design_spark.operators.partition import (
    PARTITION_LOOKUP_SQL,
    partition_lookup,
)
from etl_sh_design_spark.operators.polygon import _ray_cast, _segment_intersects_rect

ETL_OUTER = 1185.0
NOSE_R = 302.0
FEEDTHROUGH_X = 1120.0
FEED_Y = math.sqrt(ETL_OUTER**2 - FEEDTHROUGH_X**2)

MOD_H, MOD_W = 43.10, 56.50  # 'S' module x/y extent (dee_geometry.py:316-319)
GAP = 0.5
PB_W, RB_W = 29.5, 56.5  # dee_geometry.py:337-339
SM_W = MOD_W + PB_W  # 86.0 — 1-module SuperModule y-extent
EDGE_X = 8.0  # dee_geometry.py:379
N_ROWS = int(2 * ETL_OUTER / SM_W) + 2  # 29 (ETL.py:569)
N_COLS = int(ETL_OUTER / (MOD_H + GAP)) + 2  # 29 (ETL.py:570)
COL_STEP = MOD_H + GAP
X0 = MOD_H / 2 + EDGE_X  # centerModule/centerPB both zero x1; + edge_x

# face -> (orientation, centering, r_inner); dee_geometry.py:346-362
FACE_CONFIGS = {
    "face1": ("above", "module", 322.0),
    "face2": ("above", "pb", 302.0),
    "face3": ("below", "module", 302.0),
    "face4": ("below", "pb", 302.0),
}


def face_y0(orientation: str, centering: str) -> float:
    """Grid-origin SM center y from SuperModule.centerModule/centerPB
    (ETL.py:411-421) applied to the 1-module SM."""
    if centering == "module":
        return SM_W / 2 - RB_W / 2 if orientation == "above" else SM_W / 2 - PB_W - RB_W / 2
    return -SM_W / 2 + PB_W / 2 if orientation == "above" else SM_W / 2 - PB_W / 2


def module_dy(orientation: str) -> float:
    """module[0] center offset from the SM center (ETL.py:340-344)."""
    return -PB_W / 2 if orientation == "above" else PB_W / 2


# ---------------------------------------------------------------- geometry
def circle_polygon(r: float, n: int = 64) -> list[tuple[float, float]]:
    """shapely Point.buffer(r) at default resolution 16 => inscribed
    64-gon with vertices on the axes."""
    return [
        (r * math.cos(2 * math.pi * i / n), r * math.sin(2 * math.pi * i / n))
        for i in range(n)
    ]


def rot_cw_translate(pts, angle_deg, dist):
    """rotate(poly, -angle, origin=(0,0)) then translate by
    (sin(a)*dist, cos(a)*dist) — dee_geometry.py:74-75, 91-92."""
    th = math.radians(angle_deg)
    c, s = math.cos(th), math.sin(th)
    dx, dy = s * dist, c * dist
    return [(x * c + y * s + dx, -x * s + y * c + dy) for x, y in pts]


def inner_attachment(angle: float, height: float, width: float) -> list:
    """Taper-0 inner attachment quad (dee_geometry.py:60-77), hung from
    r=302 on every face (dee_geometry.py:246-277 pass inner=302 even on
    the first face whose heights use r_inner_first=322)."""
    pts = [(-width / 2, -height), (-width / 2, 0.0), (width / 2, 0.0), (width / 2, -height)]
    return rot_cw_translate(pts, angle, NOSE_R + height)


def outer_attachment(angle: float, height: float = 107.5, width: float = 68.0) -> list:
    """Rect + semicircular cap (dee_geometry.py:79-94); the cap is
    shapely's 64-pt buffer circle, so the union outline carries the
    lower 32 segments of that 64-gon."""
    r = width / 2
    pts = [(-r, 0.0), (-r, -height)]
    for i in range(1, 32):
        a = math.pi + math.pi * i / 32
        pts.append((r * math.cos(a), -height + r * math.sin(a)))
    pts += [(r, -height), (r, 0.0)]
    return rot_cw_translate(pts, angle, ETL_OUTER)


OUTER_ATT_ANGLES = (2.5, 68.0, 112.0, 177.5, -2.5, -68.0, -112.0, -177.5)


def updated_layout_polygons(first: bool) -> dict[str, list]:
    """The 'updated'-layout overlap-tested polygon set for one face:
    nose + 4 inner + 8 outer attachments (dee_geometry.py:239-277).
    The outer ring + feedthrough band are handled analytically in the
    blocked-flag UDF; the degenerate `make_inner` ring (shell r=300
    with a larger hole) blocks nothing beyond r=302 and is omitted."""
    h02 = (796.0 / 2 - 322.0) if first else (796.0 / 2 - NOSE_R)
    h99 = (395.0 - 322.0) if first else (395.0 - NOSE_R)
    polys = {"nose": circle_polygon(NOSE_R)}
    for a in (0.0, 180.0):
        polys[f"inner_att_{int(a)}"] = inner_attachment(a, h02, 170.0)
    for a in (90.0, 270.0):
        polys[f"inner_att_{int(a)}"] = inner_attachment(a, h99, 110.0)
    for a in OUTER_ATT_ANGLES:
        key = "outer_att_" + str(a).replace("-", "m").replace(".", "_")
        polys[key] = outer_attachment(a)
    return polys


OUTER_64GON = circle_polygon(ETL_OUTER)


def _blocked_flag_udf(polys: dict[str, list], outer_ring: bool = True):
    """One Arrow-batched UDF computing the reference's overlaps(rect,
    dee_geo) for a whole rect batch: any attachment/nose polygon hit
    (corner-in-polygon or edge-through-rect), the outer ring (rect not
    fully inside the r=1185 64-gon — convex-hole containment is
    all-corners-inside), or the feedthrough band. The polygon set is
    tiny closure data shipped with the task."""
    poly_list = [np.asarray(v, dtype=float) for v in polys.values()]
    gon = OUTER_64GON

    @F.pandas_udf(T.BooleanType())
    def _blocked(ax: pd.Series, ay: pd.Series, bx: pd.Series, by: pd.Series) -> pd.Series:
        rx1, ry1 = ax.values.astype(float), ay.values.astype(float)
        rx2, ry2 = bx.values.astype(float), by.values.astype(float)
        if outer_ring:
            inside_outer = np.ones(len(rx1), dtype=bool)
            for cxs, cys in ((rx1, ry1), (rx1, ry2), (rx2, ry1), (rx2, ry2)):
                inside_outer &= _ray_cast(cxs, cys, gon)
            hit = ~inside_outer
            hit |= (
                (rx1 < ETL_OUTER) & (FEEDTHROUGH_X < rx2) & (ry1 < FEED_Y) & (-FEED_Y < ry2)
            )
        else:
            hit = np.zeros(len(rx1), dtype=bool)
        for verts in poly_list:
            vlist = [tuple(v) for v in verts]
            phit = np.zeros(len(rx1), dtype=bool)
            for cxs, cys in ((rx1, ry1), (rx1, ry2), (rx2, ry1), (rx2, ry2)):
                phit |= _ray_cast(cxs, cys, vlist)
            n = len(vlist)
            for i in range(n):
                x0, y0 = vlist[i]
                xe, ye = vlist[(i + 1) % n]
                phit |= _segment_intersects_rect(x0, y0, xe, ye, rx1, ry1, rx2, ry2)
            hit |= phit
        return pd.Series(hit)

    return _blocked


def _annulus_ok(x1, y1, x2, y2, r_in: float, r_out: float):
    """The reference's 8 strict corner conditions (ETL.py:586-593) as a
    codegen Column expression."""
    cond = F.lit(True)
    for cx, cy in ((x1, y1), (x1, y2), (x2, y1), (x2, y2)):
        d2 = cx * cx + cy * cy
        cond = cond & (d2 > r_in * r_in) & (d2 < r_out * r_out)
    return cond


# (application id,) -> persisted slot table segments. The slot
# pipeline feeds MANY downstream branches (chain windows, the two-pass
# runs split, totals/flavors/boards) — without materialization the
# Arrow polygon-flag stage re-executes once per branch per query
# (measured 15-29 s/query); with one lazy localCheckpoint it runs once
# per session (~1 s) and every consumer reads the 841-row result.
# Lazy (eager=False): no job at DataFrame-construction time
# (tests/test_lazy_construction.py).
# Keyed on the JVM-side applicationId, NOT id(spark): a stopped
# session's CPython address can be reused by a new SparkSession, which
# would hand stale DataFrames bound to a dead JVM out of the memo
# (ADVICE r7). applicationId is unique per SparkContext (in local mode
# `local-<launch millis>`), so stale entries can never collide; they
# are also evicted eagerly below to bound growth across restarts.
_SLOTS_MEMO: dict[str, list] = {}

# (application id, name) -> built DataFrame. Re-building these plans
# per call would mint fresh expression IDs, which changes the
# generated code TEXT and defeats the Janino compile cache — the
# dominant cost for these dimension-sized pipelines is compilation,
# not data.
_DF_MEMO: dict[tuple[str, str], DataFrame] = {}


def _session_key(spark: SparkSession) -> str:
    app_id = spark.sparkContext.applicationId
    # evict entries from dead sessions (different app id): a test
    # suite or long-lived service that restarts Spark would otherwise
    # accumulate unreachable JVM-bound plans here
    for d in (_SLOTS_MEMO, _DF_MEMO):
        for k in [k for k in d if (k if isinstance(k, str) else k[0]) != app_id]:
            del d[k]
    return app_id


def _memo_df(spark: SparkSession, name: str, build) -> DataFrame:
    key = (_session_key(spark), name)
    got = _DF_MEMO.get(key)
    if got is None:
        got = build()
        _DF_MEMO[key] = got
    return got


def all_face_slots(spark: SparkSession) -> DataFrame:
    """All four faces' slot tables, memoized per session behind one
    lazy localCheckpoint. Two plans only: face1 (special r_inner=322 +
    shorter attachments) and faces 2-4 together via the face-dim cross
    join — the per-plan cost here is Catalyst/Janino time, not data."""
    key = _session_key(spark)
    got = _SLOTS_MEMO.get(key)
    if got is not None:
        # a catalog.clearCache() (bench hygiene between queries) drops
        # the persist registrations; re-mark every memoized segment
        # lazily so consumers keep planning against the small cached
        # sub-plans (persist() runs no job — the next action
        # re-materializes once)
        from pyspark import StorageLevel

        for df in got:
            if df.storageLevel == StorageLevel.NONE:
                df.persist()
        return got[-1]
    registry: list[DataFrame] = []
    first = config_slots_plan(
        spark,
        face_label="face1",
        orientation=FACE_CONFIGS["face1"][0],
        centering=FACE_CONFIGS["face1"][1],
        r_inner=FACE_CONFIGS["face1"][2],
        polys=updated_layout_polygons(first=True),
        outer_ring=True,
        persist_registry=registry,
    )
    rest = config_slots_plan(
        spark,
        faces=[(f, ori, cen) for f, (ori, cen, _r) in FACE_CONFIGS.items() if f != "face1"],
        r_inner=FACE_CONFIGS["face2"][2],
        polys=updated_layout_polygons(first=False),
        outer_ring=True,
        persist_registry=registry,
    )
    # persist(), NOT localCheckpoint: even a lazy (eager=False)
    # checkpoint calls queryExecution.toRdd at build time, which
    # prepares the physical plan and pre-submits its broadcast-exchange
    # jobs — breaking the no-jobs-at-construction contract
    # (tests/test_lazy_construction.py). persist is fully lazy and
    # Catalyst substitutes the cached segment into every consumer.
    out = first.unionByName(rest).persist()
    registry.append(out)
    _SLOTS_MEMO[key] = registry
    return out


def face_slots(spark: SparkSession, face: str) -> DataFrame:
    """One face's 29x29 slot table with the reference availability
    state: (face, iy, ix, xc, yc, state, available)."""
    return all_face_slots(spark).filter(F.col("face") == face)


def config_slots_plan(
    spark: SparkSession,
    *,
    face_label: str | None = None,
    orientation: str | None = None,
    centering: str | None = None,
    faces: list[tuple[str, str, str]] | None = None,
    r_inner: float,
    r_outer: float = ETL_OUTER,
    mod_h: float = MOD_H,
    mod_w: float = MOD_W,
    gap: float = GAP,
    pb_w: float = PB_W,
    rb_w: float = RB_W,
    edge_x: float = EDGE_X,
    polys: dict[str, list] | None = None,
    outer_ring: bool = False,
    with_maybe: bool = True,
    persist_registry: list | None = None,
) -> DataFrame:
    """Dee.populate slot grids for an arbitrary configuration — the
    generalized form behind `face_slots`. Pass either one face
    (face_label/orientation/centering) or several at once via
    `faces=[(label, orientation, centering), ...]`: multiple faces run
    in ONE plan as a grid x face-dim cross join (the faces differ only
    in their y origin and module offset), which matters because the
    per-plan cost here is Catalyst/Janino time, not data. With
    `polys=None` and `outer_ring=False` (the committed-notebook
    configurations: bare annulus, no blocked geometry) the whole
    pipeline is pure codegen — no UDF anywhere. `with_maybe=False`
    reproduces the OLDER reference machine the committed notebook
    outputs were generated with (tools/ref_tiling_golden.py)."""
    if faces is None:
        faces = [(face_label, orientation, centering)]
    sm_w = mod_w + pb_w
    n_rows = int(2 * r_outer / sm_w) + 2
    n_cols = int(r_outer / (mod_h + gap)) + 2
    col_step = mod_h + gap
    x0 = mod_h / 2 + edge_x

    def _y0(ori, cen):
        if cen == "module":
            return sm_w / 2 - rb_w / 2 if ori == "above" else sm_w / 2 - pb_w - rb_w / 2
        return -sm_w / 2 + pb_w / 2 if ori == "above" else sm_w / 2 - pb_w / 2

    face_dim = spark.createDataFrame(
        [
            (label, _y0(ori, cen), (-pb_w / 2 if ori == "above" else pb_w / 2))
            for label, ori, cen in faces
        ],
        "face STRING, y0 DOUBLE, dy DOUBLE",
    )

    # dimension-sized grid: ONE partition => one Arrow batch per rect
    # set for the flag UDF and no multi-task scheduling overhead. (A
    # billion-slot grid would drop the coalesce and let the UDF run
    # per-partition — the plan shape is unchanged.)
    grid = (
        spark.range(n_rows * n_cols)
        .coalesce(1)
        .select(
            (F.col("id") / n_cols).cast("int").alias("iy"),
            (F.col("id") % n_cols).cast("int").alias("ix"),
        )
        .crossJoin(F.broadcast(face_dim))
        .withColumn("xc", F.lit(x0) + F.col("ix").cast("double") * col_step)
        .withColumn(
            "yc", F.col("y0") + (F.lit(n_rows // 2) - F.col("iy")).cast("double") * sm_w
        )
        .withColumn("sx1", F.col("xc") - mod_h / 2)
        .withColumn("sx2", F.col("xc") + mod_h / 2)
        .withColumn("sy1", F.col("yc") - sm_w / 2)
        .withColumn("sy2", F.col("yc") + sm_w / 2)
        .withColumn("my1", F.col("yc") + F.col("dy") - mod_w / 2)
        .withColumn("my2", F.col("yc") + F.col("dy") + mod_w / 2)
    )

    def blocked_or_false(x1, y1, x2, y2):
        if polys is None and not outer_ring:
            return F.lit(False)
        blocked = _blocked_flag_udf(polys or {}, outer_ring=outer_ring)
        return blocked(x1, y1, x2, y2)

    sm_ok = _annulus_ok(
        F.col("sx1"), F.col("sy1"), F.col("sx2"), F.col("sy2"), r_inner, r_outer
    ) & ~blocked_or_false(F.col("sx1"), F.col("sy1"), F.col("sx2"), F.col("sy2"))
    if with_maybe:
        mod_ok = _annulus_ok(
            F.col("sx1"), F.col("my1"), F.col("sx2"), F.col("my2"), r_inner, r_outer
        ) & ~blocked_or_false(F.col("sx1"), F.col("my1"), F.col("sx2"), F.col("my2"))
    else:
        mod_ok = F.lit(False)
    flags = grid.select(
        "face",
        "iy",
        "ix",
        "xc",
        "yc",
        sm_ok.alias("sm_ok"),
        mod_ok.alias("mod_ok"),
    ).withColumn("mod_only", F.col("mod_ok") & ~F.col("sm_ok"))
    # cut the plan at the UDF boundary: the inlined corner-condition
    # expression trees + the polygon UDF closure otherwise replicate
    # into every downstream branch (chains, winners, the output join),
    # and each branch's generated code balloons to a multi-second
    # Janino compile (measured ~9 s PER count on 841 rows; 1.4 MB task
    # binaries). persist(), not localCheckpoint — see all_face_slots.
    flags = flags.persist()
    if persist_registry is not None:
        persist_registry.append(flags)

    w = W.partitionBy("face", "iy").orderBy("ix")
    flags = flags.withColumn("prev_yes", F.coalesce(F.lag("sm_ok").over(w), F.lit(False)))

    # maximal chains of consecutive module-only slots
    chains = (
        flags.filter(F.col("mod_only"))
        .withColumn("chain", F.col("ix") - F.row_number().over(w))
        .groupBy("face", "iy", "chain")
        .agg(
            F.min("ix").alias("start_ix"),
            F.max("ix").alias("end_ix"),
            F.count(F.lit(1)).alias("length"),
            # first-slot prev_yes via struct-min: semantically min_by
            # (prev_yes, ix), but min_by mixed with declarative
            # aggregates trips a multi-second codegen path (measured
            # 4.4 s vs 0.3 s on this 841-row table)
            F.min(F.struct("ix", "prev_yes"))
            .getField("prev_yes")
            .alias("prev_yes_start"),
        )
        .withColumn("qualifies", ~(F.col("prev_yes_start") & (F.col("length") == 1)))
    )
    winners = (
        chains.filter(F.col("qualifies"))
        .groupBy("face", "iy")
        .agg(F.min("start_ix").alias("win_start"))
        .join(
            chains.select("face", "iy", F.col("start_ix").alias("win_start"), "end_ix"),
            ["face", "iy", "win_start"],
        )
        .select("face", "iy", F.col("end_ix").alias("maybe_ix"))
    )
    out = (
        flags.join(F.broadcast(winners), ["face", "iy"], "left")
        .withColumn(
            "state",
            F.when(F.col("sm_ok"), "yes")
            .when(F.col("mod_only") & (F.col("ix") == F.col("maybe_ix")), "maybe")
            .otherwise("no"),
        )
        .withColumn("available", F.col("state") != "no")
        .select("face", "iy", "ix", "xc", "yc", "state", "available")
    )
    return out


def _runs_from(s: DataFrame) -> DataFrame:
    """Gaps-and-islands over available slots keyed by (face, iy),
    keeping each run's first-slot state for the fallback rule."""
    w = W.partitionBy("face", "iy").orderBy("ix")
    return (
        s.withColumn("island", F.col("ix") - F.row_number().over(w))
        .groupBy("face", "iy", "island")
        .agg(
            F.min("ix").alias("start_ix"),
            F.count(F.lit(1)).alias("n_slots"),
            # struct-min instead of min_by: same value, avoids the
            # slow mixed-aggregate codegen path (see face_slots chains)
            F.min(F.struct("ix", "state")).getField("state").alias("first_state"),
        )
        .select("face", "iy", "start_ix", "n_slots", "first_state")
    )


def face_runs(
    spark: SparkSession,
    slots: DataFrame | None = None,
    flavors: tuple[int, ...] = (7, 6, 3),
) -> DataFrame:
    """Runs with the reference's TWO-PASS fallback (ETL.py:646-668): a
    (face, row) whose maybe-led run is not covered by a largest-flavor
    board is re-tiled under the stricter yes-only filter. Same shape as
    plans.tiling.runs_two_pass_from but keyed by (face, iy)."""
    if slots is None and tuple(sorted(flavors, reverse=True)) == (7, 6, 3):
        return _memo_df(spark, "face_runs", lambda: _face_runs_plan(spark, None, flavors))
    return _face_runs_plan(spark, slots, flavors)


def _face_runs_plan(
    spark: SparkSession,
    slots: DataFrame | None,
    flavors: tuple[int, ...],
) -> DataFrame:
    s = slots if slots is not None else all_face_slots(spark)
    pl = _partition_lookup_for(spark, flavors)
    pass1 = _runs_from(s.filter(F.col("available")))
    first_flavor = pl.filter(F.col("ordinal") == 1).select(
        "n", F.col("flavor").alias("first_flavor")
    )
    # DELIBERATE DEVIATION (documented, like the ETL.py:700 start=length
    # note in this module): the reference hardcodes `partition[0] != 7`
    # here (ETL.py populate two-pass check) — a literal spelling of
    # "the run does not open with the LARGEST flavor" that only holds
    # for its shipped flavor set {7,6,3}. We generalize to
    # max(flavors), which is identical for every reference
    # configuration; for non-default flavor sets the literal-7 form
    # would misfire on every run (no partition can ever start with 7
    # when 7 isn't a flavor). All committed-notebook pins run
    # non-default flavors with with_maybe=False, where this branch is
    # unreachable, so the deviation is unobservable against the
    # reference's own outputs (ADVICE r7). The divergent configuration
    # (flavors=(14,11,6), with_maybe=True) IS pinned since round 9:
    # test_faces_tiling.py::TestCommittedPins::
    # test_flavor_literal_divergence_pinned asserts this plan keeps
    # 959 modules on above/module where the literal-7 reference form
    # keeps 957 (= the no-maybe machine: the check fires on every
    # maybe-opening run) — a silent change on either side of the
    # deviation now fails loudly (VERDICT r8 item 2).
    failed = (
        pass1.join(F.broadcast(first_flavor), pass1.n_slots == first_flavor.n, "left")
        .filter(
            (F.col("first_state") == "maybe") & (F.col("first_flavor") != max(flavors))
        )
        .select("face", "iy")
        .distinct()
    )
    kept = pass1.join(failed, ["face", "iy"], "left_anti")
    redone = _runs_from(s.filter(F.col("state") == "yes")).join(
        F.broadcast(failed), ["face", "iy"], "left_semi"
    )
    return kept.unionByName(redone).select("face", "iy", "start_ix", "n_slots")


def _partition_lookup_for(spark: SparkSession, flavors: tuple[int, ...]) -> DataFrame:
    if tuple(sorted(flavors, reverse=True)) == (7, 6, 3):
        return partition_lookup(spark)
    from etl_sh_design_spark.operators.partition import partition_rows

    return spark.createDataFrame(
        partition_rows(60, tuple(sorted(flavors, reverse=True))),
        "n INT, ordinal INT, flavor INT, n_boards INT, covered INT",
    )


def multi_config_module_totals_no_maybe(
    spark: SparkSession, configs: list[dict]
) -> DataFrame:
    """Module totals for SEVERAL no-maybe configurations in ONE plan —
    (config, n_modules), one row per config.

    config_module_totals builds a full grid->flags->runs->lookup chain
    per configuration, and each chain is its own Janino compile (the
    cost on these dimension-sized tables is compilation, not data:
    four chains measured ~7 s in a warm bench session, ~45 s cold).
    Here every per-config scalar (mod_h, x0, col_step, r_in, r_out,
    grid bounds) becomes a COLUMN of a broadcast config×face dim, so
    all configurations share one grid scan, one window, one groupBy —
    one compile. Restricted to with_maybe=False (all five committed
    notebook pins): no maybe machine, no two-pass fallback, so a run
    is just a maximal island of sm-fits slots.

    Each `configs` entry: {label, faces: [(ori, cen)], mod_h,
    r_inner, r_outer?, edge_x?, flavors?}. Module width / PB / RB
    widths are the shared reference constants (every committed
    notebook varies only the module x-extent and the annulus)."""
    sm_w = MOD_W + PB_W
    flavor_sets: dict[tuple[int, ...], int] = {}
    dim_rows = []
    max_cells = 0
    for c in configs:
        mod_h = float(c["mod_h"])
        r_in = float(c["r_inner"])
        r_out = float(c.get("r_outer", ETL_OUTER))
        edge_x = float(c.get("edge_x", EDGE_X))
        fl = tuple(sorted(c.get("flavors", (7, 6, 3)), reverse=True))
        fl_id = flavor_sets.setdefault(fl, len(flavor_sets))
        n_rows = int(2 * r_out / sm_w) + 2
        n_cols = int(r_out / (mod_h + GAP)) + 2
        max_cells = max(max_cells, n_rows * n_cols)
        for ori, cen in c["faces"]:
            if cen == "module":
                y0 = sm_w / 2 - RB_W / 2 if ori == "above" else sm_w / 2 - PB_W - RB_W / 2
            else:
                y0 = -sm_w / 2 + PB_W / 2 if ori == "above" else sm_w / 2 - PB_W / 2
            dim_rows.append(
                (
                    c["label"], f"{c['label']}:{ori}:{cen}", y0,
                    mod_h / 2 + edge_x, mod_h + GAP, mod_h,
                    r_in, r_out, n_rows, n_cols, n_rows // 2, fl_id,
                )
            )
    cfg_dim = spark.createDataFrame(
        dim_rows,
        "config STRING, face STRING, y0 DOUBLE, x0 DOUBLE, col_step DOUBLE,"
        " mod_h DOUBLE, r_in DOUBLE, r_out DOUBLE, n_rows INT, n_cols INT,"
        " iy_center INT, fl INT",
    )
    lookup = None
    for fl, fl_id in flavor_sets.items():
        lk = (
            _partition_lookup_for(spark, fl)
            .select("n", "covered")
            .distinct()
            .withColumn("fl", F.lit(fl_id))
        )
        lookup = lk if lookup is None else lookup.unionByName(lk)
    # shared id range sized to the LARGEST grid; each config decodes
    # its own (iy, ix) from id with its own n_cols and drops ids past
    # its own grid (same dimension-sized single-partition discipline
    # as config_slots_plan)
    slots = (
        spark.range(max_cells)
        .coalesce(1)
        .crossJoin(F.broadcast(cfg_dim))
        .filter(F.col("id") < F.col("n_rows") * F.col("n_cols"))
        .withColumn("iy", (F.col("id") / F.col("n_cols")).cast("int"))
        .withColumn("ix", F.pmod(F.col("id"), F.col("n_cols")).cast("int"))
        .withColumn("xc", F.col("x0") + F.col("ix").cast("double") * F.col("col_step"))
        .withColumn(
            "yc",
            F.col("y0") + (F.col("iy_center") - F.col("iy")).cast("double") * sm_w,
        )
    )
    sm_ok = _annulus_ok(
        F.col("xc") - F.col("mod_h") / 2,
        F.col("yc") - sm_w / 2,
        F.col("xc") + F.col("mod_h") / 2,
        F.col("yc") + sm_w / 2,
        F.col("r_in"),
        F.col("r_out"),
    )
    avail = slots.filter(sm_ok).select(
        "config", "face", "fl", "iy", "ix", F.lit("yes").alias("state")
    )
    runs = (
        _runs_from(avail)
        # _runs_from keys on (face, iy); face labels are config-unique
        # here, so rejoin the per-face config/flavor ids via the dim
        .join(
            F.broadcast(cfg_dim.select("face", "config", "fl").distinct()), "face"
        )
    )
    totals = (
        runs.join(
            F.broadcast(lookup),
            (runs["fl"] == lookup["fl"]) & (runs["n_slots"] == lookup["n"]),
            "left",
        )
        .groupBy("config")
        .agg(F.sum(F.coalesce("covered", F.lit(0))).cast("bigint").alias("n_modules"))
    )
    # a config whose annulus admits no slot at all still gets its row
    all_configs = cfg_dim.select("config").distinct()
    return (
        all_configs.join(totals, "config", "left")
        .fillna({"n_modules": 0})
        .select("config", "n_modules")
    )


def config_module_totals(
    spark: SparkSession,
    label: str,
    faces: list[tuple[str, str]],
    flavors: tuple[int, ...] = (7, 6, 3),
    with_maybe: bool = True,
    **cfg,
) -> DataFrame:
    """Module total for an arbitrary configuration summed over the
    given (orientation, centering) faces — 1 row (config, n_modules).
    Used by the committed-notebook-pin query: the whole plan is pure
    codegen (no polygons in those configs), and all faces of a config
    run in ONE plan via the face-dim cross join."""
    slots = config_slots_plan(
        spark,
        faces=[(f"{label}:{i}", ori, cen) for i, (ori, cen) in enumerate(faces)],
        with_maybe=with_maybe,
        **cfg,
    )
    r = face_runs(spark, slots, flavors)
    pl = F.broadcast(
        _partition_lookup_for(spark, flavors).select("n", "covered").distinct()
    )
    return (
        r.join(pl, r.n_slots == pl.n, "left")
        .agg(F.sum(F.coalesce("covered", F.lit(0))).cast("bigint").alias("n_modules"))
        .select(F.lit(label).alias("config"), "n_modules")
    )


def face_supermodules(spark: SparkSession) -> DataFrame:
    return _memo_df(spark, "face_supermodules", lambda: _face_supermodules_plan(spark))


def _face_supermodules_plan(spark: SparkSession) -> DataFrame:
    """Placed boards: (face, iy, start_ix, n_slots, ordinal, flavor,
    sm_start). NOTE the reference's own x-placement for the 2nd+ run of
    a multi-row is garbage (ETL.py:700 resets start=length, not 0); we
    place each run from its own slots, which matches the reference for
    single-run rows and is what the reference intended."""
    r = face_runs(spark)
    pl = F.broadcast(partition_lookup(spark))
    j = r.join(pl, r.n_slots == pl.n, "inner")
    w = (
        W.partitionBy("face", "iy", "start_ix")
        .orderBy("ordinal")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return j.select(
        "face",
        "iy",
        "start_ix",
        "n_slots",
        "ordinal",
        "flavor",
        (F.col("start_ix") + F.coalesce(F.sum("flavor").over(w), F.lit(0)))
        .cast("int")
        .alias("sm_start"),
    )


def face_module_totals(spark: SparkSession) -> DataFrame:
    return _memo_df(spark, "face_module_totals", lambda: _face_module_totals_plan(spark))


def _face_module_totals_plan(spark: SparkSession) -> DataFrame:
    """Per-face totals in the shape the reference prints
    (dee_geometry.py:387-388): modules = covered slots, plus the
    supermodule count."""
    r = face_runs(spark)
    pl = F.broadcast(partition_lookup(spark).select("n", "covered", "n_boards").distinct())
    return (
        r.join(pl, r.n_slots == pl.n, "left")
        .groupBy("face")
        .agg(
            F.sum(F.coalesce("covered", F.lit(0))).cast("bigint").alias("n_modules"),
            F.sum(F.coalesce("n_boards", F.lit(0))).cast("bigint").alias("n_supermodules"),
        )
    )


def face_flavor_counts(spark: SparkSession) -> DataFrame:
    return _memo_df(spark, "face_flavor_counts", lambda: _face_flavor_counts_plan(spark))


def _face_flavor_counts_plan(spark: SparkSession) -> DataFrame:
    """(face, flavor, n_boards) — the per-face RB flavor census behind
    the reference's Small/Medium/Large RB print (dee_geometry.py:392-394,
    which multiplies the quarter-ETL totals by 4)."""
    return (
        face_supermodules(spark)
        .groupBy("face", "flavor")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_boards"))
    )


# =====================================================================
# SuperModule board geometry: RB / PB / VTRX rectangles per placed
# board (reference ETL.py:163-204, 312-357, 364-381, 506-533). Pure
# column arithmetic + explode over the supermodule table — fully
# declarative, no UDF; the real-geometry variant inherits the polygon
# UDF only through its upstream slot table.
# =====================================================================

PB_H3 = 3 * MOD_H + 2 * GAP  # every PB is 3-module high: split_PB makes
# two such boards for flavors > 5 and the flavor-3 single PB already is
# (ETL.py:511-533)
VTRX_H, VTRX_W = 20.0, 10.0  # ETL.py:196-197
VTRX_DX, VTRX_DY = 32.5, 6.0  # x = RB.x2 - 32.5, y = RB.y + 6 (ETL.py:198-199)


def face_orientation_dim(spark: SparkSession) -> DataFrame:
    """(face, y0, osign): grid-origin y and the orientation sign
    (+1 above: RB sits at -PB_W/2, PB at +RB_W/2; -1 below mirrors —
    ETL.py:352-355)."""
    rows = [
        (face, face_y0(ori, cen), 1.0 if ori == "above" else -1.0)
        for face, (ori, cen, _r) in FACE_CONFIGS.items()
    ]
    return spark.createDataFrame(rows, "face STRING, y0 DOUBLE, osign DOUBLE")


def boards_from_supermodules(sm: DataFrame, face_dim: DataFrame) -> DataFrame:
    """Explode placed supermodules (face, iy, start_ix, flavor,
    sm_start) into their boards: one RB (full SM height), one VTRX
    positioned off the RB's outer-x end, and one or two PBs (split for
    flavors > 5, right-aligned, ETL.py:506-533). Returns
    (face, iy, sm_start, flavor, kind, board_ix, x, y, height, width,
    x1, x2, y1, y2)."""
    j = sm.join(F.broadcast(face_dim), "face")
    sm_h = F.col("flavor") * MOD_H + (F.col("flavor") - 1) * GAP
    sm_x = F.lit(X0) + (F.col("sm_start") + (F.col("flavor") - 1) / 2.0) * COL_STEP
    sm_y = F.col("y0") + (F.lit(N_ROWS // 2) - F.col("iy")).cast("double") * SM_W
    rb_y = sm_y - F.col("osign") * PB_W / 2
    pb_y = sm_y + F.col("osign") * RB_W / 2
    rb_x2 = sm_x + sm_h / 2

    def board(kind, ix, x, y, h, w):
        return F.struct(
            F.lit(kind).alias("kind"),
            F.lit(ix).cast("int").alias("board_ix"),
            x.cast("double").alias("x"),
            y.cast("double").alias("y"),
            h.cast("double").alias("height"),
            w.cast("double").alias("width"),
        )

    # split_PB right-aligned: shifter 0 for flavor 6, +1 otherwise
    shifter = F.when(F.col("flavor") == 6, F.lit(0.0)).otherwise(F.lit(1.0))
    pb_split_hi = sm_x + PB_H3 / 2 + shifter * (MOD_H / 2 + GAP)
    pb_split_lo = sm_x - PB_H3 / 2 + shifter * (MOD_H / 2 + GAP)
    boards = F.when(
        F.col("flavor") > 5,
        F.array(
            board("RB", 0, sm_x, rb_y, sm_h, F.lit(RB_W)),
            board("VTRX", 0, rb_x2 - VTRX_DX, rb_y + VTRX_DY, F.lit(VTRX_H), F.lit(VTRX_W)),
            board("PB", 0, pb_split_hi, pb_y, F.lit(PB_H3), F.lit(PB_W)),
            board("PB", 1, pb_split_lo, pb_y, F.lit(PB_H3), F.lit(PB_W)),
        ),
    ).otherwise(
        F.array(
            board("RB", 0, sm_x, rb_y, sm_h, F.lit(RB_W)),
            board("VTRX", 0, rb_x2 - VTRX_DX, rb_y + VTRX_DY, F.lit(VTRX_H), F.lit(VTRX_W)),
            board("PB", 0, sm_x, pb_y, sm_h, F.lit(PB_W)),
        )
    )
    ex = j.select(
        "face", "iy", "sm_start", "flavor", F.explode(boards).alias("b")
    ).select("face", "iy", "sm_start", "flavor", "b.*")
    return ex.select(
        "*",
        (F.col("x") - F.col("height") / 2).alias("x1"),
        (F.col("x") + F.col("height") / 2).alias("x2"),
        (F.col("y") - F.col("width") / 2).alias("y1"),
        (F.col("y") + F.col("width") / 2).alias("y2"),
    )


def face_boards(spark: SparkSession) -> DataFrame:
    return _memo_df(spark, "face_boards", lambda: _face_boards_plan(spark))


def _face_boards_plan(spark: SparkSession) -> DataFrame:
    """Boards of the real 'updated'/'S' tiling, all four faces."""
    return boards_from_supermodules(face_supermodules(spark), face_orientation_dim(spark))


def boards_rollup(boards: DataFrame) -> DataFrame:
    """Per (face, kind): board count + total area (2 dp — the per-board
    areas are exact decimals; rounding absorbs sum-order drift)."""
    return boards.groupBy("face", "kind").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_boards"),
        F.round(F.sum(F.col("height") * F.col("width")), 2).alias("total_area"),
    )


def boards_sql(sm_cte: str, face_dim_cte: str) -> str:
    """DuckDB twin of boards_from_supermodules over a supermodule CTE
    (face, iy, sm_start, flavor) and a face dim (face, y0, osign)."""
    # every injected literal is ::DOUBLE — DuckDB parses bare decimal
    # literals as DECIMAL, which would diverge the result schema
    return f"""
sm_geom AS (
  SELECT s.face, s.iy, s.sm_start, s.flavor,
         s.flavor * {MOD_H!r}::DOUBLE + (s.flavor - 1) * {GAP!r}::DOUBLE AS sm_h,
         {X0!r}::DOUBLE + (s.sm_start + (s.flavor - 1) / 2.0) * {COL_STEP!r}::DOUBLE AS sm_x,
         d.y0 + ({N_ROWS // 2} - s.iy) * {SM_W!r}::DOUBLE AS sm_y,
         d.osign,
         CASE WHEN s.flavor = 6 THEN 0.0 ELSE 1.0 END AS shifter
  FROM ({sm_cte}) s JOIN ({face_dim_cte}) d USING (face)
),
boards AS (
  SELECT face, iy, sm_start, flavor, 'RB' AS kind, 0 AS board_ix,
         sm_x AS x, sm_y - osign * {PB_W / 2!r}::DOUBLE AS y, sm_h AS height,
         {RB_W!r}::DOUBLE AS width
  FROM sm_geom
  UNION ALL
  SELECT face, iy, sm_start, flavor, 'VTRX', 0,
         sm_x + sm_h / 2 - {VTRX_DX!r}::DOUBLE,
         sm_y - osign * {PB_W / 2!r}::DOUBLE + {VTRX_DY!r}::DOUBLE,
         {VTRX_H!r}::DOUBLE, {VTRX_W!r}::DOUBLE
  FROM sm_geom
  UNION ALL
  SELECT face, iy, sm_start, flavor, 'PB', 0,
         sm_x, sm_y + osign * {RB_W / 2!r}::DOUBLE, sm_h, {PB_W!r}::DOUBLE
  FROM sm_geom WHERE flavor <= 5
  UNION ALL
  SELECT face, iy, sm_start, flavor, 'PB', 0,
         sm_x + {PB_H3 / 2!r}::DOUBLE + shifter * {MOD_H / 2 + GAP!r}::DOUBLE,
         sm_y + osign * {RB_W / 2!r}::DOUBLE, {PB_H3!r}::DOUBLE, {PB_W!r}::DOUBLE
  FROM sm_geom WHERE flavor > 5
  UNION ALL
  SELECT face, iy, sm_start, flavor, 'PB', 1,
         sm_x - {PB_H3 / 2!r}::DOUBLE + shifter * {MOD_H / 2 + GAP!r}::DOUBLE,
         sm_y + osign * {RB_W / 2!r}::DOUBLE, {PB_H3!r}::DOUBLE, {PB_W!r}::DOUBLE
  FROM sm_geom WHERE flavor > 5
)"""
