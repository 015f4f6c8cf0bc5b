"""Round-6 extension registry: the reference's signature study on its
real data.

`real_acceptance_profile` runs the flagship MC geometric-acceptance
plan (rays -> P14 projection -> binned J1 containment -> J2 hit count
-> eta-binned efficiency/mean-n/mean-t profile) over the reference's
OWN exported layout database `layouts/database_new.yaml` (7180 sensor
centers, parity-tested in tests/test_reference_parity.py) instead of
the synthetic sensor grid — the strongest parity statement the engine
can make: the same operators, over the reference's actual shipped
layout, oracle-checked against DuckDB (geometric_acceptance.ipynb
cells 43-72 is the reference loop being re-expressed).

Registration is gated on the reference checkout being present
(SPARK_GRAFT_REF_DIR, default /root/reference), mirroring
`real_face_physics`.
"""

from __future__ import annotations

import os

from etl_sh_design_spark.plans import acceptance, tiling
from etl_sh_design_spark.registry import N_RAYS, query
from etl_sh_design_spark.registry_r5c import _query_if
from etl_sh_design_spark.sources.io import reference_dir

_REF_DIR = reference_dir()
_NEW_YAML = os.path.join(_REF_DIR, "layouts", "database_new.yaml")
_TDR_YAML = os.path.join(_REF_DIR, "layouts", "database_TDR.yaml")
_HAVE_NEW_YAML = os.path.isfile(_NEW_YAML)
_HAVE_TDR_YAML = os.path.isfile(_TDR_YAML)


@_query_if(
    _HAVE_NEW_YAML,
    "real_acceptance_profile",
    acceptance.real_acceptance_profile_sql(N_RAYS, _NEW_YAML)
    if _HAVE_NEW_YAML
    else None,
)
def q_real_acceptance_profile(spark, sf_dir):
    """MC geometric acceptance over the REAL 'new' layout: per eta bin
    (40 bins over [1.659, 2.950), the study's own spec), ray count,
    efficiency, mean hit count, mean time resolution.

    Scale shape: identical to the flagship — the 7180-row corner table
    broadcasts, rays never shuffle (map-side projection + binned
    equi-join), and the only wide exchange is the 40-row final agg.
    The oracle embeds the same driver-flattened centers as a VALUES
    CTE, so both engines consume bit-identical doubles."""
    return acceptance.real_acceptance_profile(spark, N_RAYS, _NEW_YAML, "new")


@_query_if(
    _HAVE_TDR_YAML,
    "real_tdr_hit_histogram",
    acceptance.real_hit_count_histogram_sql(N_RAYS, _TDR_YAML, "TDR")
    if _HAVE_TDR_YAML
    else None,
)
def q_real_tdr_hit_histogram(spark, sf_dir):
    """Hist1D(nHits) over the REAL TDR layout (`database_TDR.yaml`,
    8088 centers) — the stored-output twin of
    geometric_acceptance.ipynb cell 62, whose committed output is
    [10409, 13775, 72538, 3218, 60] at 1e5 unseeded rays. Our seeded
    20k-ray MC reproduces the same distribution to MC precision
    (golden-pinned in tests/test_golden_invariants.py); this registered
    form is the exact cross-engine check at the same ray count."""
    return acceptance.real_hit_count_histogram(spark, N_RAYS, _TDR_YAML, "TDR")


# --------------------------------------------------------------------
# tiling against the REAL blocked geometry (J3/U1 fidelity closure)
# --------------------------------------------------------------------

@query(
    "tile_slots_real_bbox",
    "WITH "
    + tiling._slots_sql(tiling.real_bbox_blocked_sql())
    + " SELECT iy, ix, state, coalesce(available, FALSE) AS available FROM slots",
)
def q_tile_slots_real_bbox(spark, sf_dir):
    """Slot availability against the bounding boxes of the
    reference's REAL 'updated'-layout blocked shapes (nose circle,
    feedthrough band, 12 attachments — dee_geometry.py:60-132) —
    the SQL-expressible over-approximation of the exact polygon path
    (`tile_slots_polygon`). Broadcast dimension join + per-row window;
    scales with |slots|."""
    return tiling.slots_real(spark, geometry="bbox").select(
        "iy", "ix", "state", "available"
    )


@query("tile_slots_polygon")  # rows-only: pandas-UDF polygon test, not SQL
def q_tile_slots_polygon(spark, sf_dir):
    """Slot availability against the EXACT real blocked polygons via
    the vectorized rect-polygon overlap (Liang-Barsky + ray cast,
    Arrow-batched, map-only). Not SQL-expressible -> rows-only driver
    check; exactness is pinned by goldens instead: the polygon-blocked
    set is a strict subset of the bbox-blocked set, and the known
    corner-cut slots (circle/taper/cap geometry the boxes overstate)
    are enumerated in tests/test_polygon_tiling.py."""
    return tiling.slots_real(spark, geometry="polygon").select(
        "iy", "ix", "state", "available"
    )
