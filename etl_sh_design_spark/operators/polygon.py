"""Polygon containment/overlap — the U1 black-box operator
(SURVEY.md §2.10; reference wraps shapely at dee_geometry.py:60-138).

shapely is NOT in this container, so the default path is a vectorized
NumPy ray-casting point-in-polygon inside an Arrow-batched pandas UDF;
if shapely is importable we use its (C-accelerated) predicates instead.
Either way the polygon table is dimension-sized and broadcast — the
UDF is the only non-codegen island in the engine, applied AFTER the
cheap rectangular pre-filters (predicate ordering, SURVEY.md §4.1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:
    import shapely  # noqa: F401

    HAVE_SHAPELY = True
except ImportError:
    HAVE_SHAPELY = False


def _ray_cast(px: np.ndarray, py: np.ndarray, verts: list[tuple[float, float]]) -> np.ndarray:
    """Vectorized even-odd rule point-in-polygon."""
    inside = np.zeros(len(px), dtype=bool)
    n = len(verts)
    for i in range(n):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % n]
        crosses = ((y1 > py) != (y2 > py)) & (
            px < (x2 - x1) * (py - y1) / (y2 - y1 + 1e-300) + x1
        )
        inside ^= crosses
    return inside


def points_in_polygon(
    points: DataFrame,
    vertices: list[tuple[float, float]],
    px: str = "px",
    py: str = "py",
    out: str = "inside",
) -> DataFrame:
    """Tag each point row with polygon membership. The vertex list is
    captured in the UDF closure (tiny, broadcast with the task)."""
    verts = [(float(x), float(y)) for x, y in vertices]

    if HAVE_SHAPELY:
        from shapely.geometry import Point, Polygon

        poly = Polygon(verts)

        @F.pandas_udf(T.BooleanType())
        def _inside(xs: pd.Series, ys: pd.Series) -> pd.Series:
            from shapely import contains_xy

            return pd.Series(contains_xy(poly, xs.values, ys.values))

    else:

        @F.pandas_udf(T.BooleanType())
        def _inside(xs: pd.Series, ys: pd.Series) -> pd.Series:
            return pd.Series(_ray_cast(xs.values, ys.values, verts))

    return points.withColumn(out, _inside(F.col(px), F.col(py)))


def filter_blocked_polygons(
    slots: DataFrame,
    polygons: dict[str, list[tuple[float, float]]],
    cx: str = "cx",
    cy: str = "cy",
) -> DataFrame:
    """J3 with true polygons: drop slots whose center falls inside any
    blocked polygon. Order matters for performance: apply rectangular
    pre-filters BEFORE this UDF join (Catalyst will not reorder across
    the UDF barrier — SURVEY.md §4.1)."""
    out = slots
    for name, verts in polygons.items():
        out = points_in_polygon(out, verts, cx, cy, out=f"_in_{name}")
    cond = None
    for name in polygons:
        c = F.col(f"_in_{name}")
        cond = c if cond is None else (cond | c)
    out = out.filter(~cond) if cond is not None else out
    return out.drop(*[f"_in_{name}" for name in polygons])
