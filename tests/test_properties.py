"""Hypothesis property tests for the pure-Python operator kernels (no
SparkSession needed — these run fast)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_sh_design_spark.operators.partition import best_partition
from etl_sh_design_spark.operators.polygon import _ray_cast


@given(st.integers(min_value=0, max_value=200))
def test_partition_properties(n):
    p = best_partition(n, (7, 6, 3))
    assert sum(p) <= n
    assert all(f in (7, 6, 3) for f in p)
    assert list(p) == sorted(p, reverse=True)
    # residual minimality: no single extra flavor could still fit
    residual = n - sum(p)
    assert residual < 3 or n < 3


@given(
    st.integers(min_value=1, max_value=40),
    st.floats(min_value=-1e3, max_value=1e3, allow_nan=False),
    st.floats(min_value=1e-3, max_value=1e3, allow_nan=False),
)
def test_binspec_properties(nbins, lo, width):
    from etl_sh_design_spark.operators.histogram import BinSpec

    hi = lo + nbins * width
    spec = BinSpec(nbins, lo, hi)
    for frac in (0.0, 0.25, 0.5, 0.999):
        x = lo + frac * (hi - lo)
        if not (lo <= x < hi):
            continue
        b = math.floor((x - spec.lo) / spec.width)
        assert 0 <= b < nbins or math.isclose(x, hi)


@settings(max_examples=50)
@given(
    st.floats(min_value=-2, max_value=2, allow_nan=False),
    st.floats(min_value=-2, max_value=2, allow_nan=False),
)
def test_ray_cast_unit_square(px, py):
    import numpy as np

    square = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]
    got = bool(_ray_cast(np.array([px]), np.array([py]), square)[0])
    on_edge = px in (0.0, 1.0) or py in (0.0, 1.0)
    if not on_edge:
        assert got == (0.0 < px < 1.0 and 0.0 < py < 1.0)


@settings(max_examples=30)
@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=5))
def test_md5_int64_range(texts):
    """The cross-engine hash must stay within 60 bits (DuckDB BIGINT
    parse of 15 hex chars)."""
    import hashlib

    for t in texts:
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        assert 0 <= h < (1 << 60)


def _greedy_pack_ref(tokens, budget):
    """Pure-Python reference for greedy_pack within one shard."""
    chunks = []
    run, n = 0, 0
    for tok in tokens:
        if n == 0 or run + tok > budget:
            if n > 0:
                chunks.append((n, run))
            run, n = 0, 0
        run += tok
        n += 1
    if n > 0:
        chunks.append((n, run))
    return chunks


@given(
    st.lists(st.integers(min_value=0, max_value=900), min_size=0, max_size=60),
    st.integers(min_value=1, max_value=512),
)
def test_greedy_pack_reference_properties(tokens, budget):
    chunks = _greedy_pack_ref(tokens, budget)
    assert sum(n for n, _ in chunks) == len(tokens)
    assert sum(t for _, t in chunks) == sum(tokens)
    for n, t in chunks:
        assert t <= budget or n == 1
    # greediness: merging any adjacent pair would overflow the budget
    for (_, t1), (_, t2) in zip(chunks, chunks[1:]):
        assert t1 + t2 > budget
