"""Goldens for the round-10 additions (registry_r10): the hashed
linear quality margin and the PQ recall audit — invariants the hash
oracle can't express (independent recomputation, bounds, cross-query
consistency)."""

from __future__ import annotations

import hashlib

from etl_sh_design_spark.registry_r10 import (
    _PQR_K,
    _PQR_NQ,
    _QB,
    _QC,
    _QM,
    q_hashed_quality_margin,
    q_pq_recall_audit,
)
from tests.conftest import SF_SMOKE


def test_hashed_quality_margin_recomputed_from_scratch(spark, duck):
    """The whole audit is integer-exact by construction, so a pure
    Python reimplementation (hashlib md5 + the same multiplicative
    hash) must reproduce every row bit-for-bit."""
    rows = {
        r["source"]: r for r in q_hashed_quality_margin(spark, SF_SMOKE).collect()
    }
    docs = duck.execute("SELECT source, text FROM documents").fetchall()
    per_source: dict[str, list[int]] = {}
    for source, text in docs:
        toks = [t for t in text.lower().split(" ") if t]
        if not toks:
            continue
        sw = sum(
            ((int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % _QB) * _QM + _QC)
            % 1001
            - 500
            for t in toks
        )
        x = sw * 1e6 / (1000.0 * len(toks))
        # round half away from zero, matching Spark/DuckDB round()
        micro = int(x + 0.5) if x >= 0 else -int(-x + 0.5)
        per_source.setdefault(source, []).append(micro)
    assert set(rows) == set(per_source)
    for src, micros in per_source.items():
        r = rows[src]
        assert r["n_docs"] == len(micros)
        assert r["n_kept"] == sum(1 for m in micros if m > 0)
        assert abs(r["mean_margin"] - round(sum(micros) / len(micros) / 1e6, 6)) < 1e-9
        assert abs(r["keep_rate"] - round(r["n_kept"] / r["n_docs"], 6)) < 1e-9
        # surrogate weights are uniform-ish in [-0.5, 0.5]: the mean
        # margin must sit well inside the envelope
        assert -0.5 <= r["mean_margin"] <= 0.5


def test_pq_recall_audit_shape_and_bounds(spark):
    """2 methods x n_queries rows; n_hits in [0, k]; recall is
    n_hits/k exactly; both methods cover every query id."""
    rows = q_pq_recall_audit(spark, SF_SMOKE).collect()
    assert len(rows) == 2 * _PQR_NQ
    by_method: dict[str, set[int]] = {"pq": set(), "ivfpq": set()}
    for r in rows:
        assert 0 <= r["n_hits"] <= _PQR_K
        assert abs(r["recall"] - round(r["n_hits"] / _PQR_K, 6)) < 1e-9
        by_method[r["method"]].add(r["qid"])
    assert by_method["pq"] == set(range(_PQR_NQ))
    assert by_method["ivfpq"] == set(range(_PQR_NQ))
