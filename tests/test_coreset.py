"""Greedy k-center coreset: structural invariants + an independent
NumPy golden (the oracle-parity check itself runs via
tests/test_driver_contract.py like every registered query)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from etl_sh_design_spark.operators.coreset import kcenter_coreset
from tests.conftest import SF_SMOKE

K = 8


def _result(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    rows = kcenter_coreset(emb, k=K).orderBy("step").collect()
    return rows


def test_kcenter_structure_and_greedy_invariant(spark):
    rows = _result(spark)
    assert len(rows) == K
    assert [r.step for r in rows] == list(range(K))
    # seed contract
    assert rows[0].vec_id == 0 and rows[0].sel_dist == 0.0
    # all distinct picks
    assert len({r.vec_id for r in rows}) == K
    # greedy max-min invariant: the selection distance can only shrink
    # (each new center can only reduce every point's nearest-center
    # distance, and the argmax of a pointwise-smaller field is smaller)
    dists = [r.sel_dist for r in rows[1:]]
    assert all(a >= b for a, b in zip(dists, dists[1:])), dists


def test_kcenter_matches_numpy_golden(spark):
    """Independent sequential re-implementation (float64 NumPy, same
    6-dp round-before-min contract) must agree exactly."""
    tbl = pq.read_table(f"{SF_SMOKE}/embeddings.parquet")
    ids = np.asarray(tbl["vec_id"])
    vecs = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, vecs = ids[order], vecs[order]

    def sqdist_to(center):
        # sequential index-order fold, matching the engines' zip_with/
        # list_transform accumulation exactly (NOT np.sum, whose
        # pairwise summation can differ in the last ulp pre-round)
        acc = np.zeros(len(vecs), dtype=np.float64)
        for j in range(vecs.shape[1]):
            acc = acc + (vecs[:, j] - center[j]) ** 2
        return np.round(acc, 6)

    sel = [int(np.nonzero(ids == 0)[0][0])]
    expected = [(0, 0, 0.0)]
    mind = np.full(len(ids), np.inf)
    for step in range(1, K):
        d = sqdist_to(vecs[sel[-1]])
        mind = np.minimum(mind, d)
        # argmax, ties -> lowest vec_id (ids sorted ascending, so the
        # first argmax occurrence IS the lowest id)
        pick = int(np.argmax(mind))
        expected.append((step, int(ids[pick]), round(float(mind[pick]), 6)))
        sel.append(pick)

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    got = [
        (r.step, r.vec_id, r.sel_dist)
        for r in kcenter_coreset(emb, k=K).orderBy("step").collect()
    ]
    assert got == expected
