"""Round-11 goldens: the semdedup capped-k assignment rung (capped
k_eff + centroid-block-sharded GEMM + within-cell candidate horizon)
and its forced-path parity contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _injected(spark):
    emb = spark.read.parquet(SF_SMOKE + "/embeddings.parquet")
    dup = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    return emb.select("vec_id", "embedding").unionByName(dup)


def test_semdedup_capped_k_dispatch_math():
    """The r11 cap: k_eff = min(ceil(n/bound), SEMDEDUP_MAX_K), still
    floored at the caller's k; max_k=0 restores pre-r11 growth. Pins
    the numbers the 100x probe and the registry rely on."""
    from etl_sh_design_spark.operators.semdedup import (
        SEMDEDUP_MAX_K,
        SEMDEDUP_MAX_MEAN_CELL_ROWS,
        semdedup_effective_k,
    )

    bound = SEMDEDUP_MAX_MEAN_CELL_ROWS
    assert SEMDEDUP_MAX_K == 64
    # below the cap: identical to the grow-k rule (sf1 10x corpus)
    assert semdedup_effective_k(24_200, 8, bound) == 25
    assert semdedup_effective_k(64_000, 8, bound) == 64  # exactly at cap
    assert semdedup_effective_k(64_001, 8, bound) == 64  # capped
    assert semdedup_effective_k(242_000, 8, bound) == 64  # the 100x corpus
    assert semdedup_effective_k(242_000, 8, bound, max_k=0) == 242  # no cap
    assert semdedup_effective_k(242_000, 100, bound, max_k=50) == 100  # floor
    assert semdedup_effective_k(242_000, 8, 0) == 8  # dispatch disabled


def test_semdedup_capped_path_saturated_cap_parity(spark):
    """Forced-path parity (the c4_line_dedup standard): the capped
    path at a SATURATED candidate horizon (cap >= max cell rows) must
    be bit-identical to forcing the same k through the plain path —
    the keep-rank window + filter is then a no-op and every pair is
    still compared. bound=30 on the 550-vec corpus grows to 19 cells,
    max_k=5 caps it at 5 (capped regime on), vs caller-k=5 with the
    dispatch disabled (plain pre-r11 path)."""
    from etl_sh_design_spark.operators.semdedup import (
        semantic_dedup_profile,
        semdedup_effective_k,
    )

    inj = _injected(spark)
    n = inj.count()
    assert semdedup_effective_k(n, 2, 30, max_k=5) == 5
    assert semdedup_effective_k(n, 2, 30, max_k=0) > 5  # cap really bites
    capped = sorted(
        tuple(r)
        for r in semantic_dedup_profile(
            inj, k=2, max_mean_cell_rows=30, max_k=5, candidate_cap=10**6
        ).collect()
    )
    plain = sorted(
        tuple(r)
        for r in semantic_dedup_profile(
            inj, k=5, max_mean_cell_rows=0
        ).collect()
    )
    assert capped == plain


def test_semdedup_candidate_cap_bounds_never_adds(spark):
    """The candidate horizon only MISSES removals, never invents them:
    per cluster, n_removed at a small cap <= n_removed at a saturated
    cap, with identical membership (the cap does not touch the
    assignment). Exact duplicates are still removed at any cap >= 1
    whenever the original sits in the cell's top-cap keep order; the
    saturated run removes exactly the injected copies, so the small-
    cap run can only remove a subset of them."""
    from etl_sh_design_spark.operators.semdedup import semantic_dedup_profile

    inj = _injected(spark)

    def run(cap):
        return {
            r["cluster"]: (r["n_members"], r["n_removed"])
            for r in semantic_dedup_profile(
                inj, k=2, max_mean_cell_rows=30, max_k=5, candidate_cap=cap
            ).collect()
        }

    sat = run(10**6)
    small = run(3)
    assert set(sat) == set(small)
    for c in sat:
        assert small[c][0] == sat[c][0]  # same membership
        assert small[c][1] <= sat[c][1]  # horizon never adds removals


def test_gemm_centroid_block_parity(spark):
    """The centroid-block-sharded GEMM kernel must be RESULT-IDENTICAL
    to the unblocked kernel and to the relational fold at any block
    width: within a block argmin takes the first (lowest-id) minimum,
    across blocks the running best updates on strict less-than, so
    ties keep the earlier block — the global first-minimum rule.
    block=3 forces 3 shards over 7 centroids; block=1<<30 is the
    pre-r11 single-shard kernel."""
    from etl_sh_design_spark.operators.kmeans import (
        _as_double,
        _assign,
        _assign_gemm,
    )

    emb = spark.read.parquet(SF_SMOKE + "/embeddings.parquet")
    vecs = emb.select(
        "vec_id", _as_double("embedding").alias("v")
    ).localCheckpoint(eager=False)
    cents = vecs.filter(F.col("vec_id") < 7).select(
        F.col("vec_id").cast("int").alias("cluster"), F.col("v").alias("c")
    )

    def rows(df):
        return sorted(
            (r["vec_id"], r["cluster"], r["dist"]) for r in df.collect()
        )

    rel = rows(_assign(vecs, cents))
    one_shard = rows(_assign_gemm(vecs, cents, block=1 << 30))
    sharded = rows(_assign_gemm(vecs, cents, block=3))
    assert rel == one_shard == sharded
