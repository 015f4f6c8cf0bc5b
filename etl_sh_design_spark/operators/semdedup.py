"""SemDeDup: semantic deduplication via k-means cells + within-cell
cosine pruning (Abbas et al. 2023, "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication").

The scale shape that makes this tractable at 100 TB:
- embeddings are first clustered (k-means, `operators/kmeans.py` —
  broadcast-centroid rounds, the vector side never shuffles);
- the quadratic cosine comparison then runs ONLY within a cell. In
  the paper k grows with N so the expected cell size stays bounded
  (~N/k); the pairwise stage is Σ|cell|² ≈ N²/k work and its shuffle
  is one repartition by cell id — never an all-pairs cross join.
- within a duplicate relation the paper KEEPS the example with the
  LOWEST cosine similarity to its centroid (farthest = most atypical
  = most informative); we implement exactly that, deterministically.

Removal rule (deterministic on both engines): member r is removed iff
some other member o of the same cell has round(cos(r,o), 6) >= tau
and o outranks r in the keep order (dist DESC, vec_id ASC) — i.e.
o is farther from the centroid, ties broken by lower vec_id. This is
an EXISTS predicate, not an iterative closure, so the whole audit is
one self-join + aggregation (and is exactly SQL-expressible, giving
the full hash oracle in `semdedup_oracle_sql`).

Determinism contract (same discipline as operators/kmeans.py):
double arithmetic; k-means distances and centroid means rounded 6dp
per round with ties -> lowest cluster id; cosine rounded 6dp before
the threshold compare; the dot-product fold runs in index order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_sh_design_spark.operators.kmeans import (
    GEMM_ASSIGN_MIN_ROWS_X_CELLS,
    _as_double,
    _assign,
    _assign_gemm,
    _update,
)

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
    "cast(0.0 as double), (acc, x) -> acc + x)"
)

# Cell-size discipline (the SemDeDup paper's own recipe): k grows with
# the corpus so the EXPECTED cell size stays bounded and the
# within-cell quadratic stage is Σ|cell|² ≈ N · max_mean_cell_rows —
# LINEAR in N — instead of N²/k_fixed. Same size-measured dispatch
# contract as similarity.py's EMBED_BROADCAST_MAX_ROWS: one count() at
# build time picks the strategy, and the switch point is a documented
# constant. Below the switch (N <= k · bound) the caller's k is used
# verbatim, so small-corpus results — and their SQL oracles, which
# bake k in — are bit-identical to the undispatched operator. Above
# it the cell structure (and therefore the approximate removal set)
# changes with k_eff; that is the paper's stated accuracy/cost knob,
# not a correctness deviation, and it is deterministic for a given N.
SEMDEDUP_MAX_MEAN_CELL_ROWS = 1_000


def semdedup_effective_k(n: int, k: int, max_mean_cell_rows: int) -> int:
    """ceil(n / bound), floored at the caller's k. Pure so tests can
    pin the dispatch math without a Spark session."""
    if max_mean_cell_rows <= 0:
        return k
    return max(k, -(-n // max_mean_cell_rows))


def semantic_dedup_profile(
    embeddings: DataFrame,
    k: int = 8,
    iterations: int = 2,
    tau: float = 0.999,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_mean_cell_rows: int = SEMDEDUP_MAX_MEAN_CELL_ROWS,
    gemm_min_product: int = GEMM_ASSIGN_MIN_ROWS_X_CELLS,
) -> DataFrame:
    """Per-cell SemDeDup audit: (cluster, n_members, n_removed,
    n_kept). Cells come from `iterations` Lloyd rounds (same round
    structure as kmeans_cluster_profile: the final assignment uses the
    PREVIOUS round's centroids, so the oracle's a2 CTE matches).

    k is a FLOOR: above N = k · max_mean_cell_rows the cell count
    grows as ceil(N / max_mean_cell_rows) so the quadratic stage stays
    linear in N (see SEMDEDUP_MAX_MEAN_CELL_ROWS). Pass
    max_mean_cell_rows=0 to force the caller's k at any size (the
    oracle-twin configuration).

    Because k grows with N, the assignment product N·k_eff = N²/bound
    eventually dominates; above `gemm_min_product` the per-round
    assignment switches from the relational crossJoin to the
    result-identical vectorized kernel (kmeans._assign_gemm — the
    SemDeDup paper's own GEMM assignment), so BOTH stages of the
    operator now carry their scale mitigation in code."""
    vecs = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("v")
    ).localCheckpoint(eager=False)
    # the count() that drives the dispatch also materializes the
    # checkpoint every later stage reads — the probe is not an extra
    # pass over the data
    n = vecs.count()
    k = semdedup_effective_k(n, k, max_mean_cell_rows)
    assign = _assign_gemm if n * k >= gemm_min_product > 0 else _assign
    centroids = vecs.filter(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cluster"), F.col("v").alias("c")
    )
    assigned = None
    for _ in range(iterations):
        assigned = assign(vecs, centroids)
        centroids = _update(assigned).localCheckpoint(eager=False)
    # members: (vec_id, cluster, dist, v, nrm). The assignment already
    # carries v (kmeans._assign keeps it), so no join back to vecs.
    members = assigned.withColumn(
        "nrm", F.sqrt(F.expr(_DOT.format(a="v", b="v")))
    ).localCheckpoint(eager=False)
    r = members.select(
        F.col("vec_id").alias("r_id"),
        F.col("cluster"),
        F.col("dist").alias("r_dist"),
        F.col("v").alias("r_v"),
        F.col("nrm").alias("r_nrm"),
    )
    o = members.select(
        F.col("vec_id").alias("o_id"),
        F.col("cluster"),
        F.col("dist").alias("o_dist"),
        F.col("v").alias("o_v"),
        F.col("nrm").alias("o_nrm"),
    )
    cos = F.round(
        F.expr(_DOT.format(a="r_v", b="o_v")) / (F.col("r_nrm") * F.col("o_nrm")), 6
    )
    outranked = (F.col("o_dist") > F.col("r_dist")) | (
        (F.col("o_dist") == F.col("r_dist")) & (F.col("o_id") < F.col("r_id"))
    )
    removed = (
        r.join(o, "cluster")
        .filter(F.col("o_id") != F.col("r_id"))
        .filter(outranked)
        .filter(cos >= tau)
        .select(F.col("r_id").alias("vec_id"))
        .distinct()
    )
    return (
        members.join(
            removed.withColumn("_rm", F.lit(1)), "vec_id", "left"
        )
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(F.coalesce(F.col("_rm"), F.lit(0))).alias("n_removed"),
            (
                F.count(F.lit(1)) - F.sum(F.coalesce(F.col("_rm"), F.lit(0)))
            ).alias("n_kept"),
        )
    )


# --------------------------------------------------------------- oracle
_KM_DIST = "round(list_sum(list_transform(range(1, len(v) + 1), i -> (v[i] - c[i]) * (v[i] - c[i]))), 6)"
_KM_EXPL = "unnest(list_transform(range(1, len(v) + 1), i -> {'idx': i, 'x': v[i]}))"


def semdedup_oracle_sql(
    vectors_cte: str, k: int = 8, tau: float = 0.999
) -> str:
    """DuckDB twin: two unrolled Lloyd rounds (identical CTE structure
    to the kmeans_profile oracle) + the EXISTS-style removal self-join.
    `vectors_cte` must yield (vec_id, v) with v already DOUBLE[]."""
    return f"""
WITH v AS ({vectors_cte}),
c0 AS (SELECT CAST(vec_id AS INT) AS cluster, v AS c FROM v WHERE vec_id < {k}),
d1 AS (SELECT vec_id, v, cluster, {_KM_DIST} AS dist FROM v CROSS JOIN c0),
a1 AS (SELECT vec_id, v, cluster, dist FROM
        (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn FROM d1)
       WHERE rn = 1),
e1 AS (SELECT cluster, {_KM_EXPL} AS u FROM a1),
m1 AS (SELECT cluster, u.idx AS idx, round(avg(u.x), 6) AS x FROM e1 GROUP BY 1, 2),
c1 AS (SELECT cluster, list(x ORDER BY idx) AS c FROM m1 GROUP BY 1),
d2 AS (SELECT vec_id, v, cluster, {_KM_DIST} AS dist FROM v CROSS JOIN c1),
a2 AS (SELECT vec_id, v, cluster, dist FROM
        (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn FROM d2)
       WHERE rn = 1),
mem AS (SELECT vec_id, v, cluster, dist,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
        FROM a2),
rem AS (SELECT DISTINCT r.vec_id
        FROM mem r JOIN mem o ON o.cluster = r.cluster
         AND o.vec_id <> r.vec_id
         AND (o.dist > r.dist OR (o.dist = r.dist AND o.vec_id < r.vec_id))
         AND round(list_sum(list_transform(range(1, len(r.v) + 1),
                                           i -> r.v[i] * o.v[i]))
                   / (r.nrm * o.nrm), 6) >= {tau})
SELECT m.cluster,
       count(*) AS n_members,
       CAST(sum(CASE WHEN rem.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       CAST(count(*) - sum(CASE WHEN rem.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM mem m LEFT JOIN rem ON rem.vec_id = m.vec_id
GROUP BY m.cluster
"""
