"""K-means (Lloyd) as declarative iterative dataflow.

The iterative-algorithm pattern on Spark: each Lloyd round is a
broadcast join (vectors x k centroids), an argmin, and a per-dimension
mean — all built-in DataFrame ops, no UDF, with `localCheckpoint`
between rounds to cut lineage (same discipline as
`operators/graph.py`). Centroid state is k×dim rows — driver-tiny at
any corpus scale, while the vector side never leaves its partitions
(the only shuffle is the per-(cluster, dim) mean, k×dim groups).

Determinism contract (what makes the DuckDB oracle hash-match):
- all arithmetic in double (float -> double is exact),
- distances rounded to 6dp BEFORE the argmin, ties -> lowest cluster,
- centroid means rounded to 6dp each round,
- the distance fold runs in index order on both engines.

Init is deterministic: centroid j = vector with vec_id == j. At real
scale swap in k-means|| sampling for the seed WITHOUT touching the
round structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SQDIST = (
    "round(aggregate(zip_with(v, c, (a, b) -> (a - b) * (a - b)), "
    "cast(0.0 as double), (acc, x) -> acc + x), 6)"
)


def _as_double(col: str) -> F.Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _assign(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, v) x (cluster, c) -> (vec_id, v, cluster, dist);
    nearest centroid, rounded-distance argmin, ties -> lowest id."""
    d = vecs.crossJoin(F.broadcast(centroids)).withColumn("dist", F.expr(_SQDIST))
    best = d.groupBy("vec_id").agg(
        F.min(F.struct("dist", "cluster")).alias("m"), F.first("v").alias("v")
    )
    return best.select(
        "vec_id", "v", F.col("m.cluster").alias("cluster"), F.col("m.dist").alias("dist")
    )


def _update(assigned: DataFrame) -> DataFrame:
    """Per-cluster mean vector, 6dp, reassembled in dimension order."""
    dims = assigned.select("cluster", F.posexplode("v").alias("pos", "x"))
    means = dims.groupBy("cluster", "pos").agg(F.round(F.avg("x"), 6).alias("x"))
    return means.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "x"))), lambda s: s["x"]
        ).alias("c")
    )


def lloyd(
    embeddings: DataFrame,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run `iterations` Lloyd rounds; returns the final assignment
    (vec_id, cluster, dist) with distances to the LAST round's
    centroids."""
    vecs = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("v")
    ).localCheckpoint(eager=False)
    centroids = vecs.filter(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cluster"), F.col("v").alias("c")
    )
    assigned = None
    for _ in range(iterations):
        assigned = _assign(vecs, centroids)
        centroids = _update(assigned).localCheckpoint(eager=False)
    return assigned.select("vec_id", "cluster", "dist")


def kmeans_cluster_profile(
    embeddings: DataFrame, k: int = 8, iterations: int = 2
) -> DataFrame:
    """Aggregate surface for the oracle: per final cluster, member
    count, inertia (sum of rounded distances, re-rounded), and a
    checksum of the last centroid update."""
    # checkpoint the cast vectors once: every Lloyd round (and the
    # final stats pass) reads them, and without this each consumer
    # re-runs the parquet scan + float->double cast
    vecs = embeddings.select(
        F.col("vec_id"), _as_double("embedding").alias("v")
    ).localCheckpoint(eager=False)
    centroids = vecs.filter(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cluster"), F.col("v").alias("c")
    )
    assigned = None
    for i in range(iterations):
        assigned = _assign(vecs, centroids)
        if i == iterations - 1:
            # the last assignment feeds BOTH the stats agg and the
            # final centroid update (for the checksum); materialize it
            # once instead of running the round twice
            assigned = assigned.localCheckpoint(eager=False)
        centroids = _update(assigned).localCheckpoint(eager=False)
    stats = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.sum("dist"), 4).alias("inertia"),
    )
    csum = centroids.select(
        "cluster",
        F.round(
            F.aggregate("c", F.lit(0.0).cast("double"), lambda acc, x: acc + x), 4
        ).alias("centroid_checksum"),
    )
    return stats.join(csum, "cluster").select(
        "cluster", "n_vecs", "inertia", "centroid_checksum"
    )
