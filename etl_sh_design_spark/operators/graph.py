"""Connected components — duplicate-cluster resolution.

Near-dup operators (MinHash/SimHash/Jaccard) emit PAIRS; a dedup
pipeline needs CLUSTERS (every doc labeled with a canonical id) so one
representative per cluster survives. That closure step is a
connected-components problem.

Algorithm: iterative min-label propagation — every node starts as its
own component, each round every node takes the min label among itself
and its neighbors, until a fixpoint. Converges in O(graph diameter)
rounds; near-dup graphs are overwhelmingly tiny cliques (diameter
1-2), so 3-5 rounds in practice.

Scale notes: each round is one join (labels x edges) + one min-agg —
two hash shuffles on node id, no collect, state is one row per node.
Lineage is cut with localCheckpoint each round (iterative plans
otherwise stack exponentially in the optimizer). For adversarial
long-chain graphs at 100 TB, switch to the large-star/small-star
variant (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) which converges in O(log^2 n) — same join/agg
building blocks, different edge rewrite per round. Not needed for
dedup-shaped graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node with its component id = min node id reachable.

    `nodes`: one column `node_col` (include isolated nodes).
    `edges`: `src_col`, `dst_col` (undirected; any orientation).
    Returns (node, component).
    """
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .unionByName(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Only edge endpoints can ever change label; isolated nodes (the
    # overwhelming majority in a dedup graph — most documents have no
    # near-dup) are reattached after the fixpoint with component=node,
    # so the iteration's joins run on |V(edges)|, not |nodes|.
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            labels.join(sym, labels["node"] == sym["src"])
            .groupBy(sym["dst"].alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        # Carry a per-row changed flag through the checkpoint so the
        # convergence test is a scan of already-materialized partitions,
        # not a second join job against the previous labels.
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
                (F.coalesce("nbr_component", F.col("component")) < F.col("component")).alias(
                    "_changed"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            converged = True
            break
    if not converged:
        import warnings

        warnings.warn(
            f"connected_components: no fixpoint within max_iter={max_iter} rounds; "
            "component labels may be unconverged (long-chain graph?). "
            "Raise max_iter or switch to a large-star/small-star variant.",
            RuntimeWarning,
            stacklevel=2,
        )
    all_nodes = nodes.select(F.col(node_col).alias("node"))
    return all_nodes.join(labels, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )
