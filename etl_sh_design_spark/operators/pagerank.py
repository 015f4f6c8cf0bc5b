"""PageRank as declarative iterative dataflow (Pregel-on-DataFrames).

The second iterative-algorithm pattern in the engine (beside
`operators/kmeans.py`): each power-iteration round is ONE keyed
shuffle — contributions are `edges ⋈ ranks` grouped by destination —
with `localCheckpoint` between rounds to cut lineage. Rank state is
|V| rows; the edge list is scanned once per round and never
re-shuffled after the initial `repartition(src)`-friendly layout
(Catalyst reuses the exchange across rounds' joins on `src`).

Semantics are the classic Spark-example PageRank (`rank = 0.15 +
0.85 · Σ_in rank/outdeg`, no dangling-mass redistribution — dangling
nodes simply leak mass, documented); good enough for link-analysis
feature extraction in a data pipeline, and exactly expressible as an
unrolled CTE chain for the DuckDB oracle.

Determinism contract (cross-engine hash equality):
- ranks quantized with round(·, 9) after EVERY iteration, so float
  accumulation-order noise (~1e-16 relative) can never propagate;
- final output rank rounded to 6dp;
- all arithmetic in double.

At 100 TB-graph scale the per-round shuffle is |E| keyed by dst and
the rank table is |V| — the same contract GraphX/Pregel documents;
skewed hubs fall under AQE skew-split like any other groupBy key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
BASE = 0.15  # (1 - DAMPING), kept explicit to mirror the oracle text


def pagerank(
    edges: DataFrame, iterations: int = 3, small_state: bool = False
) -> DataFrame:
    """Run `iterations` power-iteration rounds over an edge list
    (src: bigint, dst: bigint); returns (node, out_deg, in_deg, rank)
    with rank rounded to 6dp.

    Nodes are the union of src and dst; initial rank 1.0. Nodes with
    no in-edges settle at BASE after one round (classic formulation).

    `small_state=True` declares the |V|-sized rank/degree state
    broadcastable (e.g. a bucketed/derived graph): every per-round
    join then runs map-side and each round costs exactly ONE shuffle
    (the groupBy-dst contribution agg). Leave False for web-scale
    graphs where |V| itself is distributed — the joins fall back to
    the shuffled path AQE plans.
    """
    b = F.broadcast if small_state else (lambda df: df)
    edges = edges.select("src", "dst").distinct().localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = nodes.select("node", F.lit(1.0).cast("double").alias("rank"))
    for _ in range(iterations):
        contrib = (
            edges.join(b(outdeg), "src")
            .join(b(ranks), edges.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("mass"))
        )
        ranks = (
            nodes.join(b(contrib), nodes.node == contrib.dst, "left")
            .select(
                "node",
                F.round(
                    F.lit(BASE) + F.lit(DAMPING) * F.coalesce("mass", F.lit(0.0)),
                    9,
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    indeg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("in_deg"))
    return (
        nodes.join(b(outdeg), nodes.node == outdeg.src, "left")
        .join(b(indeg), nodes.node == indeg.dst, "left")
        .join(b(ranks), "node")
        .select(
            "node",
            F.coalesce("deg", F.lit(0)).cast("bigint").alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).cast("bigint").alias("in_deg"),
            F.round("rank", 6).alias("rank"),
        )
    )


def pagerank_oracle_sql(edges_cte: str, iterations: int = 3) -> str:
    """Unrolled-CTE DuckDB twin: `edges_cte` must be a full SELECT
    producing (src, dst); each iteration becomes one CTE, quantized
    identically to the Spark side."""
    parts = [
        f"WITH edges AS ({edges_cte}),",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),",
        "outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),",
        "r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS rank FROM nodes),",
    ]
    for i in range(iterations):
        parts.append(
            f"r{i + 1} AS (\n"
            f"  SELECT n.node,\n"
            f"         round({BASE} + {DAMPING} * coalesce(sum(r.rank / d.deg), 0), 9) AS rank\n"
            f"  FROM nodes n\n"
            f"  LEFT JOIN edges e ON e.dst = n.node\n"
            f"  LEFT JOIN r{i} r ON r.node = e.src\n"
            f"  LEFT JOIN outdeg d ON d.src = e.src\n"
            f"  GROUP BY n.node\n"
            f"),"
        )
    parts.append(
        "indeg AS (SELECT dst, count(*) AS in_deg FROM edges GROUP BY 1)\n"
        "SELECT n.node,\n"
        "       CAST(coalesce(o.deg, 0) AS BIGINT) AS out_deg,\n"
        "       CAST(coalesce(i.in_deg, 0) AS BIGINT) AS in_deg,\n"
        f"       round(r{iterations}.rank, 6) AS rank\n"
        "FROM nodes n\n"
        "LEFT JOIN outdeg o ON o.src = n.node\n"
        "LEFT JOIN indeg i ON i.dst = n.node\n"
        f"JOIN r{iterations} ON r{iterations}.node = n.node"
    )
    return "\n".join(parts)
