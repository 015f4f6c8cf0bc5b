"""Round-8 extension registry: map-side MinHash + streaming-dedup
batch twins.

`operators/dedup.minhash_signatures_mapside` is the zero-shuffle
per-row signature form (see its docstring for the wide-vs-mapside
scale trade); it exists primarily so the streaming ingest dedup
(streaming/dedup.py) has a map-only expression chain in front of its
single stateful operator. These two queries give the new primitive
full driver-oracle coverage:

- `minhash_mapside_signatures` pins every one of the k=8 per-doc
  minima (rendered as the scalar sig_key the streaming dedup keys on)
  against the DuckDB twin — one flipped bit anywhere in the
  shingle/hash/min chain fails the hash compare.
- `signature_dedup_groups` is the batch twin of the STREAM's output
  contract: the near-exact duplicate groups (>= 2 docs sharing a
  signature) with their canonical (min-id) member. The streaming
  golden (tests/test_streaming_dedup.py) asserts the stream's
  survivor-key set equals this table's key universe.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sh_design_spark.operators.dedup import minhash_signatures_mapside_sql
from etl_sh_design_spark.registry import _t, query
from etl_sh_design_spark.streaming.dedup import with_signature_key

_K = 8  # signature width for the streaming-dedup family (k md5s/row)

_SIG_KEY_SQL = f"""
WITH sig AS ({minhash_signatures_mapside_sql('documents', k=_K)})
SELECT doc_id,
       array_to_string(list_transform(sig, x -> CAST(x AS VARCHAR)), ',') AS sig_key
FROM sig
"""


@query("minhash_mapside_signatures", _SIG_KEY_SQL)
def q_minhash_mapside_signatures(spark, sf_dir):
    """Per-doc map-side MinHash signature key (zero-shuffle plan: the
    physical plan is scan -> project -> filter, no exchange —
    asserted by tests/test_plans.py)."""
    docs = _t(spark, sf_dir, "documents")
    return with_signature_key(docs, k=_K).select("doc_id", "sig_key")


_GROUPS_SQL = f"""
WITH sig AS ({minhash_signatures_mapside_sql('documents', k=_K)}),
keyed AS (
  SELECT doc_id,
         array_to_string(list_transform(sig, x -> CAST(x AS VARCHAR)), ',') AS sig_key
  FROM sig
)
SELECT sig_key,
       MIN(doc_id) AS canonical_id,
       COUNT(*) AS n_docs
FROM keyed
GROUP BY sig_key
HAVING COUNT(*) >= 2
"""


@query("signature_dedup_groups", _GROUPS_SQL)
def q_signature_dedup_groups(spark, sf_dir):
    """Near-exact duplicate groups by identical MinHash signature —
    the batch twin of streaming/dedup.streaming_signature_dedup's
    output contract. One |groups|-sized shuffle after the map-side
    signature projection."""
    docs = _t(spark, sf_dir, "documents")
    return (
        with_signature_key(docs, k=_K)
        .groupBy("sig_key")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .filter(F.col("n_docs") >= 2)
    )
