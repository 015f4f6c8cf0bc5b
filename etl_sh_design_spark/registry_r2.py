"""Round-2 registry additions: time-range window frames, sliding
windows, sub-document (passage) dedup, TF-IDF similarity, and JSON
extraction — extension-layer queries (not reference operators) that a
large-scale training-data / event pipeline needs, registered under the
same Spark-vs-DuckDB oracle contract as everything else.

Scale notes per query live on the docstrings; the common theme: every
query here is a scan -> narrow transform -> one keyed shuffle, no
collect, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etl_sh_design_spark.registry import _t, query
from etl_sh_design_spark.registry_ext import CORPUS_MUTATED_SQL, _corpus_mutated, _repartitioned

# ------------------------------------------------- time-range frames
_TEN_MIN_US = 600_000_000


@query(
    "range_frame_events",
    f"""
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       count(*) OVER w AS n_10m,
       round(sum(value) OVER w, 6) AS sum_10m
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN {_TEN_MIN_US} PRECEDING AND CURRENT ROW)
""",
)
def q_range_frame_events(spark, sf_dir):
    """Per-event trailing 10-minute window (RANGE frame over event
    time, microsecond precision): count + sum of `value` per user.
    The frame is expressed on unix_micros so both engines bound it
    with exact integer arithmetic. One shuffle on user_id; state per
    task is the in-frame buffer (bounded by events/user/10min)."""
    e = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-_TEN_MIN_US, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.count(F.lit(1)).over(w).alias("n_10m"),
        F.round(F.sum("value").over(w), 6).alias("sum_10m"),
    )


# --------------------------------------------------- sliding windows
_SLIDE_US = 300_000_000  # 5 min
_WIN_US = 600_000_000  # 10 min


@query(
    "sliding_window_events",
    f"""
WITH x AS (
  SELECT (epoch_us(ts) // {_SLIDE_US}) * {_SLIDE_US} AS w1, value, user_id
  FROM events
),
u AS (
  SELECT unnest([w1, w1 - {_SLIDE_US}]) AS win_start_us, value, user_id FROM x
)
SELECT win_start_us, count(*) AS n_events,
       round(sum(value), 6) AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM u GROUP BY 1
""",
)
def q_sliding_window_events(spark, sf_dir):
    """Sliding event-time windows (10 min window, 5 min slide): each
    event lands in exactly window/slide = 2 windows. Spark's F.window
    generates the per-event window replicas map-side; the oracle
    unnests the two slide-aligned starts explicitly. This is the batch
    twin of the streaming sliding-window aggregation
    (streaming/windows.py); shuffle is |windows|-sized."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.unix_micros("win.start").alias("win_start_us"),
            "n_events",
            "sum_value",
            "n_users",
        )
    )


# ------------------------------------------------------ passage dedup
_PASS_N = 8  # tokens per passage (non-overlapping stride)

_TOKS = "filter(split(lower(text), '\\\\s+'), t -> t != '')"
_PASSAGES = (
    f"CASE WHEN size(toks) >= {_PASS_N} THEN "
    f"transform(sequence(0, cast(floor(size(toks) / {_PASS_N}) as int) - 1), "
    f"i -> concat_ws(' ', slice(toks, i * {_PASS_N} + 1, {_PASS_N}))) "
    f"ELSE array() END"
)


@query(
    "passage_dedup",
    f"""
WITH corpus AS ({CORPUS_MUTATED_SQL}),
t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '') AS toks
  FROM corpus
),
p AS (
  SELECT doc_id,
         unnest(CASE WHEN len(toks) >= {_PASS_N}
                THEN list_transform(range(0, CAST(floor(len(toks) / {_PASS_N}) AS INT)),
                       i -> array_to_string(toks[i * {_PASS_N} + 1 : i * {_PASS_N} + {_PASS_N}], ' '))
                ELSE [] END) AS passage
  FROM t
)
SELECT md5(passage) AS passage_key,
       count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_occ,
       min(doc_id) AS canonical_id
FROM p GROUP BY 1
HAVING count(DISTINCT doc_id) > 1
""",
)
def q_passage_dedup(spark, sf_dir):
    """Sub-document dedup: split each doc into consecutive 8-token
    passages and report passages shared across documents (boilerplate /
    quotation detection — finer-grained than whole-doc dedup). Hash
    groupBy on the passage key: |passages| map-side rows, |groups|
    shuffle rows, same plan shape as exact dedup at any scale."""
    corpus = _corpus_mutated(spark, sf_dir)
    p = corpus.select("doc_id", F.expr(_TOKS).alias("toks")).select(
        "doc_id", F.explode(F.expr(_PASSAGES)).alias("passage")
    )
    return (
        p.groupBy(F.md5("passage").alias("passage_key"))
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
            F.min("doc_id").alias("canonical_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


# --------------------------------------------------- TF-IDF similarity
@query(
    "tfidf_cosine_topk",
    r"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t != '')) AS token
  FROM documents
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
w AS (
  SELECT tf.doc_id, tf.token,
         tf.tf * ln((n.n_docs + 1.0e0) / (df.df + 1.0e0)) AS wgt
  FROM tf JOIN df USING (token) CROSS JOIN n
),
nrm AS (SELECT doc_id, sqrt(sum(wgt * wgt)) AS nrm FROM w GROUP BY 1),
dots AS (
  SELECT q.doc_id AS qid, c.doc_id AS cid, sum(q.wgt * c.wgt) AS dot
  FROM w q JOIN w c ON q.token = c.token AND q.doc_id <> c.doc_id
  WHERE q.doc_id < 10
  GROUP BY 1, 2
),
scored AS (
  SELECT qid, cid, round(dot / (nq.nrm * nc.nrm), 6) AS cos
  FROM dots JOIN nrm nq ON nq.doc_id = qid JOIN nrm nc ON nc.doc_id = cid
)
SELECT qid, cid, cos,
       CAST(rk AS INT) AS rk
FROM (
  SELECT qid, cid, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rk
  FROM scored
)
WHERE rk <= 3
""",
)
def q_tfidf_cosine_topk(spark, sf_dir):
    """TF-IDF cosine top-3 similar documents for the first 10 docs:
    sparse-vector similarity via an inverted-index join on token —
    the classic scale path for text similarity (cost is sum over
    tokens of q_freq x c_freq, never |docs|^2). Cosine is rounded 6dp
    BEFORE ranking, ties broken by cid, as everywhere else."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    d = _repartitioned(spark, d)
    tok = d.select("doc_id", F.explode(F.expr(_TOKS)).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = d.select(F.countDistinct("doc_id").alias("n_docs"))
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    # The weighted postings table fans out THREE ways (norms, probe
    # side, inverted-index join) — without the cache each consumer
    # re-runs the tokenize -> tf -> idf chain from the scan (measured
    # 3 full recomputes; min wall 5.7 -> 3.5 s at sf0.1). .cache(),
    # NOT localCheckpoint(eager=False): under AQE a "lazy" checkpoint
    # still executes every upstream query stage at BUILD time
    # (AdaptiveSparkPlanExec materializes on toRdd — measured 9 jobs
    # from construction alone), which breaks the laziness gate.
    w = (
        tf.join(F.broadcast(df_), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            (
                F.col("tf")
                * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
            ).alias("wgt"),
        )
        .cache()
    )
    nrm = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("wgt") * F.col("wgt"))).alias("nrm"))
    q = w.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("qid"), "token", F.col("wgt").alias("qw")
    )
    dots = (
        w.select(F.col("doc_id").alias("cid"), "token", F.col("wgt").alias("cw"))
        .join(F.broadcast(q), "token")
        .filter(F.col("qid") != F.col("cid"))
        .groupBy("qid", "cid")
        .agg(F.sum(F.col("qw") * F.col("cw")).alias("dot"))
    )
    nq = nrm.select(F.col("doc_id").alias("qid"), F.col("nrm").alias("nq"))
    nc = nrm.select(F.col("doc_id").alias("cid"), F.col("nrm").alias("nc"))
    scored = (
        dots.join(F.broadcast(nq), "qid")
        .join(F.broadcast(nc), "cid")
        .select("qid", "cid", F.round(F.col("dot") / (F.col("nq") * F.col("nc")), 6).alias("cos"))
    )
    rk = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rk", F.row_number().over(rk).cast("int"))
        .filter(F.col("rk") <= 3)
        .select("qid", "cid", "cos", "rk")
    )


# ------------------------------------------------------ BM25 retrieval
# fixed query-term set: one rare token ('dup' — the near-dup mutation
# marker, df~5% of docs, high idf) anchors the ranking; four
# mid-frequency tokens exercise the dl/avgdl length normalization
_BM25_TERMS = ("dup", "spark", "vector", "merge", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75


@query(
    "bm25_topk",
    r"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t != '')) AS token
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
stats AS (SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl),
terms AS (SELECT * FROM (VALUES ('dup'), ('spark'), ('vector'), ('merge'), ('window')) AS t(token)),
tf AS (
  SELECT tok.doc_id, tok.token, count(*) AS tf
  FROM tok JOIN terms USING (token) GROUP BY 1, 2
),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
contrib AS (
  SELECT tf.doc_id,
         ln(1.0e0 + (s.n_docs - df.df + 0.5e0) / (df.df + 0.5e0))
         * (tf.tf * (1.2e0 + 1.0e0))
         / (tf.tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * dl.dl / s.avgdl)) AS w
  FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats s
),
scored AS (
  SELECT doc_id, CAST(count(*) AS INT) AS n_terms, round(sum(w), 6) AS score
  FROM contrib GROUP BY 1
)
SELECT doc_id, n_terms, score, CAST(rk AS INT) AS rk
FROM (
  SELECT doc_id, n_terms, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rk
  FROM scored
)
WHERE rk <= 10
""",
)
def q_bm25_topk(spark, sf_dir):
    """BM25 (k1=1.2, b=0.75, Lucene idf) top-10 documents for a fixed
    5-term query — the ranked-retrieval companion to
    `tfidf_cosine_topk`'s all-pairs similarity: the scoring primitive a
    retrieval/decontamination pass runs per probe query over a 100 TB
    corpus. Score is rounded 6dp BEFORE ranking, ties by doc_id, as
    everywhere else.

    Scale shape: one token-explode scan feeds BOTH the per-doc length
    (map-side partial count) and the query-term postings — the isin()
    filter on the 5-term set cuts the postings map-side, so every join
    after the scan is query-term-sized, not corpus-sized. df (5 rows)
    and the avgdl/N scalar broadcast; dl joins on doc_id (the one keyed
    shuffle). Top-10 is orderBy+limit -> TakeOrderedAndProject (per-
    partition heaps + driver merge of 10-row heads, never a global
    sort); rk is assigned AFTER the limit so the window sees 10 rows."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    d = _repartitioned(spark, d)
    tok = d.select("doc_id", F.explode(F.expr(_TOKS)).alias("token"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.avg("dl").alias("avgdl"), F.count(F.lit(1)).alias("n_docs")
    )
    tf = (
        tok.filter(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") + F.lit(_BM25_K1) * (
        F.lit(1.0 - _BM25_B) + F.lit(_BM25_B) * F.col("dl") / F.col("avgdl")
    )
    contrib = (
        tf.join(F.broadcast(df_), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (idf * (F.col("tf") * F.lit(_BM25_K1 + 1.0)) / norm).alias("w"),
        )
    )
    scored = contrib.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_terms"),
        F.round(F.sum("w"), 6).alias("score"),
    )
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)
    rk = F.row_number().over(W.orderBy(F.col("score").desc(), F.col("doc_id").asc()))
    return top.select("doc_id", "n_terms", "score", rk.cast("int").alias("rk"))


# ---------------------------------------------------- JSON extraction
@query(
    "json_props_rollup",
    """
SELECT event_type,
       count(*) AS n,
       CAST(sum(k) AS BIGINT) AS sum_k,
       round(avg(k), 6) AS avg_k,
       CAST(max(k) AS BIGINT) AS max_k
FROM (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
GROUP BY 1
""",
)
def q_json_props_rollup(spark, sf_dir):
    """Semi-structured extraction: pull `$.k` out of the JSON `props`
    column and aggregate per event type. get_json_object evaluates
    JVM-side inside codegen — schema-on-read without a UDF; at scale
    prefer from_json with an explicit schema (single parse, typed
    struct) — both stay in the scan->agg pipeline."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
    )


# ----------------------------------------------------- grouping sets
@query(
    "grouping_sets_revenue",
    """
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
)
def q_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (finer than rollup/cube: an arbitrary
    lattice subset) with GROUPING() flags to disambiguate NULL-as-total
    from NULL-as-value. Executes as a single Expand + one aggregate —
    the multi-set expansion is map-side, so the shuffle carries
    |sets| x |groups| rows, not |sets| x |input|."""
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status,
               CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


# ------------------------------------------- rank-distribution windows
@query(
    "rank_distribution_orders",
    """
SELECT o_orderpriority,
       CAST(least(9, floor(pr * 10)) AS INT) AS pr_decile,
       count(*) AS n,
       round(max(cd), 6) AS max_cume_dist
FROM (
  SELECT o_orderpriority,
         round(percent_rank() OVER w, 6) AS pr,
         round(cume_dist() OVER w, 6) AS cd
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
)
GROUP BY 1, 2
""",
)
def q_rank_distribution(spark, sf_dir):
    """percent_rank / cume_dist rank distributions per order priority,
    folded into deciles. The window sorts within each priority
    partition (one shuffle); the decile fold keeps the checkable
    surface |priorities| x 10 regardless of scale. Ties broken by
    o_orderkey so both engines rank identically."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    r = o.select(
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )
    return (
        r.groupBy(
            "o_orderpriority",
            F.least(F.lit(9), F.floor(F.col("pr") * 10)).cast("int").alias("pr_decile"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("cd"), 6).alias("max_cume_dist"),
        )
    )


# --------------------------------------------------- null-safe equality
@query(
    "nullsafe_join_customers",
    """
WITH a AS (
  SELECT c_custkey, nullif(c_nationkey % 7, 3) AS k FROM customer
),
b AS (
  SELECT nullif(n_nationkey % 7, 3) AS k, count(*) AS n_nations
  FROM nation GROUP BY 1
)
SELECT coalesce(CAST(a.k AS VARCHAR), 'NULL') AS k_str,
       count(*) AS n_customers,
       CAST(min(b.n_nations) AS BIGINT) AS n_nations
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
GROUP BY 1
""",
)
def q_nullsafe_join(spark, sf_dir):
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of dropping — the semantics CDC and
    late-dimension pipelines need when NULL is a real key value. NULLs
    are injected via nullif since the driver tables are null-free.
    Spark executes <=> as a hash join (null-safe keys hash like any
    value), so the plan is the ordinary broadcast/SMJ shape — no
    nested-loop penalty."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", F.nullif(F.col("c_nationkey") % 7, F.lit(3)).alias("k")
    )
    n = (
        _t(spark, sf_dir, "nation")
        .select(F.nullif(F.col("n_nationkey") % 7, F.lit(3)).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_nations"))
    )
    j = c.join(n, c["k"].eqNullSafe(n["k"])).select(
        F.coalesce(c["k"].cast("string"), F.lit("NULL")).alias("k_str"),
        "n_nations",
    )
    return j.groupBy("k_str").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min("n_nations").cast("bigint").alias("n_nations"),
    )


# ------------------------------------------- outer-join distribution
@query(
    "q13_custdist",
    """
WITH c_orders AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY 1
)
SELECT c_count, count(*) AS custdist
FROM c_orders GROUP BY 1
""",
)
def q_q13_custdist(spark, sf_dir):
    """TPC-H Q13 shape: LEFT OUTER join with a right-side predicate in
    the ON clause (push it to WHERE and the semantics silently change:
    customers whose only orders are urgent must still appear with
    c_count=0), then a two-level aggregate. At scale: the outer join
    shuffles on custkey; the second agg is tiny (distinct counts).
    count(o_orderkey) over the null-extended rows is the non-null
    count, matching SQL semantics in both engines."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------- scalar subquery + anti join
@query(
    "q22_idle_customers",
    """
WITH avg_bal AS (
  SELECT round(avg(c_acctbal), 2) AS a FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey % 10 AS code,
       count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.a
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY 1
""",
)
def q_q22_idle_customers(spark, sf_dir):
    """TPC-H Q22 shape: global-average scalar subquery (broadcast as a
    1-row cross join), NOT EXISTS anti join (against the customer's
    urgent orders — the synthetic data gives every customer at least
    one order, so the anti-join side is the urgent subset to keep the
    result non-degenerate), then a grouped rollup. The average is
    rounded to 2dp on both sides before the comparison so the
    threshold cannot flip on last-bit summation-order differences.
    At scale the anti join shuffles on custkey (or broadcasts the
    distinct custkeys of the smaller side); the scalar is one row."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    a = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.round(F.avg("c_acctbal"), 2).alias("a")
    )
    rich = c.join(F.broadcast(a)).filter(F.col("c_acctbal") > F.col("a"))
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy((F.col("c_nationkey") % 10).alias("code")).agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


# ---------------------------------------------- SCD Type-2 dimension
@query(
    "scd2_user_history",
    """
WITH ordered AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id) AS prev_type
  FROM events
),
changes AS (
  SELECT user_id, event_type, ts_us FROM ordered
  WHERE prev_type IS NULL OR event_type <> prev_type
)
SELECT user_id, event_type,
       ts_us AS valid_from_us,
       lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS valid_to_us,
       CAST(lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) IS NULL
            AS BOOLEAN) AS is_current
FROM changes
""",
)
def q_scd2_user_history(spark, sf_dir):
    """SCD Type-2 dimension build from a change stream: consecutive
    duplicate states are compacted (only rows where event_type differs
    from the previous row open a new version), each version carries
    [valid_from, valid_to) microsecond bounds, and the open version is
    flagged is_current. The standard CDC -> warehouse-dimension
    pattern. Two windows over the SAME (user_id, ts) partitioning —
    Spark reuses one shuffle/sort for both (and for the downstream
    lead), so the whole build is a single exchange. Ties broken by
    event_id so both engines pick identical predecessors."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    changes = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .select("user_id", "event_type", "ts_us")
    )
    w2 = W.partitionBy("user_id").orderBy("ts_us")
    nxt = F.lead("ts_us").over(w2)
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts_us").alias("valid_from_us"),
        nxt.alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    )


# ------------------------------------------- statistical aggregates
@query(
    "regression_stats",
    """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 6) AS covar_qty_price,
       round(stddev_samp(l_extendedprice), 6) AS std_price,
       round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
FROM lineitem
GROUP BY 1
""",
)
def q_regression_stats(spark, sf_dir):
    """Bivariate statistical aggregates per group: Pearson correlation,
    sample covariance, stddev, and OLS slope/intercept (price ~ qty).
    All are single-pass partial-aggregable moments — Catalyst computes
    them map-side and merges, no second scan, no window. Rounded to
    6dp: the moment accumulation order differs between engines."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 6).alias("covar_qty_price"),
        F.round(F.stddev_samp("l_extendedprice"), 6).alias("std_price"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 6).alias("intercept"),
        F.regr_count("l_extendedprice", "l_quantity").cast("bigint").alias("n"),
    )


# ------------------------------------- dedup: representative selection
@query(
    "dedup_keep_best",
    None,  # SQL built below (reuses the dedup_clusters recursion)
)
def q_dedup_keep_best(spark, sf_dir):
    """The decision step after near-dup clustering: per duplicate
    cluster, KEEP the longest member (ties -> min doc_id) and report
    what was dropped — the rule production dedup uses so truncated /
    mutated variants lose to their fuller original. Pipeline:
    MinHash-LSH pairs -> connected components -> join text lengths ->
    per-cluster row_number pick. The component sub-plan is shared with
    dedup_clusters (registry_ext.dedup_components memoizes it per
    session), so the extra work over dedup_clusters is one
    broadcast-sized join and a window over clusters (cluster size is
    bounded, so the window partition never skews). Oracle: the same
    recursive-CTE closure extended with a ranked representative."""
    from etl_sh_design_spark.registry_ext import _corpus_mutated, dedup_components

    corpus = _corpus_mutated(spark, sf_dir)
    comp = dedup_components(spark, sf_dir)
    lengths = corpus.select("doc_id", F.length("text").alias("n_chars"))
    sized = comp.join(lengths, comp["node"] == lengths["doc_id"]).select(
        "component", "doc_id", "n_chars"
    )
    w = W.partitionBy("component").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    ranked = sized.withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy(F.col("component").alias("cluster_id"))
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("doc_id"))).alias("keep_id"),
            F.max(F.when(F.col("rk") == 1, F.col("n_chars"))).alias("keep_chars"),
            (F.count(F.lit(1)) - 1).alias("n_dropped"),
        )
    )


def _dedup_keep_best_sql() -> str:
    from etl_sh_design_spark.registry_ext import _DEDUP_CLOSURE_CTE

    return (
        _DEDUP_CLOSURE_CTE
        + """
, ranked AS (
  SELECT comp.component, comp.doc_id, length(c2.text) AS n_chars,
         row_number() OVER (PARTITION BY comp.component
                            ORDER BY length(c2.text) DESC, comp.doc_id ASC) AS rk
  FROM comp JOIN corpus c2 ON c2.doc_id = comp.doc_id
)
SELECT component AS cluster_id,
       max(CASE WHEN rk = 1 THEN doc_id END) AS keep_id,
       max(CASE WHEN rk = 1 THEN n_chars END) AS keep_chars,
       count(*) - 1 AS n_dropped
FROM ranked GROUP BY 1
"""
    )


from etl_sh_design_spark.registry import ORACLE as _ORACLE  # noqa: E402

_ORACLE["dedup_keep_best"] = _dedup_keep_best_sql()


# --------------------------------------------- time-series features
_EWMA_ALPHA = 0.5
_EWMA_DEPTH = 8


def _ewma_sql() -> str:
    a = _EWMA_ALPHA
    num = " + ".join(
        f"coalesce({a} * power({1 - a}, {j}) * lag(value, {j}) OVER w, 0.0e0)"
        for j in range(_EWMA_DEPTH)
    )
    den = " + ".join(
        f"CASE WHEN lag(value, {j}) OVER w IS NOT NULL"
        f" THEN {a} * power({1 - a}, {j}) ELSE 0.0e0 END"
        for j in range(_EWMA_DEPTH)
    )
    return f"""
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       round(({num}) / ({den}), 6) AS ewma8
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
"""


@query("ewma_events", _ewma_sql())
def q_ewma_events(spark, sf_dir):
    """Windowed exponential smoothing (depth-8 truncated EWMA) of the
    event value per user: sum_j a(1-a)^j * lag(value, j), renormalized
    over the terms that exist near the partition head. The truncation
    is what keeps the op declarative — a closed-form weighted sum of 8
    lags instead of the recursive full-history EWMA, which needs a
    per-key sequential scan (and whose tail weights are < 0.4% here).
    All 8 lags share one (user_id, ts) sort, so the cost is one
    exchange regardless of depth."""
    e = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    a = _EWMA_ALPHA
    num = sum(
        (
            F.coalesce(
                F.lit(a) * F.lit((1 - a) ** j) * F.lag("value", j).over(w),
                F.lit(0.0),
            )
            for j in range(_EWMA_DEPTH)
        ),
        F.lit(0.0),
    )
    den = sum(
        (
            F.when(F.lag("value", j).over(w).isNotNull(), F.lit(a * (1 - a) ** j)).otherwise(
                F.lit(0.0)
            )
            for j in range(_EWMA_DEPTH)
        ),
        F.lit(0.0),
    )
    return e.select(
        "event_id",
        "user_id",
        "ts_us",
        F.round(num / den, 6).alias("ewma8"),
    )


@query(
    "rolling_median_events",
    """
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       round(median(value) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id
                                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6)
         AS med5
FROM events
""",
)
def q_rolling_median_events(spark, sf_dir):
    """Rolling exact median (last 5 events per user) — the robust
    denoiser for sensor/value streams where the mean is outlier-
    sensitive. Spark rejects median() with a window frame, so the
    frame's values are gathered with collect_list (bounded at 5) and
    the median read off the sorted array — same single (user_id, ts)
    exchange as every other per-user window op, O(frame log frame)
    per row."""
    e = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), "event_id")
        .rowsBetween(-4, 0)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    mid_hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    mid_odd = F.element_at(arr, ((n + 1) / 2).cast("int"))
    med = F.when(n % 2 == 1, mid_odd).otherwise(
        (F.element_at(arr, (n / 2).cast("int")) + mid_hi) / 2.0
    )
    return e.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round(med, 6).alias("med5"),
    )


# ------------------------------------------ TPC-H shape batch (round 2b)
@query(
    "q7_nation_volume",
    """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000.0e0) AS BIGINT)) / 10000.0e0, 2) AS volume
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
WHERE sn.n_name IN ('NATION_1', 'NATION_2')
  AND cn.n_name IN ('NATION_1', 'NATION_2')
  AND sn.n_name <> cn.n_name
GROUP BY 1, 2, 3
""",
)
def q_q7_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape: a 6-relation join chain (fact -> two independent
    dimension arms) with a cross-arm inequality predicate, grouped by
    the pair + year. All four dims broadcast; the fact table is
    touched once and never reshuffled until the final |pairs x years|
    aggregate. The nation filter prunes both arms at the scan."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    nations = ["NATION_1", "NATION_2"]
    sn = n.filter(F.col("n_name").isin(nations)).select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.filter(F.col("n_name").isin(nations)).select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
    ).agg(
        F.round(
            F.sum(
                F.round(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 10000
                ).cast("bigint")
            )
            / 10000.0,
            2,
        ).alias("volume")
    )


@query(
    "q10_returned_revenue",
    """
SELECT c.c_custkey, c.c_name, n.n_name,
       round(c.c_acctbal, 2) AS c_acctbal,
       ((sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000.0e0) AS BIGINT)) + 50) // 100) / 100.0e0 AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND year(o.o_orderdate) = 1996 AND month(o.o_orderdate) <= 3
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)
def q_q10_returned_revenue(spark, sf_dir):
    """TPC-H Q10 shape: revenue lost to returns per customer in a
    quarter — selective date + flag predicates pushed to both fact
    scans, dims broadcast, then a top-20 by revenue (TakeOrdered, no
    global sort materialization). Ties broken by c_custkey so the
    LIMIT cut is deterministic. Revenue is rounded to cents entirely in
    bigint ten-thousandths ((micro + 50) div 100) — a double round(x, 2)
    sits on a half-up knife edge between Spark's decimal-string rounding
    and DuckDB's binary-double rounding."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.year("o_orderdate") == 1996) & (F.month("o_orderdate") <= 3)
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    # join order matters at fact scale: orders(quarter) |><| lineitem(R)
    # first, so only the doubly-filtered slim result rides the custkey
    # shuffle to customer — joining customer before lineitem would drag
    # every customer row through the orderkey exchange too. Nation
    # broadcasts; customer cannot (1.5M rows/SF), so that join is one
    # custkey shuffle.
    j = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
    )
    return (
        j.groupBy(
            "c_custkey", "c_name", "n_name", F.round("c_acctbal", 2).alias("c_acctbal")
        )
        .agg(
            F.sum(
                F.round(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 10000
                ).cast("bigint")
            ).alias("_micro")
        )
        .withColumn("revenue", F.expr("((_micro + 50) div 100) / cast(100 as double)"))
        .drop("_micro")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q14_promo_ratio",
    """
SELECT CAST(year(l_shipdate) AS INT) AS l_year,
       round(100.0e0
             * sum(CAST(round(CASE WHEN p.p_type = 'PROMO'
                         THEN l.l_extendedprice * (1 - l.l_discount)
                         ELSE 0.0e0 END * 10000.0e0) AS BIGINT))
             / sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000.0e0) AS BIGINT)), 6)
         AS promo_pct
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY 1
""",
)
def q_q14_promo_ratio(spark, sf_dir):
    """TPC-H Q14 shape: conditional-aggregate ratio (promo revenue
    share per ship year). The part dim broadcasts; numerator and
    denominator come out of ONE pass (two conditional sums in the same
    aggregate), each rounded 2dp before the division so the ratio is
    engine-deterministic."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    cents = lambda c: F.sum(F.round(c * 10000).cast("bigint"))
    return j.groupBy(F.year("l_shipdate").cast("int").alias("l_year")).agg(
        F.round(
            100.0
            * cents(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
            / cents(rev),
            6,
        ).alias("promo_pct")
    )


@query(
    "q18_large_orders",
    """
SELECT o.o_orderkey, round(o.o_totalprice, 2) AS o_totalprice,
       round(sum(CAST(round(l.l_quantity * 100.0e0) AS BIGINT)) / 100.0e0, 2) AS total_qty
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150
)
GROUP BY 1, 2
""",
)
def q_q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: IN over a grouped-HAVING subquery (large-volume
    orders) -> semi join against the same fact table, then re-aggregate
    the survivors. Catalyst plans the IN as a left-semi hash join on
    orderkey; the HAVING side partial-aggregates map-side so the semi
    join's build input is |orders|-sized, not |lineitem|-sized."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 150)
        .select("l_orderkey")
    )
    j = o.join(big, o.o_orderkey == big.l_orderkey, "left_semi").join(
        li, li.l_orderkey == o.o_orderkey
    )
    return j.groupBy(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice")
    ).agg(
        F.round(
            F.sum(F.round(F.col("l_quantity") * 100).cast("bigint")) / 100.0, 2
        ).alias("total_qty")
    )


@query(
    "q19_disjunctive_parts",
    """
SELECT round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000.0e0) AS BIGINT)) / 10000.0e0, 2) AS revenue,
       count(*) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 5 AND 20
       AND l.l_quantity BETWEEN 5 AND 30)
   OR (p.p_type = 'PROMO' AND p.p_size BETWEEN 20 AND 35
       AND l.l_quantity BETWEEN 10 AND 40)
""",
)
def q_q19_disjunctive_parts(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides.
    Catalyst extracts the common join key (equi hash join on partkey)
    and pushes the part-only disjuncts below the join
    (p_size/p_brand/p_type union bound) — the predicate-normalization
    pattern that turns a would-be nested loop into hash join + residual
    filter."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(5, 20)
            & F.col("l_quantity").between(5, 30)
        )
        | (
            (F.col("p_type") == "PROMO")
            & F.col("p_size").between(20, 35)
            & F.col("l_quantity").between(10, 40)
        )
    )
    return j.filter(cond).agg(
        F.round(
            F.sum(
                F.round(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 10000
                ).cast("bigint")
            )
            / 10000.0,
            2,
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )
