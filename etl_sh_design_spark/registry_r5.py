"""Round-5 extension registry: link analysis (PageRank), weighted
reservoir sampling (Efraimidis-Spirakis A-Res), source-level
distribution-shift statistics (KL divergence / entropy), substring-
level exact dedup (duplicated-span trim audit, Lee et al. 2022), and
mergeable HLL sketch distinct counting.

These close remaining gaps in the large-pipeline surface:
- an iterative *graph* algorithm beyond connected components (k-means
  covers iterative-numeric; PageRank covers iterative-graph),
- principled weighted sampling (domain_mixture_sample is per-stratum
  Bernoulli; A-Res draws ONE global weighted sample deterministically),
- corpus health metrics for mixture tuning (which sources diverge
  from the overall token distribution, and by how much),
- dedup below document/passage granularity (exact repeated spans),
- reaggregatable approximate distinct counts (sketches merge; exact
  countDistinct cannot).

Every query pairs the Spark pipeline with a DuckDB oracle; hash
discipline follows the repo contract (registry.py header): exact
integers stay BIGINT, accumulation-order-dependent doubles are
rounded 6dp on both sides, iterative state is quantized per round.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sh_design_spark.operators.dedup import MD5_INT64_SQL, md5_int64
from etl_sh_design_spark.operators.pagerank import pagerank, pagerank_oracle_sql
from etl_sh_design_spark.operators.semdedup import (
    semantic_dedup_profile,
    semdedup_oracle_sql,
)
from etl_sh_design_spark.operators.span_dedup import trim_audit, trim_audit_oracle_sql
from etl_sh_design_spark.registry import _t, query

_TOKS = "filter(split(text, '\\\\s+'), t -> t != '')"
_TOKS_DUCK = r"list_filter(string_split_regex(text, '\s+'), t -> t != '')"

# ------------------------------------------------------------ PageRank
# Deterministic link graph derived from events: 197 nodes, an edge
# per (user bucket -> event bucket) pair. Dense enough for hubs to
# emerge, small enough that the unrolled oracle stays fast.
_PR_MOD = 197
_PR_ITERS = 3
_PR_EDGES_SQL = f"""
SELECT DISTINCT user_id % {_PR_MOD} AS src, event_id % {_PR_MOD} AS dst
FROM events WHERE user_id % {_PR_MOD} <> event_id % {_PR_MOD}
"""


@query("pagerank_hubs", pagerank_oracle_sql(_PR_EDGES_SQL, iterations=_PR_ITERS))
def q_pagerank_hubs(spark, sf_dir):
    """PageRank over the derived event graph: 3 power-iteration
    rounds, each ONE |E|-keyed shuffle + a |V|-row rank update (see
    operators/pagerank.py for the scale contract and the per-round
    9dp quantization that makes the unrolled-CTE oracle hash-match)."""
    e = _t(spark, sf_dir, "events")
    edges = e.select(
        (F.col("user_id") % _PR_MOD).alias("src"),
        (F.col("event_id") % _PR_MOD).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    # the derived graph has <= _PR_MOD nodes: rank state broadcasts,
    # so each round is exactly one groupBy-dst shuffle
    return pagerank(edges, iterations=_PR_ITERS, small_state=True)


# ---------------------------------- weighted reservoir sampling (A-Res)
# Efraimidis-Spirakis: key_i = u_i^(1/w_i), keep top-k. We compare in
# log space (ln(u)/w, monotone-equivalent) and derive u deterministic-
# ally from md5(doc_id) so both engines draw the SAME sample. One
# partial top-k (TakeOrderedAndProject) — no global sort shuffle.
_WRS_K = 50
_WRS_U_SQL = (
    "(" + MD5_INT64_SQL.format(x="CAST(doc_id AS VARCHAR) || ':wrs'")
    + " % 1000000000 + 0.5) / 1000000000.0"
)


@query(
    "weighted_sample_docs",
    f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         ln({_WRS_U_SQL}) / n_chars AS k
  FROM documents
)
SELECT doc_id, source, n_chars, round(k, 9) AS wrs_key
FROM keyed ORDER BY k DESC, doc_id LIMIT {_WRS_K}
""",
)
def q_weighted_sample_docs(spark, sf_dir):
    """One global weighted sample of k=50 docs with probability ∝
    n_chars (A-Res / Efraimidis-Spirakis 2006), deterministic via a
    hash-derived uniform. At 100 TB this is the way to draw a fixed-
    size weighted sample in one pass: per-partition top-k then a
    driver-side k-merge — exactly what orderBy().limit(k) compiles
    to (TakeOrderedAndProject), with zero full-data shuffle."""
    d = _t(spark, sf_dir, "documents")
    u = (
        md5_int64(F.concat(F.col("doc_id").cast("string"), F.lit(":wrs")))
        % 1000000000
        + 0.5
    ) / 1000000000.0
    keyed = d.select(
        "doc_id", "source", "n_chars", (F.log(u) / F.col("n_chars")).alias("k")
    )
    return (
        keyed.orderBy(F.desc("k"), "doc_id")
        .limit(_WRS_K)
        .select("doc_id", "source", "n_chars", F.round("k", 9).alias("wrs_key"))
    )


# ------------------------------- duplicated-span trim audit (Lee 2022)
# Fixture: every 7th doc gets the same 12-token phrase appended, so
# its stride-1 8-grams repeat across ~1/7 of the corpus (plus any
# natural repeats in the synthetic text). Injected identically on
# both engines; winner = lowest (doc_id, pos).
_SPAN_PHRASE = (
    "shared boilerplate footer tokens repeat across many documents"
    " in this corpus exactly"
)
_SPAN_DOCS_DUCK = f"""
SELECT doc_id, source,
       CASE WHEN doc_id % 7 = 0 THEN text || ' ' || '{_SPAN_PHRASE}'
            ELSE text END AS text
FROM documents
"""


@query("span_trim_audit", trim_audit_oracle_sql(_SPAN_DOCS_DUCK, _TOKS_DUCK))
def q_span_trim_audit(spark, sf_dir):
    """Substring-level exact dedup audit (Lee et al. 2022): find every
    duplicated 8-token span corpus-wide, keep the first occurrence,
    report per-source how many tokens a trim pass would remove. One
    |tokens|-keyed gram shuffle + per-doc bounded interval-union
    windows; see operators/span_dedup.py for the 100 TB contract
    (hot-gram cap == the n-gram-Jaccard skew cap)."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" " + _SPAN_PHRASE)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return trim_audit(d, _TOKS)


# -------------------------- source distribution shift (KL divergence)
@query(
    "source_token_kl",
    f"""
WITH t AS (
  SELECT source, unnest({_TOKS_DUCK}) AS token FROM documents
),
sc AS (SELECT source, token, count(*) AS c FROM t GROUP BY 1, 2),
st AS (SELECT source, CAST(sum(c) AS BIGINT) AS tot FROM sc GROUP BY 1),
gc AS (SELECT token, CAST(sum(c) AS BIGINT) AS gcnt FROM sc GROUP BY 1),
gt AS (SELECT CAST(sum(gcnt) AS BIGINT) AS gtot FROM gc)
SELECT sc.source,
       CAST(max(st.tot) AS BIGINT) AS n_tokens,
       count(*) AS vocab,
       round(sum((CAST(sc.c AS DOUBLE) / st.tot)
                 * ln((CAST(sc.c AS DOUBLE) / st.tot)
                      / (CAST(gc.gcnt AS DOUBLE) / gt.gtot))), 6) AS kl_vs_corpus,
       round(-sum((CAST(sc.c AS DOUBLE) / st.tot)
                  * ln(CAST(sc.c AS DOUBLE) / st.tot)), 6) AS entropy
FROM sc
JOIN st ON st.source = sc.source
JOIN gc ON gc.token = sc.token
CROSS JOIN gt
GROUP BY sc.source
""",
)
def q_source_token_kl(spark, sf_dir):
    """Per-source token-distribution shift vs the whole corpus:
    KL(p_source ‖ p_corpus) plus source entropy — the mixture-tuning
    diagnostic (which domain's unigram distribution is drifting).
    Shuffles are keyed by (source, token); the global token table is
    vocab-bounded and broadcast into the join, so at 100 TB the heavy
    side never re-shuffles for the corpus statistics."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(F.expr(_TOKS)).alias("token"))
    # (source, token) counts are (n_sources x vocab)-bounded — tiny at
    # any corpus scale — and feed FOUR consumers (per-source totals,
    # global counts, grand total, final join); checkpoint so the text
    # explode runs once, not four times (plan-audited)
    sc = (
        tok.groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    st = sc.groupBy("source").agg(F.sum("c").alias("tot"))
    gc = sc.groupBy("token").agg(F.sum("c").alias("gcnt"))
    gt = gc.agg(F.sum("gcnt").alias("gtot"))
    p = F.col("c").cast("double") / F.col("tot")
    q = F.col("gcnt").cast("double") / F.col("gtot")
    return (
        sc.join(st, "source")
        .join(F.broadcast(gc), "token")
        .crossJoin(F.broadcast(gt))
        .groupBy("source")
        .agg(
            F.max("tot").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).alias("vocab"),
            F.round(F.sum(p * F.log(p / q)), 6).alias("kl_vs_corpus"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
        )
    )


# ------------------------------------- SemDeDup (semantic near-dedup)
# Fixture: every 10th embedding is duplicated verbatim under
# vec_id + 100000 (injected identically on both engines, like the
# span_trim_audit boilerplate phrase) so the synthetic corpus —
# random vectors, no natural semantic dups — contains controlled
# duplicate relations for the cosine pruning to find. Cluster init
# uses vec_id < k, which only ever selects originals.
_SEMD_TAU = 0.999
_SEMD_VECS_DUCK = """
SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
FROM embeddings
UNION ALL
SELECT vec_id + 100000, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
FROM embeddings WHERE vec_id % 10 = 0
"""


@query("semantic_dedup", semdedup_oracle_sql(_SEMD_VECS_DUCK, k=8, tau=_SEMD_TAU))
def q_semantic_dedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): k-means cells over the
    embeddings, then within-cell cosine pruning at tau=0.999,
    keeping the member FARTHEST from its centroid (the paper's
    keep-most-atypical rule). Per-cell audit: members / removed /
    kept. The quadratic stage never crosses a cell boundary, and
    k=8 here is a FLOOR: semantic_dedup_profile's size-measured
    dispatch (SEMDEDUP_MAX_MEAN_CELL_ROWS, operators/semdedup.py)
    grows k as ceil(N/1000) above N=8000 — capped at SEMDEDUP_MAX_K
    since round 11, where the vectorized per-cell kernel takes the
    pairwise stage — keeping both stages linear in N. The oracle
    bakes k=8 in, which matches because the sf0.01 corpus (550
    vecs) sits below the switch point (and far below the cap)."""
    e = _t(spark, sf_dir, "embeddings")
    dup = e.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    inj = e.select("vec_id", "embedding").unionByName(dup)
    return semantic_dedup_profile(inj, k=8, iterations=2, tau=_SEMD_TAU)


# ------------------- mergeable quantile sketch (two-level histogram)
# Power-of-2-binned value histogram, built per shard then MERGED —
# the quantile counterpart of the HLL two-level pattern below, but
# fully deterministic, so unlike approx_percentile it carries a FULL
# hash oracle. Bin index = floor(log2(cents + 1)) computed exactly as
# length(bin(iv + 1)) - 1 on BOTH engines (binary-string length; no
# transcendental near a bucket edge can flip a bin). Everything stays
# integer until the final reported bin lower edges.
_QSK_BIN_SPARK = (
    "length(bin(CAST(round(greatest(value, 0.0) * 100) AS BIGINT) + 1)) - 1"
)
_QSK_BIN_DUCK = (
    "length(bin(CAST(round(greatest(value, 0.0) * 100) AS BIGINT) + 1)) - 1"
)


def _qsk_edge(bin_col: str) -> str:
    """Lower value edge of power-of-2 cent-bin b: (2^b - 1) / 100."""
    return f"round((power(2.0, {bin_col}) - 1.0) / 100.0, 6)"


@query(
    "quantile_sketch_events",
    f"""
WITH b AS (
  SELECT event_type, user_id % 32 AS shard, {_QSK_BIN_DUCK} AS bin
  FROM events
),
sh AS (SELECT event_type, shard, bin, count(*) AS c FROM b GROUP BY 1, 2, 3),
m AS (SELECT event_type, bin, CAST(sum(c) AS BIGINT) AS c FROM sh GROUP BY 1, 2),
cum AS (
  SELECT event_type, bin, c,
         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS BIGINT) AS cum,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS total
  FROM m
)
SELECT event_type,
       CAST(max(total) AS BIGINT) AS n_events,
       count(*) AS n_bins,
       {_qsk_edge("min(CASE WHEN cum >= ceil(total * 0.5) THEN bin END)")} AS p50,
       {_qsk_edge("min(CASE WHEN cum >= ceil(total * 0.9) THEN bin END)")} AS p90,
       {_qsk_edge("min(CASE WHEN cum >= ceil(total * 0.99) THEN bin END)")} AS p99
FROM cum GROUP BY 1
""",
)
def q_quantile_sketch_events(spark, sf_dir):
    """Mergeable quantile sketch (two-level histogram aggregation):
    per (event_type, shard) a power-of-2-binned cent histogram is
    built map-side, then shard sketches MERGE by summing bin counts —
    the reaggregation algebra that lets 1000 executors (or days of
    pre-computed partition rollups) combine into corpus quantiles at
    100 TB without re-reading values. Deterministic binning (binary-
    string length, exact integer log2) means this sketch — unlike
    approx_percentile's GK sketch — hash-matches a SQL twin exactly.
    Shuffles: one (type, shard, bin)-keyed partial agg, then a
    (type, bin) merge over a sketch-sized (not data-sized) frame;
    the quantile extraction window runs over <=~24 bins per type."""
    from pyspark.sql import Window as W

    e = _t(spark, sf_dir, "events")
    b = e.select(
        "event_type",
        (F.col("user_id") % 32).alias("shard"),
        F.expr(_QSK_BIN_SPARK).alias("bin"),
    )
    sh = b.groupBy("event_type", "shard", "bin").agg(F.count(F.lit(1)).alias("c"))
    m = sh.groupBy("event_type", "bin").agg(F.sum("c").alias("c"))
    w = W.partitionBy("event_type")
    cum = m.select(
        "event_type",
        "bin",
        F.sum("c").over(w.orderBy("bin")).alias("cum"),
        F.sum("c").over(w).alias("total"),
    )

    def pick(q: float) -> F.Column:
        return F.min(
            F.when(F.col("cum") >= F.ceil(F.col("total") * q), F.col("bin"))
        )

    def edge(col: F.Column) -> F.Column:
        return F.round((F.pow(F.lit(2.0), col) - 1.0) / 100.0, 6)

    return cum.groupBy("event_type").agg(
        F.max("total").alias("n_events"),
        F.count(F.lit(1)).alias("n_bins"),
        edge(pick(0.5)).alias("p50"),
        edge(pick(0.9)).alias("p90"),
        edge(pick(0.99)).alias("p99"),
    )


# --------------------------- BPE merge learning (vocabulary induction)
# Learn the top-2 byte-pair merges from corpus word statistics with
# both rounds unrolled — the vocabulary-induction step of tokenizer
# training (Sennrich et al. 2016), expressed declaratively. Words are
# represented as '|'-wrapped symbol strings ('|a||b|...'), where
# `replace()`'s left-to-right non-overlapping scan IS the BPE greedy
# merge (adjacent matches share no characters, and a just-merged
# symbol can't re-merge — verified identical in Spark and DuckDB,
# including the '|a||a||a|' -> '|aa||a|' overlap case). Pair counts
# are weighted by word frequency; ties break lexicographically.
_BPE_ROUNDS = 2


@query(
    "bpe_merge_learn",
    r"""
WITH w AS (
  SELECT token, count(*) AS cnt, regexp_replace(token, '(.)', '|\1|', 'g') AS ws
  FROM (SELECT unnest(list_filter(string_split_regex(text, '\s+'), t -> t != '')) AS token
        FROM documents)
  WHERE regexp_matches(token, '^[a-z]+$') AND len(token) >= 2
  GROUP BY 1
),
p1 AS (
  SELECT p.a AS a, p.b AS b, CAST(sum(cnt) AS BIGINT) AS cnt
  FROM (
    SELECT cnt, unnest(list_transform(range(1, len(syms)),
                 i -> {'a': syms[i], 'b': syms[i + 1]})) AS p
    FROM (SELECT cnt, string_split(trim(ws, '|'), '||') AS syms FROM w)
  )
  GROUP BY 1, 2
),
b1 AS (SELECT a, b, cnt FROM p1 ORDER BY cnt DESC, a, b LIMIT 1),
w2 AS (
  SELECT w.cnt,
         replace(w.ws, '|' || b1.a || '||' || b1.b || '|',
                 '|' || b1.a || b1.b || '|') AS ws
  FROM w CROSS JOIN b1
),
p2 AS (
  SELECT p.a AS a, p.b AS b, CAST(sum(cnt) AS BIGINT) AS cnt
  FROM (
    SELECT cnt, unnest(list_transform(range(1, len(syms)),
                 i -> {'a': syms[i], 'b': syms[i + 1]})) AS p
    FROM (SELECT cnt, string_split(trim(ws, '|'), '||') AS syms FROM w2)
  )
  GROUP BY 1, 2
),
b2 AS (SELECT a, b, cnt FROM p2 ORDER BY cnt DESC, a, b LIMIT 1)
SELECT 1 AS merge_rank, a AS left_sym, b AS right_sym, cnt AS pair_count FROM b1
UNION ALL
SELECT 2, a, b, cnt FROM b2
""",
)
def q_bpe_merge_learn(spark, sf_dir):
    """BPE vocabulary induction: the 2 highest-frequency symbol-pair
    merges over the corpus word table, rounds unrolled (round 2 counts
    pairs AFTER applying merge 1, so a learned bigram can participate
    in a longer merge). The heavy shuffle each round is the (a, b)
    pair-count aggregation — vocab²-bounded keys, partial-aggregated
    map-side; the 1-row winner broadcasts back into a pure-codegen
    string replace. At 100 TB the word table (distinct words x count)
    is the only state between rounds — exactly how production BPE
    trainers stream it."""
    d = _t(spark, sf_dir, "documents")
    w = (
        d.select(F.explode(F.expr(_TOKS)).alias("token"))
        .filter(F.col("token").rlike("^[a-z]+$") & (F.length("token") >= 2))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "cnt",
            F.regexp_replace(F.col("token"), "(.)", r"|$1|").alias("ws"),
        )
        .localCheckpoint(eager=False)
    )
    return bpe_learn_merges(w, rounds=_BPE_ROUNDS)


def _bpe_pair_counts(words):
    syms = words.select(
        "cnt", F.expr(r"split(trim(BOTH '|' FROM ws), '\\|\\|')").alias("syms")
    ).filter(F.size("syms") >= 2)
    p = syms.select(
        "cnt",
        F.explode(
            F.expr(
                "transform(sequence(1, size(syms) - 1), "
                "i -> struct(syms[i - 1] AS a, syms[i] AS b))"
            )
        ).alias("p"),
    )
    return p.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )


def _bpe_apply_merge(words, b):
    return words.crossJoin(F.broadcast(b.select("a", "b"))).select(
        "cnt",
        F.expr(
            "replace(ws, '|' || a || '||' || b || '|', '|' || a || b || '|')"
        ).alias("ws"),
    )


def bpe_learn_merges(words, rounds: int = 2):
    """Run `rounds` BPE merge rounds over a (cnt, ws) word table;
    returns (merge_rank, left_sym, right_sym, pair_count) per round."""
    out = None
    cur = words
    for r in range(1, rounds + 1):
        b = (
            _bpe_pair_counts(cur)
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .localCheckpoint(eager=False)
        )
        row = b.select(
            F.lit(r).alias("merge_rank"),
            F.col("a").alias("left_sym"),
            F.col("b").alias("right_sym"),
            F.col("cnt").alias("pair_count"),
        )
        out = row if out is None else out.unionByName(row)
        if r < rounds:
            cur = _bpe_apply_merge(cur, b)
    return out


# -------------------- count-min sketch (mergeable frequency estimates)
# Completes the classic mergeable-sketch trio: HLL (distinct counts,
# below), the power-of-2 histogram (rank/quantiles, above), and CMS
# (point frequencies, here). CMS is a LINEAR sketch — merge is
# element-wise addition — so shard sketches built map-side sum into
# the corpus sketch with no re-read. K=3 rows x W=1024 counters;
# estimates only ever OVER-count (collision adds, never subtracts),
# which the golden pins. Deterministic md5 hashing -> full SQL twin.
_CMS_K = 3
_CMS_W = 1024
_CMS_TOPN = 10


def _cms_col_sql(j: int, tok: str) -> str:
    return MD5_INT64_SQL.format(x=f"'c{j}:' || {tok}") + f" % {_CMS_W}"


@query(
    "cms_token_frequency",
    f"""
WITH t AS (
  SELECT doc_id % 16 AS shard, unnest({_TOKS_DUCK}) AS token FROM documents
),
sc AS (SELECT shard, token, count(*) AS c FROM t GROUP BY 1, 2),
exact AS (SELECT token, CAST(sum(c) AS BIGINT) AS exact_count FROM sc GROUP BY 1),
cells AS (
  SELECT shard, 0 AS j, {_cms_col_sql(0, "token")} AS col, c FROM sc
  UNION ALL SELECT shard, 1, {_cms_col_sql(1, "token")}, c FROM sc
  UNION ALL SELECT shard, 2, {_cms_col_sql(2, "token")}, c FROM sc
),
shard_sk AS (SELECT shard, j, col, CAST(sum(c) AS BIGINT) AS c FROM cells GROUP BY 1, 2, 3),
merged AS (SELECT j, col, CAST(sum(c) AS BIGINT) AS c FROM shard_sk GROUP BY 1, 2),
top AS (SELECT token, exact_count FROM exact ORDER BY exact_count DESC, token LIMIT {_CMS_TOPN}),
probes AS (
  SELECT token, exact_count, 0 AS j, {_cms_col_sql(0, "token")} AS col FROM top
  UNION ALL SELECT token, exact_count, 1, {_cms_col_sql(1, "token")} FROM top
  UNION ALL SELECT token, exact_count, 2, {_cms_col_sql(2, "token")} FROM top
),
probe AS (
  SELECT p.token, p.exact_count, min(m.c) AS cms_est
  FROM probes p JOIN merged m USING (j, col)
  GROUP BY 1, 2
)
SELECT token, CAST(exact_count AS BIGINT) AS exact_count,
       CAST(cms_est AS BIGINT) AS cms_est,
       CAST(cms_est - exact_count AS BIGINT) AS overestimate
FROM probe
""",
)
def q_cms_token_frequency(spark, sf_dir):
    """Count-min sketch over corpus tokens: 16 shard sketches (K=3 x
    W=1024 bigint counters) built map-side, merged by element-wise
    sum (CMS is linear — the property that lets 1000 executors or
    daily partials combine without re-reading text), then the top-10
    exact tokens are probed back: est = min over the K rows. At
    100 TB the sketch is 24 KiB per shard regardless of vocabulary;
    exact per-token counts need a vocab-sized shuffle. Overestimates
    are non-negative by construction (golden)."""
    d = _t(spark, sf_dir, "documents")
    t = d.select(
        (F.col("doc_id") % 16).alias("shard"),
        F.explode(F.expr(_TOKS)).alias("token"),
    )
    # (shard, token) pre-aggregation: vocab-bounded, feeds sketch AND
    # exact side; checkpoint so the explode runs once
    st = (
        t.groupBy("shard", "token")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    exact = st.groupBy("token").agg(F.sum("c").cast("bigint").alias("exact_count"))

    def col_of(j: int, tok) -> F.Column:
        return md5_int64(F.concat(F.lit(f"c{j}:"), tok)) % _CMS_W

    cells = None
    for j in range(_CMS_K):
        cj = st.select(
            "shard",
            F.lit(j).alias("j"),
            col_of(j, F.col("token")).alias("col"),
            "c",
        )
        cells = cj if cells is None else cells.unionByName(cj)
    shard_sk = cells.groupBy("shard", "j", "col").agg(F.sum("c").alias("c"))
    merged = shard_sk.groupBy("j", "col").agg(F.sum("c").cast("bigint").alias("c"))

    top = exact.orderBy(F.desc("exact_count"), "token").limit(_CMS_TOPN)
    probes = None
    for j in range(_CMS_K):
        pj = top.select(
            "token", "exact_count", F.lit(j).alias("j"),
            col_of(j, F.col("token")).alias("col"),
        )
        probes = pj if probes is None else probes.unionByName(pj)
    est = (
        probes.join(F.broadcast(merged), ["j", "col"])
        .groupBy("token", "exact_count")
        .agg(F.min("c").alias("cms_est"))
    )
    return est.select(
        "token",
        "exact_count",
        "cms_est",
        (F.col("cms_est") - F.col("exact_count")).alias("overestimate"),
    )


# ----------------------- mergeable HLL sketches (two-level aggregation)
@query("hll_distinct_sketch")  # rows-only: DataSketches HLL has no DuckDB twin
def q_hll_distinct_sketch(spark, sf_dir):
    """Mergeable-sketch distinct counting (Apache DataSketches HLL,
    built into Spark): per event_type, 32 shard-level sketches are
    built map-side and UNIONED — the two-level partial-aggregation
    pattern that makes distinct-count reaggregatable across 1000
    executors, days of partitions, or pre-computed rollups at 100 TB
    (exact countDistinct cannot be merged; sketches can). The golden
    proves merged == direct == within 5% of exact; the driver check
    is rows-only (no SQL twin exists for the sketch), like
    approx_stats."""
    e = _t(spark, sf_dir, "events")
    shard = e.groupBy(
        "event_type", (F.col("user_id") % 32).alias("shard")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = shard.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_merged")
    )
    direct = e.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est_direct"),
        F.countDistinct("user_id").alias("exact_distinct"),
    )
    return merged.join(direct, "event_type").select(
        "event_type",
        "est_merged",
        "est_direct",
        "exact_distinct",
        F.round(
            F.abs(F.col("est_merged") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            6,
        ).alias("rel_error"),
    )
