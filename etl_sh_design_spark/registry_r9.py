"""Round-9 extension registry: LINE-level curation — the C4/FineWeb
rules that operate on lines within a document, which the battery so
far lacked (everything existing scores tokens, n-grams, or whole
docs).

- `line_quality_rules` — the FineWeb/C4 per-line signal battery,
  aggregated per source: lines per doc, mean words per line, fraction
  of lines ending in terminal punctuation, fraction of short
  (bullet-ish, <4 word) lines, and the mean within-doc duplicate-line
  fraction. These are the signals FineWeb thresholds to drop
  list-like / navigation pages (Penedo et al. 2024; C4's "three
  sentence" rule family, Raffel et al. 2020).
- `c4_line_dedup` — C4's GLOBAL line deduplication (Raffel et al.
  2020 §2.2: "we discarded any line that occurred more than [k=3]
  times in the dataset"): every line occurring >= 3 times corpus-wide
  is removed from every document, documents are reassembled in line
  order, and the audit reports per-source removal counts plus a
  checksum of the rebuilt corpus.
- `nfc_dedup_audit` — unicode NFC normalization before hashing (the
  CCNet/C4 preprocessing step): raw vs NFC-normalized distinct counts
  over planted composed/decomposed twins. Spark has no built-in
  normalizer, so the NFC step is an Arrow-batched pandas UDF
  (unicodedata) mirrored by DuckDB's native nfc_normalize().

Line fixture (the registry's standard deterministic-plant idiom): the
synthetic documents are single-line, so both queries synthesize line
structure identically on both engines — lines are consecutive 8-token
groups, a terminal '.' is planted on line j of doc d when
(d + j) % 3 == 0, and for the dedup query a byte-identical
boilerplate line is appended to every doc_id % 5 == 0 document (the
cross-doc duplicate the k>=3 rule must find; content lines collide
across docs only by accident because the punctuation plant is
doc-dependent).

Scale shapes:
- `line_quality_rules` is map-only + one |sources| agg: every line
  statistic is computed with array higher-order functions on the doc
  row — the lines never explode, so there is NO per-line shuffle.
- `c4_line_dedup` is the real distributed shape: explode ->
  map-side-combined count per line hash (|distinct lines| groups) ->
  size-dispatched anti-join of the boilerplate set (one count() at
  build time: broadcast up to LINE_DEDUP_BROADCAST_MAX_ROWS rows,
  shuffle anti-join above — C4 itself dropped billions of repeated
  lines, so the >= 3 set is NOT vocabulary-sized at the target scale;
  see the constant's block comment) -> one (doc)-keyed regroup to
  reassemble. Two real shuffles, both linear in lines; the two
  anti-join paths are result-identical (forced-path golden in
  tests/test_r9.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sh_design_spark.operators.dedup import MD5_INT64_SQL, md5_int64
from etl_sh_design_spark.registry import _t, query

# ------------------------------------------------ shared line fixture
# toks -> lines: consecutive 8-token groups; '.' planted on
# (doc_id + j) % 3 == 0. Spark arrays are 1-based via slice(); DuckDB
# lists are 1-based via list_slice(). sequence(0, -1) in Spark counts
# DOWN, so the empty-doc case is guarded explicitly.
_LINE_W = 8

_LINES_SPARK = f"""
CASE WHEN size(toks) = 0 THEN array()
ELSE transform(
  sequence(0, CAST(ceil(size(toks) / {_LINE_W}.0) AS INT) - 1),
  j -> concat(
    concat_ws(' ', slice(toks, j * {_LINE_W} + 1, {_LINE_W})),
    CASE WHEN pmod(doc_id + j, 3) = 0 THEN '.' ELSE '' END))
END
"""

_LINES_DUCK = f"""
list_transform(
  range(CAST(ceil(len(toks) / {_LINE_W}.0) AS INT)),
  j -> array_to_string(list_slice(toks, j * {_LINE_W} + 1, j * {_LINE_W} + {_LINE_W}), ' ')
       || CASE WHEN (doc_id + j) % 3 = 0 THEN '.' ELSE '' END)
"""

_TOKS_SPARK = "filter(split(text, ' '), t -> t != '')"
_TOKS_DUCK = "list_filter(string_split(text, ' '), t -> t != '')"


# ------------------------------------------------ line quality rules
_LQR_SQL = f"""
WITH t AS (
  SELECT doc_id, source, {_TOKS_DUCK} AS toks FROM documents
),
l AS (
  SELECT doc_id, source, {_LINES_DUCK} AS lines FROM t
),
d AS (
  SELECT source,
         len(lines) AS n_lines,
         len(list_filter(lines, x -> x LIKE '%.')) AS n_punct,
         len(list_filter(lines, x -> len(string_split(x, ' ')) < 4)) AS n_short,
         list_sum(list_transform(lines, x -> len(list_filter(string_split(x, ' '), w -> w <> '')))) AS n_words,
         CASE WHEN len(lines) = 0 THEN 0.0e0
              ELSE 1.0e0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines)
         END AS dup_frac
  FROM l
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_lines) AS BIGINT) AS n_lines,
       round(avg(n_lines), 6) AS mean_lines_per_doc,
       round(CAST(sum(n_words) AS DOUBLE) / sum(n_lines), 6) AS mean_words_per_line,
       round(CAST(sum(n_punct) AS DOUBLE) / sum(n_lines), 6) AS frac_lines_end_punct,
       round(CAST(sum(n_short) AS DOUBLE) / sum(n_lines), 6) AS frac_short_lines,
       round(avg(dup_frac), 6) AS mean_dup_line_fraction
FROM d GROUP BY 1
"""


@query("line_quality_rules", _LQR_SQL)
def q_line_quality_rules(spark, sf_dir):
    """FineWeb/C4 line-signal battery per source (see module
    docstring): line counts, words/line, terminal-punctuation and
    short-line fractions, within-doc duplicate-line fraction. The
    punctuation plant makes frac_lines_end_punct ~1/3 by
    construction — the assertion target. Map-only: all per-line math
    runs in array lambdas on the doc row; the only exchange is the
    |sources| aggregate."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    # project toks first so the split isn't re-evaluated per lambda
    # element (the shingle-pipeline lesson, BASELINE.md round 1)
    lines = (
        d.select("doc_id", "source", F.expr(_TOKS_SPARK).alias("toks"))
        .select("doc_id", "source", F.expr(f"({_LINES_SPARK})").alias("lines"))
        .select(
            "source",
            F.size("lines").alias("n_lines"),
            F.size(F.expr("filter(lines, x -> x LIKE '%.')")).alias("n_punct"),
            F.size(
                F.expr("filter(lines, x -> size(split(x, ' ')) < 4)")
            ).alias("n_short"),
            F.expr(
                "aggregate(lines, 0, (acc, x) -> "
                "acc + size(filter(split(x, ' '), w -> w != '')))"
            ).alias("n_words"),
            F.expr(
                "CASE WHEN size(lines) = 0 THEN 0.0D ELSE "
                "1.0D - CAST(size(array_distinct(lines)) AS DOUBLE) / size(lines) END"
            ).alias("dup_frac"),
        )
    )
    return lines.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_lines").cast("bigint").alias("n_lines"),
        F.round(F.avg("n_lines"), 6).alias("mean_lines_per_doc"),
        F.round(
            F.sum("n_words").cast("double") / F.sum("n_lines"), 6
        ).alias("mean_words_per_line"),
        F.round(
            F.sum("n_punct").cast("double") / F.sum("n_lines"), 6
        ).alias("frac_lines_end_punct"),
        F.round(
            F.sum("n_short").cast("double") / F.sum("n_lines"), 6
        ).alias("frac_short_lines"),
        F.round(F.avg("dup_frac"), 6).alias("mean_dup_line_fraction"),
    )


# ---------------------------------------------------- C4 line dedup
_BOILER = "please subscribe to our newsletter for updates today"
_C4_K = 3  # C4's global repetition threshold

# Boiler-set dispatch bound: the >= k repeated-line set may be
# broadcast for the anti-join only up to this many rows (int64 keys:
# 5M x 8 B ~= 40 MB serialized — same class as graph.py's 5M-edge
# union-find bound). On vocabulary-sized corpora Zipf keeps the set
# tiny and the broadcast wins; but C4 itself discarded BILLIONS of
# repeated lines from a ~750 GB corpus, so at 100 TB the set is
# data-sized and the anti-join MUST plan as a shuffle. One count() at
# build time picks the strategy — the same size-measured-dispatch
# contract as similarity.EMBED_BROADCAST_MAX_ROWS and
# semdedup.SEMDEDUP_MAX_MEAN_CELL_ROWS — and the count is not an
# extra pass: it materializes the localCheckpoint the anti-join then
# reads, so the explode -> map-combined count runs once either way.
# Both paths are result-identical (left_anti on the same key set);
# pinned by tests/test_r9.py::test_c4_line_dedup_forced_shuffle_parity.
LINE_DEDUP_BROADCAST_MAX_ROWS = 5_000_000

_C4LD_SQL = f"""
WITH t AS (
  SELECT doc_id, source, {_TOKS_DUCK} AS toks FROM documents
),
l AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 5 = 0
              THEN list_append({_LINES_DUCK}, '{_BOILER}')
              ELSE {_LINES_DUCK} END AS lines
  FROM t
),
e AS (
  SELECT doc_id, source, u.j AS pos, u.line,
         {MD5_INT64_SQL.format(x="u.line")} AS line_key
  FROM l, unnest(list_transform(range(len(lines)),
                                j -> {{'j': j, 'line': lines[j + 1]}})) AS s(u)
),
cnt AS (
  SELECT line_key, count(*) AS c FROM e GROUP BY 1
),
kept AS (
  SELECT e.doc_id, e.source, e.pos, e.line
  FROM e JOIN cnt USING (line_key)
  WHERE cnt.c < {_C4_K}
),
rebuilt AS (
  SELECT l.doc_id, l.source,
         len(l.lines) AS n_lines,
         coalesce(k.n_kept, 0) AS n_kept,
         coalesce(k.text2, '') AS text2
  FROM l LEFT JOIN (
    SELECT doc_id, count(*) AS n_kept,
           string_agg(line, chr(10) ORDER BY pos) AS text2
    FROM kept GROUP BY 1
  ) k USING (doc_id)
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_lines) AS BIGINT) AS n_lines,
       CAST(sum(n_lines - n_kept) AS BIGINT) AS n_lines_removed,
       CAST(sum(CASE WHEN n_kept < n_lines THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_changed,
       CAST(sum({MD5_INT64_SQL.format(x="text2")} % 1000000007) AS BIGINT)
         AS rebuilt_checksum
FROM rebuilt GROUP BY 1
"""


@query("c4_line_dedup", _C4LD_SQL)
def q_c4_line_dedup(
    spark, sf_dir, broadcast_max_rows: int = LINE_DEDUP_BROADCAST_MAX_ROWS
):
    """C4 global line dedup (module docstring): any line occurring
    >= 3 times corpus-wide is removed from EVERY document; documents
    are reassembled in line order and checksummed. The planted
    boilerplate line (every doc_id % 5 == 0) is the guaranteed
    removal; content lines are punctuation-salted per doc so natural
    cross-doc collisions stay accidental. Plan: explode ->
    map-combined count on the line hash -> size-dispatched anti-join
    of the >= 3 set (broadcast up to LINE_DEDUP_BROADCAST_MAX_ROWS,
    shuffle above — both paths result-identical) -> one doc-keyed
    regroup. Pass broadcast_max_rows=0 to force the shuffle path
    (the forced-path golden's configuration)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    docs = d.select(
        "doc_id", "source", F.expr(_TOKS_SPARK).alias("toks")
    ).select(
        "doc_id",
        "source",
        F.expr(
            f"CASE WHEN doc_id % 5 = 0 THEN "
            f"array_append(({_LINES_SPARK}), '{_BOILER}') "
            f"ELSE ({_LINES_SPARK}) END"
        ).alias("lines"),
    )
    exploded = docs.select(
        "doc_id", F.posexplode("lines").alias("pos", "line")
    ).withColumn("line_key", md5_int64(F.col("line")))
    boiler = (
        exploded.groupBy("line_key")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= _C4_K)
        .select("line_key")
        .localCheckpoint(eager=False)
    )
    # the dispatch count() also materializes the checkpoint the
    # anti-join reads — the probe is not an extra pass over the lines.
    # Above the bound the shuffle_hash hint makes the no-broadcast
    # contract deterministic (merely dropping the broadcast hint would
    # let autoBroadcastJoinThreshold re-pick broadcast on a small-
    # stats side — the exact failure mode the dispatch exists to rule
    # out at scale).
    n_boiler = boiler.count()
    anti_side = (
        F.broadcast(boiler)
        if n_boiler <= broadcast_max_rows
        else boiler.hint("shuffle_hash")
    )
    kept = exploded.join(anti_side, "line_key", "left_anti")
    rebuilt_tail = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("text2"),
    )
    rebuilt = (
        docs.select("doc_id", "source", F.size("lines").alias("n_lines"))
        .join(rebuilt_tail, "doc_id", "left")
        .fillna({"n_kept": 0, "text2": ""})
    )
    return rebuilt.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_lines").cast("bigint").alias("n_lines"),
        (F.sum("n_lines") - F.sum("n_kept")).cast("bigint").alias("n_lines_removed"),
        F.sum((F.col("n_kept") < F.col("n_lines")).cast("int"))
        .cast("bigint")
        .alias("n_docs_changed"),
        F.sum(F.pmod(md5_int64(F.col("text2")), F.lit(1000000007)))
        .cast("bigint")
        .alias("rebuilt_checksum"),
    )


# ------------------------------------------- NFC-normalized dedup
# Unicode NFC normalization is the preprocessing step CCNet/C4 run
# before any text hashing (composed vs decomposed accents hash
# differently but render identically). Spark has NO built-in unicode
# normalizer, so this is one of the engine's few justified Python
# islands: an Arrow-batched pandas UDF around unicodedata.normalize
# (vectorized batch transfer, no per-row Python), mirrored by
# DuckDB's native nfc_normalize() in the oracle — both implement
# UAX #15, pinned byte-identical by the planted NFD/NFC twins.
#
# Plant: every doc_id % 11 == 0 document gets TWO twins that differ
# ONLY in normalization form — +2e6 appends the COMPOSED marker
# (char(233) = U+00E9), +3e6 appends the DECOMPOSED one
# ('e' + char(769) = e + U+0301). Raw hashing sees two distinct
# texts; NFC hashing collapses them. The markers are built from
# escape-free primitives so no raw unicode sits in the source:
# DuckDB chr() takes a CODEPOINT, but Spark's char() wraps at 256
# (latin-1 semantics — char(769) is \\x01!), so the Spark side
# decodes the UTF-8 BYTES instead (U+00E9 = C3A9, U+0301 = CC81).
_NFC_MARK_SPARK_C = "concat(text, ' caf', decode(unhex('C3A9'), 'UTF-8'))"
_NFC_MARK_SPARK_D = "concat(text, ' cafe', decode(unhex('CC81'), 'UTF-8'))"
_NFC_MARK_DUCK_C = "text || ' caf' || chr(233)"
_NFC_MARK_DUCK_D = "text || ' cafe' || chr(769)"

_NFC_SQL = f"""
WITH corpus AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000, source, {_NFC_MARK_DUCK_C} FROM documents
  WHERE doc_id % 11 = 0
  UNION ALL
  SELECT doc_id + 3000000, source, {_NFC_MARK_DUCK_D} FROM documents
  WHERE doc_id % 11 = 0
),
h AS (
  SELECT source, md5(text) AS h_raw, md5(nfc_normalize(text)) AS h_nfc
  FROM corpus
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT h_raw) AS BIGINT) AS n_raw_distinct,
       CAST(count(DISTINCT h_nfc) AS BIGINT) AS n_nfc_distinct,
       round(1.0e0 - CAST(count(DISTINCT h_nfc) AS DOUBLE)
             / count(DISTINCT h_raw), 6) AS nfc_dup_ratio
FROM h GROUP BY 1
"""


@query("nfc_dedup_audit", _NFC_SQL)
def q_nfc_dedup_audit(spark, sf_dir):
    """Unicode-NFC dedup audit per source (see block comment): raw
    vs NFC-normalized distinct counts over a corpus with planted
    composed/decomposed twins. The normalizer is the engine's one
    justified text UDF (Arrow-batched unicodedata.normalize — Spark
    has no built-in); everything around it is codegen."""
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def nfc(s):
        # pandas' vectorized normalizer == unicodedata.normalize("NFC")
        # element-wise (parity asserted in tests); no per-row lambda.
        return s.str.normalize("NFC")

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    plants = d.filter(F.col("doc_id") % 11 == 0)
    corpus = (
        d.unionByName(
            plants.select(
                (F.col("doc_id") + 2000000).alias("doc_id"),
                "source",
                F.expr(_NFC_MARK_SPARK_C).alias("text"),
            )
        )
        .unionByName(
            plants.select(
                (F.col("doc_id") + 3000000).alias("doc_id"),
                "source",
                F.expr(_NFC_MARK_SPARK_D).alias("text"),
            )
        )
    )
    # NFC is the identity on pure-ASCII text (UAX #15: ASCII is
    # NFC-invariant), and `octet_length == char_length` holds iff the
    # UTF-8 string is all single-byte chars, i.e. pure ASCII. Rows
    # that pass the codegen'd test are nulled BEFORE the UDF — the
    # Arrow boundary ships only the (rare) non-ASCII texts instead of
    # the whole corpus, bit-identically (guide §4: pass only what the
    # function needs). On this corpus that is the 2/11 planted twins.
    is_ascii = F.octet_length("text") == F.length("text")
    h = corpus.select(
        "source",
        F.md5("text").alias("h_raw"),
        F.md5(
            F.coalesce(nfc(F.when(~is_ascii, F.col("text"))), F.col("text"))
        ).alias("h_nfc"),
    )
    return h.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("h_raw").alias("n_raw_distinct"),
        F.countDistinct("h_nfc").alias("n_nfc_distinct"),
        F.round(
            1.0 - F.countDistinct("h_nfc").cast("double") / F.countDistinct("h_raw"),
            6,
        ).alias("nfc_dup_ratio"),
    )
