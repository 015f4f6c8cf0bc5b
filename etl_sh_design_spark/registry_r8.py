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


# ---------------------------------------------------------- char entropy
from etl_sh_design_spark.functions import text as _text  # noqa: E402

_CHAR_ENT_SQL = """
WITH docs AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 5 = 0 THEN repeat(substr(text, 1, 2), 50)
              ELSE text END AS text
  FROM documents
),
ch AS (
  SELECT doc_id, unnest(string_split(text, '')) AS c
  FROM docs WHERE length(text) > 0
),
cc AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY 1, 2),
cc2 AS (SELECT doc_id, CAST(k AS DOUBLE) AS k,
               CAST(sum(k) OVER (PARTITION BY doc_id) AS DOUBLE) AS t
        FROM cc),
ent AS (SELECT doc_id, round(-sum((k / t) * ln(k / t)), 6) AS entropy
        FROM cc2 GROUP BY doc_id),
per AS (
  SELECT d.doc_id, d.source, length(d.text) AS n_chars,
         coalesce(e.entropy, 0.0e0) AS entropy
  FROM docs d LEFT JOIN ent e USING (doc_id)
)
SELECT source,
       least(9, CAST(floor(entropy * 2) AS INT)) AS ent_bucket,
       count(*) AS n_docs,
       round(avg(entropy), 6) AS avg_entropy,
       round(avg(CAST(n_chars AS DOUBLE)), 2) AS avg_chars
FROM per
GROUP BY 1, 2
"""


@query("char_entropy_quality", _CHAR_ENT_SQL)
def q_char_entropy_quality(spark, sf_dir):
    """Per-document character-entropy quality signal (see
    functions/text.char_entropy) bucketed into 0.5-nat bins — the
    missing member of the quality battery next to text_quality /
    doc_repetition: flags degenerate-repetition docs (entropy -> 0)
    and random-byte docs (entropy -> ln|alphabet|) that token-level
    ratios miss.

    Scale shape: the entropy is a pure higher-order-function
    expression evaluated map-side inside whole-stage codegen (no
    explode — the char array never becomes rows), so the only shuffle
    carries one row per OCCUPIED 0.5-nat bucket (<= 10 keys) after
    map-side partial aggregation. Per-doc entropy is rounded to 6
    decimals BEFORE bucketing/averaging on both engines so the
    bucket edges and averages are cross-engine stable. Degenerate
    low-entropy docs are injected for doc_id % 5 == 0 (the corpus is
    homogeneous; same pattern as doc_repetition's injection) so the
    bucketing is actually exercised."""
    d = _t(spark, sf_dir, "documents")
    degraded = d.select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 5 == 0, F.repeat(F.substring("text", 1, 2), 50)
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    per = degraded.select(
        "source",
        F.length("text").alias("n_chars"),
        F.round(_text.char_entropy("text"), 6).alias("entropy"),
    )
    return (
        per.groupBy(
            "source",
            F.least(F.lit(9), F.floor(F.col("entropy") * 2).cast("int")).alias(
                "ent_bucket"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("entropy"), 6).alias("avg_entropy"),
            F.round(F.avg(F.col("n_chars").cast("double")), 2).alias("avg_chars"),
        )
    )


# ------------------------------------------------- streaming quality gate twin
from etl_sh_design_spark.registry_ext import _DTOKS, _STOP  # noqa: E402
from etl_sh_design_spark.streaming.quality import (  # noqa: E402
    DEFAULT_THRESHOLD,
    gate_summary,
)

_QUALITY_GATE_SQL = f"""
WITH scored AS (
  SELECT lang, source,
         round((least(n_tok / 100.0e0, 1.0e0)
                + greatest(0.0e0, 1.0e0 - 4.0e0 * punct_ratio)
                + least(1.0e0, 4.0e0 * stop_ratio)) / 3.0e0, 6) AS quality
  FROM (
    SELECT lang, source,
           len(toks) AS n_tok,
           CASE WHEN len(toks) > 0
                THEN CAST(len(list_filter(toks, t -> list_contains({_STOP}, t))) AS DOUBLE) / len(toks)
                ELSE 0.0e0 END AS stop_ratio,
           CASE WHEN length(text) > 0
                THEN CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE) / length(text)
                ELSE 0.0e0 END AS punct_ratio
    FROM (SELECT lang, source, text, {_DTOKS} AS toks FROM documents)
  )
)
SELECT lang, source,
       count(*) AS n_admitted,
       round(sum(CAST(round(quality * 1000000) AS BIGINT))
             / (count(*) * 1000000.0e0), 6) AS avg_quality,
       round(min(quality), 6) AS min_quality
FROM scored
WHERE quality >= {DEFAULT_THRESHOLD}
GROUP BY 1, 2
"""


@query("quality_gate_admissions", _QUALITY_GATE_SQL)
def q_quality_gate_admissions(spark, sf_dir):
    """Batch twin of the STREAMING quality gate's scoreboard contract
    (streaming/quality.py): per-(lang, source) admitted-document
    counts and mean/min admitted quality at the default threshold.
    The stream's drained complete-mode output is asserted equal to
    this exact table by tests/test_streaming_quality.py, so the
    driver oracle here transitively pins the streaming path too.
    The aggregation key space is bounded (langs x sources), which is
    what makes the streaming variant's state O(vocab), not O(corpus).
    """
    return gate_summary(_t(spark, sf_dir, "documents"), DEFAULT_THRESHOLD)


# ------------------------------------------------------------- PII redaction
_PII_INJECT_SQL = """
  SELECT source,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' contact: user' || CAST(doc_id AS VARCHAR) || '@example.com'
              ELSE text END
         || CASE WHEN doc_id % 11 = 0
              THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.'
                   || CAST(doc_id % 100 AS VARCHAR) || '.7'
              ELSE '' END
         || CASE WHEN doc_id % 13 = 0
              THEN ' call +1-555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                   || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE '' END AS text
  FROM documents
"""

_PII_SQL = f"""
WITH injected AS ({_PII_INJECT_SQL}),
per AS (
  SELECT source,
         len(regexp_extract_all(text, '{{email}}')) AS n_emails,
         len(regexp_extract_all(text, '{{ip}}')) AS n_ips,
         len(regexp_extract_all(text, '{{phone}}')) AS n_phones,
         length(text)
           - length(regexp_replace(regexp_replace(regexp_replace(text,
                     '{{email}}', '<EMAIL>', 'g'),
                     '{{ip}}', '<IP>', 'g'),
                     '{{phone}}', '<PHONE>', 'g')) AS chars_delta
  FROM injected
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN n_emails + n_ips + n_phones > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
       CAST(sum(n_emails) AS BIGINT) AS n_emails,
       CAST(sum(n_ips) AS BIGINT) AS n_ips,
       CAST(sum(n_phones) AS BIGINT) AS n_phones,
       CAST(sum(chars_delta) AS BIGINT) AS chars_delta
FROM per
GROUP BY source
"""


def _pii_oracle() -> str:
    return (
        _PII_SQL.replace("{email}", _text.PII_EMAIL_RE)
        .replace("{ip}", _text.PII_IPV4_RE)
        .replace("{phone}", _text.PII_PHONE_RE)
    )


@query("pii_redaction_sources", _pii_oracle())
def q_pii_redaction_sources(spark, sf_dir):
    """PII scrub audit per source with the EXTENDED pattern set:
    full-charset emails (subdomains, +tags, mixed case), \b-anchored
    IPv4s, and international +CC phone numbers — the production
    generalization of registry_pipeline.pii_redaction, which pins the
    simple-pattern scrub byte-identically via an md5 checksum. This
    entry instead exposes the reusable library form
    (functions/text.redact_pii / pii_counts, restricted to
    Java-regex/RE2-identical syntax) and reports the redaction length
    delta; PII is injected deterministically into doc_id-keyed
    subsets (the driver corpus carries none — same injection pattern
    as doc_repetition / char_entropy_quality, expressed identically
    in both engines). tests/test_r8_pii.py asserts zero residual
    matches after redaction, incl. adjacent mixed-PII."""
    d = _t(spark, sf_dir, "documents")
    injected = d.select(
        "source",
        F.concat(
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.col("text"),
                    F.lit(" contact: user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.col("text")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(
                    F.lit(" from 10."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit("."),
                    (F.col("doc_id") % 100).cast("string"),
                    F.lit(".7"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.concat(
                    F.lit(" call +1-555-"),
                    F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                    F.lit("-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    n_em, n_ip, n_ph = _text.pii_counts("text")
    per = injected.select(
        "source",
        n_em.alias("n_emails"),
        n_ip.alias("n_ips"),
        n_ph.alias("n_phones"),
        (F.length("text") - F.length(_text.redact_pii("text"))).alias("chars_delta"),
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            ((F.col("n_emails") + F.col("n_ips") + F.col("n_phones")) > 0).cast("int")
        )
        .cast("bigint")
        .alias("docs_with_pii"),
        F.sum("n_emails").cast("bigint").alias("n_emails"),
        F.sum("n_ips").cast("bigint").alias("n_ips"),
        F.sum("n_phones").cast("bigint").alias("n_phones"),
        F.sum("chars_delta").cast("bigint").alias("chars_delta"),
    )


# ---------------------------------------------- temperature mixture plan
_TEMP_ALPHA = 0.3  # mT5-style smoothing exponent
_TEMP_BUDGET = 400  # total training-sample budget at sf0.01


@query(
    "temperature_mixture_plan",
    f"""
WITH per AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
),
tot AS (SELECT sum(pow(CAST(n_docs AS DOUBLE), {_TEMP_ALPHA})) AS z FROM per)
SELECT source, n_docs,
       round(pow(CAST(n_docs AS DOUBLE), {_TEMP_ALPHA}) / z, 6) AS weight,
       CAST(least(CAST(n_docs AS DOUBLE),
                  floor(round({_TEMP_BUDGET} * pow(CAST(n_docs AS DOUBLE), {_TEMP_ALPHA}) / z, 6)))
            AS BIGINT) AS target_docs,
       CASE WHEN round({_TEMP_BUDGET} * pow(CAST(n_docs AS DOUBLE), {_TEMP_ALPHA}) / z, 6)
                 > CAST(n_docs AS DOUBLE) THEN 1 ELSE 0 END AS capped,
       round(least(CAST(n_docs AS DOUBLE),
                   floor(round({_TEMP_BUDGET} * pow(CAST(n_docs AS DOUBLE), {_TEMP_ALPHA}) / z, 6)))
             / n_docs, 6) AS epochs
FROM per, tot
""",
)
def q_temperature_mixture_plan(spark, sf_dir):
    """Temperature-based mixture ALLOCATION (mT5/UNIMAX-style): derive
    per-source sampling weights n_i^alpha / sum n_j^alpha from the
    corpus itself (alpha < 1 upweights small sources), allocate a
    sample budget, cap each source at one epoch, and report the
    resulting epochs fraction. The planning twin of
    `domain_mixture_sample`, whose weight table is literal — this
    query COMPUTES the table a temperature-mixing run would feed it.

    Scale shape: one map-combined groupBy(source) count (vocabulary-
    sized shuffle), then the normalizer joins back as a 1-row
    broadcast cross — no corpus-sized data moves twice. The one-epoch
    cap is a closed form here; an exact UNIMAX water-filling
    (redistributing capped surplus) is iterative over SOURCES, i.e.
    driver-sized, never data-sized."""
    d = _t(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    npow = F.pow(F.col("n_docs").cast("double"), F.lit(_TEMP_ALPHA))
    z = per.agg(F.sum(F.pow(F.col("n_docs").cast("double"), F.lit(_TEMP_ALPHA))).alias("z"))
    # round BEFORE floor: pow() differs between engines in the last
    # ulp, and floor() amplifies that to a whole-doc difference when
    # the raw allocation sits at an integer boundary (seen live:
    # 20.0 vs 19.999999...). After a 6-dp round both engines floor
    # the same value.
    raw = F.round(F.lit(_TEMP_BUDGET) * npow / F.col("z"), 6)
    target = F.least(F.col("n_docs").cast("double"), F.floor(raw))
    return per.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        F.round(npow / F.col("z"), 6).alias("weight"),
        target.cast("bigint").alias("target_docs"),
        (raw > F.col("n_docs").cast("double")).cast("int").alias("capped"),
        F.round(target / F.col("n_docs"), 6).alias("epochs"),
    )
