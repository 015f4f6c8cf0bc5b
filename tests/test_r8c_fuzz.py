"""Cross-engine fuzz for the round-8c curation shapes, reusing the
round-8b harness contract: write an adversarial in-memory `documents`
corpus to temp parquet, run the REGISTERED Spark query and its
REGISTERED DuckDB oracle on it, compare driver-style.

What the generators probe here, beyond the r8b shapes:
- mixed-CASE and punctuation-heavy tokens (the normalization key's
  lower -> [^\\w\\s] strip -> \\s+ collapse must agree between the
  Java and RE2 regex engines, including on accented BMP letters,
  which BOTH engines treat as non-word chars under ASCII \\w);
- texts that differ ONLY by case/whitespace (normalized_dedup's
  planted-twin arithmetic on arbitrary corpora, incl. empty text
  whose planted twin normalizes back to empty);
- heavy in-doc repetition (dup_ngram_fraction's run-length mass at
  the cap boundary coverage == 1.0);
- degenerate quality scores (all-empty corpora: retention curve's
  sum(n_tok) = 0 NULL guard on both engines).

perplexity_buckets is deliberately NOT fuzzed here: its doc-NLL
input is the already-fuzzed bigram_lm_perplexity sub-plan, and its
tercile thresholds sit on a round-6dp grid where a one-ulp
quantile-interpolation difference on an adversarial corpus could
legitimately flip one doc across a bucket boundary (an integer-count
change the float-tolerance comparator cannot absorb); its contract
is pinned by the both-SF oracle replay plus the balance golden
instead.

derandomize=True pins the example set — a green run is reproducible.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import __spark_entry__ as entrymod

# mixed-case vocab with punctuation-bearing and accented tokens: the
# normalization key must strip/fold these identically cross-engine
_VOCAB = ["a", "A", "bb", "The", "the", "zé", "x1!", "--", "a,b", "."]
_SEPS = [" ", "  ", "\t", " \t "]

_texts = st.lists(
    st.one_of(
        st.just(""),
        st.just("   "),
        st.lists(
            st.sampled_from(_VOCAB), min_size=1, max_size=14
        ).flatmap(
            lambda toks: st.lists(
                st.sampled_from(_SEPS), min_size=len(toks), max_size=len(toks)
            ).map(
                lambda seps: "".join(t + s for t, s in zip(toks, seps)).strip()
            )
        ),
        # degenerate: one token repeated many times (dup coverage -> 1.0 cap)
        st.tuples(
            st.sampled_from(_VOCAB), st.integers(min_value=2, max_value=30)
        ).map(lambda p: (p[0] + " ") * p[1]),
        # a repeated PHRASE: duplicate n-grams at every n in 5..10
        st.sampled_from(_VOCAB).map(lambda t: ("q w e r t y u i o p " * 3) + t),
    ),
    min_size=1,
    max_size=10,
)

_LANGS = ["en", "de", "zh"]
_SOURCES = ["srcA", "srcB"]


def _write_corpus(spark, texts, tmpdir):
    rows = [
        (i, t, _LANGS[i % len(_LANGS)], _SOURCES[i % len(_SOURCES)], len(t))
        for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmpdir, "documents.parquet")
    )


def _rowkey(row):
    return tuple(str(x) for x in row if not isinstance(x, float))


def _close(a, b):
    # same one-grid-step tolerance contract as test_r8b_fuzz._close
    return abs(a - b) <= 2e-4 * max(1.0, abs(a), abs(b))


def _compare(spark, name, texts, tmpdir):
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    _write_corpus(spark, texts, tmpdir)
    srows = sorted(
        (tuple(r) for r in qs[name](spark, tmpdir).collect()), key=_rowkey
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(tmpdir, 'documents.parquet')}/*.parquet'"
    )
    drows = sorted(map(tuple, con.execute(osql[name]).fetchall()), key=_rowkey)
    assert len(srows) == len(drows), f"{name} row count diverged on {texts!r}"
    for s, d in zip(srows, drows):
        assert len(s) == len(d)
        for a, b in zip(s, d):
            if isinstance(a, float) and isinstance(b, float):
                assert _close(a, b), f"{name} diverged on {texts!r}: {s} vs {d}"
            else:
                assert a == b, f"{name} diverged on {texts!r}: {s} vs {d}"


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("r8c_fuzz"))


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(_texts)
def test_fuzzed_normalized_dedup_matches_oracle(spark, corpus_dir, texts):
    _compare(spark, "normalized_dedup", texts, corpus_dir)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(_texts)
def test_fuzzed_dup_ngram_fraction_matches_oracle(spark, corpus_dir, texts):
    _compare(spark, "dup_ngram_fraction", texts, corpus_dir)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(_texts)
def test_fuzzed_retention_curve_matches_oracle(spark, corpus_dir, texts):
    _compare(spark, "quality_retention_curve", texts, corpus_dir)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(_texts)
def test_fuzzed_source_cap_matches_oracle(spark, corpus_dir, texts):
    _compare(spark, "source_cap_sample", texts, corpus_dir)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(_texts)
def test_fuzzed_context_window_fit_matches_oracle(spark, corpus_dir, texts):
    _compare(spark, "context_window_fit", texts, corpus_dir)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(_texts)
def test_fuzzed_cross_source_leakage_matches_oracle(spark, corpus_dir, texts):
    _compare(spark, "cross_source_leakage", texts, corpus_dir)


_LSS_DIR_SEQ = [0]


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(_texts)
def test_fuzzed_leakage_safe_split_matches_oracle(spark, corpus_dir, texts):
    """Fuzz the recursive-closure + dual-hash split oracle. Each
    example gets a FRESH sf_dir: the dedup component sub-plan is
    memoized per (applicationId, sf_dir), so reusing one directory
    would hand example N the components of example 1."""
    _LSS_DIR_SEQ[0] += 1
    _compare(
        spark,
        "leakage_safe_split",
        texts,
        os.path.join(corpus_dir, f"lss{_LSS_DIR_SEQ[0]}"),
    )
