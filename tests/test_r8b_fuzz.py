"""Cross-engine fuzz for the round-8b curation filters: write an
adversarial in-memory corpus to a temp parquet `documents` table,
then run the REGISTERED Spark query and its REGISTERED DuckDB oracle
on it — the exact driver comparison, but over generated edge-case
inputs instead of the fixed test corpus.

Adversarial shapes covered by the generators:
- empty texts and whitespace-only texts (token count 0);
- single-token docs (bigram stream = one '<s>'-context pair);
- docs made of ONE repeated token (degenerate distributions: the
  bigram model goes near-deterministic, every n-gram is the top
  n-gram, one DSIR bucket absorbs the whole doc);
- runs of mixed whitespace (space / tab / double-space) probing the
  \\s+ tokenizer split parity between Java and DuckDB regex engines;
- the literal token '<s>' colliding with the sentence-start marker
  (both engines must merge its context counts identically);
- accented BMP tokens (UTF-16 vs UTF-8 unit parity).

derandomize=True pins the example set — a green run is reproducible.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import __spark_entry__ as entrymod

_VOCAB = ["a", "bb", "the", "<s>", "zé", "x1", "!"]
_SEPS = [" ", "  ", "\t", " \t "]

_texts = st.lists(
    st.one_of(
        st.just(""),
        st.just("   "),
        st.lists(
            st.sampled_from(_VOCAB), min_size=1, max_size=12
        ).flatmap(
            lambda toks: st.lists(
                st.sampled_from(_SEPS), min_size=len(toks), max_size=len(toks)
            ).map(
                lambda seps: "".join(t + s for t, s in zip(toks, seps)).strip()
            )
        ),
        # degenerate: one token repeated many times
        st.tuples(
            st.sampled_from(_VOCAB), st.integers(min_value=2, max_value=30)
        ).map(lambda p: (p[0] + " ") * p[1]),
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
    # one-terminal-rounding-step tolerance: both engines round float
    # outputs to a 1e-4/1e-6 grid, and a true value within an
    # engine-ulp of a grid boundary legitimately rounds differently
    # (the full suite observed exactly this: mean_logw -6.62579 vs
    # -6.625789 on a degenerate fuzzed corpus). The REGISTRY corpus is
    # separately held to exact hash parity by verify_all / the driver;
    # the fuzz asserts semantic agreement, where a one-grid-step
    # boundary flip is expected noise and anything larger is a bug.
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
    return str(tmp_path_factory.mktemp("r8b_fuzz"))


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(_texts)
def test_fuzzed_bigram_lm_matches_oracle(spark, corpus_dir, texts):
    _compare(spark, "bigram_lm_perplexity", texts, corpus_dir)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(_texts)
def test_fuzzed_top_ngram_matches_oracle(spark, corpus_dir, texts):
    _compare(spark, "top_ngram_coverage", texts, corpus_dir)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(_texts)
def test_fuzzed_dsir_matches_oracle(spark, corpus_dir, texts):
    _compare(spark, "dsir_importance_weights", texts, corpus_dir)


def test_semantic_decontamination_zero_norm_guard(spark, corpus_dir):
    """A zero-norm vector must not crash the query (ANSI Spark throws
    on double x/0 where DuckDB yields NULL): zero vectors are excluded
    from scoring on BOTH sides — a zero TRAIN vector disappears from
    every probe's candidate set, a zero PANEL vector drops its probe
    from the output entirely — and the two engines still hash-match."""
    rows = []
    for i in range(60):
        if i == 7 or i == 50:  # zero train vector / zero panel vector
            v = [0.0, 0.0, 0.0, 0.0]
        else:
            v = [float(i % 5 + 1), float(i % 3), 1.0, float(i % 7)]
        rows.append((i, v))
    df = spark.createDataFrame(
        [(i, v, 0) for i, v in rows], "vec_id long, embedding array<float>, label int"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(corpus_dir, "embeddings.parquet")
    )
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    name = "semantic_decontamination"
    srows = sorted(tuple(r) for r in qs[name](spark, corpus_dir).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{os.path.join(corpus_dir, 'embeddings.parquet')}/*.parquet'"
    )
    drows = sorted(map(tuple, con.execute(osql[name]).fetchall()))
    assert srows == drows
    probe_ids = {r[0] for r in srows}
    assert 0 in probe_ids  # the healthy probe survives
    assert 50 not in probe_ids  # the zero-norm probe is excluded
