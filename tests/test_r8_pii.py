"""PII scrub goldens (functions/text.redact_pii / pii_counts):
residual-free redaction, count consistency, and the map-only plan
shape. The cross-engine value pin lives in the driver oracle
(registry_r8.pii_redaction_sources); these tests pin the semantics
the oracle's rollup can't see per-row."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sh_design_spark.functions import text
from tests.conftest import SF_SMOKE

FIXTURE = [
    (1, "mail me at alice.smith+spam@sub.example.co.uk today"),
    (2, "server 192.168.1.250 and 10.0.0.1 are up"),
    (3, "call +1-555-867-5309 or +44-207-946-0958 now"),
    (4, "no pii here at all"),
    (5, "mixed: bob@x.io on 172.16.9.8 via +1-555-000-1111"),
    (6, ""),
]


def _df(spark):
    return spark.createDataFrame(FIXTURE, "doc_id int, text string")


def test_redaction_leaves_no_residual_matches(spark):
    """After redact_pii, every pattern count is zero — including on
    the mixed-PII row where replacements are adjacent."""
    red = _df(spark).select(text.redact_pii("text").alias("text"))
    n_em, n_ip, n_ph = text.pii_counts("text")
    leftover = red.select(
        F.sum(n_em + n_ip + n_ph).alias("n")
    ).collect()[0]["n"]
    assert leftover == 0


def test_counts_and_placeholders(spark):
    got = {
        r["doc_id"]: (r["e"], r["i"], r["p"], r["red"])
        for r in _df(spark)
        .select(
            "doc_id",
            text.pii_counts("text")[0].alias("e"),
            text.pii_counts("text")[1].alias("i"),
            text.pii_counts("text")[2].alias("p"),
            text.redact_pii("text").alias("red"),
        )
        .collect()
    }
    assert got[1][:3] == (1, 0, 0) and "<EMAIL>" in got[1][3]
    assert got[2][:3] == (0, 2, 0) and got[2][3].count("<IP>") == 2
    assert got[3][:3] == (0, 0, 2) and got[3][3].count("<PHONE>") == 2
    assert got[4][:3] == (0, 0, 0) and got[4][3] == "no pii here at all"
    assert got[5][:3] == (1, 1, 1)
    assert got[6][:3] == (0, 0, 0) and got[6][3] == ""


def test_injected_corpus_counts_follow_moduli(spark):
    """On the oracle query's injected corpus, every doc_id % 7 == 0
    doc carries exactly one email (likewise 11 -> IP, 13 -> phone):
    total counts equal the modulus populations."""
    import __spark_entry__ as em

    docs = spark.read.parquet(SF_SMOKE + "/documents.parquet")
    n = {
        m: docs.filter(F.col("doc_id") % m == 0).count() for m in (7, 11, 13)
    }
    agg = (
        em.queries()["pii_redaction_sources"](spark, SF_SMOKE)
        .agg(
            F.sum("n_emails").alias("e"),
            F.sum("n_ips").alias("i"),
            F.sum("n_phones").alias("p"),
        )
        .collect()[0]
    )
    assert (agg["e"], agg["i"], agg["p"]) == (n[7], n[11], n[13])


def test_redaction_is_mapside(spark):
    """The scrub must stay scan -> project: an Exchange means the
    regexp chain regressed off the map side."""
    docs = spark.read.parquet(SF_SMOKE + "/documents.parquet")
    plan = (
        docs.select(text.redact_pii("text").alias("t"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
