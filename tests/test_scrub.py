"""PII scrub gates: handcrafted detection/redaction cases and the
counts == placeholders invariant."""

from __future__ import annotations

import pytest

from searchengine_spark.textops import pii_stats, redact_pii


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "reach me at alice.smith+spam@sub.example.co.uk thanks"),
        (1, "server 192.168.1.254 and 10.0.0.1 are down"),
        (2, "call +1 555 0123 456 or 020 7946 09584"),
        (3, "mixed: bob@x.io from 8.8.8.8 dial +44 20 7946 0958"),
        (4, "clean text with no identifiers at all"),
        (5, "not-an-email @ example.com and version 1.2 remain"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_counts(spark, docs):
    got = {
        r["id"]: (r["n_email"], r["n_ip"], r["n_phone"])
        for r in pii_stats(docs).collect()
    }
    assert got[0] == (1, 0, 0)
    assert got[1] == (0, 2, 0)
    assert got[2][2] >= 2 and got[2][:2] == (0, 0)
    assert got[3] == (1, 1, 1)
    assert got[4] == (0, 0, 0)
    assert got[5] == (0, 0, 0)  # bare '@' and short version numbers survive


def test_redaction(spark, docs):
    got = {r["doc_id"]: r["text"] for r in redact_pii(docs).collect()}
    assert got[0] == "reach me at <EMAIL> thanks"
    assert got[1] == "server <IP> and <IP> are down"
    assert got[3] == "mixed: <EMAIL> from <IP> dial <PHONE>"
    assert got[4] == "clean text with no identifiers at all"
    assert "1.2" in got[5]  # short dotted numbers are not IPs


def test_counts_equal_placeholders(spark, docs):
    """pii_stats counts must equal the placeholders redact_pii emits."""
    stats = {
        r["id"]: (r["n_email"], r["n_ip"], r["n_phone"])
        for r in pii_stats(docs).collect()
    }
    red = {r["doc_id"]: r["text"] for r in redact_pii(docs).collect()}
    for d, text in red.items():
        assert stats[d] == (
            text.count("<EMAIL>"), text.count("<IP>"), text.count("<PHONE>")
        ), d


def test_null_text_counts_zero(spark):
    # NULL text is zero PII spans, not NULL counts (a sum/filter
    # downstream must not silently skip/drop the doc)
    docs = spark.createDataFrame(
        [(0, None), (1, "bob@x.io")], "doc_id long, text string"
    )
    got = {
        r["id"]: (r["n_email"], r["n_ip"], r["n_phone"])
        for r in pii_stats(docs).collect()
    }
    assert got[0] == (0, 0, 0)
    assert got[1] == (1, 0, 0)
