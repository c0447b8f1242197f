"""URL/domain filter gates (textops/urlfilter.py — the web-pipeline
gate ahead of every text-level cleaning stage).

Contract: native parse (scheme/host-sans-port/registered domain with
the two-level-suffix rule), fixed reason precedence (bad_scheme >
blocked_domain > blocked_substring), blocking a registered domain
blocks every subdomain, one output row per input doc.
"""

import pytest

from searchengine_spark.textops.urlfilter import url_filter


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "https://news.example.com/a/b"),
        (1, "http://ads.tracker.co.uk:8080/x?q=1"),
        (2, "ftp://mirror.net/pub"),
        (3, "https://spam.badsite.org/casino"),
        (4, "https://GOOD.example.ORG/Casino-Reviews"),
        (5, "not a url at all"),
        (6, None),
        (7, "https://localhost/admin"),
    ]
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_parse_and_precedence(spark, docs):
    got = {r["doc_id"]: r for r in url_filter(
        docs, blocked_domains=["badsite.org", "tracker.co.uk"],
        blocked_substrings=["casino"]).collect()}
    # plain parse
    assert got[0]["scheme"] == "https"
    assert got[0]["host"] == "news.example.com"
    assert got[0]["registered_domain"] == "example.com"
    assert got[0]["keep"] and got[0]["reason"] is None
    # two-level suffix: registered domain is ads->tracker.co.uk, port
    # stripped; blocked as a domain (precedence over any substring)
    assert got[1]["host"] == "ads.tracker.co.uk"
    assert got[1]["registered_domain"] == "tracker.co.uk"
    assert got[1]["reason"] == "blocked_domain"
    # scheme gate
    assert got[2]["reason"] == "bad_scheme"
    # subdomain of a blocked registered domain blocks too
    assert got[3]["registered_domain"] == "badsite.org"
    assert got[3]["reason"] == "blocked_domain"
    # substring rule is case-insensitive and path-wide
    assert got[4]["reason"] == "blocked_substring"
    # unparseable / NULL URLs drop as bad_scheme
    assert got[5]["reason"] == "bad_scheme"
    assert got[6]["reason"] == "bad_scheme"
    # single-label host IS its own registered domain
    assert got[7]["registered_domain"] == "localhost"
    assert got[7]["keep"]
    # one row per input doc, keep == (reason IS NULL)
    assert len(got) == 8
    assert all((r["reason"] is None) == r["keep"] for r in got.values())


def test_empty_blocklists_keep_http_https(spark, docs):
    got = {r["doc_id"]: r["keep"] for r in url_filter(docs).collect()}
    assert got == {0: True, 1: True, 2: False, 3: True, 4: True,
                   5: False, 6: False, 7: True}


def test_validation(spark, docs):
    with pytest.raises(ValueError, match="lacks column"):
        url_filter(docs, url_col="nope")
    with pytest.raises(ValueError, match="at least one scheme"):
        url_filter(docs, allow_schemes=())


def test_pipeline_stage0(spark):
    """clean_corpus composes the URL gate as stage 0 — dropped docs
    never reach any text stage; the funnel records it."""
    from pyspark.sql import functions as F

    from searchengine_spark.textops.pipeline import CleanConfig, clean_corpus

    docs = spark.createDataFrame(
        [(0, "https://ok.example.com/a", "good words " * 10),
         (1, "https://spam.badsite.org/x", "good words " * 10),
         (2, "ftp://mirror.net/y", "good words " * 10)],
        "doc_id long, url string, text string")
    out, stats = clean_corpus(docs, CleanConfig(
        url_col="url", blocked_domains=("badsite.org",)))
    assert stats["input"] == 3 and stats["url_filter"] == 1
    assert [r["doc_id"] for r in out.collect()] == [0]
    with pytest.raises(ValueError, match="url_col"):
        clean_corpus(docs.drop("url"), CleanConfig(url_col="url"))
