"""TSV.gz source parity vs the reference Parser (csv.DictReader pipeline)."""

from __future__ import annotations

import csv
import gzip

import pytest

from searchengine_spark.sources import read_tsv_docs

import ref_oracle

ROWS = [
    {"review_id": "r1", "review_headline": "Great album", "review_body": "Loved the guitar solo."},
    {"review_id": "r2", "review_headline": "", "review_body": "empty headline above"},
    {"review_id": "r3", "review_headline": 'has "quotes" and, commas', "review_body": "body\ttab"},
    {"review_id": "r4", "review_headline": "unicode café ♛", "review_body": "naïve straße"},
    {"review_id": "r5", "review_headline": "only headline", "review_body": ""},
]


@pytest.fixture(scope="module")
def tsv_gz(tmp_path_factory):
    p = tmp_path_factory.mktemp("tsv") / "reviews.tsv.gz"
    with gzip.open(p, "wt", encoding="utf-8", newline="") as fh:
        w = csv.DictWriter(
            fh, fieldnames=["review_id", "review_headline", "review_body"], delimiter="\t"
        )
        w.writeheader()
        for r in ROWS:
            w.writerow(r)
    return str(p)


def _reference_parse(path):
    mods = ref_oracle._import_ref()
    # reference Parser is importable standalone (src/models/parser.py)
    import importlib

    parser_mod = importlib.import_module("models.parser")
    parser = parser_mod.Parser(path, "review_id", {"review_headline", "review_body"})
    return list(parser.parse("\t"))


def test_tsv_parity(spark, tsv_gz):
    want = _reference_parse(tsv_gz)
    got = [
        (r["ext_id"], r["text"])
        for r in read_tsv_docs(
            spark, tsv_gz, "review_id", ["review_headline", "review_body"]
        ).collect()
    ]
    assert sorted(got) == sorted(want)


def test_tsv_missing_columns_raise(spark, tsv_gz):
    # a typo'd --tsv-columns list must fail loudly, not silently build an
    # index of empty documents (the reference's DictReader KeyErrors)
    import pytest

    from searchengine_spark.sources import read_tsv_docs

    with pytest.raises(ValueError, match="lacks requested columns"):
        read_tsv_docs(spark, tsv_gz, "review_id",
                      ["review_headline", "no_such_column"]).collect()
