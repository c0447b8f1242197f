"""Conversation-level dedup gates (textops/dedup.py
conversation_fingerprints / conversation_duplicates): fingerprints
match a Python replay (order-sensitive — reordering two turns changes
the fp; editing one turn changes it; an exact relabeled copy shares
it), duplicate groups pick the lexicographically smallest canonical,
and singletons never emit."""

from __future__ import annotations

import hashlib

import pytest

from searchengine_spark.textops.dedup import (
    conversation_duplicates,
    conversation_fingerprints,
)

CORPUS = [
    ("a", 0, "hello"), ("a", 1, "world"), ("a", 2, "bye"),
    ("b", 0, "hello"), ("b", 1, "world"), ("b", 2, "bye"),   # dup of a
    ("c", 0, "world"), ("c", 1, "hello"), ("c", 2, "bye"),   # reordered
    ("d", 0, "hello"), ("d", 1, "world"), ("d", 2, "bye!"),  # edited
    ("e", 5, "hello"), ("e", 9, "world"), ("e", 11, "bye"),  # same texts,
    # different turn indices -> same ORDERED sequence -> dup of a
]


def _fp(turns):
    joined = "|".join(hashlib.md5(t.encode()).hexdigest()
                      for _, t in sorted(turns))
    return hashlib.md5(joined.encode()).hexdigest()


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        CORPUS, "conv_id string, turn_idx int, text string")


def test_fingerprints_match_replay(spark, corpus):
    got = {r["conv_id"]: (r["n_turns"], r["fp"]) for r in
           conversation_fingerprints(corpus).collect()}
    by_conv: dict = {}
    for c, t, x in CORPUS:
        by_conv.setdefault(c, []).append((t, x))
    for c, turns in by_conv.items():
        assert got[c] == (len(turns), _fp(turns)), c
    assert got["a"][1] == got["b"][1] == got["e"][1]
    assert got["a"][1] != got["c"][1]  # order matters
    assert got["a"][1] != got["d"][1]  # content matters


def test_duplicate_groups(spark, corpus):
    rows = conversation_duplicates(corpus).collect()
    got = {r["conv_id"]: (r["canonical_conv"], r["group_size"])
           for r in rows}
    assert got == {"a": ("a", 3), "b": ("a", 3), "e": ("a", 3)}
