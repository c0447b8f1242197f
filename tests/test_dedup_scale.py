"""Scale-wiring gates for the dedup family (VERDICT r01 item 5):
hot-bucket cap, candidate-routed Jaccard, simhash hamming<=k banding."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.textops import (
    connected_components,
    dedup_keeplist,
    exact_duplicate_pairs,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_near_pairs,
    simhash_table,
)
from searchengine_spark.tokenizer import TokenizerConfig, tokens_column

CFG = TokenizerConfig(min_token_length=2)


def _toks():
    return tokens_column(F.col("text"), CFG)


def test_hot_bucket_cap_bounds_pairs(spark):
    """A boilerplate bucket of 20 identical docs must generate pairs only
    among the cap lowest ids — C(8,2)=28 pairs, not C(20,2)=190."""
    docs = spark.createDataFrame(
        [(i, "identical boilerplate legal disclaimer text repeated verbatim")
         for i in range(20)],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_candidates(docs, _toks(), bucket_cap=8).collect()
    assert len(pairs) == 28
    ids = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
    assert ids == set(range(8))
    # uncapped: the full quadratic set (verification mode)
    assert minhash_lsh_candidates(docs, _toks(), bucket_cap=None).count() == 190


def test_jaccard_on_candidates_restricts_pairs(spark):
    """candidates= routes intersection through the given pairs: results are
    exactly the all-pairs results restricted to the candidate set."""
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy cat again and again"),
        (3, "completely unrelated text about database query optimizers"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    allp = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, _toks(), threshold=0.1).collect()
    }
    cand = spark.createDataFrame([(0, 1), (2, 3)], "id_a long, id_b long")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, _toks(), threshold=0.1, candidates=cand
        ).collect()
    }
    assert got == {(0, 1): allp[(0, 1)]}  # (2,3) shares nothing; (0,2) not a candidate
    assert allp[(0, 1)] == 1.0


def test_connected_components_resolution(spark):
    """Chain 1-2-3-4 collapses to min label 1 (transitive, beyond any
    single pair); star 10-(11,12); singleton 20 via ids=; 5-6 from a
    second edge family unioned in."""
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (10, 12), (5, 6)],
        "id_a long, id_b long",
    )
    ids = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 5, 6, 10, 11, 12, 20]],
                                "doc_id long")
    got = {r["id"]: r["canonical_id"]
           for r in connected_components(edges, ids=ids).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5,
                   10: 10, 11: 10, 12: 10, 20: 20}


def test_connected_components_long_chain(spark):
    """A 64-node path converges well under max_iter=32 thanks to pointer
    jumping (plain propagation would need 63 rounds)."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long"
    )
    got = connected_components(edges, max_iter=12)
    assert got.filter(F.col("canonical_id") != 0).count() == 0
    assert got.count() == 64


def test_exact_pairs_star_shape(spark):
    """B identical docs emit B-1 hub edges, not C(B,2)."""
    docs = spark.createDataFrame(
        [(i, "same text") for i in range(5)] + [(9, "other")],
        "doc_id long, text string",
    )
    pairs = exact_duplicate_pairs(docs).collect()
    assert sorted((r["id_a"], r["id_b"]) for r in pairs) == [(0, i) for i in range(1, 5)]


def test_dedup_keeplist_composition(spark):
    """exact copy (0,1), near-dup (2), unrelated (3): keep-list keeps the
    lowest id of the near-dup cluster and the singleton."""
    # near-dup at HIGH Jaccard (one word of ~40 changed -> J ~ 0.9): the
    # pair must be found by the LSH composition itself, not by a lucky
    # band collision of a borderline J ~ 0.5 pair (family-dependent)
    base = ("the quick brown fox jumps over the lazy dog again and again "
            "today while the patient owl watches from the tall oak tree "
            "near the quiet river bank counting silver fish that swim "
            "slowly beneath the old wooden bridge at sunset every evening")
    rows = [(0, base), (1, base), (2, base.replace("dog", "cat")),
            (3, "completely unrelated text about database query optimizers")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r["canonical_id"]
           for r in dedup_keeplist(docs, _toks()).collect()}
    assert got[0] == 0 and got[1] == 0 and got[3] == 3
    assert got[2] == 0  # jaccard/simhash links the near-dup into the cluster
    keep = {i for i, c in got.items() if i == c}
    assert keep == {0, 3}


def test_simhash_near_pairs_hamming(spark):
    """Identical docs -> hamming 0; one-word-changed doc -> small hamming
    found through the 4x16 band join (pigeonhole guarantees <=3 coverage)."""
    base = "rock album review with many detailed words about the band sound"
    rows = [
        (0, base),
        (1, base),
        (2, base.replace("sound", "noise")),
        (3, "entirely different content on tax law and accounting rules"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = simhash_table(docs, _toks(), id_col="doc_id")
    near = {(r["id_a"], r["id_b"]): r["hamming"]
            for r in simhash_near_pairs(sigs, max_hamming=3).collect()}
    assert near[(0, 1)] == 0
    assert (0, 3) not in near and (1, 3) not in near
    with pytest.raises(ValueError):
        simhash_near_pairs(sigs, max_hamming=4)


def test_exact_dedup_null_text_consistent(spark):
    # NULL-text docs are never duplicates in EITHER form: the group form
    # must not collapse them into one fake md5(NULL) group the pair form
    # (NULL never equi-joins) would disagree with
    from searchengine_spark.textops.dedup import (
        exact_duplicate_pairs,
        exact_duplicates,
    )

    docs = spark.createDataFrame(
        [(0, None), (1, None), (2, "same"), (3, "same")],
        "doc_id long, text string",
    )
    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1 and groups[0]["canonical_id"] == 2
    pairs = {(r["id_a"], r["id_b"]) for r in exact_duplicate_pairs(docs).collect()}
    assert pairs == {(2, 3)}


def test_duplicated_ngram_spans_vs_brute(spark):
    """Token-level duplicated-span masking (textops/dedup.py
    duplicated_ngram_spans): maximal merged intervals over the
    non-canonical duplicated-n-gram starts equal a Python brute twin;
    canonical (first) occurrences are never masked; short docs emit
    nothing."""
    from searchengine_spark.textops.dedup import duplicated_ngram_spans
    from searchengine_spark.tokenizer import tokenize_text

    texts = {
        0: "aa bb cc dd ee ff gg hh",          # source passage
        1: "xx aa bb cc dd yy zz qq",          # dup 4-gram at 1..5
        2: "aa bb cc dd ee pp aa bb cc dd ee", # dup vs doc0 AND self
        3: "uu vv ww",                         # too short for n=4
        4: "bb cc dd ee ff gg ss tt",          # overlapping dups -> merge
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string")
    n = 4
    out = duplicated_ngram_spans(docs, _toks(), n=n)
    got = {}
    for r in out.collect():
        got.setdefault(r["id"], []).append(
            (r["span_start"], r["span_end"], r["n_tokens"]))

    # brute twin
    toks = {i: tokenize_text(t, CFG) for i, t in texts.items()}
    first = {}
    occs = []
    for i in sorted(toks):
        ts = toks[i]
        for s in range(len(ts) - n + 1):
            g = "\x1f".join(ts[s:s + n])
            if g not in first:
                first[g] = (i, s)
            occs.append((i, s, g))
    dup_starts = {}
    for i, s, g in occs:
        if first[g] != (i, s):
            dup_starts.setdefault(i, []).append(s)
    want = {}
    for i, ss in dup_starts.items():
        spans = []
        cs = ce = None
        for s in sorted(ss):
            if cs is None:
                cs, ce = s, s + n
            elif s <= ce:
                ce = max(ce, s + n)
            else:
                spans.append((cs, ce, ce - cs))
                cs, ce = s, s + n
        spans.append((cs, ce, ce - cs))
        want[i] = spans
    assert {k: sorted(v) for k, v in got.items()} == want
    assert 0 not in want          # all doc-0 grams are canonical
    assert 3 not in want          # too short
    assert want[1] == [(1, 5, 4)]  # the single duplicated 4-gram
    with pytest.raises(ValueError, match="n must be"):
        duplicated_ngram_spans(docs, _toks(), n=1)
