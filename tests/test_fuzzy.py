"""SymSpell-style fuzzy correction (query/fuzzy.py): candidate-generation
completeness, verification exactness (Levenshtein <= 1, transposition
collisions rejected), ranking contract, and the WAND fuzzy=True e2e."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_spark.query.fuzzy import correct_terms, del1, fuzzy_candidates


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


WORD = st.text(alphabet="ab", min_size=1, max_size=5)


@settings(max_examples=300, deadline=None)
@given(WORD, WORD)
def test_deletion_intersection_generates_all_lev1_pairs(a, b):
    """Completeness: distance <= 1 implies intersecting deletion-1
    neighborhoods (so the generator never loses a true neighbor); the
    converse is handled by the levenshtein verify filter."""
    if _lev(a, b) <= 1:
        assert ({a} | del1(a)) & ({b} | del1(b))


def test_transposition_collision_is_rejected(spark):
    """'aba'/'bab' share deletions but sit at distance 2 — the SymSpell
    verification pass must reject them."""
    d = spark.createDataFrame([("bab", 5)], "term string, df long")
    assert fuzzy_candidates(d, ["aba"]).collect() == []
    assert ({"aba"} | del1("aba")) & ({"bab"} | del1("bab"))  # would collide


def test_candidate_ranking_contract(spark):
    d = spark.createDataFrame(
        [("table", 40), ("cable", 90), ("tale", 90), ("tables", 7),
         ("stable", 3), ("label", 2), ("zzz", 99)],
        "term string, df long",
    )
    rows = fuzzy_candidates(d, ["table"], k=10).collect()
    got = [(r["term"], r["rank"]) for r in sorted(rows, key=lambda r: r["rank"])]
    # exact first, then df desc, then term asc; 'label' is d=2 (excluded)
    assert got == [("table", 1), ("cable", 2), ("tale", 3), ("tables", 4),
                   ("stable", 5)]


def test_correct_terms_identity_and_oov(spark):
    d = spark.createDataFrame(
        [("spark", 10), ("shark", 3)], "term string, df long"
    )
    m = correct_terms(d, ["spark", "spork", "qqqqqq"])
    assert m["spark"] == "spark"  # exact hit maps to itself
    assert m["spork"] == "spark"  # df 10 beats shark's 3 (both d=1)
    assert "qqqqqq" not in m  # no neighbor: caller keeps the original


def test_empty_query_terms(spark):
    d = spark.createDataFrame([("a", 1)], "term string, df long")
    assert fuzzy_candidates(d, []).collect() == []


@pytest.fixture(scope="module")
def fuzzy_pidx(spark, stop_words, tmp_path_factory):
    from searchengine_spark.fixtures import transcripts_df
    from searchengine_spark.indexing.packed import (
        build_packed_index,
        load_packed_index,
    )
    from searchengine_spark.tokenizer import TokenizerConfig

    cfg = TokenizerConfig(min_token_length=3, stop_words=stop_words)
    path = str(tmp_path_factory.mktemp("fuzzy") / "idx")
    build_packed_index(transcripts_df(spark, n_conv=30), cfg, path,
                       chunk_docs=256, tfidf_sidecar=True)
    return load_packed_index(spark, path), cfg


def test_wand_fuzzy_e2e_matches_clean_query(fuzzy_pidx):
    """A typo'd query with fuzzy=True returns the intended query's exact
    ranking (corrections land on the final token space, scoring unchanged)."""
    from searchengine_spark.query.wand import bm25_topk_packed_batch

    pidx, cfg = fuzzy_pidx
    clean = bm25_topk_packed_batch(pidx, ["greatest rock album"], cfg, k=5)
    typo = bm25_topk_packed_batch(
        pidx, ["greatst rock albumm"], cfg, k=5, fuzzy=True
    )
    want = [(r["doc_id"], round(r["score"], 6)) for r in clean.collect()]
    got = [(r["doc_id"], round(r["score"], 6)) for r in typo.collect()]
    assert want and got == want


def test_wand_fuzzy_dedupes_colliding_corrections(fuzzy_pidx):
    """Two typos correcting to the SAME term must not double-score it:
    scores equal the single-term query's."""
    from searchengine_spark.query.wand import bm25_topk_packed_batch

    pidx, cfg = fuzzy_pidx
    one = bm25_topk_packed_batch(pidx, ["album"], cfg, k=5)
    two = bm25_topk_packed_batch(pidx, ["albumm albom"], cfg, k=5, fuzzy=True)
    want = [(r["doc_id"], round(r["score"], 6)) for r in one.collect()]
    got = [(r["doc_id"], round(r["score"], 6)) for r in two.collect()]
    assert want and got == want


def test_local_fuzzy_preload_matches_distributed(fuzzy_pidx):
    """The in-memory symmetric-delete correction (preload tier) must make
    the same rewrites as the Spark path: typo'd == clean, bit-identical,
    with ZERO Spark jobs after the variant index is built."""
    from searchengine_spark.query.serve import LocalSearcher

    pidx, cfg = fuzzy_pidx
    ls = LocalSearcher(pidx, preload=True, cfg=cfg)
    clean = ls.search("greatest rock album", k=5)
    typo = ls.search("greatst rock albumm", k=5, fuzzy=True)
    assert clean and typo == clean
    # tfidf through the same rewrite (token-level, any ranker)
    t_clean = ls.search("greatest rock album", k=5, ranker="tfidf")
    t_typo = ls.search("greatst rock albumm", k=5, ranker="tfidf", fuzzy=True)
    assert t_clean and t_typo == t_clean


def test_local_fuzzy_lazy_delegates_to_spark_job(fuzzy_pidx):
    from searchengine_spark.query.serve import LocalSearcher

    pidx, cfg = fuzzy_pidx
    lazy = LocalSearcher(pidx, preload=False, cfg=cfg)
    clean = lazy.search("greatest rock album", k=5)
    typo = lazy.search("greatst rock albumm", k=5, fuzzy=True)
    assert clean and typo == clean
    assert lazy._variants is None  # lazy mode never builds the dict


def test_wand_fuzzy_in_vocab_batch_skips_correction(fuzzy_pidx, monkeypatch):
    """fuzzy=True on a fully in-vocabulary batch must not pay the
    dictionary variants-explode job (the idf collect doubles as the
    vocabulary probe)."""
    import searchengine_spark.query.fuzzy as fz
    from searchengine_spark.query.wand import bm25_topk_packed_batch

    pidx, cfg = fuzzy_pidx

    def boom(*a, **k):  # pragma: no cover
        raise AssertionError("correct_terms ran for an in-vocab batch")

    monkeypatch.setattr(fz, "correct_terms", boom)
    out = bm25_topk_packed_batch(pidx, ["greatest rock album"], cfg, k=3,
                                 fuzzy=True)
    assert out.count() == 3


def test_local_lazy_fuzzy_caches_corrections(fuzzy_pidx, monkeypatch):
    """A repeated typo'd query on a lazy searcher runs the dictionary
    job ONCE; the correction (and the no-neighbor negative) is cached."""
    import searchengine_spark.query.fuzzy as fz
    from searchengine_spark.query.serve import LocalSearcher

    pidx, cfg = fuzzy_pidx
    lazy = LocalSearcher(pidx, preload=False, cfg=cfg)
    calls = []
    real = fz.correct_terms
    monkeypatch.setattr(
        fz, "correct_terms", lambda *a, **k: calls.append(1) or real(*a, **k)
    )
    first = lazy.search("greatst rock zzzqqq", k=3, fuzzy=True)
    again = lazy.search("greatst rock zzzqqq", k=3, fuzzy=True)
    assert first and again == first
    assert len(calls) == 1


def test_wand_fuzzy_oov_without_neighbor_is_or_neutral(fuzzy_pidx):
    from searchengine_spark.query.wand import bm25_topk_packed_batch

    pidx, cfg = fuzzy_pidx
    base = bm25_topk_packed_batch(pidx, ["album"], cfg, k=5)
    plus = bm25_topk_packed_batch(
        pidx, ["album zzzzqqqqzzzz"], cfg, k=5, fuzzy=True
    )
    assert [r.asDict() for r in base.collect()] == [
        r.asDict() for r in plus.collect()
    ]


def test_term_suggestions_modes(spark):
    """ES term suggester: the input term is never a suggestion; missing
    mode only suggests for OOV inputs; popular only keeps strictly-
    more-frequent neighbors; always covers everything; ranking is df
    desc then term asc (distance ties at max_edits=1)."""
    from searchengine_spark.query.fuzzy import term_suggestions

    d = spark.createDataFrame(
        [("table", 40), ("cable", 90), ("fable", 10), ("tble", 2)],
        "term string, df long",
    )
    # 'tabe' is OOV: missing mode suggests its lev<=1 neighbors
    got = term_suggestions(d, ["tabe"], k=5, mode="missing").collect()
    assert [(r["suggestion"], r["df"], r["rank"]) for r in got] == [
        ("table", 40, 1)]
    # 'table' is IN vocab: missing mode stays silent...
    assert term_suggestions(d, ["table"], k=5, mode="missing").collect() == []
    # ...popular keeps only strictly-more-frequent neighbors (cable 90 >
    # table 40; fable 10 and tble 2 drop)...
    pop = term_suggestions(d, ["table"], k=5, mode="popular").collect()
    assert [(r["suggestion"], r["df"]) for r in pop] == [("cable", 90)]
    # ...always returns every neighbor EXCEPT the term itself
    alw = term_suggestions(d, ["table"], k=5, mode="always").collect()
    assert [(r["suggestion"], r["df"], r["rank"]) for r in alw] == [
        ("cable", 90, 1), ("fable", 10, 2), ("tble", 2, 3)]
    # popular for an OOV input: self_df is 0, every neighbor qualifies
    pop2 = term_suggestions(d, ["tabe"], k=5, mode="popular").collect()
    assert [r["suggestion"] for r in pop2] == ["table"]
    with pytest.raises(ValueError, match="mode"):
        term_suggestions(d, ["x"], mode="top")
    assert term_suggestions(d, [], k=3).collect() == []


def test_phrase_suggestions(spark):
    """ES phrase suggester analog: whole-phrase corrections ranked by
    the EXACT integer df product, edit budget enforced, input phrase
    never suggested, OOV-no-neighbor positions sink to score 0."""
    from searchengine_spark.query.fuzzy import phrase_suggestions

    d = spark.createDataFrame(
        [("table", 40), ("cable", 90), ("tune", 60), ("tone", 10),
         ("merge", 100)],
        "term string, df long",
    )
    # 'tabl tune' — 'tabl' is OOV (neighbor: table), 'tune' in vocab
    got = phrase_suggestions(d, ["tabl", "tune"], k=5)
    assert got[0] == ("table tune", 40 * 60, 1)
    # 'table tone' costs 2 edits from ('tabl','tune')? tabl->table=1,
    # tune->tone=1 -> allowed at max_edits=2 and ranks by product
    assert ("table tone", 40 * 10, 2) in got
    # input phrase never suggested even when fully in-vocab
    got2 = phrase_suggestions(d, ["table", "tune"], k=5)
    assert all(p != "table tune" for p, _, _ in got2)
    assert got2[0] == ("cable tune", 90 * 60, 1)
    # edit budget: max_edits=1 forbids double corrections
    got3 = phrase_suggestions(d, ["tabl", "tone"], k=10, max_edits=1)
    assert all(e <= 1 for _, _, e in got3)
    assert ("table tune", 40 * 60, 2) not in got3
    # an OOV token with NO neighbor sinks phrases through it to 0
    got4 = phrase_suggestions(d, ["zzz", "tune"], k=3)
    assert got4 and all(s == 0 for _, s, _ in got4)
    assert phrase_suggestions(d, [], k=3) == []
    import pytest as _pt
    with _pt.raises(ValueError, match="max_edits"):
        phrase_suggestions(d, ["x"], max_edits=0)


# ------------------------------------------------- fuzziness 2 / AUTO


@settings(max_examples=300, deadline=None)
@given(WORD, WORD)
def test_deletion2_intersection_generates_all_lev2_pairs(a, b):
    """Completeness at depth 2: distance <= 2 implies intersecting
    deletion-<=2 neighborhoods."""
    from searchengine_spark.query.fuzzy import del_upto

    if _lev(a, b) <= 2:
        assert del_upto(a, 2) & del_upto(b, 2)


def test_fuzzy_candidates_distance2_vs_brute(spark):
    from searchengine_spark.query.fuzzy import fuzzy_candidates

    vocab = [("table", 40), ("cable", 90), ("tale", 90), ("label", 2),
             ("fable", 5), ("tab", 8), ("stable", 3), ("zzz", 99),
             ("tablet", 6), ("gables", 4)]
    d = spark.createDataFrame(vocab, "term string, df long")
    rows = fuzzy_candidates(d, ["table"], k=100, max_edits=2).collect()
    got = {r["term"]: (r["dist"], r["rank"]) for r in rows}
    want = {t: _lev("table", t) for t, _ in vocab if _lev("table", t) <= 2}
    assert set(got) == set(want)
    for t, (dist, _) in got.items():
        assert dist == want[t], t
    # ranking: exact first, then dist asc, then df desc, then term asc
    ranked = [r["term"] for r in sorted(rows, key=lambda r: r["rank"])]
    brute = sorted(
        want.items(),
        key=lambda tv: (tv[0] != "table", tv[1],
                        -dict(vocab)[tv[0]], tv[0]))
    assert ranked == [t for t, _ in brute]


def test_fuzzy_candidates_rejects_bad_budget(spark):
    from searchengine_spark.query.fuzzy import fuzzy_candidates

    d = spark.createDataFrame([("a", 1)], "term string, df long")
    with pytest.raises(ValueError, match="max_edits"):
        fuzzy_candidates(d, ["ab"], max_edits=3)


def test_auto_fuzziness_ladder():
    from searchengine_spark.query.fuzzy import auto_fuzziness

    assert auto_fuzziness("ab") == 0
    assert auto_fuzziness("abc") == 1
    assert auto_fuzziness("abcde") == 1
    assert auto_fuzziness("abcdef") == 2


def test_term_suggestions_fuzziness2_and_auto(spark):
    from searchengine_spark.query.fuzzy import term_suggestions

    d = spark.createDataFrame(
        [("table", 40), ("cable", 90), ("label", 2), ("tab", 8)],
        "term string, df long",
    )
    # fuzziness 2: 'tble' (d1 to table; d2 to cable) — dist ranks first
    rows = term_suggestions(d, ["tble"], k=10, fuzziness=2).collect()
    got = [r["suggestion"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert got[0] == "table"              # the only distance-1 neighbor
    assert "cable" in got                 # distance 2, higher df — after
    # AUTO: 'tble' is 4 chars -> budget 1 -> distance-1 neighbors only
    rows = term_suggestions(d, ["tble"], k=10, fuzziness="auto").collect()
    assert [r["suggestion"] for r in rows] == ["table"]
    # AUTO: a 2-char OOV term gets budget 0 -> nothing
    rows = term_suggestions(d, ["tb"], k=10, fuzziness="auto").collect()
    assert rows == []
    with pytest.raises(ValueError, match="fuzziness"):
        term_suggestions(d, ["tble"], fuzziness=3)
