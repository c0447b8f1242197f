"""Regexp term query gates (query/regexp.py — the ES ``regexp`` /
Lucene ``/pattern/`` query_string analog).

Contract: ``/pat/`` words parse on the RAW query and match the ENTIRE
dictionary term (implicit anchoring — explicit ``^``/``$`` refused);
only the documented Java∩Python∩RE2 subset is accepted (engine-divergent
constructs refuse loudly); expansion is df-desc/term-asc capped and
identical across the Spark scan, the in-memory dictionary, and the
federation-global dictionary; literal prefixes push into the term scan
and their absence is guarded like leading wildcards; the
scoring_boolean rewrite is bit-exact through the packed WAND path.
"""

import pytest

from searchengine_spark.fixtures import transcripts_df
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.regexp import (
    anchored,
    bm25_regexp_federated,
    bm25_regexp_packed_batch,
    expand_regexps,
    expand_regexps_local,
    regexp_literal_prefix,
    split_regexps,
    validate_regexp,
)
from searchengine_spark.query.wand import bm25_topk_packed_batch
from searchengine_spark.tokenizer import TokenizerConfig

ROWS = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def pidx(spark, cfg, tmp_path_factory):
    corpus = transcripts_df(spark, n_conv=8)
    path = str(tmp_path_factory.mktemp("rx") / "idx")
    build_packed_index(corpus, cfg, path, chunk_docs=64)
    return load_packed_index(spark, path)


def test_split_regexps():
    assert split_regexps("solo /GUI.*/ /te.t/") == ("solo", ["gui.*", "te.t"])
    # bare / and // are punctuation, not patterns
    assert split_regexps("a / b //") == ("a / b //", [])
    assert split_regexps("plain query") == ("plain query", [])
    with pytest.raises(ValueError, match="negated regexp"):
        split_regexps("-/ab.*/ x")


def test_subset_validation():
    # the accepted subset: classes (incl. negated), groups, alternation,
    # quantifiers (greedy + lazy + counted), escaped punctuation
    for ok in ("gui.*", "pend(ing|ed)", "[a-z]+x", "[^aeiou]at",
               "(?:ab|cd)e", "a{2,3}b", "ab+?c", r"a\.b", r"a\-b"):
        validate_regexp(ok)
    # engine-divergent constructs refuse loudly
    for bad, msg in (
        (r"\d+x", "engine-divergent"),
        (r"\w*y", "engine-divergent"),
        (r"a\b", "engine-divergent"),
        (r"(a)\1", "engine-divergent"),
        ("^abc", "anchor"),
        ("abc$", "anchor"),
        ("(?=ab)c", r"\(\?"),
        ("(?P<n>a)b", r"\(\?"),
        ("[abc", "unterminated"),
        ("a\\", "trailing backslash"),
        ("", "empty"),
    ):
        with pytest.raises(ValueError, match=msg):
            validate_regexp(bad)
    # in-class ^ is negation, not an anchor — allowed
    validate_regexp("[^a]bc")


def test_literal_prefix():
    assert regexp_literal_prefix("gui.*") == "gui"
    assert regexp_literal_prefix("pend(ing|ed)") == "pend"
    # a char directly under a quantifier is NOT guaranteed
    assert regexp_literal_prefix("abc*") == "ab"
    assert regexp_literal_prefix("abc+") == "ab"
    assert regexp_literal_prefix("abc{2}") == "ab"
    assert regexp_literal_prefix("a?bc") == ""
    # top-level alternation voids the prefix (cd... also matches)
    assert regexp_literal_prefix("ab|cd") == ""
    # ... but a GROUPED alternation just ends it
    assert regexp_literal_prefix("ab(c|d)") == "ab"
    assert regexp_literal_prefix("[ab]cd") == ""
    assert regexp_literal_prefix(r"a\.b*") == "a"
    assert regexp_literal_prefix("plain") == "plain"
    assert anchored("ab|cd") == "^(?:ab|cd)$"


def test_expand_spark_equals_local_and_anchoring(pidx):
    stats = {r["term"]: int(r["df"])
             for r in pidx.term_stats.select("term", "df").collect()}
    pats = ["gui[a-z]*", "s.lo", "dru(m|ms|mmer)", "zzz[0-9]+"]
    got_spark = expand_regexps(pidx.term_stats, pats, max_expansions=5)
    got_local = expand_regexps_local(stats, pats, max_expansions=5)
    assert got_spark == got_local
    assert "guitar" in got_spark["gui[a-z]*"]
    assert got_spark["zzz[0-9]+"] == []
    # whole-term semantics: s.lo matches solo, never a term that merely
    # CONTAINS solo or a prefix of it
    assert got_spark["s.lo"] == [t for t in got_spark["s.lo"]
                                 if len(t) == 4 and t.endswith("lo")]
    assert "solo" in got_spark["s.lo"]
    for terms in got_spark.values():
        assert len(terms) <= 5
    # df-desc/term-asc cap selection, deterministic
    full = expand_regexps_local(stats, ["gui[a-z]*"], max_expansions=50)
    assert full["gui[a-z]*"] == sorted(full["gui[a-z]*"],
                                       key=lambda t: (-stats[t], t))


def test_prefix_guard(pidx):
    with pytest.raises(ValueError, match="no literal prefix"):
        expand_regexps(pidx.term_stats, ["[gd]uitar"])
    # opting in permits the full dictionary scan
    got = expand_regexps(pidx.term_stats, ["[gd]uitar"],
                         allow_leading_wildcard=True)
    assert "guitar" in got["[gd]uitar"]


def test_dead_terms_never_expand():
    got = expand_regexps_local({"alive": 3, "dead": 0}, ["(alive|dead)"],
                               allow_leading_wildcard=True)
    assert got["(alive|dead)"] == ["alive"]


def test_scoring_boolean_rewrite_exact(pidx, cfg):
    """Regexp retrieval == typing the expansion terms yourself, bit for
    bit, and differs from the pattern-less query."""
    exp = expand_regexps(pidx.term_stats, ["gui[a-z]*"], max_expansions=50)
    typed_q = "solo " + " ".join(exp["gui[a-z]*"])
    rx = bm25_regexp_packed_batch(pidx, ["solo /gui[a-z]*/"], cfg, k=10,
                                  round_dp=6)
    typed = bm25_topk_packed_batch(pidx, [typed_q], cfg, k=10, round_dp=6)
    got = ROWS(rx)
    assert got == ROWS(typed)
    assert len(got) > 0
    plain = bm25_topk_packed_batch(pidx, ["solo"], cfg, k=10, round_dp=6)
    assert got != ROWS(plain)


def test_matchless_and_pure_pattern_queries(pidx, cfg):
    rx = bm25_regexp_packed_batch(pidx, ["solo /zzz[0-9]+/"], cfg, k=10,
                                  round_dp=6)
    plain = bm25_topk_packed_batch(pidx, ["solo"], cfg, k=10, round_dp=6)
    assert ROWS(rx) == ROWS(plain)
    assert ROWS(bm25_regexp_packed_batch(pidx, ["/zzz[0-9]+/"], cfg,
                                         k=10)) == []
    assert len(ROWS(bm25_regexp_packed_batch(pidx, ["/gui[a-z]*/"], cfg,
                                             k=10))) > 0


def test_local_tier_parity(pidx, cfg):
    """LocalSearcher regexp=True == the distributed packed path, on both
    the lazy and preload tiers; wildcard+regexp compose."""
    from searchengine_spark.query.serve import LocalSearcher

    q = "solo /gui[a-z]*/"
    dist = ROWS(bm25_regexp_packed_batch(pidx, [q], cfg, k=10, round_dp=6))
    for preload in (False, True):
        loc = LocalSearcher(pidx, preload=preload, cfg=cfg)
        rows = loc.search(q, k=10, round_dp=6, regexp=True, resolve=False)
        got = sorted((0, r["doc_id"], r["score"], r["rank"]) for r in rows)
        assert got == dist
    # wildcard + regexp in one query: each syntax parses its own words
    loc = LocalSearcher(pidx, preload=True, cfg=cfg)
    both = loc.search("dru* /s.lo/", k=10, round_dp=6, wildcard=True,
                      regexp=True, resolve=False)
    exp_w = loc.expand_wildcards(["dru*"])["dru*"]
    exp_r = loc.expand_regexps(["s.lo"])["s.lo"]
    typed = loc.search(" ".join(dict.fromkeys(exp_w + exp_r)), k=10,
                       round_dp=6, resolve=False)
    assert [(r["doc_id"], r["score"]) for r in both] == \
        [(r["doc_id"], r["score"]) for r in typed]


def test_local_tier_refusals(pidx, cfg):
    from searchengine_spark.query.serve import LocalSearcher

    loc = LocalSearcher(pidx, preload=True, cfg=cfg)
    with pytest.raises(NotImplementedError, match="regexp"):
        loc.search("/gui.*/", ranker="tfidf", regexp=True)
    with pytest.raises(ValueError, match="no literal prefix"):
        loc.search("/.*ism/", regexp=True)
    # same text as BOTH syntaxes is ambiguous — refused
    with pytest.raises(ValueError, match="BOTH"):
        # 'gui*' is a valid wildcard AND a valid regexp
        loc.search("gui* /gui*/", wildcard=True, regexp=True)


def test_federated_parity(spark, pidx, cfg):
    from searchengine_spark.query.serve import FederatedLocalSearcher

    q = "solo /gui[a-z]*/"
    dist = ROWS(bm25_regexp_packed_batch(pidx, [q], cfg, k=10, round_dp=6))
    fed = ROWS(bm25_regexp_federated([pidx], [q], cfg, k=10, round_dp=6))
    assert fed == dist
    floc = FederatedLocalSearcher([pidx], preload=True, cfg=cfg)
    rows = floc.search(q, k=10, round_dp=6, regexp=True, resolve=False)
    got = sorted((0, r["doc_id"], r["score"], r["rank"]) for r in rows)
    assert got == dist


def test_literal_prefix_soundness_property():
    """Hypothesis: EVERY fullmatch of a valid pattern starts with its
    extracted literal prefix — the property that makes the
    StringStartsWith pushdown safe (an unsound prefix silently DROPS
    matches; too-short prefixes only cost scan time)."""
    import re as _re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    atom = st.sampled_from(list("abc") + ["[ab]", "[^a]", "(a|b)", "."])
    quant = st.sampled_from(["", "*", "+", "?", "{1,2}"])
    piece = st.tuples(atom, quant).map(lambda t: t[0] + t[1])
    pattern = st.lists(piece, min_size=1, max_size=5).map("".join)
    words = st.text(alphabet="abc", min_size=0, max_size=6)

    @settings(max_examples=400, deadline=None)
    @given(pattern, words)
    def prop(pat, w):
        try:
            validate_regexp(pat)
        except ValueError:
            return
        prefix = regexp_literal_prefix(pat)
        if _re.fullmatch(pat, w):
            assert w.startswith(prefix), (pat, prefix, w)

    prop()
