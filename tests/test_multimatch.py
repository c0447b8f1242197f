"""Multi-field search gates (query/multimatch.py — the ES ``multi_match``
query over per-field packed indexes).

Contract: per-field indexes built together share the docID namespace BY
CONSTRUCTION (every row gets an id, NULL/zero-token fields included);
best_fields = dis_max over per-field BM25 (per-field statistics — df,
idf, avgdl are per field, the Lucene model); most_fields = the sum;
boosts scale a field's scores before the combine; a single-field
multi_match degenerates to plain BM25 bit-for-bit; the brute cross-path
oracle (EXACT per-field indexes + Python combine) matches the packed
score-all composition.
"""

import pytest

from searchengine_spark.fixtures import transcripts_df
from searchengine_spark.indexing import build_index
from searchengine_spark.query.multimatch import (
    build_field_indexes,
    load_field_indexes,
    multi_match_topk,
)
from searchengine_spark.query.wand import bm25_topk_packed_batch
from searchengine_spark.tokenizer import TokenizerConfig

ROWS = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731

FIELDS = ("text", "role", "tool")
QUERIES = ["guitar solo", "assistant tool2 drum", "tool0"]


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def corpus(spark):
    return transcripts_df(spark, n_conv=8)


@pytest.fixture(scope="module")
def fidx(spark, cfg, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mm") / "root")
    build_field_indexes(corpus, cfg, root, FIELDS, chunk_docs=64)
    return load_field_indexes(spark, root)


def test_docids_align_across_fields(fidx, corpus):
    """Every field index assigns the SAME dense docID to the same
    (conv_id, turn_idx) row — the property the whole combine rests on."""
    maps = {
        f: ROWS(p.docmap.select("doc_id", "conv_id", "turn_idx"))
        for f, p in fidx.items()
    }
    assert maps["text"] == maps["role"] == maps["tool"]
    assert len(maps["text"]) == corpus.count()  # NULL-tool rows kept


def test_single_field_degenerates_to_bm25(fidx, cfg):
    """multi_match over {text} == plain packed BM25, bit for bit (both
    modes; the combine must add nothing when there is nothing to
    combine)."""
    plain = ROWS(bm25_topk_packed_batch(fidx["text"], QUERIES, cfg, k=10,
                                        round_dp=6))
    for mode in ("best_fields", "most_fields"):
        got = ROWS(multi_match_topk({"text": fidx["text"]}, QUERIES, cfg,
                                    k=10, mode=mode, round_dp=6))
        assert got == plain


def _brute_field_scores(spark, corpus, cfg, field, query):
    """Cross-path oracle: EXACT (non-packed) per-field index + the
    exhaustive join-agg scorer -> {doc_id: score}."""
    from pyspark.sql import functions as F

    from searchengine_spark.query.bm25 import bm25_topk

    fcorp = corpus.select(
        "conv_id", "turn_idx",
        F.coalesce(F.col(field).cast("string"), F.lit("")).alias(field))
    it = build_index(fcorp, cfg, text_col=field, n_partitions=4)
    rows = bm25_topk(it, query, cfg, k=1 << 20).collect()
    return {int(r["doc_id"]): float(r["score"]) for r in rows}


@pytest.mark.parametrize("mode,tie", [("best_fields", 0.0),
                                      ("best_fields", 0.3),
                                      ("most_fields", 0.0)])
def test_combine_matches_brute_cross_path(spark, corpus, cfg, fidx,
                                          mode, tie):
    """Packed score-all composition == EXACT per-field indexes combined
    in Python (max + tie*rest / sum), rounded ranking and all."""
    q = QUERIES[1]
    per_field = {f: _brute_field_scores(spark, corpus, cfg, f, q)
                 for f in FIELDS}
    docs = set().union(*[set(d) for d in per_field.values()])
    expect = {}
    for d in docs:
        ss = [per_field[f][d] for f in FIELDS if d in per_field[f]]
        if mode == "best_fields":
            expect[d] = max(ss) + tie * (sum(ss) - max(ss))
        else:
            expect[d] = sum(ss)
    want = sorted(
        ((round(s, 6), d) for d, s in expect.items()),
        key=lambda sd: (-sd[0], sd[1]))[:10]
    got = multi_match_topk(fidx, [q], cfg, k=10, mode=mode,
                           tie_breaker=tie, round_dp=6).collect()
    got = [(float(r["score"]), int(r["doc_id"]))
           for r in sorted(got, key=lambda r: r["rank"])]
    assert got == [(s, d) for s, d in want]


def test_boosts_scale_before_combine(fidx, cfg):
    plain = {(r["query_id"], r["doc_id"]): r["score"]
             for r in multi_match_topk({"role": fidx["role"]}, QUERIES,
                                       cfg, k=10, round_dp=6).collect()}
    boosted = {(r["query_id"], r["doc_id"]): r["score"]
               for r in multi_match_topk({"role": fidx["role"]}, QUERIES,
                                         cfg, k=10, boosts={"role": 2.0},
                                         round_dp=6).collect()}
    assert boosted.keys() == plain.keys()
    for key, s in plain.items():
        assert boosted[key] == pytest.approx(2 * s, abs=2e-6)


def test_multimatch_validation(fidx, cfg, spark, corpus, cfg_path=None):
    with pytest.raises(ValueError, match="mode"):
        multi_match_topk(fidx, QUERIES, cfg, mode="cross_fields")
    with pytest.raises(ValueError, match="tie_breaker applies"):
        multi_match_topk(fidx, QUERIES, cfg, mode="most_fields",
                         tie_breaker=0.3)
    with pytest.raises(ValueError, match="unknown fields"):
        multi_match_topk(fidx, QUERIES, cfg, boosts={"nope": 2.0})
    with pytest.raises(ValueError, match="non-negative"):
        multi_match_topk(fidx, QUERIES, cfg, boosts={"role": -1.0})
    with pytest.raises(ValueError, match="no field indexes"):
        multi_match_topk({}, QUERIES, cfg)


def test_misaligned_indexes_refused(spark, cfg, fidx, tmp_path):
    """An index over a DIFFERENT corpus must not silently combine."""
    from searchengine_spark.indexing.packed import (
        build_packed_index,
        load_packed_index,
    )

    other = transcripts_df(spark, n_conv=3)
    path = str(tmp_path / "other")
    build_packed_index(other, cfg, path, chunk_docs=64)
    alien = load_packed_index(spark, path)
    with pytest.raises(ValueError, match="disagree"):
        multi_match_topk({"text": fidx["text"], "alien": alien},
                         QUERIES, cfg)


def test_build_validation(spark, cfg, corpus, tmp_path):
    with pytest.raises(ValueError, match="lacks field columns"):
        build_field_indexes(corpus, cfg, str(tmp_path / "x"),
                            ["text", "nope"])
    with pytest.raises(ValueError, match="at least one"):
        build_field_indexes(corpus, cfg, str(tmp_path / "y"), [])


# ------------------------------------------------------------ cross_fields


def _brute_cross_fields(spark, corpus, cfg, query, tie, boosts=None):
    """Term-centric brute: exact per-field indexes collected, blended
    idf = round3(ln(N / max-field-df)), per-term dismax over fields,
    per-doc sum — pure Python."""
    import math

    from pyspark.sql import functions as F

    from searchengine_spark.query.serve import _round3_up
    from searchengine_spark.tokenizer import tokenize_text

    terms = list(dict.fromkeys(tokenize_text(query, cfg)))
    n = corpus.count()
    k1, b = 1.2, 0.75
    tf_map, dln_map, df_map = {}, {}, {}
    for f in FIELDS:
        fcorp = corpus.select(
            "conv_id", "turn_idx",
            F.coalesce(F.col(f).cast("string"), F.lit("")).alias(f))
        it = build_index(fcorp, cfg, text_col=f, n_partitions=4)
        for r in it.index.filter(F.col("term").isin(terms)).collect():
            tf_map[(f, r["term"], int(r["doc_id"]))] = int(r["tf"])
            df_map[r["term"]] = max(df_map.get(r["term"], 0), 0)
        for r in it.term_stats.filter(F.col("term").isin(terms)).collect():
            df_map[r["term"]] = max(df_map.get(r["term"], 0), int(r["df"]))
        for r in it.doc_lengths.collect():
            dln_map[(f, int(r["doc_id"]))] = float(r["dl_norm"])
    bidf = {t: _round3_up(math.log(n / d)) for t, d in df_map.items() if d}
    per_doc: dict = {}
    for t in terms:
        if t not in bidf:
            continue
        cs: dict = {}
        for f in FIELDS:
            boost = float((boosts or {}).get(f, 1.0))
            for (ff, tt, d), tf in tf_map.items():
                if ff != f or tt != t:
                    continue
                dn = dln_map[(f, d)]
                c = bidf[t] * (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * dn)) * boost
                cs.setdefault(d, []).append(c)
        for d, ss in cs.items():
            per_doc[d] = per_doc.get(d, 0.0) + (
                max(ss) + tie * (sum(ss) - max(ss)))
    return per_doc


@pytest.mark.parametrize("tie,boosts", [(0.0, None), (0.3, {"tool": 2.0})])
def test_cross_fields_matches_brute(spark, corpus, cfg, fidx, tie, boosts):
    from searchengine_spark.query.multimatch import cross_fields_topk

    q = QUERIES[1]
    expect = _brute_cross_fields(spark, corpus, cfg, q, tie, boosts)
    want = sorted(
        ((round(s, 6), d) for d, s in expect.items()),
        key=lambda sd: (-sd[0], sd[1]))[:10]
    got = cross_fields_topk(fidx, [q], cfg, k=10, tie_breaker=tie,
                            boosts=boosts, round_dp=6).collect()
    got = [(float(r["score"]), int(r["doc_id"]))
           for r in sorted(got, key=lambda r: r["rank"])]
    assert got == [(s, d) for s, d in want] and got


def test_cross_fields_single_field_is_bm25(fidx, cfg):
    """One field: blended df == the field's df, per-term dismax is the
    identity, the term sum is the OR ranker — bit-for-bit plain BM25."""
    from searchengine_spark.query.multimatch import cross_fields_topk

    plain = ROWS(bm25_topk_packed_batch(fidx["text"], QUERIES, cfg, k=10,
                                        round_dp=6))
    got = ROWS(cross_fields_topk({"text": fidx["text"]}, QUERIES, cfg,
                                 k=10, round_dp=6))
    assert got == plain and got


def test_cross_fields_validation(fidx, cfg):
    from searchengine_spark.query.multimatch import cross_fields_topk

    with pytest.raises(ValueError, match="tie_breaker"):
        cross_fields_topk(fidx, QUERIES, cfg, tie_breaker=1.5)
    with pytest.raises(ValueError, match="unknown fields"):
        cross_fields_topk(fidx, QUERIES, cfg, boosts={"nope": 2.0})
    assert cross_fields_topk(fidx, ["zzzznothing"], cfg).count() == 0


# -------------------------------------------------------- combined_fields


@pytest.fixture(scope="module")
def field_its(spark, corpus, cfg):
    from pyspark.sql import functions as F

    its = {}
    for f in FIELDS:
        fcorp = corpus.select(
            "conv_id", "turn_idx",
            F.coalesce(F.col(f).cast("string"), F.lit("")).alias(f))
        its[f] = build_index(fcorp, cfg, text_col=f, n_partitions=4)
    return its


def test_combined_fields_matches_brute(spark, cfg, field_its):
    import math

    from searchengine_spark.query.multimatch import combined_fields_topk
    from searchengine_spark.query.serve import _round3_up
    from searchengine_spark.tokenizer import tokenize_text

    weights = {"text": 1.0, "role": 2.0, "tool": 1.0}
    q = QUERIES[1]
    terms = list(dict.fromkeys(tokenize_text(q, cfg)))
    tf, dl, dfm = {}, {}, {}
    for f, it in field_its.items():
        for r in it.index.collect():
            if r["term"] in terms:
                tf[(r["term"], int(r["doc_id"]))] = tf.get(
                    (r["term"], int(r["doc_id"])), 0.0
                ) + weights[f] * int(r["tf"])
        for r in it.doc_lengths.collect():
            dl[int(r["doc_id"])] = dl.get(int(r["doc_id"]), 0.0) \
                + weights[f] * int(r["dl"])
        for r in it.term_stats.collect():
            if r["term"] in terms:
                dfm[r["term"]] = max(dfm.get(r["term"], 0), int(r["df"]))
    n = len(dl)
    avgdl = sum(dl.values()) / n
    idf = {t: _round3_up(math.log(n / d)) for t, d in dfm.items()}
    k1, b = 1.2, 0.75
    expect: dict = {}
    for (t, d), tfc in tf.items():
        if tfc <= 0:
            continue
        dn = _round3_up(dl[d] / avgdl)
        c = idf[t] * (tfc * (k1 + 1.0)) / (tfc + k1 * (1.0 - b + b * dn))
        expect[d] = expect.get(d, 0.0) + c
    want = sorted(((round(s, 6), d) for d, s in expect.items()),
                  key=lambda sd: (-sd[0], sd[1]))[:10]
    got = combined_fields_topk(field_its, [q], cfg, k=10, weights=weights,
                               round_dp=6).collect()
    got = [(float(r["score"]), int(r["doc_id"]))
           for r in sorted(got, key=lambda r: r["rank"])]
    assert got == [(s, d) for s, d in want] and got


def test_combined_fields_single_field_is_bm25(spark, cfg, field_its):
    from searchengine_spark.query.bm25 import bm25_topk_batch
    from searchengine_spark.query.multimatch import combined_fields_topk

    it = field_its["text"]
    want = {
        (r["query_id"], r["doc_id"]): (round(r["score"], 6), r["rank"])
        for r in bm25_topk_batch(it, QUERIES, cfg, k=10).collect()
    }
    got = {
        (r["query_id"], r["doc_id"]): (round(r["score"], 6), r["rank"])
        for r in combined_fields_topk(
            {"text": it}, QUERIES, cfg, k=10, round_dp=None).collect()
    }
    assert got == want and got


def test_combined_fields_validation(cfg, field_its):
    from searchengine_spark.query.multimatch import combined_fields_topk

    with pytest.raises(ValueError, match="unknown fields"):
        combined_fields_topk(field_its, QUERIES, cfg, weights={"nope": 1.0})
    with pytest.raises(ValueError, match="non-negative"):
        combined_fields_topk(field_its, QUERIES, cfg, weights={"text": -1.0})
    assert combined_fields_topk(field_its, ["zzzznothing"], cfg).count() == 0


@pytest.mark.parametrize("mode,tie,boosts", [
    ("best_fields", 0.0, None),
    ("best_fields", 0.4, {"role": 2.0}),
    ("best_fields", 1.0, None),
    ("most_fields", 0.0, {"text": 0.5, "tool": 3.0}),
])
def test_multi_match_prune_matches_score_all(fidx, cfg, mode, tie, boosts):
    """The block-max tier (prune=True, default) is bit-identical to the
    score-all composition for both combines, with and without boosts
    (boosts fold into idf BEFORE the chunk bounds)."""
    a = multi_match_topk(fidx, QUERIES, cfg, k=12, mode=mode,
                         tie_breaker=tie, boosts=boosts, round_dp=6,
                         prune=True)
    b = multi_match_topk(fidx, QUERIES, cfg, k=12, mode=mode,
                         tie_breaker=tie, boosts=boosts, round_dp=6,
                         prune=False)
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb and ra


def test_multi_match_prune_field_only_terms(fidx, cfg):
    """Terms living in only ONE field's dictionary route correctly on
    the pruned tier (the per-field statistics contract)."""
    qs = ["nosuchword zzz", QUERIES[0]]
    a = multi_match_topk(fidx, qs, cfg, k=8, mode="best_fields",
                         tie_breaker=0.2, round_dp=6, prune=True)
    b = multi_match_topk(fidx, qs, cfg, k=8, mode="best_fields",
                         tie_breaker=0.2, round_dp=6, prune=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


@pytest.mark.parametrize("tie,boosts", [
    (0.0, None), (0.2, {"role": 2.0}), (1.0, {"text": 0.5}),
])
def test_cross_fields_prune_matches_score_all(fidx, cfg, tie, boosts):
    """Block-max cross_fields (prune=True, default) is bit-identical to
    the score-all composition — the Σ-of-per-term-dismax bound."""
    from searchengine_spark.query.multimatch import cross_fields_topk

    a = cross_fields_topk(fidx, QUERIES, cfg, k=12, tie_breaker=tie,
                          boosts=boosts, round_dp=6, prune=True)
    b = cross_fields_topk(fidx, QUERIES, cfg, k=12, tie_breaker=tie,
                          boosts=boosts, round_dp=6, prune=False)
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb and ra
