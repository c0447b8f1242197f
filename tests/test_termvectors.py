"""Term-vectors gates (ES _termvectors analog, query/termvectors.py):
tf/positions come from the STORED token stream (brute = a Python
recount over docs_stage), df is the stored sidecar value (includes
tombstoned docs — the ES contract), positions match the packed
positional sidecar bit-for-bit, deleted docs emit nothing, and the
federated namespace reads identically to the merged index."""

from __future__ import annotations

import pytest

from searchengine_spark.fixtures.transcripts import transcripts_df
from searchengine_spark.indexing.packed import (
    build_packed_index,
    exploded_view,
    load_packed_index,
)
from searchengine_spark.query.termvectors import (
    term_vectors,
    term_vectors_federated,
)
from searchengine_spark.tokenizer import TokenizerConfig

DOC_IDS = [3, 17, 40, 3]  # dup on purpose: must collapse


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def packed(spark, cfg, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tvpacked") / "idx")
    corpus = transcripts_df(spark, n_conv=30, n_partitions=8)
    build_packed_index(corpus, cfg, path, chunk_docs=256, positional=True)
    return load_packed_index(spark, path)


def _brute(packed, ids):
    """{(doc, term): (tf, [positions])} + {term: df} from the stored
    streams — the ground truth both tiers must reproduce."""
    rows = packed.docs_stage().select("doc_id", "tokens").collect()
    per_doc: dict = {}
    df: dict = {}
    for r in rows:
        for p, t in enumerate(r["tokens"]):
            if r["doc_id"] in ids:
                tf, ps = per_doc.get((r["doc_id"], t), (0, []))
                per_doc[(r["doc_id"], t)] = (tf + 1, ps + [p])
        for t in set(r["tokens"]):
            df[t] = df.get(t, 0) + 1
    return per_doc, df


def test_term_vectors_brute(packed):
    per_doc, df = _brute(packed, set(DOC_IDS))
    got = term_vectors(packed, DOC_IDS, positions=True).collect()
    assert {(r["doc_id"], r["term"]) for r in got} == set(per_doc)
    for r in got:
        tf, ps = per_doc[(r["doc_id"], r["term"])]
        assert r["tf"] == tf
        assert list(r["positions"]) == ps
        assert r["df"] == df[r["term"]]
    # deterministic (doc_id, term) order; no-positions shape
    assert [(r["doc_id"], r["term"]) for r in got] == sorted(
        (r["doc_id"], r["term"]) for r in got)
    slim = term_vectors(packed, [DOC_IDS[0]]).columns
    assert slim == ["doc_id", "term", "tf", "df"]
    with pytest.raises(ValueError, match="at least one"):
        term_vectors(packed, [])


def test_positions_match_positional_sidecar(packed):
    """posexplode over the stored tokens == the packed positional
    sidecar's decoded occurrence positions, term by term."""
    got = {(r["doc_id"], r["term"]): list(r["positions"])
           for r in term_vectors(packed, DOC_IDS, positions=True).collect()}
    ids = set(DOC_IDS)
    ev = exploded_view(packed, include_positions=True).collect()
    packed_pos = {
        (r["doc_id"], r["term"]): [int(x) for x in r["positions"].split(",")]
        for r in ev if r["doc_id"] in ids
    }
    assert got == packed_pos and got


def test_deleted_doc_emits_nothing(spark, cfg, tmp_path):
    from searchengine_spark.indexing.deletes import delete_docs

    path = str(tmp_path / "idx")
    corpus = transcripts_df(spark, n_conv=8, n_partitions=4)
    build_packed_index(corpus, cfg, path, chunk_docs=64)
    delete_docs(spark, path, doc_ids=[2])
    pidx = load_packed_index(spark, path)
    live = term_vectors(pidx, [1, 2]).collect()
    assert live and all(r["doc_id"] == 1 for r in live)
    # df still the STORED value (includes the tombstoned doc — the ES
    # "df does not take deleted documents into account" contract)
    stats = {r["term"]: r["df"] for r in pidx.term_stats.collect()}
    assert all(r["df"] == stats[r["term"]] for r in live)
    assert term_vectors(pidx, [2]).count() == 0


def test_federated_matches_merged(spark, cfg, tmp_path):
    """Federation-namespace vectors == the same docs' vectors through
    ONE index built over the concatenated corpora (global df)."""
    from pyspark.sql import functions as F

    corpus = transcripts_df(spark, n_conv=24, n_partitions=8)
    parts = [corpus.filter(F.col("turn_idx") % 2 == 0),
             corpus.filter(F.col("turn_idx") % 2 == 1)]
    shards = []
    for i, part in enumerate(parts):
        p = str(tmp_path / f"s{i}")
        build_packed_index(part, cfg, p, chunk_docs=128)
        shards.append(load_packed_index(spark, p))
    from searchengine_spark.query.federated import _doc_bases

    base1 = _doc_bases(shards)[1]  # chunk-ALIGNED, not n_docs
    fed_ids = [5, base1 + 7, 11]
    got = sorted(
        (r["doc_id"], r["term"], r["tf"], r["df"])
        for r in term_vectors_federated(shards, fed_ids,
                                        positions=False).collect()
    )
    # ground truth: per-shard stored streams + summed df
    pd0, df0 = _brute(shards[0], {5, 11})
    pd1, df1 = _brute(shards[1], {7})
    alldf = {t: df0.get(t, 0) + df1.get(t, 0)
             for t in set(df0) | set(df1)}
    expect = sorted(
        [(d, t, tf, alldf[t]) for (d, t), (tf, _) in pd0.items()]
        + [(d + base1, t, tf, alldf[t]) for (d, t), (tf, _) in pd1.items()]
    )
    assert got == expect and got
