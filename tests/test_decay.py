"""Decay-function scoring gates (query/decay.py — the ES
``function_score`` gauss/exp/linear decay family).

Contract: d = max(0, |value-origin|-offset); a doc exactly ``scale``
past the offset scores ``decay`` under EVERY function; inside offset
the function is 1; linear zeroes past scale/(1-decay); missing values
decay to 1.0 (the ES missing-field contract); boost_mode multiply/sum/
replace; the matched set is score-all (rescaling can promote a doc a
relevance top-k cut would have dropped). Brute oracle: same formulas in
pure Python over the EXACT index's matched set.
"""

import math

import pytest
from pyspark.sql import functions as F

from searchengine_spark.fixtures import transcripts_df
from searchengine_spark.indexing import build_index
from searchengine_spark.indexing.packed import build_packed_index, load_packed_index
from searchengine_spark.query.decay import decay_score_packed
from searchengine_spark.tokenizer import TokenizerConfig

QUERY = "guitar solo drum"
ORIGIN, SCALE, DECAY, OFFSET = 20.0, 15.0, 0.5, 2.0


@pytest.fixture(scope="module")
def cfg(stop_words):
    return TokenizerConfig(min_token_length=3, stop_words=stop_words)


@pytest.fixture(scope="module")
def corpus(spark):
    return transcripts_df(spark, n_conv=6)


@pytest.fixture(scope="module")
def pidx(spark, cfg, corpus, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dec") / "idx")
    build_packed_index(corpus, cfg, path, chunk_docs=64)
    return load_packed_index(spark, path)


@pytest.fixture(scope="module")
def attrs(spark, corpus):
    """age = turn_idx (spread around the origin), NULL every 9th turn."""
    return corpus.select(
        "conv_id", "turn_idx",
        F.when(F.col("turn_idx") % 9 == 0, None)
        .otherwise(F.col("turn_idx").cast("double")).alias("age"))


def _py_decay(fn, v):
    if v is None:
        return 1.0
    d = max(0.0, abs(v - ORIGIN) - OFFSET)
    if fn == "gauss":
        sigma2 = -(SCALE * SCALE) / (2.0 * math.log(DECAY))
        return math.exp(-(d * d) / (2.0 * sigma2))
    if fn == "exp":
        return math.exp(math.log(DECAY) / SCALE * d)
    s = SCALE / (1.0 - DECAY)
    return max(0.0, (s - d) / s)


def _brute(spark, corpus, cfg, attrs, fn, boost_mode):
    from searchengine_spark.query.bm25 import bm25_topk

    it = build_index(corpus, cfg, n_partitions=4)
    rows = bm25_topk(it, QUERY, cfg, k=1 << 20).collect()
    amap = {(r["conv_id"], r["turn_idx"]): r["age"] for r in attrs.collect()}
    dm = {int(r["doc_id"]): (r["conv_id"], int(r["turn_idx"]))
          for r in it.docmap.collect()}
    out = []
    for r in rows:
        v = amap.get(dm[int(r["doc_id"])])
        dec = _py_decay(fn, v)
        s = float(r["score"])
        comb = (s * dec if boost_mode == "multiply"
                else s + dec if boost_mode == "sum" else dec)
        out.append((comb, int(r["doc_id"])))
    out.sort(key=lambda t: (-t[0], t[1]))
    return out


@pytest.mark.parametrize("fn", ["gauss", "exp", "linear"])
@pytest.mark.parametrize("boost_mode", ["multiply", "sum", "replace"])
def test_decay_matches_brute(spark, corpus, cfg, pidx, attrs, fn,
                             boost_mode):
    got = decay_score_packed(
        pidx, [QUERY], cfg, attrs, "age", ORIGIN, SCALE, decay=DECAY,
        offset=OFFSET, fn=fn, boost_mode=boost_mode, k=20).collect()
    got = [(float(r["score"]), int(r["doc_id"]))
           for r in sorted(got, key=lambda r: r["rank"])]
    want = _brute(spark, corpus, cfg, attrs, fn, boost_mode)[:20]
    assert [d for _, d in got] == [d for _, d in want]
    for (gs, _), (ws, _) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12)
    assert len(got) == 20


def test_decay_contract_points(spark, pidx, cfg, attrs):
    """The three anchor values of the ES contract: value at origin -> 1,
    at origin+offset -> 1, at origin+offset+scale -> exactly decay."""
    rows = decay_score_packed(
        pidx, [QUERY], cfg, attrs, "age", ORIGIN, SCALE, decay=DECAY,
        offset=OFFSET, fn="linear", boost_mode="replace",
        k=1 << 20).collect()
    by_val = {r["value"]: float(r["score"]) for r in rows
              if r["value"] is not None}
    anchor = ORIGIN + OFFSET + SCALE  # 37.0 — turn_idx 37 exists
    if anchor in by_val:
        assert by_val[anchor] == pytest.approx(DECAY, abs=1e-12)
    assert by_val[ORIGIN] == pytest.approx(1.0)
    # missing values decay to 1.0 (replace mode -> score exactly 1)
    nulls = [float(r["score"]) for r in rows if r["value"] is None]
    assert nulls and all(s == pytest.approx(1.0) for s in nulls)
    # linear hits EXACT zero past scale/(1-decay)
    far = [s for v, s in by_val.items()
           if abs(v - ORIGIN) - OFFSET > SCALE / (1 - DECAY)]
    assert far and all(s == 0.0 for s in far)


def test_decay_validation(pidx, cfg, attrs):
    with pytest.raises(ValueError, match="fn must be"):
        decay_score_packed(pidx, [QUERY], cfg, attrs, "age", 0, 1,
                           fn="cosine")
    with pytest.raises(ValueError, match="decay must be"):
        decay_score_packed(pidx, [QUERY], cfg, attrs, "age", 0, 1,
                           decay=1.0)
    with pytest.raises(ValueError, match="scale must be"):
        decay_score_packed(pidx, [QUERY], cfg, attrs, "age", 0, 0)
    with pytest.raises(ValueError, match="offset must be"):
        decay_score_packed(pidx, [QUERY], cfg, attrs, "age", 0, 1,
                           offset=-1)
    with pytest.raises(ValueError, match="boost_mode"):
        decay_score_packed(pidx, [QUERY], cfg, attrs, "age", 0, 1,
                           boost_mode="max")
    with pytest.raises(ValueError, match="lacks columns"):
        decay_score_packed(pidx, [QUERY], cfg, attrs, "nope", 0, 1)


def _py_fvf(mod, v, factor=1.0):
    if v is None:
        return None
    x = v * factor
    try:
        if mod == "none":
            return x
        if mod == "log":
            return math.log10(x)
        if mod == "log1p":
            return math.log10(x + 1.0)
        if mod == "ln1p":
            return math.log(x + 1.0)
        if mod == "square":
            return x * x
        if mod == "sqrt":
            return math.sqrt(x)
        if mod == "reciprocal":
            return 1.0 / x if x != 0 else None
        if mod == "saturation":  # rank_feature: pivot rides the factor slot
            return v / (v + factor) if v + factor != 0 else None
        if mod == "sigmoid2":
            return (v * v / (v * v + factor * factor)
                    if v * v + factor * factor != 0 else None)
    except ValueError:
        return None
    raise AssertionError(mod)


@pytest.mark.parametrize("mod", ["none", "sqrt", "square", "ln1p",
                                 "reciprocal", "saturation", "sigmoid2"])
def test_fvf_matches_brute(spark, corpus, cfg, pidx, attrs, mod):
    from searchengine_spark.indexing import build_index
    from searchengine_spark.query.bm25 import bm25_topk
    from searchengine_spark.query.decay import field_value_factor_packed

    it = build_index(corpus, cfg, n_partitions=4)
    rows = bm25_topk(it, QUERY, cfg, k=1 << 20).collect()
    amap = {(r["conv_id"], r["turn_idx"]): r["age"] for r in attrs.collect()}
    dm = {int(r["doc_id"]): (r["conv_id"], int(r["turn_idx"]))
          for r in it.docmap.collect()}
    want = []
    for r in rows:
        v = amap.get(dm[int(r["doc_id"])])
        fvf = _py_fvf(mod, v, 2.0)
        fvf = 1.0 if fvf is None else fvf  # missing fallback
        want.append((float(r["score"]) * fvf, int(r["doc_id"])))
    want.sort(key=lambda t: (-t[0], t[1]))
    got = field_value_factor_packed(
        pidx, [QUERY], cfg, attrs, "age", factor=2.0, modifier=mod,
        missing=1.0, k=20).collect()
    got = [(float(r["score"]), int(r["doc_id"]))
           for r in sorted(got, key=lambda r: r["rank"])]
    assert [d for _, d in got] == [d for _, d in want[:20]]
    for (gs, _), (ws, _) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12)


def test_fvf_missing_and_undefined(spark, pidx, cfg, attrs):
    """NULL values AND undefined modifier results (reciprocal of 0 —
    age 0 exists at turn_idx 0 unless it's a NULL turn) fall back to
    ``missing``; replace mode exposes the raw function value."""
    from searchengine_spark.query.decay import field_value_factor_packed

    rows = field_value_factor_packed(
        pidx, [QUERY], cfg, attrs, "age", modifier="reciprocal",
        missing=-7.0, boost_mode="replace", k=1 << 20).collect()
    by_val = {r["value"]: float(r["score"]) for r in rows}
    nulls = [float(r["score"]) for r in rows if r["value"] is None]
    assert nulls and all(s == pytest.approx(-7.0) for s in nulls)
    if 0.0 in by_val:  # reciprocal of zero is undefined -> missing
        assert by_val[0.0] == pytest.approx(-7.0)
    if 4.0 in by_val:
        assert by_val[4.0] == pytest.approx(0.25)
    with pytest.raises(ValueError, match="modifier"):
        field_value_factor_packed(pidx, [QUERY], cfg, attrs, "age",
                                  modifier="cube")


def test_random_score_deterministic_and_seeded(spark, pidx, cfg):
    """random_score: md5(seed|ext_id)/2^48 — identical across runs,
    different across seeds, matches hashlib exactly, and the matched
    SET is seed-independent (the query picks, the seed orders)."""
    import hashlib

    from searchengine_spark.query.decay import random_score_packed

    a1 = random_score_packed(pidx, [QUERY], cfg, seed="s1",
                             k=1 << 20).collect()
    a2 = random_score_packed(pidx, [QUERY], cfg, seed="s1",
                             k=1 << 20).collect()
    b = random_score_packed(pidx, [QUERY], cfg, seed="s2",
                            k=1 << 20).collect()
    key = lambda r: (r["rank"], r["doc_id"])  # noqa: E731
    assert sorted(map(dict, map(lambda r: r.asDict(), a1)), key=lambda d: d["rank"]) \
        == sorted(map(dict, map(lambda r: r.asDict(), a2)), key=lambda d: d["rank"])
    assert {r["doc_id"] for r in a1} == {r["doc_id"] for r in b}
    assert [r["doc_id"] for r in sorted(a1, key=key)] != \
        [r["doc_id"] for r in sorted(b, key=key)]
    for r in a1[:20]:
        k_ = f"s1|{r['conv_id']}|{r['turn_idx']}"
        want = int(hashlib.md5(k_.encode()).hexdigest()[:12], 16) / float(1 << 48)
        assert float(r["score"]) == pytest.approx(want, rel=1e-12)
        assert 0.0 <= float(r["score"]) < 1.0
    with pytest.raises(ValueError, match="boost_mode"):
        random_score_packed(pidx, [QUERY], cfg, boost_mode="max")
