"""SQ8 embedding quantization gates (textops/quantize.py).

Contract: quantized values are floor(127·floor(v·1e6)/max|·|) — IEEE
double division of exactly representable integers, so the Spark column
and the driver-side twin agree bit-for-bit; candidate ranking is the
exact integer dot; rescore_m >= corpus degenerates to brute cosine
exactly.
"""

import numpy as np
import pytest

from searchengine_spark.textops.quantize import (
    sq8_quantize,
    sq8_quantize_vec,
    sq8_topk,
)
from searchengine_spark.textops.similarity import cosine_topk

ROWS = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(20260819)
    vecs = rng.standard_normal((80, 16)).astype("float32")
    return (
        spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(80)],
            "vec_id long, embedding array<float>",
        ),
        vecs,
    )


def test_quantize_values(spark):
    df = spark.createDataFrame(
        [(0, [1.0, -0.5, 0.25]), (1, [0.0, 0.0, 0.0]), (2, [-2.0, 1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r["q"] for r in sq8_quantize(df).collect()}
    # v0: m = [1e6, -5e5, 25e4], M = 1e6 -> [127, floor(-63.5), floor(31.75)]
    assert got[0] == [127, -64, 31]
    assert got[1] == [0, 0, 0]          # all-zero vector
    # v2: M = 2e6 -> [-127, 63, 0]; the max-|.| element hits the range edge
    assert got[2] == [-127, 63, 0]


def test_driver_twin_bit_identical(spark, emb):
    df, vecs = emb
    got = {r["vec_id"]: list(r["q"]) for r in sq8_quantize(df).collect()}
    for i in range(80):
        assert got[i] == sq8_quantize_vec(vecs[i]), f"vec {i}"


def test_full_rescore_equals_brute(spark, emb):
    df, vecs = emb
    q = sq8_quantize(df)
    approx = sq8_topk(df, q, list(vecs[7]), k=10, rescore_m=80)
    brute = cosine_topk(df, [float(x) for x in vecs[7]], k=10)
    assert ROWS(approx.select("vec_id", "cosine")) == ROWS(brute)
    ranks = [r["rank"] for r in approx.collect()]
    assert sorted(ranks) == list(range(1, 11))


def test_candidate_cut_recall(spark, emb):
    """Small rescore window still finds the exact self-match (int-dot
    candidates put the identical vector first)."""
    df, vecs = emb
    q = sq8_quantize(df)
    top = sq8_topk(df, q, list(vecs[33]), k=1, rescore_m=5).collect()
    assert top[0]["vec_id"] == 33 and top[0]["cosine"] == 1.0


def test_validation(spark, emb):
    df, vecs = emb
    q = sq8_quantize(df)
    with pytest.raises(ValueError, match="rescore_m"):
        sq8_topk(df, q, list(vecs[0]), k=10, rescore_m=5)
