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


@pytest.fixture(scope="module")
def clustered(spark):
    """Clustered embeddings (IVF-friendly): 4 well-separated centers."""
    rng = np.random.default_rng(99)
    centers = rng.standard_normal((4, 16)) * 6
    vecs = np.concatenate(
        [centers[i % 4] + rng.standard_normal(16) * 0.4 for i in range(160)]
    ).reshape(160, 16).astype("float32")
    return (
        spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(160)],
            "vec_id long, embedding array<float>",
        ),
        vecs,
    )


@pytest.fixture(scope="module")
def ivf_sq8_path(spark, clustered, tmp_path_factory):
    from searchengine_spark.textops.similarity import build_ivf_index

    df, _ = clustered
    path = str(tmp_path_factory.mktemp("ivfsq8") / "ivf")
    build_ivf_index(df, path, n_centroids=4, dim=16, n_iters=2, sq8=True)
    return path


def test_ivf_sq8_full_probe_full_rescore_is_brute(spark, clustered,
                                                  ivf_sq8_path):
    from searchengine_spark.textops.quantize import ivf_sq8_topk

    df, vecs = clustered
    got = ivf_sq8_topk(spark, ivf_sq8_path, list(vecs[5]), k=10,
                       n_probe=4, rescore_m=160)
    brute = cosine_topk(df, [float(x) for x in vecs[5]], k=10)
    assert ROWS(got.select("vec_id", "cosine")) == ROWS(brute)


def test_ivf_sq8_recall_and_pruning(spark, clustered, ivf_sq8_path):
    """n_probe=1 on clustered data still finds the self-match; the probed
    scan partition-prunes on centroid_id."""
    from pyspark.sql import functions as F

    from searchengine_spark.textops.quantize import ivf_sq8_topk

    df, vecs = clustered
    top = ivf_sq8_topk(spark, ivf_sq8_path, list(vecs[42]), k=1,
                       n_probe=1, rescore_m=10).collect()
    assert top[0]["vec_id"] == 42 and top[0]["cosine"] == 1.0
    probed = spark.read.parquet(ivf_sq8_path + "/buckets").filter(
        F.col("centroid_id").isin([0]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan


def test_ivf_sq8_requires_sq8_layout(spark, clustered, tmp_path):
    from searchengine_spark.textops.quantize import ivf_sq8_topk
    from searchengine_spark.textops.similarity import build_ivf_index

    df, vecs = clustered
    path = str(tmp_path / "plain")
    build_ivf_index(df, path, n_centroids=4, dim=16, n_iters=1, sq8=False)
    with pytest.raises(ValueError, match="q_sq8"):
        ivf_sq8_topk(spark, path, list(vecs[0]), k=5)
