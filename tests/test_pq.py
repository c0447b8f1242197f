"""Product-quantization gates (textops/pq.py): train determinism,
encode == python argmin brute, ADC tables == python dot brute,
rescore_m >= corpus degenerates to exact brute cosine, and the
dimension-split refusal."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from searchengine_spark.textops.pq import (
    _adc_tables,
    pq_encode,
    pq_topk,
    pq_train,
)
from searchengine_spark.textops.similarity import MICRO, cosine_topk

DIM, M, KSUB = 16, 4, 4
N = 120


@pytest.fixture(scope="module")
def emb(spark):
    # deterministic pseudo-random embeddings, mildly clustered
    import numpy as np

    rng = np.random.default_rng(20260823)
    centers = rng.standard_normal((3, DIM))
    rows = []
    for i in range(N):
        v = centers[i % 3] + 0.3 * rng.standard_normal(DIM)
        v = v / np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>").cache()


@pytest.fixture(scope="module")
def books(emb):
    return pq_train(emb, m=M, ksub=KSUB, dim=DIM)


def test_train_shape_and_determinism(emb, books):
    assert len(books) == M
    assert all(len(b) == KSUB for b in books)
    assert all(len(c) == DIM // M for b in books for c in b)
    again = pq_train(emb, m=M, ksub=KSUB, dim=DIM)
    assert again == books


def test_train_refuses_bad_split(emb):
    with pytest.raises(ValueError, match="subspaces"):
        pq_train(emb, m=5, ksub=4, dim=DIM)


def test_encode_matches_python_brute(emb, books):
    codes = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(emb, books).collect()
    }
    dsub = DIM // M
    vecs = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    for vid, v in vecs.items():
        mu = [math.floor(float(x) * MICRO) for x in v]
        want = []
        for j, book in enumerate(books):
            s = mu[j * dsub:(j + 1) * dsub]
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(s, cm)), c)
                for c, cm in enumerate(book)
            )
            want.append(best[1])
        assert codes[vid] == want, vid


def test_adc_tables_match_python_dot(emb, books):
    q = [r["embedding"] for r in emb.filter(F.col("vec_id") == 0).collect()][0]
    tables = _adc_tables(books, q)
    dsub = DIM // M
    qm = [math.floor(float(x) * MICRO) for x in q]
    for j, book in enumerate(books):
        qs = qm[j * dsub:(j + 1) * dsub]
        for c, cm in enumerate(book):
            assert tables[j][c] == sum(a * b for a, b in zip(qs, cm))


def test_rescore_all_degenerates_to_brute(emb, books):
    q = [r["embedding"] for r in emb.filter(F.col("vec_id") == 0).collect()][0]
    codes = pq_encode(emb, books)
    got = pq_topk(emb, codes, books, q, k=10, rescore_m=N + 10).collect()
    want = cosine_topk(emb, q, k=10).collect()
    g = [(r["vec_id"], r["cosine"]) for r in sorted(got, key=lambda r: r["rank"])]
    w = [(r["vec_id"], r["cosine"]) for r in want]
    assert g == w and g


def test_adc_recall_reasonable(emb, books):
    """Bounded-rescore PQ should recover most of the brute top-10 on the
    clustered fixture (recall, not rank, is the candidate tier's job)."""
    q = [r["embedding"] for r in emb.filter(F.col("vec_id") == 5).collect()][0]
    codes = pq_encode(emb, books)
    got = {r["vec_id"] for r in pq_topk(emb, codes, books, q, k=10,
                                        rescore_m=40).collect()}
    want = {r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()}
    assert len(got & want) >= 7, (sorted(got), sorted(want))


def test_rescore_m_validation(emb, books):
    codes = pq_encode(emb, books)
    with pytest.raises(ValueError, match="rescore_m"):
        pq_topk(emb, codes, books, [0.0] * DIM, k=10, rescore_m=5)
    with pytest.raises(ValueError, match="query dim"):
        _adc_tables(books, [0.0] * (DIM + 1))


def test_ivfpq_layout(spark, emb, tmp_path_factory):
    """The complete FAISS IVFPQ layout: degenerate settings reproduce
    brute cosine exactly; bounded probe serves k rows; a no-pq index
    refuses the ADC path."""
    from searchengine_spark.textops.pq import ivf_pq_topk
    from searchengine_spark.textops.similarity import build_ivf_index

    path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    man = build_ivf_index(emb, path, n_centroids=4, dim=DIM, pq=(M, KSUB))
    assert man["pq"] == [M, KSUB] and len(man["pq_codebooks_micro"]) == M
    q = [r["embedding"] for r in emb.filter(F.col("vec_id") == 0).collect()][0]
    got = ivf_pq_topk(spark, path, q, k=10, n_probe=4, rescore_m=N + 10)
    want = cosine_topk(emb, q, k=10).collect()
    g = [(r["vec_id"], r["cosine"])
         for r in sorted(got.collect(), key=lambda r: r["rank"])]
    w = [(r["vec_id"], r["cosine"]) for r in want]
    assert g == w and g
    bounded = ivf_pq_topk(spark, path, q, k=5, n_probe=2, rescore_m=20)
    assert bounded.count() == 5

    nopq = str(tmp_path_factory.mktemp("ivfplain") / "idx")
    build_ivf_index(emb, nopq, n_centroids=4, dim=DIM)
    with pytest.raises(ValueError, match="codes_pq"):
        ivf_pq_topk(spark, nopq, q, k=5)
