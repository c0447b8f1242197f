"""Filtered kNN gates (ES knn `filter` semantics — PRE-filtering): the
brute filtered top-k equals a Python recompute over the allowed set and
returns k PASSING vectors (never top-k-then-filter, which under-fills);
the IVF path applies the filter inside the probed cells and is exact at
n_probe = n_centroids."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from searchengine_spark.textops import (
    build_ivf_index,
    cosine_topk,
    ivf_topk_indexed,
)

DIM = 16
N_CLUSTERS = 8


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((N_CLUSTERS, DIM)) * 6.0
    rows = []
    vid = 0
    for c in centers:
        for _ in range(30):
            v = c + rng.standard_normal(DIM) * 0.5
            rows.append((vid, [float(x) for x in v], vid % 3))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")


@pytest.fixture(scope="module")
def ivf_path(clustered, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fann") / "idx")
    build_ivf_index(clustered.drop("label"), path,
                    n_centroids=N_CLUSTERS, dim=DIM, n_iters=3)
    return path


def _qv(clustered, qid):
    return [float(x) for x in
            clustered.filter(F.col("vec_id") == qid).first()["embedding"]]


def _brute(clustered, qv, allowed_ids, k):
    rows = clustered.select("vec_id", "embedding").collect()
    q = np.asarray(qv)
    scored = []
    for r in rows:
        if r["vec_id"] not in allowed_ids:
            continue
        v = np.asarray([float(x) for x in r["embedding"]])
        c = round(float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q))), 6)
        scored.append((-c, r["vec_id"]))
    scored.sort()
    return [(vid, -nc) for nc, vid in scored[:k]]


def test_filtered_brute_matches_python(spark, clustered):
    qv = _qv(clustered, 0)
    allowed = clustered.filter("label = 1").select("vec_id")
    allowed_ids = {r["vec_id"] for r in allowed.collect()}
    got = [(r["vec_id"], r["cosine"]) for r in
           cosine_topk(clustered, qv, k=10, allowed=allowed).collect()]
    assert got == _brute(clustered, qv, allowed_ids, 10)
    assert len(got) == 10 and all(v in allowed_ids for v, _ in got)


def test_prefilter_is_not_postfilter(spark, clustered):
    """The ES contract point: filtering the UNFILTERED top-k under-fills;
    pre-filtered search returns a full page of passing vectors."""
    qv = _qv(clustered, 0)
    allowed = clustered.filter("label = 2").select("vec_id")
    allowed_ids = {r["vec_id"] for r in allowed.collect()}
    pre = [r["vec_id"] for r in
           cosine_topk(clustered, qv, k=10, allowed=allowed).collect()]
    unfiltered = [r["vec_id"] for r in
                  cosine_topk(clustered, qv, k=10).collect()]
    post = [v for v in unfiltered if v in allowed_ids]
    assert len(pre) == 10
    assert len(post) < 10          # post-filtering under-fills the page
    assert set(post) <= set(pre)   # and is a strict subset of the page


def test_ivf_filtered_exact_at_full_probes(spark, clustered, ivf_path):
    qv = _qv(clustered, 5)
    allowed = clustered.filter("label = 0").select("vec_id")
    want = [(r["vec_id"], r["cosine"]) for r in
            cosine_topk(clustered, qv, k=10, allowed=allowed,
                        exclude_ids=(5,)).collect()]
    got = [(r["vec_id"], r["cosine"]) for r in
           ivf_topk_indexed(spark, ivf_path, qv, k=10,
                            n_probe=N_CLUSTERS, exclude_ids=(5,),
                            allowed=allowed).collect()]
    assert got == want and got


def test_ivf_filtered_probes_subset(spark, clustered, ivf_path):
    """At few probes the filtered IVF result is exactly the brute filtered
    ranking RESTRICTED to the probed cells (pre-filter inside the probe),
    and every hit passes the filter."""
    qv = _qv(clustered, 7)
    allowed = clustered.filter("label = 1").select("vec_id")
    allowed_ids = {r["vec_id"] for r in allowed.collect()}
    got = ivf_topk_indexed(spark, ivf_path, qv, k=10, n_probe=2,
                           allowed=allowed).collect()
    assert got and all(r["vec_id"] in allowed_ids for r in got)
    # recompute within the same probed cells (from the manifest, not the
    # hits — all hits may land in one of the two probes)
    import json

    from searchengine_spark.textops.similarity import probe_centroids

    man = json.loads(open(f"{ivf_path}/ivf_manifest.json").read())
    cells = probe_centroids(man["centroids_micro"], qv, 2)
    bucket = spark.read.parquet(f"{ivf_path}/buckets").filter(
        F.col("centroid_id").isin([int(c) for c in cells]))
    probe_ids = {r["vec_id"] for r in bucket.select("vec_id").collect()}
    want = _brute(clustered, qv, allowed_ids & probe_ids, 10)
    assert [(r["vec_id"], r["cosine"]) for r in got] == want


def test_min_similarity_cutoff_brute(clustered):
    """ES knn `similarity`: the page cuts at the rounded-cosine
    threshold even when under-filled; threshold -1 is a no-op."""
    q = _qv(clustered, 0)
    full = cosine_topk(clustered, q, k=10, exclude_ids=(0,)).collect()
    th = float(full[3]["cosine"])  # keep exactly the top 4 (ties aside)
    cut = cosine_topk(clustered, q, k=10, exclude_ids=(0,),
                      min_similarity=th).collect()
    assert [r["vec_id"] for r in cut] == [
        r["vec_id"] for r in full if r["cosine"] >= th]
    assert len(cut) < len(full)
    noop = cosine_topk(clustered, q, k=10, exclude_ids=(0,),
                       min_similarity=-1.0).collect()
    assert [r["vec_id"] for r in noop] == [r["vec_id"] for r in full]


def test_min_similarity_cutoff_ivf(spark, clustered, ivf_path):
    q = _qv(clustered, 0)
    full = ivf_topk_indexed(spark, ivf_path, q, k=10,
                            n_probe=N_CLUSTERS, exclude_ids=(0,)).collect()
    th = float(full[2]["cosine"])
    cut = ivf_topk_indexed(spark, ivf_path, q, k=10, n_probe=N_CLUSTERS,
                           exclude_ids=(0,), min_similarity=th).collect()
    assert [r["vec_id"] for r in cut] == [
        r["vec_id"] for r in full if r["cosine"] >= th]
    assert 0 < len(cut) < len(full)
