"""Servable IVF gates: bucketed layout, multi-probe recall, integer-exact
k-means determinism.

The driver-contract entries (emb_ivf_topk / emb_ivf_recall) hash-check the
pipeline against a full DuckDB replica on the sf0.01 fixture; the fixture's
embeddings are UNIFORM RANDOM, the degenerate case for any partitioning ANN
(recall ~= probed mass fraction). The recall bar that matters for real
corpora — >= 0.9 @ n_probe=2 — is gated here on clusterABLE data."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from searchengine_spark.textops import (
    build_ivf_index,
    cosine_topk,
    ivf_topk_indexed,
    kmeans_micro,
)

DIM = 16
N_CLUSTERS = 8


@pytest.fixture(scope="module")
def clustered(spark):
    """8 well-separated gaussian clusters, 40 points each (seed-pure)."""
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((N_CLUSTERS, DIM)) * 6.0
    rows = []
    vid = 0
    for c in centers:
        for _ in range(40):
            v = c + rng.standard_normal(DIM) * 0.5
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def ivf_path(clustered, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "idx")
    build_ivf_index(clustered, path, n_centroids=N_CLUSTERS, dim=DIM, n_iters=3)
    return path


def _recall(spark, clustered, ivf_path, qid, n_probe, k=10):
    qv = [float(x) for x in
          clustered.filter(F.col("vec_id") == qid).first()["embedding"]]
    ivf = {r["vec_id"] for r in ivf_topk_indexed(
        spark, ivf_path, qv, k=k, n_probe=n_probe, exclude_ids=(qid,)).collect()}
    true = {r["vec_id"] for r in cosine_topk(
        clustered, qv, k=k, exclude_ids=(qid,)).collect()}
    return len(ivf & true) / k


def test_recall_on_clusterable_data(spark, clustered, ivf_path):
    """north-target recall: >= 0.9 @ n_probe=2 when data has structure."""
    recalls = [_recall(spark, clustered, ivf_path, qid, n_probe=2)
               for qid in (0, 45, 90, 170, 250)]
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_full_probe_is_lossless(spark, clustered, ivf_path):
    """n_probe=C degenerates to exact brute force — bucketing loses nothing."""
    assert _recall(spark, clustered, ivf_path, 7, n_probe=N_CLUSTERS) == 1.0


def test_bucketed_layout_partition_prunes(spark, ivf_path):
    """The probe filter must hit the partition column -> only probed bucket
    directories are scanned (PartitionFilters in the plan)."""
    df = spark.read.parquet(ivf_path + "/buckets").filter(
        F.col("centroid_id").isin([0, 1])
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan


def test_cosine_near_pairs_bucketed_subset(spark, clustered):
    """Bucketed near-pair candidates are exactly the brute pairs restricted
    to same-bucket ids (approximation is the restriction, nothing else),
    and on clustered data they recover (almost) all true near pairs."""
    from searchengine_spark.textops import cosine_near_pairs, kmeans_micro

    small = clustered.filter(F.col("vec_id") < 120)
    brute = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_near_pairs(small, threshold=0.95).collect()
    }
    cents = kmeans_micro(small, n_centroids=4, dim=DIM, n_iters=2)
    bucketed = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_near_pairs(small, threshold=0.95, bucket_by=cents).collect()
    }
    assert set(bucketed) <= set(brute)
    for k, v in bucketed.items():
        assert v == brute[k]
    assert brute, "fixture must produce near pairs"
    # clustered data: same-cluster near-dups stay in one coarse cell
    assert len(bucketed) / len(brute) >= 0.8


def test_clustered_recall_entry(spark):
    """The oracle-gated clustered-recall entry must clear the >=0.9 @
    n_probe=2 bar (its VALUES are also hash-checked vs the full DuckDB
    pipeline replica by the driver contract)."""
    import __spark_entry__ as entrymod

    rows = entrymod.q_emb_ivf_recall_clustered(spark, "/root/testdata/sf0.01").collect()
    recalls = [r["recall"] for r in rows]
    assert len(recalls) == 3
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_kmeans_micro_deterministic(spark, clustered):
    """Integer micro-unit arithmetic: identical centroids on repeat runs
    (the property that lets the DuckDB oracle replicate training)."""
    a = kmeans_micro(clustered, n_centroids=4, dim=DIM, n_iters=2)
    b = kmeans_micro(clustered, n_centroids=4, dim=DIM, n_iters=2)
    assert a == b
    assert all(isinstance(x, int) for c in a for x in c)


def test_semantic_dedup_matches_brute(spark, clustered):
    """SemDeDup composition (textops/similarity.py semantic_dedup): the
    keep-list equals an independent Python replica — integer-L2
    centroid assignment, within-cluster rounded-cosine pairs, union-find
    components, min-id representative. The clusterable fixture plus
    planted exact twins guarantees non-trivial duplicate groups."""
    from searchengine_spark.textops import kmeans_micro, semantic_dedup

    # plant near-exact twins (ids 10000+i copy vector i for i in 0..9)
    twins = clustered.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding")
    emb = clustered.unionByName(twins)
    cents = kmeans_micro(emb, N_CLUSTERS, DIM, n_iters=2)
    out = semantic_dedup(emb, threshold=0.999, centroids=cents, dim=DIM)
    got = {r["vec_id"]: (r["canonical_id"], r["keep"]) for r in out.collect()}

    rows = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    assert set(got) == set(rows)

    # python replica: micro-quantize, assign, pairs, union-find
    cent = np.array(cents, dtype=np.int64)

    def micro(v):
        return np.floor(v * 1e6).astype(np.int64)

    assign = {}
    for vid, v in rows.items():
        d = ((cent - micro(v)) ** 2).sum(axis=1)
        assign[vid] = int(np.argmin(d))  # argmin takes lowest cid on ties

    parent = {vid: vid for vid in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(rows)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if assign[a] != assign[b]:
                continue
            va, vb = rows[a], rows[b]
            cos = round(va @ vb / (np.sqrt(va @ va) * np.sqrt(vb @ vb)), 6)
            if cos >= 0.999:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    want = {vid: find(vid) for vid in rows}
    assert {v: c for v, (c, _) in got.items()} == want
    # every planted twin resolves into its source's component, and
    # exactly one representative per component is kept
    for i in range(10):
        assert got[10000 + i][0] == got[i][0]
    comps = {}
    for v, (c, k) in got.items():
        comps.setdefault(c, []).append((v, k))
    for c, members in comps.items():
        assert [v for v, k in members if k] == [c]
