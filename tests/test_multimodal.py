"""Multimodal kernel edge gates: NULL/empty/odd-size payloads must yield
deterministic rows (fixed feature dim), never a task-killing numpy error."""

from __future__ import annotations

import hashlib

from searchengine_spark.textops.multimodal import extract_features, resize_images


def _payloads(spark):
    rows = [
        (0, hashlib.md5(b"full").digest()),  # 16 bytes (the fixture shape)
        (1, b"0123456789"),  # 10 bytes: not a multiple of 4
        (2, b"12345678"),  # 8 bytes: used to yield a 2-dim feature
        (3, b""),  # empty
        (4, None),  # NULL payload
        (5, b"ab"),  # shorter than one feature group
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_extract_features_fixed_dim_any_size(spark):
    docs = _payloads(spark)
    got = {r["doc_id"]: r for r in extract_features(docs).collect()}
    assert set(got) == set(range(6))
    for d, r in got.items():
        assert len(r["feature"]) == 4, d  # fixed dim, zero-padded
    assert got[3]["n_bytes"] == 0 and got[3]["checksum"] == 0
    assert got[4]["n_bytes"] == 0
    assert got[3]["feature"] == [0.0] * 4
    # 8-byte payload: first two groups are real means, the rest zero-pad
    assert got[2]["feature"][2:] == [0.0, 0.0]


def test_resize_images_null_and_empty(spark):
    docs = _payloads(spark)
    got = {r["doc_id"]: r for r in resize_images(docs, out_len=4).collect()}
    assert got[3]["out_bytes"] == 0 and got[3]["resized"] == bytearray(b"")
    assert got[4]["out_bytes"] == 0 and got[4]["checksum"] == 0
    assert got[0]["out_bytes"] == 4  # real payloads still resample
    assert got[1]["out_bytes"] == 4
