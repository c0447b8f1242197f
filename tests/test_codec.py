"""Property tests for the varbyte/delta posting codec and block-max bounds."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_spark.indexing.codec import (
    BLOCK,
    block_max,
    decode_postings,
    encode_postings,
    tf_saturation,
    varbyte_decode,
    varbyte_encode,
)


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**62), min_size=0, max_size=500
    )
)
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(arr)), arr)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**12),  # doc gaps
            st.integers(min_value=1, max_value=10_000),  # tf
            st.integers(min_value=0, max_value=100_000),  # dlq
        ),
        min_size=0,
        max_size=300,
    )
)
@settings(max_examples=200, deadline=None)
def test_postings_roundtrip(triples):
    gaps = np.array([g + 1 for g, _, _ in triples], dtype=np.int64)
    doc_ids = np.cumsum(gaps) if len(gaps) else np.zeros(0, np.int64)
    tfs = np.array([t for _, t, _ in triples], dtype=np.int64)
    dlqs = np.array([d for _, _, d in triples], dtype=np.int64)
    buf = encode_postings(doc_ids, tfs, dlqs)
    d2, t2, n2 = decode_postings(buf)
    assert np.array_equal(d2, doc_ids)
    assert np.array_equal(t2, tfs)
    assert np.array_equal(n2, dlqs.astype(np.float64) / 1000.0)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=1000),
            st.integers(min_value=1, max_value=100),
            st.integers(min_value=1, max_value=5000),
        ),
        min_size=1,
        max_size=400,
    )
)
@settings(max_examples=100, deadline=None)
def test_block_max_is_upper_bound(triples):
    doc_ids = np.cumsum([g for g, _, _ in triples])
    tfs = np.array([t for _, t, _ in triples], dtype=np.int64)
    dln = np.array([d for _, _, d in triples], dtype=np.float64) / 1000.0
    last, mx = block_max(doc_ids, tfs, dln, 1.2, 0.75)
    sat = tf_saturation(tfs, dln, 1.2, 0.75)
    for i in range(len(last)):
        blk = sat[i * BLOCK : (i + 1) * BLOCK]
        assert mx[i] >= blk.max() - 1e-15
        assert last[i] == doc_ids[min((i + 1) * BLOCK - 1, len(doc_ids) - 1)]


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40),
        min_size=1, max_size=200, unique=True,
    ),
    st.data(),
)
@settings(max_examples=100, deadline=None)
def test_doc_groups_roundtrip(doc_ids, data):
    """Boolean payload codec: multi-group doc-gap encode slices back to the
    exact per-group doc id lists."""
    from searchengine_spark.indexing.codec import decode_docs, encode_doc_groups

    docs = np.sort(np.array(doc_ids, dtype=np.int64))
    n = len(docs)
    n_groups = data.draw(st.integers(min_value=1, max_value=min(5, n)))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=1, max_value=n - 1),
                min_size=n_groups - 1, max_size=n_groups - 1, unique=True,
            )
        )
    ) if n > 1 else []
    starts = np.array([0] + cuts, dtype=np.int64)
    buffers, first, last, counts = encode_doc_groups(starts, docs)
    ends = np.append(starts[1:], n)
    assert len(buffers) == len(starts)
    for buf, s, e, f, l, c in zip(buffers, starts, ends, first, last, counts):
        got = decode_docs(buf)
        assert np.array_equal(got, docs[s:e])
        assert f == docs[s] and l == docs[e - 1] and c == e - s


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),   # doc_id
            st.integers(min_value=1, max_value=10_000),  # tf
            st.integers(min_value=0, max_value=1000),    # wq (3dp weight*1000)
        ),
        min_size=1, max_size=200,
    )
)
@settings(max_examples=100, deadline=None)
def test_tfidf_triple_roundtrip(rows):
    """tfidf payload ('doc:freq/w'): the (gap, tf, wq) triple stream decodes
    to exact tf and the exact 3dp weight (wq/1000 lossless)."""
    by_doc = {}
    for d, tf, wq in rows:
        by_doc[d] = (tf, wq)
    docs = np.array(sorted(by_doc), dtype=np.int64)
    tfs = np.array([by_doc[d][0] for d in docs], dtype=np.int64)
    wqs = np.array([by_doc[d][1] for d in docs], dtype=np.int64)
    buf = encode_postings(docs, tfs, wqs)
    gd, gt, gw = decode_postings(buf)
    assert np.array_equal(gd, docs)
    assert np.array_equal(gt, tfs)
    assert np.array_equal(np.round(gw * 1000).astype(np.int64), wqs)
