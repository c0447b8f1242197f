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
