"""Property tests for the WAND scorer's new numerics (no Spark needed):
_member_mask membership, conjunctive coverage counting, boost-scaled
pruning bounds — the pieces correctness arguments in wand.py lean on."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_spark.query.wand import _member_mask

ids = st.lists(st.integers(min_value=0, max_value=200), min_size=0, max_size=40)


@settings(max_examples=200, deadline=None)
@given(docs=ids, allowed=ids)
def test_member_mask_is_set_membership(docs, allowed):
    d = np.asarray(docs, dtype=np.int64)
    a = np.unique(np.asarray(allowed, dtype=np.int64))
    got = _member_mask(d, a)
    want = np.asarray([x in set(allowed) for x in docs], dtype=bool)
    assert got.shape == want.shape and (got == want).all()


@settings(max_examples=100, deadline=None)
@given(
    per_term=st.lists(  # each term's (sorted unique) matched docs
        st.lists(st.integers(min_value=0, max_value=50), min_size=0,
                 max_size=20).map(lambda x: sorted(set(x))),
        min_size=1, max_size=5,
    )
)
def test_coverage_counting_equals_set_intersection(per_term):
    """np.unique counts over the concatenated per-term doc arrays ==
    |{terms containing doc}| — the conjunctive argument (each term
    contributes a doc at most once)."""
    docs = np.concatenate(
        [np.asarray(t, dtype=np.int64) for t in per_term]
    ) if any(per_term) else np.asarray([], dtype=np.int64)
    uniq, cov = np.unique(docs, return_counts=True)
    n = len(per_term)
    want_all = set.intersection(*(set(t) for t in per_term))
    got_all = set(uniq[cov == n].tolist())
    assert got_all == want_all


@settings(max_examples=100, deadline=None)
@given(
    scores=st.lists(st.floats(min_value=0, max_value=100, allow_nan=False),
                    min_size=1, max_size=30),
    boosts=st.lists(st.floats(min_value=0, max_value=10, allow_nan=False),
                    min_size=1, max_size=30),
)
def test_boost_scaled_bound_is_safe(scores, boosts):
    """bound·max(1, max boost) upper-bounds every boosted score when the
    raw bound upper-bounds raw scores and boosts are non-negative — the
    pruning-safety argument for doc_boost."""
    s = np.asarray(scores)
    b = np.asarray(boosts[: len(scores)] + [1.0] * max(0, len(scores) - len(boosts)))
    bound = float(s.max())
    scale = max(1.0, float(b.max()))
    assert (s * b <= bound * scale + 1e-12).all()
