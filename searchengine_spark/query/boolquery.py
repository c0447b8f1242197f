"""ES ``bool`` query — the compound workhorse: ``must`` (required,
scoring), ``should`` (optional, scoring, with ``minimum_should_match``),
``must_not`` (veto), ``filter`` terms (required, NON-scoring) — composed
from the engine's existing gated primitives, one bool query per call
(the ES request shape).

Composition (no new scorer kernel — every piece is already
oracle-gated):

- the required set (``must`` + ``filter_terms``) resolves through ONE
  boolean-AND pass (:func:`~.wand.boolean_search_packed`) into a
  ``doc_filter`` frame — the same per-chunk join attribute filtering
  uses, so block-max pruning stays exact;
- scoring runs the ordinary WAND batch over the UNIQUE union of must +
  should terms (a term in both clauses contributes once — the
  engine-wide unique-terms quirk, documented deviation from ES's
  clause-sum which would double-count it); filter terms never score
  (the ES filter-context contract);
- ``minimum_should_match`` on the should clause rides the existing
  coverage floor: on docs that already contain every must term, joint
  coverage >= |must| + m  <=>  should coverage >= m;
- ``must_not`` is the existing exclusion fan-out.

ES defaults kept: msm defaults to 0 when the bool has a must/filter
clause and to 1 when it is should-only. An out-of-vocabulary must or
filter term matches nothing (the AND contract); a term both required
and negated matches nothing (ES agrees); msm above the should-term
count matches nothing (the floor is unreachable).

No reference counterpart (the reference serves single-list queries);
semantics follow the Elasticsearch bool query.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tokenizer import TokenizerConfig, tokenize_text


def _terms(text: Optional[str], cfg: TokenizerConfig) -> list:
    return list(dict.fromkeys(tokenize_text(text, cfg))) if text else []


def bool_query_topk(
    pidx,
    cfg: TokenizerConfig,
    must: Optional[str] = None,
    should: Optional[str] = None,
    must_not: Optional[str] = None,
    filter_terms: Optional[str] = None,
    min_should_match: Optional[int] = None,
    k: int = 10,
    round_dp: int | None = None,
    doc_filter: DataFrame | None = None,
) -> DataFrame:
    """One ES bool query -> (query_id=0, doc_id, score, rank): docs
    containing EVERY must/filter term, >= msm should terms and NO
    must_not term, BM25-ranked over their must+should matches.
    ``doc_filter`` (attribute filter frame) intersects with the
    required-term set — the ES filter context takes both shapes."""
    from .wand import bm25_topk_packed_batch, boolean_search_packed

    m_terms = _terms(must, cfg)
    s_terms = _terms(should, cfg)
    n_terms = _terms(must_not, cfg)
    f_terms = _terms(filter_terms, cfg)
    if not m_terms and not s_terms:
        raise ValueError(
            "a bool query needs at least one scoring clause (must/should) "
            "— filter/must_not alone would be an unranked corpus scan"
        )
    if min_should_match is None:
        msm = 0 if (m_terms or f_terms) else 1
    else:
        msm = int(min_should_match)
        if msm < 0:
            raise ValueError(f"min_should_match must be >= 0, got {msm}")
    if msm and not s_terms:
        raise ValueError("min_should_match needs a should clause")

    spark = pidx.spark
    required = list(dict.fromkeys(m_terms + f_terms))
    allowed = doc_filter
    if required:
        req_set = boolean_search_packed(
            pidx, [" ".join(required)], cfg, op="and"
        ).select("doc_id")
        allowed = (req_set if allowed is None
                   else allowed.select("doc_id").join(req_set, "doc_id"))

    scoring = list(dict.fromkeys(m_terms + s_terms))
    floor = None
    if msm:
        # on docs that already hold every must term, joint scoring
        # coverage = |M| + |matched (S \ M)|, and |matched S| =
        # |S ∩ M| + |matched (S \ M)| — so should-coverage >= msm is
        # exactly joint coverage >= |M| + msm - |S ∩ M|; a floor <= 0
        # is already satisfied by membership in the required set
        floor = len(m_terms) + msm - len(set(m_terms) & set(s_terms))
        if floor < 1:
            floor = None
    out = bm25_topk_packed_batch(
        pidx,
        [" ".join(scoring)],
        cfg,
        k=k,
        round_dp=round_dp,
        query_terms=[scoring],
        doc_filter=allowed,
        exclude_terms={0: n_terms} if n_terms else None,
        min_should_match=floor,
    )
    return out.select("query_id", "doc_id", "score", "rank")


def bool_query_local(
    searcher,
    must: Optional[str] = None,
    should: Optional[str] = None,
    must_not: Optional[str] = None,
    filter_terms: Optional[str] = None,
    min_should_match: Optional[int] = None,
    k: int = 10,
    round_dp: int | None = None,
    resolve: bool = True,
) -> list:
    """In-process twin over a :class:`~.serve.FederatedLocalSearcher`
    (single index = one shard) — zero Spark jobs once warm: the required
    set resolves through the searcher's own boolean_and (the set
    contract: no top-k cut), feeds ``filter_docs``, and the same
    coverage-floor identity drives minimum_should_match. Gated
    rank-identical to the distributed tiers per serving shape
    (single-index vs bool_query_topk; federated vs the federated twin —
    both speak the same idf/dl_norm contracts as their distributed
    counterparts)."""
    cfg = searcher.cfg
    m_terms = _terms(must, cfg)
    s_terms = _terms(should, cfg)
    n_words = must_not.split() if must_not else None
    f_terms = _terms(filter_terms, cfg)
    if not m_terms and not s_terms:
        raise ValueError(
            "a bool query needs at least one scoring clause (must/should) "
            "— filter/must_not alone would be an unranked corpus scan"
        )
    if min_should_match is None:
        msm = 0 if (m_terms or f_terms) else 1
    else:
        msm = int(min_should_match)
        if msm < 0:
            raise ValueError(f"min_should_match must be >= 0, got {msm}")
    if msm and not s_terms:
        raise ValueError("min_should_match needs a should clause")

    required = list(dict.fromkeys(m_terms + f_terms))
    filter_docs = None
    if required:
        hits = searcher.search(" ".join(required), ranker="boolean_and",
                               resolve=False)
        filter_docs = [int(r["doc_id"]) for r in hits]
        if not filter_docs:
            return []
    scoring = list(dict.fromkeys(m_terms + s_terms))
    floor = None
    if msm:
        floor = len(m_terms) + msm - len(set(m_terms) & set(s_terms))
        if floor < 1:
            floor = None
    return searcher.search(
        " ".join(scoring), k=k, ranker="bm25", round_dp=round_dp,
        resolve=resolve, filter_docs=filter_docs, exclude=n_words,
        min_should_match=floor,
    )


def bool_query_topk_federated(
    shards,
    cfg: TokenizerConfig,
    must: Optional[str] = None,
    should: Optional[str] = None,
    must_not: Optional[str] = None,
    filter_terms: Optional[str] = None,
    min_should_match: Optional[int] = None,
    k: int = 10,
    round_dp: int | None = None,
) -> DataFrame:
    """Federated twin: the required set resolves PER SHARD (shard-local
    boolean AND feeding the per-shard ``doc_filters`` seam, exactly the
    attribute-filter shape), the coverage floor is shard-exact (a doc's
    whole coverage lives in its one shard), and exclusion federates —
    so the ELIGIBLE SET is identical to the merged index's. Scores
    follow the federation BM25 contract (idf federation-global, dl_norm
    shard-local — dfs_query_then_fetch; CLAUDE.md): gated equal to the
    federated score-all surface cut to the brute eligible set. Result
    doc ids speak the federation namespace."""
    from .federated import bm25_topk_federated
    from .wand import boolean_search_packed

    m_terms = _terms(must, cfg)
    s_terms = _terms(should, cfg)
    n_terms = _terms(must_not, cfg)
    f_terms = _terms(filter_terms, cfg)
    if not m_terms and not s_terms:
        raise ValueError(
            "a bool query needs at least one scoring clause (must/should) "
            "— filter/must_not alone would be an unranked corpus scan"
        )
    if min_should_match is None:
        msm = 0 if (m_terms or f_terms) else 1
    else:
        msm = int(min_should_match)
        if msm < 0:
            raise ValueError(f"min_should_match must be >= 0, got {msm}")
    if msm and not s_terms:
        raise ValueError("min_should_match needs a should clause")

    required = list(dict.fromkeys(m_terms + f_terms))
    doc_filters = None
    if required:
        doc_filters = [
            boolean_search_packed(s, [" ".join(required)], cfg, op="and")
            .select("doc_id")
            for s in shards
        ]
    scoring = list(dict.fromkeys(m_terms + s_terms))
    floor = None
    if msm:
        floor = len(m_terms) + msm - len(set(m_terms) & set(s_terms))
        if floor < 1:
            floor = None
    out = bm25_topk_federated(
        shards,
        [" ".join(scoring)],
        cfg,
        k=k,
        round_dp=round_dp,
        query_terms=[scoring],
        doc_filters=doc_filters,
        exclude_terms={0: n_terms} if n_terms else None,
        min_should_match=floor,
    )
    return out.select("query_id", "doc_id", "score", "rank")


def constant_score_topk(
    pidx,
    queries: Sequence[str],
    cfg: TokenizerConfig,
    boost: float = 1.0,
    op: str = "and",
    k: int = 10,
) -> DataFrame:
    """ES ``constant_score`` query -> (query_id, doc_id, score, rank):
    filter-context retrieval — every matching doc scores exactly
    ``boost``, ranking is doc_id ASC (ES returns the equal-score set in
    arbitrary order; ours is the repo-wide deterministic tie-break).

    The POINT of ES constant_score / filter context is that matching
    skips scoring entirely (cacheable filters, no statistics): this plan
    never reads term_stats / idf / doc-length norms — it is the existing
    boolean retrieval (one pruned postings scan, one distinct-agg
    exchange) plus a literal column and a per-query rank window over the
    already-aggregated match set (plan-gated in
    tests/test_constant_score.py).

    ``op`` picks the wrapped filter's combine: 'and' (ES bool.filter of
    term clauses) or 'or' (ES terms query). No reference counterpart;
    semantics follow the Elasticsearch constant_score query.
    """
    from pyspark.sql import Window

    from .wand import boolean_search_packed

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    matched = boolean_search_packed(pidx, list(queries), cfg, op=op)
    w = Window.partitionBy("query_id").orderBy(F.asc("doc_id"))
    return (
        matched.select("query_id", "doc_id")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .withColumn("score", F.lit(float(boost)))
        .select("query_id", "doc_id", "score", "rank")
    )
