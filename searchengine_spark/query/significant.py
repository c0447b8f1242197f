"""Significant terms — the ES ``significant_terms`` aggregation analog:
which terms are OVERREPRESENTED in a query's result set relative to the
whole corpus ("what is this result set about, beyond what I searched
for"). The drill-down twin of facets (query/facets.py): facets count
attribute values, this mines the TEXT itself.

Scoring is ES's JLH: with fg_rate = fg_count / fg_total (share of result
docs containing the term) and bg_rate = df / N (share of live corpus
docs), ``score = (fg_rate - bg_rate) * (fg_rate / bg_rate)`` — the
absolute lift times the relative lift; only terms with fg_rate > bg_rate
(positive lift) qualify, and a ``min_fg`` doc-count floor drops
one-off noise (ES min_doc_count, default 2 there and here). Ranking is
the repo's deterministic cross-engine order: (round(score, 6) desc,
term asc).

Plan shape (the 100-TB question): the result set is queries x k rows —
a BROADCAST semi-join prunes the docs-stage token scan to just the hit
docs (the PRF/snippet pattern, query/feedback.py); one partial-
aggregable groupBy counts fg docs per (query, term); background df rides
the vocabulary-sized term_stats sidecar join; the final window runs over
the already-aggregated (query, term) counts. No full-corpus pass, no
per-row Python.

No reference counterpart (reference serves ranked lists only); semantics
follow Elasticsearch significant_terms (JLH heuristic).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..indexing.packed import PackedIndex
from ..tokenizer import TokenizerConfig, tokenize_text


def significant_terms(
    pidx: PackedIndex,
    results: DataFrame,
    k_terms: int = 10,
    min_fg: int = 2,
    exclude: Optional[DataFrame] = None,
) -> DataFrame:
    """(query_id, doc_id) result rows -> (query_id, term, fg_count, df,
    score, rank): the top-``k_terms`` JLH-significant terms per query over
    its result set.

    ``exclude``: optional (query_id, term) pairs removed from candidacy —
    pass the query's own terms to mine only NEW vocabulary (the PRF
    exclusion contract; without it the searched terms usually dominate,
    which is honest but rarely what the drill-down UI wants)."""
    if min_fg < 1:
        raise ValueError(f"min_fg must be >= 1, got {min_fg}")
    n_live = int(pidx.manifest.get("n_docs_live", pidx.manifest["n_docs"]))
    hits = results.select("query_id", "doc_id")
    fg_tot = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("fg_total")
    )
    toks = pidx.doc_tokens().join(F.broadcast(hits), "doc_id")
    fg = (
        toks.select("query_id", "doc_id", F.explode("tokens").alias("term"))
        .groupBy("query_id", "term")
        .agg(F.countDistinct("doc_id").alias("fg_count"))
        .filter(F.col("fg_count") >= min_fg)
    )
    if exclude is not None:
        fg = fg.join(exclude.select("query_id", "term"),
                     ["query_id", "term"], "left_anti")
    cand = (
        fg.join(F.broadcast(fg_tot), "query_id")
        .join(pidx.term_stats.select("term", "df"), "term")
    )
    fg_rate = F.col("fg_count").cast("double") / F.col("fg_total")
    bg_rate = F.col("df").cast("double") / F.lit(float(max(n_live, 1)))
    scored = cand.select(
        "query_id", "term", "fg_count",
        F.col("df").cast("long").alias("df"),
        ((fg_rate - bg_rate) * (fg_rate / bg_rate)).alias("_s"),
    ).filter(F.col("_s") > 0.0)  # positive lift only (ES contract)
    return _sig_rank(scored, k_terms)


def significant_attr_values(
    results: DataFrame,
    attrs: DataFrame,
    facet_cols,
    ext_cols,
    k: int = 10,
    min_fg: int = 2,
) -> DataFrame:
    """-> (query_id, facet, value, fg_count, bg_count, score, rank): ES
    significant_terms over ATTRIBUTE (keyword) fields — the more common
    ES usage than token mining: which attr values are OVER-represented
    in this query's result set relative to the whole corpus? Same JLH
    heuristic ((fg%-bg%)·(fg%/bg%), positive lift only, 6dp-rounded
    rank, value-asc ties) as the token miner above; a doc counts once
    per query. Background = ONE partial-aggregable count over the attrs
    table per facet value (corpus-sized input, value-bounded output —
    broadcast-sized for real keyword fields); foreground = the bounded
    hit-window join the facet/aggregation family shares. NULL values
    skip (ES missing is opt-in)."""
    if min_fg < 1:
        raise ValueError(f"min_fg must be >= 1, got {min_fg}")
    cols = list(facet_cols)
    if not cols:
        raise ValueError("facet_cols must name at least one column")
    missing = [c for c in list(ext_cols) + cols if c not in attrs.columns]
    if missing:
        raise ValueError(f"attrs table lacks columns {missing}")

    def _melt(df: DataFrame, keep):
        m = []
        for c in cols:
            m.extend([F.lit(c), F.col(c).cast("string")])
        return df.select(
            *keep, F.explode(F.create_map(*m)).alias("facet", "value")
        ).filter(F.col("value").isNotNull())

    hits = results.select("query_id", *ext_cols)
    fg_tot = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("fg_total"))
    joined = hits.join(attrs.select(*ext_cols, *cols), list(ext_cols))
    fg = (
        _melt(joined, ["query_id"])
        .groupBy("query_id", "facet", "value")
        .agg(F.count(F.lit(1)).alias("fg_count"))
        .filter(F.col("fg_count") >= min_fg)
    )
    bg = (
        _melt(attrs, [])
        .groupBy("facet", "value")
        .agg(F.count(F.lit(1)).alias("bg_count"))
    )
    bg_total = attrs.count()
    cand = fg.join(F.broadcast(fg_tot), "query_id").join(
        F.broadcast(bg), ["facet", "value"])
    fg_rate = F.col("fg_count").cast("double") / F.col("fg_total")
    bg_rate = F.col("bg_count").cast("double") / F.lit(
        float(max(bg_total, 1)))
    scored = cand.select(
        "query_id", "facet", "value",
        F.col("fg_count").cast("long").alias("fg_count"),
        F.col("bg_count").cast("long").alias("bg_count"),
        ((fg_rate - bg_rate) * (fg_rate / bg_rate)).alias("_s"),
    ).filter(F.col("_s") > 0.0)
    w = Window.partitionBy("query_id", "facet").orderBy(
        F.round(F.col("_s"), 6).desc(), F.col("value").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "facet", "value", "fg_count", "bg_count",
                F.round(F.col("_s"), 6).alias("score"), "rank")
    )


def _sig_rank(scored: DataFrame, k_terms: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("_s"), 6).desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k_terms)
        .select("query_id", "term",
                F.col("fg_count").cast("long").alias("fg_count"),
                "df", F.round("_s", 6).alias("score"), "rank")
    )


def significant_terms_federated(
    shards,
    results: DataFrame,
    k_terms: int = 10,
    min_fg: int = 2,
    exclude: Optional[DataFrame] = None,
) -> DataFrame:
    """Federated twin: ``results`` carries FEDERATION-GLOBAL doc ids
    (query/federated.py namespace). A doc's tokens live in exactly one
    shard, so per-shard fg doc counts SUM exactly; background df is the
    federation dictionary (df summed over disjoint shards == the merged
    index's term_stats) and N the federation live total — bit-identical
    to :func:`significant_terms` over the merged index on ANY corpus
    (every input to the lift is corpus-global, none is avgdl-flavored)."""
    from functools import reduce

    from .federated import _doc_bases, _global_dictionary

    if min_fg < 1:
        raise ValueError(f"min_fg must be >= 1, got {min_fg}")
    n_live = sum(int(s.manifest.get("n_docs_live", s.manifest["n_docs"]))
                 for s in shards)
    hits = results.select("query_id", "doc_id")
    fg_tot = hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("fg_total"))
    bases = _doc_bases(shards)
    ends = bases[1:] + [bases[-1] + int(shards[-1].manifest["n_docs"])]
    parts = []
    for s, base, end in zip(shards, bases, ends):
        local = hits.filter(
            (F.col("doc_id") >= base) & (F.col("doc_id") < end)
        ).select("query_id", (F.col("doc_id") - base).alias("doc_id"))
        parts.append(
            s.doc_tokens().join(F.broadcast(local), "doc_id")
            .select("query_id", "doc_id", F.explode("tokens").alias("term"))
            .groupBy("query_id", "term")
            .agg(F.countDistinct("doc_id").alias("fg_count"))
        )
    fg = (
        reduce(DataFrame.unionByName, parts)
        .groupBy("query_id", "term")
        .agg(F.sum("fg_count").alias("fg_count"))
        .filter(F.col("fg_count") >= min_fg)
    )
    if exclude is not None:
        fg = fg.join(exclude.select("query_id", "term"),
                     ["query_id", "term"], "left_anti")
    cand = (
        fg.join(F.broadcast(fg_tot), "query_id")
        .join(_global_dictionary(shards), "term")
    )
    fg_rate = F.col("fg_count").cast("double") / F.col("fg_total")
    bg_rate = F.col("df").cast("double") / F.lit(float(max(n_live, 1)))
    scored = cand.select(
        "query_id", "term", "fg_count",
        F.col("df").cast("long").alias("df"),
        ((fg_rate - bg_rate) * (fg_rate / bg_rate)).alias("_s"),
    ).filter(F.col("_s") > 0.0)
    return _sig_rank(scored, k_terms)


def significant_terms_for_queries(
    pidx: PackedIndex,
    queries: Sequence[str],
    cfg: TokenizerConfig,
    k: int = 10,
    k_terms: int = 10,
    min_fg: int = 2,
    exclude_query_terms: bool = True,
    round_dp: int | None = 6,
) -> DataFrame:
    """Convenience composition: BM25 top-``k`` retrieval, then
    :func:`significant_terms` over each query's hit set, the query's own
    terms excluded by default (mine NEW vocabulary)."""
    from .wand import bm25_topk_packed_batch

    base = bm25_topk_packed_batch(pidx, queries, cfg, k=k, round_dp=round_dp)
    excl = None
    if exclude_query_terms:
        rows = [(qid, t) for qid, q in enumerate(queries)
                for t in dict.fromkeys(tokenize_text(q, cfg))]
        if rows:
            excl = pidx.spark.createDataFrame(rows, "query_id int, term string")
    return significant_terms(pidx, base, k_terms=k_terms, min_fg=min_fg,
                             exclude=excl)
