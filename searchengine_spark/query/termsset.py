"""ES terms_set query: per-DOC minimum_should_match from an attribute.

The reference engine has only whole-query semantics; terms_set is the ES
analog (task-spec extension axis) where each DOCUMENT carries its own
coverage floor: a doc matches when the number of distinct query terms it
contains is >= the doc's ``minimum_should_match_field`` value. The
canonical use is tag matching — a doc listing required skills matches a
query only when enough of them are present.

Contract (the ES field form, not the script form):

- coverage counts DISTINCT matched query terms (multiplicity ignored —
  the engine-wide BM25 quirk, SURVEY.md §2.6.2, and ES's own rule);
- a doc with required > #query-terms can never match (no clamping — the
  ES field form does not clamp either; clamping is what ES's
  minimum_should_match_script is for);
- required <= 1 degenerates to plain OR (a doc only appears when >= 1
  term matches);
- docs with a NULL / absent required value are DROPPED (the engine-wide
  NULLs-skip aggregation rule; ES raises instead — documented deviation,
  dropping composes with sparse attribute tables);
- score = the bool/should BM25 sum over the matched terms — identical to
  the plain OR ranker's score, so terms_set is a pure eligibility
  narrowing of the OR result (gated exactly so).

Plan shapes:

- exact path: one broadcast query join; the per-doc aggregate emits the
  score AND the coverage count from the same groupBy (no second pass);
  the required side joins on doc_id (AQE broadcasts small ones).
- packed path: a COMPOSITION of two gated primitives — boolean OR
  retrieval (per-doc coverage) and the BM25 score-all surface — joined
  on (query_id, doc_id). Two posting decodes, the same cost class ES
  pays (terms_set disables the top-k early cut: the coverage floor is
  per-doc, so pruning by score alone could discard an eligible doc
  while keeping ineligible ones).
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..indexing.build import Bm25Params, IndexTables
from ..tokenizer import TokenizerConfig, tokenize_text
from .bm25 import _tf_saturation

_OUT_COLS = ("query_id", "doc_id", "n_matched", "score", "rank")


def _check_required(required: DataFrame) -> DataFrame:
    if "doc_id" not in required.columns or "required" not in required.columns:
        raise ValueError(
            "required frame needs (doc_id, required) columns, got "
            f"{required.columns}"
        )
    return required.filter(F.col("required").isNotNull()).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("required").cast("long").alias("required"),
    )


def required_from_attrs(pidx, attrs: DataFrame, m_expr) -> DataFrame:
    """Resolve an attribute expression to the (doc_id, required) frame
    (the terms_set twin of wand.filter_doc_ids): ``m_expr`` is a SQL
    expression / Column over the attrs columns producing the per-doc
    coverage floor; external ids map through the docmap."""
    ext = [c for c in pidx.manifest["order_cols"] if c != "doc_id"]
    missing = [c for c in ext if c not in attrs.columns]
    if missing:
        raise ValueError(
            f"attrs table lacks the index's external-id columns {missing} "
            f"(order_cols={pidx.manifest['order_cols']})"
        )
    expr = F.expr(m_expr) if isinstance(m_expr, str) else m_expr
    return (
        attrs.select(*ext, expr.alias("required"))
        .join(pidx.docmap, ext)
        .select("doc_id", "required")
    )


def terms_set_topk_batch(
    it: IndexTables,
    queries: List[str],
    required: DataFrame,
    cfg: TokenizerConfig,
    k: int | None = 10,
    params: Bm25Params = Bm25Params(),
    round_dp: int | None = 6,
) -> DataFrame:
    """Exact-path terms_set -> (query_id, doc_id, n_matched, score,
    rank); rank by (rounded score DESC, doc_id ASC). ``required`` is a
    (doc_id, required) frame — build it from an attribute table with
    :func:`required_from_attrs` on the packed surface, or pass any
    keyed frame here."""
    spark = it.index.sparkSession
    req = _check_required(required)
    rows = []
    for qid, q in enumerate(queries):
        for t in dict.fromkeys(tokenize_text(q, cfg)):
            rows.append((qid, t))
    qdf = spark.createDataFrame(rows or [(0, "")], "query_id int, term string")
    if not rows:
        qdf = qdf.limit(0)
    matched = it.index.join(F.broadcast(qdf), "term", "inner")
    matched = matched.join(
        F.broadcast(it.term_stats.select("term", "idf")), "term"
    )
    scored = matched.join(it.doc_lengths.select("doc_id", "dl_norm"), "doc_id")
    contrib = F.col("idf") * _tf_saturation(
        F.col("tf").cast("double"), F.col("dl_norm"), params
    )
    # score and coverage from ONE aggregate: distinct query terms only
    # ever contribute one (term, doc) row each, so count(*) IS coverage
    agg = scored.groupBy("query_id", F.col("doc_id").cast("long").alias("doc_id")).agg(
        F.sum(contrib).alias("_s"), F.count("*").cast("long").alias("n_matched")
    )
    eligible = agg.join(req, "doc_id").filter(
        F.col("n_matched") >= F.col("required")
    )
    score = (
        F.round(F.col("_s"), round_dp) if round_dp is not None else F.col("_s")
    )
    out = eligible.select(
        "query_id", "doc_id", "n_matched", score.alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    ranked = out.withColumn("rank", F.row_number().over(w).cast("long"))
    if k is not None:
        ranked = ranked.filter(F.col("rank") <= k)
    return ranked.select(*_OUT_COLS)


def terms_set_topk_packed_batch(
    pidx,
    queries: Sequence[str],
    required: DataFrame,
    cfg: TokenizerConfig | None = None,
    k: int | None = 10,
    round_dp: int | None = 6,
) -> DataFrame:
    """Packed-path terms_set (gated == exact): boolean OR coverage
    joined with the BM25 score-all surface, then the per-doc floor."""
    from .wand import bm25_scores_packed_batch, boolean_search_packed

    cfg = cfg or TokenizerConfig.from_manifest(pidx.manifest.get("tokenizer", {}))
    req = _check_required(required)
    cov = boolean_search_packed(pidx, list(queries), cfg, op="or").select(
        "query_id", "doc_id", F.col("n_terms").cast("long").alias("n_matched")
    )
    scores = bm25_scores_packed_batch(
        pidx, list(queries), cfg, round_dp=round_dp
    )
    eligible = (
        scores.join(cov, ["query_id", "doc_id"])
        .join(req, "doc_id")
        .filter(F.col("n_matched") >= F.col("required"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    ranked = eligible.withColumn(
        "rank", F.row_number().over(w).cast("long")
    )
    if k is not None:
        ranked = ranked.filter(F.col("rank") <= k)
    return ranked.select(*_OUT_COLS)
