"""TF-IDF ranker (SMART ddd.qqq schemas) with reference-exact semantics.

Reference: src/models/rankers/tf_idf.py. Supported schema positions (same
subset the reference validates, tf_idf.py:17-58):
  doc   tf  schema[0] in l|b|n    (1+ln(tf) | 0/1 | raw)
  doc   df  schema[1] in n|t|p    (only 'n' meaningful from-disk: the
            reference's query-time calculate_idf reads documents_length,
            which is EMPTY for an index loaded from disk -> 't'/'p' would
            divide by zero; tf_idf.py:92,179-187)
  doc  norm schema[2] in c|b|n
  query tf  schema[4], df schema[5] (build-time idf, stored 3dp), norm schema[6]

Reference-exact quirks reproduced:
- the stored doc weight is round(w, 3) (serialized form, tf_idf.py:115) and
  from-disk search scores use the STORED value (SURVEY.md §2.6.1);
- query tf counts multiplicity (query.count(token), tf_idf.py:80) — unlike
  BM25 which ignores it;
- query-side normalization runs over the terms PRESENT in the index only
  (order() iterates term_to_posting_list.keys(), tf_idf.py:78-94);
- uniform_weight alg 'n' maps every weight to 1 (not identity! tf_idf.py:201);
- docs absent from a term's postings contribute 0 (defaultdict tf_weight).

Plan shape mirrors the BM25 batch scorer: broadcast query terms, join the
(term, doc_id) weights table, groupBy(query_id, doc_id) sum, window top-k.
"""

from __future__ import annotations

import math
from typing import List, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..indexing.build import IndexTables
from ..tokenizer import TokenizerConfig, tokenize_text

DEFAULT_SCHEMA = "lnc.ltc"


def validate_schema(schema: str) -> None:
    ok = (
        len(schema) == 7
        and schema[3] == "."
        and schema[0] in "lbn"
        and schema[1] in "ntp"
        and schema[2] in "cbn"
        and schema[4] in "lbn"
        and schema[5] in "ntp"
        and schema[6] in "cbn"
    )
    if not ok:
        raise ValueError(f"unsupported TF-IDF schema {schema!r}")
    if schema[1] != "n":
        raise ValueError(
            "doc-side df alg must be 'n' for from-disk search parity "
            "(reference query-time documents_length is empty, tf_idf.py:179-187)"
        )


def _uniform_tf_col(tf: Column, alg: str) -> Column:
    if alg == "l":
        # 1 + ln(tf) if tf > 0 else 0 (tf_idf.py:168-173)
        return F.when(tf > 0, F.lit(1.0) + F.log(tf.cast("double"))).otherwise(F.lit(0.0))
    if alg == "b":
        return F.when(tf > 0, F.lit(1.0)).otherwise(F.lit(0.0))
    return tf.cast("double")


def _uniform_tf_py(tf: int, alg: str) -> float:
    if alg == "l":
        return 1.0 + math.log(tf) if tf > 0 else 0.0
    if alg == "b":
        return 1.0 if tf > 0 else 0.0
    return float(tf)


def tfidf_weights(it: IndexTables, schema: str = DEFAULT_SCHEMA) -> DataFrame:
    """Stored doc-side weights table (term, doc_id, tf, w) with
    w = round(norm(uniform_tf(tf)), 3) — the serialized 'doc:freq/w' value
    (tf_idf.py:114-115)."""
    validate_schema(schema)
    w = _uniform_tf_col(F.col("tf"), schema[0])
    weights = it.index.select("term", "doc_id", "tf", w.alias("w_raw"))
    if schema[2] == "c":
        norm = weights.groupBy("doc_id").agg(
            F.sqrt(F.sum(F.col("w_raw") * F.col("w_raw"))).alias("_norm")
        )
        weights = weights.join(norm, "doc_id").withColumn(
            "w_raw", F.col("w_raw") / F.col("_norm")
        ).drop("_norm")
    elif schema[2] == "n":
        # reference uniform_weight 'n' maps every weight to 1 (tf_idf.py:201)
        weights = weights.withColumn("w_raw", F.lit(1.0))
    # 'b' is accepted by the validator but has no uniform_weight branch in
    # the reference -> returns None and crashes there; we treat as identity
    # bround (HALF_EVEN), not round: the reference stores Python
    # round(w, 3) (tf_idf.py:115) which is banker's on exact binary ties —
    # measure-zero for lnc's ln() values, but REAL for bnc/nnc where
    # tf/sqrt(Σtf²) lands on 0.0625-class doubles (Python 0.062, HALF_UP
    # would give 0.063)
    return weights.select(
        "term", "doc_id", "tf", F.bround("w_raw", 3).alias("w")
    )


def tfidf_topk_batch(
    it: IndexTables,
    queries: Sequence[str],
    cfg: TokenizerConfig,
    k: int = 10,
    schema: str = DEFAULT_SCHEMA,
    weights: DataFrame | None = None,
    rank_dp: int | None = None,
) -> DataFrame:
    """All queries in one plan -> (query_id, doc_id, score, rank), rank<=k.

    ``rank_dp``: round scores to this many decimals and rank BY the rounded
    value (doc_id tie-break) — the cross-engine-stable ordering used by the
    DuckDB oracle entries, so top-k can cut at k directly instead of ranking
    the full candidate set and re-cutting outside."""
    validate_schema(schema)
    spark = it.index.sparkSession
    if weights is None:
        weights = tfidf_weights(it, schema)

    rows = []
    for qid, q in enumerate(queries):
        toks = tokenize_text(q, cfg)
        for t in dict.fromkeys(toks):
            # query-term multiplicity COUNTS for TF-IDF (tf_idf.py:80)
            rows.append((qid, t, _uniform_tf_py(toks.count(t), schema[4])))
    qdf = spark.createDataFrame(rows or [(0, "", 0.0)], "query_id int, term string, qtf double")
    if not rows:
        qdf = qdf.limit(0)

    # ltc = qtf * stored idf, normalized over PRESENT terms per query
    qterms = qdf.join(F.broadcast(it.term_stats.select("term", "idf")), "term")
    ltc = qterms.withColumn("ltc", F.col("qtf") * F.col("idf"))
    if schema[6] == "c":
        qnorm = ltc.groupBy("query_id").agg(
            F.sqrt(F.sum(F.col("ltc") * F.col("ltc"))).alias("_qn")
        )
        ltc = ltc.join(qnorm, "query_id").withColumn(
            "ltc", F.col("ltc") / F.col("_qn")
        ).drop("_qn")
    elif schema[6] == "n":
        ltc = ltc.withColumn("ltc", F.lit(1.0))

    matched = weights.join(F.broadcast(ltc.select("query_id", "term", "ltc")), "term")
    # doc-side lnc: schema[1]=='n' -> idf factor 1 (validated above)
    contrib = F.col("w") * F.col("ltc")
    agg = matched.groupBy("query_id", "doc_id").agg(F.sum(contrib).alias("score"))
    if rank_dp is not None:
        agg = agg.withColumn("score", F.round("score", rank_dp))
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return agg.withColumn("rank", F.row_number().over(w_rank)).filter(F.col("rank") <= k)


def tfidf_topk(
    it: IndexTables,
    query: str,
    cfg: TokenizerConfig,
    k: int = 10,
    schema: str = DEFAULT_SCHEMA,
) -> DataFrame:
    out = tfidf_topk_batch(it, [query], cfg, k, schema)
    return out.select("doc_id", "score")
