"""Driver contract for the searchengine_spark engine.

``entry(spark)``   — flagship: BM25 top-10 over sf0.001 documents.
``queries()``      — one entry per implemented operator (SURVEY.md §2),
                     each (spark, sf_dir) -> DataFrame.
``oracle_sql()``   — DuckDB-runnable SQL producing identical rows/columns
                     (column names aliased identically on both sides).

Tokenization parity between engines: both sides lower-case, map every
``string.punctuation`` char to a space, split on whitespace and keep tokens
of length >= MIN_LEN — the reference tokenizer semantics
(/root/reference/src/models/tokenizer.py:41-72) restricted to min_len>=2
where the tab/newline standalone-token quirk is unobservable
(searchengine_spark/tokenizer.py module docstring).

Floating-point policy: scores are rounded to 6dp on BOTH sides and top-k
ordering uses the rounded score with doc_id tie-break, so the order-
insensitive value-hash comparison is robust to last-ulp summation-order
differences between Spark and DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.indexing.build import Bm25Params, build_index
from searchengine_spark.indexing.docids import with_doc_ids
from searchengine_spark.query.bm25 import bm25_topk_batch
from searchengine_spark.tokenizer import PUNCT_CLASS, TokenizerConfig, tokenize_text

# ---------------------------------------------------------------- config

MIN_LEN = 2
CFG = TokenizerConfig(min_token_length=MIN_LEN)
K, B = 1.2, 0.75  # reference test-entry defaults (src/test.py:45-46)

# Fixed benchmark queries over the testdata `documents` table (its vocab is
# OLAP-ish words; see TESTDATA.md). Tokenized once here so both engines see
# the same unique term lists (query-term multiplicity ignored — reference
# quirk, src/models/rankers/bm25.py:44-53).
QUERY_STRINGS = {
    0: "spark merge window vector",
    1: "fast hash join, big table scan!",
    2: "slow stream batch",
}


def _qterms(qid: int) -> list[str]:
    return list(dict.fromkeys(tokenize_text(QUERY_STRINGS[qid], CFG)))


# ---------------------------------------------------------------- helpers

def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _doc_index(spark: SparkSession, sf_dir: str, positional: bool = False):
    return build_index(
        _documents(spark, sf_dir), CFG, text_col="text", id_col="doc_id",
        positional=positional,
    )


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _sql_term_list(terms: list[str]) -> str:
    return "[" + ", ".join(_sql_quote(t) for t in terms) + "]"


# DuckDB tokenizer fragment == reference tokenizer at min_len>=2.
_PUNCT_SQL = _sql_quote(PUNCT_CLASS)
_TOK_SQL = (
    "list_filter(regexp_split_to_array(lower(regexp_replace(text, "
    f"{_PUNCT_SQL}, ' ', 'g')), '\\s+'), t -> length(t) >= {MIN_LEN})"
)

# Shared oracle CTE prefix: tokenized docs -> doc lengths -> exploded
# (term, doc_id, tf) index -> per-term df/idf. Mirrors IndexTables
# (searchengine_spark/indexing/build.py).
_INDEX_CTES = f"""
tok AS (
  SELECT doc_id, {_TOK_SQL} AS tokens FROM documents
),
dl AS (
  SELECT doc_id, len(tokens)::BIGINT AS dl FROM tok
),
corpus AS (
  SELECT count(*)::BIGINT AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl
),
dln AS (
  SELECT doc_id, dl, round(dl / (SELECT avgdl FROM corpus), 3) AS dl_norm FROM dl
),
exploded AS (
  SELECT doc_id, unnest(tokens) AS term FROM tok
),
idx AS (
  SELECT term, doc_id, count(*)::BIGINT AS tf FROM exploded GROUP BY term, doc_id
),
term_stats AS (
  SELECT term, count(*)::BIGINT AS df,
         round(ln((SELECT n FROM corpus)::DOUBLE / count(*)), 3) AS idf
  FROM idx GROUP BY term
)
"""


def _bm25_contrib_sql() -> str:
    return (
        f"term_stats.idf * (idx.tf * ({K} + 1.0)) / "
        f"(idx.tf + {K} * (1.0 - {B} + {B} * dln.dl_norm))"
    )


def _bm25_scored_cte(qid: int) -> str:
    terms = _sql_term_list(_qterms(qid))
    return f"""
q AS (SELECT unnest({terms}) AS term),
scored AS (
  SELECT idx.doc_id, sum({_bm25_contrib_sql()}) AS s
  FROM idx
  JOIN q USING (term)
  JOIN term_stats USING (term)
  JOIN dln USING (doc_id)
  GROUP BY idx.doc_id
)
"""


# ---------------------------------------------------------------- queries

def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I3+I10: posting accumulation + df/idf (SURVEY.md §2.2)."""
    it = _doc_index(spark, sf_dir)
    tstats = it.index.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("total_tf")
    )
    tstats = tstats.withColumn(
        "idf", F.round(F.log(F.lit(float(it.n_docs)) / F.col("df")), 3)
    )
    return tstats.orderBy(F.desc("df"), F.asc("term")).limit(200)


def q_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I4+I11: doc-length capture + avgdl normalization (3dp contract)."""
    it = _doc_index(spark, sf_dir)
    return it.doc_lengths.select(
        "doc_id", F.col("dl").cast("long").alias("dl"), "dl_norm"
    )


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2+Q4+Q7: term-lookup join -> BM25 OR scoring -> top-10."""
    it = _doc_index(spark, sf_dir)
    qdf = spark.createDataFrame([(t,) for t in _qterms(0)], "term string")
    matched = (
        it.index.join(F.broadcast(qdf), "term")
        .join(F.broadcast(it.term_stats.select("term", "idf")), "term")
        .join(it.doc_lengths.select("doc_id", "dl_norm"), "doc_id")
    )
    tf = F.col("tf").cast("double")
    contrib = F.col("idf") * (tf * (K + 1.0)) / (tf + K * (1.0 - B + B * F.col("dl_norm")))
    scored = matched.groupBy("doc_id").agg(F.round(F.sum(contrib), 6).alias("score"))
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(10)


def q_bm25_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4+Q7 batched: all queries in one plan, per-query rank<=5 window."""
    from pyspark.sql import Window

    it = _doc_index(spark, sf_dir)
    rows = [(qid, t) for qid in sorted(QUERY_STRINGS) for t in _qterms(qid)]
    qdf = spark.createDataFrame(rows, "query_id int, term string")
    matched = (
        it.index.join(F.broadcast(qdf), "term")
        .join(F.broadcast(it.term_stats.select("term", "idf")), "term")
        .join(it.doc_lengths.select("doc_id", "dl_norm"), "doc_id")
    )
    tf = F.col("tf").cast("double")
    contrib = F.col("idf") * (tf * (K + 1.0)) / (tf + K * (1.0 - B + B * F.col("dl_norm")))
    agg = matched.groupBy("query_id", "doc_id").agg(
        F.round(F.sum(contrib), 6).alias("score")
    )
    # rank over the ROUNDED score on both sides -> robust to last-ulp
    # summation-order differences (module docstring policy)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "doc_id", "score", "rank")
    )


def q_boolean_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean AND mode: posting-list intersection (north_star; SURVEY §2.5)."""
    it = _doc_index(spark, sf_dir)
    terms = _qterms(1)
    qdf = spark.createDataFrame([(t,) for t in terms], "term string")
    hits = it.index.join(F.broadcast(qdf), "term")
    return (
        hits.groupBy("doc_id")
        .agg(F.countDistinct("term").alias("nt"))
        .filter(F.col("nt") == len(terms))
        .select("doc_id")
    )


def q_docid_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I2: scale-safe dense docID assignment (two-pass offsets, no global
    window) — checked against the SQL row_number() oracle."""
    docs = _documents(spark, sf_dir).select(
        F.col("doc_id").alias("orig_id"), "source"
    )
    out = with_doc_ids(docs, order_cols=("source", "orig_id"), n_partitions=8)
    return out.select(F.col("doc_id").alias("new_id"), "orig_id")


def q_positional_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I3 positional payloads: token positions per (term, doc), as the
    comma-joined string form (reference line format 'doc:pos1,pos2,…',
    src/models/posting_lists/positional_posting_list.py:50-51)."""
    it = _doc_index(spark, sf_dir, positional=True)
    sel = it.index.filter(F.col("term").isin("vector", "merge"))
    return sel.select(
        "term",
        "doc_id",
        "tf",
        F.array_join(F.col("positions").cast("array<string>"), ",").alias("positions"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 over the sf0.001 documents corpus."""
    return q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "term_stats": q_term_stats,
        "doc_lengths": q_doc_lengths,
        "bm25_topk": q_bm25_topk,
        "bm25_topk_batch": q_bm25_topk_batch,
        "boolean_and": q_boolean_and,
        "docid_dense": q_docid_dense,
        "positional_index": q_positional_index,
    }


def oracle_sql() -> dict[str, str]:
    sqls: dict[str, str] = {}

    sqls["term_stats"] = f"""
WITH {_INDEX_CTES}
SELECT term, df, sum_tf.total_tf, idf
FROM term_stats
JOIN (SELECT term, sum(tf)::BIGINT AS total_tf FROM idx GROUP BY term) sum_tf
  USING (term)
ORDER BY df DESC, term ASC LIMIT 200
"""

    sqls["doc_lengths"] = f"""
WITH {_INDEX_CTES}
SELECT doc_id, dl, dl_norm FROM dln
"""

    sqls["bm25_topk"] = f"""
WITH {_INDEX_CTES},
{_bm25_scored_cte(0)}
SELECT doc_id, round(s, 6) AS score
FROM scored ORDER BY round(s, 6) DESC, doc_id ASC LIMIT 10
"""

    batch_selects = []
    for qid in sorted(QUERY_STRINGS):
        terms = _sql_term_list(_qterms(qid))
        batch_selects.append(
            f"SELECT {qid} AS query_id, term FROM (SELECT unnest({terms}) AS term)"
        )
    batch_q = " UNION ALL ".join(batch_selects)
    sqls["bm25_topk_batch"] = f"""
WITH {_INDEX_CTES},
q AS ({batch_q}),
scored AS (
  SELECT q.query_id, idx.doc_id, sum({_bm25_contrib_sql()}) AS s
  FROM idx JOIN q USING (term) JOIN term_stats USING (term) JOIN dln USING (doc_id)
  GROUP BY q.query_id, idx.doc_id
),
ranked AS (
  SELECT query_id, doc_id, round(s, 6) AS score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(s, 6) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT query_id, doc_id, score, rank FROM ranked WHERE rank <= 5
"""

    and_terms = _qterms(1)
    sqls["boolean_and"] = f"""
WITH {_INDEX_CTES},
q AS (SELECT unnest({_sql_term_list(and_terms)}) AS term)
SELECT doc_id FROM idx JOIN q USING (term)
GROUP BY doc_id HAVING count(DISTINCT term) = {len(and_terms)}
"""

    sqls["docid_dense"] = """
SELECT (row_number() OVER (ORDER BY source, doc_id) - 1)::BIGINT AS new_id,
       doc_id AS orig_id
FROM documents
"""

    sqls["positional_index"] = f"""
WITH tok AS (
  SELECT doc_id, {_TOK_SQL} AS tokens FROM documents
),
posed AS (
  SELECT doc_id, tokens[i + 1] AS term, i AS pos
  FROM tok, (SELECT unnest(range(10000)) AS i)
  WHERE i < len(tokens)
)
SELECT term, doc_id, count(*)::BIGINT AS tf,
       string_agg(pos::VARCHAR, ',' ORDER BY pos) AS positions
FROM posed WHERE term IN ('vector', 'merge')
GROUP BY term, doc_id
"""
    return sqls
