"""Percolator — the ES percolate query analog, search INVERTED: queries
are stored, documents arrive, and the engine answers "which stored
queries match this doc?" — the alerting / routing / saved-search
primitive (ES stores queries in a percolator index and runs incoming
docs against them).

Semantics (the stored-query surface this engine serves everywhere else,
inverted):

- a stored query is its unique positive terms through the QUERY tokenize
  chain (the same ``tokenize_text`` retrieval uses — multiplicity
  ignored, the engine-wide unique-terms quirk) plus optional ``-term``
  negations (ES must_not);
- a doc matches when it contains >= ``min_should_match`` of the query's
  positive terms (``m = None`` means ALL of them — the conjunctive
  default; ``m = 1`` is pure OR) and NONE of its negated terms —
  exactly the coverage + must_not contract ``--min-should-match`` /
  ``-term`` retrieval serves, so percolation agrees with retrieval:
  doc D percolates into query Q  <=>  D is in Q's unbounded result set;
- a stored query whose positive part normalizes to NOTHING (stop words /
  too short) is refused at registration — silently matching nothing (or
  everything) would be an alerting footgun.

Plan shape (the 100-TB question): the stored-query set is the SMALL side
by construction (saved searches, not documents) — its (query_id, term)
rows broadcast INTO the document stream; docs tokenize ONCE (the shared
``tokens_column`` chain), explode to distinct (doc, term) pairs, and one
partial-aggregable groupBy counts per-(doc, query) coverage. Negations
ride the same broadcast join as a groupBy-side max — no second pass, no
anti-join shuffle. Corpus size appears only linearly in the doc scan;
there is NO index here at all, so percolation runs on raw arriving
batches (foreachBatch in a stream — each doc's verdict is
batch-self-contained, state-free).

No reference counterpart (the reference serves forward search only);
semantics follow the Elasticsearch percolate query.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql import SparkSession

from ..tokenizer import TokenizerConfig, tokenize_text
from .negation import negated_terms, split_negations


@dataclass(frozen=True)
class StoredQuery:
    """One registered percolator query: normalized positive terms, the
    coverage floor, and normalized negated terms."""

    query_id: int
    terms: tuple
    m: int
    neg_terms: tuple

    @property
    def n_terms(self) -> int:
        return len(self.terms)


def register_queries(
    queries: Sequence[str],
    cfg: TokenizerConfig,
    min_should_match: Optional[int] = None,
) -> List[StoredQuery]:
    """Raw query strings (possibly carrying ``-term`` words) -> stored
    percolator queries. ``min_should_match=None`` (default) requires ALL
    positive terms (the conjunctive alerting default); an explicit value
    takes the FULL Lucene spec grammar (query/msm.py — integers,
    negatives, [-]percentages) resolved against each query's own term
    count, then clamped per query to that count (ES clamps too — a
    floor above the term count would silently never match).
    Registration REFUSES a query with no surviving positive terms."""
    from .msm import resolve_min_should_match

    out: List[StoredQuery] = []
    for qid, raw in enumerate(queries):
        pos, neg = split_negations(raw)
        terms = list(dict.fromkeys(tokenize_text(pos, cfg)))
        if not terms:
            raise ValueError(
                f"stored query {qid} ({raw!r}) has no positive terms after "
                "tokenization — a percolator query that can never (or "
                "always) match is refused at registration"
            )
        m = len(terms) if min_should_match is None else min(
            resolve_min_should_match(min_should_match, len(terms)),
            len(terms))
        out.append(StoredQuery(
            query_id=qid,
            terms=tuple(terms),
            m=m,
            neg_terms=tuple(negated_terms(neg, cfg)),
        ))
    return out


def percolate(
    docs: DataFrame,
    stored: Sequence[StoredQuery],
    cfg: TokenizerConfig,
    text_col: str = "text",
    id_cols: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """-> (*id_cols, query_id, n_matched): for each arriving doc, every
    stored query it percolates into — coverage >= the query's floor AND
    no negated-term hit. ``n_matched`` is the positive-term coverage
    count (the only per-match statistic ES percolation reports without a
    second scoring pass). Deterministic order (*id_cols, query_id).

    One tokenize pass, one broadcast join against the tiny stored-term
    table, ONE partial-aggregable groupBy — negation folds into the same
    aggregate (max over a role flag), never a second join."""
    if not stored:
        raise ValueError("stored must name at least one registered query")
    ids = list(id_cols)
    spark = docs.sparkSession
    # (query_id, term, is_neg) — positive and negated terms ride ONE
    # broadcast table; a term both positive and negated in the same query
    # is contradictory (can never match) and refused here rather than
    # silently never firing
    rows = []
    for sq in stored:
        overlap = set(sq.terms) & set(sq.neg_terms)
        if overlap:
            raise ValueError(
                f"stored query {sq.query_id} both requires and negates "
                f"{sorted(overlap)} — it can never match"
            )
        rows.extend((sq.query_id, t, False) for t in sq.terms)
        rows.extend((sq.query_id, t, True) for t in sq.neg_terms)
    qdf = spark.createDataFrame(
        rows, "query_id int, term string, is_neg boolean")
    floors = spark.createDataFrame(
        [(sq.query_id, sq.m) for sq in stored], "query_id int, m int")

    from ..tokenizer import tokens_column

    # tokens bound in their own select BEFORE the explode references them
    # (the CLAUDE.md bind-once rule for the interpreted-HOF chain)
    toks = docs.select(*ids, tokens_column(F.col(text_col), cfg).alias("_toks"))
    pairs = toks.select(
        *ids, F.explode(F.array_distinct("_toks")).alias("term"))
    hits = pairs.join(F.broadcast(qdf), "term")
    agg = hits.groupBy(*ids, "query_id").agg(
        F.sum(F.when(~F.col("is_neg"), 1).otherwise(0))
         .cast("long").alias("n_matched"),
        F.max(F.col("is_neg")).alias("_vetoed"),
    )
    out = (
        agg.join(F.broadcast(floors), "query_id")
        .filter((~F.col("_vetoed")) & (F.col("n_matched") >= F.col("m")))
        .select(*ids, "query_id", "n_matched")
    )
    return out.orderBy(*ids, "query_id")


def percolate_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    stored: Sequence[StoredQuery],
    cfg: TokenizerConfig,
    schema=None,
    text_col: str = "text",
    id_cols: Sequence[str] = ("doc_id",),
) -> None:
    """availableNow-run a parquet-directory stream of arriving docs
    through the percolator — the ALERTING deployment shape: new doc
    files land in ``input_dir``, each run matches only the unseen ones
    (Structured Streaming's file-source tracking via the checkpoint
    inside ``output_dir``) and appends their matches.

    Exactly-once without state: a doc's verdict is batch-self-contained
    (module docstring), so each micro-batch OVERWRITES its own
    ``batch_<id>`` subdir — a foreachBatch retry re-runs with the SAME
    batch_id (the Structured Streaming contract) and lands byte-identical
    in the same dir; re-runs with no new files are no-ops. Read results
    back with :func:`read_percolate_output`."""
    from ..indexing import fsio

    if schema is None:
        from ..fixtures.transcripts import TRANSCRIPTS_SCHEMA

        schema = TRANSCRIPTS_SCHEMA
    stream = spark.readStream.schema(schema).parquet(input_dir)

    def sink(batch: DataFrame, batch_id: int) -> None:
        out = percolate(batch, stored, cfg, text_col=text_col,
                        id_cols=id_cols)
        out.write.mode("overwrite").parquet(
            fsio.join(output_dir, f"batch_{int(batch_id)}"))

    (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", fsio.join(output_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_percolate_output(spark: SparkSession, output_dir: str) -> DataFrame:
    """Union of every committed percolation batch under ``output_dir``
    (one glob read — URI-capable like the rest of the layout)."""
    from ..indexing import fsio

    return spark.read.parquet(fsio.join(output_dir, "batch_*"))
