"""Exact-phrase retrieval over the positional index.

The reference stores token positions (PositionalPostingList,
src/models/posting_lists/positional_posting_list.py:50-51) but only uses
them for the proximity-boost rankers — it never exposes phrase queries.
This module adds the classic capability those positions enable (MRS
Ch. 2.4 positional postings): a document matches the phrase t0 t1 ... tn-1
iff some start position p has t_i at position p+i for every slot i.

Positions are indexes into the FILTERED token stream (stop words removed,
stemming applied — build.py stores `posexplode(tokens)` of the tokenizer
output), so "adjacent" means adjacent after tokenization; the query phrase
goes through the same tokenizer, which keeps the two sides consistent.

Execution shape (scale-first, all-native aggregation):

    slots (query_id, slot, term)  [broadcast — a phrase is tiny]
      join index on term          [pushed In(term,...) scan pruning]
      -> (query_id, doc_id, start = pos - slot, slot)
      groupBy(query_id, doc_id, start): countDistinct(slot) == n_slots
      groupBy(query_id, doc_id): n_occurrences, first_pos
      per-query rank window (k rows per query)

Two shuffles, both keyed on (query_id, doc_id[, start]) — partial
aggregation is map-side combinable and the explode is bounded by the
postings of the phrase terms only. The packed path decodes matched chunks
with one vectorized mapInPandas (numpy repeat/subtract — no per-row
Python) and feeds the identical aggregation. Every output column is an
integer -> cross-engine hash-stable with no rounding policy needed.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..indexing.build import IndexTables
from ..tokenizer import TokenizerConfig, tokenize_text

_HIT_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.IntegerType(), False),
        T.StructField("slot", T.IntegerType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("start", T.LongType(), False),
    ]
)

_OUT_COLS = ("query_id", "doc_id", "n_occurrences", "first_pos", "rank")


def phrase_slots(
    phrases: Sequence[str], cfg: TokenizerConfig
) -> Dict[int, List[str]]:
    """query_id -> ordered slot terms (duplicates kept — each slot must
    match at its own offset)."""
    return {qid: tokenize_text(p, cfg) for qid, p in enumerate(phrases)}


def _slot_df(spark, slots: Dict[int, List[str]]):
    rows = [
        (qid, i, t) for qid, toks in slots.items() for i, t in enumerate(toks)
    ]
    sdf = spark.createDataFrame(
        rows or [(0, 0, "")], "query_id int, slot int, term string"
    )
    return (sdf if rows else sdf.limit(0)), rows


def _rank_occurrences(hits: DataFrame, slots: Dict[int, List[str]], k: int | None):
    """(query_id, slot, doc_id, start) hit rows -> ranked per-doc phrase
    occurrences. Shared tail of the exact and packed paths."""
    n_map = F.create_map(
        *[
            x
            for qid, toks in slots.items()
            for x in (F.lit(qid), F.lit(len(toks)))
        ]
    )
    # hit rows are UNIQUE per (query_id, doc_id, start, slot): a slot is one
    # term, and a term's positions are unique within a doc — so a plain
    # count equals countDistinct(slot) here and saves the distinct's extra
    # exchange (plan-gated at 3 shuffles in test_plan_shapes.py)
    starts = hits.groupBy("query_id", "doc_id", "start").agg(
        F.count(F.lit(1)).alias("ns")
    )
    occ = starts.filter(F.col("ns") == n_map[F.col("query_id")])
    per_doc = occ.groupBy("query_id", "doc_id").agg(
        F.count("*").alias("n_occurrences"),
        F.min("start").alias("first_pos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_occurrences"), F.asc("doc_id")
    )
    ranked = per_doc.withColumn("rank", F.row_number().over(w).cast("long"))
    if k is not None:
        ranked = ranked.filter(F.col("rank") <= k)
    return ranked.select(*_OUT_COLS)


def phrase_topk_batch(
    it: IndexTables,
    phrases: Sequence[str],
    cfg: TokenizerConfig,
    k: int | None = 10,
) -> DataFrame:
    """Exact-path phrase retrieval over a positional ``build_index(...,
    positional=True)`` -> (query_id, doc_id, n_occurrences, first_pos,
    rank), top-k per query by occurrence count (doc_id tie-break).
    ``k=None`` returns every matching doc."""
    if "positions" not in it.index.columns:
        raise ValueError("phrase retrieval needs a positional index")
    spark = it.index.sparkSession
    slots = phrase_slots(phrases, cfg)
    sdf, rows = _slot_df(spark, slots)
    matched = it.index.join(F.broadcast(sdf), "term")
    hits = matched.select(
        "query_id", "slot", "doc_id", F.explode("positions").alias("pos")
    ).select(
        "query_id",
        "slot",
        "doc_id",
        (F.col("pos").cast("long") - F.col("slot")).alias("start"),
    )
    return _rank_occurrences(hits, slots, k)


def phrase_topk_packed_batch(
    pidx,
    phrases: Sequence[str],
    cfg: TokenizerConfig | None = None,
    k: int | None = 10,
) -> DataFrame:
    """Packed-path phrase retrieval: pruned chunk scan for the phrase terms
    -> vectorized decode to hit rows -> the same native aggregation as the
    exact path (gated identical in tests/test_phrase.py)."""
    if not pidx.manifest.get("positional"):
        raise ValueError("packed index was not built with positional=True")
    spark = pidx.spark
    cfg = cfg or TokenizerConfig.from_manifest(pidx.manifest.get("tokenizer", {}))
    slots = phrase_slots(phrases, cfg)
    sdf, rows = _slot_df(spark, slots)
    all_terms = sorted({t for _, _, t in rows})
    pruned = (
        pidx.index.filter(F.col("term").isin(all_terms))
        if all_terms
        else pidx.index.limit(0)
    )
    matched = pruned.join(F.broadcast(sdf), "term").select(
        "query_id", "slot", "postings", "positions"
    )

    def decode_hits(batches):
        import numpy as np

        from ..indexing.codec import decode_positions, decode_postings

        for pdf in batches:
            outs = []
            for row in pdf.itertuples(index=False):
                doc_ids, tfs, _ = decode_postings(bytes(row.postings))
                flat, _occ = decode_positions(bytes(row.positions), tfs)
                outs.append(
                    pd.DataFrame(
                        {
                            "query_id": row.query_id,
                            "slot": row.slot,
                            "doc_id": np.repeat(doc_ids, tfs),
                            "start": flat.astype("int64") - int(row.slot),
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    hits = matched.mapInPandas(decode_hits, schema=_HIT_SCHEMA)
    return _rank_occurrences(hits, slots, k)


def local_phrase(searcher, phrase: str, k: int | None = 10,
                 resolve: bool = True) -> List[dict]:
    """In-process phrase query off a :class:`~.serve.LocalSearcher` —
    zero Spark jobs when the term slices are cached. Same semantics as the
    distributed paths (gated identical); numpy key-intersection:
    key = doc_id * STRIDE + start, one sorted intersect per slot.

    The int64 key packs (doc_id, start); STRIDE bounds positions, which is
    safe because dl (and so any position) is bounded by the longest
    document — checked against the manifest at call time."""
    import numpy as np

    if not searcher._positional:
        raise ValueError("packed index was not built with positional=True")
    toks = tokenize_text(phrase, searcher.cfg)
    if not toks:
        return []
    searcher._ensure_terms(list(dict.fromkeys(toks)))
    stride = np.int64(1) << np.int64(32)

    keys: "np.ndarray | None" = None
    for slot, term in enumerate(toks):
        sl = searcher._slices.get(term)
        if sl is None or not len(sl):
            return []
        slot_keys = []
        for row in sl.itertuples(index=False):
            doc_ids, tfs, _ = searcher._decode_cached(row.postings)
            flat, _occ = searcher._decode_pos_cached(row.positions, tfs)
            start = flat.astype(np.int64) - slot
            ok = start >= 0
            if start.size and int(flat.max()) >= (1 << 32):
                raise ValueError("position exceeds the local key stride")
            slot_keys.append(
                np.repeat(doc_ids.astype(np.int64), tfs)[ok] * stride + start[ok]
            )
        merged = np.concatenate(slot_keys) if slot_keys else np.empty(0, np.int64)
        keys = (
            np.sort(merged)
            if keys is None
            else np.intersect1d(keys, merged, assume_unique=True)
        )
        if not len(keys):
            return []

    docs = keys // stride
    starts = keys % stride
    uniq, first_idx, counts = np.unique(docs, return_index=True, return_counts=True)
    order = np.lexsort((uniq, -counts))
    if k is not None:
        order = order[:k]
    out = pd.DataFrame(
        {
            "query_id": 0,
            "doc_id": uniq[order],
            "score": counts[order].astype(float),
            "rank": np.arange(1, len(order) + 1),
        }
    )
    rows = searcher._resolve(out, resolve)
    for r, oi in zip(rows, order):
        r["n_occurrences"] = int(counts[oi])
        r["first_pos"] = int(starts[first_idx[oi]])
        r.pop("score", None)
    return rows
