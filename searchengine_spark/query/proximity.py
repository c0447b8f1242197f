"""Positional proximity-boost rankers: BM25_OPTIMIZED / TF_IDF_OPTIMIZED.

Reference: src/models/rankers/bm25_positional.py:26-103 and
td_idf_positional.py:31-130. Semantics reproduced exactly, including the
quirks (SURVEY.md Q6):

- pair iteration runs over the FULL query token list (duplicates included,
  equal terms skipped) with 1-based indices, and the pair "query distance"
  is (i+j+1) - i — one more than the actual positional gap
  (bm25_positional.py:66-71 passes j+i+1);
- per (p1) the best-scoring p2 is taken with a 0 floor (max_score starts at
  0), distances beyond max_distance=10 are skipped, backward matches are
  damped by 0.8; c = log10(15);
- doc boost = log10(sum) if sum > 0 else 0;
- BM25 variant: score += 0.01 * boost / log2((dl_norm-min)/(max-min)+1);
  the reference raises ZeroDivisionError when a boosted doc has the
  corpus-min dl_norm (bm25_positional.py:100-101, §2.6.9 reproduced bug) —
  we instead SKIP the boost for such docs (documented deviation);
- TF-IDF variant: score += 0.1 * boost, no normalization
  (td_idf_positional.py:127-128).

Execution shape: the exact BM25/TF-IDF base score is the usual broadcast
join + agg; the boost needs token positions per (query, doc), which is
genuinely pairwise-imperative -> applyInPandas per query_id over the
matched positional postings (parallel across queries). At 10^12-doc scale
you boost only the base-score top-N candidates (rerank pattern): pass
``rerank_n`` and the O(|q|^2 * positions^2) boost loop runs over at most N
docs per query (selected by base score, doc_id tie-break); docs outside
the cut keep their base score and still compete for the final top-k.
``rerank_n=None`` (default) boosts every matched doc — exact reference
semantics; ``rerank_n >= #matched`` is provably identical to it.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..indexing.build import Bm25Params, IndexTables
from ..tokenizer import TokenizerConfig, tokenize_text
from .tfidf import _uniform_tf_py, validate_schema

MAX_DISTANCE = 10
C = math.log10(MAX_DISTANCE * 1.5)

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.IntegerType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("rank", T.IntegerType(), False),
    ]
)


def _compute_distance(i: int, positions1: List[int], j2: int, positions2: List[int]) -> float:
    """bm25_positional.py:33-50, verbatim semantics."""
    score = 0.0
    query_distance = j2 - i
    for p1 in positions1:
        max_score = 0.0
        for p2 in positions2:
            pd_ = p2 - p1
            if abs(pd_) > MAX_DISTANCE:
                continue
            signal = -1 if pd_ < 0 else 1
            distance = signal * (query_distance - pd_)
            if distance >= 0:
                aux = -math.log10(distance + 1) + C
            else:
                aux = (math.log10(-distance + 1) + C) * 0.8
            if aux > max_score:
                max_score = aux
        score += max_score
    return score


def _calculate_boost(query: List[str], positions: Dict[str, List[int]]) -> float:
    """bm25_positional.py:53-76: full-list pair loop, 1-based, j2=i+j+1."""
    score = 0.0
    for i, term1 in enumerate(query, start=1):
        p1 = positions.get(term1, [])
        for j, term2 in enumerate(query[i:], start=1):
            if term1 == term2:
                continue
            p2 = positions.get(term2, [])
            score += _compute_distance(i, p1, j + i + 1, p2)
    return math.log10(score) if score > 0 else 0.0


def _query_ltc(
    query_tokens: Dict[int, List[str]],
    idf_map: Dict[str, float],
    schema: str,
) -> Dict[int, Dict[str, float]]:
    """Query-side ltc weights over PRESENT terms (td_idf_positional.py:
    97-110): slot-4 tf variant x stored 3dp idf, slot-6 normalization."""
    qltc: Dict[int, Dict[str, float]] = {}
    for qid, toks in query_tokens.items():
        ltc = {
            t: _uniform_tf_py(toks.count(t), schema[4]) * idf_map[t]
            for t in dict.fromkeys(toks)
            if t in idf_map
        }
        if schema[6] == "c":
            norm = math.sqrt(sum(v * v for v in ltc.values()))
            ltc = {t: v / norm for t, v in ltc.items()} if norm else ltc
        elif schema[6] == "n":
            ltc = {t: 1.0 for t in ltc}
        qltc[qid] = ltc
    return qltc


def _rerank_candidates(scores: Dict[int, float], rerank_n: int | None) -> List[int]:
    """Docs eligible for the positional boost: all of them (rerank_n=None),
    else the top-N by base score (doc_id tie-break — deterministic)."""
    if rerank_n is None or len(scores) <= rerank_n:
        return list(scores)
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:rerank_n]
    return [d for d, _ in top]


def _scorer(
    query_tokens: Dict[int, List[str]],
    mode: str,
    params: Bm25Params,
    dl_min: float,
    dl_max: float,
    qltc: Dict[int, Dict[str, float]],
    k_top: int,
    round_dp: int | None = None,
    rerank_n: int | None = None,
):
    """``round_dp``: rank by the rounded score (doc_id tie-break) — the
    cross-engine-stable ordering the DuckDB oracle entries use.
    ``rerank_n``: boost only the base-score top-N docs (module docstring)."""
    kk, bb = float(params.k), float(params.b)

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        qtoks = query_tokens[qid]
        uniq = list(dict.fromkeys(qtoks))
        positions_by_doc: Dict[int, Dict[str, List[int]]] = {}
        scores: Dict[int, float] = {}
        dln: Dict[int, float] = {}
        for row in pdf.itertuples(index=False):
            doc = int(row.doc_id)
            positions_by_doc.setdefault(doc, {})[row.term] = list(row.positions)
            dln[doc] = float(row.dl_norm)
            freq = len(row.positions)
            if mode == "bm25":
                sat = (freq * (kk + 1)) / (freq + kk * (1 - bb + bb * row.dl_norm))
                scores[doc] = scores.get(doc, 0.0) + float(row.idf) * sat
            else:  # tf-idf lnc.ltc base
                scores[doc] = scores.get(doc, 0.0) + float(row.w) * qltc[qid][row.term]
        cand = [] if mode == "tfidf_plain" else _rerank_candidates(scores, rerank_n)
        span = dl_max - dl_min
        for doc in cand:
            boost = _calculate_boost(qtoks, positions_by_doc[doc])
            if boost > 0:
                if mode == "bm25":
                    if span == 0:
                        # degenerate corpus (every dl_norm equal): the
                        # reference divides 0/0 here — skip the boost,
                        # same convention as the norm==0 site below
                        continue
                    denom_x = (dln[doc] - dl_min) / span + 1
                    norm = math.log2(denom_x)
                    if norm == 0:
                        # reference raises ZeroDivisionError here
                        # (bm25_positional.py:100-101); we skip the boost
                        continue
                    scores[doc] += 0.01 * boost / norm
                else:
                    scores[doc] += 0.1 * boost
        if round_dp is not None:
            scores = {d: round(s, round_dp) for d, s in scores.items()}
        out = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k_top]
        return pd.DataFrame(
            {
                "query_id": qid,
                "doc_id": [d for d, _ in out],
                "score": [s for _, s in out],
                "rank": range(1, len(out) + 1),
            }
        )

    return score_group


def proximity_topk_packed_batch(
    pidx,
    queries: Sequence[str],
    cfg: TokenizerConfig,
    k: int = 10,
    params: Bm25Params | None = None,
    mode: str = "bm25",
    schema: str = "lnc.ltc",
    round_dp: int | None = None,
    rerank_n: int | None = None,
    idf_override: Dict[str, float] | None = None,
    dl_bounds: tuple | None = None,
) -> DataFrame:
    """BM25_OPTIMIZED / TF_IDF_OPTIMIZED serving from the PACKED positional
    index — all four reference rankers now serve from the on-disk index
    (reference src/searcher.py:67).

    ``idf_override`` / ``dl_bounds``: the federated-serving seams
    (query/federated.py) — pin the query-side idf map and the boost
    normalization's (dl_min, dl_max) to federation-global values instead
    of this shard's own stored statistics.

    mode="bm25": same broadcast-join plan as WAND, positions decoded inside
    the per-query scorer.

    mode="tfidf": needs a build with ``tfidf_sidecar=True`` — matched
    chunks are decoded (vectorized mapInPandas) to (term, doc, tf,
    positions) candidate rows, joined with the tiny per-doc lnc-norm
    sidecar, and the stored-3dp weight contract w = round((1+ln tf)/nrm, 3)
    is evaluated with the SAME Spark expression the exact path uses
    (bit-identical scores). The norms join is over the bounded candidate
    set — the rerank pattern; at extreme scale you'd bucket doc_norms by
    doc_id so the join co-locates."""
    from ..indexing.packed import PackedIndex  # noqa: F401 (type only)

    if not pidx.manifest.get("positional"):
        raise ValueError("packed index was not built with positional=True")
    params = params or pidx.params
    if dl_bounds is not None:
        dl_min, dl_max = float(dl_bounds[0]), float(dl_bounds[1])
    else:
        dl_min = float(pidx.manifest["dl_norm_min"])
        dl_max = float(pidx.manifest["dl_norm_max"])
    spark = pidx.spark

    query_tokens = {qid: tokenize_text(q, cfg) for qid, q in enumerate(queries)}
    rows = [(qid, t) for qid, toks in query_tokens.items() for t in dict.fromkeys(toks)]
    qdf = spark.createDataFrame(rows or [(0, "")], "query_id int, term string")
    if not rows:
        qdf = qdf.limit(0)
    all_terms = sorted({t for _, t in rows})
    pruned = pidx.index.filter(F.col("term").isin(all_terms)) if all_terms else pidx.index
    # join-free (same shape as wand.py): idf collected once into the scorer
    # closure, term -> query_ids fan-out as a literal map projection
    if idf_override is not None:
        idf_map = idf_override
    else:
        stats = pidx.term_stats.select("term", "idf")
        if all_terms:
            stats = stats.filter(F.col("term").isin(all_terms))
        idf_map = {r["term"]: float(r["idf"]) for r in stats.collect()}
    qids_by_term: Dict[str, List[int]] = {}
    for qid, t in rows:
        qids_by_term.setdefault(t, []).append(qid)
    map_entries = [
        x
        for t, qs in qids_by_term.items()
        if t in idf_map
        for x in (F.lit(t), F.array(*[F.lit(q) for q in qs]))
    ]
    if not map_entries:
        return spark.createDataFrame([], _OUT_SCHEMA)
    matched = pruned.withColumn(
        "query_id", F.explode(F.create_map(*map_entries)[F.col("term")])
    )

    if mode == "tfidf":
        return _tfidf_packed(
            pidx, matched, query_tokens, qdf, schema, k, params,
            round_dp=round_dp, rerank_n=rerank_n, idf_override=idf_override,
        )

    mask = pidx.delete_mask()
    dec, dec_pos = mask.wrap_decoders() if mask is not None else (None, None)
    score_group = packed_prox_scorer(
        query_tokens, idf_map, params, dl_min, dl_max, k, round_dp, rerank_n,
        decode=dec, decode_pos=dec_pos,
    )
    return matched.groupBy("query_id").applyInPandas(score_group, schema=_OUT_SCHEMA)


def packed_prox_scorer(
    query_tokens: Dict[int, List[str]],
    idf_map: Dict[str, float],
    params: Bm25Params,
    dl_min: float,
    dl_max: float,
    k: int,
    round_dp: int | None = None,
    rerank_n: int | None = None,
    decode=None,
    decode_pos=None,
):
    """BM25_OPTIMIZED scorer over PACKED rows (query_id, term, postings,
    positions) — pandas-in/pandas-out so the distributed path
    (applyInPandas) and the in-process :class:`~..query.serve.LocalSearcher`
    run the identical code.

    Two passes: base scores accumulate VECTORIZED (np.bincount adds in the
    same concatenation order as the old per-posting loop — bit-identical
    doubles), then positions are decoded and per-doc dicts built ONLY for
    the boost candidates (all docs at rerank_n=None, reference semantics).
    ``decode``/``decode_pos``: optional memoizing hooks for a long-lived
    serving tier (LocalSearcher)."""
    kk, bb = float(params.k), float(params.b)

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from ..indexing.codec import decode_positions, decode_postings

        dec = decode or (lambda buf: decode_postings(bytes(buf)))
        dec_pos = decode_pos or (
            lambda buf, tfs: decode_positions(bytes(buf), tfs)
        )
        qid = int(pdf["query_id"].iloc[0])
        qtoks = query_tokens[qid]
        rows = []
        docs_all: list = []
        contribs_all: list = []
        for row in pdf.itertuples(index=False):
            doc_ids, tfs, dl_norm = dec(row.postings)
            sat = (tfs * (kk + 1)) / (tfs + kk * (1 - bb + bb * dl_norm))
            contribs_all.append(idf_map[row.term] * sat)
            docs_all.append(doc_ids)
            rows.append((row.term, doc_ids, tfs, dl_norm, row.positions))
        if not rows:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype="int64"),
                    "doc_id": pd.Series([], dtype="int64"),
                    "score": pd.Series([], dtype="float64"),
                    "rank": pd.Series([], dtype="int64"),
                }
            )
        docs = np.concatenate(docs_all)
        contribs = np.concatenate(contribs_all)
        uniq, inv = np.unique(docs, return_inverse=True)
        base = np.bincount(inv, weights=contribs, minlength=len(uniq))
        scores: Dict[int, float] = dict(zip(uniq.tolist(), base.tolist()))

        cand = _rerank_candidates(scores, rerank_n)
        cand_arr = np.sort(np.asarray(cand, dtype=np.int64))
        positions_by_doc: Dict[int, Dict[str, List[int]]] = {}
        dln: Dict[int, float] = {}
        from .wand import _member_mask

        for term, doc_ids, tfs, dl_norm, posbuf in rows:
            if not len(cand_arr):
                break
            m = np.flatnonzero(_member_mask(doc_ids, cand_arr))
            if not len(m):
                continue
            flat, occ_starts = dec_pos(posbuf, tfs)
            ends = np.append(occ_starts[1:], len(flat))
            for j in m:
                d = int(doc_ids[j])
                dln[d] = float(dl_norm[j])
                positions_by_doc.setdefault(d, {})[term] = flat[
                    occ_starts[j] : ends[j]
                ].tolist()
        span = dl_max - dl_min
        for doc in cand:
            boost = _calculate_boost(qtoks, positions_by_doc[doc])
            if boost > 0:
                if span == 0:
                    continue  # degenerate corpus: reference divides 0/0
                denom_x = (dln[doc] - dl_min) / span + 1
                norm = math.log2(denom_x)
                if norm == 0:
                    continue  # reference's ZeroDivisionError site — skip boost
                scores[doc] += 0.01 * boost / norm
        if round_dp is not None:
            scores = {d: round(s, round_dp) for d, s in scores.items()}
        out = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return pd.DataFrame(
            {
                "query_id": qid,
                "doc_id": [d for d, _ in out],
                "score": [s for _, s in out],
                "rank": list(range(1, len(out) + 1)),
            }
        )

    return score_group


_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.IntegerType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tf", T.LongType(), False),
        T.StructField("w", T.DoubleType(), False),  # tfidf payload only
        T.StructField("positions", T.ArrayType(T.LongType()), False),
    ]
)


def _tfidf_packed(pidx, matched, query_tokens, qdf, schema, k, params,
                  boost: bool = True, round_dp: int | None = None,
                  rerank_n: int | None = None,
                  idf_override: Dict[str, float] | None = None):
    """TF_IDF(_OPTIMIZED) over the packed index.

    payload='tfidf' builds (the reference's 'doc:freq/w' format): weights
    decode straight out of the postings — joinless, no sidecar needed
    (plain ranking only; no positions in that payload).

    freq-payload builds: decode matched chunks -> derive the stored-3dp
    weights under any SMART doc-side schema (cosine norms join the
    doc_norms sidecar column for the schema's tf letter; 'n'/'b' norms
    are joinless) [-> positional boost].

    ``idf_override``: {term: 3dp idf} used INSTEAD of this index's stored
    term_stats for the query-side ltc — the federation seam
    (query/federated.py ships the federation-global idf so each shard's
    query vector matches what a merged index would compute). Doc-side
    weights never depend on corpus stats, so this is the ONLY statistic a
    federated TF-IDF serving has to pin."""
    validate_schema(schema)
    embedded_w = pidx.manifest.get("payload", "freq") == "tfidf"
    nrm_col = None
    if embedded_w:
        baked = pidx.manifest.get("tfidf_doc_schema", "lnc")
        if schema[:3] != baked:
            raise ValueError(
                f"this tfidf-payload index baked doc-side schema {baked!r} "
                f"into the postings; schema {schema[:3]!r} needs a "
                "freq+sidecar build or the exact-path API"
            )
        if boost:
            raise ValueError(
                "tfidf payload stores no positions — TF_IDF_OPTIMIZED needs "
                "a positional=True, tfidf_sidecar=True build"
            )
    elif schema[2] == "c":
        if pidx.doc_norms is None:
            raise ValueError("index was not built with tfidf_sidecar=True")
        nrm_col = {"l": "nrm", "b": "nrm_b", "n": "nrm_n"}[schema[0]]
        if nrm_col not in pidx.doc_norms.columns:
            raise ValueError(
                f"doc_norms sidecar predates multi-letter norms (has only "
                f"the lnc column); doc-side schema {schema[:3]!r} needs a "
                "rebuilt sidecar"
            )

    mask = pidx.delete_mask()

    def decode_rows(batches):
        import numpy as np

        from ..indexing.codec import decode_positions, decode_postings

        for pdf in batches:
            outs = []
            for row in pdf.itertuples(index=False):
                doc_ids, tfs, third = decode_postings(bytes(row.postings))
                keep = mask.keep_mask(doc_ids) if mask is not None else None
                if keep is not None:
                    doc_ids, third = doc_ids[keep], third[keep]
                if row.positions is not None:
                    # decode with the ORIGINAL tfs (the stream's slicing
                    # contract), then drop tombstoned postings' groups
                    flat, occ_starts = decode_positions(bytes(row.positions), tfs)
                    ends = np.append(occ_starts[1:], len(flat))
                    poss = [
                        flat[s:e].tolist() for s, e in zip(occ_starts, ends)
                    ]
                    if keep is not None:
                        poss = [p for p, kp in zip(poss, keep) if kp]
                else:  # non-positional build (plain TF-IDF ranking)
                    poss = [[] for _ in range(len(doc_ids))]
                if keep is not None:
                    tfs = tfs[keep]
                outs.append(
                    pd.DataFrame(
                        {
                            "query_id": row.query_id,
                            "term": row.term,
                            "doc_id": doc_ids,
                            "tf": tfs,
                            # tfidf payload: slot 3 IS the stored-3dp weight
                            "w": third if embedded_w else np.zeros(len(doc_ids)),
                            "positions": poss,
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    decoded = matched.select(
        "query_id", "term", "postings", "positions"
    ).mapInPandas(decode_rows, schema=_DECODED_SCHEMA)
    if embedded_w:
        # 'doc:freq/w' payload: weights came out of the postings — joinless
        joined = decoded.select(
            "query_id", "term", "doc_id", "positions", "w",
            F.lit(0.0).alias("dl_norm"),
        )
    else:
        # the SAME Spark expressions as tfidf_weights -> bit-identical
        # stored-3dp weights between packed and exact paths
        from .tfidf import _uniform_tf_col

        wr = _uniform_tf_col(F.col("tf"), schema[0])
        if nrm_col is not None:  # cosine norm: join the sidecar column
            w_raw = wr / F.col(nrm_col)
            src = decoded.join(pidx.doc_norms.select("doc_id", nrm_col), "doc_id")
        else:  # 'n': uniform_weight maps all to 1; 'b': identity — joinless
            w_raw = F.lit(1.0) if schema[2] == "n" else wr
            src = decoded
        joined = src.select(
            "query_id",
            "term",
            "doc_id",
            "positions",
            F.bround(w_raw, 3).alias("w"),  # banker's: tfidf.tfidf_weights twin
            F.lit(0.0).alias("dl_norm"),
        )

    # query-side ltc over PRESENT terms, stored 3dp idf (exact-path twin)
    if idf_override is not None:
        idf_map = idf_override
    else:
        idf_map = {
            r["term"]: r["idf"]
            for r in pidx.term_stats.join(
                F.broadcast(qdf.select("term").distinct()), "term"
            ).collect()
        }
    qltc = _query_ltc(query_tokens, idf_map, schema)

    scorer = _scorer(
        query_tokens, "tfidf" if boost else "tfidf_plain", params, 0.0, 1.0,
        qltc, k, round_dp, rerank_n,
    )
    return joined.groupBy("query_id").applyInPandas(scorer, schema=_OUT_SCHEMA)


def tfidf_topk_packed_batch(
    pidx,
    queries: Sequence[str],
    cfg: TokenizerConfig,
    k: int = 10,
    schema: str = "lnc.ltc",
    params: Bm25Params | None = None,
    round_dp: int | None = None,
    idf_override: Dict[str, float] | None = None,
) -> DataFrame:
    """Plain TF_IDF ranking from the packed index (no positional boost; a
    non-positional ``tfidf_sidecar=True`` build suffices). Same stored-3dp
    weight contract as the exact path (tfidf.py). ``idf_override``: see
    :func:`_tfidf_packed` — the federated-serving seam."""
    params = params or pidx.params
    spark = pidx.spark
    query_tokens = {qid: tokenize_text(q, cfg) for qid, q in enumerate(queries)}
    rows = [(qid, t) for qid, toks in query_tokens.items() for t in dict.fromkeys(toks)]
    qdf = spark.createDataFrame(rows or [(0, "")], "query_id int, term string")
    if not rows:
        qdf = qdf.limit(0)
    all_terms = sorted({t for _, t in rows})
    pruned = pidx.index.filter(F.col("term").isin(all_terms)) if all_terms else pidx.index
    matched = pruned.join(F.broadcast(qdf), "term")
    return _tfidf_packed(
        pidx, matched, query_tokens, qdf, schema, k, params, boost=False,
        round_dp=round_dp, idf_override=idf_override,
    )


def proximity_topk_batch(
    it: IndexTables,
    queries: Sequence[str],
    cfg: TokenizerConfig,
    k: int = 10,
    mode: str = "bm25",
    params: Bm25Params = Bm25Params(),
    schema: str = "lnc.ltc",
    round_dp: int | None = None,
    rerank_n: int | None = None,
) -> DataFrame:
    """Top-k with proximity boost over a POSITIONAL index
    (build_index(..., positional=True)) -> (query_id, doc_id, score, rank)."""
    if "positions" not in it.index.columns:
        raise ValueError("proximity ranking needs a positional index")
    spark = it.index.sparkSession

    query_tokens = {qid: tokenize_text(q, cfg) for qid, q in enumerate(queries)}
    rows = [(qid, t) for qid, toks in query_tokens.items() for t in dict.fromkeys(toks)]
    qdf = spark.createDataFrame(rows or [(0, "")], "query_id int, term string")
    if not rows:
        qdf = qdf.limit(0)

    # corpus dl_norm range (reference reads it from the footer map,
    # bm25_positional.py:82-84)
    r = it.doc_lengths.agg(F.min("dl_norm"), F.max("dl_norm")).collect()[0]
    dl_min, dl_max = float(r[0]), float(r[1])

    matched = it.index.join(F.broadcast(qdf), "term").join(
        F.broadcast(it.term_stats.select("term", "idf")), "term"
    )
    qltc: Dict[int, Dict[str, float]] = {}
    if mode == "tfidf":
        validate_schema(schema)
        from .tfidf import tfidf_weights

        # rename-join: w shares lineage with it.index -> avoid self-join
        # attribute ambiguity
        w = tfidf_weights(it, schema).select(
            F.col("term").alias("_wt"), F.col("doc_id").alias("_wd"), "w"
        )
        matched = matched.join(
            w, (matched["term"] == w["_wt"]) & (matched["doc_id"] == w["_wd"])
        ).drop("_wt", "_wd")
        # query-side ltc over PRESENT terms (td_idf_positional.py:97-110)
        idf_map = {
            row["term"]: row["idf"]
            for row in it.term_stats.join(
                F.broadcast(qdf.select("term").distinct()), "term"
            ).collect()
        }
        qltc = _query_ltc(query_tokens, idf_map, schema)
    else:
        matched = matched.withColumn("w", F.lit(0.0))
    dln = it.doc_lengths.select(
        F.col("doc_id").alias("_did"), F.col("dl_norm")
    )
    matched = matched.join(dln, matched["doc_id"] == dln["_did"]).drop("_did")

    scorer = _scorer(query_tokens, mode, params, dl_min, dl_max, qltc, k,
                     round_dp, rerank_n)
    return matched.groupBy("query_id").applyInPandas(scorer, schema=_OUT_SCHEMA)
