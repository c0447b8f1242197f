"""ES ``highlight`` analog — query-term emphasis tags in the hit text.

The reference prints bare ranked ids; highlighting is the ES surface
(task-spec extension axis) every search UI actually renders. This is the
``number_of_fragments: 0`` mode — the WHOLE field returned with every
occurrence of any query term wrapped in ``pre``/``post`` tags
(``<em>``/``</em>``, the ES defaults). Fragment selection is deliberately
not duplicated here: ``query/snippet.py`` already picks the best display
window (the minimal-cover primitive); compose them if a bounded fragment
is wanted.

Semantics follow ES's unified highlighter, not a raw regex: matching
happens on ANALYZED tokens — the offset-preserving tokenize chain
(``snippet.tokenize_with_spans``, gated char-identical to
``tokenize_text``) yields (post-chain token, char offsets), and a token
is highlighted when it equals a post-chain QUERY term. Stemming
therefore works ("running" highlights for the query "run" on a stemmed
index), stop words never highlight, and sub-word occurrences never match
("rock" stays dark inside "rocks" on an unstemmed chain). Tags are
inserted at the token's ORIGINAL character offsets, so the emitted text
is the source text plus tags, case and punctuation intact.

Oracle note (driver contract): on text whose words are plain
``[A-Za-z0-9]`` runs separated by spaces/ASCII punctuation — the
synthetic testdata, asserted clean in TESTDATA.md terms — the analyzed
highlight is exactly a word-boundary regex replace, so the DuckDB oracle
runs ``regexp_replace(text, '(?i)\\b(t1|t2)\\b', '<em>\\0</em>', 'g')``
verbatim (RE2 and Java agree on ASCII ``\\b``; the leftmost-first
alternation both engines use picks the same word because the trailing
``\\b`` rejects prefixes of longer words). The equivalence is
property-gated in tests; text with underscores or intra-word unicode
would diverge (the ORACLE's limitation, not the operator's — '_' is
punctuation to the tokenizer but a word char to ``\\b``).

Plan shape: highlighting runs AFTER retrieval over the top-k hit rows
only — one bounded join (hits x text column), one Arrow ``mapInPandas``
pass, no shuffle, corpus size never appears.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..tokenizer import TokenizerConfig, tokenize_text
from .snippet import tokenize_with_spans


def highlight_text(
    text: str,
    terms: Sequence[str],
    cfg: TokenizerConfig,
    pre: str = "<em>",
    post: str = "</em>",
    _memo: Optional[dict] = None,
) -> Tuple[Optional[str], int]:
    """-> (highlighted text, n matched tokens); (None, 0) when no
    analyzed token equals a query term. Spans from the offset-preserving
    tokenizer are disjoint and ascending by construction, so the rebuild
    is a single left-to-right pass."""
    kept, src = tokenize_with_spans(text, cfg, _memo=_memo)
    tset = set(terms)
    spans = [(s, e) for t, s, e in kept if t in tset]
    if not spans:
        return None, 0
    parts: List[str] = []
    prev = 0
    for s, e in spans:
        parts.append(src[prev:s])
        parts.append(pre)
        parts.append(src[s:e])
        parts.append(post)
        prev = e
    parts.append(src[prev:])
    return "".join(parts), len(spans)


_HL_FIELDS = [
    T.StructField("n_matches", T.LongType(), False),
    T.StructField("highlighted", T.StringType(), False),
]


def highlight_results(
    hits: DataFrame,
    docs: DataFrame,
    queries: Sequence[str],
    cfg: TokenizerConfig,
    text_col: str = "text",
    join_cols: Sequence[str] = ("doc_id",),
    pre: str = "<em>",
    post: str = "</em>",
) -> DataFrame:
    """Per-hit whole-field highlight -> (query_id, *join_cols, rank,
    n_matches, highlighted). ``hits`` is any ranked frame carrying
    (query_id, *join_cols, rank) — feed it the top-k result, not the
    corpus; ``docs`` carries *join_cols + the text column. A hit whose
    text matches no query term emits nothing (cannot arise from OR
    retrieval over the same chain; can from filter/boolean compositions
    — ES returns an empty highlight block there, we omit the row)."""
    qterms: Dict[int, List[str]] = {
        qid: list(dict.fromkeys(tokenize_text(q, cfg)))
        for qid, q in enumerate(queries)
    }
    jc = list(join_cols)
    joined = hits.select("query_id", *jc, "rank").join(
        docs.select(*jc, text_col), jc
    )
    id_fields = [joined.schema["query_id"]] + [joined.schema[c] for c in jc]
    id_fields.append(joined.schema["rank"])
    out_schema = T.StructType(id_fields + _HL_FIELDS)
    id_cols = ["query_id", *jc, "rank"]

    def run(batches):
        memo: dict = {}
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                terms = qterms.get(int(getattr(row, "query_id")), [])
                hl, n = highlight_text(
                    getattr(row, text_col), terms, cfg,
                    pre=pre, post=post, _memo=memo,
                )
                if hl is None:
                    continue
                recs.append(
                    tuple(getattr(row, c) for c in id_cols) + (n, hl)
                )
            if recs:
                yield pd.DataFrame(
                    recs, columns=id_cols + ["n_matches", "highlighted"]
                )

    return joined.mapInPandas(run, schema=out_schema)
