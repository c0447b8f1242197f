"""Snippet extraction: map a minimal-window span back to display text.

The index stores positions in the FILTERED token stream (stop words
removed, stemming applied), which is right for matching but not for
display. This module re-tokenizes source text with character offsets
preserved, runs the same minimal-cover merge as query/spans.py, and
returns the best raw-text window for the hit — the classic search-result
snippet.

Offset fidelity: the tokenizer's punctuation->space translate is
length-preserving (single char -> single space), so token spans computed
on the translated+lowered string map 1:1 onto the original text whenever
``len(text.lower()) == len(text)`` (true for ASCII and almost all
Unicode; the rare length-changing lowercase falls back to slicing the
lowered string — still a faithful, if lowercased, snippet).

Scale shape: ``snippets_table`` is an Arrow-batched mapInPandas over a
docs DataFrame — pure per-row text work, no shuffle. The intended
pipeline is topk -> semi-join the source table on the result doc ids ->
snippets over that bounded set, not a full-corpus pass (though a full
pass is just the same operator over more rows).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..tokenizer import (
    _PUNCT_TO_SPACE,
    _TOKEN_RE,
    _make_stemmer,
    TokenizerConfig,
    tokenize_text,
)
from .spans import min_span


def tokenize_with_spans(
    text: str, cfg: TokenizerConfig, _memo: Optional[dict] = None
) -> Tuple[List[Tuple[str, int, int]], str]:
    """-> ([(filtered_token, char_start, char_end), ...], display_source).

    The token sequence equals ``tokenize_text(text, cfg)`` exactly (gated
    in tests); spans index into the returned display string (the original
    text when offsets align, else the lowered translation). NULL text
    (permitted by the corpus schema, guarded the same way in
    tokenize_pandas_udf) yields no tokens instead of crashing."""
    if text is None:
        return [], ""
    lowered = text.translate(_PUNCT_TO_SPACE).lower()
    src = text if len(lowered) == len(text) else lowered
    stemmer = _make_stemmer(cfg.stem_lang) if cfg.stem_lang is not None else None
    memo = _memo if _memo is not None else {}
    out: List[Tuple[str, int, int]] = []
    min_len = cfg.min_token_length
    sw = cfg.stop_words
    for m in _TOKEN_RE.finditer(lowered):
        t = m.group(0)
        if min_len is not None and len(t) < min_len:
            continue
        if sw is not None and t in sw:
            continue
        if stemmer is not None:
            s = memo.get(t)
            if s is None:
                s = stemmer.stem(t)
                memo[t] = s
            t = s
        out.append((t, m.start(), m.end()))
    return out, src


def extract_snippet(
    text: str,
    query: str,
    cfg: TokenizerConfig,
    max_chars: int = 240,
    pad_tokens: int = 3,
    _memo: Optional[dict] = None,
    _terms: Optional[List[str]] = None,
) -> Optional[dict]:
    """Best display window for ``query`` in ``text`` (None when the text
    does not contain every query term): the minimal all-terms span widened
    by ``pad_tokens`` context tokens on each side, trimmed back toward the
    core while it exceeds ``max_chars``."""
    kept, src = tokenize_with_spans(text, cfg, _memo=_memo)
    terms = (
        list(dict.fromkeys(tokenize_text(query, cfg)))
        if _terms is None
        else _terms
    )
    if not terms or not kept:
        return None
    by_term: Dict[str, List[int]] = {}
    for i, (t, _, _) in enumerate(kept):
        by_term.setdefault(t, []).append(i)
    lists = [by_term.get(t, []) for t in terms]
    span = min_span(lists)
    if span is None:
        return None
    lo, hi = span
    wlo, whi = max(0, lo - pad_tokens), min(len(kept) - 1, hi + pad_tokens)
    # trim the padding (never the core) while over budget
    while whi - wlo > hi - lo and kept[whi][2] - kept[wlo][1] > max_chars:
        if wlo < lo:
            wlo += 1
        elif whi > hi:
            whi -= 1
    s, e = kept[wlo][1], kept[whi][2]
    return {
        "snippet": src[s:e],
        "span_len": hi - lo + 1,
        "lo": lo,
        "hi": hi,
        "char_start": s,
        "char_end": e,
    }


_SNIPPET_FIELDS = [
    T.StructField("span_len", T.LongType(), False),
    T.StructField("lo", T.LongType(), False),
    T.StructField("hi", T.LongType(), False),
    T.StructField("snippet", T.StringType(), False),
]


def snippets_table(
    docs: DataFrame,
    query: str,
    cfg: TokenizerConfig,
    text_col: str = "text",
    id_cols: Sequence[str] = ("doc_id",),
    max_chars: int = 240,
    pad_tokens: int = 3,
) -> DataFrame:
    """-> (*id_cols, span_len, lo, hi, snippet) for every input doc whose
    text contains all query terms. Arrow-batched mapInPandas, no shuffle;
    feed it the (small) semi-joined result set, not the raw corpus, when
    serving (module docstring)."""
    id_fields = [docs.schema[c] for c in id_cols]
    out_schema = T.StructType(id_fields + _SNIPPET_FIELDS)
    cols = list(id_cols) + [text_col]

    def run(batches):
        memo: dict = {}
        # the constant query tokenizes ONCE per task, not once per row —
        # with nltk present, per-row stemmer construction dominates
        terms = list(dict.fromkeys(tokenize_text(query, cfg)))
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                sn = extract_snippet(
                    getattr(row, text_col), query, cfg,
                    max_chars=max_chars, pad_tokens=pad_tokens, _memo=memo,
                    _terms=terms,
                )
                if sn is None:
                    continue
                recs.append(
                    tuple(getattr(row, c) for c in id_cols)
                    + (sn["span_len"], sn["lo"], sn["hi"], sn["snippet"])
                )
            if recs:
                yield pd.DataFrame(
                    recs, columns=list(id_cols) + ["span_len", "lo", "hi", "snippet"]
                )

    return docs.select(*cols).mapInPandas(run, schema=out_schema)
