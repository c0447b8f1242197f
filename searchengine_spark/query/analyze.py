"""The ES ``_analyze`` endpoint analog: show exactly how text flows
through the index's tokenize chain — the debugging surface every search
engine grows ("why doesn't this doc match?" starts with "what tokens
did it index?").

Per token: ``token`` (the INDEXED form — lowercased, min-length- and
stop-word-filtered, stemmed when the config stems), ``position`` (index
in the FILTERED token sequence — exactly the position the positional
payload stores and the phrase/minspan engines match on; NOTE this
differs from ES, whose stop-word filter leaves position GAPS — our
positional-index semantics are the contract here, documented not
accidental), and ``start_offset``/``end_offset`` (character span into
the source text, from the offset-preserving tokenizer the snippet
engine uses — query/snippet.py tokenize_with_spans, gated
token-identical to tokenize_text).

Two surfaces: ``analyze_text`` (one string, driver-side — the REPL/CLI
``--analyze`` path) and ``analyze_table`` (a corpus column, one
shuffle-free Arrow mapInPandas pass — "explain my whole corpus's
tokenization" for index debugging at scale).

No reference counterpart as an API (the reference's tokenizer is
internal-only); the tokenize chain itself is the reference's
(SURVEY.md §2.6 parity contract).
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..tokenizer import TokenizerConfig


def analyze_text(text: str, cfg: TokenizerConfig) -> List[dict]:
    """-> [{token, position, start_offset, end_offset}, ...] for one
    string. Token sequence == ``tokenize_text(text, cfg)`` exactly
    (the spans tokenizer is gated token-identical); offsets index into
    the source string."""
    from .snippet import tokenize_with_spans

    spans, _src = tokenize_with_spans(text, cfg)
    return [
        {"token": t, "position": i, "start_offset": s, "end_offset": e}
        for i, (t, s, e) in enumerate(spans)
    ]


def analyze_table(
    df: DataFrame,
    cfg: TokenizerConfig,
    text_col: str = "text",
    id_cols: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """-> (*id_cols, position, token, start_offset, end_offset): one row
    per indexed token of every document — a zero-exchange Arrow
    mapInPandas over the pruned (id, text) projection (the stemmer memo
    is per-batch, the snippets_table pattern). Documents yielding no
    tokens emit nothing."""
    import pandas as pd

    from .snippet import tokenize_with_spans

    ids = list(id_cols)
    missing = [c for c in ids + [text_col] if c not in df.columns]
    if missing:
        raise ValueError(f"frame lacks columns {missing}")
    src = df.select(*ids, text_col)
    id_fields = [src.schema[c] for c in ids]
    out_schema = T.StructType(
        id_fields
        + [
            T.StructField("position", T.IntegerType(), False),
            T.StructField("token", T.StringType(), False),
            T.StructField("start_offset", T.IntegerType(), False),
            T.StructField("end_offset", T.IntegerType(), False),
        ]
    )

    def run(batches):
        for pdf in batches:
            memo: dict = {}
            rows = {c: [] for c in ids}
            pos, tok, so, eo = [], [], [], []
            texts = pdf[text_col].tolist()
            idvals = [pdf[c].tolist() for c in ids]
            for r, text in enumerate(texts):
                spans, _ = tokenize_with_spans(text, cfg, _memo=memo)
                for i, (t, s, e) in enumerate(spans):
                    for c, vals in zip(ids, idvals):
                        rows[c].append(vals[r])
                    pos.append(i)
                    tok.append(t)
                    so.append(s)
                    eo.append(e)
            yield pd.DataFrame(
                {**rows, "position": pos, "token": tok,
                 "start_offset": so, "end_offset": eo}
            )

    return src.mapInPandas(run, out_schema)
