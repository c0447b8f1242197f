"""Decay-function scoring — the ES ``function_score`` decay family
(``gauss`` / ``exp`` / ``linear``): rescale relevance by how far a
numeric document attribute sits from an ``origin`` ("prefer recent",
"prefer nearby", "prefer cheap" — recency-boosted search is THE
canonical use).

ES decay contract (reproduced exactly; gated in tests/test_decay.py):

    d(doc)  = max(0, |value - origin| - offset)
    gauss   = exp(-d^2 / (2*sigma^2)),  sigma^2 = -scale^2 / (2*ln(decay))
    exp     = exp(ln(decay)/scale * d)
    linear  = max(0, (s - d) / s),      s = scale / (1 - decay)

i.e. a doc exactly ``scale`` away from ``origin`` (past ``offset``)
scores ``decay`` (default 0.5) under every function; inside ``offset``
the function is 1; ``linear`` hits exact zero past ``s`` while
``gauss``/``exp`` only approach it. A doc MISSING the attribute (NULL,
or absent from the attrs table — LEFT join) gets decay 1.0 — the ES
missing-field contract for decay functions.

``boost_mode`` (how the function output combines with the query score):
``multiply`` (ES default), ``sum``, ``replace``. The matched set is the
score-all surface — function_score rescales EVERY match, so a WAND
top-k-by-relevance cut would be wrong whenever the decay reorders
(the same argument as sort/collapse/dis_max).

Cross-engine note (the repo's exact-arithmetic discipline): ``linear``
is rational arithmetic — identical in any IEEE engine, so the DuckDB
oracle runs it verbatim. ``gauss``/``exp`` go through libm ``exp()``,
whose last-ulp behavior is implementation-defined; they are gated by a
same-formula Python brute (rank-identical + 1e-12 relative) rather
than claimed bit-reproducible across engines.

No reference counterpart (the reference ranks by relevance only);
semantics follow the ES function_score decay contract.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..indexing.packed import PackedIndex
from ..tokenizer import TokenizerConfig

FUNCTIONS = ("gauss", "exp", "linear")
BOOST_MODES = ("multiply", "sum", "replace")


def decay_expr(fn: str, value, origin: float, scale: float,
               decay: float = 0.5, offset: float = 0.0):
    """The ES decay Column for ``value`` (NULL -> 1.0). Parameters are
    validated by :func:`_check_params` first."""
    d = F.greatest(
        F.lit(0.0), F.abs(value.cast("double") - F.lit(float(origin)))
        - F.lit(float(offset)))
    if fn == "gauss":
        sigma2 = -(scale * scale) / (2.0 * math.log(decay))
        out = F.exp(-(d * d) / F.lit(2.0 * sigma2))
    elif fn == "exp":
        lam = math.log(decay) / scale
        out = F.exp(F.lit(lam) * d)
    else:  # linear
        s = scale / (1.0 - decay)
        out = F.greatest(F.lit(0.0), (F.lit(s) - d) / F.lit(s))
    return F.when(value.isNull(), F.lit(1.0)).otherwise(out)


def _check_params(fn: str, scale: float, decay: float, offset: float,
                  boost_mode: str) -> None:
    if fn not in FUNCTIONS:
        raise ValueError(f"fn must be one of {FUNCTIONS}, got {fn!r}")
    if boost_mode not in BOOST_MODES:
        raise ValueError(
            f"boost_mode must be one of {BOOST_MODES}, got {boost_mode!r}")
    if not scale > 0:
        raise ValueError(f"scale must be > 0, got {scale}")
    if not 0.0 < decay < 1.0:
        raise ValueError(
            f"decay must be in (0, 1) exclusive, got {decay} (1 would "
            "divide by zero under linear, 0 has no finite sigma)")
    if offset < 0:
        raise ValueError(f"offset must be >= 0, got {offset}")


#: ES field_value_factor modifiers. Cross-engine classes: none/square/
#: reciprocal are rational and sqrt is IEEE-correctly-rounded (all four
#: oracle-safe); the log family rides libm (pytest-gated, like gauss).
#: saturation / sigmoid2 are the ES rank_feature query's scoring
#: functions grafted onto the same seam (rank_feature IS
#: function-score-by-a-feature-field): saturation(x) = x/(x+pivot),
#: sigmoid2(x) = x²/(x²+pivot²) — the exponent-2 member of ES's
#: sigmoid(x, pivot, exp) whose arithmetic stays rational (a general
#: exp rides libm pow and is refused, the temperature-alpha precedent).
#: Both ORACLE-SAFE: one division of exactly-computed doubles is
#: correctly rounded on every engine. The pivot rides the ``factor``
#: slot (FIELD:saturation:PIVOT).
FVF_MODIFIERS = ("none", "log", "log1p", "log2p", "ln", "ln1p", "ln2p",
                 "square", "sqrt", "reciprocal", "saturation", "sigmoid2")


def fvf_expr(modifier: str, value, factor: float = 1.0):
    """The ES field_value_factor Column: modifier(factor * value).
    Where the math is undefined (log/sqrt of a negative, reciprocal of
    zero) Spark yields NULL and the caller's ``missing`` fallback
    applies — a documented deviation from ES (which fails the whole
    query); total beats fatal for a batch engine."""
    x = value.cast("double") * F.lit(float(factor))
    if modifier == "none":
        return x
    if modifier == "log":
        return F.log10(x)
    if modifier == "log1p":
        return F.log10(x + F.lit(1.0))
    if modifier == "log2p":
        return F.log10(x + F.lit(2.0))
    if modifier == "ln":
        return F.log(x)
    if modifier == "ln1p":
        return F.log(x + F.lit(1.0))
    if modifier == "ln2p":
        return F.log(x + F.lit(2.0))
    if modifier == "square":
        return x * x
    if modifier == "sqrt":
        return F.sqrt(x)
    if modifier == "reciprocal":
        return F.when(x != 0.0, F.lit(1.0) / x)
    v = value.cast("double")  # rank_feature: pivot = the factor slot
    if modifier == "saturation":
        return F.when(v + F.lit(float(factor)) != 0.0,
                      v / (v + F.lit(float(factor))))
    if modifier == "sigmoid2":
        piv2 = F.lit(float(factor) * float(factor))
        return F.when(v * v + piv2 != 0.0, v * v / (v * v + piv2))
    raise ValueError(
        f"modifier must be one of {FVF_MODIFIERS}, got {modifier!r}")


def field_value_factor_packed(
    pidx: PackedIndex,
    queries: Sequence[str],
    cfg: TokenizerConfig,
    attrs: DataFrame | None,
    field: str,
    factor: float = 1.0,
    modifier: str = "none",
    missing: float = 1.0,
    boost_mode: str = "multiply",
    k: int = 10,
    conjunctive: bool = False,
    round_dp: int | None = None,
    exclude_terms: dict | None = None,
) -> DataFrame:
    """ES ``field_value_factor`` (the third function_score member):
    score = boost_mode(BM25, modifier(factor * doc[field])) over the
    FULL matched set; docs with no value — NULL, absent from the attrs
    table, or an undefined modifier result — use ``missing`` (the ES
    option of the same name). Output (query_id, doc_id, *ext_cols,
    value, score, rank), rounding on the combined score. ``attrs=None``
    serves ``field`` from the index's doc_attrs sidecar
    (indexing/attrs.py): zero-exchange broadcast chunk join, docmap
    resolve after the cut — bit-identical to the lakehouse join (gated
    in tests/test_decay.py)."""
    if modifier not in FVF_MODIFIERS:
        raise ValueError(
            f"modifier must be one of {FVF_MODIFIERS}, got {modifier!r}")
    if boost_mode not in BOOST_MODES:
        raise ValueError(
            f"boost_mode must be one of {BOOST_MODES}, got {boost_mode!r}")
    fvf = F.coalesce(
        fvf_expr(modifier, F.col("value"), factor),
        F.lit(float(missing)))
    return _function_score(
        pidx, queries, cfg, attrs, field, fvf, boost_mode, k,
        conjunctive, round_dp, exclude_terms)


def _function_score(
    pidx: PackedIndex,
    queries: Sequence[str],
    cfg: TokenizerConfig,
    attrs: DataFrame | None,
    field: str,
    fn_col,
    boost_mode: str,
    k: int,
    conjunctive: bool,
    round_dp: int | None,
    exclude_terms: dict | None,
) -> DataFrame:
    """Shared function_score plan: score-all surface, attach the field
    value as "value" (lakehouse attrs join, or the zero-exchange
    doc_attrs sidecar when ``attrs is None``), combine via ``fn_col``
    (a Column over "value"/"score"), rank by the combined rounded
    score with doc_id tiebreak; the sidecar path resolves external ids
    on the CUT rows only (k per query, AQE-broadcast) instead of the
    whole matched set."""
    ext_cols = [c for c in pidx.manifest["order_cols"] if c != "doc_id"]
    if attrs is not None:
        lacks = [c for c in ext_cols + [field] if c not in attrs.columns]
        if lacks:
            raise ValueError(f"attrs table lacks columns {lacks}")

    from .wand import bm25_scores_packed_batch

    scores = bm25_scores_packed_batch(
        pidx, list(queries), cfg, conjunctive=conjunctive,
        exclude_terms=exclude_terms)
    if boost_mode == "multiply":
        combined = F.col("score") * fn_col
    elif boost_mode == "sum":
        combined = F.col("score") + fn_col
    else:
        combined = fn_col
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc())
    if attrs is None:
        from ..indexing.attrs import attach_attr

        out = attach_attr(pidx, scores, field, alias="value").withColumn(
            "score", combined)
        if round_dp is not None:
            out = out.withColumn("score", F.round("score", round_dp))
        cut = (
            out.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
        )
        return cut.join(pidx.docmap, "doc_id").select(
            "query_id", "doc_id", *ext_cols, "value", "score", "rank")
    resolved = scores.join(pidx.docmap, "doc_id").select(
        "query_id", "doc_id", *ext_cols, "score")
    joined = resolved.join(
        attrs.select(*ext_cols, F.col(field).alias("value")),
        ext_cols, "left")
    out = joined.withColumn("score", combined)
    if round_dp is not None:
        out = out.withColumn("score", F.round("score", round_dp))
    return (
        out.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", *ext_cols, "value", "score", "rank")
    )


#: 2^48 — 12 md5 nibbles of randomness; exact in a double (48 < 53)
_RAND_SPACE = float(1 << 48)


def random_score_packed(
    pidx: PackedIndex,
    queries: Sequence[str],
    cfg: TokenizerConfig,
    seed: str = "",
    boost_mode: str = "replace",
    k: int = 10,
    conjunctive: bool = False,
    round_dp: int | None = None,
    exclude_terms: dict | None = None,
) -> DataFrame:
    """ES ``random_score`` (function_score's sampler): a DETERMINISTIC
    pseudo-random value in [0, 1) per (seed, document) — the first 12
    md5 nibbles of ``seed|external_id`` over 2^48 (exact in a double;
    the repo's md5 integer discipline, textops/dataset.py), so the same
    seed reproduces the same ordering on any engine and any cluster
    size, and a doc's value never changes as the corpus grows (the ES
    seed+field contract — our field is the external id). boost_mode
    ``replace`` (the useful one — 'show me a random sample of matches':
    score IS the random value), ``multiply``/``sum`` jitter relevance.
    Matched set is score-all; output (query_id, doc_id, *ext_cols,
    score, rank)."""
    if boost_mode not in BOOST_MODES:
        raise ValueError(
            f"boost_mode must be one of {BOOST_MODES}, got {boost_mode!r}")
    ext_cols = [c for c in pidx.manifest["order_cols"] if c != "doc_id"]

    from .wand import bm25_scores_packed_batch

    scores = bm25_scores_packed_batch(
        pidx, list(queries), cfg, conjunctive=conjunctive,
        exclude_terms=exclude_terms)
    resolved = scores.join(pidx.docmap, "doc_id").select(
        "query_id", "doc_id", *ext_cols, "score")
    key = F.concat_ws(
        "|", F.lit(str(seed)), *[F.col(c).cast("string") for c in ext_cols])
    rnd = (
        F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("long")
        / F.lit(_RAND_SPACE)
    )
    if boost_mode == "multiply":
        combined = F.col("score") * rnd
    elif boost_mode == "sum":
        combined = F.col("score") + rnd
    else:
        combined = rnd
    out = resolved.withColumn("score", combined)
    if round_dp is not None:
        out = out.withColumn("score", F.round("score", round_dp))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc())
    return (
        out.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", *ext_cols, "score", "rank")
    )


def decay_score_packed(
    pidx: PackedIndex,
    queries: Sequence[str],
    cfg: TokenizerConfig,
    attrs: DataFrame | None,
    field: str,
    origin: float,
    scale: float,
    decay: float = 0.5,
    offset: float = 0.0,
    fn: str = "gauss",
    boost_mode: str = "multiply",
    k: int = 10,
    conjunctive: bool = False,
    round_dp: int | None = None,
    exclude_terms: dict | None = None,
) -> DataFrame:
    """Top-k per query -> (query_id, doc_id, *ext_cols, value, score,
    rank) where score = boost_mode(BM25, decay(value)) over the FULL
    matched set. ``attrs`` is the attribute table keyed by the index's
    external ids, carrying ``field`` — or ``None`` to serve ``field``
    from the index's doc_attrs sidecar (indexing/attrs.py; zero
    exchange on the attrs side, docmap resolve after the cut,
    bit-identical — gated in tests/test_decay.py); rounding applies to
    the combined score (the rounded-ranking contract)."""
    _check_params(fn, float(scale), float(decay), float(offset), boost_mode)
    dec = decay_expr(fn, F.col("value"), float(origin), float(scale),
                     float(decay), float(offset))
    return _function_score(
        pidx, queries, cfg, attrs, field, dec, boost_mode, k,
        conjunctive, round_dp, exclude_terms)
