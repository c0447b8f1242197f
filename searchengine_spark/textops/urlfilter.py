"""URL / domain filtering — the web-pipeline gate every pretraining
corpus passes through before any text-level cleaning (C4 drops pages by
bad-word URLs, RefinedWeb/FineWeb start from domain blocklists and URL
rules): parse each document's URL natively, then keep/drop by scheme,
registered domain, and URL substrings.

Parsing (all native ``regexp_extract``/``regexp_replace`` — codegen,
zero UDFs, row-local so the operator is embarrassingly parallel at any
scale; patterns restricted to the Java∩RE2 syntax the PII scrubber
pinned, so the DuckDB oracle runs them verbatim):

- ``scheme``: the ``xxx://`` prefix, lowercased; missing -> NULL.
- ``host``: authority up to the first ``/?#``, port stripped,
  lowercased.
- ``registered_domain``: the last two host labels — or the last THREE
  when the last two are a two-level public suffix (``co.uk``-class;
  the vendored list covers the common registries, a deliberate
  approximation of the full PSL documented here, not hidden — a full
  PSL is a data file swap, not a code change).

Filter semantics (fixed precedence, first reason wins — the
``c4_doc_filter`` reason pattern):

1. ``scheme`` not in ``allow_schemes`` (or unparseable URL) ->
   ``bad_scheme``;
2. ``registered_domain`` (or the exact host) in ``blocked_domains`` ->
   ``blocked_domain`` — blocking a registered domain blocks every
   subdomain, the RefinedWeb rule;
3. any of ``blocked_substrings`` inside the lowercased URL ->
   ``blocked_substring`` (the C4 bad-words-in-URL rule);
4. otherwise keep.

No reference counterpart (the reference never sees URLs); composes
with textops/pipeline.py ahead of every text-level stage.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: common two-level public suffixes (the deliberate mini-PSL — swap in
#: the full list as data when a deployment needs exactness)
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "com.tr", "co.in", "co.kr", "co.za", "com.ar", "com.sg", "co.nz",
)

_SCHEME_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_HOST_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
_REG2_RE = "[^.]+\\.[^.]+$"
_REG3_RE = "[^.]+\\.[^.]+\\.[^.]+$"


def url_parts(url: Column):
    """-> (scheme, host, registered_domain) Columns, lowercased; empty
    extractions become NULL (unparseable URLs carry no parts)."""
    lower = F.lower(url)
    scheme = F.nullif(F.regexp_extract(lower, _SCHEME_RE, 1), F.lit(""))
    raw_host = F.nullif(F.regexp_extract(lower, _HOST_RE, 1), F.lit(""))
    host = F.regexp_replace(raw_host, ":[0-9]+$", "")
    reg2 = F.nullif(F.regexp_extract(host, _REG2_RE, 0), F.lit(""))
    reg3 = F.nullif(F.regexp_extract(host, _REG3_RE, 0), F.lit(""))
    reg = (
        F.when(reg2.isNull(), host)  # single-label host IS its domain
        .when(reg2.isin(*TWO_LEVEL_SUFFIXES) & reg3.isNotNull(), reg3)
        .otherwise(reg2)
    )
    return scheme, host, reg


def url_reason_expr(
    url: Column,
    blocked_domains: Sequence[str] = (),
    blocked_substrings: Sequence[str] = (),
    allow_schemes: Sequence[str] = ("http", "https"),
) -> Column:
    """The drop REASON for a URL column (NULL = keep) — the row-local
    Column form of the gate, for inlining straight into a pipeline
    ``where`` with zero exchange (textops/pipeline.py composes it as
    stage 0)."""
    if not allow_schemes:
        raise ValueError("allow_schemes must name at least one scheme")
    bd = [d.lower() for d in blocked_domains]
    bs = [s.lower() for s in blocked_substrings]
    scheme, host, reg = url_parts(url)
    bad_scheme = scheme.isNull() | ~scheme.isin(
        *[s.lower() for s in allow_schemes])
    bad_domain = (
        (reg.isin(*bd) | host.isin(*bd)) if bd else F.lit(False))
    lower_url = F.lower(url)
    from functools import reduce as _reduce

    bad_sub = _reduce(
        lambda a, b: a | b,
        [lower_url.contains(s) for s in bs],
        F.lit(False),
    )
    return (
        F.when(bad_scheme, F.lit("bad_scheme"))
        .when(bad_domain, F.lit("blocked_domain"))
        .when(bad_sub, F.lit("blocked_substring"))
    )


def url_filter(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    blocked_domains: Sequence[str] = (),
    blocked_substrings: Sequence[str] = (),
    allow_schemes: Sequence[str] = ("http", "https"),
) -> DataFrame:
    """-> (id, scheme, host, registered_domain, keep, reason): the URL
    gate, one row per input doc (keep=false rows carry the FIRST failing
    reason — fixed precedence: bad_scheme > blocked_domain >
    blocked_substring). Entirely row-local native expressions — no
    exchange, no UDF; the blocklists ride the plan as literals (real
    deployments broadcast-join a blocklist table; the literal form is
    the bounded-config case)."""
    for c in (url_col, id_col):
        if c not in docs.columns:
            raise ValueError(f"frame lacks column {c!r}")
    scheme, host, reg = url_parts(F.col(url_col))
    reason = url_reason_expr(
        F.col(url_col), blocked_domains, blocked_substrings, allow_schemes)
    return docs.select(
        F.col(id_col),
        scheme.alias("scheme"),
        host.alias("host"),
        reg.alias("registered_domain"),
        reason.isNull().alias("keep"),
        reason.alias("reason"),
    )
