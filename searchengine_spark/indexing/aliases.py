"""Index aliases — the ES aliases API analog: a tiny named-pointer
registry (`aliases.json`) in front of index directories, with the two
properties that make ES aliases load-bearing in production:

- **atomic swap**: `alias_set` rewrites the whole registry through
  fsio.write_text's FileContext rename-OVERWRITE (the manifest-commit
  machinery — CLAUDE.md forbids simplifying it to delete+rename), so a
  reader either sees the old target or the new one, never a missing or
  torn registry. Zero-downtime reindex = build the new index dir, point
  the alias at it, GC the old one later.
- **filtered aliases**: an alias may carry a predicate (the
  Spark∩DuckDB SQL dialect the --filter/filters-agg family uses);
  serving through the alias composes it into attribute-filtered
  retrieval (filter_doc_ids -> doc_filter, applied BEFORE the top-k
  heap) — ES's filtered-alias "view of an index" semantics.

Registry format (one JSON object): {"aliases": {name: {"index": path
[, "filter": pred]}}}. Names are resolved at open time; a dangling
alias fails loudly at load_packed_index, not silently at query time.
No reference counterpart; semantics follow the Elasticsearch aliases
API (add/remove/swap actions, filtered aliases).

**Single-writer assumption** (a documented deviation from ES, whose
alias actions are atomic server-side): `alias_set`/`alias_remove` are
a read-modify-write of the WHOLE registry. Each individual write is
atomic for readers (rename-overwrite), but two CONCURRENT writers —
e.g. two reindex jobs swapping different aliases — race on the
read-modify-write and one update can be lost. Serialize registry
mutations through one process (the jobs/alias.py CLI invoked from a
single orchestration point); readers need no coordination.
"""

from __future__ import annotations

import json
from typing import Optional

from pyspark.sql import SparkSession

from . import fsio

ALIAS_PREFIX = "alias:"


def _load(spark: SparkSession, registry: str) -> dict:
    if not fsio.exists(spark, registry):
        return {"aliases": {}}
    data = json.loads(fsio.read_text(spark, registry))
    if not isinstance(data.get("aliases"), dict):
        raise ValueError(f"{registry}: malformed alias registry")
    return data


def alias_list(spark: SparkSession, registry: str) -> dict:
    """{name: {"index": path [, "filter": pred]}}."""
    return _load(spark, registry)["aliases"]


def alias_set(
    spark: SparkSession,
    registry: str,
    name: str,
    index_path: str,
    filter_pred: Optional[str] = None,
) -> None:
    """Point ``name`` at ``index_path`` (creating or ATOMICALLY
    re-pointing it — the swap action). ``filter_pred`` makes it a
    filtered alias."""
    if not name or name.startswith(ALIAS_PREFIX):
        raise ValueError(f"bad alias name {name!r}")
    data = _load(spark, registry)
    entry: dict = {"index": index_path}
    if filter_pred:
        entry["filter"] = filter_pred
    data["aliases"][name] = entry
    fsio.write_text(spark, registry, json.dumps(data, indent=1))


def alias_remove(spark: SparkSession, registry: str, name: str) -> None:
    data = _load(spark, registry)
    if name not in data["aliases"]:
        raise KeyError(f"alias {name!r} not in {registry}")
    del data["aliases"][name]
    fsio.write_text(spark, registry, json.dumps(data, indent=1))


def alias_resolve(
    spark: SparkSession, registry: str, name: str
) -> "tuple[str, Optional[str]]":
    """-> (index_path, filter_pred | None); KeyError when absent."""
    aliases = _load(spark, registry)["aliases"]
    if name not in aliases:
        raise KeyError(
            f"alias {name!r} not in {registry} "
            f"(known: {sorted(aliases) or 'none'})")
    e = aliases[name]
    return e["index"], e.get("filter")


def split_alias_arg(index_arg: str) -> "tuple[str, bool]":
    """'alias:NAME' -> (NAME, True); plain path -> (path, False)."""
    if index_arg.startswith(ALIAS_PREFIX):
        return index_arg[len(ALIAS_PREFIX):], True
    return index_arg, False
