#!/usr/bin/env python3
"""spark-submit entrypoint: alias registry management — the ES aliases
API analog (indexing/aliases.py; atomic rename-overwrite writes, so a
`set` onto a live name is the zero-downtime swap action).

    python jobs/alias.py --registry aliases.json set prod /idx/v2
    python jobs/alias.py --registry aliases.json set prod-user /idx/v2 \\
        --filter "role = 'user'"
    python jobs/alias.py --registry aliases.json remove old
    python jobs/alias.py --registry aliases.json list

Then serve through it: jobs/search.py --index alias:prod --aliases
aliases.json (a filtered alias needs --attrs, like --filter).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--registry", default="aliases.json")
    ap.add_argument("action", choices=["set", "remove", "list"])
    ap.add_argument("name", nargs="?")
    ap.add_argument("index", nargs="?")
    ap.add_argument("--filter", default=None,
                    help="make it a filtered alias (Spark∩DuckDB SQL "
                         "predicate over the attrs table)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from searchengine_spark.indexing.aliases import (
        alias_list,
        alias_remove,
        alias_set,
    )

    spark = (SparkSession.builder.appName("searchengine_spark.alias")
             .master("local[1]").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    if args.action == "list":
        print(json.dumps(alias_list(spark, args.registry), indent=1))
        return
    if not args.name:
        raise SystemExit(f"{args.action} needs NAME")
    if args.action == "remove":
        try:
            alias_remove(spark, args.registry, args.name)
        except KeyError as e:
            raise SystemExit(str(e))
        print(json.dumps({"removed": args.name}))
        return
    if not args.index:
        raise SystemExit("set needs NAME INDEX_PATH")
    alias_set(spark, args.registry, args.name, args.index, args.filter)
    out = {"alias": args.name, "index": args.index}
    if args.filter:
        out["filter"] = args.filter
    print(json.dumps(out))


if __name__ == "__main__":
    main()
