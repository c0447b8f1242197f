"""TSV(.gz) document source with reference-Parser parity (S1).

Reference: src/models/parser.py:36-51 — csv.DictReader over a gzipped TSV,
yielding (row[doc_id_column], ' '.join of the selected columns in FILE
HEADER ORDER, skipping None values).

Spark mapping: spark.read.csv handles .gz transparently (per-file split at
scale — gzip is unsplittable, so many files beat one big file; documented
for the 100 TB case). Options are tuned for csv.DictReader parity:

- nullValue '\\u0000': Spark's default turns empty strings into null, but
  DictReader yields '' — keep empty strings as '' (they join like the
  reference, producing the same double-space artifacts);
- escape '"': RFC4180 doubled-quote escaping like the csv module;
- multiLine: quoted embedded newlines parse like csv (costs input-split
  parallelism; disable for known newline-free corpora).

Empty fields: Spark CSV yields null where csv.DictReader yields '' — the
coalesce-to-'' in the select restores DictReader behavior (leading/
trailing-space artifacts in the joined text included). The one remaining
divergence is malformed SHORT rows (missing trailing fields), which the
reference skips from the join and we render as '' — empty fields are the
common case, short rows are broken input; parity test covers the former.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_tsv_docs(
    spark: SparkSession,
    path: str,
    doc_id_column: str,
    columns: Sequence[str],
    delimiter: str = "\t",
    multi_line: bool = True,
) -> DataFrame:
    """-> (ext_id string, text string) in file order of the selected columns."""
    df = (
        spark.read.option("header", True)
        .option("sep", delimiter)
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", multi_line)
        .option("nullValue", "\u0000")
        .csv(path)
    )
    missing = sorted(set(columns) - set(df.columns))
    if missing or doc_id_column not in df.columns:
        # a typo'd column list must fail loudly, not silently index an
        # empty-text corpus (the reference's DictReader KeyErrors here)
        raise ValueError(
            f"TSV header {df.columns} lacks requested columns "
            f"{missing + ([doc_id_column] if doc_id_column not in df.columns else [])}"
        )
    selected = [c for c in df.columns if c in set(columns)]  # header order
    return df.select(
        F.col(doc_id_column).alias("ext_id"),
        F.concat_ws(
            " ", *[F.coalesce(F.col(c), F.lit("")) for c in selected]
        ).alias("text"),
    )
