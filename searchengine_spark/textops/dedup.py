"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All portable-deterministic: hash primitives are md5 (identical across Spark,
DuckDB, Python), so every operator is oracle-checkable cross-engine, and
re-runs are reproducible cluster-to-cluster (no seed-dependent JVM hashing
in results).

Scale notes (100 TB):
- exact: one shuffle on a 128-bit key — trivially scalable.
- MinHash LSH: cost is (docs x shingles x K) row explosion before the
  min-agg; the min-agg is map-side combinable so the shuffle carries only
  (doc, K) rows. Band join shuffles (doc, BANDS) rows. Hot buckets (boiler-
  plate texts) are the skew risk -> cap candidates per bucket.
- SimHash: (docs x tokens x 64) explosion is the worst-case; grouped
  map-side so the shuffle is (doc, 64). Pair join on exact signature is a
  shuffle on a well-distributed 64-bit key.
- n-gram Jaccard: quadratic in docs — only run AFTER an LSH prefilter at
  scale; exposed standalone for verification.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MINHASH_K = 12
MINHASH_BANDS = 4  # 3 rows per band


def shingles_col(tokens: Column, n: int = 3) -> Column:
    """Distinct token n-gram shingles of a tokens array (native, codegen'd)."""
    # NB sequence(0, -1) DESCENDS in Spark — guard docs shorter than n tokens
    gram = F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tokens) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(tokens, (i + j + 1).cast("int")) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(gram)


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup by md5(text): groups with >1 doc -> (text_hash,
    canonical_id=min id, n_dups). One groupBy shuffle on the hash."""
    h = docs.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("text_hash"))
    return (
        h.groupBy("text_hash")
        .agg(F.min("id").alias("canonical_id"), F.count("*").alias("n_dups"))
        .filter(F.col("n_dups") > 1)
    )


def _minhash_sigs(docs: DataFrame, tokens_col: Column, id_col: str) -> DataFrame:
    """(id, hash_idx, minhash) — minhash_i = min over shingles of
    md5(i || '|' || shingle); lexicographic min over hex = a portable
    128-bit universal-ish hash family."""
    sh = docs.select(
        F.col(id_col).alias("id"), F.explode(shingles_col(tokens_col)).alias("shingle")
    )
    hk = sh.join(
        docs.sparkSession.range(MINHASH_K).select(F.col("id").cast("int").alias("hash_idx")),
        how="cross",
    )
    hk = hk.withColumn(
        "h", F.md5(F.concat_ws("|", F.col("hash_idx").cast("string"), F.col("shingle")))
    )
    # map-side combinable min-agg: shuffle carries only (id, K) rows
    return hk.groupBy("id", "hash_idx").agg(F.min("h").alias("minhash"))


def minhash_lsh_candidates(
    docs: DataFrame, tokens_col: Column, id_col: str = "doc_id"
) -> DataFrame:
    """MinHash signatures -> banded LSH -> candidate pairs (id_a < id_b).

    Returns (id_a, id_b, n_bands) where n_bands = number of bands in which
    the two docs share a bucket (>=1)."""
    sigs = _minhash_sigs(docs, tokens_col, id_col)
    rows_per_band = MINHASH_K // MINHASH_BANDS
    banded = sigs.withColumn("band", (F.col("hash_idx") / rows_per_band).cast("int"))
    keys = banded.groupBy("id", "band").agg(
        F.md5(F.concat_ws("|", F.sort_array(F.collect_list("minhash")))).alias("band_key")
    )
    a = keys.select(F.col("id").alias("id_a"), "band", F.col("band_key"))
    b = keys.select(F.col("id").alias("id_b"), F.col("band").alias("band_b"),
                    F.col("band_key").alias("band_key_b"))
    pairs = a.join(
        b,
        (F.col("band_key") == F.col("band_key_b"))
        & (F.col("band") == F.col("band_b"))
        & (F.col("id_a") < F.col("id_b")),
    )
    return pairs.groupBy("id_a", "id_b").agg(F.count("*").alias("n_bands"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    tokens_col: Column,
    id_col: str = "doc_id",
    threshold: float = 0.5,
    n: int = 3,
) -> DataFrame:
    """All-pairs n-gram Jaccard >= threshold -> (id_a, id_b, jaccard).

    Shared-shingle join (only pairs with >=1 common shingle are generated),
    then |A∩B| / (|A| + |B| - |A∩B|). At scale: run on LSH candidates."""
    sh = docs.select(
        F.col(id_col).alias("id"), F.explode(shingles_col(tokens_col, n)).alias("shingle")
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), F.col("shingle").alias("shingle_b"))
    inter = (
        a.join(b, (F.col("shingle") == F.col("shingle_b")) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_int"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    j = inter.join(sa, "id_a").join(sb, "id_b")
    j = j.withColumn(
        "jaccard",
        F.round(
            F.col("n_int") / (F.col("n_a") + F.col("n_b") - F.col("n_int")), 4
        ),
    )
    return j.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def simhash_table(docs: DataFrame, tokens_col: Column, id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per doc as two int32 halves -> (id, sim_hi, sim_lo).

    Bit j of md5(token)'s first 16 hex digits (digit j//4, bit j%4); bit j of
    the signature = majority sign of sum over token OCCURRENCES of (2*bit-1).
    Ties (sum==0) -> 0. All-native: conv() does hex-digit decode."""
    spark = docs.sparkSession
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens_col).alias("term")
    ).withColumn("hex", F.substring(F.md5("term"), 1, 16))
    bits = spark.range(64).select(F.col("id").cast("int").alias("j"))
    tb = toks.crossJoin(bits)
    tb = tb.withColumn(
        "digit",
        F.conv(F.substring(F.col("hex"), (F.col("j") / 4).cast("int") + 1, 1), 16, 10).cast("int"),
    )
    tb = tb.withColumn("w", F.expr("(shiftright(digit, j % 4) & 1) * 2 - 1"))
    sig = tb.groupBy("id", "j").agg(F.sum("w").alias("s"))
    sig = sig.withColumn("bit", (F.col("s") > 0).cast("long"))
    half = F.when(F.col("j") >= 32, F.lit("hi")).otherwise(F.lit("lo"))
    sig = sig.withColumn("half", half).withColumn(
        "contrib", F.col("bit") * F.pow(F.lit(2.0), (F.col("j") % 32).cast("double")).cast("long")
    )
    out = (
        sig.groupBy("id")
        .pivot("half", ["hi", "lo"])
        .sum("contrib")
        .select(
            "id",
            F.coalesce(F.col("hi"), F.lit(0)).alias("sim_hi"),
            F.coalesce(F.col("lo"), F.lit(0)).alias("sim_lo"),
        )
    )
    return out


def simhash_duplicate_pairs(simhashes: DataFrame) -> DataFrame:
    """Pairs with identical 64-bit simhash (id_a < id_b) — the exact-match
    band of simhash dedup; near-match (hamming<=k) joins on rotated key
    prefixes at scale."""
    a = simhashes.select(F.col("id").alias("id_a"), "sim_hi", "sim_lo")
    b = simhashes.select(
        F.col("id").alias("id_b"), F.col("sim_hi").alias("hi_b"), F.col("sim_lo").alias("lo_b")
    )
    return a.join(
        b,
        (F.col("sim_hi") == F.col("hi_b"))
        & (F.col("sim_lo") == F.col("lo_b"))
        & (F.col("id_a") < F.col("id_b")),
    ).select("id_a", "id_b")
