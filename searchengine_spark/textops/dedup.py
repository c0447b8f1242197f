"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All portable-deterministic: hash primitives are md5 (identical across Spark,
DuckDB, Python), so every operator is oracle-checkable cross-engine, and
re-runs are reproducible cluster-to-cluster (no seed-dependent JVM hashing
in results).

Scale notes (100 TB):
- exact: one shuffle on a 128-bit key — trivially scalable.
- MinHash LSH: ONE md5 per shingle; the K-hash family is double-hashing
  arithmetic over the digest halves (no K-row explosion), the K mins ride
  as columns through a single map-side-combinable groupBy(id), and band
  keys are projections of that row — one shuffle end-to-end. Hot buckets
  (boilerplate texts) are the skew risk -> cap candidates per bucket.
- SimHash: (docs x tokens x 64) explosion is the worst-case; grouped
  map-side so the shuffle is (doc, 64). Pair join on exact signature is a
  shuffle on a well-distributed 64-bit key.
- n-gram Jaccard: quadratic in docs — only run AFTER an LSH prefilter at
  scale; exposed standalone for verification.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MINHASH_K = 12
MINHASH_BANDS = 4  # 3 rows per band
# Kirsch-Mitzenmacher field: g_i = (h1 + i*h2) mod p over the md5 halves.
# p = 2^31-1 keeps every intermediate < 2^36 — exact and identical in Spark
# BIGINT, DuckDB BIGINT and Python int (no unsigned/overflow divergence).
MINHASH_P = (1 << 31) - 1
# Hot-bucket candidate cap: a boilerplate band bucket with B docs generates
# B^2/2 pairs — one viral template at 100 TB is a cartesian bomb. Keeping
# the (deterministic) lowest-id ``cap`` docs per bucket bounds any bucket's
# pair count at cap^2/2; near-dup clusters bigger than the cap still chain
# together transitively through their lowest-id members.
DEFAULT_BUCKET_CAP = 64


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
        # md5(NULL) is NULL and groupBy KEEPS the null key — without the
        # filter every NULL-text doc lands in one fake dup group while the
        # pair form (NULL never equi-joins) emits no edge for them
        h.filter(F.col("text_hash").isNotNull())
        .groupBy("text_hash")
        .agg(F.min("id").alias("canonical_id"), F.count("*").alias("n_dups"))
        .filter(F.col("n_dups") > 1)
    )


def _minhash_sigs(docs: DataFrame, tokens_col: Column, id_col: str) -> DataFrame:
    """(id, mh0..mh{K-1}) — K minhashes per doc from ONE md5 per shingle.

    g_i(s) = (h1(s) + i*h2(s)) mod p (Kirsch & Mitzenmacher, "Less hashing,
    same performance", ESA 2006) with h1/h2 the digest's two 48-bit halves
    reduced mod p = 2^31-1 (MINHASH_P — all arithmetic exact cross-engine).

    Scale shape: the r02 formulation cross-joined K=12 hash-index rows per
    shingle (12x the rows, 12 md5s per shingle) and needed a SECOND shuffle
    to band the tall (id, hash_idx) signatures. This one hashes each
    shingle once, carries the K mins as COLUMNS through a single
    map-side-combinable groupBy(id), and band keys become projections of
    that row — one shuffle end-to-end, zero row explosion.
    """
    # bind tokens ONCE before the shingle transform: interpreted
    # higher-order lambdas get no common-subexpression elimination, so an
    # inline tokenize expression would re-evaluate per element_at reference
    # (~3n tokenizations/doc — measured 26x slower); a separate projection
    # survives CollapseProject (repeated non-cheap reference) and computes
    # it once per row
    sh = docs.select(
        F.col(id_col).alias("id"), tokens_col.alias("_toks")
    ).select(
        "id", F.explode(shingles_col(F.col("_toks"))).alias("shingle")
    ).select("id", F.md5("shingle").alias("_d"))
    hs = sh.select(
        "id",
        (F.conv(F.substring("_d", 1, 12), 16, 10).cast("long") % MINHASH_P).alias("_h1"),
        (F.conv(F.substring("_d", 13, 12), 16, 10).cast("long") % MINHASH_P).alias("_h2"),
    )
    return hs.groupBy("id").agg(
        *[
            F.min((F.col("_h1") + F.lit(i) * F.col("_h2")) % MINHASH_P).alias(f"mh{i}")
            for i in range(MINHASH_K)
        ]
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    tokens_col: Column,
    id_col: str = "doc_id",
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """MinHash signatures -> banded LSH -> candidate pairs (id_a < id_b).

    Returns (id_a, id_b, n_bands) where n_bands = number of bands in which
    the two docs share a bucket (>=1). ``bucket_cap`` bounds the quadratic
    blowup of hot (boilerplate) buckets: only the ``cap`` lowest-id docs of
    each (band, band_key) bucket generate pairs (DEFAULT_BUCKET_CAP note)."""
    sigs = _minhash_sigs(docs, tokens_col, id_col)
    rows_per_band = MINHASH_K // MINHASH_BANDS
    # band keys as projections of the one-row-per-doc signature (fixed
    # hash_idx order — no collect_list, no second shuffle), then a 4-row
    # posexplode to the (id, band, band_key) key table
    band_keys = F.array(*[
        F.md5(F.concat_ws("|", *[
            F.col(f"mh{b * rows_per_band + r}").cast("string")
            for r in range(rows_per_band)
        ]))
        for b in range(MINHASH_BANDS)
    ])
    keys = sigs.select(
        "id", F.posexplode(band_keys).alias("band", "band_key")
    )
    if bucket_cap is not None:
        w = Window.partitionBy("band", "band_key").orderBy("id")
        keys = (
            keys.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= bucket_cap)
            .drop("_rn")
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
    candidates: DataFrame | None = None,
) -> DataFrame:
    """n-gram Jaccard >= threshold -> (id_a, id_b, jaccard).

    Without ``candidates``: all-pairs via shared-shingle self-join (only
    pairs with >=1 common shingle are generated) — quadratic on common
    shingles, verification-scale only. With ``candidates`` (id_a, id_b —
    e.g. :func:`minhash_lsh_candidates` output): cost is linear in
    Σ_pairs |shingles|, the 100 TB composition (LSH prunes, Jaccard
    verifies).

    The ratio is floor-truncated to 4dp (NOT round(): round() disagrees
    between engines on exact decimal ties like 1/160, breaking both the
    oracle contract and the >= threshold cut)."""
    # bind-once projection (see _minhash_sigs: inline tokenize expressions
    # re-evaluate per lambda reference inside the shingle transform)
    sh = docs.select(
        F.col(id_col).alias("id"), tokens_col.alias("_toks")
    ).select("id", F.explode(shingles_col(F.col("_toks"), n)).alias("shingle"))
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    if candidates is None:
        a = sh.select(F.col("id").alias("id_a"), "shingle")
        b = sh.select(F.col("id").alias("id_b"), F.col("shingle").alias("shingle_b"))
        inter = (
            a.join(b, (F.col("shingle") == F.col("shingle_b")) & (F.col("id_a") < F.col("id_b")))
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("n_int"))
        )
    else:
        # candidate-pair intersection: route the pair through (id, shingle)
        # joins — each candidate pair costs |A| + matched rows, never a
        # shingle-keyed cartesian across the corpus
        pairs = candidates.select("id_a", "id_b")
        wa = sh.select(F.col("id").alias("id_a"), "shingle")
        wb = sh.select(F.col("id").alias("_idb"), F.col("shingle").alias("shingle_b"))
        inter = (
            pairs.join(wa, "id_a")
            .join(wb, (F.col("id_b") == F.col("_idb")) & (F.col("shingle") == F.col("shingle_b")))
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("n_int"))
        )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    j = inter.join(sa, "id_a").join(sb, "id_b")
    j = j.withColumn(
        "jaccard",
        F.floor(
            F.col("n_int") / (F.col("n_a") + F.col("n_b") - F.col("n_int")) * 10000
        ) / 10000,
    )
    return j.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def exact_duplicate_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact-dup PAIR form (id_a < id_b) of :func:`exact_duplicates`, for
    composition into the pair graph. Star-shaped per hash group (min-id
    hub), so a group of B docs emits B-1 edges, not B^2/2."""
    h = docs.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("text_hash")
    ).filter(F.col("text_hash").isNotNull())  # match exact_duplicates
    hub = h.groupBy("text_hash").agg(F.min("id").alias("id_a"))
    return (
        h.join(hub, "text_hash")
        .filter(F.col("id") != F.col("id_a"))
        .select("id_a", F.col("id").alias("id_b"))
    )


def connected_components(
    pairs: DataFrame,
    ids: DataFrame | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 32,
) -> DataFrame:
    """Connected components over an undirected pair graph -> (id,
    canonical_id) with canonical_id = min doc id of the component
    (deterministic keep-list semantics: keep id == canonical_id).

    Iterative min-label propagation with pointer jumping: each round every
    node takes the min label over itself + neighbors, then shortcuts
    through its label's label — O(log diameter) rounds, each a bounded
    number of hash shuffles on the node id. Labels are localCheckpoint'd
    every round so lineage stays flat (iterative-plan rule); the driver
    loop exchanges only a changed-row COUNT per round, never rows.

    ``ids``: optional (id) universe — nodes absent from ``pairs`` come out
    as singletons (canonical_id = id). ``max_iter`` is a safety bound; the
    loop exits on fixpoint (near-dup components are shallow — exact-dup
    stars have diameter 2, LSH chains rarely exceed a handful of hops)."""
    e = pairs.select(
        F.col(id_a).cast("long").alias("src"), F.col(id_b).cast("long").alias("dst")
    )
    edges = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    nodes = edges.select(F.col("src").alias("id"))
    if ids is not None:
        nodes = nodes.union(ids.select(F.col(ids.columns[0]).cast("long").alias("id")))
    labels = nodes.distinct().select("id", F.col("id").alias("lab")).localCheckpoint()

    for _ in range(max_iter):
        # min over neighbors' labels (rename-join: shared-lineage rule)
        lab_src = labels.select(F.col("id").alias("_s"), F.col("lab").alias("slab"))
        nbr = (
            edges.join(lab_src, edges["src"] == lab_src["_s"])
            .groupBy("dst")
            .agg(F.min("slab").alias("nlab"))
            .select(F.col("dst").alias("id"), "nlab")
        )
        new = labels.join(nbr, "id", "left").select(
            "id", F.least(F.col("lab"), F.coalesce("nlab", F.col("lab"))).alias("lab")
        )
        # pointer jump: lab <- label(lab) (labels cover every node id)
        lab_of = new.select(F.col("id").alias("_l"), F.col("lab").alias("jlab"))
        new = (
            new.join(lab_of, new["lab"] == lab_of["_l"], "left")
            .select("id", F.coalesce("jlab", F.col("lab")).alias("lab"))
            .localCheckpoint()
        )
        changed = (
            new.join(labels.select("id", F.col("lab").alias("_old")), "id")
            .filter(F.col("lab") != F.col("_old"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    edges.unpersist()
    return labels.select("id", F.col("lab").alias("canonical_id"))


def dedup_keeplist(
    docs: DataFrame,
    tokens_col: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.5,
    max_hamming: int = 3,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """The full training-data dedup composition -> (id, canonical_id):
    exact md5 pairs ∪ LSH-candidate Jaccard-verified pairs ∪ SimHash
    hamming<=k pairs, resolved to components; keep a doc iff
    id == canonical_id. Every stage is the capped/candidate-routed scale
    path — no all-pairs joins anywhere."""
    exact = exact_duplicate_pairs(docs, id_col, text_col).select("id_a", "id_b")
    cands = minhash_lsh_candidates(docs, tokens_col, id_col, bucket_cap)
    jacc = ngram_jaccard_pairs(
        docs, tokens_col, id_col, threshold=jaccard_threshold, candidates=cands
    ).select("id_a", "id_b")
    sims = simhash_near_pairs(
        simhash_table(docs, tokens_col, id_col), max_hamming
    ).select("id_a", "id_b")
    edges = exact.union(jacc).union(sims)
    return connected_components(edges, ids=docs.select(id_col))


def simhash_table(docs: DataFrame, tokens_col: Column, id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per doc as two int32 halves -> (id, sim_hi, sim_lo).

    Bit j of md5(token)'s first 16 hex digits (digit j//4, bit j%4); bit j of
    the signature = majority sign of sum over token OCCURRENCES of (2*bit-1).
    Ties (sum==0) -> 0. All-native: conv() does hex-digit decode.

    Bit-PARALLEL build: one projection decodes the 16 hex nibbles per
    (doc, token) row, then ONE groupBy(id) carries 64 map-side-combinable
    sums (columns, not rows) — the shuffle moves (docs, 64) values with no
    64x row explosion anywhere in the plan (the r02 formulation
    cross-joined 64 bit-index rows per token before aggregating)."""
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens_col).alias("term")
    ).withColumn("hex", F.substring(F.md5("term"), 1, 16))
    nibbles = toks.select(
        "id",
        *[
            F.conv(F.substring("hex", i + 1, 1), 16, 10).cast("int").alias(f"d{i}")
            for i in range(16)
        ],
    )
    sums = nibbles.groupBy("id").agg(
        *[
            F.sum(F.expr(f"(shiftright(d{j // 4}, {j % 4}) & 1) * 2 - 1")).alias(f"s{j}")
            for j in range(64)
        ]
    )
    def _half(lo: int) -> Column:
        out = F.lit(0).cast("long")
        for j in range(lo, lo + 32):
            out = out + (F.col(f"s{j}") > 0).cast("long") * F.lit(1 << (j - lo)).cast("long")
        return out

    return sums.select("id", _half(32).alias("sim_hi"), _half(0).alias("sim_lo"))


def simhash_duplicate_pairs(simhashes: DataFrame) -> DataFrame:
    """Pairs with identical 64-bit simhash (id_a < id_b) — the exact-match
    band of simhash dedup; :func:`simhash_near_pairs` is the hamming<=k
    generalization."""
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


def simhash_near_pairs(simhashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate pairs by 64-bit simhash hamming distance <= k
    -> (id_a, id_b, hamming).

    Banding (Manku et al. 2007, WWW: detecting near-duplicates for web
    crawling): split the signature into 4 x 16-bit bands; any two
    signatures within hamming 3 agree EXACTLY on >=1 band (pigeonhole), so
    a per-band equi-join finds every such pair — no quadratic all-pairs
    scan, and each band key is a well-distributed 16-bit shuffle key. The
    exact hamming filter then runs only on banded candidates.

    ``max_hamming`` must be < number of bands (4) for the pigeonhole
    guarantee; larger k needs more bands."""
    if max_hamming >= 4:
        raise ValueError("max_hamming must be <= 3 for 4-band exactness")
    bands = simhashes.select(
        "id",
        "sim_hi",
        "sim_lo",
        F.explode(
            F.array(
                F.expr("named_struct('j', 0, 'v', shiftright(sim_hi, 16) & 65535)"),
                F.expr("named_struct('j', 1, 'v', sim_hi & 65535)"),
                F.expr("named_struct('j', 2, 'v', shiftright(sim_lo, 16) & 65535)"),
                F.expr("named_struct('j', 3, 'v', sim_lo & 65535)"),
            )
        ).alias("band"),
    ).select("id", "sim_hi", "sim_lo", F.col("band.j").alias("j"), F.col("band.v").alias("v"))
    a = bands.select(
        F.col("id").alias("id_a"), F.col("sim_hi").alias("hi_a"),
        F.col("sim_lo").alias("lo_a"), "j", "v",
    )
    b = bands.select(
        F.col("id").alias("id_b"), F.col("sim_hi").alias("hi_b"),
        F.col("sim_lo").alias("lo_b"), F.col("j").alias("j_b"), F.col("v").alias("v_b"),
    )
    cand = a.join(
        b,
        (F.col("j") == F.col("j_b"))
        & (F.col("v") == F.col("v_b"))
        & (F.col("id_a") < F.col("id_b")),
    ).select("id_a", "id_b", "hi_a", "lo_a", "hi_b", "lo_b").distinct()
    ham = (
        F.expr("bit_count(hi_a ^ hi_b)") + F.expr("bit_count(lo_a ^ lo_b)")
    ).cast("long")
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def conversation_fingerprints(
    corpus: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """-> (conv_id, n_turns, fp): ORDER-SENSITIVE whole-conversation
    fingerprint — md5 of the '|'-joined per-turn md5s in turn order —
    the conversation-level twin of the per-doc exact-dedup hash (a
    training corpus of transcripts dedups whole conversations, not
    turns: the same reply inside two different dialogues is not a
    duplicate). Reordered or edited turns change the fingerprint;
    per-turn hashing keeps the agg input small (32 hex chars per turn,
    not the text). One partial-aggregable groupBy; the ordered join
    rides array_sort over (turn_idx, hash) structs — deterministic at
    any parallelism, no window."""
    per_turn = corpus.select(
        F.col(conv_col).alias("conv_id"),
        F.col(turn_col).cast("long").alias("_t"),
        F.md5(F.col(text_col)).alias("_h"),
    )
    return (
        per_turn.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.md5(
                F.concat_ws(
                    "|",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("_t"), F.col("_h")))
                        ),
                        lambda x: x["_h"],
                    ),
                )
            ).alias("fp"),
        )
        .select("conv_id", "n_turns", "fp")
    )


def conversation_duplicates(
    corpus: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """-> (conv_id, canonical_conv, group_size) for conversations whose
    ENTIRE ordered turn sequence duplicates another's — canonical =
    lexicographically smallest conv_id in the group (the exact-dedup
    keep-rule), singletons excluded. One more bounded agg + self-join
    on the fingerprint (group sizes are duplicate multiplicities, tiny
    by construction)."""
    fps = conversation_fingerprints(corpus, conv_col, turn_col, text_col)
    groups = fps.groupBy("fp").agg(
        F.min("conv_id").alias("canonical_conv"),
        F.count(F.lit(1)).cast("long").alias("group_size"),
    ).filter(F.col("group_size") >= 2)
    return (
        fps.join(groups, "fp")
        .select("conv_id", "canonical_conv", "group_size")
    )


def duplicated_ngram_spans(
    docs: DataFrame,
    tokens_col: Column,
    n: int = 13,
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-level duplicated-span masking -> (id, span_start, span_end,
    n_tokens): per doc, the MAXIMAL token intervals covered by
    non-canonical occurrences of corpus-duplicated ``n``-grams — the
    n-gram approximation of exact-substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better": any
    duplicated substring of >= n tokens is a union of duplicated
    n-grams; independent frequent n-grams can over-mask, the documented
    approximation). Spans are half-open [span_start, span_end) over
    ANALYZED token positions; the canonical occurrence of each n-gram —
    global minimum (id, start) — is never masked, so one copy of every
    duplicated passage survives (the C4 span_dedup keep-first rule at
    token granularity).

    Plan: one bind-once n-gram explode, ONE hash exchange on the gram
    digest (row_number keep-first — no join back), one groupBy(id)
    collecting the doc's duplicated starts (bounded by the doc's own
    token count), and a native aggregate() interval-merge — no Python
    anywhere."""
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    pre = docs.select(
        F.col(id_col).cast("long").alias("id"), tokens_col.alias("_toks")
    )
    toks = F.col("_toks")
    cnt = F.size(toks)
    idxs = F.when(cnt >= n, F.sequence(F.lit(0), cnt - n)).otherwise(
        F.array().cast("array<int>")  # sequence(a,b) DESCENDS when a > b
    )
    grams = F.transform(
        idxs,
        lambda i: F.struct(
            i.cast("long").alias("start"),
            F.md5(
                F.array_join(F.slice(toks, i + 1, n), "\x1f")
            ).alias("gram_md5"),
        ),
    )
    ex = pre.select("id", F.explode(grams).alias("g")).select(
        "id", F.col("g.start").alias("start"), F.col("g.gram_md5").alias("gram_md5")
    )
    w = Window.partitionBy("gram_md5").orderBy("id", "start")
    dup = (
        ex.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") > 1)
        .select("id", "start")
    )
    per_doc = dup.groupBy("id").agg(
        F.sort_array(F.collect_list("start")).alias("starts")
    )
    nn = F.lit(int(n)).cast("long")
    acc0 = F.struct(
        F.array().cast("array<struct<s:bigint,e:bigint>>").alias("arr"),
        F.lit(-1).cast("long").alias("cs"),
        F.lit(-1).cast("long").alias("ce"),
    )

    def _step(acc, s):
        flush = F.concat(
            acc["arr"],
            F.array(F.struct(acc["cs"].alias("s"), acc["ce"].alias("e"))),
        )
        return (
            F.when(acc["ce"] < 0,
                   F.struct(acc["arr"].alias("arr"), s.alias("cs"),
                            (s + nn).alias("ce")))
            .when(s <= acc["ce"],
                  F.struct(acc["arr"].alias("arr"), acc["cs"].alias("cs"),
                           F.greatest(acc["ce"], s + nn).alias("ce")))
            .otherwise(F.struct(flush.alias("arr"), s.alias("cs"),
                                (s + nn).alias("ce")))
        )

    def _fin(acc):
        return F.when(acc["ce"] < 0, acc["arr"]).otherwise(
            F.concat(
                acc["arr"],
                F.array(F.struct(acc["cs"].alias("s"), acc["ce"].alias("e"))),
            )
        )

    merged = per_doc.select(
        "id", F.aggregate(F.col("starts"), acc0, _step, _fin).alias("spans")
    )
    return (
        merged.select("id", F.explode("spans").alias("sp"))
        .select(
            F.col("id"),
            F.col("sp.s").alias("span_start"),
            F.col("sp.e").alias("span_end"),
            (F.col("sp.e") - F.col("sp.s")).alias("n_tokens"),
        )
    )
