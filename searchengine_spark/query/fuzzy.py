"""SymSpell-style fuzzy term correction: Levenshtein distance <= 1
(symmetric-delete candidate generation, Garbe's published algorithm;
https://github.com/wolfgarbe/SymSpell describes the method — implemented
here from the description, Spark-first).

Candidate generation: two terms within edit distance 1 ALWAYS have
intersecting deletion-1 neighborhoods ({term} ∪ single-character
deletions) — equal strings share the term itself; for insert/delete the
shorter IS a deletion of the longer; a substitution shares the deletion
at the substituted position; lengths differing by 2+ can never collide.
The converse does NOT hold (e.g. "aba"/"bab" share deletions at
distance 2), so — exactly like SymSpell — candidates are verified, with
the JVM-native ``levenshtein()`` (its DuckDB twin makes the whole
operator oracle-replicable; transposition-only neighbors are therefore
deliberately NOT matches — the contract is plain Levenshtein, not OSA).

Shape at scale: the dictionary side is one explode of the (tiny
relative to the corpus) term_stats sidecar, the query side is a LITERAL
variant → query-term map fan-out (the join-free pattern of
query/wand.py), and ranking is a window over the bounded verified
candidate set. No joins; the variants explode is O(vocab · avg_len)
rows — still sidecar-sized at 100 TB.

Ranking contract (deterministic, engine-independent): exact match
first, then document frequency descending, then term ascending.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

CAND_SCHEMA = "qterm string, term string, df long, dist int, rank int"


def levenshtein(a: str, b: str) -> int:
    """Plain Levenshtein distance — the driver-side twin of the JVM
    ``levenshtein()`` verify (query terms are short; O(len²) is fine)."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def del1(term: str) -> set[str]:
    """Python twin of :func:`deletion_variants_col` for the literal
    query side (queries are bounded; the driver computes their tiny
    neighborhoods locally, exactly like wand.py computes idf maps)."""
    return {term[:i] + term[i + 1 :] for i in range(len(term))}


def del_upto(term: str, max_edits: int) -> set[str]:
    """{term} ∪ deletion neighborhood up to depth ``max_edits`` (1 or 2)
    — the SymSpell candidate key set at the given edit budget."""
    out = {term} | del1(term)
    if max_edits >= 2:
        out |= {v for d in del1(term) for v in del1(d)}
    return out


def auto_fuzziness(term: str) -> int:
    """The ES ``fuzziness: AUTO`` ladder: 0 edits below 3 chars, 1 for
    3-5 chars, 2 above."""
    n = len(term)
    return 0 if n < 3 else (1 if n <= 5 else 2)


def deletion_variants_col(term: Column) -> Column:
    """array<string>: the term plus each distinct single-char deletion."""
    dels = F.transform(
        F.sequence(F.lit(1), F.length(term)),
        lambda i: F.concat(
            F.substr(term, F.lit(1), i - 1),
            F.substr(term, i + 1, F.length(term)),
        ),
    )
    return F.array_distinct(F.concat(F.array(term), dels))


def _dels_of(s: Column) -> Column:
    """array<string> of the single-char deletions of ``s`` (no self)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            F.substr(s, F.lit(1), i - 1),
            F.substr(s, i + 1, F.length(s)),
        ),
    )


def deletion_variants_upto_col(term: Column, max_edits: int) -> Column:
    """array<string>: {term} ∪ deletions up to depth ``max_edits`` —
    the Column twin of :func:`del_upto` (depth 2 = one nested HOF pass;
    O(len²) variants per term, still sidecar-sized over a dictionary)."""
    d1 = _dels_of(term)
    arrs = [F.array(term), d1]
    if max_edits >= 2:
        arrs.append(F.flatten(F.transform(d1, _dels_of)))
    return F.array_distinct(F.concat(*arrs))


def fuzzy_candidates(
    dictionary: DataFrame,
    qterms: Sequence[str],
    k: int = 3,
    max_edits: int = 1,
) -> DataFrame:
    """-> (qterm, term, df, dist, rank): for each query term, the top-k
    dictionary terms within Levenshtein distance ``max_edits`` (1 or 2
    — the ES fuzziness range), ranked exact-first then distance asc
    then df desc then term asc (at max_edits=1 every non-exact
    candidate ties on distance, so the ranking is the original
    df-then-term order unchanged). ``dictionary`` needs (term, df) —
    the index's term_stats sidecar qualifies as-is.

    SymSpell at depth 2: two terms within distance 2 always share a
    member of each other's deletion-<=2 neighborhoods, so the variant
    key sets are the depth-2 neighborhoods on BOTH sides and the
    verification pass keeps the exact contract."""
    if max_edits not in (1, 2):
        raise ValueError(f"max_edits must be 1 or 2, got {max_edits}")
    spark = dictionary.sparkSession
    qterms = list(dict.fromkeys(qterms))
    if not qterms:
        return spark.createDataFrame([], CAND_SCHEMA)

    qts_by_variant: dict[str, list[str]] = {}
    for q in qterms:
        for v in del_upto(q, max_edits):
            qts_by_variant.setdefault(v, []).append(q)
    entries = [
        x
        for v, qs in qts_by_variant.items()
        for x in (F.lit(v), F.array(*[F.lit(q) for q in qs]))
    ]

    lens = [len(q) for q in qterms]
    cand = (
        dictionary
        # length prune BEFORE the variants explode: a d<=e neighbor's
        # length is within +-e of some query term's
        .filter(F.length("term").between(
            min(lens) - max_edits, max(lens) + max_edits))
        .select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.explode(
                deletion_variants_upto_col(F.col("term"), max_edits)
            ).alias("variant"),
        )
        .filter(F.col("variant").isin(list(qts_by_variant)))
        # literal variant -> query-terms fan-out (join-free, wand.py style)
        .withColumn("qterm", F.explode(F.create_map(*entries)[F.col("variant")]))
        # a pair can collide via several shared variants -> dedupe
        .groupBy("qterm", "term")
        .agg(F.first("df").alias("df"))
        # the SymSpell verification pass: shared-deletion collisions
        # beyond the budget are rejected
        .withColumn("dist", F.levenshtein(F.col("qterm"), F.col("term")))
        .filter(F.col("dist") <= max_edits)
    )
    w = Window.partitionBy("qterm").orderBy(
        (F.col("term") == F.col("qterm")).desc(), F.col("dist").asc(),
        F.col("df").desc(), F.col("term")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qterm", "term", "df", F.col("dist").cast("int"), "rank")
    )


SUGGEST_MODES = ("missing", "popular", "always")


def term_suggestions(
    dictionary: DataFrame,
    qterms: Sequence[str],
    k: int = 3,
    mode: str = "missing",
    fuzziness=1,
) -> DataFrame:
    """-> (qterm, suggestion, df, rank): the ES TERM SUGGESTER ("did you
    mean") — per input term, up to ``k`` dictionary neighbors within
    the ``fuzziness`` edit budget, ranked distance asc (the ES
    score-first sort) then df desc then term asc (at fuzziness 1 every
    candidate ties on distance, so frequency IS the tiebreak — the
    original contract unchanged). The input term itself is never a
    suggestion (the ES contract); the ``suggest_mode`` gate decides
    WHICH inputs get suggestions:

    - ``"missing"`` (the ES default): only terms NOT in the dictionary;
    - ``"popular"``: only suggestions strictly more frequent than the
      input term (df 0 when the input is OOV);
    - ``"always"``: every input term.

    ``fuzziness``: 1, 2, or ``"auto"`` — the ES AUTO ladder PER input
    term (0 edits below 3 chars, 1 for 3-5, 2 above; a 0-budget term
    gets no suggestions). Candidates generate once at the maximum
    budget, then a literal per-term map trims each input to its own.

    Same one-bounded-job shape as :func:`fuzzy_candidates` (this is the
    ranked-list sibling of its top-1 ``correct_terms``); pass the
    federation-global dictionary to suggest across shards."""
    if mode not in SUGGEST_MODES:
        raise ValueError(f"mode must be one of {SUGGEST_MODES}, got {mode!r}")
    if fuzziness not in (1, 2, "auto"):
        raise ValueError(
            f"fuzziness must be 1, 2 or 'auto', got {fuzziness!r}")
    spark = dictionary.sparkSession
    out_schema = "qterm string, suggestion string, df long, rank int"
    qts = list(dict.fromkeys(qterms))
    if not qts:
        return spark.createDataFrame([], out_schema)
    budgets = {
        q: (auto_fuzziness(q) if fuzziness == "auto" else int(fuzziness))
        for q in qts
    }
    emax = max(budgets.values())
    # the verified pair set INCLUDING self-hits (they carry the input
    # term's own df for the mode gates), k unbounded here — the real
    # cut happens after self-exclusion
    pairs = fuzzy_candidates(
        dictionary, qts, k=1 << 30, max_edits=max(1, emax)
    ).select("qterm", "term", "df", "dist")
    if fuzziness == "auto":
        bmap = F.create_map(
            *[F.lit(x) for q, b in budgets.items() for x in (q, b)])
        pairs = pairs.filter(
            (F.col("term") == F.col("qterm"))
            | (F.col("dist") <= bmap[F.col("qterm")])
        )
    wq = Window.partitionBy("qterm")
    pairs = pairs.withColumn(
        "self_df",
        F.max(F.when(F.col("term") == F.col("qterm"), F.col("df"))).over(wq))
    sugg = pairs.filter(F.col("term") != F.col("qterm"))
    if mode == "missing":
        sugg = sugg.filter(F.col("self_df").isNull())
    elif mode == "popular":
        sugg = sugg.filter(
            F.col("df") > F.coalesce(F.col("self_df"), F.lit(0)))
    w = Window.partitionBy("qterm").orderBy(
        F.asc("dist"), F.desc("df"), F.asc("term"))
    return (
        sugg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qterm", F.col("term").alias("suggestion"), "df", "rank")
    )


def phrase_suggestions(
    dictionary: DataFrame,
    qterms: Sequence[str],
    k: int = 3,
    max_per_term: int = 5,
    max_edits: int = 2,
) -> list:
    """ES PHRASE SUGGESTER analog ("did you mean <whole query>?"):
    enumerate whole-phrase corrections — per position the token itself
    (edit 0, when in the dictionary) plus its df-top ``max_per_term``
    distance-1 neighbors (edit 1 each), combinations capped at
    ``max_edits`` total — ranked by the naive unigram-LM analog
    Π df (EXACT arbitrary-precision integers — no float product, no
    log; a rarer-words phrase never beats a commoner one by rounding),
    ties by phrase asc; the INPUT phrase itself is never suggested.
    -> [(phrase, score, n_edits), ...] best-first, at most ``k``.

    Shape: ONE bounded Spark job (the same fuzzy_candidates scan the
    term suggester uses) then a driver-side product over at most
    ``max_per_term^len(qterms)`` combinations — queries are short and
    driver-resident by construction (the wand.py idf-map argument). A
    position whose token is OOV with no neighbors contributes df 0 —
    phrases through it score 0 and sink, never vanish."""
    if int(max_edits) < 1:
        raise ValueError(f"max_edits must be >= 1, got {max_edits}")
    if int(max_per_term) < 1:
        raise ValueError(f"max_per_term must be >= 1, got {max_per_term}")
    toks = [str(t) for t in qterms]
    if not toks:
        return []
    pairs = fuzzy_candidates(dictionary, toks, k=1 << 30).collect()
    by_q: dict[str, list] = {t: [] for t in toks}
    for r in pairs:
        by_q[r["qterm"]].append((r["term"], int(r["df"])))
    slots: list[list] = []
    for t in toks:
        cands = by_q.get(t, [])
        self_df = next((df for term, df in cands if term == t), None)
        neigh = sorted(
            ((term, df) for term, df in cands if term != t),
            key=lambda td: (-td[1], td[0]),
        )[:max_per_term]
        slot = [(t, self_df if self_df is not None else 0,
                 0 if self_df is not None else 0)]
        slot += [(term, df, 1) for term, df in neigh]
        slots.append(slot)
    # beam over combinations within the edit budget (bounded:
    # (max_per_term+1)^|q| with |q| the query length)
    from itertools import product as _product

    out = []
    inp = " ".join(toks)
    for combo in _product(*slots):
        edits = sum(e for _, _, e in combo)
        if edits > int(max_edits):
            continue
        phrase = " ".join(t for t, _, _ in combo)
        if phrase == inp:
            continue
        score = 1
        for _, df, _ in combo:
            score *= df
        out.append((phrase, score, edits))
    out.sort(key=lambda pse: (-pse[1], pse[0]))
    return out[:k]


def correct_terms(
    dictionary: DataFrame, qterms: Sequence[str]
) -> Mapping[str, str]:
    """Top-1 correction map for the given query terms. Exact dictionary
    hits map to themselves; terms with no distance<=1 neighbor are
    absent (callers keep the original, which then matches nothing — OR
    semantics unchanged). ONE bounded Spark job."""
    rows = fuzzy_candidates(dictionary, qterms, k=1).collect()
    return {r["qterm"]: r["term"] for r in rows}
