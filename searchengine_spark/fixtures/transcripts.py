"""Deterministic synthetic transcripts table (FIXTURES.md F1).

One row = one turn = one document (reference analog: one TSV review row,
src/models/parser.py:36-51). Schema per BASELINE.json input_hint:
(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp). No wall-clock, no external data: same (n_conv, seed) ->
byte-identical table, so the per-turn-text-equality invariant is testable
and bench runs are reproducible.

Content design:
- 2k-word Zipf vocabulary (music-review-ish words + generated fillers) so
  term df follows a realistic skew (hot terms stress the term-partitioned
  merge; see salting in indexing/segments.py).
- the 15 reference queries (/root/reference/queries.relevance.txt) have
  their phrases planted into known turns -> non-trivial BM25 result sets.
- adversarial rows at fixed indices: punctuation runs, tabs/newlines,
  unicode, empty text (tokenizer edge cases, SURVEY.md §2.6.7).
- every 97th conversation is a 512-turn outlier (long-conversation skew;
  docID assignment must not be conversation-local).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import types as T

REFERENCE_QUERIES = [
    "greatest rock album",
    "best live performance",
    "guitar solo",
    "christmas songs",
    "elevator music",
    "balkan music",
    "worst buy",
    "70's country music",
    "one hit wonder",
    "most underrated",
    "several instruments",
    "abbey road studios",
    "easy listening",
    "great cover art",
    "house party songs",
]

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

_ROLES = ("user", "assistant", "tool")

_BASE_WORDS = (
    "music album song rock guitar solo live performance band record "
    "christmas elevator balkan country wonder underrated instruments "
    "abbey road studios listening cover art house party songs greatest "
    "best worst buy great easy several most one hit sound vinyl cd track "
    "lyrics melody drums bass piano vocals singer concert tour stage fan "
    "review price ship quality love hate good bad old new classic modern "
    "jazz blues metal punk folk pop rap disco opera choir remix acoustic "
    "electric amp chord verse chorus bridge tempo rhythm beat note scale "
    "label studio mix master press edition box set deluxe bonus disc"
).split()

_ADVERSARIAL = [
    "",
    "   ",
    "!!!***(((%%%$$$###@@@",
    "tabs\there\tand\tmore\ttabs",
    "line\nbreaks\nare\nfun",
    "mixed\t\npunct!?...and,words;here",
    "UPPER lower MiXeD CaSe WoRdS",
    "unicode café naïve über straße ♛ 你好",
    "a b c d e f g single char tokens",
    "hyphen-ated co-op re-mix 70's rock'n'roll",
]


def _vocab(rng: np.random.Generator, size: int = 2000) -> np.ndarray:
    words = list(dict.fromkeys(_BASE_WORDS))
    syll = np.array(list("bcdfgklmnprstvz"))
    vow = np.array(list("aeiou"))
    while len(words) < size:
        n = rng.integers(2, 5)
        w = "".join(rng.choice(syll) + rng.choice(vow) for _ in range(n))
        if w not in words:
            words.append(w)
    return np.array(words[:size])


def generate_transcripts_pdf(n_conv: int = 200, seed: int = 20260816) -> pd.DataFrame:
    """Build the transcripts table as a pandas DataFrame, ordered by
    (conv_id, turn_idx). Deterministic in (n_conv, seed)."""
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)
    v = len(vocab)
    # Zipf-ish word weights
    weights = 1.0 / np.arange(1, v + 1) ** 1.05
    weights /= weights.sum()

    # turn counts per conversation: zipf-ish 1..64, outliers of 512
    n_turns = np.minimum(rng.zipf(1.5, size=n_conv), 64).astype(np.int64)
    n_turns = np.maximum(n_turns, 1)
    n_turns[::97] = 512  # long-conversation skew outliers

    total = int(n_turns.sum())
    conv_ids = np.repeat([f"conv{i:06d}" for i in range(n_conv)], n_turns)
    turn_idx = np.concatenate([np.arange(k, dtype=np.int64) for k in n_turns])

    # texts: 5..80 zipf-drawn words each, vectorized draw then per-row join
    lens = rng.integers(5, 81, size=total)
    flat = rng.choice(v, size=int(lens.sum()), p=weights)
    offsets = np.concatenate([[0], np.cumsum(lens)])
    texts = [" ".join(vocab[flat[offsets[i] : offsets[i + 1]]]) for i in range(total)]

    # plant reference query phrases at deterministic rows: query q goes into
    # rows q*7+3, q*131+57, q*997+11 (mod total) with graded extra repeats
    for q, phrase in enumerate(REFERENCE_QUERIES):
        for j, step in enumerate((7, 131, 997)):
            row = (q * step + 3 + 54 * j) % total
            texts[row] = texts[row] + " " + " ".join([phrase] * (j + 1))

    # adversarial rows at fixed indices
    for i, adv in enumerate(_ADVERSARIAL):
        row = (17 + i * 293) % total
        texts[row] = adv

    roles = np.array(_ROLES)[(turn_idx % 3).astype(np.int64)]
    tool_names = np.char.add("tool", (turn_idx % 5).astype(str))
    tool = pd.Series(np.where(roles == "tool", tool_names, None), dtype=object)
    ts = pd.date_range(dt.datetime(2026, 1, 1), periods=total, freq="s")

    pdf = pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx.astype(np.int32),
            "role": roles,
            "text": texts,
            "tool": tool,
            "ts": ts,
        }
    )
    # generator emits in (conv_id, turn_idx) order already; assert stable
    pdf = pdf.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    return pdf


def transcripts_df(spark, n_conv: int = 200, seed: int = 20260816, n_partitions: int | None = None):
    """Spark DataFrame of the synthetic transcripts (Arrow createDataFrame)."""
    pdf = generate_transcripts_pdf(n_conv=n_conv, seed=seed)
    df = spark.createDataFrame(pdf, schema=TRANSCRIPTS_SCHEMA)
    if n_partitions:
        df = df.repartition(n_partitions)
    return df


def transcripts_distributed(spark, n_conv: int, seed: int = 20260816, n_partitions: int | None = None):
    """Executor-side transcripts generator for bench scale.

    Each conversation's rows are a pure function of (conv index, seed) — the
    output multiset is identical for ANY partitioning / parallelism, which is
    what makes the local[8]-vs-local[32] scaling comparison apples-to-apples
    (and is how you'd synthesize a 10^12-turn corpus on a real cluster: no
    driver-side materialization, no collect).

    No query planting / adversarial rows (bench corpus, not the pytest
    fixture) — but the same Zipf vocab, so the 15 reference queries still hit.
    """
    n_partitions = n_partitions or spark.sparkContext.defaultParallelism * 2
    base = spark.range(0, n_conv, 1, n_partitions)

    def gen(batches):
        vocab = _vocab(np.random.default_rng(seed))
        v = len(vocab)
        weights = 1.0 / np.arange(1, v + 1) ** 1.05
        weights /= weights.sum()
        epoch = dt.datetime(2026, 1, 1)
        for pdf in batches:
            for conv in pdf["id"].to_numpy():
                rng = np.random.default_rng(seed * 1_000_003 + int(conv))
                k = 512 if conv % 97 == 0 else max(1, min(int(rng.zipf(1.5)), 64))
                lens = rng.integers(5, 81, size=k)
                flat = rng.choice(v, size=int(lens.sum()), p=weights)
                offs = np.concatenate(([0], np.cumsum(lens)))
                texts = [" ".join(vocab[flat[offs[i]: offs[i + 1]]]) for i in range(k)]
                turn = np.arange(k, dtype=np.int32)
                roles = np.array(_ROLES)[turn % 3]
                tool = pd.Series(
                    np.where(roles == "tool", np.char.add("tool", (turn % 5).astype(str)), None),
                    dtype=object,
                )
                yield pd.DataFrame(
                    {
                        "conv_id": f"conv{int(conv):09d}",
                        "turn_idx": turn,
                        "role": roles,
                        "text": texts,
                        "tool": tool,
                        # bounded offset: pandas Timestamp overflows past year
                        # 2262, so wrap conv into a ~3-year window
                        "ts": pd.Timestamp(epoch)
                        + pd.to_timedelta((int(conv) % 1_000_000) * 100 + turn, unit="s"),
                    }
                )

    return base.mapInPandas(gen, schema=TRANSCRIPTS_SCHEMA)


def write_transcripts(spark, path: str, n_conv: int = 200, seed: int = 20260816) -> None:
    """Materialize as a parquet table (Iceberg-layout fallback; SURVEY.md §7
    hard-parts note: no iceberg runtime jar in the sandbox)."""
    transcripts_df(spark, n_conv=n_conv, seed=seed).write.mode("overwrite").parquet(path)
