"""docID assignment: the scale-safe two-pass path must equal the global
row_number() rank, be dense from 0, and respect (conv_id, turn_idx) order
(reference analog: sequential counter in parse order, src/indexer.py:39-53).
Also asserts the per-turn text-equality invariant (BASELINE.json input_hint).
"""

import pandas as pd

from searchengine_spark.fixtures import generate_transcripts_pdf, transcripts_df
from searchengine_spark.indexing.docids import with_doc_ids, with_doc_ids_window


def test_two_pass_equals_window(spark):
    t = transcripts_df(spark, n_conv=120, seed=7)
    fast = {
        (r["conv_id"], r["turn_idx"]): r["doc_id"]
        for r in with_doc_ids(t, n_partitions=7).collect()
    }
    slow = {
        (r["conv_id"], r["turn_idx"]): r["doc_id"]
        for r in with_doc_ids_window(t).collect()
    }
    assert fast == slow
    ids = sorted(fast.values())
    assert ids == list(range(len(ids)))  # dense from 0


def test_doc_ids_deterministic_across_runs(spark):
    t = transcripts_df(spark, n_conv=60, seed=3)
    a = with_doc_ids(t, n_partitions=5).select("conv_id", "turn_idx", "doc_id")
    b = with_doc_ids(t.repartition(13), n_partitions=5).select(
        "conv_id", "turn_idx", "doc_id"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_per_turn_text_equality_under_stable_ordering(spark, tmp_path):
    """input_hint invariant: write/read the table, order by (conv_id,
    turn_idx), texts byte-identical to the generator's."""
    pdf = generate_transcripts_pdf(n_conv=80, seed=11)
    df = transcripts_df(spark, n_conv=80, seed=11)
    path = str(tmp_path / "transcripts.parquet")
    df.write.mode("overwrite").parquet(path)
    back = (
        spark.read.parquet(path)
        .orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "text")
        .toPandas()
    )
    assert list(back["text"]) == list(pdf["text"])
    assert list(back["conv_id"]) == list(pdf["conv_id"])
    assert list(back["turn_idx"]) == list(pdf["turn_idx"])
