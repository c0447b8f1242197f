"""searchengine_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch reimplementation of the observable semantics of
tiagorainho/SearchEngine (reference at /root/reference, cited by file:line in
docstrings) re-expressed Spark-first: DataFrame/SQL plans for everything
Catalyst can optimize, Arrow-batched pandas UDFs only where semantics demand
Python (tokenizer parity, posting-list codec, WAND scoring).

Layout
------
- ``tokenizer``         exact-parity tokenizer (native Column fast path + pandas UDF)
- ``indexing``          docID assignment, index build, varbyte codec, segments, lineage
- ``query``             BM25 exact scorer, block-max WAND scorer, TF-IDF
- ``ops``               training-data-pipeline operators (dedup, similarity, text stats,
                        multimodal plumbing)
- ``fixtures``          deterministic transcripts/corpus generators for tests & bench
- ``eval``              precision/recall/F1/NDCG/throughput (reference formulas)
"""

__version__ = "0.1.0"
