from .bm25 import bm25_score_terms, bm25_topk, bm25_topk_batch  # noqa: F401
