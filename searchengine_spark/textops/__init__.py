"""Large-scale training-data pipeline operators (beyond the reference).

The reference engine (tiagorainho/SearchEngine) is an IR indexer/searcher;
a 100 TB corpus pipeline additionally needs dedup, similarity search, text
quality analysis and multimodal plumbing. Everything here is expressed with
native Spark SQL functions (JVM, whole-stage codegen) except the explicitly
stubbed multimodal decoders (Arrow-batched mapInPandas).
"""

from .dedup import (  # noqa: F401
    connected_components,
    dedup_keeplist,
    exact_duplicate_pairs,
    exact_duplicates,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_duplicate_pairs,
    simhash_near_pairs,
    simhash_table,
    shingles_col,
)
from .contamination import (  # noqa: F401
    ngram_contamination,
    reference_shingles,
)
from .dataset import (  # noqa: F401
    deterministic_shuffle,
    hash_sample,
    hash_split,
    pack_sequences,
    stratified_sample,
    temperature_sample,
    temperature_weights,
)
from .multimodal import (  # noqa: F401
    extract_features,
    resize_images,
    sample_frames,
    with_binary_payload,
    with_video_payload,
)
from .clean import (  # noqa: F401
    c4_clean,
    c4_doc_filter,
    c4_line_filter,
    sentences_col,
    span_dedup,
)
from .perplexity import (  # noqa: F401
    doc_cross_entropy,
    lm_totals,
    perplexity_buckets,
    perplexity_filter,
    train_unigram_lm,
)
from .quantize import (  # noqa: F401
    ivf_sq8_topk,
    sq8_quantize,
    sq8_quantize_vec,
    sq8_topk,
)
from .quality import (  # noqa: F401
    doc_fingerprints,
    lang_id,
    quality_score,
    token_stats,
)
from .dsir import (  # noqa: F401
    dsir_weights,
    hashed_feature_counts,
)
from .scrub import (  # noqa: F401
    pii_stats,
    redact_pii,
)
from .similarity import (  # noqa: F401
    build_ivf_index,
    cosine_near_pairs,
    cosine_topk,
    initial_centroids_micro,
    ivf_topk_indexed,
    kmeans_micro,
    make_centroids,
    probe_centroids,
    semantic_dedup,
)
