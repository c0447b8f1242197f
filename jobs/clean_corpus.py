#!/usr/bin/env python3
"""spark-submit entrypoint: end-to-end corpus cleaning pipeline
(textops/pipeline.py) — the pretraining-data composition: C4 rules,
PII redaction, Gopher repetition filters, quality floor, language
filter, exact/near dedup, eval-set decontamination, split assignment.

Cluster usage:

    zip -r searchengine_spark.zip searchengine_spark
    spark-submit --py-files searchengine_spark.zip jobs/clean_corpus.py \\
        --input <documents parquet: (doc_id, text)> --output <dir> \\
        --c4 --redact-pii --max-dup-line-frac 0.3 --lang en \\
        --dedup near --eval-corpus <parquet> \\
        --split train:8,val:1,test:1

Prints ONE JSON line: the per-stage doc-count funnel (the cleaning
job's contract for orchestration systems).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_split(s: str) -> dict:
    out = {}
    for part in s.split(","):
        name, w = part.split(":")
        out[name.strip()] = int(w)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet dir")
    ap.add_argument("--output", required=True)
    ap.add_argument("--bloom-state", default=None, metavar="DIR",
                    help="cross-RUN incremental dedup: a Bloom membership "
                         "sketch of every id this pipeline has ever "
                         "ingested (textops/sketches.py). Reads the "
                         "committed state, drops already-seen docs before "
                         "any stage (no false negatives — a seen doc "
                         "never re-enters; rare fresh docs collide away), "
                         "folds this batch's ids in, commits a NEW "
                         "version (manifest-last, URI-capable)")
    ap.add_argument("--bloom-col", default="doc_id",
                    help="--bloom-state id column (default doc_id)")
    ap.add_argument("--url-col", default=None, metavar="COL",
                    help="enable the URL gate as stage 0 "
                         "(textops/urlfilter.py): drop docs by scheme / "
                         "blocked registered domain / URL substring "
                         "BEFORE any text stage (the C4/RefinedWeb order)")
    ap.add_argument("--blocked-domains", default=None, metavar="D1,D2",
                    help="--url-col registered-domain blocklist (a "
                         "registered domain blocks every subdomain)")
    ap.add_argument("--blocked-url-substrings", default=None,
                    metavar="S1,S2",
                    help="--url-col case-insensitive URL substring "
                         "blocklist (the C4 bad-words-in-URL rule)")
    ap.add_argument("--c4", action="store_true",
                    help="C4 line + page rules (Raffel et al. 2020 §2.2)")
    ap.add_argument("--min-words", type=int, default=3)
    ap.add_argument("--min-sentences", type=int, default=5)
    ap.add_argument("--bad-words", default=None,
                    help="comma-separated bad-word list for the C4 page rule")
    ap.add_argument("--redact-pii", action="store_true")
    ap.add_argument("--max-dup-line-frac", type=float, default=None)
    ap.add_argument("--max-top2gram-frac", type=float, default=None)
    ap.add_argument("--max-dup5gram-frac", type=float, default=None)
    ap.add_argument("--min-quality", type=float, default=None)
    ap.add_argument("--lang", default=None,
                    help="keep docs whose predicted language matches")
    ap.add_argument("--ppl-keep", default=None, metavar="BUCKETS",
                    help="CCNet perplexity filter: keep the named "
                         "head/middle/tail thirds (e.g. 'head,middle'; "
                         "textops/perplexity.py — runs after --lang)")
    ap.add_argument("--ppl-lm", default=None,
                    help="parquet of (doc_id, text) reference docs the "
                         "unigram LM trains on (default: self-perplexity)")
    ap.add_argument("--dedup", default="none",
                    choices=["none", "exact", "near"],
                    help="exact: keep-first by md5(text); near: exact ∪ "
                         "MinHash-LSH+Jaccard ∪ SimHash components")
    ap.add_argument("--jaccard-threshold", type=float, default=0.5)
    ap.add_argument("--eval-corpus", default=None,
                    help="parquet of (doc_id, text) eval docs; drops "
                         "training docs sharing 13-gram shingles")
    ap.add_argument("--max-contaminated", type=int, default=0)
    ap.add_argument("--split", default=None,
                    help="name:weight,... e.g. train:8,val:1,test:1")
    ap.add_argument("--split-salt", default="")
    ap.add_argument("--min-token-length", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from searchengine_spark.textops.pipeline import CleanConfig, clean_corpus
    from searchengine_spark.tokenizer import TokenizerConfig

    spark = SparkSession.builder.appName("searchengine_clean_corpus").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    cfg = CleanConfig(
        url_col=args.url_col,
        blocked_domains=(tuple(args.blocked_domains.split(","))
                         if args.blocked_domains else ()),
        blocked_url_substrings=(
            tuple(args.blocked_url_substrings.split(","))
            if args.blocked_url_substrings else ()),
        c4=args.c4,
        min_words=args.min_words,
        min_sentences=args.min_sentences,
        bad_words=tuple(args.bad_words.split(",")) if args.bad_words else (),
        pii=args.redact_pii,
        max_dup_line_frac=args.max_dup_line_frac,
        max_top_2gram_char_frac=args.max_top2gram_frac,
        max_dup_5gram_char_frac=args.max_dup5gram_frac,
        min_quality=args.min_quality,
        lang=args.lang,
        ppl_keep=(tuple(args.ppl_keep.split(",")) if args.ppl_keep else None),
        ppl_lm=spark.read.parquet(args.ppl_lm) if args.ppl_lm else None,
        dedup=args.dedup,
        jaccard_threshold=args.jaccard_threshold,
        eval_corpus=(
            spark.read.parquet(args.eval_corpus) if args.eval_corpus else None
        ),
        max_contaminated=args.max_contaminated,
        split=_parse_split(args.split) if args.split else None,
        split_salt=args.split_salt,
        tokenizer=TokenizerConfig(min_token_length=args.min_token_length),
    )
    docs_in = spark.read.parquet(args.input)
    bloom_pre = {}
    if args.bloom_state:
        from searchengine_spark.indexing import fsio
        from searchengine_spark.textops.sketches import (
            bloom_bits,
            bloom_merge,
            bloom_unseen,
        )

        man_path = fsio.join(args.bloom_state, "STATE.json")
        old_bits = None
        seq = 0
        if fsio.exists(spark, man_path):
            man = json.loads(fsio.read_text(spark, man_path))
            seq = int(man["seq"])
            old_bits = spark.read.parquet(
                fsio.join(args.bloom_state, man["path"]))
        bloom_pre["bloom_input"] = docs_in.count()
        if old_bits is not None:
            docs_in = bloom_unseen(docs_in, old_bits, args.bloom_col)
            docs_in = docs_in.persist()
        bloom_pre["bloom_unseen"] = docs_in.count()
        batch_bits = bloom_bits(docs_in, args.bloom_col)
        new_bits = (bloom_merge(old_bits, batch_bits)
                    if old_bits is not None else batch_bits)
        new_name = f"bits_{seq + 1}"
        new_bits.write.mode("overwrite").parquet(
            fsio.join(args.bloom_state, new_name))
        fsio.write_text(spark, man_path, json.dumps(
            {"seq": seq + 1, "path": new_name}))
    out, stats = clean_corpus(docs_in, cfg)
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"stages": {**bloom_pre, **stats},
                      "output": args.output}))


if __name__ == "__main__":
    main()
