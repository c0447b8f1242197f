"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real decode (image/audio/video) libraries are NOT in this container, so the
decode kernels are STUBS — but everything Spark-side is real and tested:
schema (binary + metadata struct), Arrow batch shape through mapInPandas,
partition sizing, and the deterministic fallback featurizer used by tests.

Layout convention for a 100 TB multimodal corpus:
  (doc_id long, modality string, payload binary, meta struct<width:int,
   height:int, n_frames:int, sample_rate:int>)
Payloads live in the parquet row (small) or as object-store pointers
(large); either way the decode stage is a mapInPandas over batches, which
is exactly what this module implements.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("checksum", T.LongType(), False),  # sum of byte nibbles
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def decode_image(payload: bytes) -> np.ndarray:
    """Stub — Pillow/opencv not installed in this container."""
    raise NotImplementedError(
        "image decode requires Pillow/opencv (not in container); "
        "use deterministic_features for plumbing tests"
    )


def decode_audio(payload: bytes) -> np.ndarray:
    """Stub — soundfile/librosa not installed in this container."""
    raise NotImplementedError("audio decode requires soundfile (not in container)")


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive a deterministic fake payload column from text (md5 -> 16
    bytes) so the binary plumbing is exercisable without real media."""
    return docs.withColumn("payload", F.unhex(F.md5(F.col(text_col)))).withColumn(
        "modality", F.lit("image/fake")
    )


def extract_features(docs_with_payload: DataFrame, feature_dim: int = 4) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The kernel here is the deterministic fallback (byte statistics); swap
    the inner function for a real decoder (decode_image + model) in a
    container that has the media libs. Batch shape, schema and partition
    behavior are identical either way.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            n_bytes = np.empty(n, dtype=np.int64)
            checksum = np.empty(n, dtype=np.int64)
            feats = []
            for i, buf in enumerate(pdf["payload"]):
                b = np.frombuffer(bytes(buf), dtype=np.uint8)
                n_bytes[i] = b.size
                # nibble sum == sum of hex-digit values (oracle-checkable)
                checksum[i] = int((b >> 4).sum() + (b & 0x0F).sum())
                f = b[: feature_dim * 4].astype(np.float64)
                f = f.reshape(-1, 4).mean(axis=1) if f.size >= 4 else np.zeros(feature_dim)
                feats.append((f / 255.0).round(6).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype(np.int64),
                    "n_bytes": n_bytes,
                    "checksum": checksum,
                    "feature": feats,
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        featurize, schema=FEATURE_SCHEMA
    )
