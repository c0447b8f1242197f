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


def with_video_payload(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake VIDEO payload: n_frames = 1 + doc_id % 4 frames,
    frame i = md5(text + '#' + i) (16 bytes each), concatenated — plus the
    typed metadata struct. Payload construction is the only fake part; the
    sampling/decode plumbing downstream treats it as opaque binary."""
    nf = (F.col(id_col) % 4 + 1).cast("int")
    hexcat = F.aggregate(
        F.sequence(F.lit(0), nf - 1),
        F.lit(""),
        lambda acc, i: F.concat(
            acc, F.md5(F.concat_ws("#", F.col(text_col), i.cast("string")))
        ),
    )
    return docs.withColumn("payload", F.unhex(hexcat)).withColumn(
        "modality", F.lit("video/fake")
    ).withColumn(
        "meta",
        F.struct(
            F.lit(4).cast("int").alias("width"),
            F.lit(4).cast("int").alias("height"),
            nf.alias("n_frames"),
            F.lit(0).cast("int").alias("sample_rate"),
        ),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("out_bytes", T.LongType(), False),
        T.StructField("resized", T.BinaryType(), False),
        T.StructField("checksum", T.LongType(), False),
    ]
)


def resize_images(docs_with_payload: DataFrame, out_len: int = 4) -> DataFrame:
    """'Resize' binary image payloads to ``out_len`` bytes by
    nearest-neighbor index sampling (idx_j = floor(j * n / out_len)) —
    the real resampling arithmetic over the fake payloads; swap the kernel
    body for Pillow's resize where the lib exists. Arrow-batched
    mapInPandas, same batch/schema shape as a real decoder."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": pdf["doc_id"].astype(np.int64), "out_bytes": [],
                    "resized": [], "checksum": []}
            for buf in pdf["payload"]:
                b = np.frombuffer(
                    bytes(buf) if buf is not None else b"", dtype=np.uint8
                )
                if b.size == 0:
                    # NULL/empty payload: deterministic empty output row,
                    # never an IndexError that kills the whole task
                    rows["out_bytes"].append(0)
                    rows["resized"].append(b"")
                    rows["checksum"].append(0)
                    continue
                idx = (np.arange(out_len, dtype=np.int64) * b.size) // out_len
                r = b[idx]
                rows["out_bytes"].append(int(r.size))
                rows["resized"].append(r.tobytes())
                rows["checksum"].append(int(r.astype(np.int64).sum()))
            yield pd.DataFrame(rows)

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        kernel, schema=RESIZED_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("checksum", T.LongType(), False),  # nibble sum
    ]
)


def sample_frames(video_docs: DataFrame, every_k: int = 2, frame_bytes: int = 16) -> DataFrame:
    """Sample every ``every_k``-th frame from fixed-frame-size video
    payloads -> one row per sampled frame (doc_id, frame_idx, stats).
    Frame count comes from the metadata struct; the payload is sliced as
    opaque binary — exactly the shape a real ffmpeg-backed sampler has."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_nb, out_ck = [], [], [], []
            for doc, buf, nf in zip(
                pdf["doc_id"], pdf["payload"], pdf["n_frames"]
            ):
                b = np.frombuffer(bytes(buf), dtype=np.uint8)
                for i in range(0, int(nf), every_k):
                    fr = b[i * frame_bytes : (i + 1) * frame_bytes]
                    out_doc.append(int(doc))
                    out_idx.append(i)
                    out_nb.append(int(fr.size))
                    out_ck.append(int((fr >> 4).sum() + (fr & 0x0F).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(out_doc, dtype=np.int64),
                    "frame_idx": np.asarray(out_idx, dtype=np.int32),
                    "n_bytes": np.asarray(out_nb, dtype=np.int64),
                    "checksum": np.asarray(out_ck, dtype=np.int64),
                }
            )

    return video_docs.select(
        "doc_id", "payload", F.col("meta.n_frames").alias("n_frames")
    ).mapInPandas(kernel, schema=FRAME_SCHEMA)


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
                b = np.frombuffer(
                    bytes(buf) if buf is not None else b"", dtype=np.uint8
                )
                n_bytes[i] = b.size
                # nibble sum == sum of hex-digit values (oracle-checkable)
                checksum[i] = int((b >> 4).sum() + (b & 0x0F).sum())
                # zero-pad to feature_dim*4 so variable-size payloads yield
                # FIXED-dim vectors (a 10-byte payload used to crash the
                # ragged reshape; an 8-byte one returned 2 dims, not 4)
                f = b[: feature_dim * 4].astype(np.float64)
                if f.size < feature_dim * 4:
                    f = np.pad(f, (0, feature_dim * 4 - f.size))
                f = f.reshape(feature_dim, 4).mean(axis=1)
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
