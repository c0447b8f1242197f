"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The decode kernels are OPTIONAL-DEPENDENCY: real Pillow/soundfile decode
where those libs import, a loud NotImplementedError where they don't
(this sandbox ships neither). Everything Spark-side is real and tested
either way: schema (binary + metadata struct), Arrow batch shape through
mapInPandas, partition sizing, and the deterministic fallback featurizer
used by tests.

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


def _pil_image():
    """Pillow's Image module when importable, else None — the decoders
    are OPTIONAL-dependency: real decode where the lib exists, a loud
    NotImplementedError where it doesn't (this sandbox ships no media
    libs; the deterministic fake featurizer covers the plumbing)."""
    try:
        from PIL import Image  # noqa: PLC0415
        return Image
    except ImportError:
        return None


def _soundfile():
    try:
        import soundfile  # noqa: PLC0415
        return soundfile
    except ImportError:
        return None


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an encoded image payload (PNG/JPEG/...) to an HxWx3 uint8
    RGB array via Pillow when it is importable; raises
    NotImplementedError otherwise. Swap into extract_features' kernel in
    a container that has the lib — batch shape and schema are already
    decoder-shaped."""
    Image = _pil_image()
    if Image is None:
        raise NotImplementedError(
            "image decode requires Pillow (not installed); "
            "use the deterministic fake featurizer for plumbing tests"
        )
    import io

    with Image.open(io.BytesIO(payload)) as im:
        return np.asarray(im.convert("RGB"))


def decode_audio(payload: bytes) -> "tuple[np.ndarray, int]":
    """Decode an encoded audio payload (WAV/FLAC/...) to
    ``(samples float32 [n, channels], sample_rate)`` via soundfile when
    it is importable; raises NotImplementedError otherwise."""
    sf = _soundfile()
    if sf is None:
        raise NotImplementedError(
            "audio decode requires soundfile (not installed); "
            "use the deterministic fake featurizer for plumbing tests"
        )
    import io

    data, rate = sf.read(io.BytesIO(payload), dtype="float32",
                         always_2d=True)
    return np.asarray(data, dtype=np.float32), int(rate)


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
