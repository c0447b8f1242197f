"""Multimodal kernel edge gates: NULL/empty/odd-size payloads must yield
deterministic rows (fixed feature dim), never a task-killing numpy error."""

from __future__ import annotations

import hashlib

from searchengine_spark.textops.multimodal import extract_features, resize_images


def _payloads(spark):
    rows = [
        (0, hashlib.md5(b"full").digest()),  # 16 bytes (the fixture shape)
        (1, b"0123456789"),  # 10 bytes: not a multiple of 4
        (2, b"12345678"),  # 8 bytes: used to yield a 2-dim feature
        (3, b""),  # empty
        (4, None),  # NULL payload
        (5, b"ab"),  # shorter than one feature group
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_extract_features_fixed_dim_any_size(spark):
    docs = _payloads(spark)
    got = {r["doc_id"]: r for r in extract_features(docs).collect()}
    assert set(got) == set(range(6))
    for d, r in got.items():
        assert len(r["feature"]) == 4, d  # fixed dim, zero-padded
    assert got[3]["n_bytes"] == 0 and got[3]["checksum"] == 0
    assert got[4]["n_bytes"] == 0
    assert got[3]["feature"] == [0.0] * 4
    # 8-byte payload: first two groups are real means, the rest zero-pad
    assert got[2]["feature"][2:] == [0.0, 0.0]


def test_resize_images_null_and_empty(spark):
    docs = _payloads(spark)
    got = {r["doc_id"]: r for r in resize_images(docs, out_len=4).collect()}
    assert got[3]["out_bytes"] == 0 and got[3]["resized"] == bytearray(b"")
    assert got[4]["out_bytes"] == 0 and got[4]["checksum"] == 0
    assert got[0]["out_bytes"] == 4  # real payloads still resample
    assert got[1]["out_bytes"] == 4


def test_decode_stub_path_without_libs():
    """In a container without Pillow/soundfile the decoders refuse
    loudly; where a lib IS present the stub branch must not fire (the
    optional-dependency contract)."""
    import pytest

    from searchengine_spark.textops.multimodal import (
        _pil_image,
        _soundfile,
        decode_audio,
        decode_image,
    )

    if _pil_image() is None:
        with pytest.raises(NotImplementedError, match="Pillow"):
            decode_image(b"\x89PNG\r\n")
    if _soundfile() is None:
        with pytest.raises(NotImplementedError, match="soundfile"):
            decode_audio(b"RIFF")


def test_decode_image_real_kernel():
    """Real decode path — skips cleanly where Pillow is absent."""
    import io

    import numpy as np
    import pytest

    Image = pytest.importorskip("PIL.Image")
    from searchengine_spark.textops.multimodal import decode_image

    im = Image.new("RGB", (4, 2), (10, 20, 30))
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    arr = decode_image(buf.getvalue())
    assert arr.shape == (2, 4, 3) and arr.dtype == np.uint8
    assert (arr == np.array([10, 20, 30], dtype=np.uint8)).all()


def test_decode_audio_real_kernel():
    """Real decode path — skips cleanly where soundfile is absent."""
    import io

    import numpy as np
    import pytest

    sf = pytest.importorskip("soundfile")
    from searchengine_spark.textops.multimodal import decode_audio

    wave = (np.sin(np.linspace(0, 3.0, 800)) * 0.5).astype(np.float32)
    buf = io.BytesIO()
    sf.write(buf, wave, 8000, format="WAV")
    data, rate = decode_audio(buf.getvalue())
    assert rate == 8000 and data.shape == (800, 1)
    assert np.abs(data[:, 0] - wave).max() < 1e-3  # 16-bit PCM round-trip
