"""Delta-gap + variable-byte posting codec, vectorized in numpy.

The reference serializes postings as plain text 'doc:freq' lines
(src/models/spimi.py:230, src/models/rankers/bm25.py:59-63, no compression
anywhere — SURVEY.md §1.3). At 10^12 turns that is untenable; the north_star
mandates delta-gap + varbyte compressed postings with per-term block-max
metadata, which is what this module provides (classic IR layout: Manning,
Raghavan & Schütze, IIR §5.3).

Payload layout per posting chunk (doc-sorted ascending):
    varbyte stream of interleaved triples (doc_gap, tf, dlq) where
      doc_gap = doc_id[0] for the first posting, doc_id[i]-doc_id[i-1] after;
      tf      = term frequency;
      dlq     = round(dl_norm*1000) — the 3-dp-rounded dl/avgdl
                (bm25.py:76-81) quantized losslessly, so the packed index is
                SELF-CONTAINED for BM25 scoring (no doc_lengths join at query
                time; dlq/1000.0 reproduces the stored double bit-for-bit).

Block-max metadata: for fixed BLOCK postings, (last_doc, max tf_sat) where
tf_sat is the BM25 saturation term at the build's (k, b) — exact per-block
upper bounds for WAND/MaxScore pruning (Broder et al. 2003; Ding & Suel
2011 block-max).

All encode/decode paths are O(bytes) numpy, no per-value Python loops
(bounded 10-iteration byte-fill loop only).
"""

from __future__ import annotations

import numpy as np

BLOCK = 128  # postings per block-max block


def varbyte_encode(values: np.ndarray) -> bytes:
    """Varbyte (7-bit groups, MSB=continuation, little-endian groups)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbytes = np.ones(v.size, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += (tmp > 0).astype(np.int64)
        tmp = tmp >> np.uint64(7)
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    idx = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    cur = v.copy()
    remaining = nbytes.copy()
    for _ in range(10):  # uint64 -> at most 10 varbyte groups
        mask = remaining > 0
        if not mask.any():
            break
        byte = (cur[mask] & np.uint64(0x7F)).astype(np.uint8)
        byte |= ((remaining[mask] > 1).astype(np.uint8)) << 7
        out[idx[mask]] = byte
        cur[mask] = cur[mask] >> np.uint64(7)
        idx[mask] += 1
        remaining[mask] -= 1
    return out.tobytes()


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Byte-position loop (<=10 masked gather|shift passes), not a byte-level
    scatter-add: np.add.at is unbuffered and made decode the hot ~80% of a
    big-index query — this formulation decodes the same stream ~5-10x
    faster (one O(n_groups) pass per byte of the WIDEST group, so typical
    2-3-byte streams cost 2-3 vector passes)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    payload = (b & np.uint8(0x7F)).astype(np.uint64)
    ends = np.flatnonzero((b & 0x80) == 0)
    n = ends.size
    if n == b.size:  # all groups single-byte: the stream IS the values
        return payload
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    # np.take, not payload[idx]: fancy uint64 gathers show 20x timing
    # instability on some allocators/hosts; take is flat-fast
    values = np.take(payload, starts)
    for j in range(1, int(lens.max())):
        m = lens > j
        idx = np.compress(m, starts) + j
        values[m] |= np.take(payload, idx) << np.uint64(7 * j)
    return values


def tf_saturation(tf: np.ndarray, dl_norm: np.ndarray, k: float, b: float) -> np.ndarray:
    """BM25 saturation term (src/models/rankers/bm25.py:53)."""
    tf = tf.astype(np.float64)
    return (tf * (k + 1.0)) / (tf + k * (1.0 - b + b * dl_norm))


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray, dlqs: np.ndarray) -> bytes:
    """doc_ids must be sorted ascending and unique."""
    n = len(doc_ids)
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    gaps = np.empty(n, dtype=np.uint64)
    if n:
        gaps[0] = doc_ids[0]
        np.subtract(doc_ids[1:], doc_ids[:-1], out=gaps[1:].view(np.int64))
    inter = np.empty(3 * n, dtype=np.uint64)
    inter[0::3] = gaps
    inter[1::3] = np.asarray(tfs, dtype=np.uint64)
    inter[2::3] = np.asarray(dlqs, dtype=np.uint64)
    return varbyte_encode(inter)


def decode_postings(buf: bytes):
    """-> (doc_ids int64, tfs int64, dl_norm float64)"""
    vals = varbyte_decode(buf)
    gaps = vals[0::3].astype(np.int64)
    tfs = vals[1::3].astype(np.int64)
    dl_norm = vals[2::3].astype(np.float64) / 1000.0
    doc_ids = np.cumsum(gaps)
    return doc_ids, tfs, dl_norm


def _varbyte_lengths(v: np.ndarray) -> np.ndarray:
    """bytes needed per value (7-bit groups)."""
    nbytes = np.ones(v.size, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += (tmp > 0).astype(np.int64)
        tmp = tmp >> np.uint64(7)
    return nbytes


def encode_posting_groups(
    starts: np.ndarray,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dlqs: np.ndarray,
):
    """Vectorized multi-group postings encode.

    ``starts``: int64 group start offsets (ascending, starts[0]==0) into the
    flat, group-contiguous, doc-sorted-within-group arrays. Returns
    (buffers: list[bytes], first_doc, last_doc, counts) — ONE varbyte pass
    for the whole partition, sliced per group by computed byte offsets.
    This is what makes the segment encoder O(batch) instead of
    O(groups × python-call) (hot path of the index build)."""
    n = len(doc_ids)
    n_groups = len(starts)
    if n == 0:
        return [], np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.int64)
    ends = np.append(starts[1:], n)
    counts = ends - starts
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    gaps = np.empty(n, dtype=np.int64)
    gaps[1:] = doc_ids[1:] - doc_ids[:-1]
    gaps[starts] = doc_ids[starts]  # group-first posting stores absolute id
    inter = np.empty(3 * n, dtype=np.uint64)
    inter[0::3] = gaps.astype(np.uint64)
    inter[1::3] = np.asarray(tfs, dtype=np.uint64)
    inter[2::3] = np.asarray(dlqs, dtype=np.uint64)
    buf = varbyte_encode(inter)
    byte_lens = _varbyte_lengths(inter)
    cum = np.concatenate(([0], np.cumsum(byte_lens)))
    # byte range of group g = [cum[3*starts[g]], cum[3*ends[g]])
    b_starts = cum[3 * starts]
    b_ends = cum[3 * ends]
    mv = memoryview(buf)
    buffers = [bytes(mv[int(s):int(e)]) for s, e in zip(b_starts, b_ends)]
    first = doc_ids[starts]
    last = doc_ids[ends - 1]
    return buffers, first, last, counts


def encode_doc_groups(starts: np.ndarray, doc_ids: np.ndarray):
    """Boolean-payload twin of :func:`encode_posting_groups`: doc gaps ONLY
    (no tf, no dlq) — the reference's BooleanPostingList stores bare doc ids
    (src/models/posting_lists/boolean_posting_list.py), and a boolean-mode
    index is ~3x smaller for the same doc coverage. Returns
    (buffers, first_doc, last_doc, counts)."""
    n = len(doc_ids)
    if n == 0:
        return [], np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.int64)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.append(starts[1:], n)
    counts = ends - starts
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    gaps = np.empty(n, dtype=np.int64)
    gaps[1:] = doc_ids[1:] - doc_ids[:-1]
    gaps[starts] = doc_ids[starts]
    buf = varbyte_encode(gaps.astype(np.uint64))
    byte_lens = _varbyte_lengths(gaps.astype(np.uint64))
    cum = np.concatenate(([0], np.cumsum(byte_lens)))
    mv = memoryview(buf)
    buffers = [bytes(mv[int(cum[s]):int(cum[e])]) for s, e in zip(starts, ends)]
    return buffers, doc_ids[starts], doc_ids[ends - 1], counts


def decode_docs(buf: bytes) -> np.ndarray:
    """Boolean payload decode -> doc_ids int64."""
    gaps = varbyte_decode(buf).astype(np.int64)
    return np.cumsum(gaps)


def encode_position_groups(
    starts_occ: np.ndarray,
    posting_first_occ: np.ndarray,
    positions: np.ndarray,
):
    """Vectorized position-stream encode (positional payload sidecar).

    ``positions``: flat, occurrence-level token positions, grouped by
    posting (ascending within each posting). ``posting_first_occ``: int64
    occurrence index of each posting's first occurrence (ascending).
    ``starts_occ``: occurrence index where each (term, chunk) GROUP starts
    (subset of posting starts). Returns list[bytes], one per group: varbyte
    of per-posting delta-encoded positions (first absolute, rest gaps);
    decodable given the tf stream of the sibling frequency payload."""
    n = len(positions)
    if n == 0:
        return []
    positions = np.asarray(positions, dtype=np.int64)
    deltas = np.empty(n, dtype=np.int64)
    deltas[1:] = positions[1:] - positions[:-1]
    deltas[posting_first_occ] = positions[posting_first_occ]
    buf = varbyte_encode(deltas.astype(np.uint64))
    byte_lens = _varbyte_lengths(deltas.astype(np.uint64))
    cum = np.concatenate(([0], np.cumsum(byte_lens)))
    ends_occ = np.append(starts_occ[1:], n)
    mv = memoryview(buf)
    return [bytes(mv[int(cum[s]):int(cum[e])]) for s, e in zip(starts_occ, ends_occ)]


def decode_positions(buf: bytes, tfs: np.ndarray):
    """-> (flat_positions int64, occ_starts int64): per-posting absolute
    positions, vectorized (one varbyte pass + segmented cumsum)."""
    deltas = varbyte_decode(buf).astype(np.int64)
    occ_starts = np.concatenate(([0], np.cumsum(np.asarray(tfs, dtype=np.int64))[:-1]))
    csum = np.cumsum(deltas)
    # segmented cumsum: subtract the carry accumulated before each posting
    carry = np.zeros(len(deltas), dtype=np.int64)
    carry[occ_starts[1:]] = csum[occ_starts[1:] - 1]
    flat = csum - np.maximum.accumulate(carry)
    return flat, occ_starts


def block_max(doc_ids: np.ndarray, tfs: np.ndarray, dl_norm: np.ndarray, k: float, b: float):
    """-> (block_last_doc int64[], block_max_tfsat float64[]) per BLOCK."""
    n = len(doc_ids)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    sat = tf_saturation(np.asarray(tfs), np.asarray(dl_norm, np.float64), k, b)
    n_blocks = (n + BLOCK - 1) // BLOCK
    last = np.asarray(doc_ids)[np.minimum(np.arange(1, n_blocks + 1) * BLOCK - 1, n - 1)]
    mx = np.array([sat[i * BLOCK : (i + 1) * BLOCK].max() for i in range(n_blocks)])
    return last.astype(np.int64), mx
