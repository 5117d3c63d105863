"""Delta-gap + varint posting-block codec (vectorized numpy, no per-row Python).

The reference's only posting compression is whole-pickle gzip
(optimized_indexer.py:238-248). At 10^12-doc scale postings need real
block compression: classic LEB128 varints over delta-gapped docnos, the
standard inverted-index layout (Manning/Raghavan/Schütze IR ch.5), stored as
parquet binary columns (zstd/snappy on top).

Posting rows carry integral values by construction — tf is a sum of the
integer field weights 5/3/1 (indexer.py:92-107) and doc_len is a sum of tfs
— so postings quantize losslessly to uint64 (round-trip property-tested).

A block covers up to POSTING_BLOCK_SIZE docnos of one term, sorted by docno,
and carries (n, min_docno, max_docno, max_tf, min_dl) metadata — the
block-max upper-bound inputs for WAND (plans/wand.py).

Encode/decode are numpy-vectorized: byte counts via threshold comparison,
scatter-fill per 7-bit group; decode reconstructs group ids from
continuation bits with cumsum — no Python-level per-value loops.
"""

from __future__ import annotations

import numpy as np

_THRESHOLDS = [1 << (7 * k) for k in range(1, 10)]


def varint_byte_counts(values: np.ndarray) -> np.ndarray:
    """Per-value encoded byte count (LEB128) — lets callers slice a
    concatenated encode into sub-ranges without re-encoding."""
    v = np.asarray(values, dtype=np.uint64)
    nb = np.ones(v.shape, dtype=np.int64)
    for t in _THRESHOLDS:
        nb += (v >= np.uint64(t)).astype(np.int64)
    return nb


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nb = varint_byte_counts(v)
    offsets = np.concatenate(([0], np.cumsum(nb)[:-1]))
    total = int(nb.sum())
    out = np.zeros(total, dtype=np.uint8)
    maxnb = int(nb.max())
    for k in range(maxnb):
        mask = nb > k
        byte = ((v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nb[mask] - 1 > k).astype(np.uint8) << 7
        out[offsets[mask] + k] = byte | cont
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes → uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = (b & 0x80) == 0
    n = int(ends.sum())
    group = np.zeros(b.size, dtype=np.int64)
    group[1:] = np.cumsum(ends)[:-1]
    starts = np.concatenate(([0], np.flatnonzero(ends) + 1))[:n]
    pos = np.arange(b.size, dtype=np.int64) - starts[group]
    vals = np.zeros(n, dtype=np.uint64)
    np.bitwise_or.at(
        vals, group, (b & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * pos.astype(np.uint64))
    )
    return vals


def encode_postings(docnos: np.ndarray, tfs: np.ndarray, dls: np.ndarray) -> tuple[bytes, bytes, bytes]:
    """One block: sorted docnos → delta gaps; tf/doc_len as integral varints."""
    docnos = np.asarray(docnos, dtype=np.uint64)
    gaps = np.empty_like(docnos)
    if docnos.size:
        gaps[0] = docnos[0]
        np.subtract(docnos[1:], docnos[:-1], out=gaps[1:])
    tfs_i = np.asarray(tfs, dtype=np.float64)
    dls_i = np.asarray(dls, dtype=np.float64)
    tfs_u = tfs_i.astype(np.uint64)
    dls_u = dls_i.astype(np.uint64)
    if not (np.all(tfs_u == tfs_i) and np.all(dls_u == dls_i)):
        raise ValueError("non-integral tf/doc_len cannot be varint-quantized")
    return varint_encode(gaps), varint_encode(tfs_u), varint_encode(dls_u)


def decode_postings(gaps_buf: bytes, tfs_buf: bytes, dls_buf: bytes):
    """Inverse of encode_postings → (docnos, tfs, dls) float64/uint64 arrays."""
    gaps = varint_decode(gaps_buf)
    docnos = np.cumsum(gaps, dtype=np.uint64)
    tfs = varint_decode(tfs_buf).astype(np.float64)
    dls = varint_decode(dls_buf).astype(np.float64)
    return docnos, tfs, dls


def encode_positions(counts: np.ndarray, positions: np.ndarray) -> tuple[bytes, bytes]:
    """Positional payload for one block: per-posting position counts +
    delta-gapped in-document token positions, concatenated in posting order.

    ``counts[i]`` = number of positions for posting i; ``positions`` is the
    flat concatenation (each posting's positions strictly increasing). The
    classic positional-index layout (Manning/Raghavan/Schütze IR §2.4.2):
    gaps reset at each posting boundary so every stream stays small-varint.
    """
    counts = np.asarray(counts, dtype=np.uint64)
    positions = np.asarray(positions, dtype=np.uint64)
    if int(counts.sum()) != positions.size:
        raise ValueError("position count/stream mismatch")
    gaps = np.empty_like(positions)
    if positions.size:
        gaps[0] = positions[0]
        np.subtract(positions[1:], positions[:-1], out=gaps[1:])
        starts = np.concatenate(([0], np.cumsum(counts)[:-1])).astype(np.int64)
        starts = starts[np.asarray(counts, dtype=np.int64) > 0]
        gaps[starts] = positions[starts]
    return varint_encode(counts), varint_encode(gaps)


def decode_positions(counts_buf: bytes, gaps_buf: bytes):
    """Inverse of encode_positions → (counts:int64[], positions:uint64[] flat).

    Split the flat stream per posting with
    ``np.split(positions, np.cumsum(counts)[:-1])`` when per-posting lists
    are needed; scoring kernels mostly consume the flat layout directly.
    """
    counts = varint_decode(counts_buf).astype(np.int64)
    gaps = varint_decode(gaps_buf)
    if gaps.size == 0:
        return counts, np.empty(0, dtype=np.uint64)
    raw = np.cumsum(gaps, dtype=np.uint64)
    nz = counts > 0
    starts = np.concatenate(([0], np.cumsum(counts)[:-1])).astype(np.int64)[nz]
    # undo the cross-posting cumsum carry: each posting's positions are the
    # raw running sum minus the running sum just before the posting started
    base = np.zeros(starts.size, dtype=np.uint64)
    base[1:] = raw[starts[1:] - 1]
    positions = raw - np.repeat(base, counts[nz])
    return counts, positions
