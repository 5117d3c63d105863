"""Per-doc field n-gram Bloom signatures ("fieldsigs") — the sidecar that
lets WAND phase 1 prove a query token is ABSENT from a doc's title /
description / content_snippet without ever seeing the metadata.

Why: the per-posting boost flags (operators/shards.py FLAG_*) resolve a
query token's field presence only for docs that carry a posting for it.
Tokens with NO postings anywhere — stopwords (never indexed) and
out-of-vocabulary words — stay *unknown* for every doc, and unknown tokens
are what keeps the kernel's boost upper bound above 1.0 and candidate
emission large on tie-heavy corpora (plans/wand.py module doc). A Bloom
filter over each field's character 3-grams gives one-sided resolution:

* a token whose 3-grams are all present in the field's filter is *possibly*
  a substring (stays unknown — sound, never overclaims presence);
* a token with ANY 3-gram missing is **definitely not a substring** of the
  field (3-grams of a substring are substrings), which tightens the boost
  upper bound and, for tokens that are themselves substrings of the query,
  rules the field's phrase boost out (field ⊉ token ⇒ field ⊉ query).

Storage: one uint32-word vector per doc — 2 words (64 bits) for the title,
4 (128) for the description, 8 (256) for the snippet, sized to the
reference's field-length profile (title ~40 chars → fill ≈ 0.45; desc/
snippet ≈ 0.5-0.6; a 4-gram token then proves absence for ~85-96 % of
non-containing docs per field). The 14 words/doc ride INSIDE the blocks
table as a single pseudo-term row per shard (operators/shards.py
``fieldsig_block_rows``): co-partitioned with the postings, scanned — never
shuffled — at query time, ~35 B/doc on disk vs ~350 B/doc of metadata.
32-bit words (not 64) so the values survive the merge path's
float64-mediated varint re-encode exactly.

Determinism: build side (``sig_words``) and query side (``token_bits``)
share `_gram_hashes`; both operate on UTF-8 bytes of lowercased text, so a
signature written by any build is readable by any query process.
"""

from __future__ import annotations

import numpy as np

# pseudo-term key for the per-shard signature rows inside the blocks table.
# "\x00" sorts before every real term and can never equal one (tokenizers
# strip control characters), so real-term IN-list scans never match it.
SIG_TERM = "\x00fieldsig"

# uint32 words per field; total words per doc
SIG_WORDS_TITLE = 2
SIG_WORDS_DESC = 4
SIG_WORDS_SNIPPET = 8
SIG_WORDS = SIG_WORDS_TITLE + SIG_WORDS_DESC + SIG_WORDS_SNIPPET
# [start, end) word slices per field in the per-doc vector
FIELD_SLICES = {
    "title": (0, SIG_WORDS_TITLE),
    "description": (SIG_WORDS_TITLE, SIG_WORDS_TITLE + SIG_WORDS_DESC),
    "snippet": (SIG_WORDS_TITLE + SIG_WORDS_DESC, SIG_WORDS),
}

_MULT = np.uint32(2654435761)  # Knuth multiplicative-hash constant (public)


def _gram_hashes(data: bytes) -> np.ndarray:
    """32-bit hashes of every 3-byte window of ``data`` (vectorized;
    uint32 wraps mod 2^32 — deterministic across build and query side)."""
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint32)
    if b.size < 3:
        return np.empty(0, dtype=np.uint32)
    return (b[:-2] * np.uint32(131071) + b[1:-1] * np.uint32(8191) + b[2:]) * _MULT


def _field_batch_bits(
    texts, n_words: int, out: np.ndarray, col_offset: int
) -> None:
    """OR every doc's field-gram bits into ``out[:, col_offset:+n_words]``.

    Fully batch-vectorized — ONE hash pass over the concatenated field
    bytes and ONE sort + ``bitwise_or.reduceat`` scatter for the whole
    Arrow batch. (A per-doc ``np.bitwise_or.at`` loop costs hundreds of µs
    per doc from unbuffered-ufunc overhead — at 10^6 docs that is minutes
    of tokenize-stage CPU; this path is ~100× cheaper.)"""
    # Concatenate with a 2-byte NUL separator per doc: hash EVERY window of
    # the concatenation (no per-doc index construction, no fancy-index
    # gather) and zero the mask of any window touching a NUL. A zero mask
    # ORs nothing, so separator windows are inert; and since a query token
    # never contains NUL, every one of its grams inside a real field still
    # sets its bit — one-sidedness (absence-proof soundness) is preserved
    # even for pathological fields that embed NUL bytes.
    # isinstance guard: pandas delivers missing strings as float NaN
    bufs = [
        t.lower().encode("utf-8") if isinstance(t, str) and t else b""
        for t in texts
    ]
    cat = b"".join(b + b"\x00\x00" for b in bufs)
    if len(cat) < 3:
        return
    counts = np.array([len(b) + 2 for b in bufs], dtype=np.int64)
    counts[-1] -= 2  # the final separator has no trailing windows
    b8 = np.frombuffer(cat, dtype=np.uint8)
    b0, b1, b2 = b8[:-2], b8[1:-1], b8[2:]
    # the ONE shared hash (same function the query side probes with — an
    # inline near-copy here once diverged via numpy value-based uint16
    # promotion of a uint8*scalar term, a silent soundness hazard)
    h = _gram_hashes(cat)
    bits = h & np.uint32(32 * n_words - 1)  # widths are powers of two
    w = (bits >> np.uint32(5)).astype(np.int64)
    masks = (np.uint32(1) << (bits & np.uint32(31))).astype(np.uint32)
    masks[(b0 == 0) | (b1 == 0) | (b2 == 0)] = 0
    doc_idx = np.repeat(np.arange(len(bufs), dtype=np.int64), counts)
    # doc_idx is already sorted; a boolean-selected subsequence stays
    # sorted, so each word column reduces with ONE reduceat — no global
    # argsort. n_words ≤ 8 passes of vectorized selects beat an
    # O(m log m) sort on the full gram stream.
    for j in range(n_words):
        sel = w == j
        if not sel.any():
            continue
        d_sel = doc_idx[sel]
        m_sel = masks[sel]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(d_sel)) + 1))
        ors = np.bitwise_or.reduceat(m_sel, starts)
        out[d_sel[starts], col_offset + j] |= ors


def sig_words_batch(titles, descs, snippets) -> np.ndarray:
    """(n, SIG_WORDS) uint32 signature matrix for a batch of docs. Fields
    are lowercased here — the same normalization the boost chain applies
    (bm25.boost_chain_expr); None ≡ empty ≡ all-absent."""
    n = len(titles)
    out = np.zeros((n, SIG_WORDS), dtype=np.uint32)
    for texts, field in ((titles, "title"), (descs, "description"), (snippets, "snippet")):
        a, z = FIELD_SLICES[field]
        _field_batch_bits(texts, z - a, out, a)
    return out


def sig_words(title: str | None, desc: str | None, snippet: str | None) -> np.ndarray:
    """One doc's signature vector (batch-of-one convenience wrapper)."""
    return sig_words_batch([title], [desc], [snippet])[0]


def token_bits(token: str) -> dict[str, list[tuple[int, np.uint32]]] | None:
    """Per-field (word_index, bitmask) probes for a query token, with word
    indices LOCAL to the field's slice. None for tokens shorter than 3
    bytes (no 3-gram → the filter cannot speak; caller keeps them
    unknown)."""
    h = _gram_hashes(token.lower().encode("utf-8"))
    if h.size == 0:
        return None
    out: dict[str, list[tuple[int, np.uint32]]] = {}
    for field, (a, z) in FIELD_SLICES.items():
        n_words = z - a
        bits = h & np.uint32(32 * n_words - 1)
        w = (bits >> np.uint32(5)).astype(np.int64)
        masks = (np.uint32(1) << (bits & np.uint32(31))).astype(np.uint32)
        # dedup (word, mask) pairs — repeated grams probe the same bit
        out[field] = sorted({(int(wi), np.uint32(m)) for wi, m in zip(w, masks)})
    return out


def absent_mask(
    W: np.ndarray, field: str, probes: dict[str, list[tuple[int, np.uint32]]]
) -> np.ndarray:
    """Boolean array over the rows of ``W`` (n_docs × SIG_WORDS uint32):
    True where the token is PROVABLY absent from ``field`` (≥1 probe bit
    clear). False = possibly present (sound: never claims presence)."""
    a, _z = FIELD_SLICES[field]
    possible = np.ones(len(W), dtype=bool)
    for wi, mask in probes[field]:
        possible &= (W[:, a + wi] & mask) != 0
    return ~possible
