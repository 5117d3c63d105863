"""Soundness properties of the per-doc field Bloom signatures
(functions/fieldsig.py). The filter is ONE-SIDED: it may only ever prove a
token ABSENT from a field; claiming absence for a genuinely-contained token
(a false negative) would make WAND's emission bounds drop true top-k docs,
so that property is the load-bearing one."""

import random

import numpy as np

from searchengine_spark.functions import fieldsig as fs


def _rand_text(rng, vocab, k):
    return " ".join(rng.choices(vocab, k=k))


VOCAB = (
    "spark join scan index merge window table stream batch dedup shard "
    "alpha beta gamma delta epsilon zeta smartest quantum garden archive"
).split()


def test_no_false_negatives_randomized():
    rng = random.Random(1234)
    titles = [_rand_text(rng, VOCAB, 5) for _ in range(500)]
    descs = [_rand_text(rng, VOCAB, 15) for _ in range(500)]
    snips = [_rand_text(rng, VOCAB, 30) for _ in range(500)]
    W = fs.sig_words_batch(titles, descs, snips)
    for i in range(500):
        for field, text in (
            ("title", titles[i]),
            ("description", descs[i]),
            ("snippet", snips[i]),
        ):
            # every substring of the field (token, prefix, cross-boundary
            # slice) must be 'possibly present'
            for tok in text.split():
                if len(tok) >= 3:
                    assert not fs.absent_mask(W[i : i + 1], field, fs.token_bits(tok))[0]
            for a in range(0, len(text) - 4, 7):  # cross-boundary slices
                sub = text[a : a + 5]
                if "\x00" not in sub and len(sub) >= 3:
                    assert not fs.absent_mask(
                        W[i : i + 1], field, fs.token_bits(sub)
                    )[0], (field, sub)


def test_empty_and_null_fields_all_absent():
    W = fs.sig_words_batch(["", None], ["", None], ["", None])
    assert (W == 0).all()
    probes = fs.token_bits("anything")
    for f in ("title", "description", "snippet"):
        assert fs.absent_mask(W, f, probes).all()


def test_nul_embedded_field_stays_sound():
    # a field containing NUL bytes: substrings on either side must still be
    # possibly-present (the separator trick may never eat real grams)
    W = fs.sig_words_batch(["abc\x00defgh"], [""], [""])
    assert not fs.absent_mask(W, "title", fs.token_bits("abc"))[0]
    assert not fs.absent_mask(W, "title", fs.token_bits("defgh"))[0]


def test_batch_equals_scalar():
    rng = random.Random(7)
    titles = [_rand_text(rng, VOCAB, 4) for _ in range(50)]
    descs = [_rand_text(rng, VOCAB, 10) for _ in range(50)]
    snips = [_rand_text(rng, VOCAB, 20) for _ in range(50)]
    B = fs.sig_words_batch(titles, descs, snips)
    for i in range(50):
        assert (B[i] == fs.sig_words(titles[i], descs[i], snips[i])).all()


def test_short_tokens_return_none():
    assert fs.token_bits("") is None
    assert fs.token_bits("ab") is None
    assert fs.token_bits("abc") is not None


def test_absence_resolution_rate_is_high():
    # non-containing vocab must be provably absent for the vast majority of
    # docs — the whole point of the sidecar (a regression here silently
    # re-inflates WAND candidate emission)
    rng = random.Random(99)
    titles = [_rand_text(rng, VOCAB, 5) for _ in range(2000)]
    descs = [_rand_text(rng, VOCAB, 15) for _ in range(2000)]
    snips = [_rand_text(rng, VOCAB, 30) for _ in range(2000)]
    W = fs.sig_words_batch(titles, descs, snips)
    foreign = ["fujukely", "wejorution", "profession", "career", "nuteb"]
    for f in ("title", "description", "snippet"):
        rate = float(
            np.mean([fs.absent_mask(W, f, fs.token_bits(t)).mean() for t in foreign])
        )
        assert rate > 0.9, (f, rate)
