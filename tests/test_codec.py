"""Property tests for the delta-gap + varint posting codec
(operators/codec.py): decode(encode(x)) == x (FIXTURES.md §3 /
SURVEY.md §5.4)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_spark.operators import codec


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**63 - 1), min_size=0, max_size=300
    )
)
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(codec.varint_decode(codec.varint_encode(arr)), arr)


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200, unique=True),
    st.data(),
)
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip(docnos, data):
    docnos = np.sort(np.array(docnos, dtype=np.uint64))
    n = len(docnos)
    tfs = np.array(
        data.draw(st.lists(st.integers(1, 10**6), min_size=n, max_size=n)),
        dtype=np.float64,
    )
    dls = np.array(
        data.draw(st.lists(st.integers(0, 10**9), min_size=n, max_size=n)),
        dtype=np.float64,
    )
    g, t, dl = codec.encode_postings(docnos, tfs, dls)
    d2, t2, dl2 = codec.decode_postings(g, t, dl)
    assert np.array_equal(d2, docnos)
    assert np.array_equal(t2, tfs)
    assert np.array_equal(dl2, dls)


def test_single_byte_gaps_compress():
    """Contiguous docnos (range-sharded layout) → 1 byte per gap."""
    docnos = np.arange(1000, 2000, dtype=np.uint64)
    g, _, _ = codec.encode_postings(
        docnos, np.ones(1000), np.full(1000, 100.0)
    )
    # first value 1000 needs 2 bytes; remaining 999 gaps of 1 need 1 byte each
    assert len(g) == 2 + 999


def test_non_integral_tf_rejected():
    import pytest

    with pytest.raises(ValueError):
        codec.encode_postings(
            np.array([1], dtype=np.uint64), np.array([1.5]), np.array([2.0])
        )
