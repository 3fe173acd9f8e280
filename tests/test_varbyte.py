import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from opensearch_loader_spark.functions.varbyte import (
    delta_decode,
    delta_encode,
    varbyte_decode,
    varbyte_encode,
)


def test_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0


def test_known_values():
    # single-byte values: terminator bit set
    assert varbyte_encode(np.array([0], dtype=np.uint64)) == bytes([0x80])
    assert varbyte_encode(np.array([1], dtype=np.uint64)) == bytes([0x81])
    assert varbyte_encode(np.array([127], dtype=np.uint64)) == bytes([0xFF])
    # 128 = 0b1_0000000 → groups [0, 1], little-endian, last flagged
    assert varbyte_encode(np.array([128], dtype=np.uint64)) == bytes([0x00, 0x81])


def test_roundtrip_simple():
    v = np.array([0, 1, 127, 128, 300, 2**20, 2**40, 2**63, 2**64 - 1], dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(v)), v)


def test_delta_roundtrip():
    docs = np.array([3, 7, 8, 100, 10_000, 10_001], dtype=np.uint64)
    gaps = delta_encode(docs)
    assert list(gaps) == [3, 4, 1, 92, 9900, 1]
    assert np.array_equal(delta_decode(gaps), docs)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
def test_varbyte_roundtrip_property(vals):
    v = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(v)), v)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**62), min_size=1, max_size=200, unique=True
    )
)
def test_delta_varbyte_roundtrip_property(vals):
    docs = np.array(sorted(vals), dtype=np.uint64)
    out = delta_decode(varbyte_decode(varbyte_encode(delta_encode(docs))))
    assert np.array_equal(out, docs)


def test_compression_actually_compresses():
    docs = np.arange(0, 100_000, 3, dtype=np.uint64)
    enc = varbyte_encode(delta_encode(docs))
    assert len(enc) < docs.size * 2  # gaps of 3 → 1 byte each (+first)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**62), min_size=1, max_size=300, unique=True
    ),
    st.integers(min_value=1, max_value=8),
)
def test_segmented_codecs_equal_per_segment(vals, n_segs):
    """varbyte_encode_segments / delta_encode_segments / delta_decode_segments
    must be exactly equivalent to the per-segment scalar calls — byte
    identity of every segment slice, value identity after decode."""
    from opensearch_loader_spark.functions.varbyte import (
        delta_decode_segments,
        delta_encode_segments,
        varbyte_encode_segments,
    )

    docs = np.array(sorted(vals), dtype=np.uint64)
    cuts = sorted({0} | {int(x) for x in
                   np.linspace(0, len(docs), n_segs, endpoint=False).astype(int)})
    starts = np.array(cuts, dtype=np.int64)
    ends = np.append(starts[1:], len(docs))
    gaps = delta_encode_segments(docs, starts)
    blob, off = varbyte_encode_segments(gaps, starts)
    for i, (s, e) in enumerate(zip(starts, ends)):
        want = varbyte_encode(delta_encode(docs[s:e]))
        assert blob[off[i]:off[i + 1]] == want
    lens = (ends - starts).astype(np.int64)
    back = delta_decode_segments(varbyte_decode(blob), lens)
    assert np.array_equal(back, docs)
