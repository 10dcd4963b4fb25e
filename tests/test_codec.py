"""Codec round-trip + property tests (reference test model: SURVEY §5)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from fulltextsearch_spark.operators import codec


def test_varint_known_values():
    vals = np.array([0, 1, 127, 128, 300, 2**32, 2**63], dtype=np.uint64)
    buf = codec.varint_encode(vals)
    out = codec.varint_decode(buf)
    assert out.tolist() == vals.tolist()
    # single-byte values stay single-byte (LEB128)
    assert len(codec.varint_encode(np.array([5], dtype=np.uint64))) == 1
    assert codec.varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**63 - 1), min_size=0, max_size=500
    )
)
def test_varint_roundtrip(values):
    a = np.array(values, dtype=np.uint64)
    assert codec.varint_decode(codec.varint_encode(a)).tolist() == values


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10**9),  # doc
            st.integers(min_value=1, max_value=5),  # field
            st.integers(min_value=1, max_value=10**6),  # pos
        ),
        min_size=1,
        max_size=400,
        unique=True,
    )
)
def test_block_roundtrip(occs):
    occs = sorted(occs)
    d = np.array([o[0] for o in occs], dtype=np.int64)
    f = np.array([o[1] for o in occs], dtype=np.int64)
    p = np.array([o[2] for o in occs], dtype=np.int64)
    for enc, dec in (
        (codec.encode_block, codec.decode_block),
        (codec.encode_block_gv, codec.decode_block_gv),
        (codec.encode_block_packed, codec.decode_block_packed),
        (codec.encode_block_binary, codec.decode_block_binary),
    ):
        payload = enc(d, f, p)
        dd, ff, pp = dec(payload)
        assert dd.tolist() == d.tolist()
        assert ff.tolist() == f.tolist()
        assert pp.tolist() == p.tolist()


def test_lower_bound_seek():
    d = np.arange(1, 1001, dtype=np.int64)
    f = np.ones(1000, dtype=np.int64)
    p = np.ones(1000, dtype=np.int64)
    payload = codec.encode_block(d, f, p)
    dd, _, _ = codec.decode_block_lower_bound(payload, 500)
    assert dd[0] == 500 and len(dd) == 501


def test_compression_beats_raw():
    # dense doc ids delta-compress far below 24 bytes/occurrence
    d = np.arange(1, 5001, dtype=np.int64)
    f = np.ones(5000, dtype=np.int64)
    p = np.ones(5000, dtype=np.int64)
    payload = codec.encode_block(d, f, p)
    assert len(payload) < 5000 * 4
