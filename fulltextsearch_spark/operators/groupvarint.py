"""Group-varint integer codec — parity with the reference's GroupVarInt
(Common/GroupVarInt.cs:49-259, SURVEY.md §2.C6).

Format (verified against the reference unit-test golden,
GroupVarIntTests.cs:6-11): groups of 4 uint32 values; a selector byte
packs four 2-bit (byte-length - 1) fields, value 1 in the high bits:

    selector = ((s1-1)<<6) | ((s2-1)<<4) | ((s3-1)<<2) | (s4-1)

followed by each value big-endian in s_i bytes. A trailing group with
fewer than 4 values pads the selector with zero lengths and writes only
the present values. Used as the optional parity codec; the primary
posting codec is operators/codec.py (delta+varint).

numpy-vectorized: encode computes all byte lengths/positions as arrays
and scatters at most 4 masked byte planes; decode walks only the
selector chain in Python (byte positions are data-dependent — one
cheap LUT step per GROUP of 4 values) and gathers value bytes
vectorized. Bit-exact with the original scalar implementation
(reference golden + round-trip property tests, test_parity_extras /
test_codec).
"""

from __future__ import annotations

import numpy as np

# selector byte -> the four (byte-length) fields, and total group payload
_LENS4 = np.array(
    [
        [((s >> 6) & 3) + 1, ((s >> 4) & 3) + 1, ((s >> 2) & 3) + 1, (s & 3) + 1]
        for s in range(256)
    ],
    dtype=np.int64,
)
_GROUP_PAYLOAD = _LENS4.sum(axis=1)
# plain-list LUT: the decode selector walk indexes a `bytes` object and
# a Python list — both C-level — instead of numpy scalars (~4x faster
# for the only sequential part of decode)
_GROUP_PAYLOAD_LIST = [int(x) for x in _GROUP_PAYLOAD]


def groupvarint_encode(values: np.ndarray | list[int]) -> bytes:
    vals = np.asarray(values, dtype=np.uint64)
    n = len(vals)
    if n == 0:
        return b""
    if (vals >> np.uint64(32)).any():
        raise OverflowError("groupvarint values must fit uint32")
    v = vals.astype(np.uint32)
    lens = (
        np.ones(n, dtype=np.int64)
        + (v >= np.uint32(1 << 8))
        + (v >= np.uint32(1 << 16))
        + (v >= np.uint32(1 << 24))
    )
    n_groups = (n + 3) // 4
    pad = n_groups * 4 - n
    lens_padded = np.concatenate([lens, np.ones(pad, dtype=np.int64)])
    lg = lens_padded.reshape(n_groups, 4)
    selectors = (
        ((lg[:, 0] - 1) << 6)
        | ((lg[:, 1] - 1) << 4)
        | ((lg[:, 2] - 1) << 2)
        | (lg[:, 3] - 1)
    ).astype(np.uint8)
    payload_before = np.cumsum(lens) - lens  # value-payload bytes before i
    gidx = np.arange(n, dtype=np.int64) // 4
    val_start = payload_before + gidx + 1  # + selectors of groups 0..gidx
    out = np.zeros(n_groups + int(lens.sum()), dtype=np.uint8)
    out[payload_before[0::4] + np.arange(n_groups, dtype=np.int64)] = selectors
    v64 = v.astype(np.uint64)
    for k in range(4):  # big-endian: byte k of an L-byte value
        mask = lens > k
        if not mask.any():
            break
        shift = ((lens[mask] - 1 - k) * 8).astype(np.uint64)
        out[val_start[mask] + k] = ((v64[mask] >> shift) & np.uint64(0xFF)).astype(
            np.uint8
        )
    return out.tobytes()


def groupvarint_decode(buf: bytes, count: int) -> np.ndarray:
    if count == 0:
        return np.empty(0, dtype=np.uint32)
    raw = bytes(buf)
    b = np.frombuffer(raw, dtype=np.uint8)
    n_groups = (count + 3) // 4
    # selector positions are a data-dependent chain: one cheap LUT step
    # per group (4 values), everything else vectorized
    sel_pos_l = [0] * n_groups
    sels_l = [0] * n_groups
    pos = 0
    glen = _GROUP_PAYLOAD_LIST
    for g in range(n_groups):
        sel_pos_l[g] = pos
        s = raw[pos]
        sels_l[g] = s
        pos += 1 + glen[s]
    sel_pos = np.array(sel_pos_l, dtype=np.int64)
    sels = np.array(sels_l, dtype=np.int64)
    lens_g = _LENS4[sels]  # (n_groups, 4)
    within = np.cumsum(lens_g, axis=1) - lens_g
    val_start = ((sel_pos + 1)[:, None] + within).reshape(-1)[:count]
    lens = lens_g.reshape(-1)[:count]
    out = np.zeros(count, dtype=np.uint64)
    for k in range(4):
        mask = lens > k
        if not mask.any():
            break
        out[mask] = (out[mask] << np.uint64(8)) | b[val_start[mask] + k].astype(
            np.uint64
        )
    return out.astype(np.uint32)
