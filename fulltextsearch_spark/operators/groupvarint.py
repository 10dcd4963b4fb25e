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
"""

from __future__ import annotations

import numpy as np


def _byte_len(v: int) -> int:
    if v < (1 << 8):
        return 1
    if v < (1 << 16):
        return 2
    if v < (1 << 24):
        return 3
    return 4


def groupvarint_encode(values: np.ndarray | list[int]) -> bytes:
    vals = [int(v) for v in values]
    out = bytearray()
    for g in range(0, len(vals), 4):
        group = vals[g : g + 4]
        lens = [_byte_len(v) for v in group] + [1] * (4 - len(group))
        sel = (
            ((lens[0] - 1) << 6)
            | ((lens[1] - 1) << 4)
            | ((lens[2] - 1) << 2)
            | (lens[3] - 1)
        )
        out.append(sel)
        for v, ln in zip(group, lens):
            out.extend(v.to_bytes(ln, "big"))
    return bytes(out)


def groupvarint_decode(buf: bytes, count: int) -> np.ndarray:
    out = np.empty(count, dtype=np.uint32)
    i = 0
    pos = 0
    while i < count:
        sel = buf[pos]
        pos += 1
        for shift in (6, 4, 2, 0):
            if i >= count:
                break
            ln = ((sel >> shift) & 0x3) + 1
            out[i] = int.from_bytes(buf[pos : pos + ln], "big")
            pos += ln
            i += 1
    return out
