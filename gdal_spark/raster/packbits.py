"""TIFF PackBits codec (TIFF 6.0 specification, section 9).

Reference: the GTiff driver's PackBits support (frmts/gtiff/, via
libtiff tif_packbits.c). Implemented from the public TIFF 6.0 spec /
the original Apple PackBits scheme: a control byte n in [0, 127]
copies n+1 literal bytes; n in [-127, -1] (two's complement 129..255)
repeats the next byte 1-n times; -128 (128) is a no-op. Runs operate
on raw bytes, so multi-byte sample types pass through unchanged (no
predictor interaction).
"""

from __future__ import annotations

import numpy as np


def decode(data: bytes) -> bytes:
    data = bytes(data)
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        i += 1
        if c < 128:
            out += data[i:i + c + 1]
            i += c + 1
        elif c > 128:
            out += data[i:i + 1] * (257 - c)
            i += 1
        # c == 128: no-op per spec
    return bytes(out)


def encode(data: bytes) -> bytes:
    """Greedy spec encoding: replicate runs for >= 3 equal bytes
    (2-byte runs ride inside literals — the TIFF 6.0 'do not
    interrupt a literal for a two-byte run' recommendation), literal
    stretches otherwise, both capped at 128."""
    data = bytes(data)
    a = np.frombuffer(data, np.uint8)
    n = len(a)
    if n == 0:
        return b""
    change = np.flatnonzero(a[1:] != a[:-1]) + 1
    starts = np.concatenate([[0], change])
    lens = np.diff(np.concatenate([starts, [n]]))
    out = bytearray()
    lit = -1

    def flush_lit(end):
        nonlocal lit
        if lit < 0:
            return
        i = lit
        while i < end:
            m = min(128, end - i)
            out.append(m - 1)
            out.extend(data[i:i + m])
            i += m
        lit = -1

    for s, ln in zip(starts.tolist(), lens.tolist()):
        if ln >= 3:
            flush_lit(s)
            v = int(a[s])
            while ln > 0:
                m = min(128, ln)
                if m == 1:
                    out.append(0)
                else:
                    out.append(257 - m)
                out.append(v)
                ln -= m
        elif lit < 0:
            lit = s
    flush_lit(n)
    return bytes(out)
