"""TIFF LZW codec (TIFF 6.0 specification, section 13).

Reference: the GTiff driver's LZW support (frmts/gtiff/, via libtiff
tif_lzw.c). Implemented from the public TIFF 6.0 spec: MSB-first bit
packing, ClearCode=256, EOI=257, first dictionary entry 258,
variable code width 9->12 with the spec's EARLY-CHANGE convention
(the encoder widens when it ADDS entry 511/1023/2047; the decoder —
whose table lags one entry behind — widens at 510/1022/2046), and a
table reset once entry 4094 is reached. This matches libtiff's
default writer, so files interoperate with real-world LZW GeoTIFFs.
"""

from __future__ import annotations

CLEAR = 256
EOI = 257
FIRST = 258


def encode(data: bytes) -> bytes:
    data = bytes(data)
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1

    # strings are (prefix_code, next_byte) pairs — O(1)/byte, no
    # byte-string churn
    table: dict[tuple[int, int], int] = {}
    next_code = FIRST
    width = 9
    emit(CLEAR, width)
    omega = -1
    for b in data:
        if omega < 0:
            omega = b
            continue
        key = (omega, b)
        hit = table.get(key)
        if hit is not None:
            omega = hit
            continue
        emit(omega, width)
        table[key] = next_code
        # early change: widen when the entry just added is 511/1023/2047
        if next_code in (511, 1023, 2047):
            width += 1
        next_code += 1
        omega = b
        if next_code == 4094:
            emit(omega, width)
            emit(CLEAR, width)
            table = {}
            next_code = FIRST
            width = 9
            omega = -1
    if omega >= 0:
        emit(omega, width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def decode(data: bytes) -> bytes:
    data = bytes(data)
    out = bytearray()
    pos = 0          # bit position
    nbytes = len(data)

    def read(width: int) -> int:
        nonlocal pos
        byte0 = pos >> 3
        if byte0 >= nbytes:
            return EOI
        # gather up to 3 bytes covering the code
        v = 0
        need = width
        p = pos
        while need > 0:
            bi = p >> 3
            if bi >= nbytes:
                v <<= need
                p += need
                break
            avail = 8 - (p & 7)
            take = min(avail, need)
            byte = data[bi]
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            p += take
            need -= take
        pos = p
        return v

    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == EOI:
            break
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            if code >= len(table):
                raise ValueError(f"LZW: bad first code {code}")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):       # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW: code {code} beyond table "
                             f"({len(table)})")
        out += entry
        prev = entry
        # decoder lags the encoder's table by one entry: when the next
        # free index is 511/1023/2047 the encoder has already added it
        # and widened, so the next code arrives one bit wider
        if len(table) in (511, 1023, 2047):
            width += 1
    return bytes(out)


def undo_horizontal_predictor(arr):
    """TIFF Predictor=2 (tag 317): horizontal differencing — integer
    rows store deltas; reconstruct with a wrapping cumulative sum
    (modulo the sample width, per the spec)."""
    import numpy as np

    if not np.issubdtype(arr.dtype, np.integer):
        raise NotImplementedError(
            "Predictor=2 applies to integer samples only (Predictor=3 "
            "floating-point differencing not supported)")
    return np.cumsum(arr, axis=1, dtype=arr.dtype)
