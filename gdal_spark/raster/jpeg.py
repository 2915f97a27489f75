"""Baseline + progressive JPEG codec (ITU-T T.81 / ISO 10918-1),
pure numpy.

Reference: the JPEG driver (frmts/jpeg/, via libjpeg). Implemented
from the public T.81 spec: SOI/APPn/DQT/SOF0/DHT/DRI/SOS/EOI marker
walk, Huffman entropy decoding with 0xFF00 unstuffing and RSTn
restart handling, DC prediction, dequantization, zig-zag, exact
float64 2-D IDCT (orthonormal DCT-III via matrix product), box chroma
upsampling, and JFIF YCbCr->RGB.

Progressive (SOF2) decode follows T.81 Annex G / the public libjpeg
jdphuff.c algorithms: multi-scan coefficient accumulation with
spectral selection (Ss..Se bands), successive approximation (DC
arithmetic-shift point transform, AC toward-zero point transform with
+-1<<Al refinement), EOB-run decoding, and interleaved-DC /
non-interleaved-AC scan geometry over each component's useful block
dims. The reference gets all of this from libjpeg
(frmts/jpeg/jpgdataset.cpp); here it is reimplemented from the spec.

The encoder (fixtures and round-trip gates) writes baseline 4:4:4 or
4:2:0 with the Annex-K example quantization (quality-scaled, the IJG
rule) and Huffman tables; progressive=True writes the classic IJG
10-scan script (jcparam.c jpeg_simple_progression's public shape)
with per-scan optimal Huffman tables (T.81 Annex K.2) — progressive
re-codes the SAME quantized coefficients, so decode(progressive) ==
decode(baseline) bit-for-bit, which is what the round-trip tests pin.

Scope fences (loud): arithmetic coding, 12-bit, lossless and
hierarchical profiles raise NotImplementedError — same fence style as
the PNG codec. Pixel output may differ from libjpeg by +/-1 (we use
the exact float IDCT; libjpeg's fixed-point jpeg_idct_islow differs
in final rounding — the reference's own autotest accepts multiple
checksums per libjpeg build, autotest/gdrivers/jpeg.py:43-47).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- DCT

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    C = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0)
    C[0] *= np.sqrt(0.5)
    return C * 0.5


_C = _dct_matrix()


def idct2(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) coefficient blocks -> spatial samples (float64)."""
    return np.einsum("ij,njk,kl->nil", _C.T, blocks, _C, optimize=True)


def dct2(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ij,njk,kl->nil", _C, blocks, _C.T, optimize=True)


# ------------------------------------------------- Annex K tables

_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103,
    99], dtype=np.int64)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.int64)

# Annex K Huffman specs: (bits[1..16], values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _build_decode_table(bits, values):
    """{(length, code): symbol} per T.81 C.2 canonical assignment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits, values):
    dec = _build_decode_table(bits, values)
    return {sym: (ln, code) for (ln, code), sym in dec.items()}


class _BitReader:
    """Entropy-segment bit reader: 0xFF00 unstuffing, stops at any
    other marker (the caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    break        # restart marker: caller realigns
                else:
                    break        # EOI or another marker: stop filling
                self.acc = (self.acc << 8) | b
                self.nbits += 8
                continue
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        if self.nbits < n:   # stream ended at a marker: zero-pad
            self.acc <<= n - self.nbits
            self.nbits = n
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid Huffman code")

    def align_restart(self):
        """Skip to just past the next RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("JPEG: missing restart marker")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes):
    """-> (height, width, bands) uint8 array (grayscale -> bands=1)."""
    data = bytes(data)
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart = 0
    frame = None
    progressive = False
    state = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:                      # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 15
                p += 1
                if prec:
                    q = np.frombuffer(seg, ">u2", 64, p).astype(np.int64)
                    p += 128
                else:
                    q = np.frombuffer(seg, "u1", 64, p).astype(np.int64)
                    p += 64
                qt[tid] = q
        elif marker in (0xC0, 0xC1, 0xC2):      # SOF0/1 baseline, SOF2 prog
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"JPEG {prec}-bit not supported")
            progressive = marker == 0xC2
            h, w = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = (h, w, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG profile SOF{marker - 0xC0} (lossless/"
                f"arithmetic/hierarchical) not supported — baseline "
                f"(SOF0/SOF1) and progressive (SOF2) only, like the "
                f"PNG codec's scope fence")
        elif marker == 0xC4:                    # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                values = list(seg[p + 17:p + 17 + nv])
                tbl = _build_decode_table(bits, values)
                (huff_ac if cls else huff_dc)[tid] = tbl
                p += 17 + nv
        elif marker == 0xDD:                    # DRI
            (restart,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:                    # SOS
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((cs, tt >> 4, tt & 15))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            pos += seglen
            if not progressive:
                return _decode_scan(data, pos, frame, scan, qt, huff_dc,
                                    huff_ac, restart)
            if state is None:
                state = _init_progressive(frame)
            pos = _decode_prog_scan(data, pos, state, scan, ss, se,
                                    ahal >> 4, ahal & 15, huff_dc,
                                    huff_ac, restart)
            continue
        pos += seglen
    if progressive and state is not None:
        h, w, _ = frame
        return _reconstruct(h, w, state["comps"], qt,
                            state["hmax"], state["vmax"])
    raise ValueError("JPEG: no SOS marker found")


def _init_progressive(frame):
    """Coefficient accumulators + scan geometry (T.81 A.2.2/A.2.3):
    full block dims (bw, bh) cover whole MCUs for interleaved DC
    scans; useful dims (ubw, ubh) bound non-interleaved scans."""
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        cw = -(-(w * c["h"]) // hmax)
        ch = -(-(h * c["v"]) // vmax)
        c["ubw"] = -(-cw // 8)
        c["ubh"] = -(-ch // 8)
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.int64)
        c["pred"] = 0
    return {"comps": comps, "mcux": mcux, "mcuy": mcuy,
            "hmax": hmax, "vmax": vmax}


def _next_marker(data, pos):
    """Skip past entropy padding to the next real (non-stuffing,
    non-restart) marker's 0xFF."""
    while pos + 1 < len(data):
        if data[pos] == 0xFF and data[pos + 1] != 0x00 \
                and not (0xD0 <= data[pos + 1] <= 0xD7):
            return pos
        pos += 1
    return len(data)


def _decode_prog_scan(data, pos, state, scan, ss, se, ah, al,
                      huff_dc, huff_ac, restart):
    """One progressive scan into the coefficient accumulators; returns
    the position of the next marker. T.81 G.2: DC scans may be
    interleaved (MCU order); AC scans are single-component over the
    component's useful blocks."""
    comps, mcux, mcuy = state["comps"], state["mcux"], state["mcuy"]
    byid = {c["id"]: c for c in comps}
    sel = [(byid[cs], td, ta) for cs, td, ta in scan]
    for c, _, _ in sel:
        c["pred"] = 0
    br = _BitReader(data, pos)
    eobrun = 0
    if len(sel) > 1:
        if ss != 0 or se != 0:
            raise ValueError("JPEG: interleaved progressive scan "
                             "must be DC-only")
        for m in range(mcux * mcuy):
            if restart and m and m % restart == 0:
                br.align_restart()
                for c, _, _ in sel:
                    c["pred"] = 0
            my, mx = divmod(m, mcux)
            for c, td, _ in sel:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        i = (my * c["v"] + by) * c["bw"] \
                            + mx * c["h"] + bx
                        _dc_prog(br, c, i, huff_dc.get(td), ah, al)
    else:
        c, td, ta = sel[0]
        coef = c["coef"]
        for u in range(c["ubh"] * c["ubw"]):
            if restart and u and u % restart == 0:
                br.align_restart()
                c["pred"] = 0
                eobrun = 0
            row, col = divmod(u, c["ubw"])
            i = row * c["bw"] + col
            if ss == 0:
                _dc_prog(br, c, i, huff_dc.get(td), ah, al)
            elif ah == 0:
                eobrun = _ac_first_block(br, coef[i], huff_ac[ta],
                                         ss, se, al, eobrun)
            else:
                eobrun = _ac_refine_block(br, coef[i], huff_ac[ta],
                                          ss, se, al, eobrun)
    return _next_marker(data, br.pos)


def _dc_prog(br, c, i, dc_table, ah, al):
    """DC coefficient, first scan (Huffman diff << Al) or refinement
    (one raw bit into bit Al — two's-complement |= works for negatives
    because the first scan stored pred << Al)."""
    if ah == 0:
        t = br.huff(dc_table)
        diff = _extend(br.bits(t), t) if t else 0
        c["pred"] += diff
        c["coef"][i, 0] = c["pred"] << al
    elif br.bits(1):
        c["coef"][i, 0] |= 1 << al


def _ac_first_block(br, blk, ac, ss, se, al, eobrun):
    """AC band, first scan (T.81 G.1.2.2 / jdphuff decode_mcu_AC_first):
    values arrive point-transformed (<< Al on reconstruction); EOBn
    symbols (r<<4, r<15) start a run of (1<<r)-1+ext further all-zero
    bands."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.huff(ac)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:
                return (1 << r) - 1 + (br.bits(r) if r else 0)
            k += 16
            continue
        k += r
        if k > se:
            raise ValueError("JPEG: progressive AC run overflow")
        blk[k] = _extend(br.bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(br, blk, ac, ss, se, al, eobrun):
    """AC band, refinement scan (T.81 G.1.2.3 / jdphuff
    decode_mcu_AC_refine): newly-nonzero coefficients are +-1<<Al with
    an explicit sign bit; every nonzero-history coefficient passed
    over consumes a correction bit; EOB runs still carry correction
    bits for the rest of the band."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.huff(ac)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = (1 << r) + (br.bits(r) if r else 0)
                    break
                # r == 15 (ZRL): skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("JPEG: bad refinement magnitude")
                val = p1 if br.bits(1) else m1
            while k <= se:
                if blk[k] != 0:
                    if br.bits(1) and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                if br.bits(1) and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, restart):
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        sc = next(s for s in scan if s[0] == c["id"])
        c["td"], c["ta"] = sc[1], sc[2]
        c["bw"] = mcux * c["h"]          # blocks per row
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.int64)
        c["pred"] = 0
    br = _BitReader(data, pos)
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart and m and m % restart == 0:
            br.align_restart()
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(m, mcux)
        for c in comps:
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    blk = np.zeros(64, np.int64)
                    t = br.huff(huff_dc[c["td"]])
                    diff = _extend(br.bits(t), t) if t else 0
                    c["pred"] += diff
                    blk[0] = c["pred"]
                    k = 1
                    while k < 64:
                        rs = br.huff(huff_ac[c["ta"]])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break                 # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG: AC run overflow")
                        blk[k] = _extend(br.bits(s), s)
                        k += 1
                    row = my * c["v"] + by
                    col = mx * c["h"] + bx
                    c["coef"][row * c["bw"] + col] = blk
    return _reconstruct(h, w, comps, qt, hmax, vmax)


def _reconstruct(h, w, comps, qt, hmax, vmax):
    """Dequantize + IDCT + upsample + color transform, vectorized per
    component (shared by the baseline and progressive paths)."""
    planes = []
    for c in comps:
        deq = c["coef"] * qt[c["tq"]][None, :]
        blocks = deq[:, _UNZIGZAG].reshape(-1, 8, 8).astype(np.float64)
        spat = idct2(blocks) + 128.0
        ph, pw = c["bh"] * 8, c["bw"] * 8
        img = (spat.reshape(c["bh"], c["bw"], 8, 8)
               .transpose(0, 2, 1, 3).reshape(ph, pw))
        # box-upsample to full MCU resolution
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            img = np.repeat(np.repeat(img, ry, axis=0), rx, axis=1)
        planes.append(img[:h, :w])
    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return out[:, :, None]
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------------------ encoder

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def bits(self, v: int, n: int):
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.bits((1 << pad) - 1, pad)


def _quality_tables(quality: int):
    """IJG quality scaling of the Annex-K tables (jcparam.c rule —
    public IJG convention)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    out = []
    for base in (_Q_LUMA, _Q_CHROMA):
        q = (base * scale + 50) // 100
        out.append(np.clip(q, 1, 255).astype(np.int64))
    return out


def _mag(v: int):
    a = abs(v)
    t = 0
    while a:
        a >>= 1
        t += 1
    return t


def _optimal_table(freq):
    """Optimal Huffman (bits[16], values) per T.81 Annex K.2: merge
    least-frequent pairs (largest symbol wins ties), track code sizes
    through the `others` chain, adjust lengths >16 down, and reserve
    the 256 sentinel so no real symbol gets the all-ones code."""
    freq = dict(freq)
    freq[256] = 1
    codesize = {s: 0 for s in freq}
    others = {s: -1 for s in freq}
    while True:
        live = sorted((s for s, f in freq.items() if f > 0),
                      key=lambda s: (freq[s], -s))
        if len(live) < 2:
            break
        v1, v2 = live[0], live[1]
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = others[v2]
            codesize[v2] += 1
    bits = [0] * 33
    for s, sz in codesize.items():
        if sz:
            bits[sz] += 1
    i = 32
    while i > 16:                      # Annex K.2 adjust_bits
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1                       # drop the sentinel's slot
    values = [s for s in sorted(codesize,
                                key=lambda s: (codesize[s], s))
              if codesize[s] and s != 256]
    return bits[1:17], values


class _ScanEncoder:
    """Progressive scan emitter: counting pass (table=None) gathers
    symbol frequencies for _optimal_table; emit pass writes bits.
    Carries the EOB run and its buffered correction bits across
    blocks (jcphuff.c discipline)."""

    _MAX_CORR = 937

    def __init__(self, table=None, writer=None):
        self.freq = {} if table is None else None
        self.table = table
        self.w = writer
        self.eobrun = 0
        self.corr = []

    def sym(self, s):
        if self.freq is not None:
            self.freq[s] = self.freq.get(s, 0) + 1
        else:
            ln, code = self.table[s]
            self.w.bits(code, ln)

    def bits(self, v, n):
        if n and self.freq is None:
            self.w.bits(v, n)

    def flush_eob(self):
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            self.sym(r << 4)
            self.bits(self.eobrun & ((1 << r) - 1), r)
            self.eobrun = 0
        for b in self.corr:
            self.bits(b, 1)
        self.corr = []

    def end_block_eob(self, corr_bits=()):
        self.eobrun += 1
        self.corr.extend(corr_bits)
        if self.eobrun == 0x7FFF or len(self.corr) > self._MAX_CORR:
            self.flush_eob()


def _enc_dc_first(enc, prev, coef0, al):
    """DC first scan: Huffman-coded diff of the arithmetic-shift point
    transform (T.81 G.1.2.1). Returns the new predictor."""
    v = int(coef0) >> al
    diff = v - prev
    t = _mag(diff)
    enc.sym(t)
    if t:
        enc.bits(diff if diff >= 0 else diff + (1 << t) - 1, t)
    return v


def _enc_ac_first(enc, blk, ss, se, al):
    """AC band first scan (jcphuff encode_mcu_AC_first): toward-zero
    point transform, run/size symbols, EOB-run accumulation."""
    r = 0
    for k in range(ss, se + 1):
        t = int(blk[k])
        if t < 0:
            a = (-t) >> al
            t2 = ~a
        else:
            a = t >> al
            t2 = a
        if a == 0:
            r += 1
            continue
        enc.flush_eob()
        while r > 15:
            enc.sym(0xF0)
            r -= 16
        s = a.bit_length()
        enc.sym((r << 4) | s)
        enc.bits(t2 & ((1 << s) - 1), s)
        r = 0
    if r > 0:
        enc.end_block_eob()


def _enc_ac_refine(enc, blk, ss, se, al):
    """AC band refinement scan (jcphuff encode_mcu_AC_refine):
    newly-nonzero (abs>>Al == 1) coefficients get (run<<4)|1 + sign;
    previously-nonzero ones queue their next-lower bit as correction
    bits emitted after the following symbol."""
    absv = []
    eob = -1
    for k in range(ss, se + 1):
        a = abs(int(blk[k])) >> al
        absv.append(a)
        if a == 1:
            eob = k
    r = 0
    pend = []
    for k in range(ss, se + 1):
        t = absv[k - ss]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            enc.flush_eob()
            enc.sym(0xF0)
            r -= 16
            for b in pend:
                enc.bits(b, 1)
            pend = []
        if t > 1:
            pend.append(t & 1)
            continue
        enc.flush_eob()
        enc.sym((r << 4) | 1)
        enc.bits(0 if int(blk[k]) < 0 else 1, 1)
        for b in pend:
            enc.bits(b, 1)
        pend = []
        r = 0
    if r > 0 or pend:
        enc.end_block_eob(pend)


def _prog_script(nb):
    """(comp_indices, Ss, Se, Ah, Al) scan list — the classic IJG
    progression (jcparam.c jpeg_simple_progression's public shape)."""
    if nb == 1:
        return [([0], 0, 0, 0, 1), ([0], 1, 5, 0, 2),
                ([0], 6, 63, 0, 2), ([0], 0, 0, 1, 0),
                ([0], 1, 63, 2, 1), ([0], 1, 63, 1, 0)]
    return [([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2), ([2], 1, 63, 0, 1), ([1], 1, 63, 0, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([0], 6, 63, 0, 2), ([0], 1, 63, 2, 1),
            ([2], 1, 63, 1, 0), ([1], 1, 63, 1, 0), ([0], 1, 63, 1, 0)]


def _encode_prog_scans(comps, nb, h, w, hmax, vmax, mcux, mcuy):
    """All progressive scans -> bytes (per-scan DHT + SOS + entropy).
    Each scan is encoded twice: a counting pass feeds _optimal_table,
    then the emit pass writes the stream with that table (ids 0/0,
    redefined per scan — legal per T.81 B.2.4.2)."""
    for c in comps:
        cw = -(-(w * c["h"]) // hmax)
        ch = -(-(h * c["v"]) // vmax)
        c["ubw"] = -(-cw // 8)
        c["ubh"] = -(-ch // 8)
    out = bytearray()
    for comp_ids, ss, se, ah, al in _prog_script(nb):
        sel = [comps[i] for i in comp_ids]

        def run(enc):
            if ss == 0:
                preds = dict.fromkeys(comp_ids, 0)
                if len(sel) > 1:
                    for m in range(mcux * mcuy):
                        my, mx = divmod(m, mcux)
                        for ci, c in zip(comp_ids, sel):
                            for by in range(c["v"]):
                                for bx in range(c["h"]):
                                    i = ((my * c["v"] + by) * c["bw_"]
                                         + mx * c["h"] + bx)
                                    v0 = c["qz"][i, 0]
                                    if ah == 0:
                                        preds[ci] = _enc_dc_first(
                                            enc, preds[ci], v0, al)
                                    else:
                                        enc.bits((int(v0) >> al) & 1, 1)
                else:
                    c = sel[0]
                    ci = comp_ids[0]
                    for u in range(c["ubh"] * c["ubw"]):
                        row, col = divmod(u, c["ubw"])
                        v0 = c["qz"][row * c["bw_"] + col, 0]
                        if ah == 0:
                            preds[ci] = _enc_dc_first(
                                enc, preds[ci], v0, al)
                        else:
                            enc.bits((int(v0) >> al) & 1, 1)
            else:
                c = sel[0]
                for u in range(c["ubh"] * c["ubw"]):
                    row, col = divmod(u, c["ubw"])
                    blk = c["qz"][row * c["bw_"] + col]
                    if ah == 0:
                        _enc_ac_first(enc, blk, ss, se, al)
                    else:
                        _enc_ac_refine(enc, blk, ss, se, al)
            enc.flush_eob()

        counter = _ScanEncoder()
        run(counter)
        needs_table = bool(counter.freq) and not (ss == 0 and ah != 0)
        if needs_table:
            bits, values = _optimal_table(counter.freq)
            cls = 0 if ss == 0 else 1
            out += (b"\xFF\xC4"
                    + struct.pack(">HB", 19 + len(values), cls << 4)
                    + bytes(bits) + bytes(values))
            table = _build_encode_table(bits, values)
        else:
            table = {}
        writer = _BitWriter()
        run(_ScanEncoder(table=table, writer=writer))
        writer.flush()
        sos = struct.pack(">HB", 6 + 2 * len(sel), len(sel))
        for ci in comp_ids:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xFF\xDA" + sos + writer.out
    return out


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: bool = False,
                progressive: bool = False) -> bytes:
    """(h, w[, bands]) uint8 -> JFIF bytes. bands 1 or 3;
    subsample=True writes 4:2:0 chroma; progressive=True writes SOF2
    multi-scan (same quantized coefficients as baseline, so the two
    decode bit-identically)."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nb = img.shape
    if nb not in (1, 3):
        raise ValueError("bands must be 1 or 3")
    qluma, qchroma = _quality_tables(quality)
    if nb == 3:
        f = img.astype(np.float64)
        y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
        cb = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] \
            + 0.5 * f[:, :, 2] + 128.0
        cr = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] \
            - 0.081312 * f[:, :, 2] + 128.0
        planes = [y, cb, cr]
    else:
        planes = [img[:, :, 0].astype(np.float64)]
        subsample = False
    cs = 2 if (nb == 3 and subsample) else 1
    # component geometry
    comps = []
    for i, p in enumerate(planes):
        sh = cs if i == 0 else 1        # sampling factors
        comps.append({"plane": p, "h": sh, "v": sh,
                      "tq": 0 if i == 0 else 1,
                      "td": 0 if i == 0 else 1,
                      "ta": 0 if i == 0 else 1})
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    qts = [qluma, qchroma] if nb == 3 else [qluma]
    enc_dc = [_build_encode_table(*_DC_LUMA), _build_encode_table(*_DC_CHROMA)]
    enc_ac = [_build_encode_table(*_AC_LUMA), _build_encode_table(*_AC_CHROMA)]
    # per-component padded + (possibly) downsampled planes and coeffs
    for c in comps:
        p = c["plane"]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            ph = -(-h // ry) * ry
            pw = -(-w // rx) * rx
            pp = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            p = pp.reshape(ph // ry, ry, pw // rx, rx).mean(axis=(1, 3))
        th, tw = mcuy * c["v"] * 8, mcux * c["h"] * 8
        p = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                   mode="edge")
        bh, bw = th // 8, tw // 8
        blocks = (p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
                  .reshape(-1, 8, 8) - 128.0)
        coef = dct2(blocks).reshape(-1, 64)
        # quantize in natural order, then store zig-zagged
        q = qts[c["tq"]].astype(np.float64)
        qnat = np.round(coef / q[None, :]).astype(np.int64)
        c["qz"] = qnat[:, _ZIGZAG]
        c["bw_"] = bw
        c["bh_"] = bh
    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, q in enumerate(qts):
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tid) \
            + bytes(int(v) for v in q[_ZIGZAG])
    sof = struct.pack(">HBHHB", 8 + 3 * nb, 8, h, w, nb)
    for i, c in enumerate(comps):
        sof += bytes([i + 1, (c["h"] << 4) | c["v"],
                      0 if i == 0 else 1 if nb == 3 else 0])
    if progressive:
        out += b"\xFF\xC2" + sof
        out += _encode_prog_scans(comps, nb, h, w, hmax, vmax,
                                  mcux, mcuy)
        out += b"\xFF\xD9"
        return bytes(out)

    bwri = _BitWriter()
    preds = [0] * len(comps)
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(comps):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    row = my * c["v"] + by
                    col = mx * c["h"] + bx
                    blk = c["qz"][row * c["bw_"] + col]
                    hid = 0 if ci == 0 else 1
                    dc, ac = enc_dc[hid], enc_ac[hid]
                    diff = int(blk[0]) - preds[ci]
                    preds[ci] = int(blk[0])
                    t = _mag(diff)
                    ln, code = dc[t]
                    bwri.bits(code, ln)
                    if t:
                        bwri.bits(diff if diff >= 0
                                  else diff + (1 << t) - 1, t)
                    run = 0
                    for k in range(1, 64):
                        v = int(blk[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            ln, code = ac[0xF0]
                            bwri.bits(code, ln)
                            run -= 16
                        s = _mag(v)
                        ln, code = ac[(run << 4) | s]
                        bwri.bits(code, ln)
                        bwri.bits(v if v >= 0 else v + (1 << s) - 1, s)
                        run = 0
                    if run:
                        ln, code = ac[0x00]
                        bwri.bits(code, ln)
    bwri.flush()

    def dht(cls, tid, spec):
        bits, values = spec
        return (b"\xFF\xC4"
                + struct.pack(">HB", 19 + len(values), (cls << 4) | tid)
                + bytes(bits) + bytes(values))

    out += dht(0, 0, _DC_LUMA) + dht(1, 0, _AC_LUMA)
    if nb == 3:
        out += dht(0, 1, _DC_CHROMA) + dht(1, 1, _AC_CHROMA)
    out += b"\xFF\xC0" + sof
    sos = struct.pack(">HB", 6 + 2 * nb, nb)
    for i in range(nb):
        sos += bytes([i + 1, 0 if i == 0 else 0x11])
    sos += b"\x00\x3F\x00"
    out += b"\xFF\xDA" + sos
    out += bwri.out
    out += b"\xFF\xD9"
    return bytes(out)
