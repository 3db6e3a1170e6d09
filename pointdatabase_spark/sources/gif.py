"""GIF (87a/89a) codec — stdlib + NumPy, the third web-corpus image
format after PNG/JPEG (sources/media.py, sources/jpeg.py), and the
dominant legacy ANIMATION container, which feeds the same
frame-sample path as APNG in operators/multimodal.py.

 - decode: header + logical screen descriptor, global/local color
   tables, graphic-control extensions (transparency index, disposal
   methods 0/1 "draw over" and 2 "restore background"), sub-rect
   frames composited onto the logical screen, 4-pass row interlace,
   variable-width LSB-first LZW with clear/EOI codes and the KwKwK
   case.  Disposal 3 (restore-previous) raises NotImplementedError
   naming the gap (rare in the wild).
 - encode: GIF89a, indexed frames against one global palette (or a
   256-entry gray ramp), full-frame images, optional interlace,
   LZW with dictionary reset on overflow — enough to roundtrip-pin
   every decode branch bit-exactly (GIF is lossless on indexed
   data).

Like the other codecs here this is bytes + NumPy only, shipped inside
Arrow-batched ``mapInPandas`` closures: per-file decode is sequential
(LZW is bit-serial), parallelism comes from fanning files across
executors.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------- LZW


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW: variable code width, LSB-first packing,
    leading clear code, dictionary reset at 4096."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = b""
    for v in indices.ravel().tolist():
        cand = prefix + bytes([v])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([v])
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n: int) -> np.ndarray:
    """Inverse of _lzw_encode; returns exactly ``n`` indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n, np.uint8)
    filled = 0
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while filled < n:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]                     # KwKwK
        else:
            raise ValueError("bad GIF LZW code")
        take = min(len(entry), n - filled)
        out[filled:filled + take] = np.frombuffer(entry[:take], np.uint8)
        filled += take
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if filled != n:
        raise ValueError("GIF LZW stream short of pixels")
    return out


# ---------------------------------------------------------------- encode


def encode_gif(frames: np.ndarray, palette: np.ndarray | None = None,
               delay_cs: int = 10, interlace: bool = False) -> bytes:
    """(H,W) or (n,H,W) uint8 palette indices -> GIF89a bytes.
    ``palette`` is (k<=256, 3) uint8; None means the 256-entry gray
    ramp (so grayscale arrays roundtrip as themselves).  Multi-frame
    input emits an animation (one graphic-control block per frame,
    draw-over disposal)."""
    f = np.asarray(frames)
    if f.dtype != np.uint8 or f.ndim not in (2, 3):
        raise ValueError("expect uint8 (H,W) or (n,H,W) indices")
    if f.ndim == 2:
        f = f[None]
    if palette is None:
        pk = np.arange(256, dtype=np.uint8)
        palette = np.stack([pk, pk, pk], axis=1)
    pal = np.ascontiguousarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or len(pal) > 256:
        raise ValueError("palette must be (k<=256, 3) uint8")
    if int(f.max(initial=0)) >= len(pal):
        raise ValueError("palette must cover all indices")
    nbits = max(1, (len(pal) - 1).bit_length())
    size = 1 << nbits
    table = np.zeros((size, 3), np.uint8)
    table[:len(pal)] = pal
    nf, h, w = f.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (nbits - 1) << 4 | (nbits - 1), 0, 0])
    out += table.tobytes()
    if nf > 1:
        # NETSCAPE2.0 loop-forever block
        out += b"\x21\xFF\x0BNETSCAPE2.0\x03\x01\x00\x00\x00"
    mcs = max(2, nbits)
    for img in f:
        if nf > 1:
            out += (b"\x21\xF9\x04\x04"
                    + struct.pack("<H", delay_cs) + b"\x00\x00")
        out += b"\x2C" + struct.pack("<HHHH", 0, 0, w, h)
        out += bytes([0x40 if interlace else 0x00])
        if interlace:
            rows = np.concatenate(
                [img[off::step] for off, step in _INTERLACE_PASSES])
        else:
            rows = img
        lz = _lzw_encode(rows, mcs)
        out += bytes([mcs])
        for i in range(0, len(lz), 255):
            chunk = lz[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)


# ---------------------------------------------------------------- decode


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> (n_frames, H, W, 3) uint8 RGB composited onto the
    logical screen (single-image files return n_frames == 1).

    Truncated files surface as ValueError: the block walk reads byte
    by byte, so a cut anywhere lands on an IndexError/struct.error —
    converted at this one boundary instead of guards at every read
    (same wild-corpus contract as the JPEG decoder, r9)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    try:
        return _decode_gif_body(data)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated GIF: {exc}") from exc


def _decode_gif_body(data: bytes) -> np.ndarray:
    w, h, flags, bg, _asp = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct: np.ndarray | None = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:] = gct[bg]
    bg_canvas = canvas.copy()
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while pos < len(data):
        b0 = data[pos]
        pos += 1
        if b0 == 0x3B:                                   # trailer
            break
        if b0 == 0x21:                                   # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:                            # graphic ctl
                sz = data[pos]
                packed = data[pos + 1]
                disposal = (packed >> 2) & 7
                if disposal == 3:
                    raise NotImplementedError(
                        "GIF disposal method 3 (restore previous)")
                transparent = (data[pos + 4]
                               if packed & 1 else None)
                pos += sz + 1
            while data[pos]:                             # skip subblocks
                pos += data[pos] + 1
            pos += 1
        elif b0 == 0x2C:                                 # image
            fx, fy, fw, fh = struct.unpack_from("<HHHH", data, pos)
            pos += 8
            iflags = data[pos]
            pos += 1
            pal = gct
            if iflags & 0x80:                            # local table
                n = 2 << (iflags & 7)
                pal = np.frombuffer(data, np.uint8, n * 3,
                                    pos).reshape(n, 3)
                pos += n * 3
            if pal is None:
                raise ValueError("GIF image without a color table")
            mcs = data[pos]
            pos += 1
            lz = bytearray()
            while data[pos]:
                ln = data[pos]
                lz += data[pos + 1:pos + 1 + ln]
                pos += ln + 1
            pos += 1
            idx = _lzw_decode(bytes(lz), mcs, fw * fh)
            if iflags & 0x40:                            # interlaced
                img = np.empty((fh, fw), np.uint8)
                rows = idx.reshape(fh, fw)
                r0 = 0
                for off, step in _INTERLACE_PASSES:
                    k = len(range(off, fh, step))
                    img[off::step] = rows[r0:r0 + k]
                    r0 += k
            else:
                img = idx.reshape(fh, fw)
            if int(img.max(initial=0)) >= len(pal):
                raise ValueError("GIF index out of color-table range")
            region = canvas[fy:fy + fh, fx:fx + fw]
            rgb = pal[img]
            if transparent is not None:
                mask = (img != transparent)[:, :, None]
                region[:] = np.where(mask, rgb, region)
            else:
                region[:] = rgb
            frames.append(canvas.copy())
            if disposal == 2:                            # restore bg
                canvas[fy:fy + fh, fx:fx + fw] = \
                    bg_canvas[fy:fy + fh, fx:fx + fw]
            transparent = None
            disposal = 0
        else:
            raise ValueError(f"bad GIF block 0x{b0:02x}")
    if not frames:
        raise ValueError("GIF has no image data")
    return np.stack(frames)
