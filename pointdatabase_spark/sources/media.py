"""Minimal stdlib media codecs — un-stub the multimodal decode path
(operators/multimodal.py) in a container that ships neither PIL nor
cv2 nor soundfile, the same way sources/hdf5.py and sources/geotiff.py
un-gate the science-file scans without libhdf5/libtiff.

PNG (ISO/IEC 15948): 8- and 16-bit greyscale / RGB / RGBA plus
8-bit palette (color type 3, PLTE expanded to RGB), non-interlaced.
 - decode: chunk walk (IHDR/PLTE/IDAT*/IEND), zlib inflate, and all
   five row filters (None/Sub/Up/Average/Paeth) un-applied at BYTE
   granularity (bpp = channels x bytes-per-sample, per the spec, so
   the same unfilter loop serves every depth); 16-bit samples are
   big-endian per the spec; Adam7 interlace decodes via the shared
   per-pass scanline machinery; sub-byte depths raise
   NotImplementedError naming the gap.
 - encode: filter 0 rows by default (any filter type accepted, so the
   decoder's filter branches are round-trip pinned), one zlib IDAT;
   uint16 input emits depth-16, encode_png_palette emits type 3.

WAV (RIFF/WAVE): PCM integer or IEEE-float, mono or interleaved
multichannel.
 - decode: RIFF walk to fmt /data; 8-bit unsigned, 16/32-bit signed
   little-endian, or 32/64-bit IEEE float (format code 3) samples as
   an (n_samples, n_channels) array; WAVE_FORMAT_EXTENSIBLE raises.
 - encode: 16-bit PCM (encode_wav) or 32-bit float
   (encode_wav_float32).

Everything is `bytes` + NumPy — no JVM, no C extensions — so these
ship inside Arrow-batched `mapInPandas` closures and decode fans out
across executors, one batch per codec call."""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type -> samples per pixel

# Adam7 pass grid: (x0, y0, dx, dy) per pass — the spec's 8x8 tile
#   1 6 4 6 2 6 4 6
#   7 7 7 7 7 7 7 7   (rows 1,3,5,7)
#   5 6 5 6 5 6 5 6   ...
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _adam7_stream(rows_bytes: np.ndarray, bpp: int,
                  filter_type: int) -> bytes:
    """(h, w, bpp) byte pixels -> concatenated filtered scanline
    streams of the 7 Adam7 passes (one zlib stream per spec; empty
    passes contribute no scanlines)."""
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = rows_bytes[y0::dy, x0::dx]
        ph, pw = sub.shape[:2]
        if ph and pw:
            raw += _filter_stream(sub.reshape(ph, pw * bpp), bpp,
                                  filter_type)
    return bytes(raw)


def _adam7_unpack(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """Inverse of _adam7_stream: walk the 7 passes, unfilter each
    with the shared byte-granular scanline machinery, scatter into
    the (h, w, bpp) canvas."""
    out = np.zeros((h, w, bpp), np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        ph = (h - y0 + dy - 1) // dy
        pw = (w - x0 + dx - 1) // dx
        if ph <= 0 or pw <= 0:
            continue
        n = ph * (1 + pw * bpp)
        out[y0::dy, x0::dx] = _unfilter_stream(raw[pos:pos + n],
                                               pw, ph, bpp)
        pos += n
    if pos != len(raw):
        raise ValueError("PNG interlaced pixel data length mismatch")
    return out


def encode_png(arr: np.ndarray, filter_type: int = 0,
               interlace: bool = False) -> bytes:
    """Greyscale (H,W), RGB (H,W,3) or RGBA (H,W,4) -> PNG.
    uint8 input emits bit depth 8; uint16 emits depth 16 (big-endian
    samples per the spec).  ``filter_type`` applies the same filter
    to every row (0-4) so decode branches can be pinned
    individually; ``interlace`` emits the Adam7 7-pass layout."""
    a = np.asarray(arr)
    depth = 16 if a.dtype == np.uint16 else 8
    a = np.ascontiguousarray(
        a, dtype=np.uint16 if depth == 16 else np.uint8)
    if a.ndim == 2:
        color, ch = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color, ch = 2, 3
    elif a.ndim == 3 and a.shape[2] == 4:
        color, ch = 6, 4
    else:
        raise ValueError("expect (H,W), (H,W,3) or (H,W,4)")
    h, w = a.shape[:2]
    if depth == 16:
        # big-endian sample bytes; filtering operates on raw bytes
        # with bpp = ch * 2 (PNG spec: "bpp is defined as the number
        # of bytes per complete pixel")
        rows_bytes = (a.astype(">u2").view(np.uint8)
                      .reshape(h, w, ch * 2))
        bpp = ch * 2
    else:
        rows_bytes = a
        bpp = ch
    px = rows_bytes.reshape(h, w, bpp)
    raw = (_adam7_stream(px, bpp, filter_type) if interlace
           else _filter_stream(px.reshape(h, w * bpp), bpp,
                               filter_type))
    out = bytearray(_PNG_SIG)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0,
                       1 if interlace else 0)
    for tag, body in ((b"IHDR", ihdr),
                      (b"IDAT", zlib.compress(raw, 6)),
                      (b"IEND", b"")):
        out += struct.pack(">I", len(body)) + tag + body
        out += struct.pack(">I", zlib.crc32(tag + body))
    return bytes(out)


def encode_png_palette(indices: np.ndarray, palette: np.ndarray,
                       filter_type: int = 0,
                       interlace: bool = False) -> bytes:
    """(H,W) uint8 palette indices + (n<=256, 3) uint8 palette ->
    color-type-3 PNG (8-bit indices, PLTE chunk; optionally
    Adam7-interlaced)."""
    idx = np.ascontiguousarray(indices, dtype=np.uint8)
    pal = np.ascontiguousarray(palette, dtype=np.uint8)
    if idx.ndim != 2 or pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError("expect (H,W) indices and (n,3) palette")
    if len(pal) > 256 or idx.max(initial=0) >= len(pal):
        raise ValueError("palette must cover all indices, n<=256")
    h, w = idx.shape
    raw = (_adam7_stream(idx[:, :, None], 1, filter_type) if interlace
           else _filter_stream(idx, 1, filter_type))
    out = bytearray(_PNG_SIG)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0,
                       1 if interlace else 0)
    for tag, body in ((b"IHDR", ihdr), (b"PLTE", pal.tobytes()),
                      (b"IDAT", zlib.compress(raw, 6)),
                      (b"IEND", b"")):
        out += struct.pack(">I", len(body)) + tag + body
        out += struct.pack(">I", zlib.crc32(tag + body))
    return bytes(out)


def _filter_stream(rows: np.ndarray, bpp: int,
                   filter_type: int) -> bytes:
    """(h, stride) uint8 scanlines -> filtered PNG stream bytes."""
    if not 0 <= filter_type <= 4:
        raise ValueError("PNG filter type must be 0-4")
    h, stride = rows.shape
    raw = bytearray()
    prev = np.zeros((stride // bpp, bpp), np.uint8)
    for y in range(h):
        row = rows[y].reshape(stride // bpp, bpp)
        raw.append(filter_type)
        raw += _filter_row(row, prev, bpp, filter_type).tobytes()
        prev = row
    return bytes(raw)


def _filter_row(row: np.ndarray, prev: np.ndarray, ch: int,
                ft: int) -> np.ndarray:
    r = row.astype(np.int16)
    p = prev.astype(np.int16)
    left = np.zeros_like(r)
    left[1:] = r[:-1]
    upleft = np.zeros_like(p)
    upleft[1:] = p[:-1]
    if ft == 0:
        out = r
    elif ft == 1:
        out = r - left
    elif ft == 2:
        out = r - p
    elif ft == 3:
        out = r - (left + p) // 2
    else:
        out = r - _paeth(left, p, upleft)
    return (out % 256).astype(np.uint8)


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    pp = a + b - c
    pa, pb, pc = np.abs(pp - a), np.abs(pp - b), np.abs(pp - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> pixel array: (H,W) for greyscale, (H,W,C) for
    RGB/RGBA (uint8 at depth 8, uint16 at depth 16); palette images
    (color type 3) decode expanded to (H,W,3) uint8 RGB."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, w = 8, None
    idat = bytearray()
    plte: bytes | None = None
    while pos + 8 <= len(data):
        ln, tag = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color, comp, flt, inter = struct.unpack(
                ">IIBBBBB", body)
            if depth not in (8, 16):
                raise NotImplementedError(
                    f"PNG bit depth {depth} (only 8/16)")
            if color == 3 and depth != 8:
                raise NotImplementedError(
                    f"palette PNG with bit depth {depth} (only 8)")
            if color != 3 and color not in _CHANNELS:
                raise NotImplementedError(
                    f"PNG color type {color} (alpha-grey unsupported)")
            if comp or flt:
                raise ValueError("bad PNG compression/filter method")
        elif tag == b"PLTE":
            plte = bytes(body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if color == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("palette PNG missing/malformed PLTE")
        ridx = zlib.decompress(bytes(idat))
        idx = (_adam7_unpack(ridx, w, h, 1) if inter
               else _unfilter_stream(ridx, w, h, 1))
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("palette index out of range")
        return pal[idx[:, :, 0]]
    ch = _CHANNELS[color]
    sw = depth // 8                     # sample width in bytes
    rawpx = zlib.decompress(bytes(idat))
    out = (_adam7_unpack(rawpx, w, h, ch * sw) if inter
           else _unfilter_stream(rawpx, w, h, ch * sw))
    if depth == 16:
        # big-endian sample bytes -> uint16 (h, w, ch)
        u16 = (out.astype(np.uint16).reshape(h, w, ch, 2))
        pix = (u16[..., 0] << 8) | u16[..., 1]
        return pix[:, :, 0] if ch == 1 else pix
    out = out.reshape(h, w, ch)
    return out[:, :, 0] if ch == 1 else out


def _unfilter_stream(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """Filtered scanline stream -> (h, w, bpp) uint8 (all 5 filters).
    ``bpp`` = bytes per complete pixel (channels x bytes-per-sample):
    PNG filters reference the byte bpp positions to the left, so one
    byte-granular loop serves every depth/color combination."""
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = np.empty((h, w, bpp), np.uint8)
    prev = np.zeros((w, bpp), np.int16)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        row = np.frombuffer(raw, np.uint8, stride,
                            y * (stride + 1) + 1).reshape(w, bpp)
        if ft == 0:
            cur = row.astype(np.int16)
        elif ft == 2:
            cur = (row + prev) % 256
        elif ft in (1, 3, 4):
            # left-referencing filters are sequential per pixel
            cur = np.empty((w, bpp), np.int16)
            left = np.zeros(bpp, np.int16)
            upleft = np.zeros(bpp, np.int16)
            for x in range(w):
                up = prev[x]
                if ft == 1:
                    rec = row[x] + left
                elif ft == 3:
                    rec = row[x] + (left + up) // 2
                else:
                    rec = row[x] + _paeth(left, up, upleft)
                cur[x] = rec % 256
                left = cur[x]
                upleft = up
        else:
            raise ValueError(f"bad PNG row filter {ft}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def encode_apng(frames: np.ndarray, delay_den: int = 30) -> bytes:
    """(n_frames, H, W) or (n_frames, H, W, C) uint8 -> animated PNG
    (APNG, PNG third edition): acTL + per-frame fcTL, first frame in
    IDAT, subsequent frames in fdAT — all frames full-canvas,
    dispose none / blend source."""
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    if f.ndim == 3:
        color, ch = 0, 1
        f = f[:, :, :, None]
    elif f.ndim == 4 and f.shape[3] in (3, 4):
        color, ch = (2, 3) if f.shape[3] == 3 else (6, 4)
    else:
        raise ValueError("expect (N,H,W[,C]) uint8 frames")
    n, h, w = f.shape[:3]
    if n < 1:
        raise ValueError("need at least one frame")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    def raw_stream(img: np.ndarray) -> bytes:
        out = bytearray()
        for y in range(h):
            out.append(0)
            out += img[y].tobytes()
        return zlib.compress(bytes(out), 6)

    def fctl(seq: int) -> bytes:
        return struct.pack(">IIIIIHHBB", seq, w, h, 0, 0,
                           1, delay_den, 0, 0)  # dispose=0, blend=0

    out = bytearray(_PNG_SIG)
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color,
                                      0, 0, 0))
    out += chunk(b"acTL", struct.pack(">II", n, 0))
    out += chunk(b"fcTL", fctl(0))
    out += chunk(b"IDAT", raw_stream(f[0]))
    seq = 1                        # fcTL/fdAT share one 0-based counter
    for k in range(1, n):
        out += chunk(b"fcTL", fctl(seq))
        seq += 1
        out += chunk(b"fdAT",
                     struct.pack(">I", seq) + raw_stream(f[k]))
        seq += 1
    out += chunk(b"IEND", b"")
    return bytes(out)


def decode_apng(data: bytes) -> np.ndarray:
    """APNG bytes -> (n_frames, H, W[, C]) uint8. Restricted to the
    shape :func:`encode_apng` emits and most simple animations use:
    every frame full-canvas at offset (0,0); region updates
    (x/y offsets or sub-canvas frames) raise NotImplementedError.
    A plain PNG (no acTL) decodes as one frame."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, w = 8, None
    n_frames = 1
    streams: list[bytearray] = []
    cur: bytearray | None = None
    idat = bytearray()
    saw_fctl_before_idat = False
    while pos + 8 <= len(data):
        ln, tag = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color, comp, flt, inter = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or color not in _CHANNELS or inter:
                raise NotImplementedError(
                    "APNG depth/color/interlace outside the 8-bit "
                    "grey/RGB/RGBA non-interlaced subset")
        elif tag == b"acTL":
            n_frames = struct.unpack_from(">I", body)[0]
        elif tag == b"fcTL":
            _seq, fw, fh, fx, fy = struct.unpack_from(">IIIII", body)
            if (fw, fh, fx, fy) != (w, h, 0, 0):
                raise NotImplementedError(
                    "APNG region-update frames (only full-canvas "
                    "frames supported)")
            if idat:
                cur = bytearray()          # fcTL after IDAT: new frame
                streams.append(cur)
            else:
                saw_fctl_before_idat = True
        elif tag == b"IDAT":
            idat += body
        elif tag == b"fdAT":
            if cur is None:
                raise ValueError("APNG fdAT before any post-IDAT fcTL")
            cur += body[4:]                # skip sequence number
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    del saw_fctl_before_idat
    ch = _CHANNELS[color]
    frames = [_unfilter_stream(zlib.decompress(bytes(s)), w, h, ch)
              for s in [idat, *streams]]
    if len(frames) != n_frames:
        raise ValueError(
            f"APNG declared {n_frames} frames, found {len(frames)}")
    out = np.stack(frames)
    return out[:, :, :, 0] if ch == 1 else out


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 PCM -> WAV bytes."""
    s = np.asarray(samples, np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, nch = s.shape
    data = np.ascontiguousarray(s).tobytes()
    fmt = struct.pack("<HHIIHH", 1, nch, rate, rate * nch * 2, nch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_float32(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (n, channels) float32 -> IEEE-float WAV bytes
    (format code 3, 32-bit little-endian samples)."""
    s = np.asarray(samples, np.float32)
    if s.ndim == 1:
        s = s[:, None]
    n, nch = s.shape
    data = np.ascontiguousarray(s.astype("<f4")).tobytes()
    fmt = struct.pack("<HHIIHH", 3, nch, rate, rate * nch * 4,
                      nch * 4, 32)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n_samples, n_channels) array, sample rate).
    Integer PCM (format 1: 8-bit unsigned, 16/32-bit signed) decodes
    to an int array; IEEE float (format 3: 32/64-bit) decodes to a
    float array.  WAVE_FORMAT_EXTENSIBLE raises."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        tag, ln = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)   # chunks are word-aligned
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body)
        elif tag == b"data":
            raw = body
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, nch, rate, _, _, bits = fmt
    if audio_fmt == 1:
        dt = {8: np.uint8, 16: np.int16, 32: np.int32}.get(bits)
        if dt is None:
            raise NotImplementedError(f"WAV PCM bit depth {bits}")
    elif audio_fmt == 3:
        dt = {32: np.dtype("<f4"), 64: np.dtype("<f8")}.get(bits)
        if dt is None:
            raise NotImplementedError(f"WAV float bit depth {bits}")
    else:
        raise NotImplementedError(
            f"WAV format {audio_fmt} (only PCM=1 / IEEE-float=3; "
            "extensible unsupported)")
    s = np.frombuffer(raw, dt)
    n = len(s) // nch
    return s[:n * nch].reshape(n, nch), rate


def decode_image(data: bytes) -> np.ndarray:
    """Sniff-and-dispatch image decode: PNG by signature, JPEG by
    SOI marker, GIF by header — the formats that dominate web
    corpora, all decoded by the real stdlib+NumPy codecs in this
    package.  Multi-frame GIFs return their FIRST frame here; the
    video path (decode_frames) keeps the animation."""
    if data[:8] == _PNG_SIG:
        return decode_png(data)
    if data[:2] == b"\xFF\xD8":
        from pointdatabase_spark.sources.jpeg import decode_jpeg
        return decode_jpeg(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from pointdatabase_spark.sources.gif import decode_gif
        return decode_gif(data)[0]
    raise NotImplementedError(
        "image format is not PNG/JPEG/GIF (webp/avif need codecs "
        "not shipped in this container)")


def decode_frames(data: bytes) -> np.ndarray:
    """Sniff-and-dispatch ANIMATION decode: APNG -> (n,H,W[,C])
    frames, GIF -> (n,H,W,3) composited frames.  Other containers
    (mp4, webm, ...) need ffmpeg, which is not shipped."""
    if data[:8] == _PNG_SIG:
        return decode_apng(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from pointdatabase_spark.sources.gif import decode_gif
        return decode_gif(data)
    raise NotImplementedError(
        "video container is neither APNG nor GIF — mp4/webm need "
        "ffmpeg, which is not shipped in this container")
