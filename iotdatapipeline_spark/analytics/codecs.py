"""Pure-stdlib media codecs for the multimodal path.

This container has no PIL/ffmpeg/soundfile, so "real codec" support is
implemented from format specs with ``struct`` + ``zlib`` only:

* BMP — uncompressed 24-bit (BITMAPINFOHEADER), the trivially
  parseable raster format;
* PNG — 8-bit greyscale / RGB / RGBA, non-interlaced, full filter
  (None/Sub/Up/Average/Paeth) reconstruction over zlib'd IDAT;
* WAV — RIFF PCM 16-bit, any channel count.

``analytics.multimodal`` sniffs payload magic and routes these formats
through the real decoders even in strict mode; unknown formats raise in
strict mode exactly as before (a JPEG/MP3-capable backend would slot in
behind :func:`sniff` the same way). Decoders are deterministic and
byte-exact, so oracle-paired gates stay reproducible.

Scale note: these run inside Arrow ``mapInPandas`` batches on
executors — per-asset pure-Python loops bound by scanline count, no
driver involvement, no shared state.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["sniff", "decode_bmp", "decode_png", "decode_wav", "luma"]


def sniff(data: bytes) -> str | None:
    """Magic-byte format detection:
    'bmp' | 'png' | 'wav' | 'jpeg' | 'gif' | 'webp' | None.
    bmp/png/wav decode natively here; jpeg/gif/webp route to the
    optional Pillow path (``pip install .[imaging]``,
    analytics/multimodal.py)."""
    if data[:2] == b"BM" and len(data) >= 54:
        return "bmp"
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    return None


def luma(img: np.ndarray) -> np.ndarray:
    """ITU-R BT.601 integer luma for (H, W, 3+) arrays; identity for
    greyscale. Integer arithmetic → bit-identical across platforms."""
    if img.ndim == 2:
        return img
    r, g, b = (img[..., i].astype(np.int64) for i in range(3))
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP → (H, W, 3) uint8 RGB. Rows are stored
    bottom-up (unless height < 0) and padded to 4-byte boundaries;
    pixels are BGR on disk."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    width, height = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant: bpp={bpp} compression={compression}")
    top_down = height < 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    if len(data) < pix_off + stride * height:
        raise ValueError("truncated BMP pixel array")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * height, offset=pix_off)
    img = rows.reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    if not top_down:
        img = img[::-1]
    return img[..., ::-1].copy()  # BGR → RGB


_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # greyscale, RGB, RGBA


def decode_png(data: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG → (H, W) or (H, W, C) uint8, with full
    scanline filter reconstruction (types 0–4 per the PNG spec)."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, idat, meta = 8, b"", None
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or color not in _PNG_CHANNELS or interlace != 0:
                raise ValueError(f"unsupported PNG variant: depth={depth} color={color} interlace={interlace}")
            meta = (w, h, _PNG_CHANNELS[color])
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + crc
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, ch = meta
    raw = zlib.decompress(idat)
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(raw, np.uint8, stride, y * (stride + 1) + 1).astype(np.int64)
        if ft == 0:
            cur = line
        elif ft == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ft in (1, 3, 4):  # Sub / Average / Paeth need left-to-right scan
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if ft == 1:
                    base = a
                elif ft == 3:
                    base = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    base = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (line[x] + base) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM-16 → (interleaved int16 samples, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, bits, fmt_tag, samples = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + length]
        if cid == b"fmt ":
            fmt_tag, _n_ch, rate, _byte_rate, _align, bits = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            samples = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    if fmt_tag != 1 or bits != 16:
        raise ValueError(f"unsupported WAV variant: fmt={fmt_tag} bits={bits}")
    usable = len(samples) - (len(samples) % 2)
    return np.frombuffer(samples[:usable], dtype="<i2"), int(rate)
