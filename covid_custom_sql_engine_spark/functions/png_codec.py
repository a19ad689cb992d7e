"""PNG codec in numpy + stdlib zlib — no Pillow.

Implements the public PNG specification (RFC 2083 / ISO 15948) subset a
training-data pipeline meets in practice: 8-bit greyscale (color type
0), truecolor (2), and truecolor+alpha (6), non-interlaced, with all
five scanline filters (None/Sub/Up/Average/Paeth). DEFLATE is stdlib
``zlib`` — the only non-trivial dependency PNG has — so unlike JPEG
there is no numerical approximation anywhere: PNG is lossless and the
round-trip is bit-exact, which makes any pixel-statistics query over
encoded payloads oracle-able with the raw pixel formula directly.

Out of subset (raise ``NotImplementedError``): interlaced (Adam7),
palette (3), 16-bit, and ancillary-critical combinations. Chunk CRCs
are verified on decode.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (8-bit depth)
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        len(body).to_bytes(4, "big")
        + ctype
        + body
        + zlib.crc32(ctype + body).to_bytes(4, "big")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (spec §6.6): nearest of left/up/
    upper-left to a+b−c, ties broken left, up, upper-left."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def encode_png(img: np.ndarray, filter_mode: str = "cycle") -> bytes:
    """Encode (h, w) grey, (h, w, 3) RGB, or (h, w, 4) RGBA uint8.

    ``filter_mode``: 'none' writes filter 0 everywhere (simplest),
    'cycle' rotates through all five filter types row-by-row — the
    encoder stays spec-valid either way, and 'cycle' makes a single
    round-trip exercise every decoder unfilter path."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        ctype, chans = 0, 1
        arr = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        ctype, chans = 2, 3
    elif arr.ndim == 3 and arr.shape[2] == 4:
        ctype, chans = 6, 4
    else:
        raise ValueError("expected (h,w), (h,w,3) or (h,w,4) uint8")
    h, w = arr.shape[:2]
    raw = arr.reshape(h, w * chans)
    lines = bytearray()
    prev = np.zeros(w * chans, np.uint8)
    for y in range(h):
        row = raw[y]
        ft = 0 if filter_mode == "none" else y % 5
        left = np.concatenate([np.zeros(chans, np.uint8), row[:-chans]])
        upleft = np.concatenate([np.zeros(chans, np.uint8), prev[:-chans]])
        if ft == 0:
            filt = row
        elif ft == 1:  # Sub
            filt = row - left
        elif ft == 2:  # Up
            filt = row - prev
        elif ft == 3:  # Average
            filt = row - ((left.astype(np.int32) + prev.astype(np.int32)) // 2).astype(
                np.uint8
            )
        else:  # Paeth
            filt = row - _paeth(left, prev, upleft)
        lines.append(ft)
        lines += filt.astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines), 9))
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit grey/RGB/RGBA PNG. Returns (h, w)
    for grey, (h, w, 3) / (h, w, 4) otherwise. Verifies chunk CRCs."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    idat = bytearray()
    w = h = None
    chans = 0
    while pos < len(payload):
        size = int.from_bytes(payload[pos : pos + 4], "big")
        # bounds-check BEFORE slicing: a truncated stream would otherwise
        # yield a short body/CRC slice and surface as a misleading
        # 'bad CRC' instead of the real problem
        if pos + 12 + size > len(payload):
            raise ValueError("truncated PNG chunk")
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        crc = int.from_bytes(payload[pos + 8 + size : pos + 12 + size], "big")
        if zlib.crc32(ctype + body) != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        pos += 12 + size
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise NotImplementedError("only 8-bit PNG decodes in-container")
            if color not in _CHANNELS:
                raise NotImplementedError("palette PNG needs PLTE handling")
            if interlace != 0:
                raise NotImplementedError("Adam7 interlacing unsupported")
            if comp != 0 or filt != 0:
                raise ValueError("unknown compression/filter method")
            chans = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = w * chans
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ft == 0:
            row = line
        elif ft == 2:  # Up
            row = line + prev
        elif ft in (1, 3, 4):  # Sub / Average / Paeth need left-to-right scan
            row = line
            for x in range(stride):
                left = row[x - chans] if x >= chans else 0
                up = prev[x]
                ul = prev[x - chans] if x >= chans else 0
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (int(left) + int(up)) // 2
                else:
                    p = int(left) + int(up) - int(ul)
                    pa, pb, pc = abs(p - int(left)), abs(p - int(up)), abs(p - int(ul))
                    pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                row[x] = (int(row[x]) + int(pred)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ft}")
        out[y] = row
        prev = row
    img = out.reshape(h, w, chans)
    return img[..., 0] if chans == 1 else img
