"""Baseline JPEG (JFIF) codec in pure numpy — no Pillow/libjpeg.

Implements the baseline sequential DCT process of the public JPEG
specification (ITU-T T.81 / ISO 10918-1): 8×8 FDCT/IDCT, quantization,
zigzag ordering, DC prediction, and canonical Huffman entropy coding
with the spec's Annex-K "typical" tables. Supported subset — the one an
in-container training-data pipeline needs for real compressed payloads:

- encode: grayscale (h, w) or RGB (h, w, 3) uint8 → 4:4:4 baseline JFIF
  (no subsampling, no restart markers, 8-bit precision);
- decode: SOI/APP0/COM/DQT/SOF0/DHT/SOS/EOI marker stream with 1 or 3
  components, all sampling factors 1×1 (4:4:4). Progressive (SOF2),
  subsampled, arithmetic-coded, and restart-interval streams raise
  ``NotImplementedError`` — those need a full libjpeg on the cluster.

Determinism contract (what lets a SQL oracle reproduce the round-trip):
every float→int step uses floor(x + 0.5) — round-half-up, matching
SQL's ``floor(x + 0.5)`` exactly — never numpy's banker's rounding. A
constant-color image with DC quantization step 8 round-trips its YCbCr
values bit-exactly (DC = 8·(v−128) is divided by exactly 8), so the
decoded RGB is a closed-form integer function of the input color.

Everything here is from the public spec; the reference engine has no
multimodal surface (SURVEY.md §2 — beyond-reference component).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

# K.1 — typical luminance/chrominance quantization tables (row-major).
STD_LUMA_QUANT = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
STD_CHROMA_QUANT = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# K.3 — typical Huffman tables: (BITS[1..16], HUFFVAL) per table.
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _zigzag_order() -> np.ndarray:
    """The spec's zigzag scan as 64 flat indices into a row-major 8×8
    block, generated (not transcribed): diagonals s = row+col in order;
    odd diagonals walk row-increasing, even diagonals row-decreasing."""
    out = []
    for s in range(15):
        rng = range(s + 1) if s % 2 else range(s, -1, -1)
        for row in rng:
            col = s - row
            if row < 8 and col < 8:
                out.append(row * 8 + col)
    return np.array(out, dtype=np.int64)


ZIGZAG = _zigzag_order()
UNZIGZAG = np.argsort(ZIGZAG)

# Orthonormal DCT-II matrix: FDCT F = A f Aᵀ, IDCT f = Aᵀ F A.
_A = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            * 0.5
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _round_half_up(x: np.ndarray) -> np.ndarray:
    return np.floor(x + 0.5)


def rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    """JFIF RGB→YCbCr with round-half-up + clip (int arrays in, out)."""
    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(_round_half_up(out), 0, 255).astype(np.int32)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """JFIF YCbCr→RGB with round-half-up + clip."""
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64) - 128.0
    cr = ycc[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(_round_half_up(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Bit-level IO (FF byte stuffing per B.1.1.5)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # stuff a zero so decoders don't see a marker
                self.buf.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            self.write((1 << (8 - self._n)) - 1, 8 - self._n)  # pad with 1s


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy-coded segment")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("marker inside entropy-coded segment")
            self._acc = byte
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.read_bit()
        return v


# ---------------------------------------------------------------------------
# Canonical Huffman tables
# ---------------------------------------------------------------------------


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per the spec's code assignment (C.2):
    codes of each length are consecutive, lengths ascending."""
    assert len(bits) == 16 and sum(bits) == len(vals)
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    return {cl: sym for sym, cl in _canonical_codes(bits, vals).items()}


def _read_symbol(br: _BitReader, dmap: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = dmap.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended bits) for a DC diff / AC coefficient (F.1.2)."""
    if v == 0:
        return 0, 0
    cat = int(abs(v)).bit_length()
    return (cat, v) if v > 0 else (cat, v + (1 << cat) - 1)


def _extend(bits: int, cat: int) -> int:
    """Inverse of :func:`_magnitude` (spec EXTEND)."""
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _plane_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad a (h, w) plane to 8×8 multiples by edge replication and
    return (blocks[n, 8, 8] row-major, blocks_y, blocks_x)."""
    h, w = plane.shape
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")
    by, bx = H // 8, W // 8
    blocks = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, by, bx


def _encode_block(
    bw: _BitWriter,
    qcoef: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    zz = qcoef.reshape(64)[ZIGZAG]
    dc = int(zz[0])
    cat, extra = _magnitude(dc - pred)
    code, length = dc_codes[cat]
    bw.write(code, length)
    bw.write(extra, cat)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL: 16 zeros
            bw.write(code, length)
            run -= 16
        cat, extra = _magnitude(v)
        code, length = ac_codes[(run << 4) | cat]
        bw.write(code, length)
        bw.write(extra, cat)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def encode_jpeg(
    img: np.ndarray,
    luma_quant: np.ndarray | None = None,
    chroma_quant: np.ndarray | None = None,
    subsampling: str = "444",
) -> bytes:
    """Encode a (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    baseline JFIF stream with the Annex-K Huffman tables.
    ``subsampling``: "444" (one block per component per MCU — the
    original path, bit-identical), "420" (2×2 luma blocks + one
    half-resolution chroma block per 16×16 MCU — the layout most
    real-world JPEGs use) or "422" (2×1). Chroma is box-averaged with
    round-half-up (deterministic); planes are edge-replicated to MCU
    multiples before the DCT."""
    if subsampling not in ("444", "420", "422"):
        raise ValueError(f"subsampling must be 444/420/422, got {subsampling}")
    lq = (STD_LUMA_QUANT if luma_quant is None else np.asarray(luma_quant)).astype(
        np.int32
    )
    cq = (
        STD_CHROMA_QUANT if chroma_quant is None else np.asarray(chroma_quant)
    ).astype(np.int32)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    hh, vv = (1, 1) if (gray or subsampling == "444") else {
        "420": (2, 2),
        "422": (2, 1),
    }[subsampling]
    if gray:
        planes = [img.astype(np.int32)]
    elif (hh, vv) == (1, 1):
        planes = [rgb_to_ycbcr(img)[..., c] for c in range(3)]
    else:
        # pad to MCU multiples first (edge replicate), then box-average
        # the chroma onto the subsampled grid with round-half-up
        ycc = rgb_to_ycbcr(img)
        mh, mw = 8 * vv, 8 * hh
        H2, W2 = -(-h // mh) * mh, -(-w // mw) * mw
        pads = [
            np.pad(ycc[..., c], ((0, H2 - h), (0, W2 - w)), mode="edge")
            for c in range(3)
        ]

        def _sub(p: np.ndarray) -> np.ndarray:
            m = (
                p.astype(np.float64)
                .reshape(H2 // vv, vv, W2 // hh, hh)
                .mean(axis=(1, 3))
            )
            return _round_half_up(m).astype(np.int32)

        planes = [pads[0], _sub(pads[1]), _sub(pads[2])]
    ncomp = len(planes)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += _seg(0xDB, bytes([0]) + bytes(lq.reshape(64)[ZIGZAG].tolist()))
    if not gray:
        out += _seg(0xDB, bytes([1]) + bytes(cq.reshape(64)[ZIGZAG].tolist()))
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof.append(ncomp)
    for ci in range(ncomp):
        samp = ((hh << 4) | vv) if ci == 0 else 0x11
        sof += bytes([ci + 1, samp, 0 if ci == 0 else 1])
    out += _seg(0xC0, bytes(sof))
    for tc_th, bits, vals in (
        ((0x00, DC_LUMA_BITS, DC_LUMA_VALS)),
        ((0x10, AC_LUMA_BITS, AC_LUMA_VALS)),
    ):
        out += _seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if not gray:
        out += _seg(0xC4, bytes([0x01]) + bytes(DC_CHROMA_BITS) + bytes(DC_CHROMA_VALS))
        out += _seg(0xC4, bytes([0x11]) + bytes(AC_CHROMA_BITS) + bytes(AC_CHROMA_VALS))
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, bytes(sos))

    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    comp_blocks = []
    for ci, plane in enumerate(planes):
        blocks, by, bx = _plane_blocks(plane)
        q = lq if ci == 0 else cq
        f = _A @ (blocks.astype(np.float64) - 128.0) @ _A.T
        comp_blocks.append(
            (_round_half_up(f / q).astype(np.int32), by, bx)
        )
    bw = _BitWriter()
    preds = [0] * ncomp
    mcuy = comp_blocks[0][1] // vv
    mcux = comp_blocks[0][2] // hh
    for m in range(mcuy * mcux):  # MCU raster; 4:4:4 MCU = one block/comp
        r, c = divmod(m, mcux)
        for ci in range(ncomp):
            chh, cvv = (hh, vv) if ci == 0 else (1, 1)
            blocks, _, bx = comp_blocks[ci]
            for dy in range(cvv):
                for dx in range(chh):
                    bi = (r * cvv + dy) * bx + (c * chh + dx)
                    preds[ci] = _encode_block(
                        bw,
                        blocks[bi],
                        preds[ci],
                        dc_l if ci == 0 else dc_c,
                        ac_l if ci == 0 else ac_c,
                    )
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline 4:4:4 (or grayscale) JFIF stream produced by
    :func:`encode_jpeg` or any encoder within the supported subset.
    Returns (h, w) for 1 component, (h, w, 3) RGB for 3."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_maps: dict[int, dict] = {}
    ac_maps: dict[int, dict] = {}
    comps: list[tuple[int, int, int]] = []  # (id, quant_tbl, sampling)
    h = w = 0
    scan: list[tuple[int, int, int]] = []  # (comp_index, dc_tbl, ac_tbl)
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("expected marker")
        # T.81 B.1.1.2: any marker may be preceded by optional fill
        # bytes (repeated 0xFF) — skip them so conforming streams from
        # other encoders don't misparse 0xFF as the marker id
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(payload):
            # a payload ending in a 0xFF fill run has no marker id byte
            # left — malformed stream, the codec's ValueError contract
            raise ValueError("truncated marker")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / RSTn: bare
            pos += 2
            continue
        size = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        body = payload[pos + 4 : pos + 2 + size]
        pos += 2 + size
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, np.int32)
                tbl[ZIGZAG] = np.frombuffer(body[p + 1 : p + 65], np.uint8)
                qtables[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC0:  # SOF0 baseline
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            n = body[5]
            for ci in range(n):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = samp >> 4, samp & 0xF
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise NotImplementedError(
                        f"sampling factors {hi}x{vi} beyond the 4:4:4 / "
                        f"4:2:2 / 4:2:0 subset need libjpeg"
                    )
                comps.append((cid, tq, samp))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("only baseline sequential (SOF0) decodes")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(body[p + 17 : p + 17 + nv])
                (ac_maps if tc else dc_maps)[th] = _decode_map(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            if int.from_bytes(body, "big") != 0:
                raise NotImplementedError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            by_id = {cid: i for i, (cid, _, _) in enumerate(comps)}
            for si in range(ns):
                cid, tbls = body[1 + 2 * si], body[2 + 2 * si]
                scan.append((by_id[cid], tbls >> 4, tbls & 0xF))
            br = _BitReader(payload, pos)
            ncomp = len(comps)
            hs = [s >> 4 for _, _, s in comps]
            vs = [s & 0xF for _, _, s in comps]
            hmax, vmax = max(hs), max(vs)
            if any(hmax % hi or vmax % vi for hi, vi in zip(hs, vs)):
                raise NotImplementedError(
                    "non-integral sampling-factor ratios need libjpeg"
                )
            mcuy, mcux = -(-h // (8 * vmax)), -(-w // (8 * hmax))
            # each component's plane on its own (possibly subsampled)
            # grid, padded to whole MCUs; 4:4:4 degenerates to the
            # one-block-per-component raster this loop always had
            planes = [
                np.zeros((mcuy * 8 * vs[ci], mcux * 8 * hs[ci]), np.float64)
                for ci in range(ncomp)
            ]
            preds = [0] * ncomp
            for m in range(mcuy * mcux):
                r, c = divmod(m, mcux)
                for ci, dct, act in scan:
                    for dy in range(vs[ci]):
                        for dx in range(hs[ci]):
                            zz = np.zeros(64, np.int64)
                            cat = _read_symbol(br, dc_maps[dct])
                            preds[ci] += _extend(br.read_bits(cat), cat)
                            zz[0] = preds[ci]
                            i = 1
                            while i < 64:
                                sym = _read_symbol(br, ac_maps[act])
                                if sym == 0x00:  # EOB
                                    break
                                run, cat = sym >> 4, sym & 0xF
                                if cat == 0:
                                    if run != 15:
                                        raise ValueError("bad AC symbol")
                                    i += 16  # ZRL
                                    continue
                                i += run
                                if i > 63:
                                    raise ValueError("AC run overflow")
                                zz[i] = _extend(br.read_bits(cat), cat)
                                i += 1
                            q = qtables[comps[ci][1]]
                            f = (zz[UNZIGZAG].reshape(8, 8) * q).astype(
                                np.float64
                            )
                            pix = _A.T @ f @ _A + 128.0
                            py = (r * vs[ci] + dy) * 8
                            px = (c * hs[ci] + dx) * 8
                            planes[ci][py : py + 8, px : px + 8] = pix
            # nearest-neighbor chroma upsample onto the luma grid (the
            # decode_y4m convention), then crop the MCU padding
            full = [
                p.repeat(vmax // vs[ci], axis=0).repeat(hmax // hs[ci], axis=1)
                for ci, p in enumerate(planes)
            ]
            out = np.clip(
                _round_half_up(np.stack(full, axis=-1)[:h, :w]), 0, 255
            ).astype(np.int32)
            if ncomp == 1:
                return out[..., 0].astype(np.uint8)
            if ncomp == 3:
                return ycbcr_to_rgb(out)
            raise NotImplementedError("CMYK JPEG unsupported")
        # APPn / COM and anything else: skipped
    raise ValueError("no SOS segment found")
