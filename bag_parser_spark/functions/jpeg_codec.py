"""Minimal real baseline-JPEG codec (stdlib-only), grayscale scope.

Third real image format beside PNG (``png_codec``) and Y4M
(``y4m_codec``) — VERDICT r6 stretch #8. JPEG is the most common real
corpus image format; this module implements the genuinely hard parts
(canonical Huffman entropy coding, zigzag run-length, DC prediction,
8x8 DCT/IDCT, byte stuffing) with nothing beyond ``struct``/``math``,
so the multimodal decode path exercises a real lossy-codec pipeline,
not a byte-arithmetic fake.

Scope (explicit, checked): baseline sequential DCT (SOF0), 8-bit,
single component (grayscale), no subsampling, no restart markers.
Progressive (SOF2), multi-component, 12-bit, or arithmetic-coded
streams raise ``UnsupportedJpegError`` with a clear message rather
than decoding wrongly. Huffman/quant tables are read from the file's
own DQT/DHT segments (the encoder writes the ITU T.81 Annex K
standard tables, but the decoder does not assume them).

Oracle-exactness design: JPEG is lossy in general, but an 8x8 block
that is CONSTANT has only a DC coefficient (8*(v-128), an exact
integer), which quantization step 1 preserves exactly and the IDCT of
a DC-only block reconstructs to within ~2^-47 of the constant — far
inside integer-rounding tolerance. The catalog fixtures therefore use
block-constant pixels with an all-ones quant table, making the decoded
statistics bit-exactly predictable by the DuckDB oracle from the block
formula, while the codec itself (DC prediction across blocks, Huffman
categories, stuffing) runs the full real pipeline. Non-constant blocks
are exercised by unit tests under a lossy tolerance instead.

Per-pixel/per-bit Python is fine here for the same reason as
png_codec: this runs inside Arrow-batched ``mapInPandas`` on executor
workers over tiny fixture images; real deployments swap in a C-backed
decoder (Pillow/libjpeg) behind the same DataFrame plumbing.
"""

from __future__ import annotations

import math
import struct

JPEG_MAGIC = b"\xff\xd8"


class UnsupportedJpegError(ValueError):
    pass


# Zigzag scan order: ZIGZAG[k] = raster index of the k-th zigzag coeff
# (ITU T.81 Figure 5 / Annex A.3.6 — public spec constant).
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
)

# Standard luminance Huffman tables (ITU T.81 Annex K.3.3 — public
# spec constants): (BITS[1..16], HUFFVAL). The encoder writes these in
# DHT; the decoder always reads tables from the stream.
DC_LUMA_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
DC_LUMA_VALS = tuple(range(12))
AC_LUMA_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
AC_LUMA_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
)

# IDCT/DCT basis: cos((2x+1) u pi / 16) with the C(u) normalization
# folded in, precomputed once (8x8 direct transform — O(64^2) per
# block is irrelevant at fixture sizes and obviously correct).
_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
    for x in range(8)
]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def _canonical_codes(bits, vals):
    """(value -> (code, length)) canonical Huffman assignment (T.81
    Annex C): codes of each successive length count up from twice the
    previous length's last code."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits, vals):
    """((length, code) -> value) for the bit-at-a-time decoder."""
    return {
        (length, code): v
        for v, (code, length) in _canonical_codes(bits, vals).items()
    }


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            self._nbits -= 8
            b = (self._acc >> self._nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> bytes:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)  # 1-fill final byte
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._nbits = 0

    def read_bit(self) -> int:
        if self._nbits == 0:
            if self.pos >= len(self.data):
                raise UnsupportedJpegError("truncated entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise UnsupportedJpegError("truncated entropy stream")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise UnsupportedJpegError(
                        f"unexpected marker 0xFF{nxt:02X} in scan "
                        "(restart markers are out of scope)"
                    )
            self._acc = b
            self._nbits = 8
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_huff(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            v = table.get((length, code))
            if v is not None:
                return v
        raise UnsupportedJpegError("invalid Huffman code in scan")


def _category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def _fdct_quant(block, quant):
    """Level-shifted 2D DCT-II of a 64-int raster block, quantized and
    returned in ZIGZAG order."""
    shifted = [v - 128 for v in block]
    out = [0] * 64
    for k in range(64):
        r = ZIGZAG[k]
        u, v = r % 8, r // 8
        s = 0.0
        for y in range(8):
            row = shifted[y * 8 : y * 8 + 8]
            cy = _COS[y][v]
            for x in range(8):
                s += row[x] * _COS[x][u] * cy
        s *= 0.25 * _C[u] * _C[v]
        q = quant[k]
        out[k] = int(round(s / q))
    return out


def _idct_dequant(zz, quant):
    """Inverse of ``_fdct_quant``: zigzag coeffs -> 64 clamped bytes."""
    coeff = [0.0] * 64
    for k in range(64):
        coeff[ZIGZAG[k]] = zz[k] * quant[k]
    out = bytearray(64)
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                cv = _COS[y][v] * _C[v]
                base = v * 8
                for u in range(8):
                    c = coeff[base + u]
                    if c:
                        s += c * _COS[x][u] * _C[u] * cv
            p = int(round(0.25 * s)) + 128
            out[y * 8 + x] = 0 if p < 0 else (255 if p > 255 else p)
    return bytes(out)


def encode_scan(blocks, writer: _BitWriter) -> None:
    """Entropy-encode quantized zigzag blocks (DC diff + AC RLE with
    ZRL/EOB) using the standard luminance tables. Exposed for bit-level
    unit tests."""
    dc_codes = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    pred = 0
    for zz in blocks:
        diff = zz[0] - pred
        pred = zz[0]
        size = _category(diff)
        writer.write(*dc_codes[size])
        if size:
            writer.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
        run = 0
        for k in range(1, 64):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                writer.write(*ac_codes[0xF0])  # ZRL: 16 zeros
                run -= 16
            size = _category(zz[k])
            writer.write(*ac_codes[(run << 4) | size])
            v = zz[k]
            writer.write(v if v >= 0 else v + (1 << size) - 1, size)
            run = 0
        if run:
            writer.write(*ac_codes[0x00])  # EOB


def decode_scan(data: bytes, n_blocks: int, dc_table, ac_table):
    """Entropy-decode ``n_blocks`` zigzag blocks. Exposed for bit-level
    unit tests."""
    r = _BitReader(data)
    blocks = []
    pred = 0
    for _ in range(n_blocks):
        zz = [0] * 64
        size = r.read_huff(dc_table)
        diff = 0
        if size:
            diff = r.read_bits(size)
            if diff < (1 << (size - 1)):  # EXTEND (T.81 F.2.2.1)
                diff -= (1 << size) - 1
        pred += diff
        zz[0] = pred
        k = 1
        while k < 64:
            rs = r.read_huff(ac_table)
            run, size = rs >> 4, rs & 0x0F
            if size == 0:
                if run == 15:
                    k += 16  # ZRL
                    continue
                break  # EOB
            k += run
            if k > 63:
                raise UnsupportedJpegError("AC run past block end")
            v = r.read_bits(size)
            if v < (1 << (size - 1)):
                v -= (1 << size) - 1
            zz[k] = v
            k += 1
        blocks.append(zz)
    return blocks


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def encode_jpeg_gray(
    width: int, height: int, pixels: bytes, quant: tuple | None = None
) -> bytes:
    """Encode an 8-bit grayscale raster as baseline JFIF. ``quant`` is
    a 64-entry zigzag-order table (default all ones — the max-quality
    setting that keeps constant blocks bit-exact). Edge blocks replicate
    the last row/column (the standard pad that adds no new frequencies
    along the replicated axis)."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match dimensions")
    q = tuple(quant) if quant is not None else (1,) * 64
    if len(q) != 64 or any(not 1 <= x <= 255 for x in q):
        raise ValueError("quant table must be 64 entries in [1, 255]")
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    blocks = []
    for by in range(bh):
        for bx in range(bw):
            blk = []
            for dy in range(8):
                y = min(by * 8 + dy, height - 1)
                for dx in range(8):
                    x = min(bx * 8 + dx, width - 1)
                    blk.append(pixels[y * width + x])
            blocks.append(_fdct_quant(blk, q))
    w = _BitWriter()
    encode_scan(blocks, w)
    scan = w.flush()

    out = bytearray(JPEG_MAGIC)
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(q))  # DQT: 8-bit table 0
    out += _seg(  # SOF0: precision 8, 1 component, no subsampling
        0xC0,
        struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]),
    )
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS)
                + bytes(DC_LUMA_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS)
                + bytes(AC_LUMA_VALS))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg_gray(data: bytes) -> dict:
    """Decode a baseline grayscale JPEG produced by any conforming
    encoder within the documented scope. Returns ``{"width", "height",
    "channels": 1, "pixels": bytes}``. Tables come from the stream's
    own DQT/DHT segments."""
    if data[:2] != JPEG_MAGIC:
        raise UnsupportedJpegError("not a JPEG (missing SOI)")
    pos = 2
    quants: dict[int, tuple] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    width = height = None
    comp_q = comp_dc = comp_ac = 0
    while True:
        if pos + 4 > len(data):
            raise UnsupportedJpegError("truncated before SOS")
        if data[pos] != 0xFF:
            raise UnsupportedJpegError("marker sync lost")
        marker = data[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(payload):
                pq, tq = payload[i] >> 4, payload[i] & 0x0F
                if pq != 0:
                    raise UnsupportedJpegError("16-bit quant table")
                quants[tq] = tuple(payload[i + 1 : i + 65])
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(payload):
                tc, th = payload[i] >> 4, payload[i] & 0x0F
                bits = tuple(payload[i + 1 : i + 17])
                n = sum(bits)
                vals = tuple(payload[i + 17 : i + 17 + n])
                (dc_tables if tc == 0 else ac_tables)[th] = _decode_table(
                    bits, vals
                )
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, height, width, ncomp = struct.unpack(
                ">BHHB", payload[:6]
            )
            if prec != 8:
                raise UnsupportedJpegError(f"{prec}-bit precision")
            if ncomp != 1:
                raise UnsupportedJpegError(
                    f"{ncomp}-component JPEG (grayscale scope)"
                )
            if payload[7] != 0x11:
                raise UnsupportedJpegError("subsampled single component")
            comp_q = payload[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedJpegError(
                f"SOF{marker - 0xC0} (only baseline SOF0 supported)"
            )
        elif marker == 0xDA:  # SOS — entropy data follows
            if width is None:
                raise UnsupportedJpegError("SOS before SOF0")
            comp_dc = payload[2] >> 4
            comp_ac = payload[2] & 0x0F
            break
        elif marker == 0xD9:
            raise UnsupportedJpegError("EOI before any scan")
        # else: APPn/COM/etc — skipped via seglen
    end = data.rfind(b"\xff\xd9")
    scan = data[pos : end if end > pos else len(data)]
    bw_blocks = (width + 7) // 8
    bh_blocks = (height + 7) // 8
    blocks = decode_scan(
        scan,
        bw_blocks * bh_blocks,
        dc_tables[comp_dc],
        ac_tables[comp_ac],
    )
    q = quants[comp_q]
    pixels = bytearray(width * height)
    for i, zz in enumerate(blocks):
        raster = _idct_dequant(zz, q)
        bx, by = i % bw_blocks, i // bw_blocks
        for dy in range(8):
            y = by * 8 + dy
            if y >= height:
                break
            row = raster[dy * 8 : dy * 8 + 8]
            x0 = bx * 8
            n = min(8, width - x0)
            pixels[y * width + x0 : y * width + x0 + n] = row[:n]
    return {
        "width": width,
        "height": height,
        "channels": 1,
        "pixels": bytes(pixels),
    }
