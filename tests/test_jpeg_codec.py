"""Baseline-JPEG codec: bit-exact round-trip for block-constant images
(the oracle-exactness contract), lossy-tolerance round-trip for general
images, entropy-coding edge paths (ZRL, EOB, DC categories), and the
documented unsupported-scope errors."""

from __future__ import annotations

import pytest

from bag_parser_spark.functions import jpeg_codec as J


def _block_constant(width, height, val_fn):
    """Pixels constant within each 8x8 block, value from val_fn(bx, by)."""
    return bytes(
        val_fn(x // 8, y // 8) for y in range(height) for x in range(width)
    )


def test_block_constant_roundtrip_bit_exact():
    """Constant 8x8 blocks survive quant=1 baseline JPEG exactly (DC-only
    blocks; the property the catalog oracle relies on), across multiple
    dims and DC-diff signs/magnitudes."""
    for doc_id in (0, 1, 5, 17, 254, 1023):
        w = 8 * (1 + doc_id % 3)
        h = 8 * (1 + doc_id % 2)
        px = _block_constant(
            w, h, lambda bx, by: (doc_id * 7 + 11 * bx + 13 * by) % 256
        )
        out = J.decode_jpeg_gray(J.encode_jpeg_gray(w, h, px))
        assert (out["width"], out["height"]) == (w, h)
        assert out["pixels"] == px, doc_id


def test_extreme_dc_categories_bit_exact():
    """DC diffs spanning the full category range (0 and 255 blocks
    alternating: |diff| = 2040 at the quantized-DC level, category 11)."""
    w, h = 32, 16
    px = _block_constant(w, h, lambda bx, by: 255 * ((bx + by) % 2))
    out = J.decode_jpeg_gray(J.encode_jpeg_gray(w, h, px))
    assert out["pixels"] == px


def test_general_image_roundtrip_lossy_tolerance():
    """Non-constant blocks: quant=1 keeps per-pixel error within the
    coefficient-rounding bound (empirically <= 2 for 8-bit content)."""
    w, h = 24, 16
    px = bytes((3 * x * x + 5 * y + x * y) % 256 for y in range(h)
               for x in range(w))
    out = J.decode_jpeg_gray(J.encode_jpeg_gray(w, h, px))
    assert out["width"] == w and out["height"] == h
    err = max(abs(a - b) for a, b in zip(out["pixels"], px))
    assert err <= 2, err


def test_non_multiple_of_8_dims_crop():
    """Edge-replicated pad blocks decode then crop back to the exact
    requested dims; the visible region of a block-constant image stays
    bit-exact (replication adds no frequencies)."""
    w, h = 13, 10
    px = _block_constant(w, h, lambda bx, by: 40 + 50 * bx + 90 * by)
    out = J.decode_jpeg_gray(J.encode_jpeg_gray(w, h, px))
    assert (out["width"], out["height"]) == (w, h)
    assert len(out["pixels"]) == w * h
    assert out["pixels"] == px


def test_entropy_zrl_and_eob_paths():
    """Bit-level scan coverage: a block whose only AC coeff sits past
    two 16-zero runs forces ZRL+ZRL+code, and trailing zeros force EOB;
    decode_scan must invert encode_scan exactly."""
    zz1 = [0] * 64
    zz1[0] = 37
    zz1[40] = -3  # 39 leading AC zeros -> ZRL, ZRL, run=7
    zz2 = [0] * 64
    zz2[0] = -5
    zz2[1] = 1  # then 62 trailing zeros -> EOB
    zz3 = [0] * 64  # all-zero block: DC diff category 0 + immediate EOB
    w = J._BitWriter()
    J.encode_scan([zz1, zz2, zz3], w)
    data = w.flush()
    dc = J._decode_table(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    ac = J._decode_table(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
    assert J.decode_scan(data, 3, dc, ac) == [zz1, zz2, zz3]


def test_byte_stuffing_roundtrip():
    """A scan whose bitstream emits 0xFF bytes must stuff 0x00 and
    de-stuff on read (checked indirectly: many random-ish blocks round
    trip; at least one stuffed byte appears in the stream)."""
    blocks = []
    for i in range(32):
        zz = [0] * 64
        zz[0] = (i * 97) % 255 - 127
        zz[5] = (i * 31) % 63 - 31
        zz[23] = (i * 7) % 15 - 7
        blocks.append(zz)
    w = J._BitWriter()
    J.encode_scan(blocks, w)
    data = w.flush()
    dc = J._decode_table(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    ac = J._decode_table(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
    assert J.decode_scan(data, 32, dc, ac) == blocks


def test_unsupported_scope_errors():
    px = bytes(64)
    good = J.encode_jpeg_gray(8, 8, px)
    with pytest.raises(J.UnsupportedJpegError, match="SOI"):
        J.decode_jpeg_gray(b"\x89PNG" + good)
    # flip SOF0 -> SOF2 (progressive)
    sof = good.find(b"\xff\xc0")
    prog = good[:sof + 1] + b"\xc2" + good[sof + 2:]
    with pytest.raises(J.UnsupportedJpegError, match="SOF2"):
        J.decode_jpeg_gray(prog)
    # truncated scan
    with pytest.raises(J.UnsupportedJpegError, match="truncated"):
        J.decode_jpeg_gray(good[:-8] )
    with pytest.raises(ValueError, match="dimensions"):
        J.encode_jpeg_gray(8, 8, bytes(63))


def test_quant_table_is_honored():
    """A coarser quant table changes the stream but the decoder reads the
    table from DQT, so a flat image still reconstructs exactly (DC 8*(v-128)
    divisible check not required: round() recovers constants when the DC
    step divides the level-shifted range reasonably)."""
    px = bytes([200]) * 64
    q = tuple([8] * 64)
    out = J.decode_jpeg_gray(J.encode_jpeg_gray(8, 8, px, quant=q))
    assert out["pixels"] == px
