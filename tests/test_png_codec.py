"""functions/png_codec: real PNG encode/decode roundtrips (no Spark).

The decoder is the codec behind mm_image_features/mm_resize; these tests
pin it down independently of the catalog oracles: exact pixel roundtrips
across sizes that exercise all five scanline filters, channel counts
1/2/3/4, error paths for unsupported inputs, the nearest-neighbor
resampler against hand-computed expectations, and a Pillow cross-check
that skips gracefully where Pillow isn't installed.
"""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bag_parser_spark.functions import png_codec as P


def _gradient(w: int, h: int, ch: int, seed: int = 0) -> bytes:
    return bytes(
        (seed + 3 * x + 5 * y + 7 * c) % 256
        for y in range(h)
        for x in range(w)
        for c in range(ch)
    )


@pytest.mark.parametrize("w,h", [(1, 1), (1, 7), (16, 1), (5, 5), (13, 9)])
@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_roundtrip_exact(w, h, ch):
    px = _gradient(w, h, ch, seed=w * h + ch)
    data = P.encode_png(w, h, px, channels=ch)
    assert data[:8] == P.PNG_MAGIC
    out = P.decode_image(data)
    assert (out["width"], out["height"], out["channels"]) == (w, h, ch)
    assert out["pixels"] == px


def test_roundtrip_covers_every_filter_type():
    # 7 rows → filters 0,1,2,3,4,0,1 all present in one image
    px = _gradient(6, 7, 3, seed=42)
    out = P.decode_image(P.encode_png(6, 7, px, channels=3))
    assert out["pixels"] == px


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    seed=st.integers(0, 255),
)
def test_roundtrip_property(w, h, seed):
    px = _gradient(w, h, 3, seed)
    assert P.decode_image(P.encode_png(w, h, px))["pixels"] == px


def test_bad_magic_rejected():
    with pytest.raises(P.UnsupportedImageError, match="magic"):
        P.decode_image(b"GIF89a not a png")


def test_unsupported_bit_depth_rejected():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)  # 16-bit
    data = (
        P.PNG_MAGIC
        + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(P.UnsupportedImageError, match="bit depth"):
        P.decode_image(data)


def test_truncated_idat_rejected():
    data = P.encode_png(4, 4, _gradient(4, 4, 3))
    # corrupt the deflate stream length by chopping the file before IEND
    with pytest.raises((P.UnsupportedImageError, zlib.error)):
        P.decode_image(data[:40])


def test_resize_nearest_floor_map():
    # 4x2 RGB source, downsample to 2x1: dst(0,0)<-src(0,0), dst(1,0)<-src(2,0)
    px = _gradient(4, 2, 3, seed=9)
    out = P.resize_nearest(px, 4, 2, 3, 2, 1)
    assert len(out) == 2 * 1 * 3
    assert out[0:3] == px[0:3]
    assert out[3:6] == px[2 * 3 : 2 * 3 + 3]


def test_resize_nearest_upsample_replicates():
    px = bytes([10, 20, 30, 40, 50, 60])  # 2x1 RGB
    out = P.resize_nearest(px, 2, 1, 3, 4, 2)
    # floor map: dst x 0,1 -> src 0; dst x 2,3 -> src 1; both rows -> src y 0
    row = bytes([10, 20, 30, 10, 20, 30, 40, 50, 60, 40, 50, 60])
    assert out == row + row


@pytest.mark.skipif(not P.has_pillow(), reason="Pillow not installed")
def test_pillow_crosscheck():
    """Where Pillow exists, our encoder's output must decode identically
    through both backends."""
    import io

    import PIL.Image

    px = _gradient(13, 9, 3, seed=7)
    data = P.encode_png(13, 9, px)
    img = PIL.Image.open(io.BytesIO(data))
    assert (img.width, img.height) == (13, 9)
    assert img.tobytes() == px
    assert P.decode_image(data)["pixels"] == px


# ---------------------------------------------------------------------------
# wav_codec — the audio twin
# ---------------------------------------------------------------------------

from bag_parser_spark.functions import wav_codec as W  # noqa: E402


@pytest.mark.parametrize("rate,ch,bits", [
    (8000, 1, 16), (44100, 2, 16), (16000, 1, 8), (48000, 2, 32),
])
def test_wav_roundtrip(rate, ch, bits):
    lo = 0 if bits == 8 else -(2 ** (bits - 1))
    hi = 2 ** bits - 1 if bits == 8 else 2 ** (bits - 1) - 1
    n = 120 * ch
    samples = [max(lo, min(hi, (i * 37 - 64) % (hi - lo + 1) + lo))
               for i in range(n)]
    out = W.decode_wav(W.encode_wav(samples, rate, ch, bits))
    assert out["sample_rate"] == rate
    assert out["n_channels"] == ch
    assert out["bits"] == bits
    assert out["n_frames"] == 120
    assert out["samples"] == samples


def test_wav_bad_magic_rejected():
    with pytest.raises(W.UnsupportedAudioError, match="magic"):
        W.decode_wav(b"OggS this is not wav")


def test_wav_non_pcm_rejected():
    data = bytearray(W.encode_wav([0, 1, 2, 3], 8000))
    # format tag lives at offset 20 (RIFF 12 + 'fmt ' header 8)
    data[20:22] = struct.pack("<H", 3)  # IEEE float
    with pytest.raises(W.UnsupportedAudioError, match="PCM"):
        W.decode_wav(bytes(data))


def test_wav_odd_chunk_padding():
    """RIFF chunks are word-aligned; a 3-byte extra chunk before data must
    not derail the walk."""
    wav = W.encode_wav([5, -5, 10, -10], 8000)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc\x00"  # padded odd chunk
    patched = wav[:12] + extra + wav[12:]
    patched = patched[:4] + struct.pack(
        "<I", len(patched) - 8
    ) + patched[8:]
    out = W.decode_wav(patched)
    assert out["samples"] == [5, -5, 10, -10]


def test_wav_8bit_odd_length_padded_roundtrip():
    """Odd-length 8-bit data chunk gets a RIFF pad byte (word alignment)
    and still roundtrips exactly."""
    samples = [0, 128, 255]
    data = W.encode_wav(samples, 8000, 1, 8)
    assert len(data) % 2 == 0  # padded file
    out = W.decode_wav(data)
    assert out["samples"] == samples and out["n_frames"] == 3


def test_wav_truncated_fmt_rejected():
    wav = bytearray(W.encode_wav([1, 2], 8000))
    # shrink the fmt chunk length to 8: decode must reject, not crash
    wav[16:20] = struct.pack("<I", 8)
    del wav[28 : 28 + 8]  # drop the tail of fmt so the walk stays aligned
    import pytest as _pytest

    with _pytest.raises(W.UnsupportedAudioError, match="fmt"):
        W.decode_wav(bytes(wav))
