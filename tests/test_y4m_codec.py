"""YUV4MPEG2 codec tests: roundtrip, header parsing, malformed-stream
errors, and subsampled-colorspace frame sizing."""

from __future__ import annotations

import pytest

from bag_parser_spark.functions.y4m_codec import decode_y4m, encode_y4m


def _frames(w, h, n):
    return [
        bytes((f * 31 + i) % 256 for i in range(3 * w * h)) for f in range(n)
    ]


def test_roundtrip_c444():
    frames = _frames(6, 4, 5)
    d = decode_y4m(encode_y4m(6, 4, frames, fps=(30, 1)))
    assert (d["width"], d["height"], d["n_frames"]) == (6, 4, 5)
    assert d["fps"] == (30, 1) and d["colorspace"] == "C444"
    assert d["frames"] == frames


def test_encode_rejects_wrong_frame_size():
    with pytest.raises(ValueError, match="frame 0"):
        encode_y4m(4, 4, [b"\x00" * 10])


def test_decode_rejects_bad_magic_and_truncation():
    with pytest.raises(ValueError, match="magic"):
        decode_y4m(b"RIFF....")
    good = encode_y4m(4, 3, _frames(4, 3, 2))
    with pytest.raises(ValueError, match="truncated frame 1"):
        decode_y4m(good[:-5])
    with pytest.raises(ValueError, match="FRAME marker"):
        decode_y4m(good[: good.index(b"FRAME")] + b"JUNK\n" + b"\x00" * 36)


def test_decode_c420_frame_sizing():
    # hand-build a C420 stream: 4x4 => Y 16 + U 4 + V 4 = 24 bytes/frame
    header = b"YUV4MPEG2 W4 H4 F25:1 C420jpeg\n"
    f0, f1 = bytes(range(24)), bytes(range(100, 124))
    d = decode_y4m(header + b"FRAME\n" + f0 + b"FRAME\n" + f1)
    assert d["n_frames"] == 2 and d["frames"] == [f0, f1]
    assert d["colorspace"] == "C420jpeg"


def test_decode_rejects_odd_dims_for_subsampled_colorspaces():
    """Floor-division sizing on odd dims would silently mis-frame the
    stream (ADVICE r4) — the decoder must refuse instead."""
    with pytest.raises(ValueError, match="C420 requires even"):
        decode_y4m(b"YUV4MPEG2 W3 H4 F25:1 C420jpeg\nFRAME\n" + bytes(18))
    with pytest.raises(ValueError, match="C420 requires even"):
        decode_y4m(b"YUV4MPEG2 W4 H3 F25:1 C420jpeg\nFRAME\n" + bytes(18))
    with pytest.raises(ValueError, match="C422 requires even"):
        decode_y4m(b"YUV4MPEG2 W3 H4 F25:1 C422\nFRAME\n" + bytes(20))
    # odd dims stay fine where there is no subsampling
    d = decode_y4m(b"YUV4MPEG2 W3 H3 F25:1 C444\nFRAME\n" + bytes(27))
    assert d["n_frames"] == 1 and len(d["frames"][0]) == 27


def test_default_colorspace_is_c420():
    header = b"YUV4MPEG2 W2 H2 F25:1\n"   # no C tag -> C420 default
    frame = bytes(range(2 * 2 + 2 * 1))   # 4 + 1 + 1 = 6 bytes
    d = decode_y4m(header + b"FRAME\n" + frame)
    assert d["n_frames"] == 1 and len(d["frames"][0]) == 6
