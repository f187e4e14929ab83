"""Real YUV4MPEG2 (.y4m) video codec — stdlib only.

Y4M is the standard uncompressed video interchange format (the input
format of x264/ffmpeg rawvideo pipelines): an ASCII stream header
`YUV4MPEG2 W<w> H<h> F<n>:<d> ...` followed by `FRAME\n`-delimited raw
planar YUV payloads. No compression, no external libraries — which makes
it the honest "real video decode" path for this container (PNG and WAV
already have real codecs here; inter-frame codecs like H.264 genuinely
need native libraries and stay out of scope).

Only C444 (one byte per pixel per plane, no chroma subsampling) is
emitted by the encoder; the decoder also accepts C420 family headers by
computing the correct per-frame plane sizes, since that is the format's
common default.
"""

from __future__ import annotations

MAGIC = b"YUV4MPEG2"


def encode_y4m(
    width: int, height: int, frames: list[bytes], fps: tuple[int, int] = (25, 1)
) -> bytes:
    """Encode raw C444 frames (each ``3*width*height`` plane bytes,
    Y then U then V) into a Y4M stream."""
    for i, f in enumerate(frames):
        if len(f) != 3 * width * height:
            raise ValueError(
                f"frame {i}: got {len(f)} bytes, want {3 * width * height}"
            )
    header = (
        f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 C444\n"
    ).encode("ascii")
    return header + b"".join(b"FRAME\n" + f for f in frames)


def decode_y4m(data: bytes) -> dict:
    """Parse a Y4M stream → dict(width, height, fps, colorspace,
    n_frames, frames=[plane bytes per frame]). Raises ValueError on a
    malformed header, unknown colorspace, or truncated frame payload."""
    if not data.startswith(MAGIC):
        raise ValueError("not a YUV4MPEG2 stream (bad magic)")
    nl = data.find(b"\n")
    if nl < 0:
        raise ValueError("unterminated Y4M stream header")
    width = height = None
    fps = (25, 1)
    colorspace = "C420jpeg"  # format default when no C tag is present
    for tok in data[len(MAGIC):nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            width = int(val)
        elif tag == b"H":
            height = int(val)
        elif tag == b"F":
            n, d = val.split(b":")
            fps = (int(n), int(d))
        elif tag == b"C":
            colorspace = "C" + val.decode("ascii")
    if not width or not height:
        raise ValueError("Y4M header missing W/H")
    if colorspace.startswith("C444"):
        plane_sizes = (width * height,) * 3
    elif colorspace.startswith("C420"):
        # floor division on odd dims would silently mis-frame the stream
        # (frame boundaries drift) — fail loudly instead (ADVICE r4)
        if width % 2 or height % 2:
            raise ValueError(
                f"C420 requires even W and H, got {width}x{height} — "
                "odd-dimension 4:2:0 chroma sizing is encoder-specific"
            )
        c = (width // 2) * (height // 2)
        plane_sizes = (width * height, c, c)
    elif colorspace.startswith("C422"):
        if width % 2:
            raise ValueError(
                f"C422 requires even W, got {width}x{height} — "
                "odd-width 4:2:2 chroma sizing is encoder-specific"
            )
        c = (width // 2) * height
        plane_sizes = (width * height, c, c)
    else:
        raise ValueError(f"unsupported Y4M colorspace {colorspace!r}")
    frame_size = sum(plane_sizes)
    frames: list[bytes] = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError(f"expected FRAME marker at byte {pos}")
        start = fnl + 1
        end = start + frame_size
        if end > len(data):
            raise ValueError(
                f"truncated frame {len(frames)}: need {frame_size} bytes"
            )
        frames.append(data[start:end])
        pos = end
    return {
        "width": width,
        "height": height,
        "fps": fps,
        "colorspace": colorspace,
        # authoritative per-plane byte counts (Y, U, V) — consumers must
        # use these to slice planes; C420/C422 chroma planes are smaller
        # than Y, so w*h arithmetic on the consumer side would be wrong.
        "plane_sizes": plane_sizes,
        "n_frames": len(frames),
        "frames": frames,
    }
