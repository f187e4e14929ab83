"""Minimal real WAV (RIFF PCM) codec — stdlib only.

Companion to ``png_codec``: the audio half of the multimodal surface gets
a genuine decoder too. WAV/RIFF with integer PCM needs nothing beyond
``struct``: walk RIFF chunks, read the fmt block, slice the data block
into frames. Scope: PCM (format tag 1), 8/16/32-bit integer samples, any
channel count, non-extensible headers — the output space of our own
encoder and of every plain .wav producer. Compressed/float/extensible
formats raise ``UnsupportedAudioError`` with a clear message.

The encoder exists so tests and catalog queries can build real WAV
payloads executor-side from a deterministic sample formula; the catalog
oracle predicts the decoded statistics independently from that formula,
so an encoder/decoder bug pair cannot slip through unnoticed.
"""

from __future__ import annotations

import struct


class UnsupportedAudioError(ValueError):
    pass


_PACK = {8: "B", 16: "h", 32: "i"}  # 8-bit WAV is unsigned by spec


def encode_wav(
    samples: list[int], sample_rate: int = 8000, n_channels: int = 1,
    bits: int = 16,
) -> bytes:
    """Interleaved integer samples → a real RIFF/WAVE file."""
    if bits not in _PACK:
        raise ValueError(f"bits must be one of {sorted(_PACK)}")
    if len(samples) % n_channels:
        raise ValueError("sample count not a multiple of channel count")
    body = struct.pack(f"<{len(samples)}{_PACK[bits]}", *samples)
    # RIFF chunks are word-aligned: an odd-length data chunk (8-bit audio,
    # odd sample count) carries a pad byte NOT counted in the length field
    pad = b"\x00" if len(body) & 1 else b""
    block_align = n_channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    riff_body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body + pad
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_wav(data: bytes) -> dict:
    """Real RIFF walk → {sample_rate, n_channels, bits, n_frames, samples}
    with ``samples`` the interleaved integer list."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise UnsupportedAudioError("not a RIFF/WAVE file (bad magic)")
    pos = 12
    fmt = None
    body = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt = chunk
        elif tag == b"data":
            body = chunk
    if fmt is None or body is None:
        raise UnsupportedAudioError("missing fmt or data chunk")
    try:
        audio_format, n_channels, sample_rate, _, _, bits = struct.unpack(
            "<HHIIHH", fmt[:16]
        )
    except struct.error as e:  # fmt chunk shorter than the PCM header
        raise UnsupportedAudioError(f"truncated fmt chunk: {e}") from e
    if audio_format != 1:
        raise UnsupportedAudioError(
            f"audio format {audio_format} (only integer PCM=1)"
        )
    if bits not in _PACK:
        raise UnsupportedAudioError(f"{bits}-bit samples (8/16/32 only)")
    n = len(body) // (bits // 8)
    samples = list(struct.unpack(f"<{n}{_PACK[bits]}", body[: n * bits // 8]))
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "bits": bits,
        "n_frames": n // n_channels if n_channels else 0,
        "samples": samples,
    }
