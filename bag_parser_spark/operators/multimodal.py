"""Multimodal column plumbing (extension surface): image/audio/video as
opaque ``binary`` columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

IMAGE decode is REAL: ``functions/png_codec.py`` decodes genuine PNG bytes
with stdlib zlib (Pillow preferred when importable — any format, C speed).
``generate_png_payloads`` builds real PNG payloads executor-side from a
deterministic pixel formula so catalog oracles can predict the decoded
statistics independently. AUDIO decode is REAL too:
``functions/wav_codec.py`` walks genuine RIFF/PCM bytes with stdlib
struct (``generate_wav_payloads`` / ``extract_audio_features``). VIDEO
decode is REAL as well: ``functions/y4m_codec.py`` parses genuine
YUV4MPEG2 streams — the standard uncompressed video interchange format —
with stdlib byte walking (``generate_y4m_payloads`` / ``sample_frames``);
inter-frame codecs (H.264 etc.) genuinely need native libraries absent
from this container and stay out of scope.

Scale notes: binary payloads ride in parquet with metadata columns, so
filters on metadata (mime, byte_len, checksum) prune row groups *without
touching payload bytes* (column pruning). ``mapInPandas`` streams Arrow
batches — bound batch memory with spark.sql.execution.arrow.maxRecordsPerBatch
when payloads are large.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bag_parser_spark.operators.fanout import fan_out_cpu_dense

# Typed metadata schema attached to every multimodal payload column.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("checksum_md5", T.StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo plumbing: treat the utf-8 bytes of ``text_col`` as an opaque
    media payload and attach typed metadata. With real media, the payload
    arrives from `binaryFile` scans or parquet binary columns — same shape."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).cast("long").alias("byte_len"),
            F.md5(payload).alias("checksum_md5"),
        ),
    )


def _with_id(schema: "T.StructType", id_col: str) -> "T.StructType":
    """Output schema with the caller's id column name in first position —
    the id_col parameter must be honored end-to-end, not silently renamed
    to doc_id (downstream joins on the caller's key would fail)."""
    fields = [T.StructField(id_col, schema.fields[0].dataType)]
    fields += schema.fields[1:]
    return T.StructType(fields)


def synthetic_image_dims(doc_id: int) -> tuple[int, int]:
    """Deterministic per-doc dimensions for generated fixture images —
    mirrored by the catalog oracles (4..16 × 3..9, every size hit)."""
    return 4 + doc_id % 13, 3 + doc_id % 7


def synthetic_pixel(doc_id: int, x: int, y: int, c: int) -> int:
    """Deterministic RGB pixel formula; non-constant along x, y and channel
    so every PNG filter type produces non-trivial deltas."""
    return (doc_id + 3 * x + 5 * y + 7 * c) % 256


def generate_png_payloads(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Attach a REAL PNG payload per row, built executor-side from the
    deterministic pixel formula (RGB, dimensions from synthetic_image_dims,
    all five scanline filters exercised by the encoder). This stands in for
    the `binaryFile` scan a real corpus would use — downstream operators
    decode genuine PNG bytes either way."""
    from bag_parser_spark.functions import png_codec

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                doc_id = int(i)
                w, h = synthetic_image_dims(doc_id)
                px = bytes(
                    synthetic_pixel(doc_id, x, y, c)
                    for y in range(h)
                    for x in range(w)
                    for c in range(3)
                )
                rows.append(
                    {id_col: doc_id,
                     "payload": png_codec.encode_png(w, h, px, channels=3)}
                )
            yield pd.DataFrame(rows, columns=[id_col, "payload"])

    return fan_out_cpu_dense(df.select(id_col), id_col).mapInPandas(
        gen, schema=schema
    )


def synthetic_jpeg_dims(doc_id: int) -> tuple[int, int]:
    """Per-doc JPEG fixture dims in 8x8 BLOCKS (1..3 × 1..2) — multiples
    of the MCU so the block-constant oracle contract holds; the
    non-multiple crop path is covered by codec unit tests instead."""
    return 1 + doc_id % 3, 1 + doc_id % 2


def synthetic_block_value(doc_id: int, bx: int, by: int) -> int:
    """Deterministic per-8x8-block gray value. Constant blocks have only
    a DC coefficient, which quant=1 baseline JPEG preserves EXACTLY —
    the property that lets a SQL oracle predict decoded pixels through a
    lossy codec (see functions/jpeg_codec module docstring)."""
    return (doc_id * 7 + 11 * bx + 13 * by) % 256


def generate_jpeg_payloads(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Attach a REAL baseline-JPEG payload per row (grayscale,
    block-constant pixels from synthetic_block_value, all-ones quant
    table), built executor-side by functions/jpeg_codec — genuine
    Huffman/DCT entropy-coded bytes whose decoded statistics the catalog
    oracle predicts from the block formula."""
    from bag_parser_spark.functions import jpeg_codec

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                doc_id = int(i)
                wb, hb = synthetic_jpeg_dims(doc_id)
                w, h = wb * 8, hb * 8
                px = bytes(
                    synthetic_block_value(doc_id, x // 8, y // 8)
                    for y in range(h)
                    for x in range(w)
                )
                rows.append(
                    {id_col: doc_id,
                     "payload": jpeg_codec.encode_jpeg_gray(w, h, px)}
                )
            yield pd.DataFrame(rows, columns=[id_col, "payload"])

    return fan_out_cpu_dense(df.select(id_col), id_col).mapInPandas(
        gen, schema=schema
    )


def decode_any_image(payload: bytes) -> dict:
    """Magic-byte codec dispatch: PNG → functions/png_codec (Pillow when
    importable), baseline JPEG → functions/jpeg_codec. Returns the shared
    ``{"width","height","channels","pixels"}`` dict; anything else raises
    a descriptive error from whichever codec matched (or PNG's)."""
    from bag_parser_spark.functions import jpeg_codec, png_codec

    if payload[:2] == jpeg_codec.JPEG_MAGIC:
        return jpeg_codec.decode_jpeg_gray(payload)
    return png_codec.decode_image(payload)


def extract_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL image decode + feature extraction via Arrow-batched mapInPandas:
    payload bytes → (width, height, mean pixel value, decoded byte count).
    Decode dispatches on magic bytes (``decode_any_image``): PNG via
    functions/png_codec (Pillow when importable, pure-stdlib otherwise),
    baseline JPEG via functions/jpeg_codec; a non-image payload raises a
    descriptive UnsupportedImageError from the worker."""
    schema = _with_id(IMAGE_FEATURES_SCHEMA, id_col)

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                img = decode_any_image(bytes(payload))
                px = img["pixels"]
                rows.append(
                    {
                        id_col: i,
                        "width": img["width"],
                        "height": img["height"],
                        # ints sum exactly (< 2^53): one IEEE division at
                        # the end, reproducible by the oracle's SUM/COUNT
                        "mean_byte": sum(px) / len(px) if px else 0.0,
                        "n_bytes": len(px),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            )

    return df.select(id_col, payload_col).mapInPandas(
        features, schema=schema
    )


def resize_images(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    target_w: int = 8,
    target_h: int = 8,
    reencode: bool = False,
) -> DataFrame:
    """REAL image resize: decode payload → nearest-neighbor resample →
    raw pixel buffer out (or a re-encoded PNG with ``reencode=True``).
    1:1 payload-transforming map — output batches are as heavy as input
    batches; size Arrow batches via
    spark.sql.execution.arrow.maxRecordsPerBatch for large payloads.
    Raw-buffer default keeps the output a pure function of the pixels so
    the oracle can compare byte-for-byte (a PNG re-encode depends on zlib
    settings, which no SQL twin can reproduce)."""
    from bag_parser_spark.functions import png_codec

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                img = png_codec.decode_image(bytes(payload))
                out = png_codec.resize_nearest(
                    img["pixels"], img["width"], img["height"],
                    img["channels"], target_w, target_h,
                )
                if reencode:
                    out = png_codec.encode_png(
                        target_w, target_h, out, img["channels"]
                    )
                rows.append(
                    {
                        id_col: i,
                        "width": target_w,
                        "height": target_h,
                        "payload": out,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "width", "height", "payload"]
            )

    return df.select(id_col, payload_col).mapInPandas(resize, schema=schema)


def synthetic_video_spec(doc_id: int) -> tuple[int, int, int]:
    """Deterministic per-doc (width, height, n_frames) for fixture videos —
    mirrored by the catalog oracle (4..8 × 3..6 × 2..6 frames)."""
    return 4 + doc_id % 5, 3 + doc_id % 4, 2 + doc_id % 5


def synthetic_plane_byte(doc_id: int, frame: int, plane: int, i: int) -> int:
    """Deterministic YUV plane byte (plane 0/1/2 = Y/U/V, i = pixel
    index); non-constant along every axis so plane sums discriminate."""
    return (doc_id * 7 + frame * 13 + plane * 29 + i * 3) % 256


def generate_y4m_payloads(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Attach a REAL YUV4MPEG2 video payload per row, built executor-side
    from the deterministic plane formula (C444, dimensions/frame count
    from synthetic_video_spec). Downstream operators parse genuine Y4M
    bytes — the same code path a `binaryFile` scan of real captures
    would hit."""
    from bag_parser_spark.functions import y4m_codec

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                doc_id = int(i)
                w, h, nf = synthetic_video_spec(doc_id)
                frames = [
                    bytes(
                        synthetic_plane_byte(doc_id, f, p, i)
                        for p in range(3)
                        for i in range(w * h)
                    )
                    for f in range(nf)
                ]
                rows.append(
                    {id_col: doc_id,
                     "payload": y4m_codec.encode_y4m(w, h, frames)}
                )
            yield pd.DataFrame(rows, columns=[id_col, "payload"])

    return fan_out_cpu_dense(df.select(id_col), id_col).mapInPandas(
        gen, schema=schema
    )


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("y_sum", T.LongType()),
        T.StructField("u_sum", T.LongType()),
        T.StructField("v_sum", T.LongType()),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_nth: int = 2,
) -> DataFrame:
    """REAL video frame sampling: parse the Y4M stream, keep every
    ``every_nth`` frame, emit one row per sampled frame with per-plane
    integer byte sums (exact — < 2^53 — so the oracle can predict them
    from the generator formula). 1 payload row → N frame rows, exploded
    executor-side inside the Arrow batch (UDTF shape; never on the
    driver), re-partitionable downstream."""
    from bag_parser_spark.functions import y4m_codec

    schema = _with_id(FRAME_SAMPLE_SCHEMA, id_col)

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                v = y4m_codec.decode_y4m(bytes(payload))
                w, h = v["width"], v["height"]
                # plane offsets come from the decoder — C420/C422 chroma
                # planes are smaller than Y, so w*h slicing would mix
                # planes (and read past the frame) on subsampled input.
                ys, us, vs = v["plane_sizes"]
                for fno in range(0, v["n_frames"], every_nth):
                    fb = v["frames"][fno]
                    rows.append(
                        {
                            id_col: i,
                            "frame_no": fno,
                            "width": w,
                            "height": h,
                            "n_frames": v["n_frames"],
                            "y_sum": sum(fb[0:ys]),
                            "u_sum": sum(fb[ys : ys + us]),
                            "v_sum": sum(fb[ys + us : ys + us + vs]),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            )

    return df.select(id_col, payload_col).mapInPandas(frames, schema=schema)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("mean_abs", T.DoubleType()),
        T.StructField("peak_abs", T.IntegerType()),
    ]
)


def synthetic_audio_spec(doc_id: int) -> tuple[int, int]:
    """(n_samples, sample_rate) for generated fixture audio — mirrored by
    the catalog oracle."""
    return 50 + doc_id % 200, 8000 + (doc_id % 4) * 4000


def synthetic_sample(doc_id: int, i: int) -> int:
    """Deterministic 16-bit PCM sample formula (a full-range integer
    sawtooth — aperiodic in i for every doc, SQL-reproducible)."""
    return (doc_id * 31 + i * 17) % 4096 - 2048


def generate_wav_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL WAV payload per row (mono 16-bit PCM from the
    deterministic sample formula) — the audio twin of
    generate_png_payloads."""
    from bag_parser_spark.functions import wav_codec

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                doc_id = int(i)
                n, rate = synthetic_audio_spec(doc_id)
                samples = [synthetic_sample(doc_id, k) for k in range(n)]
                rows.append(
                    {id_col: doc_id,
                     "payload": wav_codec.encode_wav(samples, rate)}
                )
            yield pd.DataFrame(rows, columns=[id_col, "payload"])

    return fan_out_cpu_dense(df.select(id_col), id_col).mapInPandas(
        gen, schema=schema
    )


def extract_audio_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL audio decode via Arrow-batched mapInPandas: RIFF/PCM payloads →
    (sample_rate, channels, frames, mean |amplitude|, peak |amplitude|).
    Integer sums are exact, so mean_abs is one IEEE division the oracle
    reproduces with SUM/COUNT."""
    from bag_parser_spark.functions import wav_codec

    schema = _with_id(AUDIO_FEATURES_SCHEMA, id_col)

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                a = wav_codec.decode_wav(bytes(payload))
                # 8-bit WAV is UNSIGNED by spec (silence = 128): recenter
                # before amplitude stats or DC offset reads as signal
                off = 128 if a["bits"] == 8 else 0
                s = [v - off for v in a["samples"]]
                rows.append(
                    {
                        id_col: i,
                        "sample_rate": a["sample_rate"],
                        "n_channels": a["n_channels"],
                        "n_frames": a["n_frames"],
                        "mean_abs": (
                            sum(abs(v) for v in s) / len(s) if s else 0.0
                        ),
                        "peak_abs": max((abs(v) for v in s), default=0),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            )

    return df.select(id_col, payload_col).mapInPandas(
        features, schema=schema
    )


def image_ahash(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Perceptual average-hash over REAL decoded images: decode → 8×8
    nearest-neighbor thumbnail → per-pixel luma (integer r+g+b) → one bit
    per pixel, set iff 64·luma > Σluma (the integer cross-multiplied form
    of luma > mean — no division, no float anywhere) → 64-bit hex hash
    plus popcount. Near-identical images differ in a few bits, so aHash
    feeds the SAME banded/bucketed near-dup joins the text family uses —
    the multimodal dedup path. Map-only (1 row in → 1 row out); hash
    pairs join downstream on the hash key, never on pixels."""
    from bag_parser_spark.functions import png_codec

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("ahash", T.StringType()),
            T.StructField("n_ones", T.IntegerType()),
        ]
    )

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                img = png_codec.decode_image(bytes(payload))
                ch = img["channels"]
                thumb = png_codec.resize_nearest(
                    img["pixels"], img["width"], img["height"], ch, 8, 8,
                )
                # luma = sum of the color channels, indexed by the image's
                # REAL channel count: grayscale has 1 byte/pixel (a 3-wide
                # stride would read past the 64-byte thumbnail) and RGBA's
                # 4th byte is alpha, not color — exclude it.
                n_color = min(ch, 3)
                luma = [
                    sum(thumb[p * ch + c] for c in range(n_color))
                    for p in range(64)
                ]
                total = sum(luma)
                bits = [1 if 64 * v > total else 0 for v in luma]
                n = 0
                for b in bits:
                    n = (n << 1) | b
                rows.append(
                    {id_col: i, "ahash": format(n, "016x"),
                     "n_ones": sum(bits)}
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select(id_col, payload_col).mapInPandas(hashes, schema=schema)


def generate_png_payloads_perturbed(
    df: DataFrame, id_col: str = "doc_id", offset: int = 1_000_000
) -> DataFrame:
    """Original PNG per row PLUS a near-duplicate copy (id + offset) whose
    FIRST pixel's red channel is +1 — the image analogue of the text
    family's perturbed corpus. One pixel nudges at most a couple of aHash
    bits near the luma mean, so near-dup search is exercised with real
    non-identical payloads."""
    from bag_parser_spark.functions import png_codec

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                doc_id = int(i)
                w, h = synthetic_image_dims(doc_id)
                px = bytearray(
                    synthetic_pixel(doc_id, x, y, c)
                    for y in range(h)
                    for x in range(w)
                    for c in range(3)
                )
                rows.append(
                    {id_col: doc_id,
                     "payload": png_codec.encode_png(w, h, bytes(px), 3)}
                )
                px[0] = (px[0] + 1) % 256
                rows.append(
                    {id_col: doc_id + offset,
                     "payload": png_codec.encode_png(w, h, bytes(px), 3)}
                )
            yield pd.DataFrame(rows, columns=[id_col, "payload"])

    return fan_out_cpu_dense(df.select(id_col), id_col).mapInPandas(
        gen, schema=schema
    )
