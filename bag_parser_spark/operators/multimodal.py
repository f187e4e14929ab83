"""Multimodal column plumbing (extension surface): image/audio/video as
opaque ``binary`` columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

IMAGE decode is REAL: ``functions/png_codec.py`` decodes genuine PNG bytes
with stdlib zlib (Pillow preferred when importable — any format, C speed).
``generate_png_payloads`` builds real PNG payloads executor-side from a
deterministic pixel formula so catalog oracles can predict the decoded
statistics independently. Audio/video frame decode remains a
clearly-marked deterministic fake (``frame_sample_stub``) — those codecs
genuinely aren't in this container; the Spark-side plumbing (schema,
1→N explode shape, Arrow batching) is real and tested.

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
            T.StructField("doc_id", T.LongType()),
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
                    {"doc_id": doc_id,
                     "payload": png_codec.encode_png(w, h, px, channels=3)}
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return df.select(id_col).mapInPandas(gen, schema=schema)


def extract_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL image decode + feature extraction via Arrow-batched mapInPandas:
    payload bytes → (width, height, mean pixel value, decoded byte count).
    Decode is functions/png_codec.decode_image — Pillow when importable,
    pure-stdlib PNG otherwise; a non-image payload raises a descriptive
    UnsupportedImageError from the worker."""
    from bag_parser_spark.functions import png_codec

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                img = png_codec.decode_image(bytes(payload))
                px = img["pixels"]
                rows.append(
                    {
                        "doc_id": i,
                        "width": img["width"],
                        "height": img["height"],
                        # ints sum exactly (< 2^53): one IEEE division at
                        # the end, reproducible by the oracle's SUM/COUNT
                        "mean_byte": sum(px) / len(px) if px else 0.0,
                        "n_bytes": len(px),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    return df.select(id_col, payload_col).mapInPandas(
        features, schema=IMAGE_FEATURES_SCHEMA
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
            T.StructField("doc_id", T.LongType()),
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
                        "doc_id": i,
                        "width": target_w,
                        "height": target_h,
                        "payload": out,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "payload"]
            )

    return df.select(id_col, payload_col).mapInPandas(resize, schema=schema)


def frame_sample_stub(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_nth: int = 10,
) -> DataFrame:
    """Video frame-sampling plumbing: 1 payload row → N frame rows (UDTF
    shape). The fake "frames" are byte slices; a real decoder yields encoded
    frames at the same schema. Output is re-partitionable downstream —
    frame explosion happens executor-side, never on the driver."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame_bytes", T.BinaryType()),
        ]
    )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                for fno, start in enumerate(range(0, len(data), every_nth)):
                    rows.append(
                        {
                            "doc_id": i,
                            "frame_no": fno,
                            "frame_bytes": data[start : start + every_nth],
                        }
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_no", "frame_bytes"])

    return df.select(id_col, payload_col).mapInPandas(frames, schema=schema)
