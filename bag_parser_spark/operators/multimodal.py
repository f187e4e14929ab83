"""Multimodal column plumbing (extension surface): image/audio/video as
opaque ``binary`` columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is stubbed:
``decode_image_stub`` raises ``NotImplementedError`` unless
``deterministic_fake=True``, in which case it derives reproducible fake
"pixel statistics" from the raw bytes. Everything Spark-side — schema,
partition sizing, UDF signatures, Arrow batch shape — is real and tested;
swapping in a real codec is a one-function change.

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


def decode_image_stub(data: bytes, deterministic_fake: bool) -> dict:
    """STUB: the real implementation would decode with PIL/libvips (not in
    this container). The deterministic fake derives stable pseudo-dimensions
    and byte statistics from the payload so the distributed plumbing is
    testable end-to-end."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image decoding requires a codec library not present in this "
            "environment; pass deterministic_fake=True for plumbing tests"
        )
    n = len(data)
    checksum = sum(data[:64]) if n else 0
    return {
        "width": 16 + checksum % 64,
        "height": 16 + (checksum // 64) % 64,
        "mean_byte": (sum(data) / n) if n else 0.0,
        "n_bytes": n,
    }


def extract_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    deterministic_fake: bool = True,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — Arrow batches
    in, Arrow batches out; one Python worker per task, no per-row overhead."""

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                feats = decode_image_stub(bytes(payload), deterministic_fake)
                rows.append(
                    {
                        "doc_id": i,
                        "width": feats["width"],
                        "height": feats["height"],
                        "mean_byte": feats["mean_byte"],
                        "n_bytes": feats["n_bytes"],
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    return df.select(id_col, payload_col).mapInPandas(
        features, schema=IMAGE_FEATURES_SCHEMA
    )


def resize_images_stub(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    target_w: int = 32,
    target_h: int = 32,
) -> DataFrame:
    """Image-resize plumbing: payload in → resized payload + new dims out
    (1:1 map, payload-transforming — unlike feature extraction it RETURNS
    binary, so output batches are as heavy as input batches; size Arrow
    batches via spark.sql.execution.arrow.maxRecordsPerBatch accordingly).
    The fake "resize" deterministically re-samples the byte stream to
    target_w*target_h bytes; a real implementation swaps in a codec at the
    marked line and keeps the identical schema/batch shape."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    n_out = target_w * target_h

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                # REAL CODEC GOES HERE: PIL.Image.open(...).resize(...)
                if data:
                    step = max(len(data) // n_out, 1)
                    out = data[::step][:n_out].ljust(n_out, b"\x00")
                else:
                    out = b"\x00" * n_out
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
