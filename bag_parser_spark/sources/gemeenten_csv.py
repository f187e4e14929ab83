"""gemeenten.csv source (SURVEY §2.1 S5, §2.4 A5).

Header-validated CSV scan (reference gemeente_parser.py:22-38) producing the
gemeenten and provincies dimension tables. Both are small dims — broadcast
everywhere downstream, never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bag_parser_spark.operators.dedup import dedup_exact
from bag_parser_spark.sources.bag_schemas import GEMEENTEN_CSV_HEADER


class InvalidGemeentenHeader(Exception):
    pass


def read_gemeenten_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV scan with the reference's header assertion (S5): columns 0/2/3/5
    must be Gemeentecode/Gemeentenaam/Provinciecode/Provincienaam
    (gemeente_parser.py:26-32)."""
    df = spark.read.csv(path, header=True, encoding="UTF-8")
    cols = df.columns
    expected = GEMEENTEN_CSV_HEADER
    for idx in (0, 2, 3, 5):
        if len(cols) <= idx or cols[idx] != expected[idx]:
            raise InvalidGemeentenHeader(
                f"Invalid gemeenten header: {cols} (expected {expected})"
            )
    return df


def gemeenten_table(csv_df: DataFrame) -> DataFrame:
    """gemeenten(id, naam, provincie_id) — reference gemeente_parser.py:34,
    database_sqlite.py:107-109."""
    cols = csv_df.columns
    return csv_df.select(
        F.col(cols[0]).cast("int").alias("id"),
        F.col(cols[2]).alias("naam"),
        F.col(cols[3]).cast("int").alias("provincie_id"),
    )


def provincies_table(csv_df: DataFrame) -> DataFrame:
    """provincies(id, naam) deduped while scanning (A5 — reference
    gemeente_parser.py:35-37 `if provincie not in provincies`), here as a
    deterministic first-per-key dedup."""
    cols = csv_df.columns
    raw = csv_df.select(
        F.col(cols[3]).cast("int").alias("id"),
        F.col(cols[5]).alias("naam"),
        F.monotonically_increasing_id().alias("__ord__"),
    )
    return dedup_exact(raw, on=["id"], id_col="__ord__").drop("__ord__")
