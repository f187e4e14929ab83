"""Storage-layout optimization: Z-order (Morton) clustering keys.

The reference's layout story is a single B-tree index per table (reference
database_sqlite.py:274-289); a columnar lake has no indexes — data
SKIPPING comes from file-level min/max statistics, and those are only
selective if rows with nearby key values land in the same files. Sorting
by (a, b) helps queries on ``a`` but leaves ``b`` scattered; interleaving
the bits of both keys (the Morton / Z-order curve — the same layout Delta
``OPTIMIZE ZORDER BY`` and column-store clustering keys use) gives BOTH
columns locality: any query box touches O(perimeter) files instead of
every file.

Everything here is exact integer bit arithmetic (shifts, masks) — no
floats, no hashing — so the z-value is reproducible on any engine and the
oracle checks it bit-for-bit. Values are first reduced to 16 bits per
dimension (the mask keeps every intermediate < 2^32, far from signed-64
overflow on either engine); 16 bits ≈ 65k distinct clustering buckets per
dimension, far more than the file count any table has — finer resolution
would only shuffle bits that never influence file assignment.

The write-side application is ``zorder_layout``: range-partition by the
z-value and sort within partitions, so each output file covers a compact
z-range → compact (a, b) rectangle → tight min/max stats on both columns.
Map-only computation + one range exchange: the same cost as any global
sort, amortized over every future scan that prunes on either column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# bit-spreading mask ladder: x with 16 significant bits -> bits at even
# positions of a 32-bit value (classic Morton magic numbers)
_SPREAD = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread16(c: Column) -> Column:
    x = c.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def spread16_sql(expr: str) -> str:
    """DuckDB twin of :func:`_spread16` — identical mask ladder."""
    s = f"({expr} & 65535)"
    for shift, mask in _SPREAD:
        s = f"(({s} | ({s} << {shift})) & {mask})"
    return s


def zorder_key(a: Column, b: Column) -> Column:
    """Interleave two 16-bit-reduced integer columns into one Morton key:
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1."""
    return _spread16(a).bitwiseOR(F.shiftleft(_spread16(b), 1))


def zorder_key_sql(a_expr: str, b_expr: str) -> str:
    return f"({spread16_sql(a_expr)} | ({spread16_sql(b_expr)} << 1))"


def zorder_layout(
    df: DataFrame, a: Column, b: Column, num_files: int
) -> DataFrame:
    """Cluster ``df`` for two-column data skipping: range-partition on the
    Morton key into ``num_files`` splits and sort within each — write the
    result and every file's (a, b) min/max stats cover a compact
    rectangle. Range boundaries come from Spark's reservoir sampling of
    the key (layout-dependent, which is why correctness queries check the
    KEY, not the partition assignment)."""
    keyed = df.withColumn("__z__", zorder_key(a, b))
    return (
        keyed.repartitionByRange(num_files, F.col("__z__"))
        .sortWithinPartitions("__z__")
    )
