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

from pyspark.sql import Column, DataFrame, Window
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


def file_skipping_stats(
    df: DataFrame,
    a: Column,
    b: Column,
    natural_order: Column,
    a_lo: int,
    a_hi: int,
    b_lo: int,
    b_hi: int,
    num_files: int = 64,
    cache_registry: list | None = None,
) -> DataFrame:
    """Quantify what Z-ordering buys: simulate writing the table into
    ``num_files`` files under two layouts — ``natural`` (ordered by
    ``natural_order``, i.e. arrival order) and ``zorder`` (ordered by the
    Morton key of (a, b)) — build each file's zone map (min/max of both
    predicate columns), and report how many files a box predicate
    ``a in [a_lo, a_hi] and b in [b_lo, b_hi]`` must actually read.
    This is the audit a lakehouse table-maintenance job runs to decide
    whether re-clustering pays for itself: same rows, same predicate,
    and the zorder row shows a fraction of the natural row's
    ``files_read``/``rows_read``.

    File assignment is the deterministic stand-in for
    ``repartitionByRange``'s sampled boundaries, computed differently per
    layout to stay scale-safe: the natural key (a dense sequential row
    id) is VALUE-banded — ``(key * num_files) div (max_key + 1)`` needs
    only a broadcast max — while the z key (sparse: most of the 2^32
    curve positions are unpopulated, so value bands would leave most
    files empty and the rest giant) is EQUI-DEPTH banded through its
    distinct-value histogram: group by z, running row count over the
    sorted distinct values, ``(cum * num_files) div total``. That window
    is ordered over DISTINCT z values only — bounded by the key space
    (16-bit x 5-bit here, ~2M worst case), never by table size, so no
    per-row global sort hides in the audit. Everything is int64
    arithmetic (``div`` is true integer division in Spark and DuckDB
    alike — double division plus floor could round across a file
    boundary), so file ids, zone maps, and counts are bit-reproducible
    on any engine.

    Returns one row per layout: (layout, n_files, files_read, rows_read,
    rows_matching) — rows_matching is layout-invariant by construction
    and pins the predicate itself.

    The keyed projection is PERSISTED: four consumers read it (the
    max/count aggregate, both layouts' row streams, and the z
    histogram), so without the cache the audit would scan the source
    table four times and compute the Morton key three times.
    ``cache_registry``: the persist handle is appended when given so a
    scoped caller can unpersist after its action (dedup.py convention).
    """
    keyed = (
        df.select(
            a.alias("__a__"),
            b.alias("__b__"),
            natural_order.cast("long").alias("__nat__"),
        )
        .withColumn(
            "__z__", zorder_key(F.col("__a__"), F.col("__b__")).cast("long")
        )
        .persist()
    )
    if cache_registry is not None:
        cache_registry.append(keyed)
    tot = keyed.agg(
        F.max("__nat__").alias("__nmax__"),
        F.count(F.lit(1)).alias("__total__"),
    )
    nat_rows = keyed.crossJoin(F.broadcast(tot)).select(
        F.lit("natural").alias("layout"),
        F.expr(f"(__nat__ * {num_files}) div (__nmax__ + 1)").alias(
            "file_id"
        ),
        "__a__",
        "__b__",
    )
    zhist = keyed.groupBy("__z__").agg(F.count(F.lit(1)).alias("__cnt__"))
    wz = Window.orderBy("__z__").rowsBetween(
        Window.unboundedPreceding, -1
    )
    zmap = (
        zhist.select(
            "__z__",
            F.coalesce(F.sum("__cnt__").over(wz), F.lit(0)).alias("__cum__"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "__z__",
            F.expr(f"(__cum__ * {num_files}) div __total__").alias(
                "file_id"
            ),
        )
    )
    z_rows = keyed.join(zmap, "__z__").select(
        F.lit("zorder").alias("layout"), "file_id", "__a__", "__b__"
    )
    filed = nat_rows.unionAll(z_rows)
    match = (
        F.col("__a__").between(a_lo, a_hi)
        & F.col("__b__").between(b_lo, b_hi)
    ).cast("long")
    zone = filed.groupBy("layout", "file_id").agg(
        F.min("__a__").alias("__amin__"),
        F.max("__a__").alias("__amax__"),
        F.min("__b__").alias("__bmin__"),
        F.max("__b__").alias("__bmax__"),
        F.count(F.lit(1)).alias("__rows__"),
        F.sum(match).alias("__match__"),
    )
    read = (
        (F.col("__amax__") >= a_lo)
        & (F.col("__amin__") <= a_hi)
        & (F.col("__bmax__") >= b_lo)
        & (F.col("__bmin__") <= b_hi)
    )
    return zone.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(read.cast("long")).alias("files_read"),
        F.sum(F.when(read, F.col("__rows__")).otherwise(F.lit(0))).alias(
            "rows_read"
        ),
        F.sum("__match__").alias("rows_matching"),
    )
