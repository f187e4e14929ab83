"""Aggregation operators (SURVEY §2.4 A1-A6, §2.6 O1-O3).

Determinism note: SQLite allows a bare non-grouped column in GROUP BY and
returns "some value" (reference exporter.py:102,119,136 selects w.naam that
way). Spark's F.first() in a shuffled agg is equally nondeterministic; the
oracle-checkable engine surface exposes *deterministic* any-value (min) and
documents the difference — at 1000 executors nondeterminism is a retry bug,
not a quirk.

Money/double aggregates go through DECIMAL sums cast back to double: decimal
addition is exact and associative, so results are bit-identical regardless
of partitioning — the only way a distributed sum can hash-match a
single-threaded oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_sum(c: Column, scale: int = 2) -> Column:
    """Order-independent double sum: cast to DECIMAL(28, scale), sum exactly,
    cast back. Distributed partial aggregation stays correct to the bit."""
    return F.sum(c.cast(f"decimal(28,{scale})")).cast("double")


def exact_avg(c: Column, scale: int = 2) -> Column:
    """Order-independent mean: exact decimal sum / count, double division."""
    return (
        F.sum(c.cast(f"decimal(28,{scale})")).cast("double") / F.count(c)
    )


def exact_sum_sql(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,{scale}))) AS DOUBLE)"


def exact_avg_sql(expr: str, scale: int = 2) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(28,{scale}))) AS DOUBLE)"
        f" / COUNT({expr})"
    )


def grouped_stats(
    df: DataFrame,
    group_key: Column,
    key_name: str,
    avg_cols: dict[str, Column],
    any_value_cols: dict[str, Column] | None = None,
    count_name: str = "aantal",
) -> DataFrame:
    """A1: the postcode4/5/6 grouped-stats shape (reference
    exporter.py:93-142): GROUP BY derived key, AVG(lat), AVG(lon), COUNT(1),
    plus an "any value" dim column — here deterministic F.min.

    One shuffle on the derived key with map-side partial aggregation; the
    derived-key projection happens before the exchange so the shuffle
    carries only (key, partial-sums).
    """
    aggs = [exact_avg(c, scale=6).alias(name) for name, c in avg_cols.items()]
    for name, c in (any_value_cols or {}).items():
        aggs.append(F.min(c).alias(name))
    aggs.append(F.count(F.lit(1)).alias(count_name))
    return df.groupBy(group_key.alias(key_name)).agg(*aggs)


def observed(df: DataFrame, name: str, metrics: dict[str, Column]):
    """A6: running counters (reference bag_parser.py:461-467 xml_tags_
    completed / tags-per-second, statusbar/status.py:25-42) as
    ``df.observe()`` — the Spark-native replacement for the reference's
    progress counters. Metrics accumulate on executors *during* the job
    (zero extra pass, no second scan) and are read driver-side after the
    action. Returns (observed_df, Observation); call ``obs.get`` after an
    action completes.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    out = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    return out, obs


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """O1/O2: ORDER BY … LIMIT k (reference database_sqlite.py:640-646).
    Spark plans TakeOrderedAndProject — per-partition heaps, no full sort."""
    return df.orderBy(*order_by).limit(k)


def exact_moments(
    df: DataFrame, group_cols: Sequence[str], col: str
) -> DataFrame:
    """Grouped mean / sample variance / stddev over an INTEGER column with
    cross-engine bit-exactness.

    Native ``stddev``/``var_samp`` accumulate running doubles whose
    partial-merge order is partition-layout-dependent — a distributed run
    cannot hash-match a single-threaded oracle. Instead aggregate the exact
    integer sufficient statistics (n, Σx, Σx²) — associative, overflow-safe
    in BIGINT for values up to ~3M at a trillion rows — and derive the
    moments in one final double expression:

        var = (Σx² − Σx·Σx/n) / (n − 1)

    Both engines evaluate the SAME IEEE operations on the SAME integers, so
    the doubles are identical to the bit. This is also the 100 TB shape:
    the shuffle carries three longs per group (map-side partial agg), and
    the double math runs once per group, not per row. Mirrors the decimal
    trick of :func:`exact_sum`, extended to second moments.
    """
    c = F.col(col)
    grouped = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(c).alias("s1"),
        F.sum(c * c).alias("s2"),
    )
    dn = F.col("n").cast("double")
    d1 = F.col("s1").cast("double")
    d2 = F.col("s2").cast("double")
    var = (d2 - d1 * d1 / dn) / (dn - F.lit(1.0))
    var = F.when(F.col("n") > 1, var)  # null for singleton groups
    return grouped.select(
        *group_cols,
        "n",
        (d1 / dn).alias("mean"),
        var.alias("var_samp"),
        F.sqrt(var).alias("stddev_samp"),
    )


def exact_moments_sql(group_cols: Sequence[str], col: str, table: str) -> str:
    """DuckDB twin of :func:`exact_moments` — the IDENTICAL expression tree
    over the identical integer sums (DuckDB SUM(BIGINT) yields HUGEINT, so
    sums are cast back to BIGINT before the double math)."""
    keys = ", ".join(group_cols)
    return f"""
    WITH s AS (
      SELECT {keys}, COUNT(*) AS n,
             CAST(SUM({col}) AS BIGINT) AS s1,
             CAST(SUM({col} * {col}) AS BIGINT) AS s2
      FROM {table} GROUP BY {keys}
    )
    SELECT {keys}, n,
           CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
           CASE WHEN n > 1 THEN
             (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
              / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)
           END AS var_samp,
           CASE WHEN n > 1 THEN
             SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
              / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))
           END AS stddev_samp
    FROM s
    """


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    lo: int,
    hi: int,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram for a classifier score: clamp integer scores to
    [lo, hi], cut into ``n_bins`` equal-width bins, and per bin report the
    normalized mean score (``avg_conf`` — the confidence proxy), the
    empirical positive rate, their absolute ``gap``, and the
    population-weighted gap whose sum over bins is the Expected
    Calibration Error. Completes the eval family next to the threshold-
    free AUC and the fixed-threshold confusion matrix.

    Engine-exactness discipline (the oracle-parity rule the AUC/confusion
    queries follow): every aggregate is an INTEGER sum — ``avg_conf`` is
    computed from Σscore as ``(s − n·lo) / (n·(hi − lo))``, never by
    averaging doubles (float summation is order-dependent; integer sums
    are not) — so the only float ops are single correctly-rounded IEEE
    divisions, identical in any engine.

    Scale shape: one groupBy over ≤ ``n_bins`` cells (map-side combine
    collapses the corpus to n_bins partials per task), plus a 1-row
    broadcast of the total for the weights — the whole diagram costs one
    tiny shuffle at any corpus size.
    """
    span = hi - lo
    cs = F.least(F.greatest(F.col(score_col), F.lit(lo)), F.lit(hi))
    b = F.least(
        F.floor(
            (cs - F.lit(lo)).cast("double") * n_bins / F.lit(float(span))
        ).cast("long"),
        F.lit(n_bins - 1).cast("long"),
    )
    per = df.select(
        b.alias("bin"),
        cs.alias("__cs__"),
        F.col(label_col).cast("long").alias("__pos__"),
    )
    agg = per.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__cs__").alias("__s__"),
        F.sum("__pos__").alias("__np__"),
    )
    tot = agg.agg(F.sum("n").alias("__N__"))
    conf = (F.col("__s__") - F.col("n") * F.lit(lo)).cast("double") / (
        F.col("n") * F.lit(span)
    ).cast("double")
    rate = F.col("__np__").cast("double") / F.col("n").cast("double")
    gap = F.abs(conf - rate)
    return agg.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n",
        F.round(conf, 6).alias("avg_conf"),
        F.round(rate, 6).alias("pos_rate"),
        F.round(gap, 6).alias("gap"),
        F.round(
            gap * F.col("n").cast("double") / F.col("__N__").cast("double"),
            6,
        ).alias("weighted_gap"),
    )
