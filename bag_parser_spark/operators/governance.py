"""Data-governance operators for training-data pipelines: k-anonymity /
l-diversity auditing over quasi-identifier column sets. Privacy review is
part of corpus curation at scale — before a table ships into a training
mix, the pipeline should know how re-identifiable its rows are.

Pure DataFrame aggregations: one shuffle on the quasi-identifier key with
map-side combine, then a 1-row summary reduce — no UDF, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 10,
) -> DataFrame:
    """One-row k-anonymity / l-diversity audit.

    A row is k-anonymous when at least ``k`` rows share its full
    quasi-identifier tuple; a quasi-group is l-diverse at level l when it
    contains ≥ l distinct sensitive values (a group can be large yet leak
    the sensitive attribute if everyone shares one value). Emits:
    ``k``, ``n_groups``, ``n_violating_groups`` (size < k),
    ``rows_at_risk`` (rows in violating groups), ``min_group_size``,
    ``min_l_diversity``.

    Shape: groupBy(quasi) with count + count_distinct partials (shuffle
    volume = #groups, not #rows), then a global 1-row aggregate. At
    100 TB the quasi-group table is the only shuffled payload — the
    sensitive column never leaves the first aggregation.
    """
    g = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("__sz__"),
        F.count_distinct(F.col(sensitive_col)).alias("__l__"),
    )
    viol = F.col("__sz__") < k
    return g.agg(
        F.lit(k).alias("k"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(viol.cast("long")).alias("n_violating_groups"),
        F.sum(F.when(viol, F.col("__sz__")).otherwise(F.lit(0))).alias(
            "rows_at_risk"
        ),
        F.min("__sz__").alias("min_group_size"),
        F.min("__l__").alias("min_l_diversity"),
    )
