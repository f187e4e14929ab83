"""Misra-Gries heavy hitters: the superset guarantee and the plan shape.

The oracle row (a15_heavy_hitters) checks end-to-end exactness at sf0.01;
these tests pin the properties that make the operator trustworthy at any
scale: (1) the candidate phase never drops a true heavy hitter, even on
adversarially skewed data spread across partitions, and (2) the plan is
the shape the docstring sells — a shuffle-free mapInPandas candidate pass
and a broadcast semi-join verification, not a full-key shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bag_parser_spark.operators.sketches import (
    heavy_hitters,
    misra_gries_candidates,
)


def _skewed_df(spark):
    # 3 heavy keys (freq 300, 200, 120 of N=1000) + 380 singletons,
    # deliberately spread over many partitions so per-partition counts
    # are small — the regime where a naive "local top-k" silently loses
    # keys and Misra-Gries' pigeonhole guarantee matters.
    rows = (
        [(1,)] * 300 + [(2,)] * 200 + [(3,)] * 120 + [(i,) for i in range(100, 480)]
    )
    return spark.createDataFrame(rows, "k bigint").repartition(16)


def test_candidates_superset_of_true_heavy_hitters(spark):
    df = _skewed_df(spark)
    # phi = 10% -> k = 10 counters; true heavy hitters: 1, 2, 3
    cands = {
        r["k"] for r in misra_gries_candidates(df, "k", k=10).distinct().collect()
    }
    assert {1, 2, 3} <= cands


def test_heavy_hitters_exact_on_skew(spark):
    df = _skewed_df(spark)
    got = {
        r["k"]: r["freq"]
        for r in heavy_hitters(df, "k", phi_num=1, phi_den=10).collect()
    }
    assert got == {1: 300, 2: 200, 3: 120}


def test_heavy_hitters_ignores_nulls(spark):
    rows = [(1,)] * 9 + [(None,)] * 20 + [(2,)] * 1
    df = spark.createDataFrame(rows, "k bigint").repartition(4)
    got = {
        r["k"]: r["freq"]
        for r in heavy_hitters(df, "k", phi_num=5, phi_den=10).collect()
    }
    assert got == {1: 9}  # threshold on non-null N=10, nulls never keys


def test_plan_candidates_unshuffled_and_verify_broadcast(spark):
    from bag_parser_spark.sources.parquet import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events").where(
        F.col("user_id").isNotNull()
    )
    # candidate pass: scan -> project -> MapInPandas, zero exchanges —
    # the whole point of the per-partition summary
    cplan = (
        misra_gries_candidates(ev, "user_id", 125)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in cplan
    assert "Exchange" not in cplan
    # verification joins are broadcast (candidates + 1-row total), so the
    # source relation is never hash-partitioned by a join key
    hplan = (
        heavy_hitters(ev, "user_id", 8, 1000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in hplan or "BroadcastNestedLoopJoin" in hplan
    assert "SortMergeJoin" not in hplan
