"""Sketch operators: the guarantees that make them trustworthy at scale.

The oracle rows (a15_heavy_hitters, a27_countmin, decontaminate_bloom)
check end-to-end exactness at sf0.01; these tests pin the properties that
hold at ANY scale: Misra-Gries never drops a true heavy hitter; a Bloom
filter never produces a false negative (and the verify step erases its
false positives even when the filter is deliberately saturated); count-min
never under-counts, and per-group sketches merged by summation are
bit-identical to a single global build (linearity — the pre-aggregation
property). Plus the plan shapes the docstrings sell.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bag_parser_spark.operators.sketches import (
    bloom_build,
    bloom_candidates,
    count_min_build,
    count_min_estimate,
    count_min_merge,
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


def test_bloom_no_false_negatives_and_verify_exact(spark):
    members = spark.createDataFrame(
        [(f"key{i}",) for i in range(200)], "k string"
    ).repartition(8)
    # probe = 100 true members + 300 non-members
    probe = spark.createDataFrame(
        [(f"key{i}",) for i in range(0, 200, 2)]
        + [(f"other{i}",) for i in range(300)],
        "k string",
    ).repartition(8)
    for m in (16, 65536):  # m=16: fully saturated filter, worst case
        bloom = bloom_build(members, "k", k=3, m=m)
        cands = {r["k"] for r in bloom_candidates(probe, "k", bloom, 3, m).collect()}
        true_members = {f"key{i}" for i in range(0, 200, 2)}
        # no false negatives, ever — saturated or not
        assert true_members <= cands
        # exact verify erases whatever false positives the filter admitted
        confirmed = cands & {r["k"] for r in members.collect()}
        assert confirmed == true_members
    # at m=16 every probe key is a candidate (saturation is honest)
    bloom16 = bloom_build(members, "k", k=3, m=16)
    assert bloom_candidates(probe, "k", bloom16, 3, 16).count() == 400


def test_countmin_never_undercounts_and_merge_linearity(spark):
    rows = [(i % 37, "a" if i % 2 == 0 else "b") for i in range(1000)] + [
        (7, "a")
    ] * 50
    df = spark.createDataFrame(rows, "k bigint, g string").repartition(8)
    # tiny width forces collisions — the regime where the bound matters
    sk = count_min_merge(count_min_build(df, "k", depth=3, width=8, group_cols=["g"]))
    exact = {r["k"]: r["c"] for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("c")).collect()}
    probes = df.select("k").distinct()
    est = {r["k"]: r["est"] for r in count_min_estimate(probes, "k", sk, 3, 8).collect()}
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)  # never under-counts
    assert any(est[k] > exact[k] for k in exact)  # collisions really happen
    # linearity: per-group build + merge == single global build, cell by cell
    merged = {(r["row"], r["pos"]): r["cell"] for r in sk.collect()}
    direct = {
        (r["row"], r["pos"]): r["cell"]
        for r in count_min_build(df, "k", depth=3, width=8).collect()
    }
    assert merged == direct


def test_countmin_unseen_probe_key_answers_zero(spark):
    """A probe key never inserted into the sketch must answer est=0 (the
    count-min contract: absent cell = count 0), not vanish from the
    output."""
    df = spark.createDataFrame([(i % 5,) for i in range(100)], "k bigint")
    sk = count_min_build(df, "k", depth=3, width=1024)
    probes = spark.createDataFrame([(0,), (999,)], "k bigint")
    est = {r["k"]: r["est"] for r in count_min_estimate(probes, "k", sk, 3, 1024).collect()}
    assert est[0] == 20
    assert est[999] == 0  # never seen, all cells empty at width 1024


def test_bloom_and_countmin_plans_broadcast_only(spark):
    from bag_parser_spark.sources.parquet import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    bloom = bloom_build(ev.select("event_type"), "event_type", 3, 1024)
    cplan = (
        bloom_candidates(ev, "event_type", bloom, 3, 1024)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the probe is a broadcast hash join on pos — the corpus side is never
    # hash-partitioned by a join key
    assert "BroadcastHashJoin" in cplan
    assert "SortMergeJoin" not in cplan
    sk = count_min_merge(
        count_min_build(ev, "user_id", 3, 256, group_cols=["event_type"])
    )
    eplan = (
        count_min_estimate(ev.select("user_id").distinct(), "user_id", sk, 3, 256)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in eplan
    assert "SortMergeJoin" not in eplan


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
