"""Physical-plan contract tests: the scale properties SURVEY §4 promises
(pushdown, pruning, broadcast dims, map-only projections, bounded shuffle
counts) asserted against the actual Catalyst output, so a refactor that
silently regresses the 100 TB shape fails CI — not a code review.
"""

from __future__ import annotations

import contextlib
import io

from bag_parser_spark.plans.catalog import registry
from tests.conftest import SF_CORRECT


def _plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_j1_pushdown_pruning_broadcast(spark):
    df = registry()["j1_chained_left_join"].fn(spark, SF_CORRECT)
    plan = _plan(df)
    # selective filter reaches the parquet scan
    assert "GreaterThanOrEqual(l_quantity,30.0)" in plan
    # column pruning: untouched wide columns never leave the scan
    assert "l_comment" not in plan and "l_shipdate" not in plan
    # the two true dims are broadcast (hinted); fact side never shuffles in
    # the initial plan — no shuffle exchange at all in this join chain
    assert plan.count("BroadcastExchange") >= 2
    assert "Exchange hashpartitioning" not in plan


def test_a1_partial_aggregation_and_pushdown(spark):
    df = registry()["a1_grouped_stats"].fn(spark, SF_CORRECT)
    plan = _plan(df)
    # map-side combine: partial + final aggregate pair around one exchange
    # (SortAggregate here — the min(string) any-value buffer is immutable,
    # so Spark can't use the hash-map variant; partial_* still runs
    # map-side, which is what bounds the shuffle volume)
    assert "partial_sum" in plan and "partial_count" in plan
    assert _plan(df, "simple").count("Exchange hashpartitioning") == 1
    # the <> '' predicate reaches the scan
    assert "PushedFilters" in plan and "p_brand" in plan


def test_f6_map_only_codegen(spark):
    df = registry()["f6_rd_to_wgs84"].fn(spark, SF_CORRECT)
    plan = _plan(df, "simple")
    # coordinate transform is a pure projection: no shuffle, no sort, and
    # the polynomial stays inside whole-stage codegen
    assert "Exchange" not in plan
    assert "Sort" not in plan
    # whole-stage codegen span = the "*(n)" stage marker in simple mode
    assert "*(1)" in plan


def test_j7_plans_left_anti(spark):
    df = registry()["j7_anti_join"].fn(spark, SF_CORRECT)
    plan = _plan(df, "simple")
    assert "LeftAnti" in plan


def test_w1_single_shuffle(spark):
    df = registry()["w1_last_write_wins"].fn(spark, SF_CORRECT)
    plan = _plan(df, "simple")
    # dedup window = exactly one shuffle on the key
    assert plan.count("Exchange hashpartitioning") == 1


def test_minhash_bounded_shuffles(spark):
    df = registry()["dedup_minhash_lsh"].fn(spark, SF_CORRECT)
    plan = _plan(df, "simple")
    # signature agg + band-bucket agg + pair distinct; the window inside
    # word_shingle_rows shares the signature agg's partitioning. More
    # exchanges than this means a lineage got duplicated (self-join trap).
    assert plan.count("Exchange hashpartitioning") <= 4
    # document text must never be shuffled: exchanges carry ids/hashes only
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line


def test_split_and_pack_shapes(spark):
    reg = registry()
    split_plan = _plan(reg["split_train_test"].fn(spark, SF_CORRECT), "simple")
    # hash split is map-only: stable under any partitioning because it
    # never depends on one
    assert "Exchange" not in split_plan
    pack_plan = _plan(reg["pack_sequences"].fn(spark, SF_CORRECT), "simple")
    # packing = one shuffle (by shard) + in-partition sort for the cumsum
    assert pack_plan.count("Exchange hashpartitioning") == 1
