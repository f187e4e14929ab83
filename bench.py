#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ..., "reps": n, "import": {...}}.
Each query is materialized via the noop sink (full execution, no driver
collect cost).

The stdout line is deliberately COMPACT: the driver archives only the
last ~2000 characters of stdout and parses the final line as JSON — the
r3–r5 records came back "parsed": null because the line (with per-run
details inline) outgrew that window, losing the front half of the
headline set from the archived record (VERDICT r5 #2). Per-run raw
timings, medians, and the full import breakdown now go to the
BENCH_DETAILS.json side file next to this script; stdout carries only
the per-query minimum and a compact import summary. A unit test pins
the line under the window for the current headline set.

Methodology: every query runs $SPARK_GRAFT_BENCH_REPS (default 3) times in
interleaved rounds; "queries" and the headline total report the per-query
MINIMUM, "details" adds the median and raw runs. Local sf0.1 timings are
warmup/noise-dominated (±30-60% run-to-run measured in round 2) — a single
rep cannot distinguish a real 1.5× regression from scheduler noise; the
warm minimum is the stable estimator of the query's actual cost, and the
median exposes variance to the reader.

The JSON also carries an "import" object: the full BAG import path
(zip scan → XML parse → upsert → adressen build → parquet sinks) timed
on a generated $SPARK_GRAFT_IMPORT_N-address delivery (default 100k,
0 disables) — the reference's headline ~6-min/~26k-addresses-per-sec
number (readme.MD:86-88) that the query catalog alone never exercises.
Fixture generation is untimed. At 100k the wall time is fixed-overhead
dominated (scripts/import_bench.py measures ~19k addr/s at 800k with a
~23k addr/s marginal rate); "addresses_per_sec" is reported against the
SAME-run address count, so read it next to n_addresses.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

from bag_parser_spark.plans.catalog import registry
from bag_parser_spark.session import get_spark, release_cached_blocks

# Headline set: one per operator family — join chain, grouped agg, window
# dedup, coordinate transform, plus extension operators as they land.
HEADLINE = [
    "j1_chained_left_join",
    "a1_grouped_stats",
    "a2_count_battery",
    "w1_last_write_wins",
    "f6_rd_to_wgs84",
    "j4_explode_join_lastwins",
    "j5_explode_self_join",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "text_quality_metrics",
    "sim_cosine_topk",
    "sim_ivf_topk",
    "ts_gapfill",
    "ts_interval_join",
    "a9_rollup",
    "emb_quantize_int8",
    "ml_kmeans_step",
    "text_bigram_lm",
    "lm_doc_score",
    "events_session_window",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "j10_salted_skew_join",
    "mm_image_features",
    "tpch_q9_product_profit",
    "tpch_q21_waiting_suppliers",
    "text_bm25_topk",
    "text_hash_classifier",
    "ts_ohlc_bars",
    "dedup_verified_pairs",
    "dedup_incremental",
    "mm_image_neardup",
    "dedup_segment_fraction",
    "sim_pq_encode",
    "sim_pq_adc_topk",
    "corpus_datasheet",
    "ml_pagerank_step",
    "text_bpe_merge_step",
    "sim_ivfpq_topk",
    "text_bpe_encode",
    "decontaminate_bloom",
    "a27_countmin",
    "ml_eval_confusion",
    "dedup_span_stats",
    "dedup_span_rewrite",
    "sim_hard_negatives",
    "text_ngram_novelty",
]


def _warmup(spark, sf_dir: str) -> None:
    """Throwaway jobs so JVM/codegen/datasource warmup isn't billed to the
    first timed queries (timings should measure queries, not startup).
    Exercises the machinery the headline queries share — parquet scan,
    groupBy agg, window, explode, regex/md5 projection, broadcast join,
    sort/limit — on the 5-row region table, so JIT and codegen
    infrastructure are hot; nothing here computes or caches any headline
    result (the noop sink materializes and discards)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    jobs = [
        r.agg(F.count(F.lit(1))),
        r.groupBy("r_regionkey").agg(F.min("r_name")),
        r.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("r_regionkey").orderBy("r_name")
            ),
        ),
        r.select(
            F.explode(F.split(F.col("r_name"), r"\s+")).alias("t")
        ).select(F.md5(F.col("t")).alias("h")),
        r.select(
            F.regexp_extract_all(F.col("r_name"), F.lit(r"(\S+)"), 1).alias("g")
        ),
        r.join(F.broadcast(r.select("r_regionkey")), "r_regionkey", "left"),
        r.orderBy(F.col("r_name").desc()).limit(1),
        _pandas_udf_warmup(r),
    ]
    for df in jobs:
        df.write.format("noop").mode("overwrite").save()


def _pandas_udf_warmup(r):
    """One trivial Arrow-batched job so Python worker + Arrow serialization
    startup isn't billed to the first pandas_udf-backed query."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _ident(s: pd.Series) -> pd.Series:
        return s

    return r.select(_ident(F.col("r_regionkey").cast("long")).alias("x"))


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    m = n // 2
    return s[m] if n % 2 else (s[m - 1] + s[m]) / 2.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="bag-parser-spark-bench")
    reg = registry()
    _warmup(spark, sf_dir)
    names = [n for n in HEADLINE if n in reg]
    runs: dict[str, list[float]] = {n: [] for n in names}
    # interleaved rounds: a transient machine-load spike hits one rep of
    # many queries instead of every rep of one query
    for _ in range(reps):
        for name in names:
            fn = reg[name].fn
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs[name].append(round(time.perf_counter() - t0, 3))
            # each rep re-executes persisted subtrees, and no cached or
            # checkpointed block survives into the next timing
            release_cached_blocks(spark)
    import_metric = None
    import_n = int(os.environ.get("SPARK_GRAFT_IMPORT_N", "100000"))
    if import_n > 0:
        import shutil
        import tempfile

        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
        from import_bench import run_import_bench

        work = tempfile.mkdtemp(prefix="bag_import_bench_")
        try:
            import_metric = run_import_bench(spark, import_n, work)
        finally:
            shutil.rmtree(work, ignore_errors=True)
        release_cached_blocks(spark)

    timings = {n: min(rs) for n, rs in runs.items()}
    details = {
        n: {"min": min(rs), "median": round(_median(rs), 3), "runs": rs}
        for n, rs in runs.items()
    }
    # full record → side file (not stdout: see module docstring)
    side = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAILS.json"
    )
    with open(side, "w") as f:
        json.dump(
            {
                "sf": sf,
                "reps": reps,
                "details": details,
                "import": import_metric,
            },
            f,
            indent=1,
        )
    print(format_stdout_line(timings, sf, reps, import_metric))
    spark.stop()


def format_stdout_line(
    timings: dict[str, float],
    sf: str,
    reps: int,
    import_metric: dict | None,
) -> str:
    """The single machine-parsed stdout line (compact separators, min
    timings only, 3-field import summary). Kept as a function so the
    length-budget unit test exercises the REAL formatting."""
    import_compact = None
    if import_metric is not None:
        import_compact = {
            "n": import_metric.get("n_addresses"),
            "sec": import_metric.get("value"),
            "addr_per_sec": import_metric.get("addresses_per_sec"),
        }
    return json.dumps(
        {
            "metric": "headline_queries_total",
            "value": round(sum(timings.values()), 3),
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "reps": reps,
            "import": import_compact,
        },
        separators=(",", ":"),
    )


if __name__ == "__main__":
    sys.exit(main())
