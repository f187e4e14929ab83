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
BENCH_DETAILS.json side file next to this script — or to
$SPARK_GRAFT_BENCH_DETAILS when set, so ad-hoc probe runs never
clobber the committed round record (VERDICT r10 watch (b)); stdout
carries only the per-query minimum and a compact import summary. A
unit test pins the line under the window for the current headline set.

Methodology: every query runs $SPARK_GRAFT_BENCH_REPS (default 3) times in
interleaved rounds; "queries" maps each name to a [min, median] pair (2
decimals; raw runs in BENCH_DETAILS.json). Local sf0.1 timings are
warmup/noise-dominated (±30-60% run-to-run measured in round 2) — a single
rep cannot distinguish a real 1.5× regression from scheduler noise; the
warm minimum is the stable estimator of the query's actual cost, and the
median gives round-over-round comparisons an error bar (the r5→r6 ±15%
uniform drift was unfalsifiable from min-only, VERDICT r6 #7).

The JSON also carries an "import" LIST: the full BAG import path
(zip scan → XML parse → upsert → adressen build → parquet sinks) timed
on generated deliveries at TWO sizes — $SPARK_GRAFT_IMPORT_N (default
100k, continuity with r1–r6, fixed-overhead dominated) and
$SPARK_GRAFT_IMPORT_N2 (default 800k, the AMORTIZED point the
throughput claim cites; 0 disables either) — each $SPARK_GRAFT_IMPORT_REPS
(default 3 — the first rep is reliably cold) times, min+median. This is the reference's headline
~6-min/~26k-addresses-per-sec number (readme.MD:86-88) that the query
catalog alone never exercises. Fixture generation is untimed.
"addresses_per_sec" is reported against the SAME-run address count.
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
# Trimmed to 42 in r7 (dropped 6 near-duplicates of family members —
# a2_count_battery, j5_explode_self_join, text_bigram_lm,
# sim_pq_adc_topk, text_bpe_merge_step, ml_eval_confusion — all still
# oracle-tested in pytest) to fit [min, median] PAIRS per query in the
# driver-window budget (VERDICT r6 #7: min-only made the r5→r6 ±15%
# uniform drift unfalsifiable).
HEADLINE = [
    "j1_chained_left_join",
    "a1_grouped_stats",
    "w1_last_write_wins",
    "f6_rd_to_wgs84",
    "j4_explode_join_lastwins",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "text_quality_metrics",
    "sim_ivf_topk",
    "ts_gapfill",
    "ts_interval_join",
    # emb_quantize_int8 rotated out r8 for sample_dsir (stdout-window
    # budget; the embedding family keeps sim_ivf/ivfpq/hard_negatives
    # and dedup_embedding_cosine on the clock)
    "ml_kmeans_step",
    "lm_doc_score",
    "events_session_window",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "j10_salted_skew_join",
    "mm_image_features",
    "tpch_q9_product_profit",
    "tpch_q21_waiting_suppliers",
    "text_hash_classifier",
    "dedup_verified_pairs",
    "dedup_incremental",
    "mm_image_neardup",
    # r7 swaps: sim_pq_encode -> url_domain_cap and dedup_span_stats ->
    # text_gopher_rules (the dropped pair stay oracle-tested in pytest;
    # sim_ivfpq_topk subsumes PQ encoding, dedup_span_rewrite subsumes
    # the span-stats machinery) so the new web-curation + gopher
    # families are benchmarked without overflowing the driver's
    # 2000-char stdout window.
    "url_domain_cap",
    "corpus_datasheet",
    "ml_pagerank_step",
    "sim_ivfpq_topk",
    "text_bpe_encode",
    "decontaminate_bloom",
    "dedup_span_rewrite",
    "sim_hard_negatives",
    # r11 swap (stdout-window budget, same pattern as r7-r9): dropped
    # text_ngram_novelty (text keeps quality_metrics, hash_classifier,
    # bpe_encode and main_content on the clock; it stays oracle-tested
    # in pytest) for the new winnowing near-dup join — the guaranteed-
    # overlap half of the dedup family, whose persisted-fingerprint
    # self-join is exactly the shape worth watching per round
    "dedup_winnowing",
    # r8 swaps (stdout-window budget, same pattern as r7): dropped
    # sim_cosine_topk (sim_ivf_topk covers the cosine path),
    # ts_ohlc_bars (ts_gapfill/ts_interval_join keep the family on the
    # clock), text_bm25_topk and a9_rollup (families covered below) —
    # all stay oracle-tested in pytest. Added: the rewritten ntile
    # query family (their perf is the point of the rewrite — r11 keeps
    # cust_rfm, the heavier of the two bucketed_rank twins, and rotates
    # a20_ntile_binning off for sample_pack_bins under the
    # stdout-window budget; a20 stays oracle-tested in pytest), the
    # 0-exchange block-scoring extractor, and the iterative PageRank
    "cust_rfm",
    "text_main_content",
    "ml_pagerank_converged",
    # r8 late: DSIR importance resampling (one corpus groupBy +
    # broadcast log-ratio join — the mixing family's selection half)
    "sample_dsir",
    # r9 swaps (stdout-window budget, same pattern as r7/r8): dropped
    # dedup_segment_fraction (dedup keeps seven members on the clock),
    # a27_countmin and text_gopher_rules (both stay oracle-tested in
    # pytest; the core_total/core_med fields below paid for the chars).
    # Added: the WARC source (synthetic build + real record parse —
    # the raw-input end of the web pipeline)
    "warc_records",
    # r11: whole-document bin packing — one (len_class, shard) window
    # exchange, zero joins; the no-split half of the packing family
    "sample_pack_bins",
]

# FIXED core (VERDICT r8 #7): the headline total stopped being
# round-comparable because every rotation moves queries in and out
# (r7→r8 read as a 65→73 s "regression" that was purely a surface
# change). These 25 queries have been on the clock every round since
# r7 and are now PINNED — the rotating wing above can keep churning,
# while "core_total" tracks the same work round over round. A unit
# test asserts CORE ⊆ HEADLINE; remove a core member only with a
# README note recomputing the baseline.
CORE = [
    "j1_chained_left_join", "a1_grouped_stats", "w1_last_write_wins",
    "f6_rd_to_wgs84", "j4_explode_join_lastwins", "dedup_exact_docs",
    "dedup_minhash_lsh", "dedup_embedding_cosine", "text_quality_metrics",
    "sim_ivf_topk", "ts_gapfill", "ts_interval_join", "ml_kmeans_step",
    "lm_doc_score", "events_session_window", "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority", "j10_salted_skew_join",
    "mm_image_features", "tpch_q9_product_profit",
    "tpch_q21_waiting_suppliers", "text_hash_classifier",
    "dedup_verified_pairs", "dedup_incremental", "mm_image_neardup",
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


def _loadavg() -> float | None:
    """1-minute load average, None where /proc is unavailable."""
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except (OSError, ValueError, IndexError):
        return None


def details_path() -> str:
    """Where the full per-run record lands. Default: the repo-root
    BENCH_DETAILS.json the driver archives per round — which means an
    AD-HOC bench run (a judge's or builder's probe) would clobber the
    committed clean-run record in the working tree (VERDICT r10 watch
    (b)). Set $SPARK_GRAFT_BENCH_DETAILS to a scratch path for probe
    runs; the round's record is whatever the default path held at the
    builder's last commit."""
    return os.environ.get("SPARK_GRAFT_BENCH_DETAILS") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAILS.json"
    )


def max_rep_ratio(runs: dict[str, list[float]]) -> float | None:
    """Contamination sentinel (VERDICT r9 #1): the worst per-query
    max/min rep ratio. On an idle box interleaved warm reps sit within
    ~1.5–2x of each other; the r9 archive's signature defect — a heavy
    job starting mid-bench — shows up as third reps ballooning to 6–10x
    their first rep. A large value means the run is dirty and its
    minimums are upper bounds, not estimates."""
    ratios = [
        max(rs) / min(rs)
        for rs in runs.values()
        if rs and min(rs) > 0
    ]
    return round(max(ratios), 2) if ratios else None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    load_start = _loadavg()
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
    # Import path: TWO sizes per round (VERDICT r6 #2) — the small point
    # (fixed-overhead dominated) for continuity with r1–r6, and an
    # amortized >=800k point that the throughput claim must cite; both
    # under the same >=2-rep min/median protocol as the queries.
    import_metrics: list[dict] = []
    # 3 reps: the FIRST import rep is reliably cold (page cache + JVM
    # paths for the XML scan) — r7 measured 63.8/31.5 at 800k with 2
    # reps vs 47.7/29.0/23.2 with 3 on an idle machine; min-of-2 leaves
    # ~35% cold-start in the record
    import_reps = max(1, int(os.environ.get("SPARK_GRAFT_IMPORT_REPS", "3")))
    sizes = [
        int(os.environ.get("SPARK_GRAFT_IMPORT_N", "100000")),
        int(os.environ.get("SPARK_GRAFT_IMPORT_N2", "800000")),
    ]
    if any(n > 0 for n in sizes):
        import shutil
        import tempfile

        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
        from import_bench import run_import_bench

        work = tempfile.mkdtemp(prefix="bag_import_bench_")
        try:
            for import_n in sizes:
                if import_n > 0:
                    import_metrics.append(
                        run_import_bench(
                            spark, import_n, work, reps=import_reps
                        )
                    )
                    release_cached_blocks(spark)
        finally:
            shutil.rmtree(work, ignore_errors=True)

    load_end = _loadavg()
    timings = {
        n: (min(rs), round(_median(rs), 3)) for n, rs in runs.items()
    }
    details = {
        n: {"min": min(rs), "median": round(_median(rs), 3), "runs": rs}
        for n, rs in runs.items()
    }
    # full record → side file (not stdout: see module docstring)
    side = details_path()
    with open(side, "w") as f:
        json.dump(
            {
                "sf": sf,
                "reps": reps,
                "load": [load_start, load_end],
                "details": details,
                "import": import_metrics,
            },
            f,
            indent=1,
        )
    print(
        format_stdout_line(
            timings,
            sf,
            reps,
            import_metrics,
            load=(load_start, load_end),
            mrr=max_rep_ratio(runs),
        )
    )
    spark.stop()


def format_stdout_line(
    timings: dict[str, tuple[float, float]],
    sf: str,
    reps: int,
    import_metrics: list[dict] | None,
    load: tuple[float | None, float | None] = (None, None),
    mrr: float | None = None,
) -> str:
    """The single machine-parsed stdout line (compact separators). Each
    query maps to a [min, median] PAIR rounded to 2 decimals (full
    3-decimal precision + raw runs live in BENCH_DETAILS.json) so
    round-over-round comparisons carry an error bar (VERDICT r6 #7);
    "value" stays the min-sum for continuity with r1–r6, "value_med"
    adds the median-sum. The import list carries one compact
    {n, sec, med, aps} entry per measured size ({100k, >=800k} per
    round, VERDICT r6 #2). Kept as a function so the length-budget unit
    test exercises the REAL formatting."""
    import_compact = None
    if import_metrics:
        import_compact = [
            {
                "n": m.get("n_addresses"),
                "sec": m.get("value"),
                "med": m.get("value_median"),
                "aps": m.get("addresses_per_sec"),
            }
            for m in import_metrics
        ]
    mins = [p[0] for p in timings.values()]
    meds = [p[1] for p in timings.values()]
    core = [p for n, p in timings.items() if n in CORE]
    # a dropped/failed core member silently shrinks core_total and
    # breaks the round-over-round comparison the pinned core exists for
    # (ADVICE r9) — name the hole in the artifact itself (the key is
    # OMITTED when the core is complete: stdout-budget economy, and
    # its presence alone flags the defect)
    core_missing = sorted(set(CORE) - set(timings))
    return json.dumps(
        {
            "metric": "headline_queries_total",
            "value": round(sum(mins), 3),
            "value_med": round(sum(meds), 3),
            # round-over-round comparable: the pinned 25-query core
            # (the rotating wing is value - core_total)
            "core_total": round(sum(p[0] for p in core), 3),
            "core_med": round(sum(p[1] for p in core), 3),
            **({"core_missing": core_missing} if core_missing else {}),
            # contamination sentinels (VERDICT r9 #1): 1-min loadavg at
            # start/end and the worst per-query max/min rep ratio — a
            # dirty run (concurrent load, like the r9 archive) is
            # visibly dirty in the archived record itself
            "load": [load[0], load[1]],
            "max_rep_ratio": mrr,
            "unit": "sec",
            "queries": {
                n: [round(p[0], 2), round(p[1], 2)]
                for n, p in timings.items()
            },
            "sf": sf,
            "reps": reps,
            "import": import_compact,
        },
        separators=(",", ":"),
    )


if __name__ == "__main__":
    sys.exit(main())
