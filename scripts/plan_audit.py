#!/usr/bin/env python
"""Physical-plan audit behind PLANS.md: for each audited catalog query,
extract the scale-relevant properties from the executed plan —

  exchanges        shuffle count (every one is a cluster-wide data move)
  broadcasts       BroadcastExchange/BroadcastHashJoin count (dim joins
                   that do NOT shuffle the fact side)
  sort_merge       SortMergeJoin count (big-big joins, shuffle both sides)
  codegen_spans    WholeStageCodegen regions (JVM-compiled pipelines)
  python_eval      BatchEvalPython / ArrowEvalPython / MapInPandas /
                   FlatMapGroupsInPandas occurrences (Python workers in
                   the plan — should be decode/stateful edges only)
  cartesian        CartesianProduct occurrences (all-pairs: forbidden
                   outside broadcast-1-row patterns)
  pushed_filters   whether any parquet scan reports PushedFilters

and write a markdown table plus per-query notes. Run after operator
changes; diff PLANS.md to catch plan regressions (a new exchange, a
lost broadcast, a Python stage sneaking into a hot path).

Usage: python scripts/plan_audit.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

AUDIT = [
    "j1_chained_left_join",
    "a1_grouped_stats",
    "w1_last_write_wins",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "dedup_verified_pairs",
    "dedup_incremental",
    "dedup_embedding_cosine",
    "dedup_semantic",
    "dedup_segment_fraction",
    "sim_pq_encode",
    "sim_pq_adc_topk",
    "corpus_datasheet",
    "ml_pagerank_step",
    "text_bpe_merge_step",
    "mm_image_neardup",
    "sim_ivf_topk",
    "text_bm25_topk",
    "ts_interval_join",
    "ts_autocorr",
    "sample_mixture",
    "a25_market_basket",
    "tpch_q9_product_profit",
    "tpch_q21_waiting_suppliers",
    "events_hopping_agg",
    "lm_doc_score",
    "sim_ivfpq_topk",
    "layout_file_skipping",
    "text_bpe_encode",
    "sample_temperature",
    "text_bpe_train",
    "decontaminate_bloom",
    "a27_countmin",
    "ml_eval_confusion",
    "ts_asof_tolerance",
    "a28_grouping_sets",
    "dedup_span_stats",
    "sim_hard_negatives",
    "text_ngram_novelty",
    "dedup_span_rewrite",
    # r7: web-curation family (canonicalize must be exchange-free map
    # work; blocklist must broadcast, never shuffle the corpus; the cap
    # is exactly one domain-keyed window exchange) + the gopher battery
    # (explode -> two doc-keyed groupBys + one map-only symbol join)
    "url_canonicalize",
    "url_domain_stats",
    "url_domain_cap",
    "url_blocklist_filter",
    "text_gopher_rules",
    # r7 late additions: canonical-URL dedup (one groupBy on the
    # canonical string), the gopher unpivot report (same two shuffles as
    # the battery + 1-row aggregate), and the JPEG decode path (must be
    # exchange-free with exactly the two honest Python decode edges)
    "url_canonical_dedup",
    "text_gopher_summary",
    "mm_jpeg_features",
    # r7 late additions II: C4 line-level cleaning and HTML -> text —
    # both must be exchange-free map work (higher-order array filter /
    # regexp_replace chain riding the scan)
    "text_c4_line_filter",
    "text_html_extract",
    # r7 late additions III: link harvest must be exchange-free map
    # work; the host-graph rollup is exactly one groupBy exchange
    "web_link_extract",
    "web_link_graph",
    # robots evaluation (r8 rewrite): per-domain rule ARRAYS broadcast
    # onto the pages, longest-match picked by array_max — the corpus
    # side must be exchange-free (the r7 doc-keyed window was a full
    # corpus shuffle per robots pass)
    "web_robots_filter",
    # token-budget mixing: the exact distributed prefix sum — one
    # (source,bucket) window exchange + a tiny broadcast offsets side,
    # never a whole-source single-task window
    "sample_token_budget",
    # r8 rewrites (VERDICT r7 #1/#2): exact ntile via bucketed_rank —
    # every corpus-sized window must be bucket-partitioned; no
    # unpartitioned WindowExec over the fact (pinned by
    # tests/test_plans.py::test_no_single_partition_ntile_windows)
    "a20_ntile_binning",
    "cust_rfm",
    # r8: readability block scoring — must be exchange-free map work
    # (block split + higher-order filter riding the scan)
    "text_main_content",
    # r8: converged PageRank — per-iteration lineage must be TRUNCATED
    # (localCheckpoint), so the final plan is one join over two
    # checkpointed rank tables, not a 3^k tree
    "ml_pagerank_converged",
    # r8: DSIR importance resampling — map-side feature stream, two
    # tiny bucket aggregates, broadcast log-ratio join; the ONE
    # corpus-scale exchange is the per-doc groupBy, top-k is a heap
    "sample_dsir",
    # r9: politeness-budgeted frontier — candidate/in-degree/seen
    # exchanges are url/host-keyed; the budget window partitions by
    # dst_host over candidate rows with the delay table broadcast
    "web_crawl_frontier",
    # r9: synthetic-WARC build + real record parse — applyInPandas +
    # mapInPandas are the only Python nodes; one id-sized groupBy
    "warc_records",
    # r10: WAT link sidecar — build + record parse + pruned-schema
    # from_json + posexplode + resolve CASE; the only exchange is the
    # id-sized file-bucket groupBy, the JSON never reaches Python
    "wat_links",
    # r11: whole-document bin packing — exactly one exchange (the
    # (len_class, shard) row_number window), zero joins, zero Python;
    # the CASE ladder and divmod ride the scan in one codegen region
    "sample_pack_bins",
    "dedup_winnowing",
    "text_lang_profile",
    "ml_eval_calibration",
    "dedup_winnowing_recall",
    "sim_ivf_filtered_topk",
]

_PY_NODES = (
    "BatchEvalPython", "ArrowEvalPython", "MapInPandas",
    "FlatMapGroupsInPandas",
)


def audit_query(spark, fn, sf_dir: str) -> dict:
    from bag_parser_spark.plans.plan_stats import runtime_plan_stats

    df = fn(spark, sf_dir)
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    try:
        mode = df._sc._jvm.org.apache.spark.sql.execution.ExplainMode
        formatted = qe.explainString(mode.fromString("formatted"))
    except Exception:
        formatted = plan
    rt = runtime_plan_stats(plan)
    return {
        "exchanges": len(re.findall(r"Exchange (?:hash|range|Single)", plan)),
        "runtime_exchanges": rt["runtime_exchanges"],
        "cached_distinct": rt["cached_distinct"],
        "cached_refs": rt["cached_refs"],
        "broadcasts": plan.count("BroadcastExchange"),
        "sort_merge": plan.count("SortMergeJoin"),
        # executedPlan().toString() marks codegen regions as "*(n) Node"
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "python_eval": sum(plan.count(n) for n in _PY_NODES),
        "cartesian": plan.count("CartesianProduct"),
        # a non-empty PushedFilters list on at least one parquet scan
        "pushed_filters": bool(
            re.search(r"PushedFilters: \[[^\]]", formatted)
        ),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    out_path = args.out or os.path.join(repo, "PLANS.md")

    from bag_parser_spark.plans.catalog import registry
    from bag_parser_spark.session import get_spark, release_cached_blocks

    spark = get_spark(app_name="plan-audit")
    reg = registry()
    rows = []
    for name in AUDIT:
        release_cached_blocks(spark)
        rows.append((name, audit_query(spark, reg[name].fn, args.sf)))

    lines = [
        "# PLANS — physical-plan audit of the flagship queries",
        "",
        "Generated by `python scripts/plan_audit.py` (local[32], "
        f"sf dir `{args.sf}`, AQE on). Columns: runtime shuffle "
        "exchanges (cached subtrees counted ONCE — what actually "
        "executes; `bag_parser_spark/plans/plan_stats.py`), static "
        "exchanges (naive plan-string count, inflates persist()-using "
        "queries because the plan string inlines every cached-subtree "
        "reference), distinct cached relations / references to them, "
        "broadcast joins, sort-merge joins, whole-stage-codegen "
        "regions, Python-eval nodes (decode/stateful edges only — 0 "
        "means the whole query is JVM-side), cartesian products (must "
        "be 0), and whether a parquet scan pushes filters. Diff this "
        "file after operator changes to catch plan regressions.",
        "",
        "| query | runtime exch | static exch | cached (distinct/refs) | "
        "broadcast | sort-merge | codegen | python | cartesian | "
        "pushed filters |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for name, a in rows:
        lines.append(
            f"| {name} | {a['runtime_exchanges']} | {a['exchanges']} | "
            f"{a['cached_distinct']}/{a['cached_refs']} | "
            f"{a['broadcasts']} | "
            f"{a['sort_merge']} | {a['codegen_spans']} | "
            f"{a['python_eval']} | {a['cartesian']} | "
            f"{'yes' if a['pushed_filters'] else 'no'} |"
        )
    # Carry over the hand-written per-round notes from the existing file
    # (everything between the table and the Reading guide) — regenerating
    # the table must not erase the round-by-round plan narrative.
    notes = ""
    if os.path.exists(out_path):
        old = open(out_path, encoding="utf-8").read()
        guide_at = old.find("Reading guide:")
        if guide_at >= 0:
            table_end = old.rfind("| ", 0, guide_at)
            if table_end >= 0:
                nl = old.find("\n", table_end)
                notes = old[nl + 1:guide_at].strip()
    if notes:
        lines += ["", notes]
    lines += [
        "",
        "Reading guide: `mm_image_neardup` and `mm_*` queries carry "
        "Python nodes by design (the real PNG/Y4M decode is the one "
        "honest Python edge); `sim_*`/`dedup_embedding_*` carry exactly "
        "one ArrowEvalPython (the measured, fold-order-exact pair "
        "cosine). Every other query should show python = 0. Cartesian "
        "products are 0 across the board — 1-row broadcast crossJoins "
        "compile to BroadcastNestedLoopJoin, not CartesianProduct.",
        "",
        "The runtime-exchange column replaces the r5 static-count "
        "caveat: each distinct `InMemoryRelation` build subtree is "
        "counted once (the CacheManager materializes it once; every "
        "other reference is an `InMemoryTableScan` over its blocks), "
        "so e.g. `dedup_verified_pairs` reads its true ~8 executed "
        "shuffles, not the 60 the inlined static string shows. "
        "`tests/test_plans.py` pins the runtime numbers for the "
        "persist()-heavy queries.",
        "",
    ]
    with open(out_path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_path} ({len(rows)} queries)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
