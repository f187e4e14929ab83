#!/usr/bin/env python
"""Reproducible scaling probe behind SCALE.md: derive a larger corpus
from an existing SF directory (documents xN re-keyed + perturbed,
embeddings xM re-keyed copies, events and lineitem xN with re-keyed
id/user/order populations) into --out, then time a set of catalog
queries on both and print one JSON line per query with the time and
output-row ratios.

events/lineitem replicas re-key user_id / l_orderkey so each replica is
an independent population: per-user interval-join pairs and per-order
baskets then grow LINEARLY with the factor (the honest cluster-scaling
shape — more users, not deeper histories); keeping the original keys
would instead grow per-key state quadratically, which is a skew test,
not a scale test.

Usage:
  python scripts/scale_probe.py [--base /root/testdata/sf0.1]
      [--out /tmp/sfbig] [--docs-x 10] [--emb-x 4] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Synthetic HTTP response header for the --warc-mbps probe records; the
# decompressed-bytes accounting derives from len() of this constant so
# header edits can never desync the reported MB/s (ADVICE r10: the old
# hand-counted `+ 47` overstated a 44-byte header).
_HTTP_HEADER = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"

QUERIES = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_quality_metrics",
    "tfidf_vectors",
    "text_bm25_topk",
    "dedup_embedding_cosine",
    "mm_image_neardup",
    "ts_interval_join",
    "a25_market_basket",
    # the pair-emitting heavy trio added r5 (VERDICT r5 #4)
    "dedup_verified_pairs",
    "dedup_incremental",
    "dedup_semantic",
    # r6 additions: IVF-PQ (cells and donors grow with the re-keyed id
    # range, so assignment cost is n x cells — the sqrt-n-cells regime),
    # and the zone-map audit (distinct-z histogram window)
    "sim_ivfpq_topk",
    "layout_file_skipping",
    # r6 sketches: the Bloom prefilter's false-positive rate grows with
    # the test-shingle count (fixed m=65536) — the probe measures how
    # gracefully a saturating filter degrades (verify cost rises, output
    # stays exact); count-min stays d*w cells no matter the input
    "decontaminate_bloom",
    "a27_countmin",
    # r6 late additions: sliding-window posting explodes (span dedup /
    # novelty — gram volume grows linearly with docs) and cell-blocked
    # hard-negative mining (replicated centroids multiply CELLS, not
    # cell size, so pair cost should stay ~linear in vectors)
    "dedup_span_stats",
    "text_ngram_novelty",
    "sim_hard_negatives",
    # the rewrite adds one id-keyed corpus join on top of the span
    # pipeline — probe that the join (not pair blowup) is the only cost
    "dedup_span_rewrite",
    # r7: the domain cap's single window shuffle is keyed by registered
    # domain — replicas multiply DOMAINS (site number x suffix), so the
    # probe checks per-domain state stays bounded; gopher is explode +
    # two doc-keyed groupBys, expected ~linear in total tokens
    "url_domain_cap",
    "text_gopher_rules",
    # r7 late: C4 line cleaning / HTML extract / link harvest are
    # map-only expression chains — the probe should read ~linear time
    # with zero shuffle growth; the link graph adds one (host, host)
    # groupBy whose keyspace is bounded by the fixture's host universe
    "text_c4_line_filter",
    "text_html_extract",
    "web_link_extract",
    "web_link_graph",
    # r9 (VERDICT r8 #8 — measured rows for every r8 operator): DSIR's
    # one corpus exchange is the per-(doc,bucket) collapse (<=512
    # rows/doc) with fixed 512-row distribution sides; converged
    # PageRank/k-means run a fixed iteration count over bounded state
    # (edges/k*dim) so time should track the edge/vector volume;
    # main-content extraction is a zero-shuffle expression chain; the
    # frontier budget window is keyed by dst_host over candidate rows;
    # cust_rfm's grouped bucketed_rank re-sketches per replica-grown
    # customer population; robots evaluation is broadcast + map
    # (replicas multiply PAGES, the rules side is fixed); warc_records
    # builds+parses per file bucket — pure map after one id groupBy
    "sample_dsir",
    "ml_pagerank_converged",
    "ml_kmeans_converged",
    "text_main_content",
    "web_crawl_frontier",
    "cust_rfm",
    "web_robots_filter",
    "warc_records",
    # r10 (VERDICT r9 #7 — probe rows for the r9/r10 surfaces): the WET
    # twin (same build+parse shape, no HTTP split), the robots PARSE
    # half (per-domain text -> islands: one domain-keyed explode +
    # window chain over a fixture that grows with the domain universe),
    # and the WAT link sidecar (record parse + pruned from_json +
    # posexplode — map work per file). wet/warc absolute THROUGHPUT in
    # MB/s comes from --warc-mbps below, not these ratio rows.
    "wet_records",
    "web_robots_parse",
    "wat_links",
    # r11: whole-document bin packing — one (len_class, shard) window;
    # replicas multiply rows inside the SAME few classes (token lengths
    # are re-keyed copies), so the probe checks the dominant-class
    # window stays spread by the md5 shard rather than serializing
    "sample_pack_bins",
    # r11 late: winnowing pairs — gram volume grows linearly with docs;
    # replicas re-key the SAME texts so every fingerprint's df
    # multiplies by docs_x and the max_fp_df=8 boilerplate guard
    # engages corpus-wide (the probe measures the guard doing its job:
    # the pair join stays bounded instead of going quadratic in
    # replicas); lang profile is a zero-shuffle expression chain,
    # expected ~linear
    "dedup_winnowing",
    "text_lang_profile",
    # r11 latest: the measured-recall twin re-runs BOTH pair pipelines
    # (exact Jaccard truth + winnowing candidates) so its growth is the
    # max of the two; calibration is one corpus groupBy + 10-cell agg
    # (expected ~linear); filtered ANN assigns only the label-selected
    # slice (~1/10 of the corpus) against the same fixed cells
    "dedup_winnowing_recall",
    "ml_eval_calibration",
    "sim_ivf_filtered_topk",
]


def derive(base: str, out: str, docs_x: int, emb_x: int) -> None:
    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    # replica stride must clear the base id range, or replica r of a low
    # id collides with replica r-1 of a high id — duplicate ids would
    # silently corrupt every dedup/row-ratio the probe reports
    (max_doc,) = con.execute(
        f"SELECT MAX(doc_id) FROM '{base}/documents.parquet'"
    ).fetchone()
    (max_vec,) = con.execute(
        f"SELECT MAX(vec_id) FROM '{base}/embeddings.parquet'"
    ).fetchone()
    doc_stride = max(1_000_000, int(max_doc) + 1)
    vec_stride = max(1_000_000, int(max_vec) + 1)
    con.execute(f"""
      COPY (
        SELECT doc_id + {doc_stride} * r AS doc_id,
               CASE WHEN r = 0 THEN text
                    ELSE text || ' v' || CAST(r AS VARCHAR) END AS text,
               lang, source, n_chars
        FROM '{base}/documents.parquet', range(0, {docs_x}) t(r)
      ) TO '{out}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
      COPY (
        SELECT vec_id + {vec_stride} * r AS vec_id, embedding, label
        FROM '{base}/embeddings.parquet', range(0, {emb_x}) t(r)
      ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
    """)
    (max_ev,) = con.execute(
        f"SELECT MAX(event_id) FROM '{base}/events.parquet'"
    ).fetchone()
    (max_user,) = con.execute(
        f"SELECT MAX(user_id) FROM '{base}/events.parquet'"
    ).fetchone()
    ev_stride = max(10_000_000, int(max_ev) + 1)
    user_stride = max(1_000_000, int(max_user) + 1)
    con.execute(f"""
      COPY (
        SELECT event_id + {ev_stride} * r AS event_id, ts,
               user_id + {user_stride} * r AS user_id,
               event_type, value, props
        FROM '{base}/events.parquet', range(0, {docs_x}) t(r)
      ) TO '{out}/events.parquet' (FORMAT PARQUET)
    """)
    # orders: re-key BOTH the order and the customer population (more
    # customers, not deeper per-customer histories — same honesty rule
    # as events), feeding the cust_rfm probe
    (max_o,) = con.execute(
        f"SELECT MAX(o_orderkey) FROM '{base}/orders.parquet'"
    ).fetchone()
    (max_c,) = con.execute(
        f"SELECT MAX(o_custkey) FROM '{base}/orders.parquet'"
    ).fetchone()
    o_stride = max(10_000_000, int(max_o) + 1)
    c_stride = max(1_000_000, int(max_c) + 1)
    con.execute(f"""
      COPY (
        SELECT * REPLACE (o_orderkey + {o_stride} * r AS o_orderkey,
                          o_custkey + {c_stride} * r AS o_custkey)
        FROM '{base}/orders.parquet', range(0, {docs_x}) t(r)
      ) TO '{out}/orders.parquet' (FORMAT PARQUET)
    """)
    (max_ok,) = con.execute(
        f"SELECT MAX(l_orderkey) FROM '{base}/lineitem.parquet'"
    ).fetchone()
    ok_stride = max(10_000_000, int(max_ok) + 1)
    con.execute(f"""
      COPY (
        SELECT l_orderkey + {ok_stride} * r AS l_orderkey,
               l_partkey, l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag,
               l_linestatus, l_shipdate
        FROM '{base}/lineitem.parquet', range(0, {docs_x}) t(r)
      ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
    """)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sfbig")
    ap.add_argument("--docs-x", type=int, default=10)
    ap.add_argument("--emb-x", type=int, default=4)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated subset of the probe set (default: all)",
    )
    ap.add_argument(
        "--warc-mbps",
        action="store_true",
        help="also measure absolute WARC/WET record-parse throughput "
        "(MB/s aggregate + per-core) on the derived corpus — the "
        "100 TB ingest entry point (VERDICT r9 #7)",
    )
    ap.add_argument(
        "--import-n",
        type=int,
        default=0,
        help="also probe the BAG import path at N vs 10*N addresses "
        "(0 = off); emits an import_bag row like the query rows so "
        "import scaling is a recorded SCALE.md fact (VERDICT r6 #6)",
    )
    args = ap.parse_args()
    if args.reps < 1 or args.docs_x < 1 or args.emb_x < 1:
        ap.error("--reps/--docs-x/--emb-x must all be >= 1")
    selected = QUERIES
    if args.queries:
        selected = [q.strip() for q in args.queries.split(",") if q.strip()]
        unknown = [q for q in selected if q not in QUERIES]
        if unknown:
            ap.error(f"not in the probe set: {unknown}")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bag_parser_spark.plans.catalog import registry
    from bag_parser_spark.session import get_spark, release_cached_blocks

    derive(args.base, args.out, args.docs_x, args.emb_x)
    spark = get_spark(app_name="scale-probe")
    reg = registry()

    def best_time(name: str, sf: str) -> float:
        best = None
        for _ in range(args.reps):
            # full release (CacheManager + checkpoint RDDs): the heavy
            # pair-emitting queries persist/checkpoint internally, and a
            # leftover block would let a later rep read cached state
            release_cached_blocks(spark)
            t0 = time.time()
            reg[name].fn(spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        return best

    for name in selected:
        a = best_time(name, args.base)
        b = best_time(name, args.out)
        rows_a = reg[name].fn(spark, args.base).count()
        rows_b = reg[name].fn(spark, args.out).count()
        print(json.dumps({
            "query": name,
            "base_s": round(a, 3),
            "scaled_s": round(b, 3),
            "time_ratio": round(b / a, 2),
            "rows_ratio": round(rows_b / max(rows_a, 1), 2),
        }), flush=True)

    if args.warc_mbps:
        # Absolute parse throughput for the WARC record parser — THE
        # 100 TB entry point (VERDICT r9 #7). The oracle fixture's
        # ~300-byte records measure task overhead, not parse, so this
        # probe builds REALISTIC records executor-side: ~20 KB
        # hex-of-random bodies (entropy ~4 bits/char, gzip ratio ~2x —
        # the HTML ballpark), 2000 records per ~42 MB file, 32 files
        # ≈ 1.3 GB. Generation is materialized (localCheckpoint)
        # BEFORE timing so the clock sees only binary-frame -> records
        # work; the gzip variant times decompress+parse on the
        # per-record-gzip CommonCrawl layout. MB/s is decompressed
        # record bytes over best-rep wall time on local[N], with a
        # per-core figure for cluster projection.
        from pyspark.sql import functions as F

        from bag_parser_spark.sources import warc as W

        cores = spark.sparkContext.defaultParallelism
        n_files, recs_per_file, body_kb = 32, 2000, 20

        def build_big(pdf):
            import os as _os

            f = int(pdf["f"].iloc[0])
            gz = bool(pdf["gz"].iloc[0])
            recs = []
            for i in range(recs_per_file):
                body = _os.urandom(body_kb * 512).hex().encode()
                recs.append((
                    "response",
                    f"https://h{f}.test/p/{i}",
                    {"Content-Type": "application/http; msgtype=response"},
                    _HTTP_HEADER + body,
                ))
            ext = "warc.gz" if gz else "warc"
            return pd.DataFrame({
                "path": [f"synthetic/{f:02d}.{ext}"],
                "content": [W.build_warc_bytes(recs, per_record_gzip=gz)],
            })

        import pandas as pd

        for variant in ("plain", "gzip"):
            gz = variant == "gzip"
            files = (
                spark.range(n_files).toDF("f")
                .withColumn("gz", F.lit(gz))
                .groupBy("f")
                .applyInPandas(build_big, "path string, content binary")
                .localCheckpoint(eager=True)
            )
            file_b = files.agg(
                F.sum(F.length("content")).alias("b")
            ).collect()[0]["b"]
            record_b = n_files * recs_per_file * (
                body_kb * 1024 + len(_HTTP_HEADER)
            )
            best = None
            for _ in range(args.reps):
                t0 = time.time()
                W.parse_warc_frame(
                    files, record_types=("response",), parse_http=True
                ).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            mbps = record_b / 1e6 / best
            print(json.dumps({
                "query": "warc_parse_throughput",
                "variant": variant,
                "file_mb": round(file_b / 1e6, 1),
                "record_mb": round(record_b / 1e6, 1),
                "sec": round(best, 3),
                "record_mb_per_s": round(mbps, 1),
                "mb_per_s_per_core": round(mbps / cores, 2),
                "cores": cores,
            }), flush=True)
            release_cached_blocks(spark)

    if args.import_n > 0:
        import shutil
        import tempfile

        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)))
        )
        from import_bench import run_import_bench

        work = tempfile.mkdtemp(prefix="bag_import_probe_")
        try:
            release_cached_blocks(spark)
            small = run_import_bench(
                spark, args.import_n, work, reps=args.reps
            )
            release_cached_blocks(spark)
            big = run_import_bench(
                spark, args.import_n * 10, work, reps=args.reps
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)
        print(json.dumps({
            "query": "import_bag",
            "base_s": small["value"],
            "scaled_s": big["value"],
            "time_ratio": round(big["value"] / small["value"], 2),
            "rows_ratio": round(
                big["n_addresses"] / max(small["n_addresses"], 1), 2
            ),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
