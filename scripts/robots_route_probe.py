#!/usr/bin/env python
"""Measured evidence for the apply_robots route guard (SCALE.md r9):
time the broadcast route against the shuffle fallback on a synthetic
politeness table big enough that the trade is visible locally —
``--domains`` distinct hosts x 3 rules each (one wildcard, so the
compiled-pattern column is exercised), ``--pages`` corpus rows spread
over those hosts. Prints one JSON line per route with the timing and
the per-route allowed-count (identical by construction — the
route-identity unit test pins byte equality on the small fixture; this
probe pins the COST shape at size).

Usage: python scripts/robots_route_probe.py [--domains 200000]
    [--pages 2000000] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--domains", type=int, default=200_000)
    ap.add_argument("--pages", type=int, default=2_000_000)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import functions as F

    from bag_parser_spark.operators import urls
    from bag_parser_spark.session import get_spark, release_cached_blocks

    spark = get_spark(app_name="robots-route-probe")
    dom = F.concat(F.lit("d"), F.col("id").cast("string"), F.lit(".test"))
    rules = (
        spark.range(args.domains)
        .select(
            dom.alias("domain"),
            F.explode(
                F.array(
                    F.struct(
                        F.lit("disallow").alias("rule_type"),
                        F.lit("/p/").alias("path_prefix"),
                    ),
                    F.struct(
                        F.lit("allow").alias("rule_type"),
                        F.concat(
                            F.lit("/p/"), (F.col("id") % 10).cast("string")
                        ).alias("path_prefix"),
                    ),
                    F.struct(
                        F.lit("disallow").alias("rule_type"),
                        F.lit("/tmp/*.php$").alias("path_prefix"),
                    ),
                )
            ).alias("r"),
        )
        .select("domain", "r.rule_type", "r.path_prefix")
    )
    pages = spark.range(args.pages).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("d"),
            (F.col("id") % args.domains).cast("string"),
            F.lit(".test"),
        ).alias("hostname"),
        F.concat(F.lit("/p/"), (F.col("id") % 100).cast("string")).alias(
            "npath"
        ),
    )
    for route, limit in (("broadcast", None), ("shuffle", 0)):
        best = None
        n_allowed = None
        for _ in range(args.reps):
            release_cached_blocks(spark)
            t0 = time.time()
            out = urls.apply_robots(
                pages, rules, broadcast_domain_limit=limit
            )
            n_allowed = (
                out.agg(
                    F.sum(F.col("allowed").cast("long")).alias("n")
                ).first()["n"]
            )
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        print(
            json.dumps(
                {
                    "route": route,
                    "domains": args.domains,
                    "pages": args.pages,
                    "sec": round(best, 3),
                    "n_allowed": int(n_allowed),
                }
            ),
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
