#!/usr/bin/env python
"""Skew probe: time the guarded pair-expansion operators on a
DELIBERATELY identity-collapsed input — the failure mode SCALE.md
documents (one viral template / replicated image concentrates a
quadratic expansion in one task) — with the guard OFF vs ON.

Derivation (duckdb, from --base): embeddings where ``--skew-pct``
percent of vectors are EXACT copies of vector 0. Vector 0 is a
centroid (vec_id % 50 = 0), so every copy lands in its cell: one giant
semantic cell holding skew-pct of the corpus.

Measured: ``semantic_dedup_pairs`` wall time with the salted route
disabled (big_cell_cutoff=inf — the pre-r6 shape) vs enabled
(cutoff=1000, salt=32), plus an output-equality check. Prints one JSON
line per measurement.

Usage:
  python scripts/skew_probe.py [--base /root/testdata/sf0.1]
      [--out /tmp/sfskew] [--skew-pct 20] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def derive(base: str, out: str, skew_pct: int, emb_x: int) -> None:
    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    (max_vec,) = con.execute(
        f"SELECT MAX(vec_id) FROM '{base}/embeddings.parquet'"
    ).fetchone()
    # stride must be a multiple of 100 (lcm of the %50 centroid pattern
    # and the %100 skew pattern): replica ids then preserve both, so
    # every copy keeps landing in the SAME giant cell — otherwise a base
    # with max_vec+1 not divisible by 100 silently measures a milder,
    # multi-cell workload
    stride = max(1_000_000, int(max_vec) + 1)
    stride = ((stride + 99) // 100) * 100
    con.execute(f"""
      COPY (
        SELECT e.vec_id + {stride} * r AS vec_id,
               CASE WHEN e.vec_id % 100 < {skew_pct}
                         AND (e.vec_id <> 0 OR r > 0)
                    THEN (SELECT embedding FROM
                          '{base}/embeddings.parquet' WHERE vec_id = 0)
                    ELSE e.embedding END AS embedding,
               e.label
        FROM '{base}/embeddings.parquet' e, range(0, {emb_x}) t(r)
      ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
    """)


def cap_probe(
    spark, n_rows: int, skew_pct: int, reps: int, verify: bool = False
) -> None:
    """Per-domain-cap skew probe (r7): one viral domain holds
    ``skew_pct``% of ``n_rows`` synthetic docs; time
    ``sample_per_group(k=5)`` with the plain single window vs the
    ``salted=True`` two-stage route. Finding recorded in SCALE.md: the
    plain route is skew-flat because Catalyst's map-side Partial
    WindowGroupLimit pre-limits every group to k rows per map
    partition — the salted route (and the count-routed guard it
    replaced) only ADD cost for row_number ranks. Each arm prints its
    own JSON line as it completes, so one straggling arm never hides
    the other arm's number.
    Output identity between the routes is pinned by
    ``tests/test_extensions.py::test_sample_per_group_salted_route_is_
    output_identical``; pass ``verify=True`` to also re-check it here
    (two extra full exceptAll passes). Input is generated in-memory via
    spark.range — the probe measures the window shuffle, not a scan."""
    import time as _t

    from pyspark.sql import functions as F

    from bag_parser_spark.operators import sampling
    from bag_parser_spark.session import release_cached_blocks

    df = spark.range(n_rows).select(
        F.col("id"),
        F.when(F.col("id") % 100 < skew_pct, F.lit("viral.com"))
        .otherwise(F.concat(F.lit("d"), (F.col("id") % 200_000)))
        .alias("registered_domain"),
    )

    def run(arm: str, **extra) -> float:
        times = []
        for _ in range(reps):
            release_cached_blocks(spark)
            t0 = _t.time()
            sampling.sample_per_group(
                df, keys=["registered_domain"], id_col="id", k=5,
                seed="capskew", **extra,
            ).write.format("noop").mode("overwrite").save()
            times.append(_t.time() - t0)
        print(json.dumps({
            "probe": "per_domain_cap_giant_group",
            "arm": arm,
            "n_rows": n_rows,
            "skew_pct": skew_pct,
            "sec_min": round(min(times), 3),
            "sec_all": [round(t, 3) for t in times],
        }), flush=True)
        return min(times)

    guarded = run("salted", salted=True, salt=32)
    plain = run("plain")
    out = {
        "probe": "per_domain_cap_giant_group",
        "arm": "summary",
        "n_rows": n_rows,
        "skew_pct": skew_pct,
        "plain_s": round(plain, 3),
        "salted_s": round(guarded, 3),
        "salted_speedup": round(plain / guarded, 2),
    }
    if verify:
        a = sampling.sample_per_group(
            df, keys=["registered_domain"], id_col="id", k=5, seed="capskew"
        )
        b = sampling.sample_per_group(
            df, keys=["registered_domain"], id_col="id", k=5, seed="capskew",
            salted=True, salt=32,
        )
        out["rows_equal"] = (
            a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
        )
    print(json.dumps(out), flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sfskew")
    ap.add_argument("--skew-pct", type=int, default=20)
    ap.add_argument("--emb-x", type=int, default=4)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--cap-rows",
        type=int,
        default=0,
        help="also run the per-domain-cap skew probe on N synthetic "
        "rows (0 = off); emits a per_domain_cap_giant_group JSON line",
    )
    ap.add_argument(
        "--cap-only",
        action="store_true",
        help="run ONLY the cap probe (skips the semantic-dedup probe "
        "and its corpus derivation)",
    )
    ap.add_argument(
        "--cap-verify",
        action="store_true",
        help="also re-check plain/salted output identity inside the cap "
        "probe (two full exceptAll passes; identity is already pinned "
        "by unit test)",
    )
    args = ap.parse_args()
    if not 0 < args.skew_pct <= 100 or args.reps < 1 or args.emb_x < 1:
        ap.error("need 0 < --skew-pct <= 100, --reps >= 1, --emb-x >= 1")

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import functions as F

    from bag_parser_spark.operators import similarity
    from bag_parser_spark.session import get_spark, release_cached_blocks
    from bag_parser_spark.sources.parquet import load_table

    if args.cap_only:
        spark = get_spark(app_name="skew-probe")
        cap_probe(
            spark, args.cap_rows or 20_000_000, args.skew_pct, args.reps,
            verify=args.cap_verify,
        )
        return 0

    derive(args.base, args.out, args.skew_pct, args.emb_x)
    spark = get_spark(app_name="skew-probe")
    e = load_table(spark, args.out, "embeddings")
    cents = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    kw = dict(
        id_col="vec_id", vec_col="embedding",
        centroids=cents, threshold=0.35,
    )

    def run(tag: str, **extra) -> float:
        best = None
        for _ in range(args.reps):
            release_cached_blocks(spark)
            t0 = time.time()
            similarity.semantic_dedup_pairs(e, **kw, **extra).write.format(
                "noop"
            ).mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        return best

    unsalted = run("unsalted", big_cell_cutoff=10**12)
    salted = run("salted", big_cell_cutoff=1000, salt=32)
    release_cached_blocks(spark)
    n_un = similarity.semantic_dedup_pairs(
        e, **kw, big_cell_cutoff=10**12
    ).count()
    release_cached_blocks(spark)
    n_sa = similarity.semantic_dedup_pairs(
        e, **kw, big_cell_cutoff=1000, salt=32
    ).count()
    print(json.dumps({
        "probe": "semantic_dedup_giant_cell",
        "skew_pct": args.skew_pct,
        "unsalted_s": round(unsalted, 3),
        "salted_s": round(salted, 3),
        "speedup": round(unsalted / salted, 2),
        "rows_unsalted": n_un,
        "rows_salted": n_sa,
        "rows_equal": n_un == n_sa,
    }), flush=True)
    if args.cap_rows > 0:
        cap_probe(spark, args.cap_rows, args.skew_pct, args.reps, verify=args.cap_verify)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
