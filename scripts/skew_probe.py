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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sfskew")
    ap.add_argument("--skew-pct", type=int, default=20)
    ap.add_argument("--emb-x", type=int, default=4)
    ap.add_argument("--reps", type=int, default=2)
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
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
