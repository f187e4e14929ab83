"""Bounded-memory summary operators: distributed Misra-Gries heavy
hitters with exact verification.

Extension surface — the reference has no sketches; its closest shape is
the running-counter battery (reference bag_parser.py counters, SURVEY
§2.5 A6), which is driver-side and exact. This module gives the
distributed analogue for the question those counters cannot answer at
corpus scale: "which keys exceed a frequency threshold?" without
shuffling every distinct key.

Scale design (the reason this is not just a GROUP BY):

1. Per-partition Misra-Gries summaries via ``mapInPandas`` — k counters,
   O(k) memory regardless of partition size or distinct-key count, one
   sequential pass, NO shuffle. Pigeonhole guarantee: any key with global
   count > N/k has partition count > N_p/k in at least one partition
   (if count_p <= N_p/k in every partition, summing gives count <= N/k),
   and Misra-Gries with k counters retains every key whose partition
   count exceeds N_p/k — so the union of the partition summaries is a
   SUPERSET of the true phi-heavy hitters whenever k >= 1/phi. No false
   negatives, ever; false positives only cost verification work.
2. Exact verification: a broadcast semi-join restricts the corpus to the
   candidate keys (at most k per partition), then an exact count keeps
   keys with freq >= phi*N. The threshold compares integers
   (freq * phi_den >= n * phi_num) so the cut is bit-exact and the
   DuckDB oracle (plain GROUP BY ... HAVING) matches by construction.

At 100 TB the full-key GROUP BY shuffles billions of distinct keys to
find the dozen heavy ones; this shape shuffles only candidates. The
Python hot loop is per-partition and Arrow-batched — it touches each row
once with dict ops, and is the textbook case where mapInPandas earns its
keep over an unshuffled SQL rewrite (Misra-Gries is inherently
sequential state).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def misra_gries_candidates(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: one output row per surviving
    counter per partition (so <= k rows per partition). Null keys must be
    filtered upstream — NaN never equals itself as a dict key."""
    schema = T.StructType([df.schema[key_col]])

    def fn(batches):
        counters: dict = {}
        for pdf in batches:
            for v in pdf[key_col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    dead = []
                    for c in counters:
                        counters[c] -= 1
                        if counters[c] == 0:
                            dead.append(c)
                    for c in dead:
                        del counters[c]
        if counters:
            yield pd.DataFrame({key_col: list(counters.keys())})

    return df.select(key_col).mapInPandas(fn, schema)


def heavy_hitters(
    df: DataFrame, key_col: str, phi_num: int, phi_den: int
) -> DataFrame:
    """All keys with frequency >= (phi_num/phi_den) * N, exactly — via
    Misra-Gries candidates (k = ceil(phi_den/phi_num) counters, which
    makes the candidate set a guaranteed superset) + exact verification
    count over the candidates only. Returns (key_col, freq)."""
    k = -(-phi_den // phi_num)  # ceil(1/phi)
    src = df.where(F.col(key_col).isNotNull())
    cands = misra_gries_candidates(src, key_col, k).distinct()
    total = src.agg(F.count(F.lit(1)).alias("__n__"))
    return (
        src.join(F.broadcast(cands), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("freq"))
        .crossJoin(F.broadcast(total))
        .where(F.col("freq") * phi_den >= F.col("__n__") * phi_num)
        .select(key_col, "freq")
    )
