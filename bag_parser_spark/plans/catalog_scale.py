"""Catalog extension: scale-pattern queries — sketch-based heavy hitters,
runtime-filter joins, robust outlier detection, distribution drift, and
stream-static enrichment.

These encode the shuffle-avoidance patterns a 100 TB deployment lives by:
bounded-memory per-partition summaries instead of full-key shuffles
(Misra-Gries), runtime min-max pruning of the probe side before a join
(the manual form of Spark's runtime bloom filters / DPP), median-absolute-
deviation outlier flagging whose float math is bit-stable across engines,
token-distribution chi-square drift from integer sufficient statistics,
and the stream-static broadcast join every streaming ingest pipeline runs.

Every query is DuckDB-oracle-backed at value level. Cross-engine float
rules (see operators/aggregates.py): derived doubles come from exact
integer or median statistics through an identical expression tree on both
sides; no cross-row double sums anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bag_parser_spark.operators import sketches, text
from bag_parser_spark.plans import oracles as O
from bag_parser_spark.plans.catalog import register
from bag_parser_spark.sources.parquet import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# A15 — heavy hitters: Misra-Gries candidates + exact verification
# ---------------------------------------------------------------------------

@register(
    "a15_heavy_hitters",
    """
    SELECT user_id, COUNT(*) AS freq
    FROM events WHERE user_id IS NOT NULL
    GROUP BY user_id
    HAVING COUNT(*) * 1000 >= 8 * (SELECT COUNT(*) FROM events
                                   WHERE user_id IS NOT NULL)
    """,
    doc="Heavy hitters (keys with freq >= 0.8% of rows) via per-partition "
    "Misra-Gries summaries (mapInPandas, k=125 counters, O(k) memory, NO "
    "shuffle) + exact verification count over the candidate superset only "
    "— the pigeonhole guarantee makes false negatives impossible, so the "
    "result is exact and the oracle is a plain GROUP BY ... HAVING. At "
    "100 TB this shuffles candidate keys instead of every distinct key; "
    "the threshold compares integers (freq*1000 >= 8*N) so the cut is "
    "bit-exact. See operators/sketches.py for the guarantee proof.",
)
def q_heavy_hitters(spark, sf_dir):
    return sketches.heavy_hitters(
        _t(spark, sf_dir, "events"), "user_id", phi_num=8, phi_den=1000
    )


# ---------------------------------------------------------------------------
# A16 — robust outliers: median absolute deviation (MAD) flagging
# ---------------------------------------------------------------------------

@register(
    "a16_mad_outliers",
    """
    WITH med AS (SELECT o_orderstatus, median(o_totalprice) AS med
                 FROM orders GROUP BY 1),
    j AS (SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice, m.med
          FROM orders o JOIN med m USING(o_orderstatus)),
    mad AS (SELECT o_orderstatus, median(abs(o_totalprice - med)) AS mad
            FROM j GROUP BY 1)
    SELECT j.o_orderkey, j.o_orderstatus, j.o_totalprice, j.med, d.mad
    FROM j JOIN mad d USING(o_orderstatus)
    WHERE abs(j.o_totalprice - j.med) > 2 * d.mad
    """,
    doc="Robust per-group outlier detection: |x - median| > 2*MAD, the "
    "median-based analogue of z-scoring that a mean/stddev rule gets "
    "wrong under heavy tails (the outliers inflate the stddev that is "
    "supposed to catch them). Two grouped exact percentiles with the "
    "group stats broadcast back to the fact — the fact table never "
    "shuffles. Float contract: Spark percentile(_, 0.5) and DuckDB "
    "median interpolate identically (verified bit-exact), and |x-med|, "
    "2*mad are single IEEE ops with identical operand order on both "
    "sides — no cross-row double sums, so no fold-order hazard.",
)
def q_mad_outliers(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    med = o.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("med")
    )
    j = o.join(F.broadcast(med), "o_orderstatus")
    mad = j.groupBy("o_orderstatus").agg(
        F.expr("percentile(abs(o_totalprice - med), 0.5)").alias("mad")
    )
    return (
        j.join(F.broadcast(mad), "o_orderstatus")
        .where(F.abs(F.col("o_totalprice") - F.col("med")) > 2 * F.col("mad"))
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "med", "mad")
    )


# ---------------------------------------------------------------------------
# J12 — runtime min-max filter join (manual runtime-filter / DPP pattern)
# ---------------------------------------------------------------------------

@register(
    "j12_runtime_filter_join",
    """
    SELECT l.l_orderkey, l.l_linenumber, l.l_quantity
    FROM lineitem l
    WHERE l.l_orderkey IN (SELECT o_orderkey FROM orders
                           WHERE o_orderstatus = 'F'
                             AND o_totalprice > 150000)
    """,
    doc="Semi-join with a runtime min-max filter: the build side's "
    "[min,max] key bounds (a 1-row aggregate, broadcast) pre-filter the "
    "probe BEFORE the semi-join — the manual form of Spark's runtime "
    "bloom filter / dynamic partition pruning, written out so the plan "
    "is explicit. On key-clustered or partitioned layouts (see "
    "layout_zorder_key) the between-predicate prunes parquet row groups "
    "at scan time, so at 100 TB the probe reads a key-range slice "
    "instead of the full fact table; on unclustered keys it degrades to "
    "a no-op filter, never to wrong answers. The residual semi-join "
    "broadcasts the build keys, so the probe never shuffles.",
)
def q_runtime_filter_join(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000)
    )
    keys = o.select("o_orderkey")
    bounds = keys.agg(
        F.min("o_orderkey").alias("__kmin__"),
        F.max("o_orderkey").alias("__kmax__"),
    )
    probe = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .crossJoin(F.broadcast(bounds))
        .where(F.col("l_orderkey").between(F.col("__kmin__"), F.col("__kmax__")))
        .drop("__kmin__", "__kmax__")
    )
    return probe.join(
        F.broadcast(keys),
        probe["l_orderkey"] == keys["o_orderkey"],
        "left_semi",
    )


# ---------------------------------------------------------------------------
# text drift — per-token chi-square between two sources
# ---------------------------------------------------------------------------

_DRIFT_SQL = f"""
    WITH toks AS (
      SELECT source, unnest({O.words_sql('lower(text)')}) AS token
      FROM documents WHERE source IN ('src0', 'src1')
    ),
    counts AS (
      SELECT token,
             CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)
                  AS BIGINT) AS b
      FROM toks GROUP BY token
    ),
    tot AS (SELECT CAST(SUM(a) AS BIGINT) AS na,
                   CAST(SUM(b) AS BIGINT) AS nb FROM counts)
    SELECT token, a, b,
           (CAST(a AS DOUBLE) - ea) * (CAST(a AS DOUBLE) - ea) / ea
           + (CAST(b AS DOUBLE) - eb) * (CAST(b AS DOUBLE) - eb) / eb
           AS chi2
    FROM (
      SELECT token, a, b,
             (CAST(a AS DOUBLE) + CAST(b AS DOUBLE)) * CAST(na AS DOUBLE)
               / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)) AS ea,
             (CAST(a AS DOUBLE) + CAST(b AS DOUBLE)) * CAST(nb AS DOUBLE)
               / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)) AS eb
      FROM counts, tot WHERE a + b >= 20
    )
"""


@register(
    "text_source_drift",
    _DRIFT_SQL,
    doc="Token-distribution drift between two corpus slices: per-token "
    "2x2 chi-square statistic (observed vs expected under homogeneity) "
    "over tokens with >= 20 total occurrences. The data-quality gate a "
    "training pipeline runs when a new source or dump lands — which "
    "tokens shifted, and by how much. One token groupBy (map-side "
    "partial agg) + a broadcast 1-row total; the chi-square is computed "
    "PER ROW from integer counts through an identical expression tree "
    "on both engines — no cross-row float accumulation, so the doubles "
    "hash-match bit-exactly despite being 'statistics'.",
)
def q_source_drift(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").where(
        F.col("source").isin("src0", "src1")
    )
    toks = d.select(
        "source",
        F.explode(text.tokens(F.lower(F.col("text")))).alias("token"),
    )
    counts = toks.groupBy("token").agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when(F.col("source") == "src1", 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
    )
    totals = counts.agg(
        F.sum("a").cast("bigint").alias("na"),
        F.sum("b").cast("bigint").alias("nb"),
    )
    ad, bd = F.col("a").cast("double"), F.col("b").cast("double")
    nad, nbd = F.col("na").cast("double"), F.col("nb").cast("double")
    ea = (ad + bd) * nad / (nad + nbd)
    eb = (ad + bd) * nbd / (nad + nbd)
    c = (
        counts.where(F.col("a") + F.col("b") >= 20)
        .crossJoin(F.broadcast(totals))
        .withColumn("__ea__", ea)
        .withColumn("__eb__", eb)
    )
    chi2 = (ad - F.col("__ea__")) * (ad - F.col("__ea__")) / F.col("__ea__") + (
        bd - F.col("__eb__")
    ) * (bd - F.col("__eb__")) / F.col("__eb__")
    return c.select("token", "a", "b", chi2.alias("chi2"))


# ---------------------------------------------------------------------------
# stream-static enrichment — batch twin of streaming/events.py
# ---------------------------------------------------------------------------

@register(
    "events_stream_enrich",
    """
    SELECT e.event_id, e.user_id, e.event_type, e.value,
           c.c_name, n.n_name AS nation_name
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    """,
    doc="Stream-static enrichment join — the batch twin of "
    "streaming/events.py:enrich_events_stream (same dims, same broadcast "
    "plan, parity-tested against the drained stream). The canonical "
    "streaming-ingest shape: a fact firehose enriched against static "
    "dims per micro-batch, stateless (no watermark/state store), fact "
    "side never shuffles.",
)
def q_stream_enrich_batch(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        e.join(F.broadcast(c), e["user_id"] == c["c_custkey"])
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            "c_name",
            F.col("n_name").alias("nation_name"),
        )
    )
