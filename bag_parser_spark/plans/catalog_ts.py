"""Extension catalog, part 2: time-series operators (as-of join, ordered
window batteries, per-key top-k) and corpus-curation additions (boilerplate
line removal, repetition metrics, deterministic global shuffle, quantile
band filter). Same oracle-checked registry as the parity catalog.

The reference engine has no event-time surface at all (SURVEY.md section
2.5: zero window functions used); these operators extend the engine the
way a training-data/event pipeline needs, each with a DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bag_parser_spark.operators import sampling, text, timeseries
from bag_parser_spark.plans.catalog import register
from bag_parser_spark.sources.parquet import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Time-series family
# ---------------------------------------------------------------------------

@register(
    "ts_asof_join",
    """
    WITH l AS (
      SELECT event_id, user_id, ts, value
      FROM events WHERE event_type = 'error'
    ),
    r AS (
      SELECT user_id, ts,
             max_by(value, event_id) AS r_value,
             MAX(event_id) AS r_event_id
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    )
    SELECT l.event_id, l.user_id, l.ts, l.value,
           r.ts AS matched_ts,
           r.r_value AS matched_value,
           r.r_event_id AS matched_event_id
    FROM l ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    doc="As-of join: each 'error' event matched to the most recent "
    "'purchase' at-or-before it for the same user (backward inclusive — "
    "DuckDB ASOF LEFT JOIN semantics). Spark has no ASOF physical op; the "
    "implementation is the union + ordered-window carry-forward — one "
    "shuffle on user_id, no range-join pair explosion (operators/"
    "timeseries.py:asof_join). Right side deduped last-write-wins per "
    "(user, ts) so ties are deterministic in both engines.",
)
def q_asof(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    l = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts", "value"
    )
    r = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max_by("value", "event_id").alias("r_value"),
            F.max("event_id").alias("r_event_id"),
        )
    )
    out = timeseries.asof_join(
        l, r, on="user_id", right_payload=["r_value", "r_event_id"]
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        "matched_ts",
        F.col("matched_r_value").alias("matched_value"),
        F.col("matched_r_event_id").alias("matched_event_id"),
    )


@register(
    "ts_asof_tolerance",
    """
    WITH l AS (
      SELECT event_id, user_id, ts, value
      FROM events WHERE event_type = 'error'
    ),
    r AS (
      SELECT user_id, ts,
             max_by(value, event_id) AS r_value,
             MAX(event_id) AS r_event_id
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    ),
    j AS (
      SELECT l.event_id, l.user_id, l.ts, l.value,
             r.ts AS m_ts, r.r_value AS m_value, r.r_event_id AS m_event_id
      FROM l ASOF LEFT JOIN r
        ON l.user_id = r.user_id AND l.ts >= r.ts
    )
    SELECT event_id, user_id, ts, value,
           CASE WHEN m_ts >= ts - INTERVAL 6 HOUR THEN m_ts END
             AS matched_ts,
           CASE WHEN m_ts >= ts - INTERVAL 6 HOUR THEN m_value END
             AS matched_value,
           CASE WHEN m_ts >= ts - INTERVAL 6 HOUR THEN m_event_id END
             AS matched_event_id
    FROM j
    """,
    doc="As-of join with a staleness tolerance (pandas merge_asof "
    "`tolerance`, kdb wj window bound): the backward match only counts "
    "if the matched row is at most 6 hours old — older state is treated "
    "as missing, which is the correct semantics for joining slowly-"
    "arriving reference data (a quote matched to a trade from last week "
    "is worse than no match). Same single-shuffle union + ordered-"
    "window carry-forward as ts_asof_join with a pure-projection "
    "timestamp-interval guard on top (NULL propagates through the "
    "comparison, so never-matched rows stay NULL) — tolerance costs "
    "nothing extra at any scale.",
)
def q_asof_tolerance(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    l = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts", "value"
    )
    r = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max_by("value", "event_id").alias("r_value"),
            F.max("event_id").alias("r_event_id"),
        )
    )
    out = timeseries.asof_join(
        l, r, on="user_id", right_payload=["r_value", "r_event_id"]
    )
    fresh = F.col("matched_ts") >= F.col("ts") - F.expr("INTERVAL 6 HOUR")
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.when(fresh, F.col("matched_ts")).alias("matched_ts"),
        F.when(fresh, F.col("matched_r_value")).alias("matched_value"),
        F.when(fresh, F.col("matched_r_event_id")).alias("matched_event_id"),
    )


@register(
    "ts_window_battery",
    """
    SELECT user_id, ts, event_id, value,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS running_cents,
           LAG(value) OVER w AS prev_value,
           date_diff('microsecond', LAG(ts) OVER w, ts) AS gap_us,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="Per-user ordered window battery in one pass: row_number, running "
    "sum, lag carry, inter-event gap, ntile — one shuffle on user_id, one "
    "sort (operators/timeseries.py:running_battery). Running sum is over "
    "integer cents: DuckDB's windowed SUM uses a segment tree whose float "
    "addition order differs from Spark's sequential fold, so a DOUBLE "
    "running sum is not cross-engine bit-stable; integers are "
    "associativity-proof. Gaps in unix micros (exact BIGINT) for the same "
    "reason.",
)
def q_battery(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return timeseries.running_battery(
        ev, key="user_id", ts="ts", tiebreak="event_id", value="value"
    )


@register(
    "ts_topk_per_user",
    """
    SELECT * FROM (
      SELECT user_id, event_id, ts, value,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY value DESC, event_id
             ) AS BIGINT) AS rn
      FROM events WHERE event_type = 'click'
    ) WHERE rn <= 3
    """,
    doc="Deterministic top-3 events by value per user (O2/O3 generalized "
    "per group): rank-within-partition + filter; Spark turns the rn<=k "
    "filter into a per-partition rank limit, so no task holds more than "
    "its own group's rows (operators/timeseries.py:topk_per_key).",
)
def q_topk_user(spark, sf_dir):
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select("user_id", "event_id", "ts", "value")
    )
    return timeseries.topk_per_key(
        ev, key="user_id", order_col="value", tiebreak="event_id", k=3
    )


# ---------------------------------------------------------------------------
# Corpus-curation additions
# ---------------------------------------------------------------------------

_BP_FRAC = 0.5

@register(
    "text_boilerplate_removal",
    f"""
    WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
    l AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS line,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ),
    linedf AS (
      SELECT line, COUNT(DISTINCT doc_id) AS line_df FROM l GROUP BY line
    ),
    hot AS (
      SELECT line FROM linedf, n WHERE line_df > {_BP_FRAC} * n_docs
    ),
    k AS (
      SELECT l.doc_id, l.pos, l.line, h.line IS NULL AS keep
      FROM l LEFT JOIN hot h ON l.line = h.line
    )
    SELECT doc_id,
           COALESCE(
             string_agg(CASE WHEN keep THEN line END, ' ' ORDER BY pos), ''
           ) AS clean_text,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed
    FROM k GROUP BY doc_id
    """,
    doc="CCNet/RefinedWeb-style boilerplate removal: drop every line "
    "(here: word — the synthetic docs are single-line) occurring in more "
    "than 50% of documents, preserving surviving-line order; fully-"
    "boilerplate docs survive as ''. Line doc-frequencies shuffle line "
    "hashes only; the hot set broadcasts back; reassembly is bounded by "
    "per-DOC line count, never corpus size (operators/text.py:"
    "remove_common_lines).",
)
def q_boilerplate(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return text.remove_common_lines(
        d, id_col="doc_id", text_col="text", sep=" ", max_df_frac=_BP_FRAC
    )


@register(
    "text_repetition_metrics",
    """
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    wc AS (SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY doc_id, word),
    stats AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
             COUNT(*) AS n_distinct, MAX(c) AS top_c
      FROM wc GROUP BY doc_id
    ),
    bg AS (
      SELECT doc_id,
             CASE WHEN len(ws) >= 2 THEN round(
               1.0 - CAST(len(list_distinct(
                 list_transform(range(1, len(ws)),
                                i -> ws[i] || ' ' || ws[i + 1])
               )) AS DOUBLE) / CAST(len(ws) - 1 AS DOUBLE), 6)
             ELSE 0.0 END AS dup_2gram_frac
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    )
    SELECT s.doc_id, s.n_words, s.n_distinct,
           round(1.0 - CAST(s.n_distinct AS DOUBLE)
                 / CAST(s.n_words AS DOUBLE), 6) AS dup_word_frac,
           round(CAST(s.top_c AS DOUBLE)
                 / CAST(s.n_words AS DOUBLE), 6) AS top_word_frac,
           bg.dup_2gram_frac
    FROM stats s JOIN bg ON s.doc_id = bg.doc_id
    """,
    doc="Gopher/MassiveText repetition signals per doc: duplicate-word "
    "fraction, top-word fraction, duplicate-bigram fraction. Word stats "
    "via explode + two keyed aggregates (map-side combine, robust to "
    "arbitrarily long docs); bigram fraction is map-only array arithmetic "
    "(operators/text.py:repetition_metrics).",
)
def q_repetition(spark, sf_dir):
    return text.repetition_metrics(_t(spark, sf_dir, "documents"))


@register(
    "sample_global_shuffle",
    """
    SELECT doc_id, source,
           CAST(ROW_NUMBER() OVER (
             ORDER BY md5('s3:' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS shuffle_pos
    FROM documents
    """,
    doc="Deterministic global training-data shuffle: exact rank under a "
    "seeded md5 permutation. The oracle states the single-window form; the "
    "Spark plan is the two-pass distributed equivalent — 256 hash-prefix "
    "range buckets, per-bucket counts -> running offsets (256-row window), "
    "offset broadcast + per-bucket row_number — identical output, no "
    "single-partition sort (operators/sampling.py:global_shuffle_rank).",
)
def q_global_shuffle(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return sampling.global_shuffle_rank(d, id_col="doc_id", seed="s3")


@register(
    "quality_quantile_band",
    """
    WITH b AS (
      SELECT quantile_cont(n_chars, 0.05) AS lo,
             quantile_cont(n_chars, 0.95) AS hi
      FROM documents
    )
    SELECT doc_id, n_chars,
           round(lo, 6) AS band_lo, round(hi, 6) AS band_hi
    FROM documents, b
    WHERE n_chars >= lo AND n_chars <= hi
    """,
    doc="Quantile-calibrated outlier filter: keep docs inside the corpus's "
    "[p05, p95] n_chars band. Bounds via Spark's exact percentile "
    "aggregate (distributed partials, no global sort) broadcast back as a "
    "1-row crossJoin; approx_percentile is the documented 100 TB drop-in "
    "(operators/sampling.py:quantile_band_filter).",
)
def q_quantile_band(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return sampling.quantile_band_filter(d, "n_chars", 0.05, 0.95)


# ---------------------------------------------------------------------------
# Skew-mitigated join, SCD2 history, interval join, approx-quantile battery
# ---------------------------------------------------------------------------

@register(
    "j10_salted_skew_join",
    """
    WITH dim AS (
      SELECT source, COUNT(*) AS src_docs, CAST(AVG(n_chars) AS DOUBLE)
             AS src_avg_chars
      FROM documents GROUP BY source
    )
    SELECT d.doc_id, d.source, d.n_chars, dim.src_docs, dim.src_avg_chars
    FROM documents d JOIN dim ON d.source = dim.source
    """,
    doc="Skew-mitigated equi-join: documents (5 distinct source values -- "
    "extreme key skew by construction) joined to a per-source dim through "
    "operators/joins.py:salted_join, which scatters each hot key over 16 "
    "sub-keys and replicates the dim side 16x. The oracle is the PLAIN "
    "join: salting changes partition layout, never results. At corpus "
    "scale this is the fix for the tail where one key exceeds an executor "
    "(AQE skew-join covers the moderate middle).",
)
def q_salted_join(spark, sf_dir):
    from bag_parser_spark.operators import joins

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    dim = d.groupBy("source").agg(
        F.count("*").alias("src_docs"),
        F.avg("n_chars").alias("src_avg_chars"),
    )
    return joins.salted_join(
        d, dim, on="source", salt=16, salt_source="doc_id"
    )


@register(
    "ts_scd2_intervals",
    """
    SELECT user_id, event_id, value,
           ts AS valid_from,
           LEAD(ts) OVER w AS valid_to,
           LEAD(ts) OVER w IS NULL AS is_current
    FROM events WHERE event_type = 'signup'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="SCD2 history build: the 'signup' change log becomes validity "
    "intervals (valid_from/valid_to/is_current) via one lead() window per "
    "key — the standard warehouse dimension-history pass, linear in the "
    "log, shuffle on user_id only (operators/timeseries.py:"
    "scd2_intervals). Equal-ts changes tiebreak on event_id.",
)
def q_scd2(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type") == "signup"
    )
    return timeseries.scd2_intervals(
        ev, key="user_id", change_ts="ts", tiebreak="event_id",
        attrs=["value"],
    )


@register(
    "ts_interval_join",
    """
    SELECT l.event_id, l.user_id, l.ts,
           r.ts AS r_ts, r.event_id AS r_event_id, r.value AS r_value
    FROM (SELECT * FROM events WHERE event_type = 'error') l
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id
     AND date_diff('microsecond', r.ts, l.ts) >= 0
     AND date_diff('microsecond', r.ts, l.ts) < 600000000
    """,
    doc="Event-time interval join: every purchase within the 10 minutes "
    "before each error, per user — the batch twin of a stream-stream "
    "range join (the streaming form with watermarks is parity-tested in "
    "tests/test_streaming.py). Equi-join on user_id carries the range "
    "predicate as exact integer-microsecond arithmetic "
    "(operators/timeseries.py:interval_join).",
)
def q_interval_join(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    l = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    r = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    return timeseries.interval_join(
        l, r, on="user_id", max_lag_s=600,
        right_payload=["event_id", "value"],
    )


@register(
    "a8_approx_quantiles",
    """
    SELECT source,
           quantile_cont(n_chars, 0.5) AS median_chars,
           TRUE AS approx_within_tol
    FROM documents GROUP BY source
    """,
    doc="Grouped quantile battery with sketch validation: exact per-source "
    "median (distributed percentile aggregate) plus a boolean asserting "
    "Spark's approx_percentile sketch lands within 5% relative tolerance "
    "— the a7 pattern applied to quantiles. The oracle pins the exact "
    "median and TRUE; at 100 TB the sketch (t-digest-style, mergeable "
    "partials) replaces the exact aggregate wholesale.",
)
def q_a8(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    out = d.groupBy("source").agg(
        F.expr("percentile(n_chars, 0.5)").alias("median_chars"),
        F.expr("approx_percentile(n_chars, 0.5, 10000)").alias("__ap__"),
    )
    tol = F.abs(F.col("__ap__") - F.col("median_chars")) <= (
        F.lit(0.05) * F.abs(F.col("median_chars"))
    )
    return out.select(
        "source", "median_chars", tol.alias("approx_within_tol")
    )


@register(
    "ts_gapfill",
    """
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket,
             COUNT(*) AS n_events, MAX(value) AS max_value
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT user_id, MIN(bucket) AS b0, MAX(bucket) AS b1
      FROM hourly GROUP BY 1
    ),
    spine AS (
      SELECT user_id, UNNEST(generate_series(b0, b1, INTERVAL 1 HOUR))
               AS bucket
      FROM bounds
    )
    SELECT s.user_id, s.bucket,
           COALESCE(h.n_events, 0) AS n_events,
           LAST_VALUE(h.max_value IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS ffill_max_value
    FROM spine s LEFT JOIN hourly h
      ON s.user_id = h.user_id AND s.bucket = h.bucket
    """,
    doc="Hypertable rollup with gap fill + forward fill (time_bucket + "
    "locf): hourly per-user buckets, EVERY hour between each user's first "
    "and last event materialized (empty hours at n_events=0), last "
    "observed value carried across gaps via last(ignorenulls) "
    "(operators/timeseries.py:gapfill_resample). Spine width is bounded "
    "by time-span/step — independent of event count, so a hot key with "
    "10^9 events still yields span/step rows. Per-bucket stat is MAX "
    "(order-independent) — a float avg could never hash-match across "
    "engines.",
)
def q_gapfill(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return timeseries.gapfill_resample(
        ev, key="user_id", ts_col="ts", value_col="value", step="1 hour"
    )


@register(
    "events_sliding_distinct",
    """
    WITH e AS (
      SELECT user_id, ts,
             make_timestamp(CAST(floor(epoch(ts) / 1800) * 1800
                                 * 1000000 AS BIGINT)) AS b
      FROM events
    ),
    x AS (
      SELECT user_id, ts,
             unnest([b, b - INTERVAL 30 MINUTE]) AS window_start
      FROM e
    )
    SELECT window_start,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           TRUE AS approx_ok
    FROM x
    WHERE ts >= window_start
      AND ts < window_start + INTERVAL 1 HOUR
    GROUP BY window_start
    """,
    doc="Sliding-window distinct users: 1-hour windows sliding every 30 "
    "minutes (each event lands in exactly two windows — Spark's window() "
    "plans this as a 2-way Expand before ONE aggregate, not a self-union) "
    "with exact per-window distinct users plus a boolean pinning "
    "approx_count_distinct (HLL++, mergeable sketch) within 5% of exact "
    "— the a7 validation pattern. At 100 TB the exact distinct is the "
    "expensive half (full shuffle of (window, user) pairs); the sketch "
    "column is the scale path, and windows are the streaming twin of "
    "readStream + window(ts, '1 hour', '30 minutes').",
)
def q_sliding_distinct(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = ev.groupBy(
        F.window("ts", "1 hour", "30 minutes").alias("w")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        F.approx_count_distinct("user_id", 0.01).alias("__ad__"),
    )
    # small windows: HLL's relative guarantee is meaningless at n~10, so
    # the bound is max(absolute 2, 5% relative) — tight where it matters
    ok = F.abs(F.col("__ad__") - F.col("n_users")) <= F.greatest(
        F.lit(2.0), F.lit(0.05) * F.col("n_users")
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        "n_events",
        "n_users",
        ok.alias("approx_ok"),
    )


@register(
    "ts_ohlc_bars",
    """
    WITH keyed AS (
      SELECT event_type, date_trunc('hour', ts) AS bar_start, value,
             lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || '|' ||
             lpad(CAST(event_id AS VARCHAR), 20, '0') AS ok
      FROM events
    )
    SELECT event_type, bar_start,
           arg_min(value, ok) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, ok) AS close,
           COUNT(*) AS n_events,
           round(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 6)
             AS volume
    FROM keyed
    GROUP BY event_type, bar_start
    """,
    doc="OHLC candlestick resampling per (event_type, hour): open/close "
    "are min_by/max_by over a zero-padded (epoch-micros, event_id) sort "
    "key — deterministic under timestamp ties, unlike unordered first/"
    "last. Single (key, bar) shuffle; every aggregate combines "
    "associatively so shuffle volume is #bars, not #events.",
)
def q_ohlc(spark, sf_dir):
    return timeseries.ohlc_bars(
        _t(spark, sf_dir, "events"),
        key_cols=["event_type"],
        ts_col="ts",
        value_col="value",
        ordinal_col="event_id",
        bar="hour",
    )


_TEMPORAL_CUTOFF, _TEMPORAL_EMBARGO_DAYS = "2024-01-24 00:00:00", 2


@register(
    "split_temporal_embargo",
    f"""
    WITH labeled AS (
      SELECT event_id, user_id, ts,
             CASE WHEN ts < TIMESTAMP '{_TEMPORAL_CUTOFF}' THEN 'train'
                  WHEN ts >= TIMESTAMP '{_TEMPORAL_CUTOFF}'
                             + INTERVAL {_TEMPORAL_EMBARGO_DAYS} DAY
                    THEN 'test'
                  ELSE 'embargo' END AS split
      FROM events
    )
    SELECT split, COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           MIN(ts) AS first_ts, MAX(ts) AS last_ts
    FROM labeled WHERE split <> 'embargo'
    GROUP BY split
    """,
    doc="Leakage-safe temporal train/test split with a purge embargo: "
    "train strictly before the cutoff, test only after cutoff+embargo, "
    "the gap dropped so boundary-window features cannot straddle. "
    "Map-only labeling (cutoff literal pushes to the scan) + one "
    "summary aggregate; the per-row assignment is what a pipeline "
    "writes, the summary is what the gate hashes.",
)
def q_temporal_split(spark, sf_dir):
    from bag_parser_spark.operators.sampling import temporal_split_embargo

    labeled = temporal_split_embargo(
        _t(spark, sf_dir, "events"),
        ts_col="ts",
        cutoff=_TEMPORAL_CUTOFF,
        embargo=f"{_TEMPORAL_EMBARGO_DAYS} days",
    )
    return labeled.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


# ---------------------------------------------------------------------------
# ts_autocorr — autocorrelation of hourly counts, exact integer stats
# ---------------------------------------------------------------------------

_ACF_LAGS = (1, 2, 3, 6)


@register(
    "ts_autocorr",
    f"""
    WITH hc AS (
      SELECT event_type,
             CAST(epoch_us(date_trunc('hour', ts)) // 1000000 AS BIGINT)
               AS h,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.event_type, l.lag, a.c AS x, b.c AS y
      FROM hc a, (SELECT unnest([{", ".join(map(str, _ACF_LAGS))}]) AS lag) l
      JOIN hc b ON b.event_type = a.event_type
               AND b.h = a.h - l.lag * 3600
    ),
    s AS (
      SELECT event_type, lag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM pairs GROUP BY 1, 2
    )
    SELECT event_type, lag, n AS n_pairs,
           round(CAST(n * sxy - sx * sy AS DOUBLE) /
                 nullif(sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
                             CAST(n * syy - sy * sy AS DOUBLE)), 0.0), 6)
             AS acf
    FROM s
    """,
    doc="Autocorrelation of the per-type hourly event-count series at "
    f"lags {_ACF_LAGS} (hours) — the seasonality/burstiness diagnostic a "
    "monitoring pipeline runs per stream. Lag pairs align by exact "
    "hour-epoch self-join (missing hours pair with nothing — no "
    "imputation), and the Pearson correlation is computed from INTEGER "
    "sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy² as BIGINT — exact "
    "and order-independent; F.corr's float accumulation would flake the "
    "hash gate), with one double sqrt/divide at the end (same discipline "
    "as a22_linreg_suffstats). Shuffles: one (type, hour) count with "
    "map-side combine, one lag equi-join on (type, hour) keys, one "
    "(type, lag) stats reduce — counts only, never events.",
)
def q_ts_autocorr(spark, sf_dir):
    from bag_parser_spark.functions.scalars import ts_micros

    e = _t(spark, sf_dir, "events")
    hc = (
        e.groupBy(
            "event_type",
            (ts_micros(F.date_trunc("hour", F.col("ts"))) / F.lit(1_000_000))
            .cast("long")
            .alias("h"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    lags = F.explode(F.array(*[F.lit(l) for l in _ACF_LAGS])).alias("lag")
    a = hc.select("event_type", "h", F.col("c").alias("x"), lags)
    b = hc.select(
        F.col("event_type").alias("__et__"),
        F.col("h").alias("__h2__"),
        F.col("c").alias("y"),
    )
    pairs = a.join(
        b,
        (F.col("event_type") == F.col("__et__"))
        & (F.col("__h2__") == F.col("h") - F.col("lag") * 3600),
    )
    s = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = F.nullif(
        F.sqrt(
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            )
            * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                "double"
            )
        ),
        F.lit(0.0),
    )
    return s.select(
        "event_type",
        "lag",
        F.col("n").alias("n_pairs"),
        F.round(num / den, 6).alias("acf"),
    )
