"""Time-series operators: as-of join and ordered per-key window batteries.

The reference engine's event surface stops at ordered scans (SURVEY.md
section 2.5-2.6: SQLite has window functions but the reference uses none);
these are the operators a training-data/event pipeline layers on top, built
scale-first:

- ``asof_join`` — Spark has no ASOF JOIN physical operator (DuckDB and
  Pandas do). The classic distributed formulation is NOT a range join
  (which explodes to |L|x|R| candidate pairs per key before pruning) but a
  union + ordered window: tag both sides, sort each key's timeline once,
  and carry the most recent right-side row forward with
  ``last(..., ignorenulls=True)``. One shuffle on the key column, one sort
  per key — identical asymptotics to the sort-merge join Spark would pick
  for an equi-join, so it survives 100 TB where a range join dies. Skewed
  keys behave exactly like a skewed sort-merge join (AQE skew handling
  applies); there is no per-key materialized array anywhere.

- ``running_battery`` — per-key ordered analytics (row_number, ordered
  running sums, lag deltas) as a single window pass. Integer running sums
  (cents, micros) are used for cross-engine oracle exactness: DuckDB
  evaluates windowed SUM over a segment tree whose float addition order
  differs from Spark's sequential fold, so DOUBLE running sums are not
  bit-stable across engines — integers are associativity-proof.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bag_parser_spark.functions.scalars import ts_micros

_RIGHT = "__asof_right__"
_SIDE = "__asof_side__"
_TS = "__asof_ts__"
_TIE = "__asof_tie__"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: Sequence[str] = (),
    right_tiebreak: str | None = None,
    prefix: str = "matched_",
) -> DataFrame:
    """Backward inclusive as-of join: each left row is matched to the most
    recent right row with ``right.ts <= left.ts`` for the same key(s)
    (DuckDB ``ASOF LEFT JOIN`` semantics). Unmatched left rows survive with
    null payload.

    Matched columns come back as ``{prefix}{right_ts}`` plus
    ``{prefix}{c}`` for each payload column.

    Determinism: if the right side can hold several rows at the same
    (key, ts), pass ``right_tiebreak`` — the row with the LARGEST tiebreak
    wins, mirroring a last-write-wins upsert. Without it, ties are
    nondeterministic (same as DuckDB).

    Scale shape: union both sides, shuffle once on the key, one ordered
    window per key with a rows-frame ``last(ignorenulls)`` — no range-join
    candidate explosion, no collected arrays. The right row is carried as a
    single struct so genuinely-null payload values cannot make the window
    skip back to an older right row.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right_payload if c != right_ts]

    # Right rows first (side 0) so equal timestamps match (inclusive).
    rstruct = F.struct(
        F.col(right_ts).alias(right_ts),
        *[F.col(c).alias(c) for c in payload],
    )
    tie = (
        F.col(right_tiebreak)
        if right_tiebreak is not None
        else F.lit(0)
    )
    r = right.select(
        *keys,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        tie.cast("long").alias(_TIE),
        rstruct.alias(_RIGHT),
    )
    lcols = left.columns
    l = left.select(
        *lcols,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(0).cast("long").alias(_TIE),
        F.lit(None).cast(r.schema[_RIGHT].dataType).alias(_RIGHT),
    )
    # Align schemas: right side lacks the non-key left columns.
    for c in lcols:
        if c not in keys:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    r = r.select(*lcols, _TS, _SIDE, _TIE, _RIGHT)

    unioned = l.unionByName(r)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc(), F.col(_TIE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(_RIGHT, ignorenulls=True).over(w)
    out = unioned.withColumn("__match__", carried).filter(F.col(_SIDE) == 1)
    sel: list[Column] = [F.col(c) for c in lcols]
    sel.append(F.col(f"__match__.{right_ts}").alias(f"{prefix}{right_ts}"))
    for c in payload:
        sel.append(F.col(f"__match__.{c}").alias(f"{prefix}{c}"))
    return out.select(*sel)


def running_battery(
    df: DataFrame,
    key: str,
    ts: str,
    tiebreak: str,
    value: str,
) -> DataFrame:
    """Per-key ordered window battery in ONE window pass (one shuffle on
    ``key``, one sort): row_number, ordered running sum of integer cents,
    previous-row value carry, and the microsecond gap to the previous row.

    The running sum is on ``round(value*100)`` cast to BIGINT, not on the
    raw DOUBLE: integer addition is order-independent, so the result is
    bit-identical whether the engine folds sequentially (Spark) or over a
    segment tree (DuckDB). Gaps use ``unix_micros`` for the same reason.
    """
    order = [F.col(ts).asc(), F.col(tiebreak).asc()]
    w = Window.partitionBy(key).orderBy(*order)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cents = F.round(F.col(value) * 100).cast("long")
    return df.select(
        key,
        ts,
        tiebreak,
        value,
        F.row_number().over(w).cast("long").alias("rn"),
        F.sum(cents).over(wsum).alias("running_cents"),
        F.lag(value).over(w).alias("prev_value"),
        (
            ts_micros(F.col(ts))
            - ts_micros(F.lag(F.col(ts)).over(w))
        ).alias("gap_us"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


def topk_per_key(
    df: DataFrame,
    key: str,
    order_col: str,
    tiebreak: str,
    k: int,
    descending: bool = True,
) -> DataFrame:
    """Deterministic top-k rows per key (O2/O3 generalized per group):
    rank within each key partition and keep ``rn <= k``. The window sort is
    per-key (shuffle on ``key`` only); Catalyst pushes the ``rn <= k``
    filter into the window via a rank-limit at execution, so no partition
    ever materializes more than its own rows.
    """
    oc = F.col(order_col).desc() if descending else F.col(order_col).asc()
    w = Window.partitionBy(key).orderBy(oc, F.col(tiebreak).asc())
    return (
        df.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
    )


def scd2_intervals(
    df: DataFrame,
    key: str,
    change_ts: str,
    tiebreak: str,
    attrs: Sequence[str],
) -> DataFrame:
    """Slowly-changing-dimension type 2: turn a change log (one row per
    attribute change) into validity intervals — ``valid_from`` = the change
    timestamp, ``valid_to`` = the NEXT change's timestamp for the same key
    (open interval, null for the current row), ``is_current`` flag.

    One window per key (shuffle on ``key``, ordered by (ts, tiebreak)) —
    the standard warehouse history-build, linear in the log. Equal-ts
    changes are ordered by ``tiebreak`` so the earlier row gets a
    zero-length interval instead of a nondeterministic one.
    """
    w = Window.partitionBy(key).orderBy(
        F.col(change_ts).asc(), F.col(tiebreak).asc()
    )
    nxt = F.lead(F.col(change_ts)).over(w)
    return df.select(
        key,
        tiebreak,
        *attrs,
        F.col(change_ts).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_lag_s: int = 600,
    right_payload: Sequence[str] = (),
    prefix: str = "r_",
) -> DataFrame:
    """Event-time interval join: pair each left row with EVERY right row of
    the same key whose timestamp falls in ``(left.ts - max_lag_s, left.ts]``
    — the batch twin of a Structured Streaming stream-stream join with a
    time-range condition (streaming/events.py wires the same predicate with
    watermarks).

    Plan shape: the join key is (on, time band) where a band is a
    max_lag-sized slice of event time — a matching right row (r.ts in
    (l.ts - lag, l.ts]) can only live in the left row's band or the one
    before it, so the left side explodes into those two band keys and the
    equi-join on (key, band) finds every candidate exactly once (band(r)
    is a single value — no dedup needed). The exact integer-microsecond
    predicate then prunes inside the join. This bounds per-task width by
    (key, band), so ONE hot key with a long history spreads across many
    tasks instead of melting a single one — the same trick as LSH bands,
    applied to time. Cost: the left side ships twice (two band keys/row).

    Band ids come from floor(micros / lag): micros fit a double exactly
    until ~year 2255 (2^53 µs), so the floor is exact.
    """
    lag_us = max_lag_s * 1_000_000
    l = (
        left.withColumn("__lus__", ts_micros(F.col(left_ts)))
        .withColumn(
            "__band__",
            F.explode(
                F.array(
                    F.floor(F.col("__lus__") / F.lit(lag_us)).cast("long"),
                    F.floor(F.col("__lus__") / F.lit(lag_us)).cast("long")
                    - 1,
                )
            ),
        )
        .alias("l")
    )
    r = (
        right.withColumn("__rus__", ts_micros(F.col(right_ts)))
        .withColumn(
            "__band__", F.floor(F.col("__rus__") / F.lit(lag_us)).cast("long")
        )
        .alias("r")
    )
    diff = F.col("l.__lus__") - F.col("r.__rus__")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col("l.__band__") == F.col("r.__band__"))
        & (diff >= 0)
        & (diff < lag_us)
    )
    sel = [F.col(f"l.{c}") for c in left.columns]
    sel.append(F.col(f"r.{right_ts}").alias(f"{prefix}{right_ts}"))
    sel += [F.col(f"r.{c}").alias(f"{prefix}{c}") for c in right_payload]
    return l.join(r, cond, "inner").select(*sel)


def gapfill_resample(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
    bucket_fn: str = "hour",
) -> DataFrame:
    """Time-series resample with gap fill and forward fill — the hypertable
    rollup shape (``time_bucket`` + ``locf`` in timescale terms): bucket
    events per key, materialize EVERY bucket between each key's first and
    last event (missing buckets appear with ``n_events = 0``), and carry
    the last observed value forward across the gaps.

    Columns out: (key, bucket, n_events, ffill_max_value). ``max`` is the
    per-bucket value statistic because it is order-independent — a float
    ``avg``'s partial-merge order is layout-dependent and can never
    hash-match a single-threaded oracle.

    Plan shape, scale notes:
    - bucketing is one groupBy shuffle on (key, bucket) with map-side
      partial agg — rows in, (key, bucket, count, max) out;
    - the spine is generated from a per-key (min, max) agg — a second
      key-only shuffle over the ALREADY-bucketed (tiny) table, then a
      ``sequence()`` explode whose width is bounded by the key's time span
      / step, never by its event count. A hot key with 10^9 events still
      yields only span/step spine rows;
    - the spine⋈buckets join and the forward-fill window both run on the
      same (key) partitioning — AQE coalesces these into adjacent stages
      with one effective exchange.
    """
    bucket = F.date_trunc(bucket_fn, F.col(ts_col)).alias("bucket")
    hourly = df.groupBy(F.col(key), bucket).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(value_col).alias("max_value"),
    )
    # (r12: a guarded fan-out of the 1-row/key spine input was A/B'd
    # here — the explode/join/window chain runs on one AQE-coalesced
    # task (0.44 s CPU on a 22 KB input) — and measured FLAT,
    # 0.83 -> 0.89 s min over 7 interleaved reps: the added exchange
    # costs what the spread saves at this volume. REVERTED.)
    spine = (
        hourly.groupBy(key)
        .agg(F.min("bucket").alias("__b0__"), F.max("bucket").alias("__b1__"))
        .select(
            key,
            F.explode(
                F.sequence(
                    F.col("__b0__"), F.col("__b1__"), F.expr(f"interval {step}")
                )
            ).alias("bucket"),
        )
    )
    joined = spine.join(hourly, on=[key, "bucket"], how="left")
    w = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key,
        "bucket",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("max_value", ignorenulls=True).over(w).alias("ffill_max_value"),
    )


def event_order_key(ts_col: str, ordinal_col: str | None = None):
    """Sortable string key giving a TOTAL order over (event time, ordinal)
    — shared by the batch and streaming OHLC twins so their selection
    semantics cannot drift apart.

    Both segments are zero-padded to 20 chars: epoch-micros needs 16
    digits for present-day timestamps, and 20 covers the full int64
    ordinal range (19 digits) — a shorter pad would TRUNCATE longer
    ordinals (Spark lpad shortens over-length strings), silently
    re-introducing the equal-key nondeterminism the key exists to
    prevent (snowflake-style ids are 18-19 digits). Domain: post-epoch
    timestamps and non-negative ordinals — a '-' orders above digits
    lexically, so negative values would compare wrongly; the engine's
    event model (unsigned ids, event time) satisfies both.
    """
    from bag_parser_spark.functions.scalars import ts_micros

    return F.concat(
        F.lpad(ts_micros(F.col(ts_col)).cast("string"), 20, "0"),
        F.lit("|"),
        F.lpad(
            (F.col(ordinal_col).cast("string") if ordinal_col
             else F.lit("")),
            20,
            "0",
        ),
    )


def ohlc_bars(
    df,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    ordinal_col: str | None = None,
    bar: str = "hour",
    round_to: int = 6,
):
    """OHLC candlestick resampling: per key and time bucket, emit the
    first (open), max (high), min (low), and last (close) value plus event
    count and summed volume — the classic time-series downsample.

    Open/close are `min_by`/`max_by` over a TOTALLY-ORDERED sortable key
    (zero-padded epoch-micros, tie-broken by the ordinal column), so the
    selection is deterministic even when timestamps collide — plain
    first()/last() over an unordered groupBy would be partitioning-
    dependent. One shuffle on (key, bucket) with full map-side partial
    aggregation: min_by/max_by/min/max/count/sum all combine
    associatively, so shuffle volume is #bars, not #events — at 100 TB
    the reduction happens in the scan stage. No window, no sort, no UDF.

    Volume sums in DECIMAL(28,6) — exact, order-independent — then casts
    back to double once (the repo-wide parity idiom). A plain SUM(double)
    is an unordered float accumulation whose last bits depend on
    partitioning, which can flake a hash-equality oracle gate.
    """
    order_key = event_order_key(ts_col, ordinal_col)
    v = F.col(value_col)
    return (
        df.groupBy(
            *[F.col(k) for k in key_cols],
            F.date_trunc(bar, F.col(ts_col)).alias("bar_start"),
        )
        .agg(
            F.min_by(v, order_key).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, order_key).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(v.cast("decimal(28,6)")).cast("double"), round_to
            ).alias("volume"),
        )
    )
