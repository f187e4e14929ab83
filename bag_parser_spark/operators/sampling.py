"""Dataset splitting and sequence packing for training-data pipelines
(extension surface).

Both operators are deterministic functions of the data — no RNG state, no
insertion order — so a re-run (or a retried task on a 1000-executor
cluster) assigns every document to the same split and the same chunk.
Spark's own ``randomSplit``/``sample`` are partition-order-sensitive and
engine-specific; a content-hash bucket is the reproducible, portable way
to split a 100 TB corpus, and it never shuffles (map-only projection).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_SPLIT_MOD = 10_000


def md5_mod(c: Column, seed: int | str, mod: int = HASH_SPLIT_MOD) -> Column:
    """Uniform bucket in [0, mod) from the first 8 md5 hex chars of
    ``seed:value`` — folded to an integer with plain nibble arithmetic so
    any engine computes the identical bucket (no dependence on a native
    unhexing builtin). Max fold value 16^8-1 < 2^53: exact in doubles.

    Spark-side the fold is one JVM ``conv(hex, 16, 10)`` — the r11
    optimization pass measured the original 8-nibble instr/substring
    emulation (8 substrings + 8 instr + 16 double ops PER HASH, and
    md5_mod underlies every hash split, Bloom probe, count-min cell and
    DSIR bucket) at ~5x the expression cost; ``conv`` of 8 lowercase
    hex chars is exactly the same integer (16^8-1 < 2^53 < 2^63, no
    overflow, no sign bit), pinned by a dedicated equivalence test.
    The DuckDB oracle keeps the portable nibble arithmetic
    (plans/oracles.py) — same mm_image_neardup precedent as VERDICT
    r10 #6.
    """
    h = F.md5(F.concat(F.lit(f"{seed}:"), c.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % mod


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: Sequence[tuple[str, float]],
    seed: int | str = 42,
    split_name: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by content-hash bucket.

    ``splits`` is an ordered list of (name, fraction) summing to 1.0; a doc
    lands in the split whose cumulative-fraction interval contains its
    ``md5_mod`` bucket. Fractions are exact over the bucket space (e.g.
    0.8 → buckets [0, 8000) of 10000), and membership depends only on
    (seed, id) — stable across runs, partitionings, and engines, which is
    what makes held-out sets trustworthy: a training doc can never migrate
    into the eval split when the cluster layout changes.
    """
    total = sum(f for _, f in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1.0, got {total}")
    bucket = md5_mod(F.col(id_col), seed)
    expr: Column | None = None
    acc = 0.0
    for name, frac in splits[:-1]:
        acc += frac
        cond = bucket < int(round(acc * HASH_SPLIT_MOD))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(splits[-1][0])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_name, out)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count: Column,
    ctx_len: int,
    shard_col: Column | str,
    order_by: Sequence[str] | None = None,
) -> DataFrame:
    """Concatenate-then-chunk sequence packing: lay the corpus out as one
    token stream per shard (docs in ``order_by`` order), then cut the
    stream into fixed ``ctx_len`` chunks. Returns per doc: its shard, token
    count, starting offset in the shard's stream, and the first/last chunk
    ids it lands in — everything a loader needs to emit packed batches.

    This is the standard pretraining batching step (concatenate documents,
    chunk at context length — docs straddle chunk boundaries rather than
    padding). The running offset is a window cumsum, so the layout is a
    deterministic function of (shard, order) — re-running on different
    partitioning yields byte-identical packing.

    Scale shape: ONE window per shard — the shard column must be chosen so
    a shard's docs fit a task (e.g. hash-bucket the corpus into O(cores)
    shards upstream). A global single-stream layout would serialize on one
    partition; per-shard streams are the 100 TB form, and the shard id
    doubles as the output file's partition key so chunks are written
    co-located and orderable.
    """
    shard = F.col(shard_col) if isinstance(shard_col, str) else shard_col
    order = [F.col(c) for c in (order_by or [id_col])]
    base = df.select(
        F.col(id_col),
        shard.alias("shard"),
        token_count.cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        offset.alias("token_offset"),
        F.floor(offset / ctx_len).alias("first_chunk"),
        F.floor((offset + F.col("n_tokens") - 1) / ctx_len).alias(
            "last_chunk"
        ),
    )


def pack_bins_bucketed(
    df: DataFrame,
    id_col: str,
    token_count: Column,
    ctx_len: int,
    shard_col: Column | str,
) -> DataFrame:
    """Whole-document bin packing into fixed ``ctx_len`` contexts — the
    NO-SPLIT complement of ``pack_sequences`` (SFT/instruction corpora
    pack whole examples and pad, they never straddle a document across
    contexts the way pretraining chunking does). Exact first-fit is
    inherently sequential, so this is the scalable length-bucketed
    approximation: round each doc's length up to its power-of-two class,
    then within a (class, shard) cell deal docs into bins of exactly
    ``floor(ctx_len / class_max)`` slots — capacity is guaranteed by
    construction (bin_cap · class_max ≤ ctx_len), the assignment is one
    ``row_number`` divmod, and the whole layout is a deterministic
    function of (class, shard, order), independent of partitioning.

    Per doc: its class (``len_class`` = the power-of-two ceiling),
    ``shard``, ``bin_no``/``slot`` within the (class, shard) cell, the
    cell's ``bin_cap``, and an ``oversize`` flag for docs longer than
    the context (they get a bin of their own — the loader decides
    truncate-vs-drop; packing must not silently do either). Docs with
    ``ctx_len/2 < n ≤ ctx_len`` land in a class whose power-of-two
    exceeds the context — their capacity clamps to 1, which is also the
    guaranteed-fit bound (two such docs always overflow).

    Waste bound: every doc is > class_max/2, so a full bin is > 50%
    occupied — plus at most ONE partial bin per (class, shard) cell
    (≈ classes × shards bins total, corpus-size-independent). Tighter
    packing exists (FFD reaches ~11/9·OPT) but needs a sequential pass;
    at 100 TB the trade goes the other way: this shape is ONE shuffle
    keyed (len_class, shard), and the shard key — any uniform hash —
    spreads the dominant length class across tasks, so the one real
    skew axis (most corpora concentrate in 2-3 classes) is bounded by
    construction rather than by a rescue. The reference has no packing
    stage (BAG parser); this is the training-data extension surface.
    """
    if ctx_len < 1:
        raise ValueError(f"ctx_len must be positive: {ctx_len}")
    shard = F.col(shard_col) if isinstance(shard_col, str) else shard_col
    n = F.greatest(token_count.cast("long"), F.lit(1))
    # smallest power of two >= n, as a first-match-wins CASE ladder:
    # integer-exact in every engine (a float log2 rounds 2^k both ways
    # at the boundaries, and the oracle must compute the same class)
    cls = F.when(n <= 1, F.lit(1))
    for p in range(1, 32):
        cls = cls.when(n <= 2 ** p, F.lit(2 ** p))
    cls = cls.otherwise(F.lit(2 ** 62))
    base = df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        shard.cast("long").alias("shard"),
        cls.alias("len_class"),
    ).withColumn(
        # floor(ctx/class) slots fit by construction; the clamp to 1
        # covers the top class (class_max > ctx), where one doc <= ctx
        # still fits alone
        "bin_cap",
        F.greatest(
            F.floor(F.lit(ctx_len) / F.col("len_class")).cast("long"),
            F.lit(1).cast("long"),
        ),
    )
    w = Window.partitionBy("len_class", "shard").orderBy(
        F.col("n_tokens").desc(), F.col(id_col).asc()
    )
    rn = F.row_number().over(w) - 1
    return base.select(
        id_col,
        "n_tokens",
        "shard",
        "len_class",
        "bin_cap",
        F.floor(rn / F.col("bin_cap")).cast("long").alias("bin_no"),
        (rn % F.col("bin_cap")).cast("long").alias("slot"),
        (F.col("n_tokens") > ctx_len).alias("oversize"),
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    rate: Column,
    seed: int | str = 0,
) -> DataFrame:
    """Deterministic per-row Bernoulli sampling at a data-dependent rate
    (importance/temperature sampling over sources: up-weight books, down-
    weight web — the mixture-shaping step of corpus curation): keep a row
    iff md5_mod(seed:id) < rate·MOD.

    ``rate`` is any Column in [0, 1] (typically a CASE over the source
    column). Same determinism argument as hash_split: membership depends
    only on (seed, id, rate), so reruns, retried tasks, and other engines
    reproduce the exact sample — Spark's own ``sample()`` is partition-
    order-sensitive and irreproducible across layouts. Map-only: pipelines
    with the scan, no shuffle. Note buckets are shared with hash_split for
    the same seed — use a different seed than the split so sampling is
    independent of split assignment.
    """
    threshold = (rate * HASH_SPLIT_MOD).cast("long")
    return df.filter(md5_mod(F.col(id_col), seed) < threshold)


def temperature_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    seed: int | str = 11,
) -> DataFrame:
    """Temperature-flattened mixture sampling (the T5/mT5 alpha-sampling
    shape, Raffel et al. 2020 §3.4.3, alpha = 0.5): per-source keep-rates
    are computed FROM the corpus itself — rate_s = sqrt(n_min / n_s), so
    the smallest source keeps everything and a source 100x larger is
    downsampled 10x — then applied as the same deterministic per-row
    Bernoulli as :func:`weighted_sample`. This flattens the source
    distribution toward (but not all the way to) uniform, the standard
    mitigation for web-crawl domination of a pretraining mixture.

    Two-pass scale shape: pass 1 is a map-side-combined groupBy to the
    per-source count table (|sources| rows — tiny at any corpus size);
    the min and the rates derive from that table alone; pass 2 BROADCASTS
    the rate table back onto the full scan, so the corpus itself never
    shuffles — the exact pattern a 100 TB mixture job must use (a window
    over source would shuffle everything).

    Exactness contract: alpha is FIXED at 0.5 because sqrt and division
    are correctly-rounded IEEE ops — bit-identical in every engine —
    while a general ``pow(n, alpha)`` is a libm call whose last ulp
    differs across engines and would break threshold parity. The
    threshold is floor(rate * MOD) (Spark's long cast truncates; the
    oracle must spell ``floor`` — DuckDB's BIGINT cast ROUNDS).

    Returns the kept rows with ``__n__`` (source size) and ``__rate__``
    (keep rate) columns attached for downstream reporting.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n__"))
    nmin = counts.agg(F.min("__n__").alias("__nmin__"))
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        source_col,
        "__n__",
        F.sqrt(
            F.col("__nmin__").cast("double") / F.col("__n__").cast("double")
        ).alias("__rate__"),
    )
    keyed = df.join(F.broadcast(rates), source_col)
    return keyed.filter(
        md5_mod(F.col(id_col), seed)
        < (F.col("__rate__") * HASH_SPLIT_MOD).cast("long")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ctx_len: int,
    overlap: int = 0,
) -> DataFrame:
    """Per-document sliding-window chunking: split each doc's token stream
    into windows of ``ctx_len`` tokens advancing by ``ctx_len - overlap``
    (the fine-tuning / embedding-indexing layout, where each example must
    be a self-contained span of ONE document — ``pack_sequences`` is the
    pretraining layout where docs concatenate and straddle boundaries).

    Chunk i covers tokens [i·step, i·step + ctx_len); the last window is
    the first one whose end reaches the document end, so every token
    appears in ≥1 chunk and no degenerate tail-only chunks are emitted.
    Returns (id, chunk_no, token_start, n_chunk_tokens, chunk_text).

    Map-only explode: the generator runs executor-side, output size is
    input·(1 + overlap/step) — no shuffle at any corpus size. Integer
    chunk-count arithmetic ((n - ctx + step - 1) div step) is exact in
    any engine, unlike float ceil().
    """
    if not 0 <= overlap < ctx_len:
        raise ValueError(f"need 0 <= overlap < ctx_len, got {overlap}/{ctx_len}")
    step = ctx_len - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(
        F.col(id_col), toks.alias("__toks__"), F.size(toks).alias("__n__")
    )
    extra = (
        (F.col("__n__") - ctx_len + step - 1) / step
    ).cast("long")  # exact: small positive ints in double space
    n_chunks = F.when(F.col("__n__") > ctx_len, F.lit(1) + extra).otherwise(
        F.lit(1)
    )
    chunks = base.select(
        id_col,
        "__toks__",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
            "chunk_no"
        ),
    )
    start = F.col("chunk_no") * step
    piece = F.slice(F.col("__toks__"), (start + 1).cast("int"), ctx_len)
    return chunks.select(
        id_col,
        "chunk_no",
        start.alias("token_start"),
        F.size(piece).alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def sample_per_group(
    df: DataFrame,
    keys: Sequence[str],
    id_col: str,
    k: int,
    seed: int | str = 0,
    rank_name: str = "sample_rank",
    salted: bool = False,
    salt: int = 32,
) -> DataFrame:
    """Deterministic cap-k-per-key sampling: rank each group's rows by the
    md5 of ``seed:id`` (a uniform, reproducible shuffle order) and keep the
    first ``k``. The standard volume-capping step of corpus curation (e.g.
    "at most N documents per domain") — a biased head(k) would keep
    whatever order the files arrived in; the hash rank is a fair draw that
    every re-run and every engine reproduces.

    Plain route — THE scale path, measured: one shuffle on ``keys``,
    and Catalyst inserts ``WindowGroupLimit`` around it (rank-limit
    pushdown for ``row_number() <= k`` filters): a map-side Partial
    top-``k`` per group runs BEFORE the exchange, so a viral single-key
    group ships ≤ ``k``·n_map_partitions rows to the final window
    task, never its full size. The naive skew story ("a giant group
    sorts inside one task") does NOT apply to this operator — probed at
    40M rows with one domain holding 95%: 4.2 s, flat vs the unskewed
    case (SCALE.md r7; the Partial-before-Exchange shape is pinned by a
    plan test).

    ``salted=True`` arms an OUTPUT-IDENTICAL two-stage top-k — stage 1
    ranks within (``keys``, md5-derived salt cell) and keeps ``k`` per
    cell, stage 2 ranks the survivors per group; exact including rank
    values, since every true top-``k`` row is top-``k`` in its cell and
    all better-ranked rows survive stage 1. It exists as the manual
    fallback for rank variants the group-limit pushdown cannot cover
    (e.g. ordering by an expression Catalyst declines to push); for
    this operator it only adds a second full shuffle — measured 4.2x
    plain at 20M rows/20% skew, 1.5x at 40M/95% (extreme skew lets
    stage 1 prune more) — so leave it off unless the plan audit shows
    the pushdown missing. An earlier count-routed design (count
    aggregate joined back, salting only groups above a cutoff) measured
    7.7x plain at 20M rows and 54x at 40M/95% skew: the count-join
    itself re-shuffles the viral key into one join partition — the
    guard WAS the wedge.
    """
    order = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    w = Window.partitionBy(*keys).orderBy(order.asc(), F.col(id_col).asc())
    if not salted:
        return (
            df.withColumn(rank_name, F.row_number().over(w))
            .filter(F.col(rank_name) <= k)
        )
    # salt cell from the SAME md5 order key (layout-independent); conv
    # returns a string, hence the cast
    salt_cell = (
        F.conv(F.substring(order, 1, 4), 16, 10).cast("long") % salt
    )
    w1 = Window.partitionBy(*keys, "__salt__").orderBy(
        order.asc(), F.col(id_col).asc()
    )
    stage1 = (
        df.withColumn("__salt__", salt_cell)
        .withColumn("__r1__", F.row_number().over(w1))
        .filter(F.col("__r1__") <= k)
        .drop("__salt__", "__r1__")
    )
    return (
        stage1.withColumn(rank_name, F.row_number().over(w))
        .filter(F.col(rank_name) <= k)
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    percents: dict[str, int],
    seed: int | str = 0,
    rank_name: str = "mixture_rank",
) -> DataFrame:
    """Target-mixture subsampling — the data-mixing step of corpus
    curation: keep ``percents[source]`` percent of each source's rows
    (sources absent from ``percents`` are dropped), chosen by the same
    deterministic md5 rank as ``sample_per_group`` so the draw is fair
    and every re-run / engine reproduces it. Targets are integer
    arithmetic — floor(n · pct / 100) — so no float boundary can flip a
    row's membership between engines.

    Differs from ``weighted_sample`` (per-row Bernoulli at a rate: fast,
    map-only, but only the EXPECTED fraction) by hitting the target
    count exactly, which mixture specs usually require. Cost: one
    shuffle on ``source_col`` for the per-source counts + rank window
    (the window reuses the count shuffle's partitioning); the count
    table is #sources rows and broadcasts back.
    """
    mapping = F.create_map(
        *[F.lit(x) for kv in percents.items() for x in kv]
    )
    eligible = df.withColumn("__pct__", mapping[F.col(source_col)]).filter(
        F.col("__pct__").isNotNull()
    )
    counts = eligible.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("__n__")
    )
    order = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    w = Window.partitionBy(source_col).orderBy(order.asc(), F.col(id_col).asc())
    return (
        eligible.join(F.broadcast(counts), source_col)
        .withColumn(rank_name, F.row_number().over(w))
        # `div` is integer division — the docstring/oracle contract is
        # floor(n*pct/100) in PURE integer arithmetic; true-division-
        # then-truncate only matches while n*pct is exactly representable
        # as a double (ADVICE r5)
        .filter(
            F.col(rank_name) <= F.expr("__n__ * __pct__ div 100")
        )
        .drop("__pct__", "__n__")
    )


def global_shuffle_rank(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int | str = 0,
    pos_name: str = "shuffle_pos",
) -> DataFrame:
    """Deterministic global training-data shuffle: assign each row its exact
    0-shuffle-order rank under a seeded hash permutation (``md5(seed:id)``),
    reproducible across engines and re-runs.

    The naive form — ``row_number() OVER (ORDER BY hash)`` — is a
    single-partition window: one task sorts the whole corpus, dead at scale.
    This is the two-pass distributed exact rank instead:

    1. bucket = first 2 hex chars of the hash (256 range buckets; the hash
       is uniform so buckets are balanced by construction — no sampling
       pass needed, unlike ``repartitionByRange``);
    2. per-bucket counts (tiny 256-row aggregate) → running offsets via a
       window over the 256-row side only;
    3. rank = bucket offset (broadcast join) + row_number within the
       bucket, a window PARTITIONED on bucket — every task sorts only its
       bucket's rows.

    Because the bucket is a prefix of the hash, (bucket, hash) order equals
    global hash order, so the result is IDENTICAL to the single-partition
    form — the oracle states it that way.
    """
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    with_h = df.withColumn("__h__", h).withColumn(
        "__bkt__", F.substring(F.col("__h__"), 1, 2)
    )
    offsets = (
        with_h.groupBy("__bkt__")
        .agg(F.count("*").alias("__cnt__"))
        .withColumn(
            "__offset__",
            F.coalesce(
                F.sum("__cnt__").over(
                    Window.orderBy("__bkt__").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__bkt__", "__offset__")
    )
    w = Window.partitionBy("__bkt__").orderBy(
        F.col("__h__").asc(), F.col(id_col).asc()
    )
    return (
        with_h.join(F.broadcast(offsets), "__bkt__")
        .withColumn(
            pos_name, (F.col("__offset__") + F.row_number().over(w)).cast("long")
        )
        .drop("__h__", "__bkt__", "__offset__")
    )


def _idiv(a: Column, b: Column) -> Column:
    """Exact integer division of non-negative longs as Columns: ``(a - a%b)
    / b`` — the numerator is exactly divisible, so the double division is
    exact for any count < 2^53 (no ``div`` operator exists in the Column
    API without string expressions)."""
    return ((a - a % b) / b).cast("long")


def bucketed_rank(
    df: DataFrame,
    value: Column,
    tiebreaks: Sequence[Column],
    rank_name: str = "rank",
    total_name: str | None = None,
    ascending: bool = True,
    n_buckets: int = 32,
    cache_registry: list | None = None,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Exact global rank under ``(value asc|desc, *tiebreaks asc)`` without
    a single-partition sort — the generalization of
    :func:`global_shuffle_rank` to an ARBITRARY numeric ordering key
    (there the key is a uniform hash, so its prefix is a free balanced
    bucket; here the distribution is unknown, so bucket boundaries come
    from an ``approx_percentile`` sketch instead):

    1. cut points = ``approx_percentile(value, ...)`` — a distributed,
       sketch-mergeable AGGREGATE (never a sort). The cuts only steer
       BALANCE, not correctness: bucket = #cuts strictly below the value
       is a monotone function of the value alone, so rows that tie on
       the value always share a bucket and (bucket, value, tiebreaks)
       order equals the global order exactly even if the sketch is off.
    2. per-bucket counts -> running offsets, a window over the
       <= ``n_buckets``-row aggregate side only (bounded by construction).
    3. rank = broadcast bucket offset + row_number within the bucket
       (window PARTITIONED on bucket — every task sorts only its slice).

    ``value`` must be numeric, non-null, and non-NaN (rank of NULL is
    undefined here and a NaN would silently compare into bucket 0 —
    filter both first). The ordering key is evaluated as a DOUBLE, so
    integer keys are order-exact only up to 2^53: distinct longs above
    that can collide after the cast and then rank in tiebreak order
    (ADVICE r8 — the earlier 2^63 claim was wrong). ``ascending=False``
    ranks descending by negating the key (same 2^53 bound; exact for
    finite doubles).
    ``total_name`` additionally attaches the total row count to every
    row (needed by :func:`ntile_from_rank`) — it rides the same
    broadcast, no extra pass. Temp columns are dropped; input columns
    pass through untouched.

    Cost: three passes over the input (cut sketch, bucket counts, the
    ranked output) — the tiny cuts/offsets sides are PERSISTED so the
    branches never re-derive the input subtree a fourth time (the
    handles go to ``cache_registry`` when given, same contract as
    ``text.bpe_train``). If the input is itself expensive (an
    aggregate, a join), persist it before calling.

    ``keys`` generalizes to an INDEPENDENT rank per key group (rank
    restarts at 1 in each group; ``total_name`` becomes the group
    total): cut points are sketched per group, the offsets side grows
    to ≤ ``len(groups) × n_buckets`` rows (still aggregate-sized),
    and every window gains the keys in front of the bucket. One
    grouped call replaces N sequential ungrouped calls over an
    unpivoted metric column — N× fewer passes, one persisted input
    instead of a persist chain (``q_cust_rfm``).
    """
    ks = list(keys)
    v = value.cast("double") if ascending else (-value).cast("double")
    with_v = df.withColumn("__v__", v)
    qs = ", ".join(f"{(i + 1) / n_buckets:.6f}" for i in range(n_buckets - 1))
    cut_expr = F.expr(
        f"approx_percentile(__v__, array({qs}), 10000)"
    ).alias("__cuts__")
    cuts = (
        with_v.groupBy(*ks).agg(cut_expr) if ks else with_v.agg(cut_expr)
    ).persist()
    if cache_registry is not None:
        cache_registry.append(cuts)
    joined = (
        with_v.join(F.broadcast(cuts), ks)
        if ks
        else with_v.crossJoin(F.broadcast(cuts))
    )
    b = joined.withColumn(
        "__bkt__",
        F.size(F.filter("__cuts__", lambda c: c < F.col("__v__"))),
    ).drop("__cuts__")
    # offsets: <= #groups x n_buckets rows — the windows below run on
    # the aggregate side only (bounded by construction, same class as
    # the 256-row window in token_budget_sample), never the fact
    w_all = Window.partitionBy(*ks).orderBy("__bkt__")
    counts = b.groupBy(*ks, "__bkt__").agg(F.count(F.lit(1)).alias("__cnt__"))
    offsets = counts.select(
        *ks,
        "__bkt__",
        F.coalesce(
            F.sum("__cnt__").over(
                w_all.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("__off__"),
        F.sum("__cnt__")
        .over(
            w_all.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("__tot__"),
    ).persist()
    if cache_registry is not None:
        cache_registry.append(offsets)
    w = Window.partitionBy(*ks, "__bkt__").orderBy(
        F.col("__v__").asc(), *[t.asc() for t in tiebreaks]
    )
    out = b.join(F.broadcast(offsets), [*ks, "__bkt__"]).withColumn(
        rank_name, (F.col("__off__") + F.row_number().over(w)).cast("long")
    )
    if total_name is not None:
        out = out.withColumn(total_name, F.col("__tot__").cast("long"))
    return out.drop("__v__", "__bkt__", "__off__", "__tot__")


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """``ntile(k)`` reconstructed from an exact global rank and the total
    row count in PURE integer arithmetic — the scale-safe twin of the
    single-partition ``ntile(k) OVER (ORDER BY ...)`` window (identical
    output by the SQL-standard definition both Spark and DuckDB
    implement: with ``n = q*k + rem``, tiles ``1..rem`` hold ``q+1`` rows,
    tiles ``rem+1..k`` hold ``q`` rows, filled in rank order). Feed it the
    rank from :func:`bucketed_rank` and its ``total_name`` column. The
    ``q == 0`` case (n < k) always takes the first branch — the
    otherwise-branch's division by zero is never evaluated (lazy CASE).
    """
    kk = F.lit(k)
    q = _idiv(n, kk)
    rem = n % kk
    big = q + F.lit(1)
    cut = rem * big
    first = _idiv(rank - F.lit(1), big) + F.lit(1)
    second = rem + _idiv(rank - cut - F.lit(1), q) + F.lit(1)
    return F.when(rank <= cut, first).otherwise(second).cast("int")


def quantile_band_filter(
    df: DataFrame,
    value_col: str,
    lo_p: float = 0.05,
    hi_p: float = 0.95,
    round_to: int = 6,
) -> DataFrame:
    """Quantile-calibrated outlier filter: keep rows whose ``value_col``
    lies within the corpus's [lo_p, hi_p] percentile band — the standard
    data-driven alternative to hand-tuned length/quality cutoffs (the
    thresholds adapt to each corpus snapshot instead of going stale).

    The bounds come from Spark's exact ``percentile`` AGGREGATE (distributed
    partial aggregation — not a global-sort window), broadcast back onto
    the rows as a 1-row crossJoin in the same job. At 100 TB the drop-in
    scale variant is ``approx_percentile`` with a bounded error budget —
    same plan shape, sketch-mergeable partials; exact is kept here because
    the oracle comparison demands bit-equality.
    """
    bounds = df.agg(
        F.expr(f"percentile({value_col}, {lo_p})").alias("__lo__"),
        F.expr(f"percentile({value_col}, {hi_p})").alias("__hi__"),
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .filter(
            (F.col(value_col) >= F.col("__lo__"))
            & (F.col(value_col) <= F.col("__hi__"))
        )
        .withColumn("band_lo", F.round(F.col("__lo__"), round_to))
        .withColumn("band_hi", F.round(F.col("__hi__"), round_to))
        .drop("__lo__", "__hi__")
    )


def sample_negatives(
    df: DataFrame,
    id_col: str,
    k: int = 4,
    n_buckets: int = 256,
    seed: str = "negs",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: up to
    ``k`` pseudo-random non-matching ids per anchor, reproducible on any
    engine or partition layout (same md5-bucket determinism as
    :func:`hash_split` — retries and re-runs pair every anchor with the
    SAME negatives, so a training run is replayable).

    Scale shape — explicitly NOT a global index: assigning dense ranks to
    sample "the m-th other row" needs a global row_number (single-
    partition sort, the classic driver-chokepoint). Instead ids hash into
    ``n_buckets`` buckets; each bucket's representative (min id) forms a
    broadcast-sized negative pool, and each (anchor, j) draws a pseudo-
    random bucket. Map-only + one tiny aggregate + a broadcast join —
    no global order anywhere. Trade: negatives come from the pool of
    bucket representatives (n_buckets distinct candidates), which is the
    standard in-batch/pool approximation contrastive pipelines already
    make; raise ``n_buckets`` for a richer pool. Yield is UP TO k per
    anchor: a draw into an empty bucket (no id hashed there — likely when
    the corpus is not ≫ n_buckets) produces no row, and the rare anchor
    that IS its drawn bucket's representative is filtered as a self-match
    — both mirrored exactly in the oracle. At corpus scale every bucket
    is occupied and yield converges to k.
    """
    ids = df.select(F.col(id_col))
    bucket = md5_mod(F.col(id_col), f"{seed}:b", n_buckets)
    reps = ids.groupBy(bucket.alias("__bucket__")).agg(
        F.min(id_col).alias("neg_id")
    )
    anchors = ids.select(
        id_col, F.explode(F.sequence(F.lit(1), F.lit(k))).alias("j")
    )
    draw = F.concat(
        F.col(id_col).cast("string"), F.lit(":"), F.col("j").cast("string")
    )
    out = (
        anchors.withColumn("__bucket__", md5_mod(draw, f"{seed}:t", n_buckets))
        .join(F.broadcast(reps), "__bucket__")
        .filter(F.col("neg_id") != F.col(id_col))
    )
    return out.select(id_col, F.col("j").cast("long").alias("j"), "neg_id")


def temporal_split_embargo(
    df,
    ts_col: str,
    cutoff: str,
    embargo: str = "1 days",
    split_name: str = "split",
):
    """Leakage-safe temporal split for event/time-series training data:
    rows strictly before ``cutoff`` are train, rows at/after
    ``cutoff + embargo`` are test, and rows inside the embargo window are
    DROPPED (labeled then filtered) — the purge gap that keeps
    look-ahead features computed near the boundary from straddling it
    (the time-series analogue of cluster-atomic splitting for near-dups).

    Map-only expression — no shuffle, no RNG; the assignment depends only
    on (cutoff, embargo, ts), so it is stable across runs, partitionings,
    and engines, and the cutoff literal pushes down to the scan. The
    cutoff literal is cast to the ts COLUMN's own type (NTZ or LTZ —
    the driver has shipped both parquet encodings): a hard-coded NTZ
    cast against an LTZ column would be coerced through the session
    timezone, silently shifting the leakage boundary by the tz offset.
    """
    ts = F.col(ts_col)
    cut = F.lit(cutoff).cast(dict(df.dtypes)[ts_col])
    test_start = cut + F.expr(f"INTERVAL {embargo}")
    label = (
        F.when(ts < cut, F.lit("train"))
        .when(ts >= test_start, F.lit("test"))
        .otherwise(F.lit("embargo"))
    )
    return df.withColumn(split_name, label).filter(
        F.col(split_name) != "embargo"
    )


def weighted_reservoir_sample(
    df,
    id_col: str,
    weight_col,
    k: int,
    seed: int | str = 0,
    round_to: int = 9,
):
    """Deterministic weighted sampling WITHOUT replacement (exactly k
    rows): the A-Res scheme — key_i = u_i^(1/w_i) with u_i a hash-derived
    uniform — keeps the k largest keys; inclusion probability is
    proportional to weight, and the whole draw is a pure function of
    (seed, id, weight): reproducible across runs, partitionings, and
    engines, unlike rand()-based reservoirs whose draw shifts with
    partition layout. Contrast with weighted_sample (per-row Bernoulli:
    proportional EXPECTED counts, variable size) — this one returns an
    exact-k sample.

    u = (md5_mod(seed:id) + 0.5) / MOD is exact in doubles; pow() is the
    one libm call, so keys round to 9 decimals with id as tiebreak (the
    same last-ulp discipline as the catalog's ln()/exp() rounding). The
    global top-k is orderBy().limit(k) → TakeOrderedAndProject (O(k)
    per-task heaps) — no global sort, no driver-side state.
    """
    u = (
        md5_mod(F.col(id_col), seed).cast("double") + F.lit(0.5)
    ) / F.lit(float(HASH_SPLIT_MOD))
    w = F.col(weight_col).cast("double")
    key = F.round(F.pow(u, F.lit(1.0) / w), round_to)
    keyed = df.withColumn("__key__", key)
    return (
        keyed.orderBy(F.col("__key__").desc(), F.col(id_col).asc())
        .limit(k)
        .withColumnRenamed("__key__", "sample_key")
    )


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    seed: int | str = 0,
    tokens_name: str = "n_tokens",
    cum_name: str = "cum_tokens",
) -> DataFrame:
    """Token-budget data mixing — the form real mixture specs are
    written in ("N tokens of source X"), complementing
    ``mixture_sample``'s doc-percent form: per source, draw documents
    in the seeded md5 fair order and keep while the RUNNING
    whitespace-token total stays within ``budgets[source]`` (a document
    that would cross the boundary is dropped — integer arithmetic, no
    fractional-doc ambiguity). Sources absent from ``budgets`` are
    dropped. Returns the kept rows plus per-doc ``n_tokens`` and the
    running ``cum_tokens`` (== the consumed budget, auditable).

    Scale shape — exact distributed prefix sum, skew-proof: a plain
    per-source cumsum window would put each source's WHOLE corpus in
    one task, and a running sum is not a rank-limit, so Catalyst's
    WindowGroupLimit cannot bound it (contrast ``sample_per_group``).
    Same two-pass trick as ``global_shuffle_rank``: the bucket is the
    first 2 hex chars of the order hash — an ORDERED prefix, so
    (bucket, hash) order equals the global fair-draw order — then
    (1) per-(source, bucket) token totals (a tiny ≤ sources×256-row
    aggregate with map-side combine), (2) per-source running bucket
    offsets via a window over that tiny side only, (3) per-row running
    sum = broadcast bucket offset + within-(source, bucket) cumsum —
    every big window partition holds ~1/256 of one source.
    """
    from bag_parser_spark.operators.text import token_count_ws

    mapping = F.create_map(
        *[F.lit(x) for kv in budgets.items() for x in kv]
    )
    order = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    eligible = (
        df.withColumn("__budget__", mapping[F.col(source_col)])
        .filter(F.col("__budget__").isNotNull())
        .withColumn(tokens_name, token_count_ws(F.col(text_col)).cast("long"))
        .withColumn("__h__", order)
        .withColumn("__bkt__", F.substring(F.col("__h__"), 1, 2))
    )
    offsets = (
        eligible.groupBy(source_col, "__bkt__")
        .agg(F.sum(tokens_name).alias("__btok__"))
        .withColumn(
            "__offset__",
            F.coalesce(
                F.sum("__btok__").over(
                    Window.partitionBy(source_col)
                    .orderBy("__bkt__")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select(source_col, "__bkt__", "__offset__")
    )
    w = (
        Window.partitionBy(source_col, "__bkt__")
        .orderBy(F.col("__h__").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        eligible.join(F.broadcast(offsets), [source_col, "__bkt__"])
        .withColumn(
            cum_name,
            (F.col("__offset__") + F.sum(tokens_name).over(w)).cast("long"),
        )
        .filter(F.col(cum_name) <= F.col("__budget__"))
        .drop("__budget__", "__h__", "__bkt__", "__offset__")
    )


def _hashed_ngram_feats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int,
    seed: int | str,
    extra_cols: Sequence[str] = (),
) -> DataFrame:
    """Hashed unigram+bigram feature stream: one row per feature
    occurrence, (id, pos, bucket). ``pos`` is the deterministic
    1-based feature position (unigrams first, then bigrams) so
    downstream float folds can run in an engine-independent order.
    Bucketing is the portable md5 nibble fold (``md5_mod``) — any
    engine computes the identical bucket. Map-side except for the
    guarded fan-out: the per-feature md5 fan is CPU-dense (r12 profile:
    2.0 s of WARM single-task CPU riding a one-split scan while 31
    cores idled), so a small input is spread across the cores first
    (``fanout.fan_out_cpu_dense`` — no-op above the size threshold,
    so at corpus scale nothing shuffles here)."""
    from bag_parser_spark.operators.fanout import fan_out_cpu_dense

    df = fan_out_cpu_dense(
        df.select(id_col, *extra_cols, text_col), id_col
    )
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    # unigrams at pos 1..n, bigrams ("w1 w2") at pos n+1..2n-1; Spark
    # transform's index is 0-based, the DuckDB twin's is 1-based
    feats = F.expr(
        "transform(__toks__, (x, i) -> struct(i+1 AS pos, x AS f)) || "
        "transform(slice(__toks__, 1, size(__toks__)-1), (x, i) -> "
        "struct(size(__toks__)+i+1 AS pos, "
        "concat(x, ' ', __toks__[i+1]) AS f))"
    )
    return (
        df.select(
            F.col(id_col), *[F.col(c) for c in extra_cols],
            toks.alias("__toks__"),
        )
        .select(
            id_col, *extra_cols, F.explode(feats).alias("b")
        )
        .select(
            id_col,
            *extra_cols,
            F.col("b.pos").alias("pos"),
            md5_mod(F.col("b.f"), seed, n_buckets).alias("bucket"),
        )
    )


def dsir_logweights(
    docs: DataFrame,
    target: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 512,
    seed: int | str = "dsir",
    target_flag: str | None = None,
) -> DataFrame:
    """DSIR — Data Selection with Importance Resampling (Xie et al.
    2023, arXiv:2302.03169) over hashed n-gram features: estimate the
    target and raw feature-bucket distributions, score every raw
    document by its importance log-weight
    ``log w(x) = sum_f [ln p_target(bucket(f)) - ln p_raw(bucket(f))]``
    (add-one smoothing on both), and attach the Gumbel key
    ``log w + g`` (g = -ln(-ln(u)), u hash-derived per doc) whose
    descending top-k IS sampling-without-replacement proportional to
    w — the paper's resampling step, deterministic here because the
    Gumbel draw is a pure function of (seed, id).

    Scale shape: the feature stream is map-side (split/transform/
    explode, ``_hashed_ngram_feats``) and collapses IMMEDIATELY to
    per-(doc, bucket) counts — one shuffle whose map-side combine
    compresses every document to at most ``n_buckets`` rows no matter
    how long it is; the raw distribution derives from that persisted
    relation (no second corpus explode), the target distribution
    aggregates to ``n_buckets`` rows, the log-ratio table broadcasts
    back, and the per-document reduction folds ``n * lam`` in BUCKET
    order (sort_array + aggregate — ≤ ``n_buckets`` terms per doc) so
    every engine and every partitioning adds the same numbers in the
    same order; callers round for display (ln differs in the last ulp
    across libm implementations).

    The target corpus comes in ONE of two ways: ``target`` (a separate
    DataFrame with ``text_col`` — its own explode pass), or
    ``target_flag`` (the name of a boolean column ON ``docs`` marking
    the in-pool target members — zero extra passes: the flag rides the
    one feature stream, and both distributions derive from the same
    persisted (doc, bucket) relation; use this whenever target ⊆ pool).

    Returns (id, n_feats, dsir_logw, sample_key) — unrounded. The
    (doc, bucket) relation is persist()-ed (two consumers); the caller
    owns cache cleanup per the module convention.
    """
    if (target is None) == (target_flag is None):
        raise ValueError(
            "give exactly one of target (separate corpus) or "
            "target_flag (boolean column on docs)"
        )
    extra = (target_flag,) if target_flag is not None else ()
    raw_fb = (
        _hashed_ngram_feats(
            docs, id_col, text_col, n_buckets, seed, extra_cols=extra
        )
        .groupBy(id_col, "bucket", *extra)
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    rc = raw_fb.groupBy("bucket").agg(F.sum("n").alias("rc"))
    if target_flag is not None:
        tc = (
            raw_fb.filter(F.col(target_flag))
            .groupBy("bucket")
            .agg(F.sum("n").alias("tc"))
        )
    else:
        tgt_feats = _hashed_ngram_feats(
            target, id_col, text_col, n_buckets, seed
        )
        tc = tgt_feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("tc"))
    # totals ride the SAME tiny bucket table as unpartitioned window
    # sums (bounded by n_buckets rows by construction) instead of
    # separate 1-row broadcast jobs — two fewer jobs per run. FULL
    # join so Tt counts target buckets absent from the raw stream
    # (possible with a separate target corpus); the probe side then
    # keeps only raw buckets — smoothing keeps tc=0 buckets finite.
    wall = Window.partitionBy()
    j = rc.join(tc, "bucket", "full").select(
        "bucket",
        F.col("rc"),
        F.coalesce(F.col("tc"), F.lit(0)).alias("tc"),
    )
    lam = (
        j.withColumn("Tr", F.sum(F.coalesce(F.col("rc"), F.lit(0))).over(wall))
        .withColumn("Tt", F.sum("tc").over(wall))
        .filter(F.col("rc").isNotNull())
        .select(
            "bucket",
            (
                F.log(F.col("tc") + F.lit(1.0))
                - F.log(F.col("Tt") + F.lit(float(n_buckets)))
                - F.log(F.col("rc") + F.lit(1.0))
                + F.log(F.col("Tr") + F.lit(float(n_buckets)))
            ).alias("lam"),
        )
    )
    return _dsir_fold_and_key(raw_fb, lam, id_col, seed)


def _dsir_fold_and_key(
    doc_buckets: DataFrame,
    lam: DataFrame,
    id_col: str,
    seed: int | str,
) -> DataFrame:
    """(id, n_feats, dsir_logw, sample_key) from per-(doc, bucket)
    counts and a (bucket, lam) log-ratio table — the shared scoring
    tail of :func:`dsir_logweights` and :func:`dsir_score_frozen`.
    The lam table broadcasts; the per-document reduction folds in
    BUCKET order (sort_array + aggregate) so every engine and every
    partitioning adds the same doubles in the same order; the Gumbel
    key is a pure function of (seed, id)."""
    scored = (
        doc_buckets.join(F.broadcast(lam), "bucket")
        .withColumn("contrib", F.col("n").cast("double") * F.col("lam"))
        .groupBy(id_col)
        .agg(
            F.sum("n").cast("long").alias("n_feats"),
            F.aggregate(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("bucket", "contrib"))
                    ),
                    lambda x: x["contrib"],
                ),
                F.lit(0.0),
                lambda a, b: a + b,
            ).alias("dsir_logw"),
        )
    )
    u = (
        md5_mod(F.col(id_col), f"{seed}:g").cast("double") + F.lit(0.5)
    ) / F.lit(float(HASH_SPLIT_MOD))
    gumbel = -F.log(-F.log(u))
    return scored.withColumn(
        "sample_key", F.col("dsir_logw") + gumbel
    )


def dsir_lam_table(
    raw_ref: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    n_buckets: int = 512,
    seed: int | str = "dsir",
) -> DataFrame:
    """FROZEN DSIR importance distribution: the (bucket, lam) log-ratio
    table computed ONCE from a raw reference corpus and the target
    corpus — exactly the table :func:`dsir_logweights` derives inline,
    materialized over the FULL bucket range 0..n_buckets-1 (add-one
    smoothing gives absent buckets a finite lam, so any future
    document scores even when its buckets never appeared in either
    reference). This is the streaming contract (VERDICT r8 #6): a
    continuous ingest fixes the distribution at init time and scores
    every micro-batch against the same ``n_buckets`` rows, so
    selection is independent of how the corpus is split into batches.
    Output is ``n_buckets`` rows — persist it as a tiny parquet table
    and broadcast-join it per batch."""
    spark = raw_ref.sparkSession
    rid = F.monotonically_increasing_id().alias("__rid__")
    rc = (
        _hashed_ngram_feats(
            raw_ref.select(rid, F.col(text_col)),
            "__rid__", text_col, n_buckets, seed,
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("rc"))
    )
    tc = (
        _hashed_ngram_feats(
            target.select(rid, F.col(text_col)),
            "__rid__", text_col, n_buckets, seed,
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("tc"))
    )
    buckets = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    wall = Window.partitionBy()
    j = (
        buckets.join(rc, "bucket", "left")
        .join(tc, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("rc", F.lit(0)).alias("rc"),
            F.coalesce("tc", F.lit(0)).alias("tc"),
        )
    )
    return (
        j.withColumn("Tr", F.sum("rc").over(wall))
        .withColumn("Tt", F.sum("tc").over(wall))
        .select(
            "bucket",
            (
                F.log(F.col("tc") + F.lit(1.0))
                - F.log(F.col("Tt") + F.lit(float(n_buckets)))
                - F.log(F.col("rc") + F.lit(1.0))
                + F.log(F.col("Tr") + F.lit(float(n_buckets)))
            ).alias("lam"),
        )
    )


def dsir_score_frozen(
    docs: DataFrame,
    lam: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 512,
    seed: int | str = "dsir",
) -> DataFrame:
    """Score documents against a FROZEN lam table
    (:func:`dsir_lam_table` output): per-doc (id, n_feats, dsir_logw,
    sample_key) where every number depends only on (document text,
    id, the frozen table, seed) — NOT on which other documents share
    the batch. A threshold on ``sample_key`` therefore selects the
    SAME documents however the corpus is batched — the streaming twin
    of the batch top-k (which needs the whole corpus to rank).
    ``n_buckets``/``seed`` must match the values the table was built
    with (bucket ids are a function of both). One shuffle: the
    per-(doc, bucket) collapse, capped at n_buckets rows per doc."""
    doc_buckets = (
        _hashed_ngram_feats(docs, id_col, text_col, n_buckets, seed)
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return _dsir_fold_and_key(doc_buckets, lam, id_col, seed)
