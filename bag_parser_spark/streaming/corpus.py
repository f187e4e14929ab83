"""Continuous corpus ingestion with incremental dedup — the streaming
twin of the batch `prepare` pipeline for the recurring-delivery case:
document batches arrive as files, and each micro-batch is deduplicated
against BOTH itself and everything already accepted, without ever
re-shingling the accepted corpus (only its stored MinHash signature
table is read — `dedup.minhash_lsh_pairs_incremental`).

State = parquet tables the job owns under ``state_dir``:
  accepted/       accepted documents (doc_id, text, content md5)
  signatures/     their MinHash signatures (minhash_signatures schema)
  domain_counts/  per-batch (domain, n) quota partials (url mode)
  deferred/       budget-rejected docs awaiting the next window (budget
                  mode) — consumed at the start of every batch, so the
                  ENGINE owns the re-offer; the source never re-sends

Per micro-batch (foreachBatch — stream-side joins against mutable
parquet state need batch semantics; a stateless stream join would pin
the state snapshot at query start):
  1. exact dedup inside the batch (min-id per content hash) and
     against accepted content hashes (anti join on md5),
  2. LSH candidates: survivors vs (survivors ∪ accepted signatures),
  3. exact n-gram Jaccard verification of candidate pairs against the
     union corpus (verify before delete — same ADVICE-r4 contract as
     batch prepare),
  4. reject batch docs clustered with an accepted doc (first-arrival
     wins — the streaming order analogue of batch min-id canonical) or
     with an earlier-id batch survivor,
  5. append accepted survivors + their signatures to the state tables.

Optional URL/domain stage (r7): registered-domain derivation + broadcast
blocklist before step 1, and a stateful PER-DOMAIN QUOTA between steps 4
and 5 — earlier batches consume quota first (first-arrival wins), with
the deterministic md5 fair draw breaking within-batch ties; the accepted
table then also stores registered_domain (mode checked consistent).

Scale shape: the accepted corpus's TEXT is only read for the
candidate-verification semi-join (bounded by candidate pairs); the
signature table is the only full-width state the LSH stage touches.
At 100 TB, store both state tables bucketed — signatures by (band,
bucket) for an exchange-free candidate join, accepted by doc_id for
the verification semi-join. Batch writes append new files only, so
state grows by increment size, never rewrites.

Delivery semantics: foreachBatch is at-least-once; a replayed batch
re-runs steps 1-4 against state that may already contain its output —
every accepted doc would then be rejected as an exact duplicate of
itself, so the append in step 5 is empty on replay and the state
converges (idempotent by the dedup itself). The two state appends are
ordered accepted-first: a crash between them leaves a doc accepted but
unsignatured — replay skips it (content dedup), so no duplicate rows
ever appear, at the cost that LSH misses future NEAR-dups of that one
doc until ``backfill_signatures`` repairs it (exact dups stay caught).
The reverse order would lose the document entirely on replay.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MH_N, _MH_HASHES, _MH_BANDS = 3, 12, 4


def _paths(state_dir: str) -> tuple[str, str]:
    return (
        os.path.join(state_dir, "accepted"),
        os.path.join(state_dir, "signatures"),
    )


def _counts_path(acc_path: str) -> str:
    return os.path.join(os.path.dirname(acc_path), "domain_counts")


def _deferred_path(acc_path: str) -> str:
    return os.path.join(os.path.dirname(acc_path), "deferred")


def _dsir_lam_path(state_dir: str) -> str:
    return os.path.join(state_dir, "dsir_lam")


_DSIR_BUCKETS = 512
_DSIR_SEED = "dsir"


def init_dsir_state(
    spark: SparkSession,
    state_dir: str,
    target_docs: DataFrame,
    raw_reference_docs: DataFrame,
    text_col: str = "text",
) -> int:
    """Freeze the DSIR importance distribution ONCE for a streaming
    ingest (VERDICT r8 #6): compute the (bucket, lam) log-ratio table
    from a raw reference corpus and the target corpus
    (``sampling.dsir_lam_table``) and persist it as the 512-row
    ``dsir_lam/`` parquet table in the state dir. Every later
    micro-batch scores against THIS table (``dsir_min_key`` on
    ``ingest_batch``), so whether 1000 documents arrive as one batch
    or as twenty, exactly the same documents pass the gate — per-doc
    scores depend only on (text, id, table, seed), never on
    batch-mates. Re-running REPLACES the table (a distribution change
    is a deliberate re-curation, not an append). Returns the row
    count (= the bucket count). Bucket count and seed are fixed
    module constants — the table is only meaningful against the same
    hashing parameters, exactly like the MinHash signature state."""
    from bag_parser_spark.operators import sampling

    lam = sampling.dsir_lam_table(
        raw_reference_docs,
        target_docs,
        text_col=text_col,
        n_buckets=_DSIR_BUCKETS,
        seed=_DSIR_SEED,
    )
    path = _dsir_lam_path(state_dir)
    lam.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path).count()


def ingest_batch(
    spark: SparkSession,
    batch: DataFrame,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    url_col: str | None = None,
    max_per_domain: int | None = None,
    domain_blocklist: DataFrame | None = None,
    robots_rules: DataFrame | None = None,
    robots_agent: str = "*",
    dsir_min_key: float | None = None,
    crawl_delays: DataFrame | None = None,
    batch_window_sec: float | None = None,
    max_deferred_per_domain: int | None = None,
) -> int:
    """Run one ingest round (steps 1-5 above) and append survivors to
    the state tables. Returns the number of newly accepted docs.
    Callable directly for backfills/tests; the stream wires it through
    foreachBatch.

    ``crawl_delays`` + ``batch_window_sec`` add the delay-derived
    politeness BUDGET to the domain stage (r10, VERDICT r9 #6 — the
    streaming twin of the batch frontier's budget): the effective
    per-domain delay for ``robots_agent`` (``urls.delay_for_agent`` —
    the same shadow semantics as the robots rule gate) caps each
    micro-batch's admissions per domain at ``politeness_budget(delay,
    batch_window_sec)`` = max(1, floor(window/delay)). The budget is
    PER BATCH (each micro-batch is one crawl window: a 10 s-delay host
    yields ≤2 slots per 20 s batch window no matter how many of its
    docs arrive), while ``max_per_domain`` stays the TOTAL quota vs
    accepted state — both ride one shared fair-draw ranking, so the
    admitted set is the top-min(budget, remaining-quota) prefix.
    Domains without a delay row are budget-uncapped (pass a
    default-delay row in the table to change that).

    A budget-REJECTED doc is a DEFERRAL the ENGINE owns (VERDICT r10
    #3): docs that pass every gate and the quota but land beyond their
    host's per-window budget are persisted to the ``deferred/`` state
    table at batch end, and every batch starts by prepending the
    deferred table to its candidates — so the re-offer rides the next
    window's budget slot with NO re-delivery from the source, exactly
    how a polite crawler requeues beyond-budget URLs. Quota rejects,
    by contrast, stay rejected while the quota is full and are never
    deferred. Deferred rows carry the ORIGINAL input columns (id,
    text, url), so every gate (blocklist, robots, DSIR, dedup) re-runs
    on the re-offer — all are deterministic per-doc functions, so the
    verdicts can only change when the configuration does, which is the
    desired behavior (an updated blocklist applies to the backlog
    too). ``deferred/`` is REWRITTEN each batch (consumed docs leave,
    still-over-budget docs stay), ordered AFTER the state appends: a
    crash before the rewrite re-offers already-admitted docs, which
    content dedup removes — over-offering is idempotent, the reverse
    order could lose admitted docs. Replay semantics: already-ADMITTED
    docs never double-admit (content dedup removes them before the
    ranking); a replayed window may admit a doc the original run
    deferred — the replay IS a next window, so that is the deferral
    working, not a violation (state stays duplicate-free and each
    window stays within budget). ``max_deferred_per_domain`` bounds the
    backlog: only that many fair-draw slots past each host's budget are
    deferred, the rest are dropped (a real crawl re-discovers them) —
    without it, a source that keeps out-delivering a slow host's
    budget grows ``deferred/`` without bound, and the backlog is
    rewritten every batch, so its size is a recurring per-batch cost.

    ``dsir_min_key`` adds the DSIR data-selection gate (the streaming
    twin of prepare's ``dsir_target``/``dsir_keep``, VERDICT r8 #6):
    each batch doc is scored against the FROZEN lam table persisted by
    :func:`init_dsir_state` and dropped unless its Gumbel sample_key
    reaches the threshold. Because the score is a pure per-doc
    function of (text, id, frozen table), the kept set is IDENTICAL
    for any batching of the same corpus — a thresholded selection, not
    the batch pipeline's corpus-wide top-k (which cannot exist without
    seeing the whole corpus at once; fix the threshold from a target
    acceptance quantile measured on the reference corpus). The gate
    runs before dedup — cheapest first, and per-doc determinism makes
    the order irrelevant to membership.

    Optional URL/domain stage (streaming twin of prepare_corpus's
    ``--url-col`` stages): with ``url_col`` set, each batch doc gets its
    registered domain (map-side), ``domain_blocklist`` rows are dropped
    up front (broadcast anti-join), and ``max_per_domain`` enforces a
    PER-DOMAIN QUOTA against the accepted state — earlier batches
    consume quota first (first-arrival wins, the stream analogue of the
    batch cap's fair draw; within one batch the md5 fair draw breaks
    ties deterministically). The accepted table then carries
    ``registered_domain``; the mode must be consistent from the first
    batch onward (checked — a mixed-mode append would silently fork the
    state schema). Quota runs AFTER dedup (steps 1-4), so a replayed
    batch is removed by content dedup before it could double-count
    quota, preserving replay idempotence.

    Single-writer assumption: the finally block frees every persistent
    RDD whose id is NEW since batch start (that is how the eager
    localCheckpoint blocks, which bypass the CacheManager, are found).
    The id diff cannot tell this batch's blocks from caches another
    query creates CONCURRENTLY on the same SparkSession mid-batch — a
    concurrent caller could silently lose its cache. Fine for the
    intended single-threaded foreachBatch stream; do not share the
    session with concurrent cache-creating work during a batch."""
    acc_path, sig_path = _paths(state_dir)
    have_state = os.path.isdir(acc_path)
    # Scoped cache accounting (ADVICE r5): the dedup helpers persist
    # intermediates (candidate pairs, shingle rows, banded signatures)
    # that have no caller-visible handle; on a continuous stream those
    # blocks would accumulate across micro-batches without bound. Every
    # helper appends its persists to cache_registry, and the batch frees
    # them — plus the eager localCheckpoint's executor blocks, found by
    # diffing persistent-RDD ids — after its writes. Long-lived caches
    # owned by other queries on the same session are untouched (unlike
    # release_cached_blocks, which drops everything).
    handles: list[DataFrame] = []
    jsc = spark.sparkContext._jsc
    rdd_ids_before = set(jsc.getPersistentRDDs().keys())
    try:
        return _ingest_batch_inner(
            spark, batch, acc_path, sig_path, have_state,
            id_col, text_col, threshold, handles,
            url_col, max_per_domain, domain_blocklist,
            robots_rules, robots_agent, dsir_min_key,
            crawl_delays, batch_window_sec, max_deferred_per_domain,
        )
    finally:
        # runs on success AND on a mid-batch crash — a failed batch must
        # not leak its caches into the stream's long-lived session
        for h in handles:
            h.unpersist()
        # eager localCheckpoint blocks bypass the CacheManager; free only
        # the ones THIS batch created (id diff), sparing unrelated caches
        for rid, jrdd in jsc.getPersistentRDDs().items():
            if rid not in rdd_ids_before:
                jrdd.unpersist(False)


def _ingest_batch_inner(
    spark: SparkSession,
    batch: DataFrame,
    acc_path: str,
    sig_path: str,
    have_state: bool,
    id_col: str,
    text_col: str,
    threshold: float,
    handles: list[DataFrame],
    url_col: str | None = None,
    max_per_domain: int | None = None,
    domain_blocklist: DataFrame | None = None,
    robots_rules: DataFrame | None = None,
    robots_agent: str = "*",
    dsir_min_key: float | None = None,
    crawl_delays: DataFrame | None = None,
    batch_window_sec: float | None = None,
    max_deferred_per_domain: int | None = None,
) -> int:
    from bag_parser_spark.operators import dedup

    if max_per_domain is not None and url_col is None:
        raise ValueError("max_per_domain needs url_col")
    if crawl_delays is not None and url_col is None:
        raise ValueError("crawl_delays needs url_col")
    if (crawl_delays is None) != (batch_window_sec is None):
        # a delay table without a window (or vice versa) cannot define a
        # budget — silently ignoring half the configuration would admit
        # unbudgeted batches while the caller believes politeness holds
        raise ValueError(
            "crawl_delays and batch_window_sec must be set together"
        )
    if max_deferred_per_domain is not None and crawl_delays is None:
        # the backlog only exists in budget mode — a cap without a
        # budget caps nothing, and silence would hide the config error
        raise ValueError("max_deferred_per_domain needs crawl_delays")
    if domain_blocklist is not None and url_col is None:
        # same guard as prepare_corpus: without url_col no domain exists
        # to block against — filtering silently NOTHING would be worse
        # than failing (ADVICE r7)
        raise ValueError("domain_blocklist needs url_col")
    if robots_rules is not None and url_col is None:
        raise ValueError("robots_rules needs url_col")
    # 0. consume the deferral backlog (VERDICT r10 #3): budget rejects
    # persisted by an earlier batch are PREPENDED to this batch's
    # candidates, so the engine owns the re-offer. Pinned eagerly — the
    # end-of-batch rewrite replaces the very files this read points at,
    # and a lazy plan would re-list them mid-write.
    defer_path = _deferred_path(acc_path)
    defer_sel = [id_col, text_col] + (
        [url_col] if url_col not in (None, id_col, text_col) else []
    )
    consumed_deferred = False
    if os.path.isdir(defer_path):
        backlog = spark.read.parquet(defer_path)
        if sorted(backlog.columns) != sorted(defer_sel):
            raise ValueError(
                f"deferred/ state carries columns {sorted(backlog.columns)} "
                f"but this batch's mode expects {sorted(defer_sel)} — the "
                "url_col configuration must be consistent across the "
                "stream's lifetime"
            )
        backlog = backlog.localCheckpoint(eager=True)
        batch = batch.select(*defer_sel).unionByName(backlog)
        consumed_deferred = True
    domain_cols: list[str] = []
    if url_col is not None:
        from bag_parser_spark.operators import urls

        domain_cols = ["registered_domain"]
        batch = urls.with_registered_domain_from_url(batch, url_col, spark)
        if domain_blocklist is not None:
            batch = urls.apply_domain_blocklist(
                batch, "registered_domain", domain_blocklist
            )
        if robots_rules is not None:
            # RFC 9309 politeness gate, streaming twin of
            # prepare_corpus's: the effective rule table is checkpointed
            # per batch (tiny; freed by the batch's id-diff finally) so
            # its subplan enters the batch lineage as one leaf — the
            # dedup stages below self-join that lineage, and an inline
            # rules subplan would be copied into every duplicate
            eff = urls.rules_for_agent(
                robots_rules, robots_agent
            ).localCheckpoint(eager=True)
            u = F.col(url_col)
            scheme, hostport, path, _ = urls.split_parts(u)
            paged = batch.withColumn(
                "__hostname__",
                F.split(
                    urls.canonical_host(hostport, F.lower(scheme)), ":", 2
                ).getItem(0),
            ).withColumn(
                "__npath__",
                F.when(path == "", F.lit("/")).otherwise(path),
            )
            batch = (
                urls.apply_robots(
                    paged,
                    eff,
                    id_col=id_col,
                    host_col="__hostname__",
                    path_col="__npath__",
                )
                .filter(F.col("allowed"))
                .drop(
                    "allowed", "matched_rule", "matched_prefix",
                    "__hostname__", "__npath__",
                )
            )
    if dsir_min_key is not None:
        # DSIR gate against the FROZEN distribution (init_dsir_state):
        # a per-doc thresholded score — batch-split invariant by
        # construction, so stream and backfill select identically. The
        # 512-row lam table broadcasts inside dsir_score_frozen; the
        # only added shuffle is the per-(doc, bucket) collapse over
        # THIS batch.
        from bag_parser_spark.operators import sampling

        lam_path = _dsir_lam_path(os.path.dirname(acc_path))
        if not os.path.isdir(lam_path):
            raise ValueError(
                "dsir_min_key set but dsir_lam/ state is missing — run "
                "streaming.corpus.init_dsir_state(spark, state_dir, "
                "target_docs, raw_reference_docs) once before the stream"
            )
        lam = spark.read.parquet(lam_path)
        chosen = (
            sampling.dsir_score_frozen(
                batch.select(id_col, text_col),
                lam,
                id_col=id_col,
                text_col=text_col,
                n_buckets=_DSIR_BUCKETS,
                seed=_DSIR_SEED,
            )
            .filter(F.col("sample_key") >= dsir_min_key)
            .select(id_col)
        )
        batch = batch.join(chosen, id_col, "left_semi")
    if have_state:
        acc_cols = spark.read.parquet(acc_path).columns
        if (url_col is not None) != ("registered_domain" in acc_cols):
            raise ValueError(
                "url_col mode must be consistent across the stream's "
                "lifetime: accepted state "
                + ("lacks" if url_col is not None else "carries")
                + " registered_domain (a mixed-mode append would fork "
                "the state schema)"
            )
    # budget mode carries the raw URL through the dedup stages: a
    # budget-rejected survivor is persisted to deferred/ in the
    # ORIGINAL input schema so the next batch re-runs every gate on it
    carry_url = (
        [url_col]
        if crawl_delays is not None and url_col not in (id_col, text_col)
        else []
    )
    docs = batch.select(
        F.col(id_col), F.col(text_col), *domain_cols, *carry_url,
        F.md5(text_col).alias("__content__"),
    )
    # 1. exact dedup: within batch (min id per content), then vs accepted
    docs = dedup.dedup_exact(docs, on=["__content__"], id_col=id_col)
    if have_state:
        accepted = spark.read.parquet(acc_path)
        docs = docs.join(
            accepted.select(F.col("__content__")), "__content__", "left_anti"
        )
    docs = docs.persist()
    handles.append(docs)

    # 2. LSH candidates: batch vs (batch ∪ accepted signatures). The
    # signature dir is probed separately from accepted/ — a crash between
    # the two step-5 appends can leave accepted docs unsignatured (see
    # module docstring), and a missing/empty signature dir must read as
    # empty, not fail the whole stream.
    if os.path.isdir(sig_path):
        base_sigs = spark.read.parquet(sig_path)
    else:
        # the empty table's __id__ must carry the CALLER's id type —
        # ingest_batch is directly callable with arbitrary id_col, and a
        # hardcoded long would hand string-id batches a type-mismatched
        # base that least/greatest downstream only survives via implicit
        # coercion (ADVICE r5)
        base_sigs = spark.createDataFrame(
            [],
            T.StructType(
                [T.StructField("__id__", batch.schema[id_col].dataType)]
                + [
                    T.StructField(f"h{i}", T.StringType())
                    for i in range(_MH_HASHES)
                ]
            ),
        )
    cand = dedup.minhash_lsh_pairs_incremental(
        docs,
        base_sigs,
        id_col=id_col,
        text_col=text_col,
        shingle_n=_MH_N,
        num_hashes=_MH_HASHES,
        bands=_MH_BANDS,
        cache_registry=handles,
    )
    # 3. verify against the union corpus (text needed for exact Jaccard)
    union_corpus = docs.select(id_col, text_col)
    if have_state:
        union_corpus = union_corpus.unionAll(
            spark.read.parquet(acc_path).select(id_col, text_col)
        )
    verified = dedup.verify_pairs_jaccard(
        union_corpus,
        cand,
        id_col=id_col,
        text_col=text_col,
        shingle_n=_MH_N,
        threshold=threshold,
        cache_registry=handles,
    )
    # 4. first-arrival wins: a batch doc near-dup to ANY accepted doc or
    # to a SMALLER-id batch doc is rejected. Pairs orient id_a < id_b;
    # accepted ids are disjoint from batch ids (caller contract, as in
    # minhash_lsh_pairs_incremental), so rejecting every id_b of a
    # verified pair implements both rules when accepted ids sort first —
    # enforced generally by rejecting whichever side is the batch doc
    # paired with an accepted doc, plus id_b for batch-batch pairs.
    batch_ids = docs.select(F.col(id_col).alias("__bid__"))
    reject_vs_accepted = (
        verified.join(
            batch_ids, verified["id_a"] == batch_ids["__bid__"], "left_semi"
        )
        .join(batch_ids.withColumnRenamed("__bid__", "__bid2__"),
              F.col("id_b") == F.col("__bid2__"), "left_anti")
        .select(F.col("id_a").alias(id_col))
    )  # id_a in batch, id_b accepted
    reject_b = (
        verified.join(
            batch_ids, verified["id_b"] == batch_ids["__bid__"], "left_semi"
        ).select(F.col("id_b").alias(id_col))
    )  # id_b in batch (paired with accepted id_a < it, or batch id_a < it)
    rejects = reject_vs_accepted.unionAll(reject_b).distinct()
    # localCheckpoint (eager), NOT persist: the survivor plan READS the
    # accepted/ path that step 5 APPENDS to, and Spark invalidates any
    # cache referencing a path being written — a persisted survivors
    # would silently recompute against the post-append state during the
    # signature write and drop every just-accepted doc's signature
    # (observed). Checkpointing truncates the lineage so the snapshot
    # predates the writes.
    survivors = docs.join(rejects, id_col, "left_anti").localCheckpoint(
        eager=True
    )

    # 4b. per-domain admission limits: the TOTAL quota vs accepted state
    # (max_per_domain — earlier batches consumed their slots first,
    # first-arrival) and/or the per-BATCH politeness budget
    # (crawl_delays — one micro-batch is one crawl window). This batch's
    # survivors fill the remaining slots in deterministic md5-fair-draw
    # order (same draw as sampling.sample_per_group / url_domain_cap).
    # The domain-count aggregate and the delay table are |domains| rows
    # — tiny vs the corpus; broadcast into the join. Runs on the
    # checkpointed survivors (post-dedup, pre-append), then
    # re-checkpoints: the count join reads acc_path, which step 5 is
    # about to append to, and a lazy plan would recompute against
    # post-append state during the signature write (the same observed
    # failure the survivors checkpoint guards).
    deferred_new: DataFrame | None = None
    if max_per_domain is not None or crawl_delays is not None:
        from pyspark.sql import Window

        from bag_parser_spark.operators import urls

        w = Window.partitionBy("registered_domain").orderBy(
            F.md5(F.concat(F.lit("domcap:"), F.col(id_col).cast("string"))),
            F.col(id_col),
        )
        ranked = survivors.withColumn("__rk__", F.row_number().over(w))
        budget_ok = F.lit(True)
        quota_ok = F.lit(True)
        drop_cols = ["__rk__"]
        if crawl_delays is not None:
            # per-BATCH politeness budget: the tiny effective-delay
            # table (delay_for_agent, same agent shadow as the robots
            # gate) maps to max(1, floor(window/delay)) slots and
            # broadcasts into the ranked survivors; domains without a
            # delay row are budget-uncapped (NULL passes). Both this
            # conjunct and the quota below are monotone prefixes of the
            # SAME fair-draw rank, so they compose to
            # top-min(budget, remaining-quota).
            budgets = urls.delay_for_agent(crawl_delays, robots_agent).select(
                F.col("domain").alias("registered_domain"),
                urls.politeness_budget(
                    F.col("crawl_delay"), batch_window_sec
                ).alias("__budget__"),
            )
            ranked = ranked.join(
                F.broadcast(budgets), "registered_domain", "left"
            )
            budget_ok = F.col("__budget__").isNull() | (
                F.col("__rk__") <= F.col("__budget__")
            )
            drop_cols.append("__budget__")
        if max_per_domain is not None:
            # Consumed-quota counts come from the domain_counts PARTIALS
            # (one tiny (domain, n) file appended per batch, summed on
            # read — the count-min streaming pattern), NOT from a groupBy
            # over accepted/: at 100 TB of accepted state a full-state
            # aggregate per micro-batch would dominate every batch. The
            # partial dir exists from the first url-mode batch (mode
            # consistency is enforced above); if it is missing while
            # accepted state exists (crash in the documented append window,
            # or a state dir predating counts), fail loudly and point at
            # the rebuild — silently recounting here would mask the gap.
            counts_path = _counts_path(acc_path)
            if os.path.isdir(counts_path):
                used = (
                    spark.read.parquet(counts_path)
                    .groupBy("registered_domain")
                    .agg(F.sum("n").alias("__used__"))
                )
            elif have_state:
                raise ValueError(
                    "domain_counts/ missing but accepted state exists — run "
                    "streaming.corpus.rebuild_domain_counts(spark, state_dir) "
                    "before resuming the quota stream"
                )
            else:
                used = None
            if used is not None:
                ranked = ranked.join(
                    used, "registered_domain", "left"
                ).withColumn(
                    "__used__", F.coalesce(F.col("__used__"), F.lit(0))
                )
            else:
                ranked = ranked.withColumn("__used__", F.lit(0))
            quota_ok = (
                F.col("__rk__") + F.col("__used__") <= max_per_domain
            )
            drop_cols.append("__used__")
        if crawl_delays is not None:
            # deferral set (VERDICT r10 #3): passed every gate AND the
            # quota judgment, lost only to this window's budget. Pinned
            # eagerly BEFORE the step-5 appends — its plan reads
            # counts_path/acc_path, which those appends mutate.
            defer_pred = ~budget_ok & quota_ok
            if max_deferred_per_domain is not None:
                # bounded backlog: only the next max_deferred_per_domain
                # fair-draw slots past the budget are kept; the rest are
                # dropped (the crawl re-discovers them). Without a cap a
                # source that keeps out-delivering a slow host's budget
                # grows deferred/ without bound — and the backlog is
                # REWRITTEN every batch, so its size is a per-batch cost,
                # not append-only state.
                defer_pred = defer_pred & (
                    F.col("__rk__")
                    <= F.col("__budget__") + F.lit(max_deferred_per_domain)
                )
            deferred_new = (
                ranked.filter(defer_pred)
                .select(*defer_sel)
                .localCheckpoint(eager=True)
            )
        survivors = (
            ranked.filter(budget_ok & quota_ok)
            .drop(*drop_cols)
            .localCheckpoint(eager=True)
        )

    # 5. append survivors + signatures (append-only state growth), plus
    # in url mode the batch's (domain, n) counts partial — written even
    # when no quota is set this batch, so enabling max_per_domain later
    # finds complete history. Append order accepted -> signatures ->
    # counts: a crash before the counts append leaves quota UNDER-
    # counting (could over-admit later); rebuild_domain_counts repairs
    # exactly like backfill_signatures repairs the signature window.
    n = survivors.count()
    if n:
        survivors.select(id_col, text_col, *domain_cols, "__content__").write.mode(
            "append"
        ).parquet(acc_path)
        dedup.minhash_signatures(
            survivors, id_col, text_col, _MH_N, _MH_HASHES
        ).write.mode("append").parquet(sig_path)
        if domain_cols:
            survivors.groupBy("registered_domain").agg(
                F.count(F.lit(1)).alias("n")
            ).write.mode("append").parquet(_counts_path(acc_path))
    # 6. rewrite the deferral backlog LAST: consumed docs leave (they
    # were admitted, re-deferred, or re-judged away by a gate/quota),
    # still-over-budget docs stay for the next window. Ordered after
    # every state append — a crash anywhere earlier leaves the old
    # backlog intact, and re-offering an already-admitted doc is
    # removed by content dedup (idempotent); the reverse order could
    # lose a deferred doc entirely. No repair pass is needed: the worst
    # a lost rewrite costs is one redundant re-offer, and a lost
    # backlog dir costs only politeness-deferred docs, never accepted
    # state (rebuild = nothing; the crawl re-discovers the URLs).
    if deferred_new is not None and not deferred_new.isEmpty():
        deferred_new.write.mode("overwrite").parquet(defer_path)
    elif consumed_deferred and os.path.isdir(defer_path):
        # backlog fully drained this batch — an empty parquet dir reads
        # back schemaless, so remove it instead of writing zero rows
        import shutil

        shutil.rmtree(defer_path)
    return n


def backfill_signatures(
    spark: SparkSession,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Repair pass for the documented crash window: a failure between the
    two step-5 appends leaves docs in ``accepted/`` with no row in
    ``signatures/`` — exact dedup still catches their full duplicates
    (content hash lives in accepted/), but LSH silently misses future
    NEAR-dups of the orphaned docs. This shingles exactly the orphans
    (anti-join of accepted ids against signature ids — at 100 TB that is
    an ids-only shuffle; text is read only for the orphan rows) and
    appends their signatures, restoring the invariant that every
    accepted doc is LSH-visible. Idempotent: a second run finds zero
    orphans. Run while the stream is quiesced (between micro-batches or
    on recovery before restart) — signatures/ is append-only, so the
    only race is double-appending an orphan's signature if a concurrent
    batch crashed in the same window again. Returns the number of docs
    backfilled. Uses the same MinHash parameters as ingest_batch —
    signatures are an artifact of (shingle_n, num_hashes), so a backfill
    with different constants would poison the bucket space.
    """
    from bag_parser_spark.operators import dedup

    acc_path, sig_path = _paths(state_dir)
    if not os.path.isdir(acc_path):
        return 0
    jsc = spark.sparkContext._jsc
    rdd_ids_before = set(jsc.getPersistentRDDs().keys())
    try:
        accepted = spark.read.parquet(acc_path)
        if os.path.isdir(sig_path):
            signed = spark.read.parquet(sig_path).select(
                F.col("__id__").alias(id_col)
            )
            orphans = accepted.join(signed, id_col, "left_anti")
        else:
            orphans = accepted
        # localCheckpoint pins the orphan set: the count and the
        # signature write must see the SAME snapshot even though the
        # write appends to a path the (unpinned) plan's anti-join reads
        orphans = orphans.select(id_col, text_col).localCheckpoint(
            eager=True
        )
        n = orphans.count()
        if n:
            dedup.minhash_signatures(
                orphans, id_col, text_col, _MH_N, _MH_HASHES
            ).write.mode("append").parquet(sig_path)
        return n
    finally:
        # free the checkpoint blocks (same scoped diff as ingest_batch)
        for rid, jrdd in jsc.getPersistentRDDs().items():
            if rid not in rdd_ids_before:
                jrdd.unpersist(False)


def rebuild_domain_counts(spark: SparkSession, state_dir: str) -> int:
    """Repair pass for the domain-quota crash window (the counts twin of
    ``backfill_signatures``): a failure between the accepted append and
    the counts append leaves ``domain_counts/`` under-counting — quota
    could over-admit. This recomputes the per-domain counts from
    ``accepted/`` (ONE full-state aggregate — exactly the cost the
    per-batch partials exist to avoid, paid only on repair) and REPLACES
    the partials with the consolidated result, which also compacts a
    long-running stream's many tiny partial files. Also the migration
    path for url-mode state created before domain_counts existed. Run
    while the stream is quiesced. Returns the number of domains."""
    acc_path, _ = _paths(state_dir)
    if not os.path.isdir(acc_path):
        return 0
    accepted = spark.read.parquet(acc_path)
    if "registered_domain" not in accepted.columns:
        raise ValueError(
            "accepted state has no registered_domain column — the stream "
            "never ran in url_col mode; nothing to rebuild"
        )
    counts = (
        accepted.groupBy("registered_domain")
        .agg(F.count(F.lit(1)).alias("n"))
        # materialize once: the write and the returned count would
        # otherwise each run the full-state aggregate
        .localCheckpoint(eager=True)
    )
    counts.write.mode("overwrite").parquet(_counts_path(acc_path))
    return counts.count()


def run_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string",
    url_col: str | None = None,
    max_per_domain: int | None = None,
    domain_blocklist: DataFrame | None = None,
    source_format: str = "parquet",
    robots_rules: DataFrame | None = None,
    robots_agent: str = "*",
    dsir_min_key: float | None = None,
    crawl_delays: DataFrame | None = None,
    batch_window_sec: float | None = None,
    max_deferred_per_domain: int | None = None,
) -> None:
    """Drain a file-source stream of incoming documents through
    ingest_batch with Trigger.AvailableNow (the backfill/test mode; a
    live deployment drops the trigger and runs continuously). The
    optional URL/domain stage flags — including the RFC 9309
    ``robots_rules``/``robots_agent`` politeness gate and the
    delay-derived per-batch budget (``crawl_delays`` +
    ``batch_window_sec``) — pass straight through to ingest_batch (set
    ``url_col`` in the schema's columns). Budget-deferred docs ride
    automatically: ingest_batch persists them to ``deferred/`` and
    prepends the backlog to the NEXT micro-batch's candidates, so a
    beyond-budget doc from batch N is admitted in a later window with
    no re-delivery from the file source (VERDICT r10 #3). One nuance
    under ``Trigger.AvailableNow``: a run that finds NO new files runs
    zero micro-batches, so the backlog waits for the next delivery —
    drain a tail backlog by calling :func:`ingest_batch` directly with
    an empty frame per remaining window (a live continuous trigger
    does not have this edge: every window fires a batch).

    ``source_format='warc'`` streams a CRAWL instead of parquet docs:
    `readStream.format("binaryFile")` tails the directory for new
    WARC/WARC.GZ segment files, and each micro-batch runs the same
    record parser + raw-web front half the batch path uses
    (`sources/warc.py::parse_warc_frame` / ``records_to_documents`` —
    HTTP 200 text/html → visible text → C4 line gate → canonical URL)
    before entering the incremental dedup; docs are keyed by URL and
    the domain stage defaults to that same column. ``schema`` is
    ignored in warc mode (the parser owns the record schema).
    ``source_format='jsonl'`` tails JSONL/JSONL.GZ files with the
    given ``schema`` (the interchange format real corpora ship in;
    Spark's json source decompresses .gz transparently).
    ``dsir_min_key`` enables the frozen-distribution DSIR gate per
    batch (requires a prior :func:`init_dsir_state`)."""
    if source_format == "warc":
        from bag_parser_spark.sources import warc as W

        stream = (
            spark.readStream.format("binaryFile")
            # streaming sources need an explicit schema; binaryFile's is
            # fixed by the format
            .schema(
                "path string, modificationTime timestamp, "
                "length long, content binary"
            )
            .option("pathGlobFilter", "*.warc*")
            .load(source_dir)
        )
        warc_url_col = url_col or "url"

        def handle(batch_df: DataFrame, batch_id: int) -> None:
            docs = (
                W.records_to_documents(W.parse_warc_frame(batch_df))
                .filter(~F.col("drop_doc"))
                .select("url", "text")
            )
            ingest_batch(
                spark, docs, state_dir,
                id_col="url",
                url_col=warc_url_col,
                max_per_domain=max_per_domain,
                domain_blocklist=domain_blocklist,
                robots_rules=robots_rules,
                robots_agent=robots_agent,
                dsir_min_key=dsir_min_key,
                crawl_delays=crawl_delays,
                batch_window_sec=batch_window_sec,
                max_deferred_per_domain=max_deferred_per_domain,
            )

        q = (
            stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return

    if source_format == "jsonl":
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "*.json*")
            .json(source_dir)
        )
    else:
        stream = spark.readStream.schema(schema).parquet(source_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(
            spark, batch_df, state_dir,
            url_col=url_col,
            max_per_domain=max_per_domain,
            domain_blocklist=domain_blocklist,
            robots_rules=robots_rules,
            robots_agent=robots_agent,
            dsir_min_key=dsir_min_key,
            crawl_delays=crawl_delays,
            batch_window_sec=batch_window_sec,
            max_deferred_per_domain=max_deferred_per_domain,
        )

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
