"""K-means over embedding columns, expressed scale-first and relational.

The reference engine has no ML operators; this is extension surface for the
training-data pipeline (corpus clustering, IVF coarse-quantizer training —
operators/similarity.py:ivf_topk consumes exactly these centroids).

Design: one k-means step = assignment (nearest centroid by squared L2) +
update (per-dimension mean of assigned vectors). The classic distributed
failure mode is float nondeterminism — a Σfloat whose partial-merge order
is partition-layout-dependent, making runs irreproducible and oracle
comparison impossible. Here EVERYTHING up to the final division is exact
integer arithmetic on fixed-point components (``x → round(x · 2^20)``):

- distances: Σ (xq − cq)² over 64-dim int components — associative,
  overflow-safe (|xq| ≲ 2^21 ⇒ Σ of 64 squares ≲ 2^48);
- argmin: ``min(struct(d2, cid))`` — a partial-aggregable reduction, never
  a window over an n×k product;
- update: Σ xq per (cid, dim) as BIGINT, divided back to double once at
  the end with one fixed expression tree.

So a 1000-executor run, a local[32] run, and a single-threaded oracle all
produce bit-identical centroids. The fixed-point trade (≈1e-6 component
rounding) is far below embedding noise and is the price of distributed
reproducibility — same trick as aggregates.py:exact_sum's decimals.

Plan shape per step: component explode is map-only; the n×k distance
product is generated map-side against BROADCAST centroid components and
collapsed by partial aggregation before the exchange (shuffle carries n·k
(vec, cid, partial-d2) rows, never n·k·dim); update shuffles n·dim
(cid, dim, xq) rows with map-side combine. Per iteration that is two
bounded shuffles — the shape that survives 100 TB. The driver loop
re-broadcasts k·dim longs per iteration (tiny) and truncates lineage so
iteration i+1's DAG does not replay iterations 1..i.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 2^20 fixed-point scale: float32 embeddings carry <= 2^-24 relative
# precision around |x|<1, so 20 fractional bits round at ~1e-6 absolute —
# below the data's own noise floor — while keeping 64-dim squared sums
# far inside BIGINT range.
FIXED_POINT = 1 << 20


def _explode_fixed(df: DataFrame, id_col: str, vec_col: str, out_id: str):
    """(id, i, q): 1-based component index, fixed-point int component.
    Map-only; both engines compute round(cast(x as double) * 2^20)."""
    ex = df.select(
        F.col(id_col).alias(out_id),
        F.posexplode(F.col(vec_col)).alias("i", "x"),
    )
    q = F.round(F.col("x").cast("double") * F.lit(float(FIXED_POINT))).cast(
        "long"
    )
    return ex.select(out_id, (F.col("i") + 1).cast("long").alias("i"), q.alias("q"))


def kmeans_step(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cid_col: str = "cid",
) -> DataFrame:
    """One exact k-means iteration. ``centroids`` is (cid, embedding) with
    NUMERIC cid; returns exploded new centroids
    ``(cid, i, centroid_val, n_members)`` — flat rows so every component is
    value-checkable (the harness cannot hash array cells).

    Empty clusters drop out (standard Lloyd's); the caller decides whether
    to reseed. ``centroid_val = (Σ xq / n) / 2^20`` evaluated with one
    fixed expression tree — bit-identical on any engine or cluster layout.
    """
    vq = _explode_fixed(vectors, id_col, vec_col, "__vid__")
    cq = _explode_fixed(centroids, cid_col, vec_col, "__cid__")
    # n×k distance product: join on the dimension index against broadcast
    # centroid components; partial agg collapses dims map-side.
    d = F.col("vq") - F.col("cq")
    dists = (
        vq.select("__vid__", "i", F.col("q").alias("vq"))
        .join(
            F.broadcast(
                cq.select("__cid__", "i", F.col("q").alias("cq"))
            ),
            "i",
        )
        .groupBy("__vid__", "__cid__")
        .agg(F.sum(d * d).alias("d2"))
    )
    assign = (
        dists.groupBy("__vid__")
        .agg(F.min(F.struct("d2", "__cid__")).alias("__best__"))
        .select("__vid__", F.col("__best__.__cid__").alias("__cid__"))
    )
    # update: per-(cid, dim) exact integer sums over assigned vectors
    upd = (
        vq.join(assign, "__vid__")
        .groupBy("__cid__", "i")
        .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("n_members"))
    )
    val = (
        F.col("s").cast("double")
        / F.col("n_members").cast("double")
        / F.lit(float(FIXED_POINT))
    )
    return upd.select(
        F.col("__cid__").alias("cid"),
        "i",
        val.alias("centroid_val"),
        "n_members",
    )


def kmeans(
    vectors: DataFrame,
    k: int,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's loop: seed with the k lowest-id vectors (deterministic —
    k-means++ would need a sequential scan; at corpus scale seed from a
    hash-sample instead), run ``kmeans_step`` ``iters`` times. Returns the
    final exploded centroids.

    Iteration discipline for a distributed loop: each step's output is
    localCheckpoint-materialized so step i+1's DAG starts from data, not
    from a lineage replaying steps 1..i (an unchecked loop builds an
    O(iters)-deep plan that recompiles and recomputes quadratically).
    The checkpointed table is k·dim rows — trivially small; the big table
    is scanned twice per iteration (assignment product + update sums),
    the algorithm's real cost — persist the exploded components between
    the two uses only if executor memory can hold the dim-fold inflation,
    otherwise the columnar re-scan is the cheaper side of the trade.
    """
    seeds = (
        vectors.orderBy(F.col(id_col).asc())
        .limit(k)
        .select(F.col(id_col).alias("cid"), F.col(vec_col))
    )
    cent = seeds
    for _ in range(iters):
        stepped = kmeans_step(vectors, cent, id_col, vec_col, "cid")
        # rebuild (cid, embedding) for the next round; array_agg ordered by
        # dim — k·dim rows, driver-safe
        cent = (
            stepped.groupBy("cid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("i", "centroid_val"))
                ).alias("__pairs__")
            )
            .select(
                "cid",
                F.transform(
                    F.col("__pairs__"), lambda p: p["centroid_val"].cast("float")
                ).alias(vec_col),
            )
            .localCheckpoint(eager=True)
        )
    return kmeans_step(vectors, cent, id_col, vec_col, "cid")


def pca_power_step(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One exact power-iteration step for the (uncentered) top principal
    direction: s = Aᵀ(A·1) over fixed-point components — the building
    block of distributed PCA, expressed as two aggregations with NO float
    accumulation anywhere.

    Per row: inner_r = Σ_i q_ri (the start vector is all-ones, so the
    matvec is a row sum — integer). Then s_j = Σ_r q_rj · inner_r —
    integer products, integer sums, exact on any engine or partitioning.
    The normalized direction divides by max|s| (1-row broadcast) with ONE
    IEEE division at the end, rounded to 6. Overflow budget: |q| ≤
    2^20·|x|, so |s| ≤ rows · dim · (2^20·max|x|)² — at 64 dims and
    |x| ≤ 1 that holds to ~2^21 rows; beyond, lower FIXED_POINT or merge
    per-partition partials hierarchically (both preserve exactness).
    Iterating: feed `direction` back as the next start vector (quantized
    the same way) — each step is this same two-aggregation job.
    """
    vq = _explode_fixed(vectors, id_col, vec_col, "__vid__")
    inner = vq.groupBy("__vid__").agg(F.sum("q").alias("__inner__"))
    s = (
        vq.join(inner, "__vid__")
        .groupBy("i")
        .agg(F.sum(F.col("q") * F.col("__inner__")).alias("s"))
    )
    m = s.agg(F.max(F.abs(F.col("s"))).alias("__m__"))
    return (
        s.crossJoin(F.broadcast(m))
        .select(
            "i",
            "s",
            F.round(
                F.col("s").cast("double") / F.col("__m__").cast("double"), 6
            ).alias("direction"),
        )
    )


def _centroid_table(stepped: DataFrame, vec_col: str) -> DataFrame:
    """(cid, vec_col float array) from a kmeans_step output — the shape
    the next iteration consumes. k·dim rows in, k rows out."""
    return (
        stepped.groupBy("cid")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("i", "centroid_val"))
            ).alias("__pairs__")
        )
        .select(
            "cid",
            F.transform(
                F.col("__pairs__"), lambda p: p["centroid_val"].cast("float")
            ).alias(vec_col),
        )
    )


def kmeans_converged(
    vectors: DataFrame,
    k: int,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Lloyd's loop to a fixed horizon WITH a convergence metric — the
    ``kmeans`` twin that also reports how far each centroid still moved
    on the final iteration (the number a training job watches to decide
    the horizon was enough). Returns the final exploded centroids
    ``(cid, i, centroid_val, n_members, shift_q)`` where ``shift_q`` is
    the per-centroid L1 movement of the last step in fixed-point
    integer units: ``Σ_i |requant(new) − q(old)|`` with requant the
    exact float-cast round-trip the next iteration would apply — an
    INTEGER, so the convergence signal is bit-identical on any engine
    or cluster layout (same discipline as the rank micro-units in
    ml_pagerank_converged). Iteration state is k·dim rows and is
    lineage-cut per round (the ``kmeans`` contract): localCheckpoint
    by default, reliable ``checkpoint()`` under ``checkpoint_dir`` when
    given — identical output, executor-loss-survivable state (the
    cluster posture; see ``operators/lineage.py``). The big table is
    scanned twice per iteration — the algorithm's real cost at any
    scale.
    """
    from bag_parser_spark.operators.lineage import cut_lineage

    seeds = (
        vectors.orderBy(F.col(id_col).asc())
        .limit(k)
        .select(F.col(id_col).alias("cid"), F.col(vec_col))
    )
    cent = seeds
    for _ in range(iters - 1):
        stepped = kmeans_step(vectors, cent, id_col, vec_col, "cid")
        cent = cut_lineage(
            _centroid_table(stepped, vec_col), checkpoint_dir
        )
    final = kmeans_step(vectors, cent, id_col, vec_col, "cid")
    old_q = _explode_fixed(cent, "cid", vec_col, "cid").select(
        "cid", "i", F.col("q").alias("__oldq__")
    )
    # requantize exactly as the next round would: double -> float ->
    # double -> fixed point (one fixed expression tree on both engines)
    new_q = F.round(
        F.col("centroid_val")
        .cast("float")
        .cast("double")
        * F.lit(float(FIXED_POINT))
    ).cast("long")
    shifts = (
        final.withColumn("__newq__", new_q)
        .join(F.broadcast(old_q), ["cid", "i"])
        .groupBy("cid")
        .agg(
            F.sum(F.abs(F.col("__newq__") - F.col("__oldq__")))
            .cast("long")
            .alias("shift_q")
        )
    )
    return final.join(F.broadcast(shifts), "cid").select(
        "cid", "i", "centroid_val", "n_members", "shift_q"
    )
