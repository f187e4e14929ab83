"""Join operators (SURVEY §2.3 J1-J9).

All reference joins are equi left-outer joins against SQLite; several are
*update-joins* (UPDATE … FROM = left join + column overwrite). Spark-first
mapping:

- Dimension sides are broadcast (`F.broadcast`) — at 100 TB the fact table
  never shuffles for a dim lookup; only genuinely big-big joins (e.g.
  nummers ⋈ verblijfsobjecten, ~9.5M × 9M at NL scale, far larger on a
  training corpus) go sort-merge on the join key, and AQE converts to
  broadcast at runtime when a side turns out small.
- Update-joins compose as DataFrame → DataFrame functions so the reference's
  sequential UPDATE passes (database_sqlite.py:440-530) become one lineage —
  Catalyst collapses the projections; ordering is preserved by construction.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chained_left_join(
    fact: DataFrame,
    dims: Sequence[
        tuple[DataFrame, Column | str | list[str]]
        | tuple[DataFrame, Column | str | list[str], bool]
    ],
    broadcast_dims: bool = True,
) -> DataFrame:
    """J1/J9: fact LEFT JOIN dim1 LEFT JOIN dim2 … (reference
    database_sqlite.py:347-375, exporter.py:52-73).

    Each dim is (DataFrame, join-condition[, broadcast]). True dimension
    tables broadcast so the snowflake lookup chain (adressen ⋈
    openbare_ruimten ⋈ gemeenten ⋈ woonplaatsen ⋈ provincies) never
    shuffles the fact table. Pass ``broadcast=False`` for big-big sides
    (e.g. nummers ⋈ verblijfsobjecten at NL scale): NO hint is planted and
    AQE picks sort-merge at scale or converts to broadcast at runtime when
    the side turns out small — forcing a broadcast hint on a fact-sized
    side is an OOM at 1000 executors.
    """
    out = fact
    for spec in dims:
        dim, on = spec[0], spec[1]
        bcast = spec[2] if len(spec) > 2 else broadcast_dims
        right = F.broadcast(dim) if bcast else dim
        out = out.join(right, on=on, how="left")
    return out


def update_join(
    target: DataFrame,
    source: DataFrame,
    on: Column | str | list[str],
    set_cols: dict[str, Column],
    when_matched_only: bool = True,
) -> DataFrame:
    """J2/J3/J6: UPDATE target SET col = source.expr FROM source WHERE match
    (reference database_sqlite.py:79-85, 440-464, 522-530).

    ``set_cols`` maps target column name → replacement Column (may reference
    source columns). When ``when_matched_only``, unmatched target rows keep
    their original value (left join + conditional overwrite); the source must
    be unique on the join key or the update is ambiguous (the reference
    inherits SQLite's pick-one behavior; we require pre-deduped sources).
    """
    src = source.withColumn("__matched__", F.lit(True))
    joined = target.join(src, on=on, how="left")
    out = joined
    for name, expr in set_cols.items():
        if when_matched_only:
            out = out.withColumn(
                name, F.when(F.col("__matched__").isNotNull(), expr).otherwise(F.col(name))
            )
        else:
            out = out.withColumn(name, expr)
    drop = [c for c in src.columns if c not in target.columns]
    return out.drop(*drop)


def conditional_orphan_delete(
    df: DataFrame,
    dim: DataFrame,
    on: Column | str | list[str],
    threshold: int,
) -> DataFrame:
    """P12: delete orphan rows only when their count is below a threshold
    (reference database_sqlite.py:604-612, config.py:48 — orphan adressen
    are deleted only if fewer than ``delete_addresses_without_public_spaces_
    threshold``; a large count signals systemic breakage and the reference
    refuses to mass-delete).

    The orphan count is one driver-side action — the same control-flow
    decision the reference makes; both branches stay fully distributed
    (left_anti count, then left_semi keep or unchanged pass-through).
    """
    n_orphans = df.join(dim, on=on, how="left_anti").count()
    if n_orphans < threshold:
        return df.join(dim, on=on, how="left_semi")
    return df


def anti_join(left: DataFrame, right: DataFrame, on: Column | str | list[str]) -> DataFrame:
    """J7: NOT IN subquery semantics (reference database_sqlite.py:649-677).
    Spark's left_anti is NULL-safe unlike SQL NOT IN; the reference's probe
    sets are PK columns (never NULL) so semantics coincide."""
    return left.join(right, on=on, how="left_anti")


def semi_join(left: DataFrame, right: DataFrame, on: Column | str | list[str]) -> DataFrame:
    """J8: IN subquery / DISTINCT-probe semantics (database_sqlite.py:651,659)."""
    return left.join(right, on=on, how="left_semi")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
    salt_source: str | None = None,
) -> DataFrame:
    """Skew-mitigated equi-join: scatter each hot join key across ``salt``
    sub-keys. The left (big, skewed) side gets a deterministic salt from a
    hash of ``salt_source`` (default: the join key's row via xxhash64 of
    all columns); the right side is replicated ``salt`` times via a
    sequence explode, and the join runs on (key, salt).

    Result is IDENTICAL to ``left.join(right, on, how)`` — salting only
    changes the partition layout, so the oracle for a salted join is the
    plain join. Use when one key holds a disproportionate share of rows
    (a power-law domain column, a null-heavy foreign key): a plain
    shuffle join puts the whole hot key in one task; salted, it spreads
    over ``salt`` tasks at the cost of replicating the small side
    ``salt``x — the classic trade, cheap when the right side is
    dimension-sized. AQE skew-join handles moderate skew automatically;
    explicit salting is for the extreme tail where one key exceeds a
    whole executor.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    src = (
        [F.col(salt_source)]
        if salt_source is not None
        else [F.col(c) for c in left.columns]
    )
    l = left.withColumn("__salt__", F.pmod(F.xxhash64(*src), F.lit(salt)))
    r = right.withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("__salt__", F.col("__salt__").cast("long"))
    return l.join(r, on=[on, "__salt__"], how=how).drop("__salt__")


def merge_apply(
    target: DataFrame,
    cdc: DataFrame,
    key: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC batch to a snapshot — the relational core of MERGE INTO
    (Delta/Iceberg) and the incremental twin of the reference's REPLACE
    INTO upsert (reference database_sqlite.py:500-521, S7): the batch
    carries inserts/updates/deletes tagged in ``op_col`` ('I'/'U'/'D');
    the result is the next snapshot — untouched target rows, plus the
    I/U payloads, minus deleted keys.

    Shape: ONE left_anti join of the snapshot against the batch's key set
    (every key in the batch supersedes the target row — update and delete
    both remove the old version) unioned with the batch's surviving
    payloads. The anti join broadcasts when the batch is dimension-sized
    — the overwhelmingly common CDC case — so the snapshot never
    shuffles; a union is a no-op at plan level (no exchange). The batch
    must be key-unique (one op per key per batch — enforce upstream with
    last-write-wins, operators/dedup.py).
    """
    cols = [c for c in target.columns]
    keys = cdc.select(key)
    kept = target.join(F.broadcast(keys), on=key, how="left_anti")
    upserts = cdc.filter(F.col(op_col) != "D").select(*cols)
    return kept.unionByName(upserts)
