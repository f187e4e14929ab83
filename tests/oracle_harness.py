"""Local mimic of the driver's DuckDB oracle comparison: run the Spark query
and the oracle SQL on the same parquet tables, compare row count, column
names, and order-insensitive values.

Driver parity (hard-won in round 1): the driver canonicalizes BOTH results
as pandas DataFrames before hashing, so dtype differences that Python-level
fetchall() hides are fatal there. Concretely, DuckDB SUM(BIGINT) returns
HUGEINT, which `.fetchall()` converts to plain int (masking the bug) but
`.df()` converts to float64 — while Spark's bigint arrives as int64. The
driver hashed those differently on three round-1 queries that were green
here. So this harness now (a) converts both sides to pandas exactly like
the driver, (b) fails on dtype-KIND mismatches (int vs float vs object vs
datetime) before comparing values, and (c) fails on list-valued object
cells, which crash the driver's pandas sort (unhashable type: 'list').
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from bag_parser_spark.sources.parquet import TABLES

SF_DIR = "/root/testdata/sf0.01"


def duck_con(sf_dir: str = SF_DIR) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Pin the connection timezone so any TIMESTAMPTZ that sneaks into an
    # oracle behaves identically on non-UTC hosts (ADVICE r3). Oracles are
    # still written tz-free (make_timestamp, naive TIMESTAMP) because the
    # driver's own connection is outside our control.
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    # np.ndarray first: pd.isna(ndarray) raises and the generic .item()
    # fallback crashes on size>1 arrays (ADVICE r2) — flatten like list.
    if isinstance(v, np.ndarray):
        return tuple(_norm_cell(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if v is None:
        return None
    # numpy scalars -> Python scalars so both engines compare equal
    if hasattr(v, "item") and type(v).__module__ == "numpy":
        v = v.item()
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return None
        return v.to_pydatetime()
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    return v


def _object_classes(series: pd.Series) -> set[str]:
    classes: set[str] = set()
    for v in series:
        if v is None:
            continue
        try:
            if not isinstance(v, (list, tuple)) and pd.isna(v):
                continue
        except (TypeError, ValueError):
            pass
        if isinstance(v, bool):
            classes.add("bool")
        elif isinstance(v, Decimal):
            classes.add("decimal")
        elif isinstance(v, int):
            classes.add("int")
        elif isinstance(v, float):
            classes.add("float")
        elif isinstance(v, (list, tuple, np.ndarray)):
            # Arrow toPandas / duckdb .df() hand back arrays as np.ndarray
            # cells — same driver-crash hazard as Python lists.
            classes.add("list")
        else:
            classes.add(type(v).__name__)
    return classes


def _normalize_date_columns(pdf: pd.DataFrame) -> pd.DataFrame:
    """Spark toPandas() renders DateType as object-dtype datetime.date cells
    while DuckDB .df() gives datetime64[us] — semantically equal, hashed
    equal by the driver (a3_latest_date is green in CORRECTNESS_r02), so
    the kind gate must not treat O(date) vs M as fatal. Convert pure-date
    object columns to datetime64 on BOTH sides before the gate."""
    out = pdf
    for col in pdf.columns:
        s = pdf[col]
        if s.dtype.kind != "O":
            continue
        non_null = [v for v in s if v is not None and not (isinstance(v, float) and math.isnan(v))]
        if non_null and all(
            isinstance(v, datetime.date) and not isinstance(v, datetime.datetime)
            for v in non_null
        ):
            if out is pdf:
                out = pdf.copy()
            out[col] = pd.to_datetime(s)
    return out


def _dtype_gate(name: str, spdf: pd.DataFrame, dpdf: pd.DataFrame):
    """Fail like the driver would, before any value comparison."""
    for col in spdf.columns:
        sk, dk = spdf[col].dtype.kind, dpdf[col].dtype.kind
        if sk != dk:
            return (
                f"{name}: column {col!r} pandas dtype-kind mismatch: "
                f"spark {spdf[col].dtype} vs duck {dpdf[col].dtype} — the "
                "driver hashes these differently (DuckDB HUGEINT/DECIMAL "
                "becomes float64; CAST sums/windows to BIGINT or DOUBLE "
                "in the oracle)"
            )
        if sk == "O":
            s_cls = _object_classes(spdf[col])
            d_cls = _object_classes(dpdf[col])
            if "list" in s_cls or "list" in d_cls:
                return (
                    f"{name}: column {col!r} contains list cells "
                    f"(spark={sorted(s_cls)} duck={sorted(d_cls)}) — the "
                    "driver canonicalization crashes on unhashable lists; "
                    "emit a JSON string or explode to flat rows"
                )
            if ("decimal" in d_cls) != ("decimal" in s_cls):
                return (
                    f"{name}: column {col!r} object-class mismatch "
                    f"spark={sorted(s_cls)} duck={sorted(d_cls)} — Decimal "
                    "on one side only hashes differently in the driver"
                )
    return None


def _norm_rows(pdf: pd.DataFrame):
    cols = sorted(pdf.columns)
    out = [
        tuple(_norm_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    out.sort(key=repr)
    return out


def compare(spark, name, fn, sql, sf_dir: str = SF_DIR):
    """Returns (ok, message)."""
    sdf = fn(spark, sf_dir)
    spdf = sdf.toPandas()
    con = duck_con(sf_dir)
    dpdf = con.execute(sql).df()
    con.close()
    scols, dcols = list(spdf.columns), list(dpdf.columns)
    if sorted(scols) != sorted(dcols):
        return False, f"{name}: column mismatch spark={sorted(scols)} duck={sorted(dcols)}"
    if len(spdf) != len(dpdf):
        return False, f"{name}: row count spark={len(spdf)} duck={len(dpdf)}"
    spdf = _normalize_date_columns(spdf)
    dpdf = _normalize_date_columns(dpdf)
    dtype_err = _dtype_gate(name, spdf, dpdf)
    if dtype_err:
        return False, dtype_err
    sn = _norm_rows(spdf)
    dn = _norm_rows(dpdf)
    for i, (a, b) in enumerate(zip(sn, dn)):
        if a != b:
            return False, (
                f"{name}: value mismatch at sorted row {i}:\n  spark={a}\n  duck ={b}"
            )
    return True, f"{name}: OK ({len(spdf)} rows)"
