"""Local mimic of the driver's DuckDB oracle comparison: run the Spark query
and the oracle SQL on the same parquet tables, compare row count, column
names, and order-insensitive values (exact after per-cell normalization)."""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb

from bag_parser_spark.sources.parquet import TABLES

SF_DIR = "/root/testdata/sf0.01"


def duck_con(sf_dir: str = SF_DIR) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def compare(spark, name, fn, sql, sf_dir: str = SF_DIR):
    """Returns (ok, message)."""
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    con = duck_con(sf_dir)
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    con.close()
    if sorted(scols) != sorted(dcols):
        return False, f"{name}: column mismatch spark={sorted(scols)} duck={sorted(dcols)}"
    if len(srows) != len(drows):
        return False, f"{name}: row count spark={len(srows)} duck={len(drows)}"
    _, sn = _norm_rows(scols, srows)
    _, dn = _norm_rows(dcols, drows)
    for i, (a, b) in enumerate(zip(sn, dn)):
        if a != b:
            return False, (
                f"{name}: value mismatch at sorted row {i}:\n  spark={a}\n  duck ={b}"
            )
    return True, f"{name}: OK ({len(srows)} rows)"
