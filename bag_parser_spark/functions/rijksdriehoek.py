"""RD (Rijksdriehoek, EPSG:28992) ↔ WGS84 coordinate transform.

Implements the published Schreutelkamp & Strang van Hees approximation
polynomials ("Benaderingsformules voor de transformatie tussen RD- en
WGS84-kaartcoördinaten", GeoInformatie Nederland) — the same closed form the
reference uses (reference bag/rijksdriehoek.py:12-96). The reference applies
it row-at-a-time in Python; here it is pure Column arithmetic, so it stays
inside Catalyst/whole-stage-codegen — no UDF, no Python round-trip, fully
vectorized on the JVM. At 100 TB that's the difference between a projection
and a serialization bottleneck.

``*_sql`` twins emit the identical expression as ANSI SQL (same operand
order, so IEEE-754 results are bit-identical) for DuckDB oracle checks.

Accuracy: ~decimeter within NL (as published); exact at the Amersfoort base
point (Onze Lieve Vrouwetoren: rd 155000,463000 → 52.15517440, 5.38720621).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Base point: Onze Lieve Vrouwetoren, Amersfoort (published constants)
X0 = 155000.0
Y0 = 463000.0
PHI0 = 52.15517440
LAM0 = 5.38720621

# (p, q, coefficient) triples of the published approximation polynomials.
# phi/lam terms are in arcseconds (hence /3600).
PQK = [
    (0, 1, 3235.65389),
    (2, 0, -32.58297),
    (0, 2, -0.24750),
    (2, 1, -0.84978),
    (0, 3, -0.06550),
    (2, 2, -0.01709),
    (1, 0, -0.00738),
    (4, 0, 0.00530),
    (2, 3, -0.00039),
    (4, 1, 0.00033),
    (1, 1, -0.00012),
]
PQL = [
    (1, 0, 5260.52916),
    (1, 1, 105.94684),
    (1, 2, 2.45656),
    (3, 0, -0.81885),
    (1, 3, 0.05594),
    (3, 1, -0.05607),
    (0, 1, 0.01199),
    (3, 2, -0.00256),
    (1, 4, 0.00128),
    (0, 2, 0.00022),
    (2, 0, -0.00022),
    (5, 0, 0.00026),
]
PQR = [
    (0, 1, 190094.945),
    (1, 1, -11832.228),
    (2, 1, -114.221),
    (0, 3, -32.391),
    (1, 0, -0.705),
    (3, 1, -2.34),
    (1, 3, -0.608),
    (0, 2, -0.008),
    (2, 3, 0.148),
]
PQS = [
    (1, 0, 309056.544),
    (0, 2, 3638.893),
    (2, 0, 73.077),
    (1, 2, -157.984),
    (3, 0, 59.788),
    (0, 1, 0.433),
    (2, 2, -6.439),
    (1, 1, -0.032),
    (0, 4, 0.092),
    (1, 4, -0.054),
]


def _pow_col(c: Column, n: int) -> Column:
    """Repeated multiplication instead of pow() so Spark and DuckDB evaluate
    the identical IEEE multiply chain (pow() may route through exp/log)."""
    if n == 0:
        return F.lit(1.0)
    out = c
    for _ in range(n - 1):
        out = out * c
    return out


def _pow_sql(e: str, n: int) -> str:
    if n == 0:
        return "1.0"
    return "(" + " * ".join([e] * n) + ")"


def rd_to_wgs84_lat(x: Column, y: Column) -> Column:
    dx = F.lit(1e-5) * (x - F.lit(X0))
    dy = F.lit(1e-5) * (y - F.lit(Y0))
    phi = F.lit(PHI0)
    for p, q, k in PQK:
        phi = phi + F.lit(k) * _pow_col(dx, p) * _pow_col(dy, q) / F.lit(3600.0)
    return phi


def rd_to_wgs84_lon(x: Column, y: Column) -> Column:
    dx = F.lit(1e-5) * (x - F.lit(X0))
    dy = F.lit(1e-5) * (y - F.lit(Y0))
    lam = F.lit(LAM0)
    for p, q, l in PQL:
        lam = lam + F.lit(l) * _pow_col(dx, p) * _pow_col(dy, q) / F.lit(3600.0)
    return lam


def wgs84_to_rd_x(phi: Column, lam: Column) -> Column:
    dphi = F.lit(0.36) * (phi - F.lit(PHI0))
    dlam = F.lit(0.36) * (lam - F.lit(LAM0))
    rd_x = F.lit(X0)
    for p, q, r in PQR:
        rd_x = rd_x + F.lit(r) * _pow_col(dphi, p) * _pow_col(dlam, q)
    return rd_x


def wgs84_to_rd_y(phi: Column, lam: Column) -> Column:
    dphi = F.lit(0.36) * (phi - F.lit(PHI0))
    dlam = F.lit(0.36) * (lam - F.lit(LAM0))
    rd_y = F.lit(Y0)
    for p, q, s in PQS:
        rd_y = rd_y + F.lit(s) * _pow_col(dphi, p) * _pow_col(dlam, q)
    return rd_y


# ---- SQL twins (identical operand order → bit-identical doubles) ----

def _d(v: float) -> str:
    """Double literal for DuckDB — scientific notation forces DOUBLE (plain
    decimal literals parse as DECIMAL and the multiply chain overflows)."""
    return f"{v!r}::DOUBLE"


def _poly_sql(base: float, terms: list[tuple[int, int, float]],
              dx: str, dy: str, div3600: bool) -> str:
    expr = _d(base)
    for p, q, k in terms:
        term = f"{_d(k)} * {_pow_sql(dx, p)} * {_pow_sql(dy, q)}"
        if div3600:
            term += f" / {_d(3600.0)}"
        expr = f"({expr} + {term})"
    return expr


def rd_to_wgs84_lat_sql(x: str, y: str) -> str:
    dx = f"({_d(1e-05)} * ({x} - {_d(X0)}))"
    dy = f"({_d(1e-05)} * ({y} - {_d(Y0)}))"
    return _poly_sql(PHI0, PQK, dx, dy, True)


def rd_to_wgs84_lon_sql(x: str, y: str) -> str:
    dx = f"({_d(1e-05)} * ({x} - {_d(X0)}))"
    dy = f"({_d(1e-05)} * ({y} - {_d(Y0)}))"
    return _poly_sql(LAM0, PQL, dx, dy, True)


def wgs84_to_rd_x_sql(phi: str, lam: str) -> str:
    dphi = f"({_d(0.36)} * ({phi} - {_d(PHI0)}))"
    dlam = f"({_d(0.36)} * ({lam} - {_d(LAM0)}))"
    return _poly_sql(X0, PQR, dphi, dlam, False)


def wgs84_to_rd_y_sql(phi: str, lam: str) -> str:
    dphi = f"({_d(0.36)} * ({phi} - {_d(PHI0)}))"
    dlam = f"({_d(0.36)} * ({lam} - {_d(LAM0)}))"
    return _poly_sql(Y0, PQS, dphi, dlam, False)
