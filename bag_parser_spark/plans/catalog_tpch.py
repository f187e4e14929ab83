"""Catalog extension: the classic TPC-H analytics queries expressible
over the driver's TPC-H-ish star schema — Q1 pricing summary, Q3
shipping priority, Q4 order priority (EXISTS), Q5 local-supplier volume,
Q6 forecast revenue, Q10 returned items, Q14 promotion effect, Q18
large-volume customers. The industry-standard shapes a user would reach
for first when checking an analytics engine; the remaining TPC-H queries
need columns (partsupp, shipmode, commit/receipt dates) the synthetic
schema doesn't carry.

Float discipline (see a22_linreg_suffstats): the 2-decimal money columns
rescale to exact integer cents/percent (round(x*100) — identical double
product and round on both engines), every aggregate sums integers or
their DECIMAL(38,0) products, and only the final unit conversion divides
back to double through an identical expression tree. TPC-H's revenue
expressions p*(1-d) and p*(1-d)*(1+t) become pc*(100-dp) / 1e4 and
pc*(100-dp)*(100+tp) / 1e6 — bit-exact on any partition layout, which a
naive double SUM can never be.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bag_parser_spark.plans.catalog import register
from bag_parser_spark.sources.parquet import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _ts_lit(df, col, s):
    """Timestamp literal matching the column's (NTZ or LTZ) type, so the
    query survives either parquet ts encoding the driver has shipped."""
    return F.lit(s).cast(dict(df.dtypes)[col])


def _cents(col):
    return F.round(F.col(col) * 100.0).cast("long")


# ---------------------------------------------------------------------------
# Q1 — pricing summary report
# ---------------------------------------------------------------------------

@register(
    "tpch_q1_pricing_summary",
    """
    WITH c AS (
      SELECT l_returnflag, l_linestatus,
             CAST(round(l_quantity * 100.0) AS BIGINT) AS qc,
             CAST(round(l_extendedprice * 100.0) AS BIGINT) AS pc,
             CAST(round(l_discount * 100.0) AS BIGINT) AS dp,
             CAST(round(l_tax * 100.0) AS BIGINT) AS tp
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    )
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(qc) AS DOUBLE) / 100.0 AS sum_qty,
           CAST(SUM(pc) AS DOUBLE) / 100.0 AS sum_base_price,
           CAST(SUM(CAST(pc * (100 - dp) AS DECIMAL(38,0))) AS DOUBLE)
             / 10000.0 AS sum_disc_price,
           CAST(SUM(CAST(pc * (100 - dp) AS DECIMAL(38,0))
                    * CAST(100 + tp AS DECIMAL(38,0))) AS DOUBLE)
             / 1000000.0 AS sum_charge,
           CAST(SUM(qc) AS DOUBLE) / 100.0 / COUNT(*) AS avg_qty,
           CAST(SUM(pc) AS DOUBLE) / 100.0 / COUNT(*) AS avg_price,
           CAST(SUM(dp) AS DOUBLE) / 100.0 / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM c GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1: the canonical scan-heavy grouped aggregate — one full "
    "fact scan, four-way grouped sums/avgs, tiny result. Plan: filter "
    "pushed to the parquet scan, map-side partial aggregation collapses "
    "to |flags x statuses| groups before the (only) shuffle. All sums "
    "are integer cents / DECIMAL(38,0) products (see module header), so "
    "sum_disc_price and sum_charge are bit-exact where the textbook "
    "double SUM(p*(1-d)) is layout-dependent.",
)
def q_tpch_q1(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    l = l.filter(
        F.col("l_shipdate") <= _ts_lit(l, "l_shipdate", "1998-09-02")
    )
    qc, pc = _cents("l_quantity"), _cents("l_extendedprice")
    dp, tp = _cents("l_discount"), _cents("l_tax")
    disc = (pc * (100 - dp)).cast("decimal(38,0)")
    charge = disc * (100 + tp).cast("decimal(38,0)")
    n = F.count(F.lit(1))
    return (
        l.select(
            "l_returnflag",
            "l_linestatus",
            qc.alias("qc"),
            pc.alias("pc"),
            dp.alias("dp"),
            disc.alias("disc"),
            charge.alias("charge"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum("qc").cast("double") / 100.0).alias("sum_qty"),
            (F.sum("pc").cast("double") / 100.0).alias("sum_base_price"),
            (F.sum("disc").cast("double") / 10000.0).alias("sum_disc_price"),
            (F.sum("charge").cast("double") / 1000000.0).alias("sum_charge"),
            (F.sum("qc").cast("double") / 100.0 / n).alias("avg_qty"),
            (F.sum("pc").cast("double") / 100.0 / n).alias("avg_price"),
            (F.sum("dp").cast("double") / 100.0 / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Q3 — shipping priority (top-10 unshipped orders by revenue)
# ---------------------------------------------------------------------------

@register(
    "tpch_q3_shipping_priority",
    """
    SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
           CAST(SUM(CAST(CAST(round(l.l_extendedprice * 100.0) AS BIGINT)
                         * (100 - CAST(round(l.l_discount * 100.0)
                                       AS BIGINT))
                         AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
      AND l.l_shipdate  > TIMESTAMP '1996-07-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate ASC, l.l_orderkey ASC
    LIMIT 10
    """,
    doc="TPC-H Q3: selective dim filter -> fact-fact join -> grouped "
    "revenue -> global top-10. Plan: the BUILDING customers broadcast "
    "into orders (dim-sized), the orders->lineitem join is the one real "
    "shuffle (both sides date-pruned at the scan), and the top-10 runs "
    "as TakeOrderedAndProject (per-partition heaps + driver merge of "
    "10, never a global sort). Revenue is the integer-cents sum, and "
    "the ORDER BY carries (o_orderdate, l_orderkey) tiebreaks so the "
    "LIMIT frontier is total-ordered — identical rows on both engines "
    "even under revenue ties.",
)
def q_tpch_q3(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = _t(spark, sf_dir, "orders")
    o = o.filter(F.col("o_orderdate") < _ts_lit(o, "o_orderdate", "1996-07-01"))
    l = _t(spark, sf_dir, "lineitem")
    l = l.filter(F.col("l_shipdate") > _ts_lit(l, "l_shipdate", "1996-07-01"))
    rev = (
        _cents("l_extendedprice") * (100 - _cents("l_discount"))
    ).cast("decimal(38,0)")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(l, F.col("o_orderkey") == l["l_orderkey"])
        .select("l_orderkey", "o_orderdate", "o_orderpriority", rev.alias("__r__"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum("__r__").cast("double") / 10000.0).alias("revenue"))
        .orderBy(
            F.col("revenue").desc(),
            F.col("o_orderdate").asc(),
            F.col("l_orderkey").asc(),
        )
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q5 — local supplier volume
# ---------------------------------------------------------------------------

@register(
    "tpch_q5_local_supplier_volume",
    """
    SELECT n.n_name AS nation_name,
           CAST(SUM(CAST(CAST(round(l.l_extendedprice * 100.0) AS BIGINT)
                         * (100 - CAST(round(l.l_discount * 100.0)
                                       AS BIGINT))
                         AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5: the 6-way snowflake with a cross-dimension correlation "
    "(customer and supplier must share a nation) that no single join "
    "can satisfy — the classic join-ORDER stress test. Plan: region/"
    "nation/supplier/customer all broadcast (dims), the date-pruned "
    "orders->lineitem join is the only shuffle, and the nation "
    "correlation lands as a broadcast-join predicate. Catalyst's join "
    "reordering picks this up from the declarative form — nothing is "
    "hand-scheduled. Integer-cents revenue as everywhere.",
)
def q_tpch_q5(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    o = o.filter(
        (F.col("o_orderdate") >= _ts_lit(o, "o_orderdate", "1996-01-01"))
        & (F.col("o_orderdate") < _ts_lit(o, "o_orderdate", "1997-01-01"))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = (
        _cents("l_extendedprice") * (100 - _cents("l_discount"))
    ).cast("decimal(38,0)")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(l, F.col("o_orderkey") == l["l_orderkey"])
        .join(
            F.broadcast(s),
            (l["l_suppkey"] == s["s_suppkey"])
            & (F.col("c_nationkey") == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select(F.col("n_name").alias("nation_name"), rev.alias("__r__"))
        .groupBy("nation_name")
        .agg((F.sum("__r__").cast("double") / 10000.0).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change
# ---------------------------------------------------------------------------

@register(
    "tpch_q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(CAST(round(l_extendedprice * 100.0) AS BIGINT)
                         * CAST(round(l_discount * 100.0) AS BIGINT)
                         AS DECIMAL(38,0))) AS DOUBLE) / 10000.0
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND CAST(round(l_discount * 100.0) AS BIGINT) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: the pure filter-and-sum — every predicate reaches the "
    "parquet scan (date range, quantity; the discount band compares "
    "exact integer percent so the cut is unambiguous where BETWEEN "
    "0.05 AND 0.07 on binary doubles is not), then a map-only partial "
    "sum collapses to one row per task before a 1-row exchange. The "
    "query whole-stage codegen was built for; no join, no wide shuffle.",
)
def q_tpch_q6(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    dp = _cents("l_discount")
    rev = (_cents("l_extendedprice") * dp).cast("decimal(38,0)")
    return (
        l.filter(
            (F.col("l_shipdate") >= _ts_lit(l, "l_shipdate", "1996-01-01"))
            & (F.col("l_shipdate") < _ts_lit(l, "l_shipdate", "1997-01-01"))
            & dp.between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .select(rev.alias("__r__"))
        .agg(
            (F.sum("__r__").cast("double") / 10000.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS -> semi join)
# ---------------------------------------------------------------------------

@register(
    "tpch_q4_order_priority",
    """
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
    doc="TPC-H Q4: the correlated-EXISTS shape. Declaratively it is a "
    "LEFT SEMI join — each order needs at least ONE late lineitem, and "
    "the semi join stops probing a key after the first match instead of "
    "multiplying rows then de-duplicating (the naive inner-join+distinct "
    "reads the same data and shuffles strictly more). The correlated "
    "predicate l_shipdate > o_orderdate rides on the join condition; "
    "date-pruned orders side, integer count output.",
)
def q_tpch_q4(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    o = o.filter(
        (F.col("o_orderdate") >= _ts_lit(o, "o_orderdate", "1996-01-01"))
        & (F.col("o_orderdate") < _ts_lit(o, "o_orderdate", "1996-04-01"))
    )
    l = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (o["o_orderkey"] == l["l_orderkey"])
            & (l["l_shipdate"] > o["o_orderdate"]),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers (HAVING over a fact aggregate)
# ---------------------------------------------------------------------------

@register(
    "tpch_q18_large_volume",
    """
    WITH big AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(round(l_quantity * 100.0) AS BIGINT))
                  AS BIGINT) AS qty_cents
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(round(l_quantity * 100.0) AS BIGINT)) > 12000
    )
    SELECT c.c_name, o.o_orderkey, o.o_orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(b.qty_cents AS DOUBLE) / 100.0 AS total_qty
    FROM big b
    JOIN orders o   ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    doc="TPC-H Q18: find orders whose total quantity exceeds a threshold, "
    "then decorate with customer detail — the HAVING-then-join shape. "
    "The fact aggregates FIRST (one groupBy on the join key, map-side "
    "combine, integer-cents sum so the > cut is exact), the HAVING "
    "collapses it to a small key set, and only that survivor set joins "
    "back to orders/customer — aggregate-before-join is the difference "
    "between shuffling the fact once and three times. Threshold 120 "
    "units (12000 cents) sized to the synthetic data's order fan-out.",
)
def q_tpch_q18(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    qc = _cents("l_quantity")
    big = (
        l.select("l_orderkey", qc.alias("__qc__"))
        .groupBy("l_orderkey")
        .agg(F.sum("__qc__").cast("long").alias("qty_cents"))
        .filter(F.col("qty_cents") > 12000)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            (F.col("qty_cents").cast("double") / 100.0).alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting (top-20 customers by lost revenue)
# ---------------------------------------------------------------------------

@register(
    "tpch_q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(CAST(round(l.l_extendedprice * 100.0) AS BIGINT)
                         * (100 - CAST(round(l.l_discount * 100.0)
                                       AS BIGINT))
                         AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS revenue,
           CAST(c.c_acctbal AS DOUBLE) AS c_acctbal,
           n.n_name AS nation_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
    doc="TPC-H Q10: revenue lost to returns per customer in a quarter, "
    "top 20. The returnflag predicate prunes lineitem AT THE SCAN "
    "(dictionary-encoded column — near-free in parquet), the quarter "
    "prunes orders, customer/nation broadcast, and the top-20 is a "
    "TakeOrderedAndProject heap with a c_custkey tiebreak. Grouping "
    "carries the customer attributes in the key (functionally dependent "
    "on c_custkey) so no second join is needed after the aggregate.",
)
def q_tpch_q10(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    o = o.filter(
        (F.col("o_orderdate") >= _ts_lit(o, "o_orderdate", "1996-01-01"))
        & (F.col("o_orderdate") < _ts_lit(o, "o_orderdate", "1996-04-01"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    rev = (
        _cents("l_extendedprice") * (100 - _cents("l_discount"))
    ).cast("decimal(38,0)")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(l, F.col("o_orderkey") == l["l_orderkey"])
        .join(F.broadcast(n), F.col("c_nationkey") == n["n_nationkey"])
        .select(
            "c_custkey",
            "c_name",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            F.col("n_name").alias("nation_name"),
            rev.alias("__r__"),
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "nation_name")
        .agg((F.sum("__r__").cast("double") / 10000.0).alias("revenue"))
        .select(
            "c_custkey", "c_name", "revenue", "c_acctbal", "nation_name"
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q14 — promotion effect (conditional-sum ratio)
# ---------------------------------------------------------------------------

@register(
    "tpch_q14_promo_effect",
    """
    SELECT 100.0 * (
             CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                           THEN CAST(CAST(round(l.l_extendedprice * 100.0)
                                          AS BIGINT)
                                     * (100 - CAST(round(l.l_discount
                                                         * 100.0) AS BIGINT))
                                     AS DECIMAL(38,0))
                           ELSE CAST(0 AS DECIMAL(38,0)) END) AS DOUBLE)
             / CAST(SUM(CAST(CAST(round(l.l_extendedprice * 100.0)
                                  AS BIGINT)
                             * (100 - CAST(round(l.l_discount * 100.0)
                                           AS BIGINT))
                             AS DECIMAL(38,0))) AS DOUBLE)
           ) AS promo_revenue_pct,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01'
    """,
    doc="TPC-H Q14: promo revenue share for one month — the conditional-"
    "sum-ratio shape. Part is a dim (broadcast into the date-pruned "
    "lineitem slice), both numerator and denominator are exact "
    "DECIMAL(38,0) cents sums computed in the SAME aggregate pass "
    "(fused conditional aggregation — one scan, one 1-row exchange), "
    "and only the final ratio divides to double through an identical "
    "tree. The one-branch CASE keeps the numerator layout-independent "
    "where a filtered double sum would not be.",
)
def q_tpch_q14(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    l = l.filter(
        (F.col("l_shipdate") >= _ts_lit(l, "l_shipdate", "1996-03-01"))
        & (F.col("l_shipdate") < _ts_lit(l, "l_shipdate", "1996-04-01"))
    )
    p = _t(spark, sf_dir, "part")
    rev = (
        _cents("l_extendedprice") * (100 - _cents("l_discount"))
    ).cast("decimal(38,0)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(38,0)")
    )
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .select(promo.alias("__pr__"), rev.alias("__r__"))
        .agg(
            (
                100.0
                * (F.sum("__pr__").cast("double") / F.sum("__r__").cast("double"))
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
