"""Export queries + CSV sink (SURVEY §3.2, §2.1 S8, §2.4 A1).

The reference's five exporter variants (reference exporter/exporter.py:
47-142) as DataFrame expressions ending in a CSV sink. Dims broadcast (J9
snowflake — provincie via gemeente); grouped stats shuffle only the
derived key with map-side partial aggregation.

The SQLite "bare column in GROUP BY" any-value (w.naam in the postcode
stats — exporter.py:102,119,136) is exposed as deterministic F.min and
documented as such.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bag_parser_spark.functions.scalars import sqlite_substr
from bag_parser_spark.operators.joins import chained_left_join


def export_adressen_all(
    adressen: DataFrame,
    openbare_ruimten: DataFrame,
    gemeenten: DataFrame,
    woonplaatsen: DataFrame,
    provincies: DataFrame,
) -> DataFrame:
    """--all export: 15 columns, 4 broadcast left joins (reference
    exporter.py:47-77)."""
    a = adressen.alias("a")
    joined = chained_left_join(
        a,
        [
            (openbare_ruimten.alias("o"),
             F.col("a.openbare_ruimte_id") == F.col("o.id")),
            (gemeenten.alias("g"), F.col("a.gemeente_id") == F.col("g.id")),
            (woonplaatsen.alias("w"), F.col("a.woonplaats_id") == F.col("w.id")),
            (provincies.alias("p"), F.col("g.provincie_id") == F.col("p.id")),
        ],
    )
    return joined.select(
        F.col("o.naam").alias("straat"),
        F.col("a.huisnummer").alias("huisnummer"),
        F.concat(
            F.coalesce(F.col("a.huisletter"), F.lit("")),
            F.coalesce(F.col("a.toevoeging"), F.lit("")),
        ).alias("toevoeging"),
        F.col("a.postcode").alias("postcode"),
        F.col("g.naam").alias("gemeente"),
        F.col("w.naam").alias("woonplaats"),
        F.col("p.naam").alias("provincie"),
        F.col("a.bouwjaar").alias("bouwjaar"),
        F.col("a.rd_x").alias("rd_x"),
        F.col("a.rd_y").alias("rd_y"),
        F.col("a.latitude").alias("latitude"),
        F.col("a.longitude").alias("longitude"),
        F.col("a.oppervlakte").alias("vloeroppervlakte"),
        F.col("a.gebruiksdoel").alias("gebruiksdoel"),
        F.col("a.hoofd_nummer_id").alias("hoofdadres_nummer_id"),
    )


def export_adressen_postcode(
    adressen: DataFrame,
    openbare_ruimten: DataFrame,
    woonplaatsen: DataFrame,
) -> DataFrame:
    """Default export: 5 columns, 2 broadcast joins (reference
    exporter.py:79-94)."""
    a = adressen.alias("a")
    joined = chained_left_join(
        a,
        [
            (openbare_ruimten.alias("o"),
             F.col("a.openbare_ruimte_id") == F.col("o.id")),
            (woonplaatsen.alias("w"), F.col("a.woonplaats_id") == F.col("w.id")),
        ],
    )
    return joined.select(
        F.col("o.naam").alias("straat"),
        F.col("a.huisnummer").alias("huisnummer"),
        F.concat(
            F.coalesce(F.col("a.huisletter"), F.lit("")),
            F.coalesce(F.col("a.toevoeging"), F.lit("")),
        ).alias("toevoeging"),
        F.col("a.postcode").alias("postcode"),
        F.col("w.naam").alias("woonplaats"),
    )


def export_postcode_stats(
    adressen: DataFrame, woonplaatsen: DataFrame, digits: int
) -> DataFrame:
    """postcode4/5/6 grouped stats (A1 — reference exporter.py:93-142):
    derived SUBSTR key (SQLite 0-start quirk preserved: SUBSTR(pc,0,5) =
    chars 1..4), AVG lat/lon, COUNT(1), any-value woonplaats (min)."""
    assert digits in (4, 5, 6)
    key = (
        F.col("a.postcode")
        if digits == 6
        else sqlite_substr(F.col("a.postcode"), 0, digits + 1)
    )
    a = adressen.alias("a")
    w = woonplaatsen.alias("w")
    joined = a.join(
        F.broadcast(w), F.col("a.woonplaats_id") == F.col("w.id"), "left"
    ).filter(F.col("a.postcode") != "")
    return (
        joined.groupBy(key.alias(f"postcode{digits}"))
        .agg(
            F.avg("a.latitude").alias("center_lat"),
            F.avg("a.longitude").alias("center_lon"),
            F.count(F.lit(1)).alias("aantal_adressen"),
            F.min("w.naam").alias("woonplaats"),
        )
    )


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """S8 CSV sink. ``single_file`` coalesces to one partition for parity
    with the reference's single output file — at scale leave it False and
    let each task write its split (the only scalable shape)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)
