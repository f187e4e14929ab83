"""The adressen build pipeline (SURVEY §3.1 stages 7-8): the reference's
sequence of SQLite passes re-expressed as one composable DataFrame lineage.

Reference flow (import_bag.py:64-72 → database_sqlite.py:291-530):
  1. woonplaatsen.gemeente_id ← gemeente_woonplaatsen     (J2 update-join)
  2. base adressen: nummers ⋈ openbare_ruimten ⋈ woonplaatsen ⋈
     verblijfsobjecten ⋈ panden (4 chained LEFT JOINs)     (J1)
  3. multi-pand fix: explode comma pand_id, last wins      (J4)
  4. ligplaats / standplaats coordinate+type overwrite     (J3)
  5. nummer-level woonplaats override where non-empty      (J6)
  6. nevenadres propagation from hoofd rows                (J5)
  7. dummy-value cleaning + orphan delete                  (P11/P12)

Each pass is a DataFrame → DataFrame function; the whole build is one lazy
lineage, so Catalyst sees every stage at once (the reference's sequential
UPDATE passes each rescan the table). Scale shape: nummers ⋈
verblijfsobjecten is the one genuinely big-big join (~9.5M × 9M at NL
scale; sort-merge on the key); every other side is a dim (broadcast) or a
pre-aggregated overlay keyed by nummer_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bag_parser_spark.config import DEFAULT_CONFIG, EngineConfig
from bag_parser_spark.operators.dedup import last_write_wins
from bag_parser_spark.operators.joins import anti_join

ADRESSEN_COLUMNS = [
    "nummer_id",
    "nummer_begindatum_geldigheid",
    "nummer_einddatum_geldigheid",
    "pand_id",
    "pand_begindatum_geldigheid",
    "pand_einddatum_geldigheid",
    "verblijfsobject_id",
    "gemeente_id",
    "woonplaats_id",
    "openbare_ruimte_id",
    "object_type",
    "gebruiksdoel",
    "postcode",
    "huisnummer",
    "huisletter",
    "toevoeging",
    "oppervlakte",
    "rd_x",
    "rd_y",
    "latitude",
    "longitude",
    "bouwjaar",
    "hoofd_nummer_id",
    "geometry",
]


def _nonempty(c: Column) -> Column:
    return F.coalesce(c, F.lit("")) != F.lit("")


def enrich_woonplaatsen(
    woonplaatsen: DataFrame, gemeente_woonplaatsen: DataFrame
) -> DataFrame:
    """Pass 1 (J2): woonplaatsen.gemeente_id ← gemeente_woonplaatsen
    (reference database_sqlite.py:79-85). The relation table is small —
    broadcast; must be unique per woonplaats_id (latest relation wins)."""
    gw = last_write_wins(
        gemeente_woonplaatsen.select("woonplaats_id", "gemeente_id").filter(
            F.col("woonplaats_id").isNotNull()
        ),
        keys=["woonplaats_id"],
        order_by=[F.col("gemeente_id")],
    ).withColumnRenamed("gemeente_id", "__gw_gemeente_id__")
    return (
        woonplaatsen.join(
            F.broadcast(gw), woonplaatsen["id"] == gw["woonplaats_id"], "left"
        )
        .withColumn(
            "gemeente_id",
            F.when(
                F.col("__gw_gemeente_id__").isNotNull(),
                F.col("__gw_gemeente_id__"),
            ).otherwise(F.lit(None).cast("int")),
        )
        .drop("__gw_gemeente_id__", "woonplaats_id")
    )


def build_adressen_base(
    nummers: DataFrame,
    openbare_ruimten: DataFrame,
    woonplaatsen: DataFrame,
    verblijfsobjecten: DataFrame,
    panden: DataFrame,
) -> DataFrame:
    """Pass 2 (J1): the 4-way chained LEFT JOIN (reference
    database_sqlite.py:347-375). openbare_ruimten / woonplaatsen broadcast;
    nummers ⋈ verblijfsobjecten and ⋈ panden are the big joins (sort-merge
    on id keys; AQE may promote to broadcast at small scale)."""
    n = nummers.alias("n")
    o = F.broadcast(openbare_ruimten.alias("o"))
    w = F.broadcast(woonplaatsen.alias("w"))
    v = verblijfsobjecten.alias("v")
    p = panden.alias("p")
    joined = (
        n.join(o, F.col("o.id") == F.col("n.openbare_ruimte_id"), "left")
        .join(w, F.col("w.id") == F.col("o.woonplaats_id"), "left")
        .join(v, F.col("v.nummer_id") == F.col("n.id"), "left")
        .join(p, F.col("v.pand_id") == F.col("p.id"), "left")
    )
    return joined.select(
        F.col("n.id").alias("nummer_id"),
        F.col("n.begindatum_geldigheid").alias("nummer_begindatum_geldigheid"),
        F.col("n.einddatum_geldigheid").alias("nummer_einddatum_geldigheid"),
        F.col("p.id").alias("pand_id"),
        F.col("p.begindatum_geldigheid").alias("pand_begindatum_geldigheid"),
        F.col("p.einddatum_geldigheid").alias("pand_einddatum_geldigheid"),
        F.col("v.id").alias("verblijfsobject_id"),
        F.col("w.gemeente_id").alias("gemeente_id"),
        F.col("o.woonplaats_id").alias("woonplaats_id"),
        F.col("o.id").alias("openbare_ruimte_id"),
        F.lit("verblijfsobject").alias("object_type"),
        F.col("v.gebruiksdoel").alias("gebruiksdoel"),
        F.col("n.postcode").alias("postcode"),
        F.col("n.huisnummer").alias("huisnummer"),
        F.col("n.huisletter").alias("huisletter"),
        F.col("n.toevoeging").alias("toevoeging"),
        F.col("v.oppervlakte").alias("oppervlakte"),
        F.col("v.rd_x").alias("rd_x"),
        F.col("v.rd_y").alias("rd_y"),
        F.col("v.latitude").alias("latitude"),
        F.col("v.longitude").alias("longitude"),
        F.col("p.bouwjaar").alias("bouwjaar"),
        F.lit(None).cast("string").alias("hoofd_nummer_id"),
        F.col("p.geometry").alias("geometry"),
    )


def apply_meerdere_panden(
    adressen: DataFrame, verblijfsobjecten: DataFrame, panden: DataFrame
) -> DataFrame:
    """Pass 3 (J4): verblijfsobjecten with comma-joined pand_id → explode →
    join panden → last pand's bouwjaar/geometry overwrite ("only last one
    remains" — reference database_sqlite.py:398-437). adressen.pand_id
    stays NULL for these rows, exactly like the reference (the base join
    found no pand with the literal comma-list id)."""
    multi = verblijfsobjecten.filter(F.col("pand_id").contains(",")).select(
        F.col("nummer_id").alias("__mp_nummer_id__"),
        F.posexplode(F.split(F.col("pand_id"), ",")).alias(
            "__mp_ord__", "__mp_pand_id__"
        ),
    )
    pj = multi.join(
        panden.select(
            F.col("id").alias("__mp_pid__"),
            F.col("bouwjaar").alias("__mp_bouwjaar__"),
            F.col("geometry").alias("__mp_geometry__"),
        ),
        F.col("__mp_pand_id__") == F.col("__mp_pid__"),
        "left",
    )
    last = last_write_wins(
        pj, keys=["__mp_nummer_id__"], order_by=[F.col("__mp_ord__")]
    ).select(
        "__mp_nummer_id__", "__mp_bouwjaar__", "__mp_geometry__",
        F.lit(True).alias("__mp_matched__"),
    )
    out = adressen.join(
        last, adressen["nummer_id"] == last["__mp_nummer_id__"], "left"
    )
    return (
        out.withColumn(
            "bouwjaar",
            F.when(F.col("__mp_matched__"), F.col("__mp_bouwjaar__")).otherwise(
                F.col("bouwjaar")
            ),
        )
        .withColumn(
            "geometry",
            F.when(F.col("__mp_matched__"), F.col("__mp_geometry__")).otherwise(
                F.col("geometry")
            ),
        )
        .drop("__mp_nummer_id__", "__mp_bouwjaar__", "__mp_geometry__",
              "__mp_matched__")
    )


def apply_plaats_overlay(
    adressen: DataFrame, plaatsen: DataFrame, object_type: str
) -> DataFrame:
    """Pass 4 (J3): ligplaatsen / standplaatsen coordinate + geometry +
    object_type overwrite on matching nummer_id (reference
    database_sqlite.py:440-464)."""
    pl = plaatsen.select(
        F.col("nummer_id").alias("__pl_nummer_id__"),
        F.col("rd_x").alias("__pl_rd_x__"),
        F.col("rd_y").alias("__pl_rd_y__"),
        F.col("latitude").alias("__pl_lat__"),
        F.col("longitude").alias("__pl_lon__"),
        F.col("geometry").alias("__pl_geometry__"),
    ).filter(_nonempty(F.col("__pl_nummer_id__")))
    pl = last_write_wins(
        pl, keys=["__pl_nummer_id__"], order_by=[F.col("__pl_rd_x__")]
    ).withColumn("__pl_matched__", F.lit(True))
    out = adressen.join(
        pl, adressen["nummer_id"] == pl["__pl_nummer_id__"], "left"
    )
    overwrites = {
        "rd_x": F.col("__pl_rd_x__"),
        "rd_y": F.col("__pl_rd_y__"),
        "latitude": F.col("__pl_lat__"),
        "longitude": F.col("__pl_lon__"),
        "geometry": F.col("__pl_geometry__"),
        "object_type": F.lit(object_type),
    }
    for name, expr in overwrites.items():
        out = out.withColumn(
            name,
            F.when(F.col("__pl_matched__"), expr).otherwise(F.col(name)),
        )
    return out.drop(
        "__pl_nummer_id__", "__pl_rd_x__", "__pl_rd_y__", "__pl_lat__",
        "__pl_lon__", "__pl_geometry__", "__pl_matched__"
    )


def apply_woonplaats_override(
    adressen: DataFrame, nummers: DataFrame
) -> DataFrame:
    """Pass 5 (J6): nummer-level WoonplaatsRef beats the openbare ruimte's
    woonplaats (reference database_sqlite.py:522-530, `IS NOT ''`)."""
    n = nummers.filter(_nonempty(F.col("woonplaats_id"))).select(
        F.col("id").alias("__ov_nummer_id__"),
        F.col("woonplaats_id").cast("int").alias("__ov_woonplaats_id__"),
    )
    out = adressen.join(
        F.broadcast(n), adressen["nummer_id"] == n["__ov_nummer_id__"], "left"
    )
    return out.withColumn(
        "woonplaats_id",
        F.when(
            F.col("__ov_woonplaats_id__").isNotNull(),
            F.col("__ov_woonplaats_id__"),
        ).otherwise(F.col("woonplaats_id")),
    ).drop("__ov_nummer_id__", "__ov_woonplaats_id__")


NEVEN_INHERITED = [
    "pand_id",
    "verblijfsobject_id",
    "gebruiksdoel",
    "oppervlakte",
    "rd_x",
    "rd_y",
    "latitude",
    "longitude",
    "bouwjaar",
    "geometry",
]


def apply_nevenadressen(
    adressen: DataFrame, verblijfsobjecten: DataFrame
) -> DataFrame:
    """Pass 6 (J5): neven rows inherit the hoofd row's building attributes
    and record hoofd_nummer_id (reference database_sqlite.py:466-518).
    Joins the *current* adressen state (after passes 3-5), matching the
    reference's pass ordering. Pairs are deduped per neven id (the
    reference's temp-table PK would abort on duplicates)."""
    pairs = (
        verblijfsobjecten.filter(_nonempty(F.col("nevenadressen")))
        .select(
            F.col("nummer_id").alias("__hoofd_id__"),
            F.explode(F.split(F.col("nevenadressen"), ",")).alias("__neven_id__"),
        )
    )
    pairs = last_write_wins(
        pairs, keys=["__neven_id__"], order_by=[F.col("__hoofd_id__")]
    )
    hoofd = adressen.select(
        F.col("nummer_id").alias("__h_nummer_id__"),
        *[F.col(c).alias(f"__h_{c}__") for c in NEVEN_INHERITED],
    )
    overlay = pairs.join(
        hoofd, F.col("__hoofd_id__") == F.col("__h_nummer_id__"), "left"
    ).select(
        "__neven_id__", "__hoofd_id__",
        *[F.col(f"__h_{c}__") for c in NEVEN_INHERITED],
    )
    out = adressen.join(
        overlay, adressen["nummer_id"] == overlay["__neven_id__"], "left"
    )
    out = out.withColumn(
        "hoofd_nummer_id",
        F.when(F.col("__neven_id__").isNotNull(), F.col("__hoofd_id__")).otherwise(
            F.col("hoofd_nummer_id")
        ),
    )
    for c in NEVEN_INHERITED:
        out = out.withColumn(
            c,
            F.when(F.col("__neven_id__").isNotNull(), F.col(f"__h_{c}__")).otherwise(
                F.col(c)
            ),
        )
    return out.drop(
        "__neven_id__", "__hoofd_id__",
        *[f"__h_{c}__" for c in NEVEN_INHERITED],
    )


def clean_adressen(
    adressen: DataFrame,
    openbare_ruimten: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Pass 7 (P11 + P12): dummy-value nulling (bouwjaar 1005 / > 2040,
    oppervlakte 999999 / 1 — reference database_sqlite.py:542-601) and the
    conditional orphan delete (only when count < threshold — reference
    database_sqlite.py:604-612; the count is the one driver-side action in
    the build)."""
    out = (
        adressen.withColumn(
            "bouwjaar",
            F.when(
                (F.col("bouwjaar") == 1005) | (F.col("bouwjaar") > 2040),
                F.lit(None),
            ).otherwise(F.col("bouwjaar")),
        )
        .withColumn(
            "oppervlakte",
            F.when(
                F.col("oppervlakte").isin(999999.0, 1.0), F.lit(None)
            ).otherwise(F.col("oppervlakte")),
        )
    )
    orphans = anti_join(
        out.filter(F.col("openbare_ruimte_id").isNotNull()),
        openbare_ruimten.select(F.col("id").alias("__or_id__")),
        on=F.col("openbare_ruimte_id") == F.col("__or_id__"),
    ).select("nummer_id")
    n_orphans = orphans.count() + out.filter(
        F.col("openbare_ruimte_id").isNull()
    ).count()
    if 0 < n_orphans < cfg.delete_addresses_without_public_spaces_threshold:
        valid_or = openbare_ruimten.select(F.col("id").alias("__or_id__"))
        out = out.join(
            F.broadcast(valid_or),
            out["openbare_ruimte_id"] == F.col("__or_id__"),
            "left_semi",
        )
    return out


def build_adressen(
    nummers: DataFrame,
    openbare_ruimten: DataFrame,
    woonplaatsen: DataFrame,
    verblijfsobjecten: DataFrame,
    panden: DataFrame,
    ligplaatsen: DataFrame,
    standplaatsen: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """The full adressen DAG, passes 2-6 in reference order as one lineage.
    ``woonplaatsen`` must already be gemeente-enriched (pass 1)."""
    a = build_adressen_base(
        nummers, openbare_ruimten, woonplaatsen, verblijfsobjecten, panden
    )
    a = apply_meerdere_panden(a, verblijfsobjecten, panden)
    a = apply_plaats_overlay(a, ligplaatsen, "ligplaats")
    a = apply_plaats_overlay(a, standplaatsen, "standplaats")
    a = apply_woonplaats_override(a, nummers)
    a = apply_nevenadressen(a, verblijfsobjecten)
    return a.select(*ADRESSEN_COLUMNS)
