"""Deterministic BAG-shaped fixtures (FIXTURES.md §B, seed-free — fully
enumerated). Builds the post-parse entity DataFrames that feed the adressen
pipeline, covering every required scenario:

  1. active/inactive records (XML-layer tests cover the filter itself)
  2. nummer-level woonplaats override (sentinel 1181BN-1 → 1050)
  3. multi-valued pand_id (comma list)
  4. nevenadressen inheritance + hoofd_nummer_id
  5. ligplaats / standplaats addresses
  6. dummy bouwjaar 1005/9999, oppervlakte 999999/1
  7. orphan address (openbare_ruimte_id not in openbare_ruimten), < 100
  8. duplicate ids (XML-layer: last-write-wins)
  9. gemeente without adressen / woonplaats with invalid gemeente (negative
     fixtures — used by validation tests)
 10. UTF-8 sentinel 'Súdwest-Fryslân' (gemeente 1900)
 11. known RD base point (Onze Lieve Vrouwetoren)
 12. postcode groups spanning woonplaatsen; empty-postcode rows
 13. 2D/3D multi-ring geometries (XML/geometry tests)
"""

from __future__ import annotations

from bag_parser_spark.config import EngineConfig

N_GEMEENTEN = 310  # incl. 1900
GEMEENTE_IDS = list(range(1, N_GEMEENTEN)) + [1900]
AMSTELVEEN_GEM, AMSTERDAM_GEM = 101, 102
AMSTELVEEN_WPL, AMSTERDAM_WPL = 1050, 3594

FIXTURE_CONFIG = EngineConfig(
    min_adressen=900,
    min_adressen_with_pand=800,
    min_ligplaatsen=5,
    min_standplaatsen=6,
    min_openbare_ruimten=300,
    min_woonplaatsen=300,
    min_gemeenten=300,
    exact_provincies=12,
)


def _wpl_id(gid: int) -> int:
    if gid == AMSTELVEEN_GEM:
        return AMSTELVEEN_WPL
    if gid == AMSTERDAM_GEM:
        return AMSTERDAM_WPL
    return 10000 + gid


def _or_id(gid: int) -> str:
    return f"OR{gid:010d}"


def make_bag_tables(spark) -> dict:
    """Returns dict of entity-name → DataFrame in post-parse shape."""
    provincies = [(20 + i, f"Provincie {i}" if i else "Fryslân") for i in range(12)]

    gemeenten = []
    for i, gid in enumerate(GEMEENTE_IDS):
        naam = "Súdwest-Fryslân" if gid == 1900 else f"Gemeente {gid}"
        gemeenten.append((gid, naam, 20 + i % 12))

    woonplaatsen = []
    gemeente_woonplaatsen = []
    for gid in GEMEENTE_IDS:
        wid = _wpl_id(gid)
        naam = {AMSTELVEEN_WPL: "Amstelveen", AMSTERDAM_WPL: "Amsterdam"}.get(
            wid, f"Plaats {gid}"
        )
        woonplaatsen.append(
            (wid, naam, "", "Woonplaats aangewezen", "2010-01-01", "")
        )
        gemeente_woonplaatsen.append(
            (gid, wid, "definitief", "2010-01-01", "")
        )

    openbare_ruimten = []
    for gid in GEMEENTE_IDS:
        openbare_ruimten.append(
            (
                _or_id(gid),
                f"Straatweg {gid}",
                f"Straatweg {gid}",
                f"Strtwg {gid}" if gid % 3 == 0 else "",
                "Weg",
                _wpl_id(gid),
                "Naamgeving uitgegeven",
                "2010-01-01",
                "",
            )
        )

    # base point: Onze Lieve Vrouwetoren (rd 155000, 463000)
    BASE_X, BASE_Y = 155000.0, 463000.0
    LAT0, LON0 = 52.15517440, 5.38720621

    nummers = []
    verblijfsobjecten = []
    panden = []

    def add_addr(gid: int, seq: int, postcode: str, *, wpl_override: str = "",
                 pand_ids: str | None = None, neven: str = "",
                 bouwjaar: int = 2000, opp: float = 100.0,
                 or_override: str | None = None, skip_vbo: bool = False):
        nid = f"N{gid:05d}{seq:03d}"
        vid = f"V{gid:05d}{seq:03d}"
        pid = f"P{gid:05d}{seq:03d}"
        or_ = or_override if or_override is not None else _or_id(gid)
        nummers.append(
            (nid, postcode, seq + 1, "A" if seq % 2 else "", "",
             wpl_override, or_, "Naamgeving uitgegeven", "2011-01-01", "")
        )
        if not skip_vbo:
            the_pand = pand_ids if pand_ids is not None else pid
            verblijfsobjecten.append(
                (vid, nid, the_pand, opp, BASE_X, BASE_Y, LAT0, LON0,
                 "woonfunctie", neven, "Verblijfsobject in gebruik",
                 "2012-01-01", "")
            )
            if pand_ids is None:
                panden.append((pid, bouwjaar, "", "Pand in gebruik",
                               "2012-01-01", ""))
        return nid

    for gid in GEMEENTE_IDS:
        # % 50 → pc4 groups span multiple gemeenten/woonplaatsen (scenario 12)
        pc = f"{1000 + gid % 50}{'ABCDEFGH'[gid % 8]}{'XY'[gid % 2]}"
        add_addr(gid, 0, pc)
        add_addr(gid, 1, pc)  # same postcode twice → postcode groups
        add_addr(gid, 2, "", bouwjaar=1900 + gid % 100)  # empty postcode

    # scenario 2: woonplaats override sentinel — OR in Amsterdam, nummer
    # says Amstelveen
    add_addr(AMSTERDAM_GEM, 77, "1181BN", wpl_override=str(AMSTELVEEN_WPL))
    # give huisnummer exactly 1: seq+1 → seq=0 collides; patch: replace last
    nid, rest = nummers[-1][0], nummers[-1]
    nummers[-1] = (rest[0], rest[1], 1, "", "", rest[5], rest[6], rest[7],
                   rest[8], rest[9])

    # scenario 3: multi-pand vbo (both panden exist; P-MP2 is "last")
    panden.append(("P-MP1", 1980, "", "Pand in gebruik", "2012-01-01", ""))
    panden.append(("P-MP2", 1999, "", "Pand in gebruik", "2012-01-01", ""))
    add_addr(5, 50, "5000AX", pand_ids="P-MP1,P-MP2")

    # scenario 6: dummy values
    add_addr(6, 60, "6000BX", bouwjaar=1005)
    add_addr(6, 61, "6000BX", bouwjaar=9999)
    add_addr(7, 70, "7000CX", opp=999999.0)
    add_addr(7, 71, "7000CX", opp=1.0)

    # scenario 4: nevenadressen — hoofd with two neven nummers (no own vbo)
    neven1 = add_addr(8, 81, "8000DX", skip_vbo=True)
    neven2 = add_addr(8, 82, "8000DX", skip_vbo=True)
    add_addr(8, 80, "8000DX", neven=f"{neven1},{neven2}", bouwjaar=1955)

    # scenario 7: orphan addresses (3 < threshold 100)
    for s in (90, 91, 92):
        add_addr(9, s, "9000EX", or_override="OR-MISSING", skip_vbo=True)

    # scenario 5: ligplaatsen / standplaatsen
    ligplaatsen = []
    standplaatsen = []
    for k in range(5):
        nid = add_addr(11, 30 + k, "1100FX", skip_vbo=True)
        ligplaatsen.append(
            (f"L{k:05d}", nid, BASE_X + k, BASE_Y + k, LAT0, LON0, "",
             "Plaats aangewezen", "2013-01-01", "")
        )
    for k in range(6):
        nid = add_addr(12, 40 + k, "1200GX", skip_vbo=True)
        standplaatsen.append(
            (f"S{k:05d}", nid, BASE_X + k, BASE_Y + k, LAT0, LON0, "",
             "Plaats aangewezen", "2013-01-01", "")
        )

    return {
        "provincies": spark.createDataFrame(
            provincies, "id int, naam string"
        ),
        "gemeenten": spark.createDataFrame(
            gemeenten, "id int, naam string, provincie_id int"
        ),
        "woonplaatsen": spark.createDataFrame(
            woonplaatsen,
            "id int, naam string, geometry string, status string, "
            "begindatum_geldigheid string, einddatum_geldigheid string",
        ),
        "gemeente_woonplaatsen": spark.createDataFrame(
            gemeente_woonplaatsen,
            "gemeente_id int, woonplaats_id int, status string, "
            "begindatum_geldigheid string, einddatum_geldigheid string",
        ),
        "openbare_ruimten": spark.createDataFrame(
            openbare_ruimten,
            "id string, naam string, lange_naam string, verkorte_naam string,"
            " type string, woonplaats_id int, status string, "
            "begindatum_geldigheid string, einddatum_geldigheid string",
        ),
        "nummers": spark.createDataFrame(
            nummers,
            "id string, postcode string, huisnummer int, huisletter string, "
            "toevoeging string, woonplaats_id string, openbare_ruimte_id "
            "string, status string, begindatum_geldigheid string, "
            "einddatum_geldigheid string",
        ),
        "verblijfsobjecten": spark.createDataFrame(
            verblijfsobjecten,
            "id string, nummer_id string, pand_id string, oppervlakte double,"
            " rd_x double, rd_y double, latitude double, longitude double, "
            "gebruiksdoel string, nevenadressen string, status string, "
            "begindatum_geldigheid string, einddatum_geldigheid string",
        ),
        "panden": spark.createDataFrame(
            panden,
            "id string, bouwjaar int, geometry string, status string, "
            "begindatum_geldigheid string, einddatum_geldigheid string",
        ),
        "ligplaatsen": spark.createDataFrame(
            ligplaatsen,
            "id string, nummer_id string, rd_x double, rd_y double, latitude "
            "double, longitude double, geometry string, status string, "
            "begindatum_geldigheid string, einddatum_geldigheid string",
        ),
        "standplaatsen": spark.createDataFrame(
            standplaatsen,
            "id string, nummer_id string, rd_x double, rd_y double, latitude "
            "double, longitude double, geometry string, status string, "
            "begindatum_geldigheid string, einddatum_geldigheid string",
        ),
    }
