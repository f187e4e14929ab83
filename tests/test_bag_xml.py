"""XML source layer tests (SURVEY §2.1 S1-S4, §2.2 P2-P5): namespace-
qualified LVBAG fixture files exercising default injection, parent-tag
disambiguation, repeated-element comma-join, duplicate-id last-write-wins,
active filtering, zip ingestion, and coordinate derivation."""

from __future__ import annotations

import zipfile

import pytest
from pyspark.sql import functions as F

from bag_parser_spark.config import EngineConfig
from bag_parser_spark.sources.bag_xml import read_bag_entity

SNAPSHOT = "2026-01-01"
CFG = EngineConfig(active_only=True, snapshot_date=SNAPSHOT)

WPL_HEAD = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<sl:standBestand xmlns:sl="http://www.kadaster.nl/schemas/standlevering-generiek/1.0.0"'
    ' xmlns:Objecten="www.kadaster.nl/schemas/lvbag/imbag/objecten/v20200601"'
    ' xmlns:Historie="www.kadaster.nl/schemas/lvbag/imbag/historie/v20200601"'
    ' xmlns:gml="http://www.opengis.net/gml/3.2">'
)


def _wpl(id_, naam, status="Woonplaats aangewezen", begin="2010-01-01",
         eind="", extra=""):
    eind_xml = f"<Historie:eindGeldigheid>{eind}</Historie:eindGeldigheid>" if eind else ""
    naam_xml = f"<Objecten:naam>{naam}</Objecten:naam>" if naam is not None else ""
    return (
        "<sl:stand><Objecten:Woonplaats>"
        f"<Objecten:identificatie>{id_}</Objecten:identificatie>"
        f"{naam_xml}"
        f"<Objecten:status>{status}</Objecten:status>"
        f"<Historie:beginGeldigheid>{begin}</Historie:beginGeldigheid>"
        f"{eind_xml}{extra}"
        "</Objecten:Woonplaats></sl:stand>"
    )


def test_woonplaats_parse_defaults_filter_upsert(spark, tmp_path):
    d = tmp_path / "wpl"
    d.mkdir()
    # file 1: active, inactive-status, future-begin, expired, absent naam
    (d / "a_0001.xml").write_text(
        WPL_HEAD
        + _wpl(1000, "Aadorp")
        + _wpl(1001, "Weggedorp", status="Woonplaats ingetrokken")
        + _wpl(1002, "Toekomstdorp", begin="2030-01-01")
        + _wpl(1003, "Verlopen", eind="2020-01-01")
        + _wpl(1004, None)  # absent naam → '' default (P2)
        + _wpl(1005, "Nogactief", eind="2030-01-01")  # future eind → active
        + "</sl:standBestand>",
        encoding="utf-8",
    )
    # file 2: duplicate id 1000 — later file wins (S7/W1)
    (d / "b_0002.xml").write_text(
        WPL_HEAD + _wpl(1000, "Aadorp-v2") + "</sl:standBestand>",
        encoding="utf-8",
    )
    df = read_bag_entity(spark, str(d), "Woonplaats", CFG)
    rows = {r["id"]: r for r in df.collect()}
    assert set(rows) == {1000, 1004, 1005}
    assert rows[1000]["naam"] == "Aadorp-v2"  # last write (file order) wins
    assert rows[1004]["naam"] == ""  # default injected
    assert rows[1000]["geometry"] == ""  # P10 blanked (parse_geometries off)


def test_gwr_parent_tag_disambiguation(spark, tmp_path):
    d = tmp_path / "gwr"
    d.mkdir()
    head = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<gwr:product xmlns:gwr="www.kadaster.nl/schemas/lvbag/gem-wpl-rel/'
        'gwr-producten-lvc/v20200601" xmlns:bagtypes="www.kadaster.nl/'
        'schemas/lvbag/gem-wpl-rel/bag-types/v20200601">'
    )
    # identificatie appears under BOTH parents — must land in different
    # columns (S3, reference bag_parser.py:223-228)
    (d / "gwr.xml").write_text(
        head
        + "<gwr:GemeenteWoonplaatsRelatie>"
        "<bagtypes:begindatumTijdvakGeldigheid>2010-01-01"
        "</bagtypes:begindatumTijdvakGeldigheid>"
        "<gwr:gerelateerdeWoonplaats><gwr:identificatie>1050"
        "</gwr:identificatie></gwr:gerelateerdeWoonplaats>"
        "<gwr:gerelateerdeGemeente><gwr:identificatie>362"
        "</gwr:identificatie></gwr:gerelateerdeGemeente>"
        "<gwr:status>definitief</gwr:status>"
        "</gwr:GemeenteWoonplaatsRelatie></gwr:product>",
        encoding="utf-8",
    )
    df = read_bag_entity(spark, str(d), "GemeenteWoonplaatsRelatie", CFG)
    r = df.collect()[0]
    assert r["woonplaats_id"] == 1050
    assert r["gemeente_id"] == 362


VBO_HEAD = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<sl:standBestand xmlns:sl="http://www.kadaster.nl/schemas/standlevering-generiek/1.0.0"'
    ' xmlns:Objecten="www.kadaster.nl/schemas/lvbag/imbag/objecten/v20200601"'
    ' xmlns:Objecten-ref="www.kadaster.nl/schemas/lvbag/imbag/objecten-ref/v20200601"'
    ' xmlns:Historie="www.kadaster.nl/schemas/lvbag/imbag/historie/v20200601"'
    ' xmlns:gml="http://www.opengis.net/gml/3.2">'
)


def _vbo_xml() -> str:
    return (
        VBO_HEAD
        + "<sl:stand><Objecten:Verblijfsobject>"
        "<Objecten:identificatie>VBO1</Objecten:identificatie>"
        "<Objecten:heeftAlsHoofdadres><Objecten-ref:NummeraanduidingRef>NUM1"
        "</Objecten-ref:NummeraanduidingRef></Objecten:heeftAlsHoofdadres>"
        "<Objecten:heeftAlsNevenadres><Objecten-ref:NummeraanduidingRef>NUM2"
        "</Objecten-ref:NummeraanduidingRef></Objecten:heeftAlsNevenadres>"
        "<Objecten:heeftAlsNevenadres><Objecten-ref:NummeraanduidingRef>NUM3"
        "</Objecten-ref:NummeraanduidingRef></Objecten:heeftAlsNevenadres>"
        "<gml:pos>155000.0 463000.0 0.0</gml:pos>"
        "<Objecten:gebruiksdoel>woonfunctie</Objecten:gebruiksdoel>"
        "<Objecten:gebruiksdoel>kantoorfunctie</Objecten:gebruiksdoel>"
        "<Objecten:oppervlakte>120</Objecten:oppervlakte>"
        "<Objecten:maaktDeelUitVan><Objecten-ref:PandRef>PAND1"
        "</Objecten-ref:PandRef><Objecten-ref:PandRef>PAND2"
        "</Objecten-ref:PandRef></Objecten:maaktDeelUitVan>"
        "<Objecten:status>Verblijfsobject in gebruik</Objecten:status>"
        "<Historie:beginGeldigheid>2012-01-01</Historie:beginGeldigheid>"
        "</Objecten:Verblijfsobject></sl:stand></sl:standBestand>"
    )


def test_vbo_multivalue_parent_refs_and_coords(spark, tmp_path):
    d = tmp_path / "vbo"
    d.mkdir()
    (d / "vbo.xml").write_text(_vbo_xml(), encoding="utf-8")
    df = read_bag_entity(spark, str(d), "Verblijfsobject", CFG)
    r = df.collect()[0]
    # S3: hoofdadres vs nevenadres ref, same child tag
    assert r["nummer_id"] == "NUM1"
    assert r["nevenadressen"] == "NUM2,NUM3"  # S4 comma-join
    assert r["gebruiksdoel"] == "woonfunctie,kantoorfunctie"
    assert r["pand_id"] == "PAND1,PAND2"
    assert r["oppervlakte"] == 120.0
    # P8 + F6: pos → rd → exact WGS84 at the Amersfoort base point
    assert r["rd_x"] == 155000.0 and r["rd_y"] == 463000.0
    assert abs(r["latitude"] - 52.15517440) < 1e-9
    assert abs(r["longitude"] - 5.38720621) < 1e-9


def test_zip_ingestion(spark, tmp_path):
    # S1: per-entity zip of XML files consumed by the same dataflow
    d = tmp_path / "zipped"
    d.mkdir()
    with zipfile.ZipFile(d / "9999WPL.zip", "w") as zf:
        zf.writestr("w1.xml", WPL_HEAD + _wpl(2000, "Zipdorp")
                    + "</sl:standBestand>")
        zf.writestr("w2.xml", WPL_HEAD + _wpl(2001, "Zipstad")
                    + "</sl:standBestand>")
    df = read_bag_entity(spark, str(d), "Woonplaats", CFG)
    assert {r["naam"] for r in df.collect()} == {"Zipdorp", "Zipstad"}


def test_geometry_parsing_enabled(spark, tmp_path):
    cfg = EngineConfig(active_only=True, parse_geometries=True,
                       snapshot_date=SNAPSHOT)
    d = tmp_path / "wplg"
    d.mkdir()
    ring = "155000.0 463000.0 156000.0 463000.0 156000.0 464000.0"
    (d / "w.xml").write_text(
        WPL_HEAD
        + _wpl(3000, "Geodorp",
               extra=f"<gml:posList>{ring}</gml:posList>")
        + "</sl:standBestand>",
        encoding="utf-8",
    )
    df = read_bag_entity(spark, str(d), "Woonplaats", cfg)
    import json

    rings = json.loads(df.collect()[0]["geometry"])
    assert len(rings) == 1 and len(rings[0]) == 3
    lon, lat = rings[0][0]
    assert abs(lat - 52.15517440) < 1e-9 and abs(lon - 5.38720621) < 1e-9
