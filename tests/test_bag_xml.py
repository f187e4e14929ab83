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


def _wpl_doc(*records: str) -> str:
    return WPL_HEAD + "".join(records) + "</sl:standBestand>"


def _delivery_zip(tmp_path, n_files: int = 50):
    """The reference's real two-level delivery layout (reference
    bag_parser.py:401-407, import_bag.py:31-37): one outer
    lvbag-extract-nl.zip holding a per-entity zip, which holds ``n_files``
    numbered XML files. Ids 5000 (members 10 and 40) and 5001 (members 20
    and 21) are duplicated across member files to pin down last-write-wins
    over the member sort order."""
    import io

    inner = io.BytesIO()
    with zipfile.ZipFile(inner, "w") as zf:
        for f in range(n_files):
            recs = [
                _wpl(20000 + f * 10 + k, f"Plaats-{f:03d}-{k}")
                for k in range(3)
            ]
            if f in (10, 40):
                recs.append(_wpl(5000, f"Dup-uit-file-{f:03d}"))
            if f in (20, 21):
                recs.append(_wpl(5001, f"Dup2-uit-file-{f:03d}"))
            zf.writestr(f"9999WPL-{f:06d}.xml", _wpl_doc(*recs))
    d = tmp_path / "delivery"
    d.mkdir()
    with zipfile.ZipFile(d / "lvbag-extract-nl.zip", "w") as outer:
        outer.writestr("9999WPL08082025.zip", inner.getvalue())
    return d, n_files


def test_two_level_zip_fifty_files_last_write_wins(spark, tmp_path):
    d, n_files = _delivery_zip(tmp_path)
    df = read_bag_entity(spark, str(d), "Woonplaats", CFG)
    rows = {r["id"]: r["naam"] for r in df.collect()}
    assert len(rows) == n_files * 3 + 2
    # the later member file wins — the reference's numbered-file order
    assert rows[5000] == "Dup-uit-file-040"
    assert rows[5001] == "Dup2-uit-file-021"
    assert rows[20000] == "Plaats-000-0" and rows[20492] == "Plaats-049-2"


def test_two_level_zip_continuous_ordinal(spark, tmp_path):
    """The arrival ordinal must be one continuous sequence across every
    member document of an archive — a per-document counter would repeat
    (file, ordinal) pairs and make the upsert winner nondeterministic."""
    from bag_parser_spark.sources.bag_xml import read_bag_entity_raw

    d, n_files = _delivery_zip(tmp_path)
    raw = read_bag_entity_raw(spark, str(d), "Woonplaats")
    ords = [r["__ordinal__"] for r in raw.select("__ordinal__").collect()]
    n = n_files * 3 + 4  # every parsed record, duplicates included
    assert sorted(ords) == list(range(n))


def test_multi_file_scan_spreads_across_tasks(spark, tmp_path):
    """50 standalone XML files: the parse must run distributed (multiple
    non-empty mapInPandas partitions), with every file accounted for."""
    from bag_parser_spark.sources.bag_xml import read_bag_entity_raw

    d = tmp_path / "many"
    d.mkdir()
    for f in range(50):
        (d / f"9999WPL{f:04d}.xml").write_text(
            _wpl_doc(_wpl(30000 + f, f"P{f}")), encoding="utf-8"
        )
    raw = read_bag_entity_raw(spark, str(d), "Woonplaats")
    per_part = (
        raw.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    assert sum(r["count"] for r in per_part) == 50
    assert len(per_part) > 1  # parse work is spread, not single-task
    assert raw.select("__file__").distinct().count() == 50


def test_zip_last_write_wins_stable_under_parallelism(spark, tmp_path):
    """Same delivery parsed under different shuffle widths must elect the
    same winners — arrival order is (file, ordinal), never task order."""
    d, _ = _delivery_zip(tmp_path)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        rows3 = {
            r["id"]: r["naam"]
            for r in read_bag_entity(spark, str(d), "Woonplaats", CFG)
            .repartition(3)
            .collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    rows = {
        r["id"]: r["naam"]
        for r in read_bag_entity(spark, str(d), "Woonplaats", CFG).collect()
    }
    assert rows3 == rows
    assert rows3[5000] == "Dup-uit-file-040"


def test_root_scan_skips_non_xml_siblings(spark, tmp_path):
    """Raw-delivery fallback: --bag points at a directory where the
    delivery zip sits next to a gemeenten.csv and checksum/readme files.
    The scan must skip the non-XML siblings instead of crashing iterparse
    with a bare ParseError."""
    import io as _io

    d = tmp_path / "delivery"
    d.mkdir()
    buf = _io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("9999WPL-000001.xml", _wpl_doc(_wpl(9100, "Sibling")))
    with zipfile.ZipFile(d / "lvbag-extract-nl.zip", "w") as outer:
        outer.writestr("9999WPL08082025.zip", buf.getvalue())
    (d / "gemeenten.csv").write_text("id;naam\n1;X\n", encoding="utf-8")
    (d / "checksums.sha256").write_text("deadbeef lvbag.zip\n")
    (d / "readme.txt").write_text("delivery notes")
    out = read_bag_entity(
        spark, str(d), "Woonplaats", CFG, member_prefix="9999WPL"
    ).collect()
    assert [r["id"] for r in out] == [9100]


# ---------------------------------------------------------------------------
# native (JVM) XML backend — parity with the iterparse backend
# ---------------------------------------------------------------------------

def test_native_backend_parity_on_generated_corpus(spark, tmp_path):
    """cfg.xml_backend='native' must produce exactly the rows the default
    iterparse backend produces on a plain-XML delivery (the post-extract
    layout), for every entity — including repeated nevenadres parent refs,
    inactive-record filtering, geometry bracket wrap, and coordinate
    derivation — and its plan must contain NO Python evaluation stage
    (VERDICT r4 #6: the parse stays JVM-side)."""
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from scripts.import_bench import SNAPSHOT, generate_fixture

    from bag_parser_spark.config import EngineConfig
    from bag_parser_spark.plans.bag_job import XML_ENTITIES, entity_xml_path
    from bag_parser_spark.sources.bag_xml import read_bag_entity
    from bag_parser_spark.sources.bag_schemas import ENTITIES

    root = str(tmp_path / "plain")
    generate_fixture(root, 1500, objects_per_file=400, layout="plain")
    base = dict(active_only=True, snapshot_date=SNAPSHOT)
    cfg_it = EngineConfig(**base)
    cfg_nat = EngineConfig(**base, xml_backend="native")
    for entity in XML_ENTITIES:
        path = entity_xml_path(root, entity)
        it = read_bag_entity(
            spark, path, entity, cfg_it,
            member_prefix=ENTITIES[entity].file_code,
        )
        nat = read_bag_entity(spark, path, entity, cfg_nat)
        assert it.columns == nat.columns, entity
        plan = nat._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" not in plan and "Python" not in plan, entity
        a = sorted(map(tuple, it.collect()))
        b = sorted(map(tuple, nat.collect()))
        assert a == b, (
            f"{entity}: {len(a)} iterparse vs {len(b)} native rows; "
            f"first diff: "
            f"{next((x for x, y in zip(a, b) if x != y), (a or b)[:1])}"
        )
        assert len(a) > 0, entity


def test_native_backend_last_write_wins_across_files(spark, tmp_path):
    """Cross-file upsert order for the native backend: the later file (by
    path) must win for a duplicate id, matching iterparse's
    (__file__, __ordinal__) rule."""
    from tests.test_bag_job import OBJ_NS

    from bag_parser_spark.config import EngineConfig
    from bag_parser_spark.sources.bag_xml import read_bag_entity

    def wpl_doc(naam):
        return (
            '<?xml version="1.0" encoding="UTF-8"?>\n<root' + OBJ_NS + ">"
            "<Objecten:Woonplaats>"
            "<Objecten:identificatie>1050</Objecten:identificatie>"
            f"<Objecten:naam>{naam}</Objecten:naam>"
            "<Objecten:status>Woonplaats aangewezen</Objecten:status>"
            "<Historie:beginGeldigheid>2010-01-01</Historie:beginGeldigheid>"
            "</Objecten:Woonplaats></root>"
        )

    (tmp_path / "9999WPL0001.xml").write_text(wpl_doc("Oud"), encoding="utf-8")
    (tmp_path / "9999WPL0002.xml").write_text(wpl_doc("Nieuw"), encoding="utf-8")
    cfg = EngineConfig(active_only=True, snapshot_date="2026-01-01",
                       xml_backend="native")
    rows = read_bag_entity(
        spark, str(tmp_path / "9999WPL*"), "Woonplaats", cfg
    ).collect()
    assert len(rows) == 1 and rows[0]["naam"] == "Nieuw"


def test_native_backend_rejects_zips_loudly(spark, tmp_path):
    import zipfile as _zf

    import pytest

    from bag_parser_spark.config import EngineConfig
    from bag_parser_spark.sources.bag_xml import read_bag_entity

    with _zf.ZipFile(tmp_path / "9999WPL.zip", "w") as zf:
        zf.writestr("9999WPL0001.xml", "<root/>")
    cfg = EngineConfig(xml_backend="native")
    with pytest.raises(ValueError, match="cannot read zip"):
        read_bag_entity(spark, str(tmp_path), "Woonplaats", cfg)


def test_native_backend_parity_special_characters(spark, tmp_path):
    """Escaped entities, accented text, and CDATA must decode identically
    in both backends (the iterparse reader resolves them via ElementTree;
    the native reader must agree or silently corrupt names like
    Súdwest-Fryslân)."""
    from tests.test_bag_job import OBJ_NS

    from bag_parser_spark.config import EngineConfig
    from bag_parser_spark.sources.bag_xml import read_bag_entity

    doc = (
        '<?xml version="1.0" encoding="UTF-8"?>\n<root' + OBJ_NS + ">"
        "<Objecten:Woonplaats>"
        "<Objecten:identificatie>1900</Objecten:identificatie>"
        "<Objecten:naam>Súdwest-Fryslân &amp; Co &lt;x&gt;</Objecten:naam>"
        "<Objecten:status>Woonplaats aangewezen</Objecten:status>"
        "<Historie:beginGeldigheid>2010-01-01</Historie:beginGeldigheid>"
        "</Objecten:Woonplaats>"
        "<Objecten:Woonplaats>"
        "<Objecten:identificatie>1901</Objecten:identificatie>"
        "<Objecten:naam><![CDATA[Plaats <met> & rare tekens]]></Objecten:naam>"
        "<Objecten:status>Woonplaats aangewezen</Objecten:status>"
        "<Historie:beginGeldigheid>2010-01-01</Historie:beginGeldigheid>"
        "</Objecten:Woonplaats></root>"
    )
    (tmp_path / "9999WPL0001.xml").write_text(doc, encoding="utf-8")
    base = dict(active_only=True, snapshot_date="2026-01-01")
    rows = {}
    for backend in ("iterparse", "native"):
        cfg = EngineConfig(**base, xml_backend=backend)
        rows[backend] = sorted(
            (r["id"], r["naam"])
            for r in read_bag_entity(
                spark, str(tmp_path / "9999WPL*"), "Woonplaats", cfg,
                member_prefix="9999WPL",
            ).collect()
        )
    assert rows["iterparse"] == rows["native"]
    assert rows["iterparse"][0] == (1900, "Súdwest-Fryslân & Co <x>")
    assert rows["iterparse"][1] == (1901, "Plaats <met> & rare tekens")


def test_native_backend_parity_real_nested_vbo_layout(spark, tmp_path):
    """The real delivery nests PandRef inside maaktDeelUitVan and the
    point inside geometrie/gml:Point; the native schema must read both
    (plus the flat layout) and agree with iterparse on every column —
    including the derived rd/wgs coordinates."""
    d = tmp_path / "vbo_real"
    d.mkdir()
    (d / "9999VBO0001.xml").write_text(
        _vbo_xml().replace(
            "<gml:pos>155000.0 463000.0 0.0</gml:pos>",
            "<Objecten:geometrie><gml:Point>"
            "<gml:pos>155000.0 463000.0 0.0</gml:pos>"
            "</gml:Point></Objecten:geometrie>",
        ),
        encoding="utf-8",
    )
    rows = {}
    for backend in ("iterparse", "native"):
        cfg = EngineConfig(active_only=True, snapshot_date=SNAPSHOT,
                           xml_backend=backend)
        out = read_bag_entity(spark, str(d / "9999VBO*"), "Verblijfsobject",
                              cfg).collect()
        assert len(out) == 1, backend
        rows[backend] = out[0].asDict()
    assert rows["iterparse"] == rows["native"]
    r = rows["native"]
    assert r["pand_id"] == "PAND1,PAND2"
    assert r["rd_x"] == 155000.0 and r["rd_y"] == 463000.0


def test_extract_bag_delivery_two_level_zip(spark, tmp_path):
    """The REAL delivery shape: one outer zip holding per-entity zips
    whose members are anonymous numbered XMLs. extract_bag_delivery
    must flatten to plain .xml files that keep per-entity selection via
    the file-code prefix, and the native backend must then read them."""
    import sys as _sys
    import zipfile as _zf

    import os as _os

    _sys.path.insert(
        0, _os.path.join(_os.path.dirname(__file__), "..", "scripts")
    )
    from import_bench import SNAPSHOT, generate_fixture

    from bag_parser_spark.config import EngineConfig
    from bag_parser_spark.plans.bag_job import entity_xml_path
    from bag_parser_spark.sources.bag_xml import (
        extract_bag_delivery,
        read_bag_entity,
    )

    inner = tmp_path / "inner"
    generate_fixture(str(inner), 200, objects_per_file=100, layout="zips")
    outer = tmp_path / "lvbag-extract-nl.zip"
    with _zf.ZipFile(outer, "w") as zf:
        for p in sorted(inner.glob("*.zip")):
            zf.write(p, p.name)

    dest = str(tmp_path / "flat")
    extract_bag_delivery(str(outer), dest)
    xmls = sorted(_os.listdir(dest))
    assert xmls and all(x.endswith(".xml") for x in xmls)
    # per-entity file-code glob still selects (names carry the prefix)
    wpl_glob = entity_xml_path(dest, "Woonplaats")
    assert wpl_glob != dest  # matched the 9999WPL* pattern

    cfg = EngineConfig(
        active_only=True, snapshot_date=SNAPSHOT, xml_backend="native"
    )
    rows = read_bag_entity(spark, wpl_glob, "Woonplaats", cfg)
    assert rows.count() > 0


def test_auto_backend_routing_guards(tmp_path):
    """ADVICE r8: 'auto' must route remote URIs to the zip-capable
    iterparse path (the local zip glob cannot see into s3://), and
    delivery_has_zips must find zips NESTED in subdirectories, not just
    top-level ones."""
    from bag_parser_spark.sources.bag_xml import (
        _is_local_path,
        delivery_has_zips,
    )

    assert _is_local_path(str(tmp_path))
    assert _is_local_path("file:///data/bag")
    assert not _is_local_path("s3://bucket/bag/delivery.zip")
    assert not _is_local_path("hdfs://nn:8020/bag")

    nested = tmp_path / "delivery" / "sub"
    nested.mkdir(parents=True)
    assert not delivery_has_zips(str(tmp_path / "delivery"))
    (nested / "9999MUT.zip").write_bytes(b"PK\x03\x04")
    assert delivery_has_zips(str(tmp_path / "delivery"))
