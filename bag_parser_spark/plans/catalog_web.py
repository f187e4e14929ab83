"""Catalog extension: URL / domain-level web-curation queries — the
stage real web-corpus pipelines (C4, RefinedWeb, Dolma) run BEFORE any
content filtering (VERDICT r6 "next" #4): URL canonicalization,
registered-domain extraction against a public-suffix list, per-domain
document caps, and domain allow/block-list filtering.

The testdata has no URL column, so every query derives a deterministic
messy URL per document from (doc_id) arithmetic — mixed-case schemes and
hosts, www/blog subdomains, default and explicit ports, tracking
parameters, fragments — via ONE SQL expression string evaluated by BOTH
engines (Spark ``F.expr`` and the DuckDB oracle CTE), so the input side
is construction-parity by definition and the oracle verifies only the
operator logic. The operators themselves live in ``operators/urls.py``
and are expression-only (whole-stage codegen; no UDFs); the only
corpus shuffle in the family is the per-domain cap's window, keyed by
registered domain.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bag_parser_spark.operators import urls
from bag_parser_spark.plans.catalog import register
from bag_parser_spark.sources.parquet import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# One messy-URL expression, valid in BOTH Spark SQL and DuckDB (shared
# subset: CASE / % / || / CAST AS STRING). Varies scheme case, www/blog
# subdomains, site number, TLD (incl. multi-label suffixes), default
# (:443) and explicit (:8080) ports, empty and non-empty paths,
# tracking-heavy / mixed / tracking-only / absent query strings, and a
# fragment — every branch of the canonicalizer gets real volume.
URL_EXPR = (
    "CASE WHEN doc_id % 3 = 0 THEN 'https' WHEN doc_id % 3 = 1 THEN 'HTTP' "
    "ELSE 'Https' END || '://' || "
    "CASE WHEN doc_id % 5 = 0 THEN 'WWW.' WHEN doc_id % 5 = 1 THEN 'blog.' "
    "ELSE '' END || "
    "'Site' || CAST(doc_id % 37 AS STRING) || '.' || "
    "CASE WHEN doc_id % 7 = 0 THEN 'co.uk' "
    "WHEN doc_id % 7 = 1 THEN 'github.io' "
    "WHEN doc_id % 7 = 2 THEN 'org' "
    "WHEN doc_id % 7 = 3 THEN 'blogspot.com' "
    "WHEN doc_id % 7 = 4 THEN 'io' ELSE 'com' END || "
    "CASE WHEN doc_id % 4 = 0 THEN ':443' "
    "WHEN doc_id % 4 = 1 THEN ':8080' ELSE '' END || "
    "CASE WHEN doc_id % 6 = 0 THEN '' "
    "ELSE '/p/' || CAST(doc_id % 100 AS STRING) END || "
    "CASE WHEN doc_id % 8 = 0 THEN "
    "'?utm_source=feed&id=' || CAST(doc_id % 50 AS STRING) || '&gclid=xyz' "
    "WHEN doc_id % 8 = 1 THEN "
    "'?id=' || CAST(doc_id % 50 AS STRING) || '&utm_campaign=q&ref=home' "
    "WHEN doc_id % 8 = 2 THEN '?utm_medium=email' ELSE '' END || "
    "CASE WHEN doc_id % 9 = 0 THEN '#section-2' ELSE '' END"
)

_TRACK_IN = ", ".join(f"'{t}'" for t in urls.TRACKING_EXACT)

# DuckDB CTE chain mirroring operators/urls.py::canonicalize_url — the
# same regexes, the same lower/www/default-port/path/query steps.
_CANON_CTES = f"""
    urls AS (SELECT doc_id, n_chars, {URL_EXPR} AS url FROM documents),
    defrag AS (
      SELECT doc_id, n_chars, url,
             regexp_replace(url, '#.*', '') AS d
      FROM urls
    ),
    parts AS (
      SELECT doc_id, n_chars, url,
             lower(regexp_extract(d, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
               AS scheme,
             regexp_extract(d, '^[^:/?]+://([^/?]*)', 1) AS hostport,
             regexp_extract(d, '^[^:/?]+://[^/?]*([^?]*)', 1) AS path,
             regexp_extract(d, '\\?(.*)$', 1) AS query
      FROM defrag
    ),
    hostd AS (
      SELECT *, regexp_replace(lower(hostport), '^www\\.', '') AS h
      FROM parts
    ),
    hostp AS (
      SELECT doc_id, n_chars, url, scheme, path, query,
             CASE WHEN scheme = 'http' AND h LIKE '%:80'
                    THEN substr(h, 1, length(h) - 3)
                  WHEN scheme = 'https' AND h LIKE '%:443'
                    THEN substr(h, 1, length(h) - 4)
                  ELSE h END AS host
      FROM hostd
    ),
    canon AS (
      SELECT doc_id, n_chars, url, host,
             string_split(host, ':')[1] AS hostname,
             scheme || '://' || host
               || CASE WHEN path = '' THEN '/' ELSE path END
               || CASE WHEN q = '' THEN '' ELSE '?' || q END
               AS canonical_url
      FROM (
        SELECT *,
               -- coalesce: DuckDB array_to_string([]) is NULL where
               -- Spark array_join([]) is ''
               coalesce(array_to_string(list_filter(string_split(query, '&'),
                 p -> NOT (string_split(p, '=')[1] IN ({_TRACK_IN})
                           OR string_split(p, '=')[1] LIKE 'utm_%')
                      AND p <> ''), '&'), '') AS q
        FROM hostp
      )
    )
"""

# registered-domain CASE over label depths, generated from the SAME
# suffix list the Spark operator compiles in (deepest match first: a
# SQL CASE takes the first hit, the Spark when-chain lets deeper
# overwrite — both resolve to the longest suffix)
_BY_DEPTH: dict[int, list[str]] = {}
for _s in urls.PUBLIC_SUFFIXES:
    _BY_DEPTH.setdefault(_s.count(".") + 1, []).append(_s)


def _rd_case() -> str:
    branches = []
    for depth in sorted(_BY_DEPTH, reverse=True):
        sufs = ", ".join(f"'{s}'" for s in _BY_DEPTH[depth])
        branches.append(
            f"WHEN len(labels) > {depth} AND array_to_string("
            f"labels[len(labels)-{depth - 1}:len(labels)], '.') IN ({sufs}) "
            f"THEN array_to_string("
            f"labels[len(labels)-{depth}:len(labels)], '.')"
        )
    return "CASE " + " ".join(branches) + " ELSE hostname END"


_RD_CTE = f"""
    rd AS (
      SELECT doc_id, n_chars, url, host, canonical_url,
             {_rd_case()} AS registered_domain
      FROM (SELECT *, string_split(hostname, '.') AS labels FROM canon)
    )
"""


def _with_urls(spark, sf_dir):
    """documents + derived url + canonical columns + registered domain
    (the Spark half of the shared construction)."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", F.expr(URL_EXPR).alias("url")
    )
    u = F.col("url")
    scheme, hostport, _, _ = urls.split_parts(u)
    host = urls.canonical_host(hostport, F.lower(scheme))
    d = d.select(
        "doc_id",
        "n_chars",
        "url",
        host.alias("host"),
        F.split(host, ":", 2).getItem(0).alias("hostname"),
        urls.canonicalize_url(u).alias("canonical_url"),
    )
    return urls.with_registered_domain(d, "hostname", spark)


@register(
    "url_canonicalize",
    f"""
    WITH {_CANON_CTES}
    SELECT doc_id, url, host, canonical_url FROM canon
    """,
    doc="URL canonicalization (C4-style): lowercase scheme+host, strip "
    "'www.', drop the scheme's default port (:80/:443) but keep "
    "explicit ones, normalize the empty path to '/', drop the "
    "fragment, and strip tracking params (utm_*, gclid, fbclid, ...) "
    "while preserving surviving-param order. Pure string/array "
    "expressions — whole-stage codegen, pushes through the scan, zero "
    "shuffles; at 100 TB this is free map work riding the first read.",
)
def q_url_canonicalize(spark, sf_dir):
    return _with_urls(spark, sf_dir).select(
        "doc_id", "url", "host", "canonical_url"
    )


@register(
    "url_domain_stats",
    f"""
    WITH {_CANON_CTES}, {_RD_CTE}
    SELECT registered_domain,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM rd GROUP BY registered_domain
    """,
    doc="Registered-domain extraction + per-domain corpus profile. The "
    "public-suffix longest-match ('a.b.co.uk' -> 'b.co.uk', not "
    "'co.uk') compiles to per-label-depth set membership over the "
    "host's label array — map-side expressions, no join; the only "
    "shuffle is the final groupBy on registered_domain. The per-domain "
    "doc/host/char profile is what curation dashboards rank to find "
    "over-represented domains before capping.",
)
def q_url_domain_stats(spark, sf_dir):
    return (
        _with_urls(spark, sf_dir)
        .groupBy("registered_domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("host").alias("n_hosts"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


_CAP_K = 5
_CAP_SEED = "domcap"


@register(
    "url_domain_cap",
    f"""
    WITH {_CANON_CTES}, {_RD_CTE}
    SELECT doc_id, registered_domain, sample_rank FROM (
      SELECT doc_id, registered_domain,
             ROW_NUMBER() OVER (
               PARTITION BY registered_domain
               ORDER BY md5('{_CAP_SEED}:' || CAST(doc_id AS STRING)) ASC,
                        doc_id ASC) AS sample_rank
      FROM rd
    ) WHERE sample_rank <= {_CAP_K}
    """,
    doc="Per-domain document cap (<=5 docs per registered domain) — the "
    "anti-over-representation step every web pipeline applies; reuses "
    "sample_per_group's deterministic md5(seed:id) fair draw so the "
    "kept subset is engine- and rerun-stable, not arrival-order bias. "
    "One window shuffle keyed by registered_domain — and it is "
    "viral-domain-safe AS IS: Catalyst plans a map-side Partial "
    "WindowGroupLimit before the exchange (<= k rows per group per map "
    "partition ever ship), probed flat at 95% single-domain skew and "
    "pinned by plan test. sample_per_group(salted=True) remains the "
    "output-identical manual fallback for rank shapes the pushdown "
    "can't cover (SCALE.md r7).",
)
def q_url_domain_cap(spark, sf_dir):
    from bag_parser_spark.operators import sampling

    return sampling.sample_per_group(
        _with_urls(spark, sf_dir),
        keys=["registered_domain"],
        id_col="doc_id",
        k=_CAP_K,
        seed=_CAP_SEED,
    ).select("doc_id", "registered_domain", "sample_rank")


_BLOCKED = ("site0.co.uk", "site5.com", "site12.org", "badsite.net")
_ALLOWED = ("site5.com",)


@register(
    "url_blocklist_filter",
    f"""
    WITH {_CANON_CTES}, {_RD_CTE}
    SELECT doc_id, registered_domain FROM rd
    WHERE registered_domain NOT IN (
      SELECT d FROM (VALUES {", ".join(f"('{d}')" for d in _BLOCKED)}) b(d)
      WHERE d NOT IN (
        SELECT d FROM (VALUES {", ".join(f"('{d}')" for d in _ALLOWED)}) a(d)
      )
    )
    """,
    doc="Domain allow/block-list filtering: drop documents whose "
    "registered domain is blocklisted, with the allowlist overriding "
    "(an explicitly allowed domain survives even when also blocked — "
    "the standard curation precedence). Both lists are curation "
    "artifacts (thousands of rows at most) so both joins BROADCAST; "
    "the corpus never shuffles, the anti-join runs map-side.",
)
def q_url_blocklist_filter(spark, sf_dir):
    blocked = spark.createDataFrame(
        [(d,) for d in _BLOCKED], "domain string"
    )
    allowed = spark.createDataFrame(
        [(d,) for d in _ALLOWED], "domain string"
    )
    return urls.apply_domain_blocklist(
        _with_urls(spark, sf_dir),
        "registered_domain",
        blocked,
        allowed=allowed,
    ).select("doc_id", "registered_domain")


# Colliding messy-URL expression for the canonical-dedup query: the PAGE
# IDENTITY (site, tld, path, id param) depends only on doc_id % 60, while
# the MESS (scheme case, 'WWW.', ':443' on an always-https scheme,
# tracking params, fragment) varies with the full doc_id — so ~60
# canonical groups of ~n/60 docs each exist BY CONSTRUCTION and
# canonicalization is what collapses them (a non-colliding expression
# here would make the query pass trivially on zero rows).
URL_COLLIDE_EXPR = (
    "CASE WHEN doc_id % 3 = 0 THEN 'https' WHEN doc_id % 3 = 1 THEN "
    "'HTTPS' ELSE 'Https' END || '://' || "
    "CASE WHEN doc_id % 5 = 0 THEN 'WWW.' ELSE '' END || "
    "'site' || CAST(doc_id % 60 % 12 AS STRING) || '.' || "
    "CASE WHEN doc_id % 60 % 5 = 0 THEN 'co.uk' "
    "WHEN doc_id % 60 % 5 = 1 THEN 'org' "
    "WHEN doc_id % 60 % 5 = 2 THEN 'io' "
    "WHEN doc_id % 60 % 5 = 3 THEN 'net' ELSE 'com' END || "
    "CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END || "
    "'/p/' || CAST(doc_id % 60 % 20 AS STRING) || "
    "'?id=' || CAST(doc_id % 60 % 10 AS STRING) || "
    "CASE WHEN doc_id % 8 = 0 THEN '&utm_source=feed&gclid=z' "
    "WHEN doc_id % 8 = 1 THEN '&utm_campaign=q' ELSE '' END || "
    "CASE WHEN doc_id % 9 = 0 THEN '#frag' ELSE '' END"
)

_COLLIDE_CANON_CTES = _CANON_CTES.replace(
    f"{URL_EXPR} AS url", f"{URL_COLLIDE_EXPR} AS url"
)


@register(
    "url_canonical_dedup",
    f"""
    WITH {_COLLIDE_CANON_CTES}
    SELECT canonical_url,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_dups
    FROM canon GROUP BY canonical_url HAVING COUNT(*) > 1
    """,
    doc="Canonical-URL dedup (the C4 re-crawl collapse): after "
    "canonicalization, documents fetched via tracking-param / fragment "
    "/ case / default-port variants of one URL group together; keep "
    "the min-id representative per canonical URL and report group "
    "sizes. Runs BEFORE content hashing in real pipelines — it "
    "catches re-crawls whose bodies differ by timestamps, which "
    "content-exact dedup misses. One groupBy shuffle on the canonical "
    "URL (an md5 of it at 100 TB to keep shuffle rows narrow). The "
    "fixture URL expression collides by construction (identity from "
    "doc_id%60, mess from full doc_id) so the collapse is exercised "
    "on real volume, not zero rows.",
)
def q_url_canonical_dedup(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(URL_COLLIDE_EXPR).alias("url")
    )
    d = d.select(
        "doc_id", urls.canonicalize_url(F.col("url")).alias("canonical_url")
    )
    return (
        d.groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .filter(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# web_link_extract / web_link_graph — href harvesting, reference
# resolution, and host-level edge aggregation (r7 late: the crawl-
# frontier / web-graph construction step that feeds ml_pagerank_step)
# ---------------------------------------------------------------------------

# Per-page HTML synthesized from doc_id alone (dual-dialect; hrefs are
# double-quoted so the single extraction regex covers every branch):
# an absolute mixed-case external link, a protocol-relative CDN link
# (even ids), a root-relative link, a path-relative link (ids % 3),
# dropped fragment/javascript links (ids % 4), and a dropped mailto
# (ids % 5).
_LINK_HTML_EXPR = (
    "'<html><body>' || "
    "'<a href=\"HTTP://Ext' || CAST(doc_id % 7 AS STRING) || "
    "'.COM/p/1\">x</a>' || "
    "CASE WHEN doc_id % 2 = 0 THEN "
    "'<a href=\"//cdn' || CAST(doc_id % 3 AS STRING) || "
    "'.example.org/lib.js\">c</a>' ELSE '' END || "
    "'<a href=\"/about\">a</a>' || "
    "CASE WHEN doc_id % 3 = 0 THEN "
    "'<a href=\"img/logo' || CAST(doc_id % 5 AS STRING) || "
    "'.png\">i</a>' ELSE '' END || "
    "CASE WHEN doc_id % 4 = 0 THEN "
    "'<a href=\"#top\">t</a><a href=\"javascript:void(0)\">j</a>' "
    "ELSE '' END || "
    "CASE WHEN doc_id % 5 = 0 THEN "
    "'<a href=\"mailto:x@example.com\">m</a>' ELSE '' END || "
    "'</body></html>'"
)

# shared CTE tail: page base components (from the canonicalizer's
# parts/hostp chain) + extraction + ordinal + resolution — the same
# CASE the Spark resolve_link compiles to
_LINK_CTES = f"""
    base AS (
      SELECT doc_id, scheme, host,
             CASE WHEN path = '' THEN '/' ELSE path END AS npath,
             {_LINK_HTML_EXPR} AS html
      FROM hostp
    ),
    lnk AS (
      SELECT doc_id, scheme, host, npath,
             regexp_extract_all(html, 'href="([^"]*)"', 1) AS ls
      FROM base
    ),
    pos AS (
      SELECT doc_id, scheme, host, npath, i - 1 AS link_no, ls[i] AS raw
      FROM (SELECT *, unnest(range(1, len(ls) + 1)) AS i FROM lnk)
    ),
    res AS (
      SELECT doc_id, link_no, host AS src_hostport,
             CASE
               WHEN regexp_matches(raw, '^[Hh][Tt][Tt][Pp][Ss]?://')
                 THEN raw
               WHEN starts_with(raw, '//') THEN scheme || ':' || raw
               WHEN starts_with(raw, '/')
                 THEN scheme || '://' || host || raw
               WHEN raw = ''
                    OR regexp_matches(raw, '^(javascript:|mailto:|#)')
                 THEN NULL
               ELSE scheme || '://' || host
                    || regexp_replace(npath, '[^/]*$', '') || raw
             END AS link_url
      FROM pos
    )
"""


def _link_pages(spark, sf_dir):
    """(doc_id, scheme, host, npath, html) — the Spark half of the
    shared construction (canonical base components + fixture HTML)."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(URL_EXPR).alias("url"),
        F.expr(_LINK_HTML_EXPR).alias("html"),
    )
    scheme, hostport, path, _ = urls.split_parts(F.col("url"))
    scheme_l = F.lower(scheme)
    return d.select(
        "doc_id",
        "html",
        scheme_l.alias("scheme"),
        urls.canonical_host(hostport, scheme_l).alias("host"),
        F.when(path == "", F.lit("/")).otherwise(path).alias("npath"),
    )


@register(
    "web_link_extract",
    f"""
    WITH {_CANON_CTES}, {_LINK_CTES}
    SELECT doc_id, CAST(link_no AS BIGINT) AS link_no, link_url
    FROM res WHERE link_url IS NOT NULL
    """,
    doc="Outgoing-link harvest + RFC 3986-lite resolution — the crawl "
    "frontier / web-graph construction step: regexp_extract_all pulls "
    "every href, posexplode keeps in-page order (link_no gaps where "
    "pseudo-links were dropped), and one codegen CASE absolutizes "
    "each target against the page's canonical base (absolute pass "
    "through; '//' inherits the scheme; '/' joins scheme://host; "
    "path-relative joins the base directory; fragment/javascript:/"
    "mailto:/empty resolve to NULL and drop). Map-only — the explode "
    "multiplies by the page's own link count, never corpus size; at "
    "100 TB this rides the scan like canonicalization.",
)
def q_web_link_extract(spark, sf_dir):
    return urls.extract_links(
        _link_pages(spark, sf_dir),
        id_col="doc_id",
        html_col="html",
        scheme_col="scheme",
        host_col="host",
        path_col="npath",
    ).select(
        "doc_id", F.col("link_no").cast("long").alias("link_no"), "link_url"
    )


@register(
    "web_link_graph",
    f"""
    WITH {_CANON_CTES}, {_LINK_CTES}
    SELECT string_split(src_hostport, ':')[1] AS src_host,
           string_split(
             regexp_replace(
               lower(regexp_extract(link_url, '^[^:/?]+://([^/?]*)', 1)),
               '^www\\.', ''),
             ':')[1] AS dst_host,
           CAST(COUNT(*) AS BIGINT) AS n_links
    FROM res WHERE link_url IS NOT NULL
    GROUP BY 1, 2
    """,
    doc="Host-level link graph: the harvested+resolved edge list "
    "aggregated to (src_host, dst_host, n_links) — the input shape "
    "ml_pagerank_step consumes and the domain-graph view curation "
    "dashboards rank. One groupBy shuffle on the host pair; "
    "everything upstream is the map-only extract/resolve chain, so "
    "the shuffle carries (host, host, 1) triples — never pages.",
)
def q_web_link_graph(spark, sf_dir):
    ex = urls.extract_links(
        _link_pages(spark, sf_dir),
        id_col="doc_id",
        html_col="html",
        scheme_col="scheme",
        host_col="host",
        path_col="npath",
        keep=("host",),
    )
    return (
        ex.select(
            F.split(F.col("host"), ":", 2).getItem(0).alias("src_host"),
            urls.host_only(F.col("link_url")).alias("dst_host"),
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


# ---------------------------------------------------------------------------
# web_robots_filter — RFC 9309 longest-match rule evaluation (r7 late:
# the crawl-politeness gate between link harvest and fetch)
# ---------------------------------------------------------------------------

# Literal rule set over hostnames the URL fixture actually produces
# (site numbers x suffixes from URL_EXPR). Branch coverage: a blanket
# '/' disallow (blocks a whole host), a '/p/' disallow overridden by a
# LONGER '/p/1' allow (longest match wins), an equal-length
# allow/disallow tie on '/p/2' (allow wins ties), and hosts with no
# rules at all (allowed by default).
_ROBOTS_RULES = (
    ("site1.github.io", "disallow", "/"),
    ("site3.io", "disallow", "/p/"),
    ("site3.io", "allow", "/p/1"),
    ("site10.blogspot.com", "allow", "/p/2"),
    ("site10.blogspot.com", "disallow", "/p/2"),
    ("site5.com", "disallow", "/p/9"),
)

_ROBOTS_VALUES = ", ".join(
    f"('{d}', '{t}', '{p}')" for d, t, p in _ROBOTS_RULES
)


@register(
    "web_robots_filter",
    f"""
    WITH {_CANON_CTES},
    rules(domain, rule_type, path_prefix) AS (
      VALUES {_ROBOTS_VALUES}
    ),
    pages AS (
      SELECT c.doc_id, c.hostname,
             CASE WHEN p.path = '' THEN '/' ELSE p.path END AS npath
      FROM canon c JOIN parts p USING (doc_id)
    ),
    matched AS (
      SELECT p.doc_id, p.hostname, p.npath, r.rule_type, r.path_prefix,
             ROW_NUMBER() OVER (
               PARTITION BY p.doc_id
               ORDER BY length(r.path_prefix) DESC, r.rule_type ASC
             ) AS rnk
      FROM pages p
      LEFT JOIN rules r
        ON p.hostname = r.domain
       AND starts_with(p.npath, r.path_prefix)
       AND r.path_prefix <> ''
    )
    SELECT doc_id, hostname, npath,
           (rule_type IS NULL OR rule_type = 'allow') AS allowed,
           rule_type AS matched_rule, path_prefix AS matched_prefix
    FROM matched WHERE rnk = 1
    """,
    doc="robots.txt rule evaluation (RFC 9309 longest-match): among a "
    "host's rules whose prefix matches the page path, the longest "
    "decides, ties go to allow, and no match means allowed — the "
    "crawl-politeness gate between link harvest and fetch. Rules are "
    "a curation artifact so the join BROADCASTS (the corpus never "
    "shuffles); the only other work is a doc-keyed window over that "
    "doc's own matches, bounded by its domain's rule count. "
    "parse_robots (the text -> rules half, last-non-null user-agent "
    "window) is unit-tested on handcrafted robots.txt content.",
)
def q_web_robots_filter(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(URL_EXPR).alias("url")
    )
    u = F.col("url")
    scheme, hostport, path, _ = urls.split_parts(u)
    pages = d.select(
        "doc_id",
        F.split(
            urls.canonical_host(hostport, F.lower(scheme)), ":", 2
        ).getItem(0).alias("hostname"),
        F.when(path == "", F.lit("/")).otherwise(path).alias("npath"),
    )
    rules = spark.createDataFrame(
        list(_ROBOTS_RULES), "domain string, rule_type string, path_prefix string"
    )
    return urls.apply_robots(
        pages, rules, id_col="doc_id", host_col="hostname", path_col="npath"
    )
