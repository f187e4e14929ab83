"""URL / domain-level curation operators — the stage web-corpus pipelines
(C4, RefinedWeb, Dolma) run BEFORE any content-based filtering: URL
canonicalization, registered-domain extraction against a public-suffix
list, per-domain document caps, and domain allow/block-list joins.

Everything here is expression-only (whole-stage-codegen'd string/array
functions — no UDFs) plus at most one broadcast join (the suffix /
block lists are small by nature) and one window shuffle keyed by domain
(the cap). At 100 TB: canonicalization and host extraction are per-row
map work that pushes through the scan; the suffix match replicates a
few-KB list to every task; the per-domain cap is the only shuffle and
it partitions by registered domain — the key with the heaviest real
skew (one giant domain), which Catalyst's map-side WindowGroupLimit
already bounds to k rows per map partition (probed flat at 95%
single-domain skew, SCALE.md r7; ``sample_per_group``'s ``salted=True``
two-stage top-k remains the output-identical manual fallback).

The reference has no web stage (it is a BAG parser); this family is
part of the training-data extension surface (VERDICT r6 "next" #4).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Tracking parameters stripped during canonicalization — the ubiquitous
# analytics/click-id params whose values never change page content.
# Prefix classes (utm_*) and exact names, both engine-reproducible as
# plain predicates over the split query string.
TRACKING_EXACT = ("fbclid", "gclid", "msclkid", "ref", "mc_eid")
TRACKING_PREFIX = "utm_"

# A deliberately small public-suffix sample (the real PSL is ~9k rules;
# the operator contract — longest-suffix match via broadcast join — is
# identical at any list size). Multi-label entries exercise the
# longest-match logic: "co.uk" must beat "uk".
PUBLIC_SUFFIXES = (
    "com", "org", "net", "io", "dev", "edu", "gov", "nl", "de", "fr",
    "uk", "co.uk", "org.uk", "ac.uk", "au", "com.au", "jp", "co.jp",
    "github.io", "blogspot.com",
)


def strip_fragment(url: Column) -> Column:
    """Everything before the first '#' (the fragment is client-side
    only — two URLs differing in fragment fetch the same document)."""
    return F.split(url, "#", 2).getItem(0)


def split_parts(url: Column) -> tuple[Column, Column, Column, Column]:
    """(scheme, hostport, path, query) via anchored regexes. The regexes
    always match any scheme://host... input (groups may be empty) so the
    no-match semantics of regexp_extract never differ across engines."""
    defragged = strip_fragment(url)
    scheme = F.regexp_extract(defragged, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    hostport = F.regexp_extract(defragged, r"^[^:/?]+://([^/?]*)", 1)
    path = F.regexp_extract(defragged, r"^[^:/?]+://[^/?]*([^?]*)", 1)
    query = F.regexp_extract(defragged, r"\?(.*)$", 1)
    return scheme, hostport, path, query


def canonical_host(hostport: Column, scheme_lower: Column) -> Column:
    """Lowercase the host, drop a leading 'www.', drop the default port
    of the (already lowercased) scheme (http:80 / https:443); any other
    explicit port is meaningful and survives."""
    h = F.lower(hostport)
    h = F.regexp_replace(h, r"^www\.", "")
    default_port = F.when(scheme_lower == "http", F.lit(":80")).when(
        scheme_lower == "https", F.lit(":443")
    )
    return F.when(
        default_port.isNotNull() & h.endswith(default_port),
        F.substring(h, 1, F.length(h) - F.length(default_port)),
    ).otherwise(h)


def clean_query(query: Column) -> Column:
    """Strip tracking parameters, preserving the relative order of the
    survivors (C4-style: reordering would merge distinct URLs). Pure
    array ops: split on '&', filter by name predicate, rejoin."""
    parts = F.filter(
        F.split(query, "&"),
        lambda p: ~(
            F.split(p, "=", 2).getItem(0).isin(*TRACKING_EXACT)
            | F.split(p, "=", 2).getItem(0).startswith(TRACKING_PREFIX)
        )
        & (p != ""),
    )
    return F.array_join(parts, "&")


def canonicalize_url(url: Column) -> Column:
    """Full canonical form: lowercase scheme + canonical host + path
    (with a bare '' path normalized to '/') + cleaned query (omitted
    when empty). Expression-only — runs map-side inside the scan."""
    scheme, hostport, path, query = split_parts(url)
    scheme_l = F.lower(scheme)
    host = canonical_host(hostport, scheme_l)
    npath = F.when(path == "", F.lit("/")).otherwise(path)
    q = clean_query(query)
    return F.concat(
        scheme_l,
        F.lit("://"),
        host,
        npath,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )


def host_only(url: Column) -> Column:
    """Canonical host (no port) — the domain-extraction input."""
    scheme, hostport, _, _ = split_parts(url)
    return F.split(canonical_host(hostport, F.lower(scheme)), ":", 2).getItem(0)


def suffix_table(spark: SparkSession) -> DataFrame:
    """The public-suffix list as a broadcastable one-column table with
    the per-suffix label count (a 'co.uk' rule spans two labels)."""
    rows = [(s, s.count(".") + 1) for s in PUBLIC_SUFFIXES]
    return spark.createDataFrame(rows, "suffix string, labels int")


def with_registered_domain(
    df: DataFrame,
    host_col: str,
    spark: SparkSession,
    out_col: str = "registered_domain",
) -> DataFrame:
    """Attach the registered (pay-level) domain: the LONGEST public
    suffix matching the host tail, plus one label. The suffix list is a
    compile-time constant, so the match compiles to per-label-depth set
    membership over the host's label array — pure map-side expressions,
    no join and no shuffle (with a runtime-loaded PSL the same shape
    becomes a broadcast join on the label tail; either way nothing
    shuffles the corpus). Hosts matching no suffix (IPs, internal
    names) keep the whole host — the conservative grouping for capping.
    ``spark`` is unused in the literal-list shape but kept so the
    runtime-PSL variant is a drop-in replacement."""
    # suffix sets per label depth, embedded as literal arrays (the list
    # is a compile-time constant — the broadcast-join variant only wins
    # when the PSL is loaded as data; both shapes are map-side)
    by_labels: dict[int, list[str]] = {}
    for s in PUBLIC_SUFFIXES:
        by_labels.setdefault(s.count(".") + 1, []).append(s)
    host = F.col(host_col)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    out = F.col(host_col)  # fallback: whole host
    # test shallow suffixes first, deeper (longer) matches overwrite —
    # the final value is the longest match, same as PSL semantics
    for depth in sorted(by_labels):
        suffixes = by_labels[depth]
        tail = F.array_join(
            F.slice(labels, n - depth + 1, depth), "."
        )
        candidate = F.array_join(F.slice(labels, n - depth, depth + 1), ".")
        out = F.when(
            (n > depth) & tail.isin(*suffixes), candidate
        ).otherwise(out)
    return df.withColumn(out_col, out)


def with_registered_domain_from_url(
    df: DataFrame,
    url_col: str,
    spark: SparkSession,
    out_col: str = "registered_domain",
) -> DataFrame:
    """URL column → ``out_col`` in one step: split, canonical host,
    port strip, registered-domain longest match — the composition both
    `prepare_corpus` and the streaming ingest domain stage apply.
    Map-side expressions only."""
    u = F.col(url_col)
    scheme, hostport, _, _ = split_parts(u)
    host = F.split(
        canonical_host(hostport, F.lower(scheme)), ":", 2
    ).getItem(0)
    return with_registered_domain(
        df.withColumn("__hostname__", host), "__hostname__", spark,
        out_col=out_col,
    ).drop("__hostname__")


def apply_domain_blocklist(
    df: DataFrame,
    domain_col: str,
    blocked: DataFrame,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Allow/block-list filtering by registered domain. ``blocked`` is a
    one-column (domain) table; rows whose domain appears are dropped via
    a BROADCAST left-anti join. ``allowed`` (when given) short-circuits
    the blocklist: an explicitly allowed domain survives even if also
    blocked (the standard curation override order). Both lists are
    curation artifacts — thousands of rows at most — so both joins
    broadcast; nothing shuffles the corpus."""
    bcol = blocked.columns[0]
    b = blocked.select(F.col(bcol).alias("__blocked_domain__")).distinct()
    if allowed is not None:
        acol = allowed.columns[0]
        a = allowed.select(F.col(acol).alias("__blocked_domain__")).distinct()
        b = b.join(F.broadcast(a), "__blocked_domain__", "left_anti")
    return df.join(
        F.broadcast(b),
        df[domain_col] == F.col("__blocked_domain__"),
        "left_anti",
    )


def politeness_budget(delay: Column, window_sec: float) -> Column:
    """How many pages a host can politely yield inside one crawl window:
    ``max(1, floor(window / crawl_delay))`` — at least one fetch per
    window so slow hosts still progress, integer-exact (the floor of a
    positive double ratio). The frontier caps per-host candidates at
    this budget so a high-in-degree host with a 10 s delay stops
    crowding out the rest of the schedule."""
    return F.greatest(
        F.lit(1).cast("long"),
        F.floor(F.lit(float(window_sec)) / delay).cast("long"),
    )


def budget_ceiling(window_sec: float, min_delay: float) -> int:
    """Driver-side CONSTANT upper bound on any host's politeness budget:
    ``max(1, floor(window / min_delay))`` where ``min_delay`` is the
    politeness floor — the smallest crawl delay the schedule honors
    (from the delay table's minimum, or the crawler's etiquette floor
    when delays are unbounded below). The frontier pairs this constant
    with the per-row ``politeness_budget`` predicate: ``rank <=
    ceiling`` is implied by ``rank <= budget`` for every host (budget
    <= ceiling by monotonicity of floor), so adding it never changes
    the result — but because it is a LITERAL, Catalyst plans a map-side
    WindowGroupLimit that prunes a mega-host's candidates per map
    partition before the window shuffle ships them. Deriving it here
    (VERDICT r9 #5 / ADVICE) replaces the hand-computed fixture literal
    that silently dropped rows under a different delay distribution.

    The floor MUST be computed as divide-then-floor — the same IEEE-754
    sequence ``politeness_budget``'s Spark expression evaluates — not
    Python's ``//``. The two disagree on exact decimal ratios (``1.0 //
    0.1 == 9.0`` because ``//`` floors the correctly-rounded quotient
    of the BINARY operands, while ``floor(1.0 / 0.1) == 10``): with
    ``//``, a host whose delay equals the floor gets ``budget ==
    ceiling + 1`` and the WindowGroupLimit conjunct silently drops its
    top-budget row — the exact defect class this constant exists to
    eliminate (ADVICE r10)."""
    if not min_delay > 0:
        raise ValueError(f"politeness floor must be positive: {min_delay}")
    return max(1, math.floor(float(window_sec) / float(min_delay)))


# href extraction pattern — double-quoted attribute values; group 1 is
# the target. Capture-group extract_all works identically under Java
# regex (Spark) and RE2 (the DuckDB oracle); no backreferences.
HREF_RE = r'href="([^"]*)"'


def resolve_link(
    link: Column, scheme: Column, host: Column, path: Column
) -> Column:
    """RFC 3986-lite reference resolution for harvested hrefs, as one
    codegen CASE: absolute http(s) targets pass through; protocol-
    relative ('//cdn...') inherit the base scheme; root-relative
    ('/about') join scheme://host; fragments, empty targets and
    javascript:/mailto: pseudo-links resolve to NULL (dropped by the
    caller); anything else is path-relative and joins the base
    DIRECTORY (base path with its last segment stripped). ``path``
    must be the normalized base path ('' already mapped to '/'), so
    the directory join always has its leading slash. An EMBEDDED
    fragment ('page.html#sec') is stripped before resolution (RFC 3986
    §5.3 resolves it into the target, but a crawl frontier never wants
    fragment-distinct URLs — ADVICE r7), so only the fragment-only
    '#...' reference resolves to NULL."""
    base_dir = F.regexp_replace(path, "[^/]*$", "")
    link = F.regexp_replace(link, "#.*$", "")
    return (
        F.when(link.rlike("^[Hh][Tt][Tt][Pp][Ss]?://"), link)
        .when(
            link.startswith("//"), F.concat(scheme, F.lit(":"), link)
        )
        .when(
            link.startswith("/"),
            F.concat(scheme, F.lit("://"), host, link),
        )
        .when(
            (link == "") | link.rlike("^(javascript:|mailto:|#)"),
            F.lit(None).cast("string"),
        )
        .otherwise(F.concat(scheme, F.lit("://"), host, base_dir, link))
    )


def extract_links(
    df: DataFrame,
    id_col: str,
    html_col: str,
    scheme_col: str,
    host_col: str,
    path_col: str,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Harvest and resolve outgoing links — the crawl-frontier / web-
    graph construction step (the edge list PageRank and domain-graph
    analyses consume). regexp_extract_all pulls every double-quoted
    href; posexplode keeps the in-page link order as ``link_no``;
    ``resolve_link`` absolutizes each target against the page's base
    (scheme, host, path); NULL resolutions (fragments, javascript:,
    mailto:, empty) are dropped. ``keep`` lists extra columns carried
    through unchanged (e.g. the source host for edge-list building).

    Scale shape: extraction and resolution are per-row string
    expressions riding the scan (whole-stage codegen, no UDF); the
    explode multiplies rows by the page's own link count, never by
    corpus size — map-only until a downstream aggregate asks for a
    shuffle."""
    exploded = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        F.col(scheme_col).alias("__scheme__"),
        F.col(host_col).alias("__host__"),
        F.col(path_col).alias("__path__"),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(HREF_RE), 1)
        ).alias("link_no", "__raw__"),
    )
    resolved = resolve_link(
        F.col("__raw__"),
        F.col("__scheme__"),
        F.col("__host__"),
        F.col("__path__"),
    )
    return (
        exploded.withColumn("link_url", resolved)
        .filter(F.col("link_url").isNotNull())
        .select(id_col, *keep, "link_no", "link_url")
    )


def _robots_grouped(
    df: DataFrame,
    domain_col: str,
    content_col: str,
) -> DataFrame:
    """Shared robots.txt line machinery: split lines, strip comments,
    lowercase the directive, keep the group-relevant records
    (user-agent / allow / disallow / crawl-delay), and number the RFC
    9309 §2.1 group islands — a ``User-agent`` line opens a NEW group
    iff the previous relevant line was not itself a User-agent line
    (blank/comment lines are dropped first, so ua-lines separated only
    by blanks merge, exactly the ABNF). Crawl-delay participates in the
    grouping (it is a rule per the ABNF, so a ua-line after it STARTS a
    new group — r9, with the politeness extension). Returns (domain,
    __pos__, __key__, __val__, __grp__) with pre-group rows dropped.
    Robots files are tiny — both windows partition on one file's
    lines, so this costs nothing at any corpus scale."""
    lines = df.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(F.split(F.col(content_col), "\n")).alias(
            "__pos__", "__raw__"
        ),
    )
    clean = F.trim(F.regexp_replace(F.col("__raw__"), "#.*", ""))
    # F.get (not getItem): lines without ':' split to one element, and
    # ANSI mode raises on out-of-range getItem — get returns NULL
    key = F.lower(F.trim(F.split(clean, ":", 2).getItem(0)))
    val = F.trim(F.get(F.split(clean, ":", 2), 1))
    relevant = lines.select(
        "domain",
        "__pos__",
        key.alias("__key__"),
        val.alias("__val__"),
    ).filter(
        F.col("__key__").isin("user-agent", "allow", "disallow", "crawl-delay")
    )
    w = Window.partitionBy("domain").orderBy("__pos__")
    is_ua = F.col("__key__") == "user-agent"
    opens_group = is_ua & ~F.coalesce(
        F.lag(is_ua).over(w), F.lit(False)
    )
    return relevant.withColumn(
        "__grp__",
        F.sum(opens_group.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).filter(F.col("__grp__") > 0)  # pre-group rules are ignored


def _group_agents(grouped: DataFrame) -> DataFrame:
    """(domain, __grp__, agent) from the grouped lines — every agent of
    each island, lowercased (matching is case-insensitive per the RFC)."""
    return (
        grouped.filter(F.col("__key__") == "user-agent")
        .select("domain", "__grp__", F.lower("__val__").alias("agent"))
        .distinct()
    )


def parse_robots(
    df: DataFrame,
    domain_col: str = "domain",
    content_col: str = "robots_txt",
) -> DataFrame:
    """Parse robots.txt content into (domain, agent, rule_type,
    path_prefix) rows with FULL RFC 9309 §2.1 group semantics: a group
    is an island of consecutive ``User-agent`` lines followed by its
    rules, and the group's rules belong to EVERY agent in the island
    (the r7 last-agent-wins simplification is gone — VERDICT r7 #5).
    Pure expressions: split lines, strip '#' comments, lowercase the
    directive; a running sum over the per-file line order numbers the
    groups (a User-agent line opens a NEW group iff the previous
    relevant line was not itself a User-agent line — blank/comment
    lines are dropped first, so ua-lines separated only by blanks
    merge, exactly the RFC's ABNF), then agents join their group's
    rules — robots files are tiny (both windows partition on one
    file's lines), so this costs nothing at any corpus scale.

    Contract details: agent tokens are lowercased (matching is
    case-insensitive per the RFC); the same agent in several groups
    gets the UNION of their rules (§2.2.1); a group with zero rules
    still emits one empty-prefix sentinel ('disallow', '') so
    downstream agent selection can see the group exists (an empty
    specific group means allow-everything and must still shadow the
    '*' group — ``apply_robots`` skips empty prefixes, so the sentinel
    never matches a page); rules before any User-agent line are
    ignored per the RFC. Crawl-delay lines don't appear here (see
    :func:`parse_crawl_delay`) but DO terminate a ua-island per the
    ABNF — a ``User-agent`` after one starts a new group.
    """
    grouped = _robots_grouped(df, domain_col, content_col)
    agents = _group_agents(grouped)
    rules = grouped.filter(
        F.col("__key__").isin("allow", "disallow")
    ).select(
        "domain",
        "__grp__",
        F.col("__key__").alias("rule_type"),
        F.col("__val__").alias("path_prefix"),
    )
    return agents.join(rules, ["domain", "__grp__"], "left").select(
        "domain",
        "agent",
        F.coalesce("rule_type", F.lit("disallow")).alias("rule_type"),
        F.coalesce("path_prefix", F.lit("")).alias("path_prefix"),
    )


def parse_crawl_delay(
    df: DataFrame,
    domain_col: str = "domain",
    content_col: str = "robots_txt",
) -> DataFrame:
    """Crawl-delay extraction — the de-facto politeness extension next
    to RFC 9309's allow/disallow (not in the RFC itself, but read by
    most crawlers): one (domain, agent, crawl_delay) row per agent
    carrying a delay, grouped with the SAME island machinery as
    :func:`parse_robots` (a delay belongs to every agent of its group;
    an agent spanning several groups gets the MAX of its delays — the
    politeness-conservative union, mirroring the rule-union of
    §2.2.1). Non-numeric delay values are dropped; matching stays
    case-insensitive. Tiny-side work only, same as parse_robots."""
    grouped = _robots_grouped(df, domain_col, content_col)
    delays = grouped.filter(F.col("__key__") == "crawl-delay").select(
        "domain",
        "__grp__",
        # try_cast, not cast: a malformed delay value must drop the
        # line, not fail the job under ANSI mode
        F.col("__val__").try_cast("double").alias("crawl_delay"),
    ).filter(F.col("crawl_delay").isNotNull())
    return (
        _group_agents(grouped)
        .join(delays, ["domain", "__grp__"])
        .groupBy("domain", "agent")
        .agg(F.max("crawl_delay").alias("crawl_delay"))
    )


def parse_sitemaps(
    df: DataFrame,
    domain_col: str = "domain",
    content_col: str = "robots_txt",
) -> DataFrame:
    """Sitemap extraction: distinct (domain, sitemap) rows from the
    ``Sitemap:`` lines anywhere in the file — per the sitemaps.org
    protocol the record is GLOBAL (not tied to any user-agent group),
    so no island machinery: split lines, strip comments, keep sitemap
    keys. The value is an absolute URL and keeps its case (URLs are
    case-sensitive past the host); only the directive name matches
    case-insensitively. Note the ':' in the URL's scheme — the value
    is everything after the FIRST ':', trimmed."""
    lines = df.select(
        F.col(domain_col).alias("domain"),
        F.explode(F.split(F.col(content_col), "\n")).alias("__raw__"),
    )
    clean = F.trim(F.regexp_replace(F.col("__raw__"), "#.*", ""))
    key = F.lower(F.trim(F.split(clean, ":", 2).getItem(0)))
    val = F.trim(F.get(F.split(clean, ":", 2), 1))
    return (
        lines.select("domain", key.alias("__key__"), val.alias("sitemap"))
        .filter((F.col("__key__") == "sitemap") & (F.col("sitemap") != ""))
        .select("domain", "sitemap")
        .distinct()
    )


def delay_for_agent(
    delays: DataFrame, agent: str, default_delay: float | None = None
) -> DataFrame:
    """Per-domain effective crawl delay for one crawler — the
    ``rules_for_agent`` twin over :func:`parse_crawl_delay` output:
    the agent's own rows where they exist, the '*' rows only for
    domains with no specific row (the same §2.2.1 shadow — an agent
    group WITHOUT a delay still shadows a '*' delay, which
    parse_crawl_delay encodes by simply having no row for that agent;
    callers treat a missing domain as ``default_delay``). Returns
    (domain, crawl_delay); with ``default_delay`` the rows are
    coalesced onto it (useful before a broadcast join where NULL
    means unknown-host)."""
    a = agent.lower()
    spec = delays.filter(F.col("agent") == a)
    dom = spec.select("domain").distinct()
    star = delays.filter(F.col("agent") == "*").join(
        F.broadcast(dom), "domain", "left_anti"
    )
    out = spec.unionByName(star).select("domain", "crawl_delay")
    if default_delay is not None:
        out = out.select(
            "domain",
            F.coalesce("crawl_delay", F.lit(default_delay)).alias(
                "crawl_delay"
            ),
        )
    return out


def rules_for_agent(rules: DataFrame, agent: str) -> DataFrame:
    """RFC 9309 §2.2.1 group selection: a crawler obeys the group(s)
    matching its OWN product token when the domain has any, and falls
    back to the '*' group only otherwise — the specific group SHADOWS
    '*' even when it is empty (= everything allowed; ``parse_robots``'s
    empty-group sentinel makes that case visible here). Input is
    ``parse_robots`` output; the result drops the agent column and is
    what ``apply_robots`` consumes. Matching is an exact
    case-insensitive token compare (substring product-token matching is
    out of scope, documented). Rules tables are curation artifacts —
    tiny — so the anti join broadcasts."""
    a = agent.lower()
    spec = rules.filter(F.col("agent") == a)
    dom = spec.select("domain").distinct()
    star = rules.filter(F.col("agent") == "*").join(
        F.broadcast(dom), "domain", "left_anti"
    )
    return spec.unionByName(star).select(
        "domain", "rule_type", "path_prefix"
    )


def robots_rule_pattern(p: Column) -> Column:
    """Compile one robots.txt path rule to the anchored regex RFC 9309
    §2.2.3 implies: '*' matches any octet sequence, a TRAILING '$'
    anchors end-of-path, every other regex metacharacter is literal
    (a non-trailing '$' is a literal dollar). Runs on the RULES side
    only (tiny, broadcast) — pages never pay a regex compile to build
    patterns, only to match them."""
    # escape regex metachars EXCEPT '*' (handled below); '$' is escaped
    # here and un-escaped again only in trailing position
    esc = F.regexp_replace(p, r"([.\\+?\[\](){}^|$])", r"\\$1")
    wild = F.replace(esc, F.lit("*"), F.lit(".*"))
    anchored = F.regexp_replace(wild, r"\\\$$", r"\$")
    # replacement '\$' emits a literal '$' (Java replaceAll treats a
    # bare '$' as a group ref), which in the PATTERN is the EOL anchor
    return F.concat(F.lit("^"), anchored)


ROBOTS_BROADCAST_DOMAIN_LIMIT = 1_000_000


def apply_robots(
    pages: DataFrame,
    rules: DataFrame,
    id_col: str = "doc_id",
    host_col: str = "hostname",
    path_col: str = "npath",
    broadcast_domain_limit: int | None = ROBOTS_BROADCAST_DOMAIN_LIMIT,
) -> DataFrame:
    """Longest-match robots evaluation (the Google/RFC 9309 rule): for
    each page, among the rules of its host that match the page path,
    the LONGEST rule (octet length of the raw rule, §2.2.2) decides; a
    length tie goes to allow; no matching rule (or no rules at all)
    means allowed. Empty-prefix rules match nothing per the spec.
    Rules with '*'/'$' metacharacters are evaluated as the RFC's
    wildcard patterns (compiled once on the tiny rules side by
    ``robots_rule_pattern``, ADVICE r7); literal rules keep the cheap
    ``startswith`` fast path. If the rules carry per-agent groups
    (``parse_robots`` output), select with :func:`rules_for_agent`
    first — this function expects the 3-column (domain, rule_type,
    path_prefix) shape.

    Scale shape (r8 rewrite, r9 size guard): the rules collapse to ONE
    row per domain holding an ARRAY of rule structs (the groupBy
    shuffles only the tiny rules side), and the whole evaluation —
    filter the array to matching rules, pick the winner — is
    higher-order-function expressions riding the scan. The CORPUS
    never shuffles at all in the broadcast route (the r7 version
    ranked matches with a doc-keyed window, i.e. one full-corpus
    shuffle per robots pass; ``id_col`` is kept for signature
    stability but the per-row form no longer needs a doc key). The
    winner is ``array_max`` over structs keyed (octet length,
    is_allow): longest rule wins, a length tie goes to allow — §2.2.2
    without a sort. Returns the pages with `allowed` + the deciding
    `matched_rule`/`matched_prefix` (NULL when nothing matched).

    Route selection (VERDICT r8 "wrong" #1): a targeted crawl's rule
    table is thousands of domains and the forced broadcast is the
    right plan — but the table is one row per distinct domain, and at
    CommonCrawl-scale politeness (tens of millions of hosts × rule
    arrays × compiled patterns) an UNGUARDED broadcast is a multi-GB
    driver/executor OOM with no fallback. So the aggregated rules
    side is counted ONCE (one job over the tiny side; ~1 KB/domain ⇒
    the default 1M-domain limit caps the broadcast near 1 GB, well
    under Spark's 8 GB hard ceiling); at or under
    ``broadcast_domain_limit`` the broadcast-hash route runs, above it
    the SAME per-row array evaluation runs after a plain shuffle
    equi-join on the domain — one corpus shuffle, no window, bounded
    memory. Both routes are output-identical (route-identity
    unit-tested). ``broadcast_domain_limit=None`` skips the count and
    forces the broadcast (the pre-r9 behavior, for callers that know
    their rules side); ``0`` forces the shuffle route.
    """
    del id_col  # per-row evaluation: no doc key needed since r8
    per_dom = (
        rules.filter(F.col("path_prefix") != "")
        .select(
            F.col("domain").alias("__rdom__"),
            F.struct(
                F.length("path_prefix").alias("plen"),
                (F.col("rule_type") == "allow").cast("int").alias(
                    "is_allow"
                ),
                F.col("rule_type").alias("rule_type"),
                F.col("path_prefix").alias("path_prefix"),
                (
                    F.col("path_prefix").contains("*")
                    | F.col("path_prefix").contains("$")
                ).alias("has_meta"),
                robots_rule_pattern(F.col("path_prefix")).alias("pattern"),
            ).alias("__rule__"),
        )
        .groupBy("__rdom__")
        .agg(F.collect_list("__rule__").alias("__rules__"))
    )
    if broadcast_domain_limit is None:
        per_dom = F.broadcast(per_dom)
    else:
        # one count on the aggregated (post-groupBy) side — the decision
        # input is exactly what would be broadcast. localCheckpoint so
        # the count and the join read one materialization instead of
        # re-aggregating the rules subplan twice.
        per_dom = per_dom.localCheckpoint(eager=True)
        if per_dom.count() <= broadcast_domain_limit:
            per_dom = F.broadcast(per_dom)
        else:
            # oversized: plain equi-join on domain (Catalyst picks the
            # shuffle strategy); hint AGAINST broadcast in case stats
            # lie — the guard exists precisely because the rules side
            # is too big to replicate
            per_dom = per_dom.hint("shuffle_hash")
    page_path = F.col(path_col)
    matched = F.filter(
        F.col("__rules__"),
        lambda r: F.when(
            r["has_meta"], F.rlike(page_path, r["pattern"])
        ).otherwise(page_path.startswith(r["path_prefix"])),
    )
    # struct comparison is field-order lexicographic: (plen, is_allow)
    # leads, so max = longest rule, allow on a length tie
    best = F.array_max(matched)
    return pages.join(
        per_dom, F.col(host_col) == F.col("__rdom__"), "left"
    ).select(
        *pages.columns,
        (best.isNull() | (best["rule_type"] == "allow")).alias("allowed"),
        best["rule_type"].alias("matched_rule"),
        best["path_prefix"].alias("matched_prefix"),
    )
