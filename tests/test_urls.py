"""URL/domain curation operators: canonicalization edge cases, public-
suffix longest-match, allow/block-list precedence, and the prepare-
pipeline domain stage (VERDICT r6 "next" #4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bag_parser_spark.operators import urls


def _canon(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(
        urls.canonicalize_url(F.col("url")).alias("c")
    ).head()["c"]


def test_canonicalize_edge_cases(spark):
    cases = {
        # default port stripped only when it matches the scheme
        "HTTPS://WWW.Ex.COM:443/a": "https://ex.com/a",
        "http://ex.com:80/a": "http://ex.com/a",
        "http://ex.com:443/a": "http://ex.com:443/a",
        "https://ex.com:8080/a": "https://ex.com:8080/a",
        # empty path normalizes to '/', fragment dropped
        "https://ex.com#frag": "https://ex.com/",
        "https://ex.com/a/b#frag": "https://ex.com/a/b",
        # tracking params stripped, survivor order preserved,
        # tracking-only query loses its '?'
        "https://ex.com/a?utm_source=x&id=1&gclid=z&b=2":
            "https://ex.com/a?id=1&b=2",
        "https://ex.com/a?utm_medium=email": "https://ex.com/a",
        # 'www.' stripped, deeper subdomains kept
        "https://www.blog.ex.com/": "https://blog.ex.com/",
        # value-less and '='-bearing params keep their shape
        "https://ex.com/a?flag&ref=home&x=a=b":
            "https://ex.com/a?flag&x=a=b",
    }
    for raw, want in cases.items():
        assert _canon(spark, raw) == want, raw


def test_registered_domain_longest_match(spark):
    rows = [
        ("a.b.co.uk", "b.co.uk"),     # multi-label beats 'uk'
        ("x.com", "x.com"),
        ("deep.sub.x.com", "x.com"),
        ("user.github.io", "user.github.io"),
        ("b.user.github.io", "user.github.io"),
        ("intranet.local", "intranet.local"),  # no suffix: whole host
        ("com", "com"),               # bare suffix: no label before it
    ]
    df = spark.createDataFrame([(h,) for h, _ in rows], "hostname string")
    got = {
        r["hostname"]: r["registered_domain"]
        for r in urls.with_registered_domain(df, "hostname", spark).collect()
    }
    for host, want in rows:
        assert got[host] == want, host


def test_blocklist_allowlist_precedence(spark):
    docs = spark.createDataFrame(
        [(1, "a.com"), (2, "b.com"), (3, "c.com")],
        "doc_id long, registered_domain string",
    )
    blocked = spark.createDataFrame([("a.com",), ("b.com",)], "d string")
    allowed = spark.createDataFrame([("b.com",)], "d string")
    kept = sorted(
        r["doc_id"]
        for r in urls.apply_domain_blocklist(
            docs, "registered_domain", blocked, allowed=allowed
        ).collect()
    )
    assert kept == [2, 3]  # a blocked, b allow-overridden, c untouched


def test_prepare_corpus_domain_stage(spark, tmp_path):
    """The domain stage runs before scoring: blocklisted domains vanish,
    the per-domain cap holds, and registered_domain lands in the
    artifact."""
    from bag_parser_spark.plans.corpus_prep import prepare_corpus

    text = " ".join(f"w{i}" for i in range(40))
    rows = [
        (i, f"{text} u{i}", f"https://www.Site{i % 3}.com/p/{i}")
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    out = str(tmp_path / "corpus")
    summary = prepare_corpus(
        spark,
        docs,
        out,
        min_quality=0.0,
        lang=None,
        near_dedup=False,
        url_col="url",
        max_per_domain=4,
        domain_blocklist=spark.createDataFrame([("site0.com",)], "d string"),
    )
    got = spark.read.parquet(out)
    by_domain = {
        r["registered_domain"]: r["n"]
        for r in got.groupBy("registered_domain")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert "site0.com" not in by_domain
    assert set(by_domain) == {"site1.com", "site2.com"}
    assert all(n <= 4 for n in by_domain.values())
    assert summary["max_per_domain"] == 4 and summary["domain_blocklist"]


def test_prepare_corpus_domain_args_require_url_col(spark, tmp_path):
    import pytest

    from bag_parser_spark.plans.corpus_prep import prepare_corpus

    docs = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    with pytest.raises(ValueError, match="url_col"):
        prepare_corpus(
            spark, docs, str(tmp_path / "x"), max_per_domain=3
        )
    rules = spark.createDataFrame(
        [("a.com", "*", "disallow", "/")],
        "domain string, agent string, rule_type string, "
        "path_prefix string",
    )
    with pytest.raises(ValueError, match="url_col"):
        prepare_corpus(
            spark, docs, str(tmp_path / "y"), robots_rules=rules
        )


def test_prepare_corpus_robots_gate(spark, tmp_path):
    """The RFC 9309 politeness gate inside prepare_corpus: rules are
    parse_robots-shaped rows, the crawler's specific group SHADOWS '*',
    longest-match decides within the selected group, and disallowed
    pages never consume the per-domain cap (the gate runs BEFORE the
    cap). Hosts carry the canonical form (www./port already stripped by
    the stage's own derivation)."""
    from bag_parser_spark.plans.corpus_prep import prepare_corpus

    text = " ".join(f"w{i}" for i in range(40))
    rows = [
        # open.com: 4 pages, 2 under /private/ (star-disallowed); the
        # 2 surviving public pages fit the cap of 2 EXACTLY — if the
        # gate ran after the cap a private page could burn a slot
        (1, f"{text} u1", "https://www.Open.COM/public/1"),
        (2, f"{text} u2", "https://open.com/public/2"),
        (3, f"{text} u3", "https://open.com/private/1"),
        (4, f"{text} u4", "https://open.com/private/2"),
        # shadow.org: '*' disallows everything but the specific agent's
        # group allows it — both pages survive for that agent
        (5, f"{text} u5", "https://shadow.org/a"),
        (6, f"{text} u6", "https://shadow.org/b"),
        # norules.net: no robots entry at all -> allowed
        (7, f"{text} u7", "https://norules.net/x"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    rules = spark.createDataFrame(
        [
            ("open.com", "*", "disallow", "/private/"),
            ("shadow.org", "*", "disallow", "/"),
            ("shadow.org", "corpusbot", "allow", "/"),
        ],
        "domain string, agent string, rule_type string, "
        "path_prefix string",
    )
    out = str(tmp_path / "corpus")
    summary = prepare_corpus(
        spark,
        docs,
        out,
        min_quality=0.0,
        lang=None,
        near_dedup=False,
        url_col="url",
        max_per_domain=2,
        robots_rules=rules,
        robots_agent="CorpusBot",
        stage_report=True,
    )
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {1, 2, 5, 6, 7}
    assert summary["stages"]["input"] == 7
    assert summary["stages"]["robots_allowed"] == 5
    assert summary["stages"]["domain_capped"] == 5
    assert summary["robots"] and summary["robots_agent"] == "CorpusBot"


def test_extract_links_resolution_branches(spark):
    """Every resolve_link branch on one handcrafted page: absolute
    pass-through, protocol-relative inherits the scheme, root-relative
    joins scheme://host, path-relative joins the base DIRECTORY,
    fragment/javascript:/mailto:/empty drop; link_no keeps original
    in-page positions (gaps where pseudo-links dropped); `keep` columns
    pass through."""
    from bag_parser_spark.operators import urls as U

    html = (
        '<a href="HTTP://Ext.COM/x">1</a>'
        '<a href="//cdn.example.org/l.js">2</a>'
        '<a href="/about">3</a>'
        '<a href="img/logo.png">4</a>'
        '<a href="#top">5</a>'
        '<a href="javascript:void(0)">6</a>'
        '<a href="mailto:a@b.c">7</a>'
        '<a href="">8</a>'
        '<a href="page.html#sec">9</a>'
        '<a href="/faq#q2">10</a>'
    )
    df = spark.createDataFrame(
        [(1, html, "https", "site.io:8080", "/docs/page.html")],
        "doc_id long, html string, scheme string, host string, npath string",
    )
    out = U.extract_links(
        df, id_col="doc_id", html_col="html", scheme_col="scheme",
        host_col="host", path_col="npath", keep=("host",),
    ).collect()
    got = {r["link_no"]: r["link_url"] for r in out}
    assert got == {
        0: "HTTP://Ext.COM/x",
        1: "https://cdn.example.org/l.js",
        2: "https://site.io:8080/about",
        3: "https://site.io:8080/docs/img/logo.png",
        # embedded fragments are STRIPPED before resolution (ADVICE r7):
        # frontier output never contains fragment-distinct URLs
        8: "https://site.io:8080/docs/page.html",
        9: "https://site.io:8080/faq",
    }
    assert all(r["host"] == "site.io:8080" for r in out)


def test_parse_and_apply_robots(spark):
    """parse_robots emits per-(agent, rule) rows with RFC 9309 group
    semantics (multi-agent islands share rules; comments stripped;
    pre-group rules ignored; empty groups leave a sentinel);
    rules_for_agent shadows '*' with the specific group; apply_robots
    evaluates longest-match with allow winning ties and default-allow
    on no match / empty prefix."""
    from pyspark.sql import functions as F

    from bag_parser_spark.operators import urls as U

    robots = "\n".join([
        "# corpus crawler policy",
        "Disallow: /pre-group",   # before any User-agent: ignored
        "User-agent: googlebot",
        "User-agent: CorpusBot",  # multi-agent island: rules shared
        "Disallow: /private",
        "",
        "User-agent: *",
        "Disallow: /p/   # trailing comment",
        "Allow: /p/1",
        "Disallow:",            # empty prefix: matches nothing
        "Allow: /tie",
        "Disallow: /tie",
        "User-agent: googlebot",  # SECOND googlebot group: rules union
        "Allow: /public",
    ])
    rules_in = spark.createDataFrame(
        [("a.com", robots)], "domain string, robots_txt string"
    )
    rules = U.parse_robots(rules_in)
    got = sorted(map(tuple, rules.collect()))
    assert got == [
        ("a.com", "*", "allow", "/p/1"),
        ("a.com", "*", "allow", "/tie"),
        ("a.com", "*", "disallow", ""),
        ("a.com", "*", "disallow", "/p/"),
        ("a.com", "*", "disallow", "/tie"),
        ("a.com", "corpusbot", "disallow", "/private"),
        ("a.com", "googlebot", "allow", "/public"),
        ("a.com", "googlebot", "disallow", "/private"),
    ]
    pages = spark.createDataFrame(
        [
            (1, "a.com", "/p/5"),     # '/p/' disallow
            (2, "a.com", "/p/12"),    # '/p/1' allow beats '/p/'
            (3, "a.com", "/tie"),     # equal length -> allow wins
            (4, "a.com", "/other"),   # no match -> allowed
            (5, "b.com", "/p/5"),     # no rules for host -> allowed
        ],
        "doc_id long, hostname string, npath string",
    )
    out = {
        r["doc_id"]: (r["allowed"], r["matched_prefix"])
        for r in U.apply_robots(
            pages, U.rules_for_agent(rules, "*")
        ).collect()
    }
    assert out == {
        1: (False, "/p/"),
        2: (True, "/p/1"),
        3: (True, "/tie"),
        4: (True, None),
        5: (True, None),
    }
    # specific group SHADOWS '*': corpusbot only sees /private
    spec = {
        r["doc_id"]: r["allowed"]
        for r in U.apply_robots(
            pages, U.rules_for_agent(rules, "CorpusBot")
        ).collect()
    }
    assert spec == {1: True, 2: True, 3: True, 4: True, 5: True}


def test_robots_empty_group_shadows_star(spark):
    """RFC 9309 §2.2.1: an EMPTY specific group still shadows '*' — the
    sentinel row parse_robots leaves for rule-less groups makes the
    domain visible to rules_for_agent, and the empty prefix never
    matches a page (allow-everything). Note the group ORDER: per the
    RFC's ABNF a blank line does NOT close a group, so ua-lines
    separated only by blanks merge — an empty group exists only after
    another group's rules (or at EOF), which is how it's built here."""
    from bag_parser_spark.operators import urls as U

    robots = "\n".join([
        "User-agent: *",
        "Disallow: /",
        "User-agent: corpusbot",   # trailing empty group: allow all
    ])
    rules = U.parse_robots(
        spark.createDataFrame(
            [("a.com", robots)], "domain string, robots_txt string"
        )
    )
    pages = spark.createDataFrame(
        [(1, "a.com", "/p/5")], "doc_id long, hostname string, npath string"
    )
    star = U.apply_robots(pages, U.rules_for_agent(rules, "*")).collect()
    assert star[0]["allowed"] is False
    bot = U.apply_robots(
        pages, U.rules_for_agent(rules, "corpusbot")
    ).collect()
    assert bot[0]["allowed"] is True


def test_robots_wildcard_and_anchor_rules(spark):
    """RFC 9309 §2.2.3 metacharacters (ADVICE r7): '*' matches any
    sequence, a trailing '$' anchors end-of-path, a non-trailing '$'
    and every regex metachar are literal; precedence is raw-rule octet
    length. Literal rules keep the startswith fast path."""
    from bag_parser_spark.operators import urls as U

    rules = spark.createDataFrame(
        [
            ("a.com", "disallow", "/*.php"),
            ("a.com", "allow", "/shop/*.php"),   # longer -> wins under /shop
            ("a.com", "disallow", "/exact$"),
            ("a.com", "disallow", "/lit$eral"),  # non-trailing $: literal
            ("b.com", "disallow", "/p"),         # literal fast path intact
        ],
        "domain string, rule_type string, path_prefix string",
    )
    pages = spark.createDataFrame(
        [
            (1, "a.com", "/index.php"),      # /*.php disallow
            (2, "a.com", "/shop/x.php"),     # /shop/*.php allow wins (longer)
            (3, "a.com", "/exact"),          # anchored disallow
            (4, "a.com", "/exactly"),        # anchor does NOT match
            (5, "a.com", "/lit$eral/x"),     # literal-$ rule matches
            (6, "a.com", "/index.html"),     # nothing matches
            (7, "b.com", "/p/1"),            # literal prefix
        ],
        "doc_id long, hostname string, npath string",
    )
    out = {
        r["doc_id"]: (r["allowed"], r["matched_prefix"])
        for r in U.apply_robots(pages, rules).collect()
    }
    assert out == {
        1: (False, "/*.php"),
        2: (True, "/shop/*.php"),
        3: (False, "/exact$"),
        4: (True, None),
        5: (False, "/lit$eral"),
        6: (True, None),
        7: (False, "/p"),
    }


def _robots_route_fixture(spark):
    """(pages, rules) reused by the route-guard tests: the wildcard/
    anchor fixture above, which exercises every matching branch."""
    rules = spark.createDataFrame(
        [
            ("a.com", "disallow", "/*.php"),
            ("a.com", "allow", "/shop/*.php"),
            ("a.com", "disallow", "/exact$"),
            ("b.com", "disallow", "/p"),
            ("c.com", "allow", "/pub"),
            ("c.com", "disallow", "/"),
        ],
        "domain string, rule_type string, path_prefix string",
    )
    pages = spark.createDataFrame(
        [
            (1, "a.com", "/index.php"),
            (2, "a.com", "/shop/x.php"),
            (3, "a.com", "/exact"),
            (4, "b.com", "/p/1"),
            (5, "c.com", "/pub/x"),
            (6, "c.com", "/secret"),
            (7, "d.com", "/anything"),
        ],
        "doc_id long, hostname string, npath string",
    )
    return pages, rules


def test_apply_robots_route_identity(spark):
    """VERDICT r8 #1: the broadcast and shuffle routes of apply_robots
    are OUTPUT-IDENTICAL — broadcast_domain_limit only picks the join
    strategy, never the semantics. None forces broadcast (pre-r9
    behavior), 0 forces the shuffle fallback, and the default threshold
    (far above this fixture's 4 domains) takes the broadcast route."""
    from bag_parser_spark.operators import urls as U

    pages, rules = _robots_route_fixture(spark)
    runs = [
        U.apply_robots(pages, rules, broadcast_domain_limit=lim)
        for lim in (None, 0, U.ROBOTS_BROADCAST_DOMAIN_LIMIT)
    ]
    got = [sorted(map(tuple, df.collect())) for df in runs]
    assert got[0] == got[1] == got[2]
    # and the fixture actually decides something on both sides
    allowed = {r[0]: r[3] for r in got[0]}
    assert allowed == {
        1: False, 2: True, 3: False, 4: False, 5: True, 6: False, 7: True,
    }


def test_apply_robots_threshold_crossing_picks_route(spark):
    """The size guard routes by the aggregated rules-side domain count:
    at or under broadcast_domain_limit the STATIC physical plan
    broadcasts the rule table (corpus never shuffles); above it the
    static plan joins without a forced broadcast — bounded memory at
    CommonCrawl-scale politeness tables. Asserted on sparkPlan() (pre-
    AQE): at runtime AQE may legitimately convert the fallback back to
    a broadcast when the ACTUAL bytes turn out tiny (as on this
    fixture) — that conversion is runtime-stat-driven and bounded by
    spark.sql.adaptive.autoBroadcastJoinThreshold, which is exactly
    the guarded behavior the static force lacked. Same fixture,
    thresholds straddling its 3 rule-side domains (a/b/c — d.com
    appears only on the pages side)."""
    from bag_parser_spark.operators import urls as U

    pages, rules = _robots_route_fixture(spark)

    def plan_of(limit):
        df = U.apply_robots(pages, rules, broadcast_domain_limit=limit)
        return df._jdf.queryExecution().sparkPlan().toString()

    over = plan_of(3)   # 3 domains <= 3: broadcast route
    under = plan_of(2)  # 3 domains > 2: shuffle fallback
    assert "BroadcastHashJoin" in over
    assert "BroadcastHashJoin" not in under
    assert "ShuffledHashJoin" in under


def test_parse_crawl_delay_and_sitemaps(spark):
    """VERDICT r8 #5: Crawl-delay joins the group machinery (a delay
    belongs to every agent of its island; an agent in several groups
    takes the MAX — politeness-conservative; non-numeric values drop;
    a ua-line AFTER a delay starts a NEW group per the ABNF), and
    Sitemap lines parse globally, outside any group, case-insensitive
    key with the URL value intact past its scheme ':'."""
    from bag_parser_spark.operators import urls as U

    robots = "\n".join([
        "Sitemap: https://a.com/Sitemap-Main.xml",
        "User-agent: googlebot",
        "User-agent: CorpusBot",   # island: delay shared by both
        "Crawl-delay: 2.5",
        "Disallow: /private",
        "",
        "User-agent: corpusbot",   # NEW group (previous line is a rule)
        "Crawl-delay: 10",         # same agent again: max(2.5, 10) = 10
        "User-agent: slowbot",     # new island AFTER the delay rule
        "Crawl-delay: bogus",      # non-numeric: dropped
        "sitemap: https://a.com/news.xml  # comment",
        "User-agent: *",
        "Crawl-delay: 1",
    ])
    src = spark.createDataFrame(
        [("a.com", robots)], "domain string, robots_txt string"
    )
    delays = sorted(map(tuple, U.parse_crawl_delay(src).collect()))
    assert delays == [
        ("a.com", "*", 1.0),
        ("a.com", "corpusbot", 10.0),
        ("a.com", "googlebot", 2.5),
    ]
    maps = sorted(r["sitemap"] for r in U.parse_sitemaps(src).collect())
    assert maps == [
        "https://a.com/Sitemap-Main.xml", "https://a.com/news.xml",
    ]


def test_delay_for_agent_and_budget(spark):
    """delay_for_agent mirrors rules_for_agent's shadow: the agent's own
    rows win, '*' fills only domains without one, default_delay
    coalesces; politeness_budget = max(1, floor(window/delay))."""
    from pyspark.sql import functions as F

    from bag_parser_spark.operators import urls as U

    delays = spark.createDataFrame(
        [
            ("a.com", "*", 1.0),
            ("a.com", "corpusbot", 10.0),   # shadows the '*' 1.0
            ("b.com", "*", 4.0),
            ("c.com", "googlebot", 7.0),    # other agent only: no row
        ],
        "domain string, agent string, crawl_delay double",
    )
    eff = {
        r["domain"]: r["crawl_delay"]
        for r in U.delay_for_agent(delays, "CorpusBot").collect()
    }
    assert eff == {"a.com": 10.0, "b.com": 4.0}
    budgets = (
        U.delay_for_agent(delays, "corpusbot")
        .select(
            "domain",
            U.politeness_budget(F.col("crawl_delay"), 20.0).alias("b"),
        )
        .collect()
    )
    assert {r["domain"]: r["b"] for r in budgets} == {
        "a.com": 2, "b.com": 5,
    }
    # a delay longer than the window still yields one fetch
    slow = spark.createDataFrame(
        [("s.com", "*", 60.0)], "domain string, agent string, crawl_delay double"
    )
    one = U.delay_for_agent(slow, "x", default_delay=3.0).select(
        U.politeness_budget(F.col("crawl_delay"), 20.0).alias("b")
    ).collect()
    assert one[0]["b"] == 1


def test_frontier_budget_window_is_group_limited(spark):
    """The frontier's per-host budget window carries a CONSTANT rank
    ceiling next to the per-row budget predicate, so Catalyst plans a
    map-side WindowGroupLimit — a mega-host's candidates are pruned to
    the ceiling per map partition before the window shuffle ships them
    (the same viral-key posture as url_domain_cap)."""
    from bag_parser_spark.plans.catalog import registry

    df = registry()["web_crawl_frontier"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_budget_ceiling_derivation_and_route_identity(spark):
    """ADVICE r9 / VERDICT r9 #5: the frontier's WindowGroupLimit
    ceiling is DERIVED from the politeness floor (budget_ceiling =
    max(1, floor(window / min_delay))), not a fixture literal — so a
    different delay distribution keeps the two-conjunct filter (rank <=
    ceiling AND rank <= host_budget) byte-identical to the budget-only
    filter. Exercised at a distribution the fixture never uses: window
    6 s, delays {0.9, 3.0} -> budgets {6, 2}, ceiling 6."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from bag_parser_spark.operators import urls as U

    assert U.budget_ceiling(20.0, 2.0) == 10  # the fixture's value
    assert U.budget_ceiling(6.0, 0.9) == 6
    assert U.budget_ceiling(20.0, 60.0) == 1  # slower-than-window floor
    assert U.budget_ceiling(60.0, 0.5) == 120
    # ADVICE r10: divide-then-floor, not Python '//' (1.0 // 0.1 == 9.0
    # but IEEE floor(1.0 / 0.1) == 10 — what politeness_budget computes)
    assert U.budget_ceiling(1.0, 0.1) == 10
    assert U.budget_ceiling(2.0, 0.2) == 10
    import pytest as _pytest

    with _pytest.raises(ValueError):
        U.budget_ceiling(20.0, 0.0)

    cand = spark.createDataFrame(
        [(h, f"u{i:02d}", 10 - i) for h in ("fast.com", "slow.com")
         for i in range(8)],
        "dst_host string, url_c string, n_refs long",
    )
    delays = spark.createDataFrame(
        [("fast.com", 0.9), ("slow.com", 3.0)],
        "dst_host string, crawl_delay double",
    ).withColumn("host_budget", U.politeness_budget(F.col("crawl_delay"), 6.0))
    w = Window.partitionBy("dst_host").orderBy(
        F.col("n_refs").desc(), F.col("url_c").asc()
    )
    ranked = cand.join(F.broadcast(delays), "dst_host").withColumn(
        "rk", F.row_number().over(w)
    )
    ceiling = U.budget_ceiling(6.0, 0.9)
    two = ranked.filter(
        (F.col("rk") <= F.lit(ceiling)) & (F.col("rk") <= F.col("host_budget"))
    )
    one = ranked.filter(F.col("rk") <= F.col("host_budget"))
    rows_two = sorted(map(tuple, two.collect()))
    assert rows_two == sorted(map(tuple, one.collect()))
    # budgets actually bit: 6 of 8 on the fast host, 2 of 8 on the slow
    assert len(rows_two) == 8
    plan = two._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_budget_ceiling_dominates_spark_budget_at_the_floor(spark):
    """ADVICE r10 regression: for a host whose crawl delay EQUALS the
    politeness floor, the driver-side ceiling must be >= the Spark-side
    politeness_budget for the same (window, delay) — otherwise the
    WindowGroupLimit conjunct silently drops the host's top-budget row.
    Python ``//`` breaks this at sub-second decimal floors (1.0 // 0.1
    == 9.0); divide-then-floor matches Spark's expression exactly.
    Sweep the decimal floors whose binary representation under-shoots."""
    import pyspark.sql.functions as F

    from bag_parser_spark.operators import urls as U

    cases = [(1.0, d) for d in (0.1, 0.2, 0.3, 0.4, 0.6, 0.7)] + [
        (6.0, 0.6), (3.0, 0.3), (10.0, 0.1)
    ]
    for w, d in cases:
        spark_budget = (
            spark.createDataFrame([(d,)], "crawl_delay double")
            .select(
                U.politeness_budget(F.col("crawl_delay"), w).alias("b")
            )
            .collect()[0]["b"]
        )
        assert U.budget_ceiling(w, d) >= spark_budget, (w, d, spark_budget)
