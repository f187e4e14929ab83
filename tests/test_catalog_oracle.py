"""Every catalog query with an oracle must match DuckDB exactly at sf0.01 —
the same gate the driver runs (row count + schema + order-insensitive
values)."""

from __future__ import annotations

import pytest

from bag_parser_spark.plans.catalog import registry
from tests.oracle_harness import compare

_REG = registry()
_WITH_ORACLE = sorted(n for n, qd in _REG.items() if qd.sql)
_ROWS_ONLY = sorted(n for n, qd in _REG.items() if not qd.sql)

# The 8 sweep members measured > 30 s each at sf0.01/local[8] (r12
# durations run: dedup_verified_pairs 136 s ... dedup_incremental 33 s —
# the DuckDB side of the unrolled minhash/CC oracles dominates). They
# run only under SPARK_GRAFT_FULL_TESTS=1 (see conftest) so the default
# suite fits the verification driver's capture window (VERDICT r11 #1);
# all 8 sit inside the driver's own 50-query oracle window this round
# (_DRIVER_PRIORITY), so they stay driver-verified every round.
_SLOW_ORACLE = {
    "dedup_verified_pairs", "dedup_clusters", "split_leakage_safe",
    "dedup_canonical", "dedup_lsh_recall", "dedup_minhash_lsh",
    "ml_pagerank_converged", "dedup_incremental",
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_ORACLE else n
        for n in _WITH_ORACLE
    ],
)
def test_oracle_match(spark, name):
    qd = _REG[name]
    ok, msg = compare(spark, name, qd.fn, qd.sql)
    assert ok, msg


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, name):
    qd = _REG[name]
    df = qd.fn(spark, "/root/testdata/sf0.01")
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_driver_priority_ordering_contract():
    """The correctness driver samples queries() in dict order with a
    bounded budget (exactly the first 50 keys every round so far), so the
    emit order is load-bearing: every _DRIVER_PRIORITY name must resolve,
    nothing may be dropped or duplicated — and the 50-slot window must be
    spent on EVIDENCE, not re-verification: every query that has never had
    a driver CORRECTNESS row (across all recorded rounds) must sit inside
    the window. Once the cross-round union is complete, the window must
    instead span every operator family (round-robin) so re-verification
    keeps covering the whole surface under the cap."""
    import glob as _glob
    import json
    import os

    from bag_parser_spark.plans import catalog

    q = catalog.queries()
    names = list(q)
    assert sorted(names) == sorted(_REG)  # nothing dropped, no dupes
    missing = [n for n in catalog._DRIVER_PRIORITY if n not in _REG]
    assert not missing, f"_DRIVER_PRIORITY names not in registry: {missing}"
    assert len(set(catalog._DRIVER_PRIORITY)) == len(catalog._DRIVER_PRIORITY)
    first50 = names[:50]

    root = os.path.join(os.path.dirname(__file__), "..")
    seen: set[str] = set()
    last_verdict: dict[str, bool] = {}  # name -> ok?, at its LATEST round
    for p in sorted(_glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        with open(p) as f:
            rows = json.load(f)
        seen |= set(rows)
        for n, r in rows.items():
            last_verdict[n] = (
                r.get("err") is None
                and r.get("rows_match") is True
                and r.get("schema_match") is True
                and r.get("hash_match") is True
            )
    window = set(names[:50])
    # 1. a query whose LATEST driver verdict is a FAIL must lead the
    #    window until a green row erases it (VERDICT r5: the r4 contract
    #    only protected never-validated names, letting the two pre-oracle
    #    mm_* FAIL rows go stale for three rounds)
    stale_fail = [
        n for n, ok in last_verdict.items() if not ok and n in _REG
    ]
    parked_fails = [n for n in stale_fail if n not in window]
    assert not parked_fails, (
        f"queries whose latest driver verdict is FAIL sit outside the "
        f"50-slot window: {parked_fails} — rotate _DRIVER_PRIORITY"
    )
    # 2. a query rewritten since its last green row (hand-maintained
    #    list) must also re-verify inside the window
    unknown = [n for n in catalog._REWRITTEN_SINCE_DRIVER_ROW if n not in _REG]
    assert not unknown, f"_REWRITTEN_SINCE_DRIVER_ROW unknown names: {unknown}"
    parked_rw = [
        n for n in catalog._REWRITTEN_SINCE_DRIVER_ROW if n not in window
    ]
    assert not parked_rw, (
        f"rewritten-since-last-driver-row queries outside the window: "
        f"{parked_rw} — rotate _DRIVER_PRIORITY"
    )
    never = [n for n in names if n not in seen]
    if never:
        # Never-validated queries must be PACKED at the front: within the
        # ~50-slot driver window plus the unavoidable overflow when more
        # exist than fit, with a 10-slot grace for queries added after
        # the round's rotation (the driver may also run mid-round, so a
        # hard window-edge assertion would go red between the driver
        # writing CORRECTNESS_r{N} and the next rotation).
        allowed = max(50, len(never)) + 10
        pos = {n: i for i, n in enumerate(names)}
        stragglers = [n for n in never if pos[n] >= allowed]
        assert not stragglers, (
            f"never-driver-validated queries parked beyond position "
            f"{allowed}: {stragglers} — rotate _DRIVER_PRIORITY"
        )
        return
    families = {
        "tpch": lambda n: n.startswith("tpch_"),
        "timeseries": lambda n: n.startswith("ts_"),
        "events": lambda n: n.startswith("events_"),
        "similarity": lambda n: n.startswith("sim_") or n == "dedup_embedding_cosine",
        "multimodal": lambda n: n.startswith("mm_"),
        "text": lambda n: n.startswith("text_"),
        "agg_ext": lambda n: n[0] == "a" and n[1:3].rstrip("_").isdigit(),
        "scalar_packs": lambda n: n.startswith("f1"),
        "join_ext": lambda n: n.startswith("j1"),
        "corpus": lambda n: n in ("vocab_build", "tfidf_vectors",
                                  "lm_doc_score", "chunk_documents",
                                  "dedup_canonical"),
    }
    uncovered = [fam for fam, pred in families.items()
                 if not any(pred(n) for n in first50)]
    assert not uncovered, f"families missing from driver window: {uncovered}"


def test_bench_stdout_line_fits_driver_window():
    """The driver archives only the last ~2000 chars of bench stdout and
    parses the final line as JSON; r3–r5 BENCH records came back
    "parsed": null because the line outgrew that window (VERDICT r5 #2).
    Pin the line — with worst-plausible 4-digit timings and a full
    import object — comfortably under the window for the CURRENT
    headline set, so adding queries that would overflow it fails here
    instead of silently truncating the archived record."""
    import importlib.util
    import os

    root = os.path.join(os.path.dirname(__file__), "..")
    spec = importlib.util.spec_from_file_location(
        "bench_", os.path.join(root, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    # Worst-plausible bound: 3-digit seconds per query (observed sf0.1
    # max is ~15 s — 60x headroom; the r6 4-digit bound predates the
    # [min, median] pair format, which trades that slack for medians)
    # and BOTH import sizes present.
    timings = {n: (999.999, 999.999) for n in bench.HEADLINE}
    worst_import = {
        "n_addresses": 99_999_999,
        "value": 99999.999,
        "value_median": 99999.999,
        "addresses_per_sec": 999_999,
    }
    line = bench.format_stdout_line(
        timings,
        sf="0.1",
        reps=3,
        import_metrics=[worst_import, worst_import],
        load=(99.99, 99.99),
        mrr=99.99,
    )
    assert "\n" not in line
    assert len(line) < 1800, (
        f"bench stdout line is {len(line)} chars — would overflow the "
        "driver's ~2000-char tail; trim the headline set or the format"
    )
    # the pinned core must stay a subset of the clocked headline set and
    # keep its 25 members — core_total is only round-comparable while
    # the membership is frozen (VERDICT r8 #7)
    assert set(bench.CORE) <= set(bench.HEADLINE)
    assert len(bench.CORE) == 25
    import json as _json

    parsed = _json.loads(line)
    # contamination sentinels + core-hole visibility (VERDICT r9 #1,
    # ADVICE r9): a dirty run or a dropped core member must be visible
    # in the archived record itself
    assert {
        "core_total", "core_med", "load", "max_rep_ratio"
    } <= parsed.keys()
    assert "core_missing" not in parsed  # omitted while core is whole
    assert parsed["load"] == [99.99, 99.99]
    # a dropped core member is NAMED, not silently absorbed
    short = dict(timings)
    dropped = bench.CORE[0]
    del short[dropped]
    parsed2 = _json.loads(
        bench.format_stdout_line(short, "0.1", 3, None)
    )
    assert parsed2["core_missing"] == [dropped]
    # max_rep_ratio flags the r9-style mid-run contamination pattern
    assert bench.max_rep_ratio({"q": [2.0, 2.2, 14.0]}) == 7.0
    assert bench.max_rep_ratio({}) is None


def test_rotation_audit_reads_archives():
    """VERDICT r9 #8: the stale-cohort analysis is automated.
    rotation_audit must parse the in-repo CORRECTNESS archives, count a
    row as green only when rows+schema match and hash matches (or the
    round recorded a rows-only check), and surface never-validated
    names first. Pinned against the known r9 facts FROZEN with an
    explicit round cutoff (max_round=9): the archive set GROWS every
    round — the driver lands CORRECTNESS_r{N}.json after the builder's
    last commit — so an uncut equality here breaks the moment the next
    archive arrives (VERDICT r10 "what's wrong" #1: the r10 row made
    cohort_retention's uncut latest jump 5 -> 10 mid-round). Facts about
    a PAST round go through the cutoff; the live view only gets
    monotone >= assertions."""
    import os
    import sys as _sys

    _sys.path.insert(
        0,
        os.path.join(os.path.dirname(__file__), "..", "scripts"),
    )
    import rotation_audit as RA

    # frozen as-of-r9 facts — stable forever because r10+ archives are
    # excluded by the cutoff, not because the archive set stops growing
    frozen = RA.latest_green_rounds(max_round=9)
    assert frozen["warc_records"] == 9
    assert frozen["cohort_retention"] == 5
    # the live (uncut) view can only move forward
    live = RA.latest_green_rounds()
    for name, rnd in frozen.items():
        assert live.get(name, 0) >= rnd, name
    # "what was stale entering round 10" auto-cuts at round 9, so round
    # 10's own rows never answer it — the r5 cohort stays visible
    current, rows = RA.stale_cohort(stale_after=5, current_round=10)
    assert current == 10
    names = {n for n, _ in rows}
    r5_cohort = {
        "cohort_retention", "dq_star_schema", "events_hopping_agg",
        "events_session_window", "events_sliding_distinct",
        "events_stream_enrich", "orders_monthly_yoy",
        "tpch_q4_order_priority", "tpch_q5_local_supplier_volume",
        "tpch_q6_forecast_revenue", "tpch_q10_returned_items",
        "tpch_q14_promo_effect", "tpch_q18_large_volume",
    }
    assert r5_cohort <= names
    # a FAIL row is never evidence
    assert not RA._row_green({"err": "boom", "rows_match": True,
                              "schema_match": True, "hash_match": True})
    assert not RA._row_green({"err": None, "rows_match": True,
                              "schema_match": True, "hash_match": False})
    # rows-only rounds (hash_match null) still count
    assert RA._row_green({"err": None, "rows_match": True,
                          "schema_match": True, "hash_match": None})


def test_rotation_debt_visible_every_run():
    """VERDICT r10 #7: rotation debt must be VISIBLE on every test run
    without adding a hard failure mode. Emits the live stale cohort as
    a pytest warning (shown in the warnings summary of every run); the
    gate for window packing remains the ordering-contract test above.
    Always passes — this is a report, not an assertion about debt."""
    import os
    import sys as _sys
    import warnings

    _sys.path.insert(
        0,
        os.path.join(os.path.dirname(__file__), "..", "scripts"),
    )
    import rotation_audit as RA

    current, rows = RA.stale_cohort(stale_after=4)
    if rows:
        head = ", ".join(
            f"{n} ({'NEVER' if r is None else f'r{r}'})" for n, r in rows[:8]
        )
        more = f" … +{len(rows) - 8} more" if len(rows) > 8 else ""
        warnings.warn(
            f"rotation debt entering round {current}: {len(rows)} queries "
            f"never-validated or >=4 rounds stale — {head}{more} "
            f"(run scripts/rotation_audit.py; pack _DRIVER_PRIORITY)",
            stacklevel=1,
        )
    # the audit's own invariants hold on the live view
    assert all(r is None or 0 < r < current for _, r in rows)


def test_bench_details_path_honors_env_redirect(monkeypatch, tmp_path):
    """VERDICT r10 watch (b): an ad-hoc bench run must not clobber the
    committed BENCH_DETAILS.json round record — $SPARK_GRAFT_BENCH_DETAILS
    redirects the side-file write; unset, the default stays the
    repo-root path the driver archives (driver compatibility)."""
    import importlib.util
    import os

    root = os.path.join(os.path.dirname(__file__), "..")
    spec = importlib.util.spec_from_file_location(
        "bench_dp", os.path.join(root, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    monkeypatch.delenv("SPARK_GRAFT_BENCH_DETAILS", raising=False)
    assert os.path.normpath(bench.details_path()) == os.path.normpath(
        os.path.join(root, "BENCH_DETAILS.json")
    )
    scratch = str(tmp_path / "probe_details.json")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DETAILS", scratch)
    assert bench.details_path() == scratch
    # empty value falls back to the default, not to writing at ""
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DETAILS", "")
    assert bench.details_path().endswith("BENCH_DETAILS.json")


def test_bench_headline_names_resolve():
    """bench.py is the driver's per-round feedback loop — a renamed
    catalog query must fail HERE, not as a KeyError mid-benchmark. Also
    pins the audit set of scripts/plan_audit.py for the same reason."""
    import importlib.util
    import os

    root = os.path.join(os.path.dirname(__file__), "..")
    for mod_path, attr in (
        (os.path.join(root, "bench.py"), "HEADLINE"),
        (os.path.join(root, "scripts", "plan_audit.py"), "AUDIT"),
    ):
        spec = importlib.util.spec_from_file_location("m_", mod_path)
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        missing = [n for n in getattr(m, attr) if n not in _REG]
        assert not missing, f"{mod_path}:{attr} names not in registry: {missing}"
