"""Docs truth-pass: the query census must not drift.

Round-3 advice caught README.md drifting from the real registry count.
The fix was to make COVERAGE.md's header the single place the count is
written down; this test locks that convention:

- COVERAGE.md's "<N> registered queries" line equals len(REGISTRY);
- no OTHER top-level doc states its own "registered queries" count
  (they must defer to COVERAGE.md);
- every registered query has an oracle (the census line's claim).
"""

from __future__ import annotations

import os
import re

from hyperloglog_pyspark_spark.registry import REGISTRY, queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Docs NOT policed: COVERAGE.md is the census holder; VERDICT/ADVICE/
# BASELINE are judge/driver artifacts that legitimately record the count
# as of THEIR round (history, not claims about the present).
# PAPERS.md / SNIPPETS.md are externally-retrieved reference material, not
# engine documentation — a refresh of retrieved content must not break CI.
_EXEMPT = {"COVERAGE.md", "VERDICT.md", "ADVICE.md", "BASELINE.md",
           "PAPERS.md", "SNIPPETS.md",
           # audited-count + allowlists locked by the stronger dedicated
           # test_plans_audit_census below, not the generic count ban
           "PLANS_FULL.md"}

_CENSUS = re.compile(r"(\d+) registered queries")


def test_coverage_census_matches_registry():
    queries()
    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    m = _CENSUS.search(text)
    assert m, "COVERAGE.md lost its census line"
    assert int(m.group(1)) == len(REGISTRY), (
        f"COVERAGE.md says {m.group(1)} queries, registry has {len(REGISTRY)}"
    )


def test_coverage_test_census_matches_collection():
    """COVERAGE.md's "<N> collected tests" must equal a live pytest
    collection (the r7 verdict caught it drifting 384 → 398 silently):
    re-collect this very suite in a subprocess and compare. Cheap
    (collection only, ~1-2 s) and self-correcting — adding a test
    without refreshing the census line fails here."""
    import subprocess
    import sys

    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    m = re.search(r"(\d+) collected tests", text)
    assert m, "COVERAGE.md lost its test-census phrase"
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q",
         "-p", "no:cacheprovider"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=120,
    )
    tail = re.search(r"(\d+) tests collected", out.stdout)
    assert tail, f"could not parse collection output: {out.stdout[-300:]}"
    assert int(m.group(1)) == int(tail.group(1)), (
        f"COVERAGE.md says {m.group(1)} tests, collection found "
        f"{tail.group(1)} — refresh the census line"
    )


def test_no_other_engine_doc_states_a_query_count():
    import glob

    for path in sorted(glob.glob(os.path.join(REPO, "*.md"))):
        if os.path.basename(path) in _EXEMPT:
            continue
        m = _CENSUS.search(open(path).read())
        assert m is None, (
            f"{os.path.basename(path)} hard-codes a query count: {m.group(0)!r}"
        )


def test_every_query_has_an_oracle():
    queries()
    missing = [n for n, q in REGISTRY.items() if q.oracle is None]
    assert not missing, f"queries without oracles: {missing}"


_PLAN_ROW = re.compile(
    r"^\| (\w+) \|(?:[^|]*\|){5} ([^|]+) \| (GWIN|-) \| (CART|-) \|$", re.M
)


def test_plans_audit_census():
    """PLANS.md / PLANS_FULL.md drift guard (VERDICT r5 #7, r6 #3): the
    audited row counts must match the live registry (full file: every
    registered query; PLANS.md: every bench-headline query), every GWIN
    row must be on plan_audit.GLOBAL_WINDOW_ALLOWED, no CART row may
    exist, and every non-empty `multi fact scans` cell must be covered
    by plan_audit.MULTI_FACT_SCAN_ALLOWED (right table, within ceiling).
    A regenerated audit that picks up a new corpus-scale global window,
    cartesian product, or redundant fact re-scan fails here even before
    the live-plan test runs."""
    import sys

    sys.path.insert(0, REPO)
    from plan_audit import GLOBAL_WINDOW_ALLOWED, MULTI_FACT_SCAN_ALLOWED

    queries()
    bench_names = {n for n, q in REGISTRY.items() if q.bench}
    for fname, expected in (
        ("PLANS.md", bench_names),
        ("PLANS_FULL.md", set(REGISTRY)),
    ):
        text = open(os.path.join(REPO, fname)).read()
        rows = _PLAN_ROW.findall(text)
        names = {r[0] for r in rows}
        assert names == expected, (
            f"{fname} stale: {len(names)} audited rows vs {len(expected)} "
            f"in registry (run `python plan_audit.py`); "
            f"missing={sorted(expected - names)[:5]} "
            f"extra={sorted(names - expected)[:5]}"
        )
        gwin = {r[0] for r in rows if r[2] == "GWIN"}
        cart = {r[0] for r in rows if r[3] == "CART"}
        assert gwin <= GLOBAL_WINDOW_ALLOWED, (
            f"{fname}: unallowlisted global-window rows {gwin - GLOBAL_WINDOW_ALLOWED}"
        )
        assert not cart, f"{fname}: CartesianProduct rows {cart}"
        bad_scans = []
        for name, fs, _, _ in rows:
            fs = fs.strip()
            if fs == "-":
                continue
            allowed = MULTI_FACT_SCAN_ALLOWED.get(name)
            for part in fs.split():
                table, n = part.split(":")
                if (
                    allowed is None
                    or allowed[0] != table
                    or int(n) > allowed[1]
                ):
                    bad_scans.append((name, part))
        assert not bad_scans, (
            f"{fname}: multi-fact-scan rows outside "
            f"plan_audit.MULTI_FACT_SCAN_ALLOWED: {bad_scans}"
        )


def test_sweep_prefix_fronts_new_then_changed_queries():
    """The driver samples a ~50-name prefix of queries() each round; the
    round-15 contract is: the nine queries with no driver row yet lead
    (new this round), then 41 of the 44 r9-aged names — which consumes
    every remaining slot, so the changed-code block is EMPTY this round
    (the r15 oracle-fix queries are all age-1 r14 greens, re-verified
    locally at three SFs + bare session; window_session/window_sliding/
    window_tumbling defer to the front of r16; see the SWEEP_PRIORITY
    comment for the deferral rationale). Locks the prefix composition
    against accidental reordering."""
    import __spark_entry__ as E

    names = list(E.queries())
    changed: list[str] = []
    from hyperloglog_pyspark_spark.registry import (
        DRIVER_VERIFIED,
        SWEEP_PRIORITY,
    )

    n_new = sum(1 for n in names if n not in DRIVER_VERIFIED)
    assert names[n_new : n_new + len(changed)] == changed, (
        "changed-operator block drifted"
    )
    # every never-driver-verified name must be pinned (a new query left
    # off SWEEP_PRIORITY would still front the sample, but silently
    # displace an aged-cohort pin past slot 50)
    unpinned_new = [
        n for n in names[:n_new] if n not in set(SWEEP_PRIORITY)
    ]
    assert not unpinned_new, f"new queries missing from pins: {unpinned_new}"
    # pin-pool integrity: registry names dedupe through the dict, so
    # assert on SWEEP_PRIORITY itself — a duplicate there silently
    # shrinks the 50-slot rotation
    from hyperloglog_pyspark_spark.registry import SWEEP_PRIORITY

    assert len(SWEEP_PRIORITY) == 50
    assert len(set(SWEEP_PRIORITY)) == 50, "duplicate name in SWEEP_PRIORITY"


def test_bench_summary_line_fits_driver_tail_window():
    """The per-round driver keeps only the LAST 2000 chars of bench.py's
    stdout (BENCH_r06.json lost 16 of 80 per-query numbers that way).
    bench.summary_line is bounded by construction — 10 slowest entries
    only — but a registry of longer names or a format change could
    regrow it; lock it against the worst case: every bench query at a
    4-digit wall."""
    import bench

    queries()
    times = {n: 9999.99 for n, q in REGISTRY.items() if q.bench}
    line = bench.summary_line(
        {
            "metric": "headline_queries_total_wall",
            "value": round(sum(times.values()), 4),
            "value_min": round(sum(times.values()), 4),
            "unit": "sec",
            "queries": times,
            "sf": 0.1,
            "calibration_s": {"start": 9999.9999, "end": 9999.9999},
            "ambient_factor": 99999.99,
        }
    )
    assert len(line) < 1500, f"bench summary line grew to {len(line)} chars"
    import json as _json

    parsed = _json.loads(line)
    assert parsed["n_queries"] == len(times)
    assert len(parsed["queries"]) == 10
    # r13 verdict #2: the artifact must carry its own machine-state
    # evidence so driver-vs-builder wall divergence self-diagnoses.
    assert parsed["ambient_factor"] == 99999.99


def test_docstring_constants_interpolated():
    """registry._interpolate_doc resolves {UPPER_CONSTANT} docstring
    placeholders at registration (r14, from r13 advice: help() used to
    render literal '{SRC_CAP_PCT}' brace text). A leftover token in a
    registered query's __doc__ means the constant is defined BELOW the
    function (decoration-time getattr missed it) or was renamed —
    either way the docs lie; fail loudly."""
    import re

    queries()
    bad = {}
    for name, q in REGISTRY.items():
        left = re.findall(r"\{[A-Z][A-Z0-9_]*\}", q.fn.__doc__ or "")
        if left:
            bad[name] = left
        # Query.doc (the COVERAGE/PLANS rendering source) must agree
        # with the live __doc__ — both come from the same registration.
        assert (q.fn.__doc__ or "").strip() == q.doc, name
    assert not bad, f"unresolved docstring constants: {bad}"


def test_no_shadowed_module_constants():
    """A registered query's Spark closure reads module-level constants
    at CALL time while its oracle f-string froze them at registration —
    so a second `NAME = ...` later in the same module silently diverges
    the two engines (caught live in r13: a new K_ANON = 5 shadowed
    quality_k_anonymity's K_ANON = 10 and would have hash-mismatched
    35 classes at the sf0.01 driver gate). Reject any duplicate
    top-level UPPERCASE assignment in the engine package."""
    import ast
    import collections
    import glob
    import os

    pkg = os.path.join(os.path.dirname(__file__), "..",
                       "hyperloglog_pyspark_spark")
    offenders = []
    for f in sorted(glob.glob(os.path.join(pkg, "**", "*.py"),
                              recursive=True)):
        lines = collections.defaultdict(list)
        for node in ast.parse(open(f).read()).body:
            targets = []
            if isinstance(node, ast.Assign):
                targets = [t for t in node.targets if isinstance(t, ast.Name)]
            elif isinstance(node, ast.AnnAssign) and isinstance(
                node.target, ast.Name
            ):
                targets = [node.target]
            for t in targets:
                if t.id.isupper():
                    lines[t.id].append(node.lineno)
        for name, ls in lines.items():
            if len(ls) > 1:
                offenders.append((os.path.basename(f), name, ls))
    assert not offenders, f"shadowed module constants: {offenders}"
