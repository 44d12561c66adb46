"""Doc-drift guards: the gate counts quoted in README.md and
COVERAGE.md must equal what tools/gate_counts.py derives from the live
SUITES/ROWS_ONLY tables. Rounds 5, 7, and 9 each shipped some flavor
of hand-maintained-number drift; the counts became tool-generated in
round 7 and the headline in round 10 — this test makes the remaining
manual step (pasting the right numbers) fail loudly when skipped."""

import importlib.util
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _counts():
    spec = importlib.util.spec_from_file_location(
        "gate_counts", os.path.join(ROOT, "tools", "gate_counts.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.counts()


def test_readme_gate_counts_match_tool():
    c = _counts()
    with open(os.path.join(ROOT, "README.md")) as f:
        md = f.read().replace("\n  ", " ")  # unwrap bullets
    want = (
        f"{c['declared_queries']} declared entries = "
        f"{c['oracle_suites']} oracle-graded suites covering "
        f"{c['oracle_member_probes']} member probes + "
        f"{len(c['rows_only'])} rows-only ({c['total_probes']} probes total)"
    )
    assert want in md, (
        f"README gate-counts bullet out of date — run "
        f"`python tools/gate_counts.py` and paste: {want!r}"
    )


def test_coverage_gate_counts_match_tool():
    c = _counts()
    with open(os.path.join(ROOT, "COVERAGE.md")) as f:
        md = f.read()
    m = re.search(
        r"exactly (\d+)\ndeclared entries \((\d+) oracle-graded suites "
        r"covering (\d+) member probes",
        md,
    )
    assert m, "COVERAGE.md counts sentence not found"
    assert (
        int(m.group(1)),
        int(m.group(2)),
        int(m.group(3)),
    ) == (
        c["declared_queries"],
        c["oracle_suites"],
        c["oracle_member_probes"],
    ), f"COVERAGE.md counts stale vs tool: {m.groups()} != tool"


def test_readme_headline_matches_committed_artifact():
    """The round-status headline bullet must carry the numbers of a
    legitimately-current bench artifact: EITHER the committed
    (HEAD) `bench_results.json` or the working-tree copy. Round 9
    shipped it stale against both; round 10's version of this test read
    only the working tree, which the driver's own post-commit bench run
    overwrites — failing in exactly the session that matters. Accepting
    either rendering keeps the drift guard while surviving the driver's
    artifact overwrite."""
    spec = importlib.util.spec_from_file_location(
        "gate_counts", os.path.join(ROOT, "tools", "gate_counts.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    lines = mod.headline_candidates()
    if not lines:  # no artifact in this checkout — nothing to pin
        return
    with open(os.path.join(ROOT, "README.md")) as f:
        md = f.read().replace("\n  ", " ")  # unwrap the bullet
    assert any(line in md for line in lines), (
        f"README headline bullet matches neither the committed nor the "
        f"working-tree bench artifact — run `python tools/gate_counts.py` "
        f"and paste its headline line. Candidates: {lines!r}"
    )
