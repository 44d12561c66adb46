"""Compare two bench_results.json artifacts — and FAIL on regressions.

Round 7 (VERDICT r6 item #4): this comparator is now wired into
``bench.py`` as a failing gate, not just a reporting tool. The decision
rule separates the two phenomena the round-6 triangulation runs
diagnosed:

  * **ambient/session drift** — wide per-member spread, stable median,
    or a uniform shift across the whole run: NOT a regression;
  * **a real regression** — the MEDIAN shifts beyond tolerance AND the
    rep spreads do not overlap (the new run's fastest rep is still
    slower than the old run's slowest): flagged, nonzero exit.

Members with medians under 1.0 s on both sides are skipped
(overhead/drift-dominated: a round-7 cross-session comparison measured
sub-second same-code members drifting 2-3x while multi-second members
stayed within ~1.5x), and the session-median ratio is divided out so a
uniformly slower machine shifts no member individually. Runs
without a ``member_spread`` artifact degrade to ratio-only comparison
with the spread taken as the median point.

Usage: python tools/bench_compare.py run_a.json run_b.json [tolerance]
Prints per-member offenders + a JSON summary; exits nonzero on any
offender (b regressed vs a).
"""

from __future__ import annotations

import json
import sys

#: median-ratio tolerance for the failing gate (applied AFTER session
#: normalization): the committed same-code triangulation runs show
#: drift up to ~1.46x, so the gate sits above it; combined with the
#: spread-overlap requirement a real (consistent) slowdown still trips
#: it while drift does not
DEFAULT_TOL = 0.5

#: medians under this are overhead/drift-dominated — never regression
#: signal. Calibrated from a round-7 cross-session comparison: members
#: under 1 s drifted up to 2-3x between the committed run and a
#: same-code re-run (median session ratio 1.12) while members over 1 s
#: stayed within ~1.5x; a 0.3 s floor flagged six same-code members.
MIN_SEC = 1.0


def compare(a: dict, b: dict, tol: float = DEFAULT_TOL) -> dict:
    """Regression report for run ``b`` against baseline ``a``.

    Two-stage rule: first the MEDIAN of all member ratios estimates the
    session-level drift (machine/load differences shift every member
    together — dividing it out keeps the gate about the MEMBER, not the
    session); then a member is an offender when its drift-normalized
    ratio exceeds ``1 + tol`` AND the observation spreads do not
    overlap (the new run's fastest rep still slower than the old run's
    slowest). Improvements never flag. Members whose medians are under
    ``MIN_SEC`` on both sides are skipped. Returns a summary dict with
    ``offenders`` (list of dicts) plus totals.
    """
    pairs = []
    for suite, mem in a.get("members", {}).items():
        b_mem = b.get("members", {}).get(suite, {})
        for name, ma in mem.items():
            mb = b_mem.get(name)
            if mb is not None:
                pairs.append((suite, name, ma, mb))
    ratios = sorted(mb / ma for _, _, ma, mb in pairs if ma > 0)
    # the drift estimate needs a population: with few members the median
    # IS the (possibly regressed) member and would normalize itself away
    drift = ratios[len(ratios) // 2] if len(ratios) >= 10 else 1.0
    # only ever normalize a SLOWDOWN down, never amplify one: a faster
    # session (drift < 1) must not manufacture offenders
    drift = max(drift, 1.0)

    offenders = []
    worst: tuple[float, str] = (1.0, "")
    for suite, name, ma, mb in pairs:
        if max(ma, mb) < MIN_SEC:
            continue
        ratio = (mb / ma if ma > 0 else float("inf")) / drift
        if ratio > worst[0]:
            worst = (ratio, f"{suite}/{name}")
        if ratio <= 1.0 + tol:
            continue
        sa = a.get("member_spread", {}).get(suite, {}).get(name) or [ma, ma]
        sb = b.get("member_spread", {}).get(suite, {}).get(name) or [mb, mb]
        if sb[0] > sa[1]:  # non-overlapping: consistently slower
            offenders.append(
                {
                    "member": f"{suite}/{name}",
                    "median_a": ma,
                    "median_b": mb,
                    "ratio": round(ratio, 2),
                    "spread_a": sa,
                    "spread_b": sb,
                }
            )
    return {
        "members_compared": len(pairs),
        "session_drift": round(drift, 3),
        "offenders": offenders,
        "worst_ratio": round(worst[0], 2),
        "worst_member": worst[1],
        "tolerance": tol,
        "total_a": a.get("total_sec"),
        "total_b": b.get("total_sec"),
        "streaming_a": a.get("streaming_throughput_rps"),
        "streaming_b": b.get("streaming_throughput_rps"),
    }


def main() -> None:
    a_path, b_path = sys.argv[1], sys.argv[2]
    tol = float(sys.argv[3]) if len(sys.argv) > 3 else DEFAULT_TOL
    rep = compare(json.load(open(a_path)), json.load(open(b_path)), tol)
    for o in sorted(rep["offenders"], key=lambda x: -x["ratio"]):
        print(
            f"  REGRESSED {o['member']}: {o['median_a']:.2f}s -> "
            f"{o['median_b']:.2f}s ({o['ratio']}x), spreads "
            f"{o['spread_a']} vs {o['spread_b']}"
        )
    summary = dict(rep)
    summary["offenders"] = len(rep["offenders"])
    print(json.dumps(summary))
    sys.exit(1 if rep["offenders"] else 0)


if __name__ == "__main__":
    main()
