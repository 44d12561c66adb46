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

Members with medians under 0.3 s on both sides are skipped
(overhead-dominated; a 0.1 s jitter on a 0.2 s probe is noise). Runs
without a ``member_spread`` artifact degrade to ratio-only comparison
with the spread taken as the median point.

Usage: python tools/bench_compare.py run_a.json run_b.json [tolerance]
Prints per-member offenders + a JSON summary; exits nonzero on any
offender (b regressed vs a).
"""

from __future__ import annotations

import json
import sys

#: median-ratio tolerance for the failing gate: the committed same-code
#: triangulation runs show uniform session drift up to ~1.46x, so the
#: gate sits above it; combined with the spread-overlap requirement a
#: real (consistent) slowdown still trips it while drift does not
DEFAULT_TOL = 0.5

#: medians under this are overhead-dominated — never regression signal
MIN_SEC = 0.3


def compare(a: dict, b: dict, tol: float = DEFAULT_TOL) -> dict:
    """Regression report for run ``b`` against baseline ``a``.

    A member is an offender when median_b > median_a * (1 + tol) AND
    the observation spreads do not overlap (spread_b_lo > spread_a_hi).
    Improvements never flag. Returns a summary dict with ``offenders``
    (list of dicts) plus totals.
    """
    offenders = []
    worst: tuple[float, str] = (1.0, "")
    n = 0
    for suite, mem in a.get("members", {}).items():
        b_mem = b.get("members", {}).get(suite, {})
        for name, ma in mem.items():
            mb = b_mem.get(name)
            if mb is None:
                continue
            n += 1
            if max(ma, mb) < MIN_SEC:
                continue
            ratio = mb / ma if ma > 0 else float("inf")
            if ratio > worst[0]:
                worst = (ratio, f"{suite}/{name}")
            if ratio <= 1.0 + tol:
                continue
            sa = (
                a.get("member_spread", {}).get(suite, {}).get(name)
                or [ma, ma]
            )
            sb = (
                b.get("member_spread", {}).get(suite, {}).get(name)
                or [mb, mb]
            )
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
        "members_compared": n,
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
