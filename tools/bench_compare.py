"""Compare two bench_results.json artifacts (VERDICT r5 item #1's done
criterion: two consecutive same-code runs with every member within
±25% and streaming in its 43-55k band).

Usage: python tools/bench_compare.py run_a.json run_b.json [tolerance]
Prints per-member ratios beyond tolerance, the worst ratio, and a JSON
summary line; exits nonzero if any member exceeds tolerance.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    a_path, b_path = sys.argv[1], sys.argv[2]
    tol = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    a = json.load(open(a_path))
    b = json.load(open(b_path))

    worst: tuple[float, str] = (1.0, "")
    offenders = []
    n = 0
    for suite, mem in a.get("members", {}).items():
        for name, ta in mem.items():
            tb = b.get("members", {}).get(suite, {}).get(name)
            if tb is None:
                continue
            n += 1
            lo, hi = min(ta, tb), max(ta, tb)
            # sub-0.3s members are overhead-dominated; a 0.1s jitter on
            # a 0.2s probe is not a regression signal
            ratio = hi / lo if lo > 0 else float("inf")
            if ratio > worst[0] and hi >= 0.3:
                worst = (ratio, f"{suite}/{name}")
            if ratio > 1.0 + tol and hi >= 0.3:
                offenders.append((f"{suite}/{name}", ta, tb, round(ratio, 2)))

    for name, ta, tb, r in sorted(offenders, key=lambda x: -x[3]):
        print(f"  OVER {name}: {ta:.2f}s vs {tb:.2f}s  ({r}x)")
    sa, sb = a.get("streaming_throughput_rps"), b.get("streaming_throughput_rps")
    print(
        json.dumps(
            {
                "members_compared": n,
                "offenders": len(offenders),
                "worst_ratio": round(worst[0], 2),
                "worst_member": worst[1],
                "tolerance": tol,
                "total_a": a.get("total_sec"),
                "total_b": b.get("total_sec"),
                "streaming_a": sa,
                "streaming_b": sb,
            }
        )
    )
    sys.exit(1 if offenders else 0)


if __name__ == "__main__":
    main()
