"""Emit the driver-gate suite/member counts from the single source of
truth (`__spark_entry__.SUITES` / `ROWS_ONLY`), so COVERAGE.md and
README.md can paste identical numbers instead of hand-maintaining them
(round-5 verdict flagged a 130-vs-131 doc drift).

Usage:  python tools/gate_counts.py
Prints one human line plus a JSON line with the raw counts.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402  (path bootstrap above)


def counts() -> dict:
    suites = entry.SUITES
    rows_only = entry.ROWS_ONLY
    members = [m for ms in suites.values() for m in ms]
    declared = list(entry.queries())
    assert len(declared) == len(suites) + len(rows_only), (
        len(declared),
        len(suites),
        len(rows_only),
    )
    return {
        "declared_queries": len(declared),
        "oracle_suites": len(suites),
        "oracle_member_probes": len(members),
        "rows_only": sorted(rows_only),
        "total_probes": len(members) + len(rows_only),
    }


def main() -> None:
    c = counts()
    print(
        f"{c['declared_queries']} declared entries = "
        f"{c['oracle_suites']} oracle-graded suites covering "
        f"{c['oracle_member_probes']} member probes + "
        f"{len(c['rows_only'])} rows-only ({', '.join(c['rows_only'])}); "
        f"{c['total_probes']} probes total"
    )
    print(json.dumps(c, sort_keys=True))


if __name__ == "__main__":
    main()
