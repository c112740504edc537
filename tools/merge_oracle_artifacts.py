"""Merge partial oracle_check --json artifacts (later files win per query)
into one CORRECTNESS-shaped artifact with recomputed totals — the large-SF
sweep runs in resumable segments (tools/oracle_check.py flushes
incrementally), and retried queries should overwrite their stale records.

Usage: python tools/merge_oracle_artifacts.py OUT.json IN1.json IN2.json ...
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    out, *ins = sys.argv[1:]
    queries: dict[str, dict] = {}
    sf_dir = None
    for path in ins:
        with open(path) as fh:
            d = json.load(fh)
        sf_dir = d.get("sf_dir", sf_dir)
        queries.update(d["queries"])
    n_pass = sum(
        1 for v in queries.values() if v.get("hash_match") and not v.get("no_oracle")
    )
    n_rows_only = sum(1 for v in queries.values() if v.get("no_oracle"))
    n_fail = len(queries) - n_pass - n_rows_only
    with open(out, "w") as fh:
        json.dump(
            {
                "sf_dir": sf_dir,
                "n_pass": n_pass,
                "n_fail": n_fail,
                "n_rows_only": n_rows_only,
                "queries": queries,
            },
            fh,
            indent=1,
        )
    print(f"{out}: {len(queries)} records, {n_pass} pass / {n_fail} fail / "
          f"{n_rows_only} rows-only")


if __name__ == "__main__":
    main()
