#!/usr/bin/env python
"""Generate the README tally line from the live surfaces — never
hand-edit the counts (they drifted in rounds 3 and 4; ADVICE/VERDICT
both flagged it). Usage:

    python scripts/tally.py            # print the tally sentence
    python scripts/tally.py --check    # exit 1 if README disagrees

`tests/test_readme_tally.py` runs the --check form in CI.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def counts() -> dict[str, int]:
    sys.path.insert(0, REPO)
    from dce_spark.queries import QUERIES, oracle_sql

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    out = subprocess.run(
        [sys.executable, "-m", "pytest", "--collect-only", "-q", "tests/"],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    m = re.search(r"(\d+) tests collected", out.stdout)
    n_tests = int(m.group(1)) if m else -1

    return {
        "queries": len(QUERIES),
        "oracle_paired": len(oracle_sql()),
        # bench entries = catalog list + the module-level extras
        # (fast variants + flagship contract) — counted, not hardcoded
        "bench_entries": len(bench.BENCH_QUERIES) + len(bench.EXTRA_BENCH_ENTRIES),
        "parity_probes": len(bench.PARITY_PROBES),
        "tests_collected": n_tests,
    }


def tally_line(c: dict[str, int]) -> str:
    return (
        f"{c['queries']} oracle-paired queries total "
        f"({c['oracle_paired']} with SQL oracles); "
        f"{c['tests_collected']} tests collected; "
        f"{c['bench_entries']} timed bench entries "
        f"({c['parity_probes']} labeled parity probes)."
    )


def main() -> int:
    c = counts()
    line = tally_line(c)
    if "--check" in sys.argv:
        readme = open(os.path.join(REPO, "README.md")).read()
        if line not in readme:
            print(f"README tally out of date.\nexpected: {line}", file=sys.stderr)
            return 1
        print("README tally matches.")
        return 0
    print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
