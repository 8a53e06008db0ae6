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
        "exact_forms": len(bench.EXACT_FORMS),
        "tests_collected": n_tests,
    }


def tally_line(c: dict[str, int]) -> str:
    return (
        f"{c['queries']} oracle-paired queries total "
        f"({c['oracle_paired']} with SQL oracles); "
        f"{c['tests_collected']} tests collected; "
        f"{c['bench_entries']} timed bench entries "
        f"({c['parity_probes']} labeled parity probes, "
        f"{c['exact_forms']} labeled exact forms)."
    )


_TALLY_RE = re.compile(
    r"^\d+ oracle-paired queries total \(\d+ with SQL oracles\); "
    r"\d+ tests collected; \d+ timed bench entries "
    r"\(\d+ labeled parity probes(, \d+ labeled exact forms)?\)\.$"
)


def _tally_lines(lines: list[str]) -> list[int]:
    return [i for i, ln in enumerate(lines) if _TALLY_RE.match(ln)]


def main() -> int:
    c = counts()
    line = tally_line(c)
    readme_path = os.path.join(REPO, "README.md")
    if "--check" in sys.argv:
        # the CURRENT tally is the LAST tally-shaped line (earlier ones
        # are frozen history snapshots inside past round sections) — a
        # substring-anywhere check once passed while the current line
        # was stale because an ad-hoc regex edit had refreshed a
        # HISTORY line instead (round 7).
        lines = open(readme_path).read().split("\n")
        idxs = _tally_lines(lines)
        if not idxs or lines[idxs[-1]] != line:
            got = lines[idxs[-1]] if idxs else "<no tally line found>"
            print(
                f"README tally out of date.\nexpected: {line}\n"
                f"current (last tally line): {got}",
                file=sys.stderr,
            )
            return 1
        print("README tally matches.")
        return 0
    if "--write" in sys.argv:
        lines = open(readme_path).read().split("\n")
        idxs = _tally_lines(lines)
        if not idxs:
            print("no tally line found to replace", file=sys.stderr)
            return 1
        lines[idxs[-1]] = line
        open(readme_path, "w").write("\n".join(lines))
        print(f"updated README.md line {idxs[-1] + 1}: {line}")
        return 0
    print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
