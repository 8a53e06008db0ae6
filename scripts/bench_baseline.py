"""Refresh the COMMITTED full-catalog bench baseline with provenance
(round-9 policy — the r8 verdict's What's-wrong #1: c36251b silently
replaced all 144 shared entries of the 3-pass baseline with a noisier
same-day run, +12.5%, under a one-entry commit message, leaving the
README citing the superseded vintage).

    SPARK_GRAFT_BENCH_FULL=1 SPARK_GRAFT_BENCH_BUDGET_SEC=900 \
        python bench.py            # fresh 3-pass full run (writes
                                   # bench_detail_<sf>.json)
    python scripts/bench_baseline.py [--fresh NAME ...]
                                   # merge fresh vs committed,
                                   # keep-lowest, stamp conditions
    git add bench_detail_sf0.1.json && git commit  # DEDICATED commit

Policy (keep-lowest-of-runs): for every query present in BOTH the
fresh run and the committed (git HEAD) baseline, the merged baseline
keeps the LOWER median — host contention can ratchet a per-query
number DOWN over rounds but never up, so the committed trend line is
monotone-converging toward the machine's true cost and a contended
refresh cannot masquerade as a regression. New queries enter at their
fresh medians. The asymmetry is deliberate with one escape hatch:
when a plan change intentionally slows a query (a real cost, not
contention), pass ``--fresh <name>`` so it takes the fresh median
unconditionally, and state why in the dedicated refresh commit (the
SHUFFLE_BUDGET _bumps convention). Hand-deleting the entry from the
working-tree file does NOT work — this script merges against the
git-HEAD vintage, where the stale number still exists.

Consistency: when the committed median is kept, the committed RAW
RUNS are kept with it (median(runs[q]) == queries[q] always holds in
the written file), and `_meta.kept_committed_names` lists exactly
which entries carry the older vintage — per-entry provenance is
recoverable without git archaeology.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")
SF_NAME = os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
).rstrip("/").split("/")[-1]
DETAIL = os.path.join(REPO, f"bench_detail_{SF_NAME}.json")


def main() -> int:
    force_fresh: set[str] = set()
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--fresh":
            if not args:
                print("--fresh needs a query name", file=sys.stderr)
                return 2
            force_fresh.add(args.pop(0))
        else:
            print(f"unknown arg {a!r}", file=sys.stderr)
            return 2

    fresh = json.load(open(DETAIL))
    if fresh.get("mode") != "full":
        print(
            f"{DETAIL} holds a {fresh.get('mode')!r} run — the committed "
            "baseline merges FULL runs only (run bench.py with "
            "SPARK_GRAFT_BENCH_FULL=1 first)",
            file=sys.stderr,
        )
        return 1
    if fresh.get("runs_per_query", 0) < 3:
        print(
            f"fresh run has only {fresh.get('runs_per_query')} pass(es) — "
            "the committed baseline is 3-pass medians (raise "
            "SPARK_GRAFT_BENCH_BUDGET_SEC)",
            file=sys.stderr,
        )
        return 1
    unknown_fresh = force_fresh - set(fresh["queries"])
    if unknown_fresh:
        print(f"--fresh names not in the run: {sorted(unknown_fresh)}",
              file=sys.stderr)
        return 1

    head = subprocess.run(
        ["git", "show", f"HEAD:bench_detail_{SF_NAME}.json"],
        cwd=REPO, capture_output=True, text=True,
    )
    committed = json.loads(head.stdout) if head.returncode == 0 else None

    merged = dict(fresh["queries"])
    runs = dict(fresh.get("runs", {}))
    kept_committed: list[str] = []
    kept_fresh = entered = forced = 0
    if committed:
        prior = committed["queries"]
        prior_runs = committed.get("runs", {})
        for name, sec in list(merged.items()):
            if name in force_fresh:
                forced += 1
            elif name not in prior:
                entered += 1
            elif prior[name] <= sec:
                merged[name] = prior[name]
                # carry the raw runs of the vintage that supplied the
                # median so median(runs[q]) == queries[q] everywhere
                if name in prior_runs:
                    runs[name] = prior_runs[name]
                kept_committed.append(name)
            else:
                kept_fresh += 1
        # queries dropped from the bench list leave the baseline
    for name, rs in runs.items():
        assert round(statistics.median(rs), 3) == merged[name], name
    total = round(sum(merged.values()), 3)

    out = dict(fresh)
    out["queries"] = merged
    out["runs"] = runs
    out["value"] = total
    out["_meta"] = {
        "policy": (
            "keep-lowest-of-runs: per-query min(committed, fresh) "
            "median, committed raw runs carried with kept medians; "
            "new entries enter fresh; deliberate slow-downs take "
            "--fresh <name> (state why in the dedicated refresh "
            "commit)"
        ),
        "fresh_total": fresh["value"],
        "committed_total": committed["value"] if committed else None,
        "merged_total": total,
        "kept_committed": len(kept_committed),
        "kept_committed_names": sorted(kept_committed),
        "kept_fresh": kept_fresh,
        "new_entries": entered,
        "forced_fresh": sorted(force_fresh),
        "fresh_conditions": fresh.get("conditions"),
    }
    with open(DETAIL, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(
        f"merged baseline: {total}s / {len(merged)} entries "
        f"(fresh {fresh['value']}s; kept committed median+runs for "
        f"{len(kept_committed)}, fresh for {kept_fresh}, {entered} new, "
        f"{forced} forced fresh)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
