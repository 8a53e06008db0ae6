#!/usr/bin/env python
"""End-to-end walkthrough of the mergeable validation-state ledger —
the engine's flagship product surface — driven through the SAME CLI
verbs an operator runs in production:

    validate --emit-states --zone-cols   commit per-partition states
                                         while validating; later runs
                                         serve covered partitions with
                                         ZERO row-rescan (proven here
                                         by poisoning the data)
    states                               read-only ledger inspection
                                         (proven here with the data
                                         DELETED)
    compact                              fold the append-style ledger to
                                         one row per partition
                                         (crash-safe temp-then-rename)
    prune --where A --where B --invert   plan a multi-predicate skip
                                         list from kilobytes of ledger —
                                         zero data I/O

Coverage is PARTITION-grained: new day-partitions flow through the
single-path CLI command above, while intra-partition micro-batches
append ledger rows via ``api.partition_states`` (the same mergeable
states the CLI commits — the ledger time-dimension queries in the
catalog are built on exactly these per-(partition, batch) rows).

Why this matters at 100 TB: a daily validation job must not re-scan
yesterday's 99 TB to re-certify it. The ledger holds ~#partitions rows
of mergeable state (counts, null counts, min/max zones, freshness),
so incremental validation scans ONLY new partitions and query planning
skips partitions whose zones PROVE a predicate empty.

    python examples/state_ledger_quickstart.py [workdir]

(reference parity: the reference engine validates each run from rows —
crates/contracts_core — and has no incremental-state face; this
lifecycle is one of this repo's extensions beyond it.)
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

from pyspark.sql import SparkSession, functions as F

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, REPO)

CONTRACT = """
version: "1.0.0"
name: daily_metrics
owner: data-eng
schema:
  format: parquet
  location: {loc}
  fields:
    - name: id
      type: int64
      nullable: false
    - name: v
      type: float64
      constraints:
        - type: range
          min: 0
          max: 100
    - name: day
      type: string
"""

# four day-partitions with DISJOINT value zones, so zone pruning has
# something to prove: a=[0,10], b=[20,30], c=[45,55], d=[80,100]
DAY_RANGES = {"a": (0, 10), "b": (20, 30), "c": (45, 55), "d": (80, 100)}


def cli(*args: str) -> subprocess.CompletedProcess:
    """Run a `dce` verb exactly as an operator would."""
    print(f"\n$ dce {' '.join(args)}")
    r = subprocess.run(
        [sys.executable, "-m", "dce_spark.cli", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=600,
    )
    # keep the verb's own output; drop JVM/log4j noise (including the
    # logged-then-handled FileNotFound on the first-run ledger
    # bootstrap, which the validate verb treats as an empty ledger)
    noise = ("[Stage", "WARNING", "Using ", "Setting ", "To adjust",
             "java.", "\tat ", "Caused by", "\t... ")
    for stream in (r.stdout, r.stderr):
        for ln in stream.splitlines():
            if ln.strip() and not ln.startswith(noise) \
                    and " WARN " not in ln:
                print(f"  {ln}")
    return r


def synth_days(spark, days: list[str], batch: int = 0):
    """5 rows per named day, values inside the day's zone (batch 1
    widens each zone toward its edges)."""
    rows = []
    for day in days:
        lo, hi = DAY_RANGES[day]
        for i in range(5):
            frac = i / 4 if batch else (0.25 + i / 8)
            rows.append(
                (batch * 1000 + len(rows), lo + (hi - lo) * frac, day)
            )
    return spark.createDataFrame(
        rows, schema="id long, v double, day string"
    )


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="dce_ledger_"
    )
    os.makedirs(work, exist_ok=True)
    data = os.path.join(work, "daily_metrics")
    ledger = os.path.join(work, "ledger")
    contract = os.path.join(work, "contract.yml")

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("state-ledger-quickstart")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from dce_spark.api import partition_states  # noqa: E402
    from dce_spark.sinks import write_partitioned  # noqa: E402

    with open(contract, "w") as fh:
        fh.write(CONTRACT.format(loc=data))

    # ---- delivery 1: days a,b land; validate AND commit states ----
    write_partitioned(
        synth_days(spark, ["a", "b"]), data, ["day"],
        files_per_partition=1,
    )
    r = cli(
        "validate", contract, "--partition-col", "day",
        "--state-ledger", ledger, "--emit-states", ledger,
        "--zone-cols", "v",
    )
    assert r.returncode == 0, r.stderr
    assert "committed 2 partition state rows" in r.stderr

    # poison a,b on disk: every v now violates the contract range. If
    # any later run re-scanned them it would FAIL — it must not.
    write_partitioned(
        synth_days(spark, ["a", "b"]).withColumn("v", F.lit(500.0)),
        data, ["day"], files_per_partition=1, mode="overwrite",
    )
    print("\n(poisoned days a,b on disk — every v now out of range)")

    # ---- delivery 2: days c,d arrive. The SAME single-path command
    # scans ONLY the uncovered partitions: a,b are served from state
    # (still PASS despite the poison — zero row-rescan, by proof),
    # and exactly 2 new state rows commit ----
    write_partitioned(
        synth_days(spark, ["c", "d"]), data, ["day"],
        files_per_partition=1, mode="append",
    )
    r = cli(
        "validate", contract, "--partition-col", "day",
        "--state-ledger", ledger, "--emit-states", ledger,
        "--zone-cols", "v",
    )
    assert r.returncode == 0, r.stderr
    assert "committed 2 partition state rows" in r.stderr
    assert "partition day=a: PASS" in r.stdout  # ledger-served

    # ---- intra-partition micro-batches: a second batch lands INSIDE
    # every existing day. Partition-grained CLI coverage will not
    # re-open a covered partition, so per-batch rows append via the
    # partition_states API — the same mergeable states, one row per
    # (partition, batch), the shape the catalog's ledger_* queries
    # analyze ----
    batch2 = synth_days(spark, list(DAY_RANGES), batch=1)
    st = partition_states(
        spark, batch2, CONTRACT.format(loc=data), "day", zones=["v"]
    )
    spark.createDataFrame(st.collect(), st.schema).write.mode(
        "append"
    ).parquet(ledger)
    print("\n(appended 4 batch-2 state rows via api.partition_states)")

    # ---- the ledger now answers WITHOUT the data: delete it ----
    shutil.rmtree(data)
    print(f"(deleted {data} — everything below is ledger-only)")

    r = cli("states", ledger, "--partition-col", "day")
    assert r.returncode == 0, r.stderr
    assert "batches=2" in r.stdout  # both batches merged per day

    # ---- compact: 8 (partition, batch) rows -> one row per
    # partition, report-preserving and crash-safe (the replacement is
    # fully written to a temp sibling before any rename) ----
    r = cli("compact", ledger, "--partition-col", "day")
    assert r.returncode == 0, r.stderr
    assert "compacted 8 state rows -> 4" in r.stderr

    # ---- prune: plan skip lists from the committed zones ----
    # single predicate: only day d's zone can hold v >= 90
    r = cli(
        "prune", ledger, "--partition-col", "day",
        "--where", "v >= 90",
    )
    assert r.returncode == 0, r.stderr

    # AND-conjunction: v >= 25 rules out a (zone max 10); v <= 28
    # rules out c and d (zone mins 45, 80). The skip list is the UNION
    # of per-conjunct proofs; --invert prints the must-scan complement
    # a scheduler consumes — just day b.
    r = cli(
        "prune", ledger, "--partition-col", "day",
        "--where", "v >= 25", "--where", "v <= 28", "--invert",
    )
    assert r.returncode == 0, r.stderr

    spark.stop()
    print(f"\nworkdir kept at {work} (ledger: {ledger})")


if __name__ == "__main__":
    main()
