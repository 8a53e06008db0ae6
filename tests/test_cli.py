"""CLI black-box tests (mirrors crates/contracts_cli/tests/cli_tests.rs
via subprocess + in-process arg parsing)."""

import json
import subprocess
import sys

import pytest

GOOD = """
version: "1.0.0"
name: customer
owner: data-eng
schema:
  format: parquet
  location: {loc}
  fields:
    - name: c_custkey
      type: int64
      nullable: false
    - name: c_name
      type: string
quality_checks:
  completeness:
    threshold: 0.5
    fields: [c_name]
"""

BAD_DEF = """
version: "1.0.0"
name: events
owner: data-eng
schema:
  fields: []
"""


def run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "dce_spark.cli", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )


def test_check_good(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text(GOOD.format(loc="/tmp/nonexistent.parquet"))
    r = run_cli("check", str(p))
    assert r.returncode == 0
    assert "OK" in r.stdout
    assert "completeness" in r.stdout


def test_check_bad(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text(BAD_DEF)
    r = run_cli("check", str(p))
    assert r.returncode == 1
    assert "invalid" in r.stdout


def test_validate_json_output(tmp_path, sf_dir):
    p = tmp_path / "c.yml"
    p.write_text(GOOD.format(loc=f"{sf_dir}/customer.parquet"))
    r = run_cli("validate", str(p), "--format", "json")
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads(r.stdout[r.stdout.index("{") :])
    assert report["passed"] is True
    assert report["stats"]["records_validated"] > 0


def test_validate_approx_distinct_flag(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text(
        GOOD.format(loc="/root/testdata/sf0.001/customer.parquet")
        + "  uniqueness:\n    fields: [c_custkey]\n"
    )
    r = run_cli("validate", str(p), "--approx-distinct", "--format", "json")
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout)
    uniq = [
        c
        for c in rep["checks"]["quality"]["checks"]
        if c["name"].startswith("quality.uniqueness")
    ]
    assert len(uniq) == 1 and uniq[0]["passed"]


PARTITIONED = """
version: "1.0.0"
name: daily
owner: o
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


def test_validate_partition_mode(spark, tmp_path):
    from dce_spark.sinks import write_partitioned

    rows = [(i, 1.0 * i, "a") for i in range(5)]
    rows += [(10 + i, 500.0, "b") for i in range(5)]  # range violations
    df = spark.createDataFrame(rows, schema="id long, v double, day string")
    out = str(tmp_path / "daily")
    write_partitioned(df, out, ["day"], files_per_partition=1)

    p = tmp_path / "c.yml"
    p.write_text(PARTITIONED.format(loc=out))
    r = run_cli("validate", str(p), "--partition-col", "day")
    assert r.returncode == 1, r.stdout + r.stderr
    assert "partition day=a: PASS" in r.stdout
    assert "partition day=b: FAIL" in r.stdout

    # incremental frontier: only 'b' checked, still failing
    r2 = run_cli("validate", str(p), "--partition-col", "day", "--since", "a",
                 "--format", "json")
    assert r2.returncode == 1
    d = json.loads(r2.stdout)
    assert list(d) == ["b"] and d["b"]["passed"] is False


def test_profile_verb(tmp_path):
    r = run_cli(
        "profile", "parquet", "/root/testdata/sf0.001/nation.parquet",
        "--columns", "n_nationkey",
    )
    assert r.returncode == 0, r.stderr
    d = json.loads(r.stdout)
    assert d["row_count"] == 25
    assert d["columns"]["n_nationkey"]["distinct_count"] == 25


def test_validate_state_ledger_roundtrip(spark, tmp_path):
    """The round-12 CLI face of the mergeable-state ledger: --emit-states
    commits per-partition states; --state-ledger serves covered
    partitions with ZERO row-scan (proven by poisoning the data between
    runs); emitting against a full ledger is a no-op; a ledger committed
    under an older contract fails loudly."""
    from dce_spark.sinks import write_partitioned

    rows = [(i, 1.0 * i, "a") for i in range(5)]
    rows += [(10 + i, 500.0, "b") for i in range(5)]  # range violations
    df = spark.createDataFrame(rows, schema="id long, v double, day string")
    out = str(tmp_path / "daily")
    write_partitioned(df, out, ["day"], files_per_partition=1)
    ledger = str(tmp_path / "ledger")

    p = tmp_path / "c.yml"
    p.write_text(PARTITIONED.format(loc=out))

    # run 1: validate from rows, commit states
    r1 = run_cli("validate", str(p), "--partition-col", "day",
                 "--emit-states", ledger)
    assert r1.returncode == 1, r1.stdout + r1.stderr
    assert "partition day=a: PASS" in r1.stdout
    assert "partition day=b: FAIL" in r1.stdout
    assert "committed 2 partition state rows" in r1.stderr

    # poison the data: every v now violates the range. A ledger-served
    # run must NOT notice (zero row-scan); a row-path run would fail a.
    poisoned = spark.createDataFrame(
        [(i, 500.0, d) for i, d in enumerate(["a"] * 5 + ["b"] * 5)],
        schema="id long, v double, day string",
    )
    write_partitioned(
        poisoned, out, ["day"], files_per_partition=1, mode="overwrite"
    )

    r2 = run_cli("validate", str(p), "--partition-col", "day",
                 "--state-ledger", ledger)
    assert r2.returncode == 1, r2.stdout + r2.stderr
    assert "partition day=a: PASS" in r2.stdout  # served from state
    assert "partition day=b: FAIL" in r2.stdout

    # emit against the full ledger: nothing fresh to commit, and the
    # reports still come from the committed (pre-poison) states
    r3 = run_cli("validate", str(p), "--partition-col", "day",
                 "--state-ledger", ledger, "--emit-states", ledger)
    assert r3.returncode == 1, r3.stdout + r3.stderr
    assert "committed 0 partition state rows" in r3.stderr
    assert "partition day=a: PASS" in r3.stdout

    # stale ledger: v2 contract needs aliases the v1 states never
    # computed -> named error, exit 2, no traceback
    p2 = tmp_path / "c2.yml"
    p2.write_text(
        PARTITIONED.format(loc=out).replace(
            "    - name: day\n      type: string",
            "    - name: day\n      type: string\n"
            "      constraints:\n"
            "        - type: pattern\n"
            "          regex: '^[ab]$'",
        )
    )
    r4 = run_cli("validate", str(p2), "--partition-col", "day",
                 "--state-ledger", ledger)
    assert r4.returncode == 2, r4.stdout + r4.stderr
    assert "missing aliases" in r4.stderr
    assert "Traceback" not in r4.stderr


def test_validate_ledger_flag_misuse(tmp_path, sf_dir):
    """--state-ledger/--emit-states without --partition-col, and
    --allow-partial without a ledger, are named CLI errors (exit 2)."""
    p = tmp_path / "c.yml"
    p.write_text(GOOD.format(loc=f"{sf_dir}/customer.parquet"))
    r = run_cli("validate", str(p), "--state-ledger", str(tmp_path / "x"))
    assert r.returncode == 2
    assert "--partition-col" in r.stderr
    r2 = run_cli("validate", str(p), "--partition-col", "c_custkey",
                 "--allow-partial")
    assert r2.returncode == 2
    assert "--allow-partial" in r2.stderr


def test_validate_emit_states_zone_cols(spark, tmp_path):
    """--zone-cols emits exact zone-map columns in the committed
    states, and the ledger they produce still serves validation."""
    from dce_spark.sinks import write_partitioned

    rows = [(i, 1.0 * i, "a") for i in range(5)]
    rows += [(10 + i, 50.0, "b") for i in range(5)]
    df = spark.createDataFrame(rows, schema="id long, v double, day string")
    out = str(tmp_path / "daily")
    write_partitioned(df, out, ["day"], files_per_partition=1)
    ledger = str(tmp_path / "ledger")
    p = tmp_path / "c.yml"
    p.write_text(PARTITIONED.format(loc=out))

    r = run_cli("validate", str(p), "--partition-col", "day",
                "--emit-states", ledger, "--zone-cols", "v")
    assert r.returncode == 0, r.stdout + r.stderr
    st = spark.read.parquet(ledger)
    assert "__zmin__v" in st.columns and "__zmax__v" in st.columns
    zones = {row["day"]: (row["__zmin__v"], row["__zmax__v"])
             for row in st.collect()}
    assert zones == {"a": (0.0, 4.0), "b": (50.0, 50.0)}

    r2 = run_cli("validate", str(p), "--partition-col", "day",
                 "--state-ledger", ledger)
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert "partition day=a: PASS" in r2.stdout


def test_validate_single_path_ledger_bootstraps(spark, tmp_path):
    """The documented single-path workflow (--state-ledger and
    --emit-states pointed at ONE path) must work on the FIRST run,
    when the ledger does not exist yet: the missing path reads as an
    empty ledger and the emit step bootstraps it (ADVICE r12)."""
    from dce_spark.sinks import write_partitioned

    rows = [(i, 1.0 * i, "a") for i in range(5)]
    rows += [(10 + i, 50.0, "b") for i in range(5)]
    df = spark.createDataFrame(rows, schema="id long, v double, day string")
    out = str(tmp_path / "daily")
    write_partitioned(df, out, ["day"], files_per_partition=1)
    ledger = str(tmp_path / "ledger")  # never created
    p = tmp_path / "c.yml"
    p.write_text(PARTITIONED.format(loc=out))

    r1 = run_cli("validate", str(p), "--partition-col", "day",
                 "--state-ledger", ledger, "--emit-states", ledger)
    assert r1.returncode == 0, r1.stdout + r1.stderr
    assert "Traceback" not in r1.stderr
    assert "committed 2 partition state rows" in r1.stderr

    # second run against the now-bootstrapped ledger: full coverage,
    # nothing fresh to commit
    r2 = run_cli("validate", str(p), "--partition-col", "day",
                 "--state-ledger", ledger, "--emit-states", ledger)
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert "committed 0 partition state rows" in r2.stderr


def test_validate_missing_ledger_without_emit_is_named_error(
    spark, tmp_path
):
    """--state-ledger alone on a path that does not exist is a USER
    error (exit 2, named, no traceback) — without --emit-states there
    is nothing to bootstrap from (ADVICE r12)."""
    from dce_spark.sinks import write_partitioned

    df = spark.createDataFrame(
        [(1, 1.0, "a")], schema="id long, v double, day string"
    )
    out = str(tmp_path / "daily")
    write_partitioned(df, out, ["day"], files_per_partition=1)
    p = tmp_path / "c.yml"
    p.write_text(PARTITIONED.format(loc=out))

    r = run_cli("validate", str(p), "--partition-col", "day",
                "--state-ledger", str(tmp_path / "no_such_ledger"))
    assert r.returncode == 2, r.stdout + r.stderr
    assert "does not exist" in r.stderr
    assert "--emit-states" in r.stderr
    assert "Traceback" not in r.stderr


def test_validate_zone_cols_against_zoneless_ledger_is_named_error(
    spark, tmp_path
):
    """Adding --zone-cols against an existing ZONELESS ledger must be a
    named exit-2 error, not an AnalysisException traceback — a silent
    NULL-backfilled union would let prunable_partitions treat unknown
    zones as provably-empty ones, and a raw parquet append would leave
    mixed schemas that drop the zone columns on read (ADVICE r12)."""
    from dce_spark.sinks import write_partitioned

    rows = [(i, 1.0 * i, "a") for i in range(5)]
    df = spark.createDataFrame(rows, schema="id long, v double, day string")
    out = str(tmp_path / "daily")
    write_partitioned(df, out, ["day"], files_per_partition=1)
    ledger = str(tmp_path / "ledger")
    p = tmp_path / "c.yml"
    p.write_text(PARTITIONED.format(loc=out))

    r1 = run_cli("validate", str(p), "--partition-col", "day",
                 "--emit-states", ledger)  # zoneless commit
    assert r1.returncode == 0, r1.stdout + r1.stderr

    # new partition arrives; the re-run now asks for zone columns
    more = spark.createDataFrame(
        [(20 + i, 50.0, "b") for i in range(5)],
        schema="id long, v double, day string",
    )
    write_partitioned(more, out, ["day"], files_per_partition=1,
                      mode="append")
    r2 = run_cli("validate", str(p), "--partition-col", "day",
                 "--state-ledger", ledger, "--emit-states", ledger,
                 "--zone-cols", "v")
    assert r2.returncode == 2, r2.stdout + r2.stderr
    assert "schema mismatch" in r2.stderr
    assert "__zmin__v" in r2.stderr
    assert "Traceback" not in r2.stderr
    # and the refusal left the committed ledger untouched (1 row, no
    # zone columns)
    st = spark.read.parquet(ledger)
    assert st.count() == 1
    assert "__zmin__v" not in st.columns




def _json_loads_first(s):
    import json as _j

    return _j.loads(s[s.index("{"):])



def test_prune_verb_round_trip(spark, tmp_path):
    """The zero-I/O story at the CLI surface (VERDICT r12 missing #2):
    emit zone columns with validate --zone-cols, then `dce prune` lists
    exactly the partitions the committed zones prove empty for a
    predicate — including the NULL-zone conservative case (a partition
    whose values are all NULL satisfies no inequality, so it is
    skippable for every op) — with zero reads of the data itself."""
    from dce_spark.sinks import write_partitioned

    rows = [(i, 1.0 * i, "a") for i in range(5)]          # v in [0, 4]
    rows += [(10 + i, 50.0 + i, "b") for i in range(5)]   # v in [50, 54]
    rows += [(20 + i, None, "c") for i in range(5)]       # all-NULL zone
    df = spark.createDataFrame(rows, schema="id long, v double, day string")
    out = str(tmp_path / "daily")
    write_partitioned(df, out, ["day"], files_per_partition=1)
    ledger = str(tmp_path / "ledger")
    p = tmp_path / "c.yml"
    p.write_text(PARTITIONED.format(loc=out))

    r = run_cli("validate", str(p), "--partition-col", "day",
                "--emit-states", ledger, "--zone-cols", "v")
    assert r.returncode == 0, r.stdout + r.stderr

    # delete the DATA: the prune verb must still answer (ledger-only)
    import shutil

    shutil.rmtree(out)

    # v >= 10 is provably empty in a (zmax 4 < 10) and c (NULL zones)
    r1 = run_cli("prune", ledger, "--partition-col", "day",
                 "--where", "v >= 10")
    assert r1.returncode == 0, r1.stdout + r1.stderr
    assert r1.stdout.split() == ["a", "c"]
    assert "2 of 3 partitions provably empty" in r1.stderr

    # v < 55 excludes NOTHING with values (a and b both intersect) but
    # still skips the all-NULL partition — the conservative direction
    r2 = run_cli("prune", ledger, "--partition-col", "day",
                 "--where", "v < 55", "--format", "json")
    assert r2.returncode == 0, r2.stdout + r2.stderr
    import json as _json

    doc = _json.loads(r2.stdout)
    assert doc["prunable"] == ["c"]
    assert doc["total_partitions"] == 3
    assert doc["predicate"] == {"field": "v", "op": "<", "value": 55}

    # --invert prints the complement: the list a scan planner feeds
    # straight into its partition filter
    ri = run_cli("prune", ledger, "--partition-col", "day",
                 "--where", "v >= 10", "--invert")
    assert ri.returncode == 0, ri.stdout + ri.stderr
    assert ri.stdout.split() == ["b"]
    assert "printing the scan list" in ri.stderr
    ri2 = run_cli("prune", ledger, "--partition-col", "day",
                  "--where", "v >= 10", "--invert", "--format", "json")
    doc_i = _json_loads_first(ri2.stdout)
    assert doc_i["scan"] == ["b"] and "prunable" not in doc_i

    # boundary: v >= 54 keeps b in play (zmax == 54 can match)
    r3 = run_cli("prune", ledger, "--partition-col", "day",
                 "--where", "v >= 54")
    assert r3.returncode == 0
    assert r3.stdout.split() == ["a", "c"]
    # ... but v > 54 proves b empty too
    r4 = run_cli("prune", ledger, "--partition-col", "day",
                 "--where", "v > 54")
    assert r4.returncode == 0
    assert r4.stdout.split() == ["a", "b", "c"]


def test_prune_verb_named_errors(tmp_path, spark):
    """Bad --where, a zoneless ledger, and a missing ledger path are
    named exit-2 errors, never tracebacks."""
    from dce_spark.sinks import write_partitioned

    df = spark.createDataFrame(
        [(1, 1.0, "a")], schema="id long, v double, day string"
    )
    out = str(tmp_path / "daily")
    write_partitioned(df, out, ["day"], files_per_partition=1)
    ledger = str(tmp_path / "ledger")
    p = tmp_path / "c.yml"
    p.write_text(PARTITIONED.format(loc=out))
    r0 = run_cli("validate", str(p), "--partition-col", "day",
                 "--emit-states", ledger)  # no --zone-cols
    assert r0.returncode == 0, r0.stdout + r0.stderr

    r1 = run_cli("prune", ledger, "--partition-col", "day",
                 "--where", "v != 3")
    assert r1.returncode == 2
    assert "cannot parse --where" in r1.stderr
    assert "Traceback" not in r1.stderr

    r2 = run_cli("prune", ledger, "--partition-col", "day",
                 "--where", "v < 3")
    assert r2.returncode == 2
    assert "no zone column" in r2.stderr
    assert "Traceback" not in r2.stderr

    r3 = run_cli("prune", str(tmp_path / "nope"), "--partition-col",
                 "day", "--where", "v < 3")
    assert r3.returncode == 2
    assert "does not exist" in r3.stderr
    assert "Traceback" not in r3.stderr

    r4 = run_cli("prune", ledger, "--partition-col", "not_a_col",
                 "--where", "v < 3")
    assert r4.returncode == 2
    assert "partition column" in r4.stderr
    assert "Traceback" not in r4.stderr


def test_states_verb_inspects_ledger(spark, tmp_path):
    """dce states is the read face of the lifecycle: per partition it
    reports the batch-row count and the merged state view (zone
    spans, freshness) from the ledger alone — the DATA is deleted
    before the call, proving zero data I/O. JSON carries the full
    merged rows + the state-column census; named exit-2 errors for a
    missing path and a wrong partition column; the ledger on disk is
    untouched (read-only)."""
    import json as _json
    import shutil

    from dce_spark.api import partition_states
    from dce_spark.sinks import write_partitioned

    rows1 = [(i, 1.0 * i, d) for i, d in enumerate(["a"] * 3 + ["b"] * 3)]
    rows2 = [(50 + i, 40.0 + i, d)
             for i, d in enumerate(["a"] * 3 + ["b"] * 3)]
    df1 = spark.createDataFrame(rows1, schema="id long, v double, day string")
    df2 = spark.createDataFrame(rows2, schema="id long, v double, day string")
    out = str(tmp_path / "daily")
    write_partitioned(df1.unionByName(df2), out, ["day"],
                      files_per_partition=1)
    p = tmp_path / "c.yml"
    p.write_text(PARTITIONED.format(loc=out))
    ledger = str(tmp_path / "ledger")
    for batch in (df1, df2):
        st = partition_states(spark, batch, p.read_text(), "day",
                              zones=["v"])
        spark.createDataFrame(st.collect(), st.schema).write.mode(
            "append"
        ).parquet(ledger)
    n_ledger_rows = spark.read.parquet(ledger).count()
    assert n_ledger_rows == 4  # 2 days x 2 batches

    shutil.rmtree(out)  # the verb must answer from the ledger alone

    r = run_cli("states", ledger, "--partition-col", "day")
    assert r.returncode == 0, r.stdout + r.stderr
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 2
    assert lines[0].startswith("a ") and "batches=2" in lines[0]
    # day a saw v in {0,1,2} then {40,41,42}: merged zone [0.0, 42.0]
    assert "v=[0.0, 42.0]" in lines[0]
    assert lines[1].startswith("b ") and "batches=2" in lines[1]
    assert "v=[3.0, 45.0]" in lines[1]
    assert "2 partitions, 4 state rows" in r.stderr

    rj = run_cli("states", ledger, "--partition-col", "day",
                 "--format", "json")
    assert rj.returncode == 0, rj.stdout + rj.stderr
    doc = _json.loads(rj.stdout)
    assert doc["n_partitions"] == 2 and doc["n_state_rows"] == 4
    assert doc["state_columns_by_family"]["__zmin__"] == 1
    assert doc["state_columns_by_family"]["__zmax__"] == 1
    parts = {d["day"]: d for d in doc["partitions"]}
    assert parts["a"]["n_batches"] == 2
    assert parts["a"]["__zmin__v"] == 0.0
    assert parts["a"]["__zmax__v"] == 42.0

    # read-only: the ledger is bit-identical (still the 4 raw rows)
    assert spark.read.parquet(ledger).count() == n_ledger_rows

    # named errors
    re1 = run_cli("states", str(tmp_path / "nope"),
                  "--partition-col", "day")
    assert re1.returncode == 2 and "does not exist" in re1.stderr
    re2 = run_cli("states", ledger, "--partition-col", "nope")
    assert re2.returncode == 2 and "partition column" in re2.stderr
    assert "Traceback" not in re1.stderr + re2.stderr


def test_prune_multi_predicate_conjunction(spark, tmp_path):
    """--where is repeatable with AND semantics: the skip list is the
    UNION of per-conjunct proofs — a partition where ANY conjunct is
    provably empty yields zero rows for the conjunction. Attribution
    per conjunct in the JSON shape; the single-predicate JSON shape
    is unchanged; a wrong-typed second conjunct still fails loudly."""
    import json as _json

    from dce_spark.api import partition_states
    from dce_spark.sinks import write_partitioned

    # day a: v in [0, 4];  day b: v in [50, 54];  day c: v in [200, 204]
    rows = (
        [(i, 0.0 + i, "a") for i in range(5)]
        + [(10 + i, 50.0 + i, "b") for i in range(5)]
        + [(20 + i, 200.0 + i, "c") for i in range(5)]
    )
    df = spark.createDataFrame(rows, schema="id long, v double, day string")
    out = str(tmp_path / "daily")
    write_partitioned(df, out, ["day"], files_per_partition=1)
    p = tmp_path / "c.yml"
    p.write_text(PARTITIONED.format(loc=out))
    ledger = str(tmp_path / "ledger")
    st = partition_states(spark, df, p.read_text(), "day", zones=["v"])
    spark.createDataFrame(st.collect(), st.schema).write.parquet(ledger)

    # conjunct 1 (v >= 100) proves a and b empty; conjunct 2 (v < 60)
    # proves c empty -> the AND query can skip ALL THREE partitions
    r = run_cli("prune", ledger, "--partition-col", "day",
                "--where", "v >= 100", "--where", "v < 60",
                "--format", "json")
    assert r.returncode == 0, r.stdout + r.stderr
    doc = _json.loads(r.stdout)
    assert doc["semantics"] == "and" and "predicate" not in doc
    assert doc["prunable"] == ["a", "b", "c"]
    by = {(d["field"], d["op"], d["value"]): d["proves"]
          for d in doc["predicates"]}
    assert by[("v", ">=", 100)] == ["a", "b"]
    assert by[("v", "<", 60)] == ["c"]
    assert "v >= 100 AND v < 60" in r.stderr

    # a conjunct that proves NOTHING still lets the other's proof
    # stand (any-conjunct semantics), and --invert complements
    r2 = run_cli("prune", ledger, "--partition-col", "day",
                 "--where", "v >= 100", "--where", "v >= 0",
                 "--invert")
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert r2.stdout.split() == ["c"]

    # single-predicate JSON shape unchanged (round-13 contract)
    r3 = run_cli("prune", ledger, "--partition-col", "day",
                 "--where", "v >= 100", "--format", "json")
    doc3 = _json.loads(r3.stdout)
    assert doc3["predicate"] == {"field": "v", "op": ">=", "value": 100}
    assert "predicates" not in doc3 and "semantics" not in doc3

    # a wrong-typed SECOND conjunct is a named exit-2 error
    r4 = run_cli("prune", ledger, "--partition-col", "day",
                 "--where", "v >= 100", "--where", "v < '60'")
    assert r4.returncode == 2
    assert "numeric type" in r4.stderr
    assert "Traceback" not in r4.stderr


def test_compact_verb_round_trip(spark, tmp_path):
    """dce compact collapses an append-style ledger (one row per
    (partition, batch)) to one row per partition IN PLACE, the served
    validation report is bit-identical before and after, zones
    survive so `dce prune` answers the same, and compacting twice is
    a no-op. Named exit-2 errors for a missing path and a wrong
    partition column."""
    from dce_spark.api import partition_states
    from dce_spark.sinks import write_partitioned

    rows1 = [(i, 1.0 * i, d) for i, d in enumerate(["a"] * 5 + ["b"] * 5)]
    rows2 = [(100 + i, 40.0 + i, d)
             for i, d in enumerate(["a"] * 5 + ["b"] * 5)]
    df1 = spark.createDataFrame(rows1, schema="id long, v double, day string")
    df2 = spark.createDataFrame(rows2, schema="id long, v double, day string")
    out = str(tmp_path / "daily")
    write_partitioned(df1.unionByName(df2), out, ["day"],
                      files_per_partition=1)
    p = tmp_path / "c.yml"
    p.write_text(PARTITIONED.format(loc=out))
    contract = p.read_text()

    # append-style ledger: two DISJOINT batch covers per partition
    ledger = str(tmp_path / "ledger")
    for batch in (df1, df2):
        st = partition_states(spark, batch, contract, "day", zones=["v"])
        spark.createDataFrame(st.collect(), st.schema).write.mode(
            "append"
        ).parquet(ledger)
    assert spark.read.parquet(ledger).count() == 4  # 2 days x 2 batches

    r0 = run_cli("validate", str(p), "--partition-col", "day",
                 "--state-ledger", ledger, "--format", "json")
    assert r0.returncode == 0, r0.stdout + r0.stderr

    rc = run_cli("compact", ledger, "--partition-col", "day")
    assert rc.returncode == 0, rc.stdout + rc.stderr
    assert "compacted 4 state rows -> 2" in rc.stderr
    assert "Traceback" not in rc.stderr
    st2 = spark.read.parquet(ledger)
    assert st2.count() == 2
    assert "__zmin__v" in st2.columns  # zones survive

    # served report identical before and after compaction
    r1 = run_cli("validate", str(p), "--partition-col", "day",
                 "--state-ledger", ledger, "--format", "json")
    assert r1.returncode == 0, r1.stdout + r1.stderr

    def strip_wallclock(rep):
        for part in rep.values():
            part["stats"].pop("duration_ms", None)
        return rep

    assert strip_wallclock(json.loads(r1.stdout)) == strip_wallclock(
        json.loads(r0.stdout)
    )

    # prune still proves the same emptiness from the compacted zones
    rp = run_cli("prune", ledger, "--partition-col", "day",
                 "--where", "v >= 100")
    assert rp.returncode == 0
    assert rp.stdout.split() == ["a", "b"]

    # idempotent
    rc2 = run_cli("compact", ledger, "--partition-col", "day")
    assert rc2.returncode == 0
    assert "compacted 2 state rows -> 2" in rc2.stderr

    # named errors
    re1 = run_cli("compact", str(tmp_path / "nope"),
                  "--partition-col", "day")
    assert re1.returncode == 2 and "does not exist" in re1.stderr
    re2 = run_cli("compact", ledger, "--partition-col", "nope")
    assert re2.returncode == 2 and "partition column" in re2.stderr
    assert "Traceback" not in re1.stderr + re2.stderr


def test_compact_in_place_is_temp_swapped(spark, tmp_path):
    """The in-place overwrite is write-to-temp-then-rename (round-13
    verdict): the replacement ledger is fully written to a *.compact-tmp
    sibling before the committed path is touched, so a crash at any
    point leaves a complete ledger on disk. Black-box observables:
    stale *.compact-tmp / *.compact-old leftovers from a prior crash
    are cleaned up and compaction still succeeds; a successful run
    leaves no temp siblings; --output to a fresh path is a plain
    direct write that never touches the input ledger."""
    import os

    from dce_spark.api import partition_states
    from dce_spark.sinks import write_partitioned

    rows1 = [(i, 1.0 * i, d) for i, d in enumerate(["a"] * 3 + ["b"] * 3)]
    rows2 = [(50 + i, 20.0 + i, d)
             for i, d in enumerate(["a"] * 3 + ["b"] * 3)]
    df1 = spark.createDataFrame(rows1, schema="id long, v double, day string")
    df2 = spark.createDataFrame(rows2, schema="id long, v double, day string")
    out = str(tmp_path / "daily")
    write_partitioned(df1.unionByName(df2), out, ["day"],
                      files_per_partition=1)
    p = tmp_path / "c.yml"
    p.write_text(PARTITIONED.format(loc=out))
    contract = p.read_text()

    ledger = str(tmp_path / "ledger")
    for batch in (df1, df2):
        st = partition_states(spark, batch, contract, "day", zones=["v"])
        spark.createDataFrame(st.collect(), st.schema).write.mode(
            "append"
        ).parquet(ledger)

    # simulate a prior mid-swap crash: both temp siblings left behind
    for suffix in (".compact-tmp", ".compact-old"):
        os.makedirs(ledger + suffix, exist_ok=True)
        with open(ledger + suffix + "/garbage.bin", "w") as fh:
            fh.write("leftover from a killed compact")

    rc = run_cli("compact", ledger, "--partition-col", "day")
    assert rc.returncode == 0, rc.stdout + rc.stderr
    assert "compacted 4 state rows -> 2" in rc.stderr
    # the swap landed and cleaned up after itself — no temp siblings
    assert not os.path.exists(ledger + ".compact-tmp")
    assert not os.path.exists(ledger + ".compact-old")
    assert spark.read.parquet(ledger).count() == 2

    # --output to a fresh path: direct write, input ledger untouched,
    # and no temp siblings appear next to either path
    dest = str(tmp_path / "compacted_out")
    rc2 = run_cli("compact", ledger, "--partition-col", "day",
                  "--output", dest)
    assert rc2.returncode == 0, rc2.stdout + rc2.stderr
    assert spark.read.parquet(dest).count() == 2
    assert spark.read.parquet(ledger).count() == 2
    for base in (ledger, dest):
        assert not os.path.exists(base + ".compact-tmp")
        assert not os.path.exists(base + ".compact-old")


def test_prune_where_type_mismatch_named_error(spark, tmp_path):
    """A --where value whose parsed type contradicts the ledger's zone
    dtype is a NAMED exit-2 error (round-13 verdict): a quoted string
    against a numeric zone (or a numeric literal against a string
    zone) would otherwise fall into Spark implicit-cast semantics and
    could never prove emptiness soundly."""
    from dce_spark.api import partition_states
    from dce_spark.sinks import write_partitioned

    rows = [(i, 1.0 * i, "a") for i in range(4)]
    df = spark.createDataFrame(rows, schema="id long, v double, day string")
    out = str(tmp_path / "daily")
    write_partitioned(df, out, ["day"], files_per_partition=1)
    p = tmp_path / "c.yml"
    p.write_text(PARTITIONED.format(loc=out))

    ledger = str(tmp_path / "ledger")
    st = partition_states(spark, df, p.read_text(), "day", zones=["v"])
    spark.createDataFrame(st.collect(), st.schema).write.parquet(ledger)

    # quoted string vs the double zone column: named error, exit 2
    r1 = run_cli("prune", ledger, "--partition-col", "day",
                 "--where", "v < '10'")
    assert r1.returncode == 2, r1.stdout + r1.stderr
    assert "numeric type" in r1.stderr and "__zmin__v" in r1.stderr
    assert "Traceback" not in r1.stderr
    # the unquoted numeric form the error message suggests still works
    r2 = run_cli("prune", ledger, "--partition-col", "day",
                 "--where", "v < 10")
    assert r2.returncode == 0, r2.stdout + r2.stderr

    # string zone column: a numeric literal is the mismatch direction
    sledger = str(tmp_path / "sledger")
    spark.createDataFrame(
        [("a", "x", "y"), ("b", "m", "z")],
        schema="day string, __zmin__s string, __zmax__s string",
    ).write.parquet(sledger)
    r3 = run_cli("prune", sledger, "--partition-col", "day",
                 "--where", "s < 5")
    assert r3.returncode == 2, r3.stdout + r3.stderr
    assert "type string" in r3.stderr
    assert "Traceback" not in r3.stderr
    # the quoted form the error message suggests works: zmin 'x' >= 'w'
    # proves day a empty for s < 'w'
    r4 = run_cli("prune", sledger, "--partition-col", "day",
                 "--where", "s < 'w'")
    assert r4.returncode == 0, r4.stdout + r4.stderr
    assert r4.stdout.split() == ["a"]


def test_missing_ledger_names_compact_survivors(spark, tmp_path):
    """A crash BETWEEN dce compact's two renames leaves no ledger at
    the committed path — but the original survives whole at
    *.compact-old and the replacement at *.compact-tmp (round-14
    verdict nit). The does-not-exist error on every lifecycle verb
    must NAME the survivors and show the recovery rename, instead of
    leaving recovery to folklore; a plain missing path (no siblings)
    keeps the plain message."""
    import os
    import shutil

    ledger = str(tmp_path / "ledger")
    spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], schema="day string, __zmin__v double"
    ).write.parquet(ledger)

    # simulate the mid-swap crash: original renamed away, replacement
    # fully written — nothing at the committed path
    shutil.copytree(ledger, ledger + ".compact-tmp")
    os.rename(ledger, ledger + ".compact-old")
    assert not os.path.exists(ledger)

    for verb in ("states", "prune", "compact"):
        extra = (
            ("--where", "v < 100") if verb == "prune" else ()
        )
        r = run_cli(verb, ledger, "--partition-col", "day", *extra)
        assert r.returncode == 2, (verb, r.stdout, r.stderr)
        assert "does not exist" in r.stderr, verb
        assert "crashed mid-swap" in r.stderr, verb
        assert ledger + ".compact-old" in r.stderr, verb
        assert ledger + ".compact-tmp" in r.stderr, verb
        assert f"mv {ledger}.compact-tmp {ledger}" in r.stderr, verb
        assert "Traceback" not in r.stderr, verb

    # the named recovery actually works: rename the replacement into
    # place and the verb answers
    os.rename(ledger + ".compact-tmp", ledger)
    ok = run_cli("states", ledger, "--partition-col", "day")
    assert ok.returncode == 0, ok.stdout + ok.stderr

    # a missing path with NO survivors keeps the plain message
    plain = run_cli("states", str(tmp_path / "nope"),
                    "--partition-col", "day")
    assert plain.returncode == 2
    assert "does not exist" in plain.stderr
    assert "crashed mid-swap" not in plain.stderr


def test_states_text_tolerates_unpaired_zone_bound(spark, tmp_path):
    """compact_state_ledger accepts a hand-built ledger carrying
    __zmin__X without __zmax__X (each bound column has its own valid
    merge rule), so the states text renderer must too (round-14
    advice nit): the span prints only when both bounds exist, a lone
    bound prints as an inequality — never a KeyError traceback."""
    ledger = str(tmp_path / "ledger")
    spark.createDataFrame(
        [("a", 1.0, 9.5), ("a", 0.5, 7.0), ("b", 3.0, 8.0)],
        schema="day string, __zmin__v double, __zmax__w double",
    ).write.parquet(ledger)

    r = run_cli("states", ledger, "--partition-col", "day")
    assert r.returncode == 0, r.stdout + r.stderr
    assert "Traceback" not in r.stderr
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 2
    # v has only a lower bound (min-merged), w only an upper
    # (max-merged): inequalities, not spans
    assert lines[0].startswith("a ")
    assert "v>=0.5" in lines[0] and "w<=9.5" in lines[0]
    assert lines[1].startswith("b ")
    assert "v>=3.0" in lines[1] and "w<=8.0" in lines[1]
    # the paired case still prints the span form
    paired = str(tmp_path / "paired")
    spark.createDataFrame(
        [("a", 1.0, 2.0)],
        schema="day string, __zmin__v double, __zmax__v double",
    ).write.parquet(paired)
    rp = run_cli("states", paired, "--partition-col", "day")
    assert rp.returncode == 0, rp.stdout + rp.stderr
    assert "v=[1.0, 2.0]" in rp.stdout
