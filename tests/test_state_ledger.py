"""The mergeable-state ledger API (round 11, verdict item 4): the
merge-path report — evaluated from committed per-partition states —
must equal the row-path report bit-for-bit, on the events table, for
every partition and for the merged table-level report. Plus the refusal
contract for checks that have no mergeable state."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from pyspark.sql import functions as F

from dce_spark.api import partition_states, validate_df, validate_partitions
from dce_spark.data import load_table
from dce_spark.state import merge_state_rows, report_from_states

from conftest import SF_DIR

# a fully MERGEABLE contract over events: nullability, allowed-values,
# range, completeness, freshness — no uniqueness/leakage/custom
MERGEABLE_CONTRACT = """
version: "1.0.0"
name: events-mergeable
owner: data-eng
description: mergeable-state ledger test contract

schema:
  format: parquet
  location: /dev/null
  fields:
    - name: event_id
      type: int64
      nullable: false
    - name: user_id
      type: int64
      nullable: false
    - name: event_type
      type: string
      nullable: false
      constraints:
        - type: allowedvalues
          values: [view, click, purchase, signup, error]
    - name: value
      type: float64
      constraints:
        - type: range
          min: -1000000
          max: 1000000
    - name: ts
      type: timestamp

quality_checks:
  completeness:
    threshold: 0.99
    fields: [event_id, user_id, event_type]
  freshness:
    metric: ts
    max_delay: 36500d
"""

NOW = datetime(2026, 1, 1, tzinfo=timezone.utc)


def _events_by_day(spark):
    return load_table(spark, SF_DIR, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )


def _report_key(rep):
    """Everything that defines a report apart from wall-clock
    duration: checks (all fields), errors, warnings, stats."""
    return (
        rep.passed,
        tuple(rep.errors),
        tuple(rep.warnings),
        tuple(
            (c.name, c.category, c.passed, c.severity, c.field,
             tuple(sorted(c.observed.items())), c.threshold, c.message)
            for c in rep.checks
        ),
        (rep.stats.records_validated, rep.stats.fields_checked,
         rep.stats.constraints_evaluated),
    )


def test_merge_path_equals_row_path_per_partition(spark):
    """validate_partitions(state_ledger=...) must return, for every
    partition, a report identical to the row path's."""
    ev = _events_by_day(spark)
    ledger = partition_states(spark, ev, MERGEABLE_CONTRACT, "day", now=NOW)
    by_rows = validate_partitions(
        spark, ev, MERGEABLE_CONTRACT, "day", now=NOW
    )
    by_state = validate_partitions(
        spark, ev, MERGEABLE_CONTRACT, "day", state_ledger=ledger, now=NOW
    )
    assert sorted(by_rows) == sorted(by_state)
    assert len(by_rows) > 1  # non-vacuous: multiple partitions
    for v in by_rows:
        assert _report_key(by_rows[v]) == _report_key(by_state[v]), v
    spark.catalog.clearCache()


def test_merged_states_equal_full_table_report(spark):
    """Merging ALL partition states must reproduce validate_df on the
    whole table — the merged == recomputed contract of SCALING.md §8c,
    now at the API level."""
    ev = _events_by_day(spark)
    states = partition_states(spark, ev, MERGEABLE_CONTRACT, "day", now=NOW)
    merged_rep = report_from_states(
        spark, states, MERGEABLE_CONTRACT, ev, now=NOW
    )
    row_rep = validate_df(spark, ev, MERGEABLE_CONTRACT, now=NOW)
    assert _report_key(merged_rep) == _report_key(row_rep)
    assert merged_rep.stats.records_validated == ev.count()
    spark.catalog.clearCache()


def test_ledger_covers_known_partitions_without_rescan(spark):
    """Partitions present in the ledger are served from it: corrupt
    the underlying frame for those partitions and the state-path
    report must NOT notice (proof no row scan happened), while a
    partition missing from the ledger is computed from rows."""
    ev = _events_by_day(spark)
    days = sorted(
        r["day"] for r in ev.select("day").distinct().collect()
    )
    committed_days = days[:-1]
    ledger = partition_states(
        spark,
        ev.filter(F.col("day").isin(committed_days)),
        MERGEABLE_CONTRACT,
        "day",
        now=NOW,
    )
    # poison event_type outside the allowed set for EVERY row; only the
    # uncommitted day should see violations
    poisoned = ev.withColumn("event_type", F.lit("poisoned"))
    by_state = validate_partitions(
        spark, poisoned, MERGEABLE_CONTRACT, "day",
        state_ledger=ledger, now=NOW,
    )
    for d in committed_days:
        allowed = [
            c for c in by_state[d].checks
            if c.name.startswith("constraints.allowedvalues")
        ]
        assert allowed and all(c.passed for c in allowed), d
    fresh_day = days[-1]
    allowed = [
        c for c in by_state[fresh_day].checks
        if c.name.startswith("constraints.allowedvalues")
    ]
    assert allowed and not any(c.passed for c in allowed)
    spark.catalog.clearCache()


def test_non_mergeable_checks_refused_loudly(spark):
    """uniqueness has no mergeable state: both the state computation
    and the report evaluation must raise unless allow_partial=True,
    and the partial report must record the skip in warnings."""
    ev = _events_by_day(spark)
    with_uniq = MERGEABLE_CONTRACT + """
  uniqueness:
    fields: [event_id]
"""
    with pytest.raises(ValueError, match="uniqueness"):
        partition_states(spark, ev, with_uniq, "day", now=NOW)
    states = partition_states(
        spark, ev, with_uniq, "day", now=NOW, allow_partial=True
    )
    rep = report_from_states(
        spark, states, with_uniq, ev, now=NOW, allow_partial=True
    )
    assert any("uniqueness" in w for w in rep.warnings)
    assert not any("uniqueness" in c.name for c in rep.checks)
    spark.catalog.clearCache()


def test_merge_state_rows_exact_arithmetic():
    """Pure merge semantics: sums are exact int addition with NULL as
    identity; freshness is a NULL-skipping max; the partition column
    is dropped."""
    rows = [
        {"day": "a", "__total__": 2, "__null__x": 1, "__fresh__ts": 10},
        {"day": "b", "__total__": 3, "__null__x": None, "__fresh__ts": None},
        {"day": "c", "__total__": 5, "__null__x": 4, "__fresh__ts": 7},
    ]
    m = merge_state_rows(rows)
    assert m == {"__total__": 10, "__null__x": 5, "__fresh__ts": 10}


def test_state_plan_is_scalable(spark):
    """The ledger computation itself must hold the catalog bar: no
    cartesian, no row-at-a-time Python, bounded exchanges (one grouped
    aggregate = one shuffle)."""
    from dce_spark.planaudit import assert_scalable, audit

    ev = _events_by_day(spark)
    states = partition_states(spark, ev, MERGEABLE_CONTRACT, "day", now=NOW)
    assert_scalable(states)
    assert audit(states).shuffle_exchanges <= 1
    spark.catalog.clearCache()


def test_absent_partition_equals_row_path(spark):
    """A requested partition value absent from BOTH the ledger and the
    data must produce the same report as the row path's validate_df
    over the empty filter (round-11 review fix: this used to
    KeyError on the ledger path)."""
    ev = _events_by_day(spark)
    ghost = "1970-01-01"
    ledger = partition_states(spark, ev, MERGEABLE_CONTRACT, "day", now=NOW)
    by_rows = validate_partitions(
        spark, ev, MERGEABLE_CONTRACT, "day", values=[ghost], now=NOW
    )
    by_state = validate_partitions(
        spark, ev, MERGEABLE_CONTRACT, "day", values=[ghost],
        state_ledger=ledger, now=NOW,
    )
    assert list(by_rows) == [ghost] and list(by_state) == [ghost]
    assert by_state[ghost].stats.records_validated == 0
    assert _report_key(by_rows[ghost]) == _report_key(by_state[ghost])
    spark.catalog.clearCache()


def test_kwarg_routing_raises_named_errors(spark):
    """Row-path-only options with state_ledger=, and allow_partial
    without it, must raise a ValueError naming the problem — not a
    TypeError from an inner signature."""
    ev = _events_by_day(spark)
    ledger = partition_states(spark, ev, MERGEABLE_CONTRACT, "day", now=NOW)
    with pytest.raises(ValueError, match="row-path-only"):
        validate_partitions(
            spark, ev, MERGEABLE_CONTRACT, "day",
            state_ledger=ledger, sample_size=10, now=NOW,
        )
    with pytest.raises(ValueError, match="allow_partial"):
        validate_partitions(
            spark, ev, MERGEABLE_CONTRACT, "day",
            allow_partial=True, now=NOW,
        )
    spark.catalog.clearCache()


def test_strict_stage0_failure_stats_match_row_path(spark):
    """Strict mode + a stage-0 presence failure: the compiler builds
    only the schema-category probes, so the merge path's stats must
    count the same truncated set (round-11 review fix)."""
    ev = _events_by_day(spark)
    with_ghost = MERGEABLE_CONTRACT.replace(
        "    - name: ts\n      type: timestamp",
        "    - name: ts\n      type: timestamp\n"
        "    - name: ghost_col\n      type: int64\n      nullable: false",
    )
    assert "ghost_col" in with_ghost  # the replace anchored
    states = partition_states(spark, ev, with_ghost, "day", now=NOW)
    merged_rep = report_from_states(
        spark, states, with_ghost, ev, strict=True, now=NOW
    )
    row_rep = validate_df(spark, ev, with_ghost, strict=True, now=NOW)
    assert not row_rep.passed  # stage-0 presence failure fired
    assert _report_key(merged_rep) == _report_key(row_rep)
    spark.catalog.clearCache()


def test_stale_ledger_fails_loudly(spark):
    """A POPULATED ledger committed under contract v1 must raise a
    named error when evaluated under a v2 contract that needs aliases
    the states never computed — silent padding would report checks as
    passed over rows that were never checked (round-11 second-pass
    review fix)."""
    ev = _events_by_day(spark)
    v1_ledger = partition_states(
        spark, ev, MERGEABLE_CONTRACT, "day", now=NOW
    )
    v2 = MERGEABLE_CONTRACT.replace(
        "    - name: ts\n      type: timestamp",
        "    - name: ts\n      type: timestamp\n"
        "      constraints:\n"
        "        - type: range\n"
        "          min: 0\n"
        "          max: 99999999999",
    )
    assert v2 != MERGEABLE_CONTRACT  # the replace anchored
    with pytest.raises(ValueError, match="missing aliases"):
        report_from_states(spark, v1_ledger, v2, ev, now=NOW)
    with pytest.raises(ValueError, match="missing aliases"):
        validate_partitions(
            spark, ev, v2, "day", state_ledger=v1_ledger, now=NOW
        )
    spark.catalog.clearCache()


def test_append_style_ledger_merges_per_partition(spark):
    """A partition holding SEVERAL ledger rows (append-style ledgers:
    one state row per arriving batch) must be evaluated from the merge
    of all of them — not from whichever row collect() returned last
    (round-12 ADVICE fix). Two disjoint batch covers per day, unioned
    into one ledger, must reproduce the row path exactly."""
    ev = _events_by_day(spark)
    batch_a = ev.filter(F.col("event_id") % 2 == 0)
    batch_b = ev.filter(F.col("event_id") % 2 == 1)
    ledger = partition_states(
        spark, batch_a, MERGEABLE_CONTRACT, "day", now=NOW
    ).unionByName(
        partition_states(spark, batch_b, MERGEABLE_CONTRACT, "day", now=NOW)
    )
    days = sorted(r["day"] for r in ev.select("day").distinct().collect())
    assert ledger.groupBy("day").count().filter("count = 2").count() == len(
        days
    )  # non-vacuous: every day has two state rows
    by_rows = validate_partitions(
        spark, ev, MERGEABLE_CONTRACT, "day", now=NOW
    )
    # poison the frame so any row-scan fallback for a ledger-covered
    # partition becomes visible
    poisoned = ev.withColumn("event_type", F.lit("poisoned"))
    by_state = validate_partitions(
        spark, poisoned, MERGEABLE_CONTRACT, "day",
        state_ledger=ledger, now=NOW,
    )
    assert sorted(by_rows) == sorted(by_state)
    for v in by_rows:
        assert _report_key(by_rows[v]) == _report_key(by_state[v]), v
    spark.catalog.clearCache()


def test_probe_alias_contract(spark):
    """Probes carry their output aliases explicitly (round-12 ADVICE
    fix: the state path used to parse Column._jc.toString(), which is
    not a contract and absent under Spark Connect). The declared
    aliases must equal the ACTUAL column names of the computed state
    frame, and a probe with a mismatched alias list must raise."""
    from dce_spark import parser
    from dce_spark.checks.probe import AggProbe
    from dce_spark.state import _expr_aliases, mergeable_probes

    ev = _events_by_day(spark)
    c = parser.parse_str(MERGEABLE_CONTRACT)
    probes, _ = mergeable_probes(c, ev, now=NOW)
    assert probes  # non-vacuous
    declared = [a for p in probes for a in _expr_aliases(p)]
    assert len(declared) == sum(len(p.exprs) for p in probes)
    states = partition_states(spark, ev, MERGEABLE_CONTRACT, "day", now=NOW)
    assert set(states.columns) == {"day", "__total__", *declared}

    bad = AggProbe(
        name="bad", category="quality",
        exprs=[F.count(F.lit(1)).alias("__total__")],
        evaluate=lambda vals: None, aliases=[],
    )
    with pytest.raises(AssertionError, match="alias"):
        _expr_aliases(bad)
    spark.catalog.clearCache()


def test_compact_state_ledger_preserves_reports_and_is_idempotent(spark):
    """Compacting an append-style ledger (two disjoint batch covers per
    day) must preserve every per-partition report bit-for-bit, be
    idempotent, and yield exactly one row per partition; unknown
    columns are refused loudly."""
    from dce_spark.api import compact_state_ledger

    ev = _events_by_day(spark)
    raw = partition_states(
        spark, ev.filter(F.col("event_id") % 2 == 0),
        MERGEABLE_CONTRACT, "day", now=NOW,
    ).unionByName(
        partition_states(
            spark, ev.filter(F.col("event_id") % 2 == 1),
            MERGEABLE_CONTRACT, "day", now=NOW,
        )
    )
    compacted = compact_state_ledger(raw, "day")
    days = [r["day"] for r in compacted.select("day").collect()]
    assert len(days) == len(set(days)) and len(days) > 1
    by_raw = validate_partitions(
        spark, ev, MERGEABLE_CONTRACT, "day", state_ledger=raw, now=NOW
    )
    by_compact = validate_partitions(
        spark, ev, MERGEABLE_CONTRACT, "day",
        state_ledger=compacted, now=NOW,
    )
    assert sorted(by_raw) == sorted(by_compact)
    for v in by_raw:
        assert _report_key(by_raw[v]) == _report_key(by_compact[v]), v

    def rows_key(df):
        cols = sorted(df.columns)
        return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())

    assert rows_key(compact_state_ledger(compacted, "day")) == rows_key(
        compacted
    )  # idempotent

    with pytest.raises(ValueError, match="merge rule"):
        compact_state_ledger(
            raw.withColumn("__mystery__x", F.lit(1)), "day"
        )
    spark.catalog.clearCache()


def test_zone_columns_merge_compact_and_prune(spark):
    """Zone-map columns (partition_states(zones=)): exact per-partition
    min/max, append-ledger merge via group min/max, report equality
    untouched by the extra columns, compaction preserves zones, and
    prunable_partitions returns exactly the provably-empty partitions
    (verified against the data)."""
    from dce_spark.api import (
        compact_state_ledger,
        prunable_partitions,
    )

    ev = _events_by_day(spark)
    ledger = partition_states(
        spark, ev, MERGEABLE_CONTRACT, "day", now=NOW, zones=["value"]
    )
    assert "__zmin__value" in ledger.columns
    assert "__zmax__value" in ledger.columns
    # zones are the true per-day min/max
    truth = {
        r["day"]: (r["mn"], r["mx"])
        for r in ev.groupBy("day")
        .agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
        .collect()
    }
    got = {
        r["day"]: (r["__zmin__value"], r["__zmax__value"])
        for r in ledger.collect()
    }
    assert got == truth

    # reports ignore zone columns: state-path == row-path still
    by_rows = validate_partitions(
        spark, ev, MERGEABLE_CONTRACT, "day", now=NOW
    )
    by_state = validate_partitions(
        spark, ev, MERGEABLE_CONTRACT, "day",
        state_ledger=ledger, now=NOW,
    )
    for v in by_rows:
        assert _report_key(by_rows[v]) == _report_key(by_state[v]), v

    # append-style ledger: compaction recovers the same zones
    split = partition_states(
        spark, ev.filter(F.col("event_id") % 2 == 0),
        MERGEABLE_CONTRACT, "day", now=NOW, zones=["value"],
    ).unionByName(
        partition_states(
            spark, ev.filter(F.col("event_id") % 2 == 1),
            MERGEABLE_CONTRACT, "day", now=NOW, zones=["value"],
        )
    )
    compacted = compact_state_ledger(split, "day")
    got2 = {
        r["day"]: (r["__zmin__value"], r["__zmax__value"])
        for r in compacted.collect()
    }
    assert got2 == truth

    # pruning: the skip list equals the partitions with truly no match
    thr = sorted(mx for _mn, mx in truth.values())[
        len(truth) // 2
    ]  # a mid threshold so BOTH sides are non-empty
    skip = {
        r["day"]
        for r in prunable_partitions(
            split, "day", "value", ">=", thr
        ).collect()
    }
    expect_skip = {d for d, (_mn, mx) in truth.items() if mx < thr}
    assert skip == expect_skip
    assert 0 < len(skip) < len(truth)
    # soundness against the data: zero matches inside skipped days
    assert (
        ev.filter(F.col("day").isin(list(skip)))
        .filter(F.col("value") >= thr)
        .count()
        == 0
    )
    with pytest.raises(ValueError, match="zone column"):
        prunable_partitions(
            partition_states(
                spark, ev, MERGEABLE_CONTRACT, "day", now=NOW
            ),
            "day",
            "value",
            ">=",
            thr,
        )
    spark.catalog.clearCache()
