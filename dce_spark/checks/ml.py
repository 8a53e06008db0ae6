"""ML dataset checks: class balance, null-rate-by-group, temporal split,
no-overlap, target leakage, feature drift (PSI).

Design vs the reference:

- target_leakage (Pearson corr, datafusion_engine.rs:518-571) is an
  algebraic aggregate -> fused into the single-pass agg via a probe.
- class_balance (datafusion_engine.rs:575-701), null_rate_by_group
  (:950-1058), temporal_split (row-only in the reference, ml.rs:184-279)
  are grouped aggregations: one shuffle each, k-row results collected.
- no_overlap (ml.rs:92-177) is a per-split HashSet intersection in the
  reference — O(keys) driver memory, impossible at 100 TB. Here it is a
  ``groupBy(keys).agg(count_distinct(split))`` — one shuffle, fully
  distributed; the reference can't even run this check in its SQL path
  (engine.rs:184-195 skips it with a warning).
- feature_drift/PSI (datafusion_engine.rs:710-946) uses
  NTILE-over-global-ORDER-BY in the reference — a single-task sort at
  scale. We use ``approxQuantile(relativeError=0)`` (exact
  Greenwald-Khanna, distributed) for the reference-split bin
  boundaries, then one grouped count pass for both splits. Tie-handling
  at duplicate boundary values diverges from NTILE's equal-frequency
  split; convention documented in SURVEY §7.3.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from ..contract import (
    ClassBalanceCheck,
    FeatureDriftCheck,
    NoOverlapCheck,
    NullRateByGroupCheck,
    TargetLeakageCheck,
    TemporalSplitCheck,
)
from ..functions import to_timestamp_multi
from ..report import CheckResult, Severity
from .probe import AggProbe

__all__ = [
    "target_leakage_probes",
    "class_balance_check",
    "null_rate_by_group_check",
    "temporal_split_check",
    "no_overlap_check",
    "feature_drift_check",
    "psi",
]

_MIN_CORR_ROWS = 3  # reference requires n >= 3 (datafusion_engine.rs:541-545)
_PSI_EPS = 1e-6  # reference epsilon (datafusion_engine.rs:930)


# ----------------------------------------------------------------- fused


def target_leakage_probes(check: TargetLeakageCheck, df: DataFrame) -> list[AggProbe]:
    actual = set(df.columns)
    if check.target_field not in actual:
        return []
    t = F.col(check.target_field).cast("double")
    probes = []
    for feat in check.feature_fields:
        if feat not in actual or feat == check.target_field:
            continue
        f_col = F.col(feat).cast("double")
        corr_alias = f"__leak_corr__{feat}"
        n_alias = f"__leak_n__{feat}"
        exprs = [
            F.corr(f_col, t).alias(corr_alias),
            F.sum((f_col.isNotNull() & t.isNotNull()).cast("long")).alias(n_alias),
        ]

        def make_eval(feat_name: str, ca: str, na: str):
            def evaluate(vals):
                n = vals[na] or 0
                r = vals[ca]
                if n < _MIN_CORR_ROWS or r is None:
                    return CheckResult(
                        name=f"ml.target_leakage:{feat_name}",
                        category="ml",
                        passed=True,
                        field=feat_name,
                        observed={"n": n, "correlation": r},
                        message="",
                    )
                ok = abs(r) <= check.max_correlation
                return CheckResult(
                    name=f"ml.target_leakage:{feat_name}",
                    category="ml",
                    passed=ok,
                    severity=Severity.ERROR,
                    field=feat_name,
                    observed={"correlation": r, "n": n},
                    threshold=check.max_correlation,
                    message=(
                        ""
                        if ok
                        else f"feature '{feat_name}' has |corr|={abs(r):.4f} with "
                        f"target '{check.target_field}' "
                        f"(max {check.max_correlation}) — possible leakage"
                    ),
                )

            return evaluate

        probes.append(
            AggProbe(
                name=f"ml.target_leakage:{feat}",
                category="ml",
                exprs=exprs,
                evaluate=make_eval(feat, corr_alias, n_alias),
                fields=[feat],
                aliases=[corr_alias, n_alias],
            )
        )
    return probes


# --------------------------------------------------------------- grouped


def class_balance_check(check: ClassBalanceCheck, df: DataFrame) -> CheckResult:
    label = F.col(check.label_field)
    counts = (
        df.filter(label.isNotNull())
        .groupBy(label.cast("string").alias("label"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    total = sum(r["cnt"] for r in counts)
    props = {r["label"]: r["cnt"] / total for r in counts} if total else {}
    bad_max = [l for l, p in props.items() if p > check.max_proportion]
    bad_min = (
        [l for l, p in props.items() if p < check.min_proportion]
        if check.min_proportion is not None
        else []
    )
    ok = not bad_max and not bad_min
    sorted_props = dict(sorted(props.items(), key=lambda kv: (-kv[1], kv[0])))
    return CheckResult(
        name=f"ml.class_balance:{check.label_field}",
        category="ml",
        passed=ok,
        severity=Severity.ERROR,
        field=check.label_field,
        observed={"proportions": sorted_props, "total": total},
        threshold=check.max_proportion,
        message=(
            ""
            if ok
            else f"class balance violated on '{check.label_field}': "
            f"over max {check.max_proportion}: {sorted(bad_max)}; "
            f"under min {check.min_proportion}: {sorted(bad_min)}; "
            f"proportions={sorted_props}"
        ),
    )


def null_rate_by_group_check(
    check: NullRateByGroupCheck, df: DataFrame
) -> list[CheckResult]:
    """All check_fields in ONE grouped pass (the reference runs one
    query per field, datafusion_engine.rs:950-1058)."""
    actual = set(df.columns)
    fields = [f for f in check.check_fields if f in actual]
    if check.group_field not in actual or not fields:
        return []
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(F.col(f).isNull().cast("long")).alias(f"__nulls__{f}") for f in fields
    ]
    rows = (
        df.filter(F.col(check.group_field).isNotNull())
        .groupBy(F.col(check.group_field).cast("string").alias("grp"))
        .agg(*aggs)
        .collect()
    )
    results = []
    for f in fields:
        rates = {r["grp"]: (r[f"__nulls__{f}"] or 0) / r["__n"] for r in rows if r["__n"]}
        if len(rates) < 2:
            results.append(
                CheckResult(
                    name=f"ml.null_rate_by_group:{f}",
                    category="ml",
                    passed=True,
                    field=f,
                    observed={"rates": rates, "note": "fewer than 2 groups"},
                )
            )
            continue
        diff = max(rates.values()) - min(rates.values())
        ok = diff <= check.max_null_rate_diff
        results.append(
            CheckResult(
                name=f"ml.null_rate_by_group:{f}",
                category="ml",
                passed=ok,
                severity=Severity.ERROR,
                field=f,
                observed={"rates": dict(sorted(rates.items())), "diff": diff},
                threshold=check.max_null_rate_diff,
                message=(
                    ""
                    if ok
                    else f"null rate of '{f}' differs by {diff:.4f} across "
                    f"'{check.group_field}' groups (max {check.max_null_rate_diff})"
                ),
            )
        )
    return results


def temporal_split_check(check: TemporalSplitCheck, df: DataFrame) -> CheckResult:
    dtype = dict((f.name, f.dataType) for f in df.schema.fields)[check.timestamp_field]
    ts = to_timestamp_multi(F.col(check.timestamp_field), dtype)
    rows = (
        df.filter(F.col(check.split_field).isNotNull())
        .groupBy(F.col(check.split_field).cast("string").alias("split"))
        .agg(
            F.min(F.unix_timestamp(ts)).alias("min_ts"),
            F.max(F.unix_timestamp(ts)).alias("max_ts"),
        )
        .collect()
    )
    bounds = {r["split"]: (r["min_ts"], r["max_ts"]) for r in rows}
    order = check.split_order or [check.train_split, check.test_split]
    violations = []
    for earlier, later in zip(order, order[1:]):
        if earlier not in bounds or later not in bounds:
            continue  # absent splits tolerated, like the reference
        if bounds[earlier][1] is None or bounds[later][0] is None:
            continue
        if bounds[earlier][1] > bounds[later][0]:
            violations.append(
                f"max({earlier})={bounds[earlier][1]} > min({later})={bounds[later][0]}"
            )
    ok = not violations
    return CheckResult(
        name=f"ml.temporal_split:{check.timestamp_field}",
        category="ml",
        passed=ok,
        severity=Severity.ERROR,
        field=check.timestamp_field,
        observed={"bounds": {k: list(v) for k, v in sorted(bounds.items())}},
        message=(
            ""
            if ok
            else "temporal split violated: " + "; ".join(violations)
        ),
    )


def no_overlap_check(check: NoOverlapCheck, df: DataFrame) -> CheckResult:
    actual = set(df.columns)
    keys = [k for k in check.key_fields if k in actual]
    if not keys or check.split_field not in actual:
        return CheckResult(
            name="ml.no_overlap",
            category="ml",
            passed=True,
            observed={"note": "fields missing"},
        )
    overlaps = (
        df.filter(F.col(check.split_field).isNotNull())
        .groupBy(*[F.col(k) for k in keys])
        .agg(
            F.count_distinct(F.col(check.split_field)).alias("n_splits"),
            F.array_sort(F.collect_set(F.col(check.split_field).cast("string"))).alias(
                "splits"
            ),
        )
        .filter(F.col("n_splits") > 1)
    )
    # one aggregation job for count + 5 deterministic samples
    summary = overlaps.agg(
        F.count(F.lit(1)).alias("n"),
        F.slice(
            F.array_sort(F.collect_list(F.struct(*[F.col(k).cast("string") for k in keys]))),
            1,
            5,
        ).alias("samples"),
    ).collect()[0]
    n = summary["n"]
    ok = n == 0
    samples = [list(s) for s in (summary["samples"] or [])]
    return CheckResult(
        name="ml.no_overlap:" + ",".join(keys),
        category="ml",
        passed=ok,
        severity=Severity.ERROR,
        field=",".join(keys),
        observed={"overlapping_keys": n, "samples": samples},
        message=(
            ""
            if ok
            else f"{n} key(s) appear in multiple '{check.split_field}' splits; "
            f"examples: {samples}"
        ),
    )


# ------------------------------------------------------------------- PSI


def psi(ref_pcts: list[float], cur_pcts: list[float]) -> float:
    """Population Stability Index with the reference's epsilon
    (datafusion_engine.rs:923-943)."""
    total = 0.0
    for r, c in zip(ref_pcts, cur_pcts):
        r, c = r + _PSI_EPS, c + _PSI_EPS
        total += (c - r) * math.log(c / r)
    return total


def feature_drift_check(
    check: FeatureDriftCheck, df: DataFrame
) -> list[CheckResult]:
    split = F.col(check.split_field).cast("string")
    both = df.filter(split.isin([check.reference_split, check.current_split]))
    results = []
    for feat in check.feature_fields:
        if feat not in df.columns:
            continue
        fcol = F.col(feat).cast("double")
        ref_vals = both.filter(
            (split == check.reference_split) & fcol.isNotNull()
        ).select(fcol.alias("v"))
        # exact distributed quantiles for bin edges (relativeError=0)
        probs = [i / check.num_bins for i in range(1, check.num_bins)]
        edges = ref_vals.approxQuantile("v", probs, 0.0)
        edges = sorted(set(edges))  # collapse duplicate boundaries
        if not edges:
            results.append(
                CheckResult(
                    name=f"ml.feature_drift:{feat}",
                    category="ml",
                    passed=True,
                    field=feat,
                    observed={"note": "no reference data"},
                )
            )
            continue
        # bin id: count of edges strictly below the value (value <= edge_i -> bin i)
        bin_expr = F.lit(0)
        for e in edges:
            bin_expr = bin_expr + (fcol > F.lit(e)).cast("int")
        n_bins = len(edges) + 1
        counts = (
            both.filter(fcol.isNotNull())
            .groupBy(split.alias("split"), bin_expr.alias("bin"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        by_split: dict[str, dict[int, int]] = {}
        for r in counts:
            by_split.setdefault(r["split"], {})[r["bin"]] = r["cnt"]
        ref_counts = by_split.get(check.reference_split, {})
        cur_counts = by_split.get(check.current_split, {})
        ref_total = sum(ref_counts.values()) or 1
        cur_total = sum(cur_counts.values()) or 1
        ref_pcts = [ref_counts.get(b, 0) / ref_total for b in range(n_bins)]
        cur_pcts = [cur_counts.get(b, 0) / cur_total for b in range(n_bins)]
        value = psi(ref_pcts, cur_pcts)
        ok = value <= check.threshold
        results.append(
            CheckResult(
                name=f"ml.feature_drift:{feat}",
                category="ml",
                passed=ok,
                severity=Severity.ERROR,
                field=feat,
                observed={
                    "psi": value,
                    "bins": n_bins,
                    "ref_pcts": ref_pcts,
                    "cur_pcts": cur_pcts,
                },
                threshold=check.threshold,
                message=(
                    ""
                    if ok
                    else f"feature '{feat}' drifted: PSI={value:.4f} between "
                    f"'{check.reference_split}' and '{check.current_split}' "
                    f"(threshold {check.threshold})"
                ),
            )
        )
    return results
