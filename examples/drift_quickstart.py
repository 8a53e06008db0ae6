#!/usr/bin/env python
"""Drift-detection ladder walkthrough: the monitoring checks an
operator layers from cheapest to most sensitive.

Runs the catalog's drift family over the events table — categorical
chi-square, continuous KS, week-over-week rate drift, per-day anomaly
flags — plus the round-7 staged CUSUM changepoint (drift WITH memory:
a slow leak never trips a per-window test but integrates into a CUSUM
peak) and the burstiness regime counter (temporal-pattern drift the
volume checks cannot see). Everything is the same code path as the
oracle-checked catalog queries; this script shows what an on-call
reads off them.

    python examples/drift_quickstart.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dce_spark.queries import QUERIES  # noqa: E402
from dce_spark.queries_staging_r7 import STAGED_R7  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # 1. categorical drift: chi-square over event_type mix
    for r in QUERIES["chi_square_drift_events"].fn(spark, sf_dir).collect():
        print(f"[chi2] {dict(r.asDict())}")
    spark.catalog.clearCache()

    # 2. continuous drift: KS statistic over the value distribution
    for r in QUERIES["ks_test_events"].fn(spark, sf_dir).collect():
        print(f"[ks]   {dict(r.asDict())}")
    spark.catalog.clearCache()

    # 3. week-over-week rate drift (memoryless, per window)
    rows = QUERIES["drift_events_weekly"].fn(spark, sf_dir).collect()
    print(f"[weekly] {len(rows)} week rows; first: {dict(rows[0].asDict())}")
    spark.catalog.clearCache()

    # 4. per-day anomaly flags (reference-anchored)
    rows = QUERIES["anomaly_days_events"].fn(spark, sf_dir).collect()
    print(f"[anomaly] {len(rows)} rows flagged/scored")
    spark.catalog.clearCache()

    # 5. CUSUM changepoint (staged round-7): drift WITH memory — the
    # statistic that catches a slow 1%/day leak no windowed test sees
    r = STAGED_R7["cusum_drift_events"].fn(spark, sf_dir).collect()[0]
    print(
        f"[cusum] {r['n_days']} days; max CUSUM+ {r['max_cusum_pos']:.1f} "
        f"(peak {r['peak_day']}), max CUSUM- {r['max_cusum_neg']:.1f}"
    )
    spark.catalog.clearCache()

    # 6. temporal-pattern drift: burstiness regime counts (staged) —
    # bots burst, cron traffic is pacemaker-regular; both hide in
    # flat volume curves
    r = STAGED_R7["burstiness_events"].fn(spark, sf_dir).collect()[0]
    print(
        f"[burst] {r['n_users']} users; mean B {r['mean_burstiness']:.3f}; "
        f"{r['n_bursty']} bursty / {r['n_regular']} regular"
    )
    spark.catalog.clearCache()

    # 7. shape tests as LIBRARY ops (round 8, ext/stats): KS = worst
    # localized ECDF gap, CvM = integrated gap (broad small shifts);
    # the bucketed KS is the same formula at 100 TB scale — its ECDF
    # table is bounded at n_buckets rows no matter the corpus size
    from pyspark.sql import functions as F

    from dce_spark.data import load_table
    from dce_spark.ext.stats import (
        cvm_two_sample,
        ks_two_sample,
        ks_two_sample_bucketed,
    )

    v = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.when((F.dayofweek("ts") - 1).isin(0, 6), 1)
            .otherwise(0)
            .alias("split"),
            F.col("value").cast("double").alias("value"),
        )
    )
    ks = ks_two_sample(v).collect()[0]
    cvm = cvm_two_sample(v).collect()[0]
    ksb = ks_two_sample_bucketed(v, n_buckets=256).collect()[0]
    print(
        f"[shape] weekday vs weekend value: KS {ks['ks_stat']:.6f} "
        f"(bucketed {ksb['ks_stat']:.6f}), CvM {cvm['cvm_stat']:.6f} "
        f"(n0 {ks['n0']}, n1 {ks['n1']})"
    )

    spark.stop()


if __name__ == "__main__":
    main()
