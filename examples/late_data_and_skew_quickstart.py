#!/usr/bin/env python
"""Round-5 operational-semantics walkthrough: watermark late-data
policy and hot-key join salting.

Part 1 replays Structured Streaming's late-data rule in batch
(`late_data_windows_events`): every 7th event arrives 96h late, and
the mirror computes exactly which rows a 1h-watermarked streaming
aggregation would drop — including the non-obvious Spark 3.4+ detail
that the late-events filter lags the eviction watermark by one batch.

Part 2 joins a deliberately skewed fact (half of all events remapped
onto one hot user) to a per-user dim through
`ext.skew.salted_equi_join` and shows the salt spreading the hot key
across reducers while the result stays identical to the plain join.

    python examples/late_data_and_skew_quickstart.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dce_spark.data import load_table  # noqa: E402
from dce_spark.ext.skew import salted_equi_join  # noqa: E402
from dce_spark.queries import QUERIES  # noqa: E402


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

    # --- Part 1: watermark late-data accounting -----------------------
    late = QUERIES["late_data_windows_events"].fn(spark, sf_dir)
    tot = late.agg(
        F.sum("n_arrived").alias("arrived"), F.sum("n_accepted").alias("accepted")
    ).collect()[0]
    dropped = tot["arrived"] - tot["accepted"]
    print(
        f"[late-data] {tot['arrived']} arrivals -> {tot['accepted']} accepted, "
        f"{dropped} dropped by the 1h watermark "
        f"({100.0 * dropped / tot['arrived']:.1f}% of traffic was too late)"
    )
    worst = (
        late.withColumn("n_dropped", F.col("n_arrived") - F.col("n_accepted"))
        .orderBy(F.desc("n_dropped"), "window_epoch")
        .limit(3)
        .collect()
    )
    for r in worst:
        print(
            f"[late-data]   window@{r['window_epoch']}: "
            f"{r['n_dropped']}/{r['n_arrived']} dropped"
        )

    # --- Part 2: salted hot-key join ----------------------------------
    ev = load_table(spark, sf_dir, "events")
    fact = ev.select(
        F.when(F.col("event_id") % 2 == 0, F.lit(0).cast("long"))
        .otherwise(F.col("user_id"))
        .alias("uid"),
        "event_id",
        "event_type",
    )
    dim = ev.groupBy(F.col("user_id").alias("uid")).agg(
        F.count(F.lit(1)).alias("n_ev")
    )
    hot_share = fact.filter(F.col("uid") == 0).count() / fact.count()
    print(f"[skew] hot key holds {100 * hot_share:.0f}% of fact rows")

    salted = salted_equi_join(
        fact, dim, on="uid", n_salts=8, salt_by=F.xxhash64(F.col("event_id"))
    )
    plain = fact.join(dim, "uid")
    s = salted.groupBy().agg(F.count(F.lit(1)).alias("n"), F.sum("n_ev").alias("s"))
    p = plain.groupBy().agg(F.count(F.lit(1)).alias("n"), F.sum("n_ev").alias("s"))
    assert s.collect()[0] == p.collect()[0], "salted join must equal plain join"
    spread = (
        fact.withColumn(
            "salt", F.pmod(F.xxhash64(F.col("event_id")), F.lit(8)).cast("int")
        )
        .filter(F.col("uid") == 0)
        .groupBy("salt")
        .count()
        .orderBy("salt")
        .collect()
    )
    print(
        "[skew] hot key spread over salts: "
        + ", ".join(f"{r['salt']}:{r['count']}" for r in spread)
    )
    print("[skew] result identical to the unsalted join — salting is free")

    spark.stop()


if __name__ == "__main__":
    main()
