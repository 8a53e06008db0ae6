#!/usr/bin/env python
"""Replay catalog or staged queries against their DuckDB oracles at
any scale factor — the driver's t2 gate, runnable on demand.

    python scripts/oracle_replay.py                     # catalog window (50)
    python scripts/oracle_replay.py --all               # whole catalog
    python scripts/oracle_replay.py --staged r9         # a staged cohort
    python scripts/oracle_replay.py --sf sf0.1 name...  # specific queries

Every round's staging protocol requires each query verified at
sf0.001 + sf0.01 + sf0.1 before commit; this script is that check
(previously an ad-hoc /tmp harness rebuilt every session). Exit 1 on
the first mismatch, printing the first differing rows.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    return v


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="specific query names")
    ap.add_argument("--sf", default="sf0.01")
    ap.add_argument("--all", action="store_true", help="whole catalog")
    ap.add_argument(
        "--staged", default=None,
        help="staged cohort suffix, e.g. r9 -> queries_staging_r9",
    )
    args = ap.parse_args()
    sf_dir = f"/root/testdata/{args.sf}"

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("oracle-replay")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if args.staged:
        import importlib

        mod = importlib.import_module(
            f"dce_spark.queries_staging_{args.staged}"
        )
        staged = getattr(mod, f"STAGED_{args.staged.upper()}")
        pairs = {n: (s.fn, s.oracle) for n, s in staged.items()}
    else:
        from dce_spark.queries import QUERIES, oracle_sql

        oracles = oracle_sql()
        pairs = {
            n: (q.fn, oracles[n]) for n, q in QUERIES.items() if n in oracles
        }
        if not args.all and not args.names:
            # the driver gate samples the first 50 of queries() — the
            # FRONTED order (_DRIVER_WINDOW first), not registration
            # order. list(QUERIES)[:50] silently replayed the 50
            # earliest-registered queries instead (round-8 fix).
            from dce_spark.queries import queries as _window

            names = list(_window())[:50]
            pairs = {n: pairs[n] for n in names if n in pairs}

    if args.names:
        missing = [n for n in args.names if n not in pairs]
        if missing:
            print(f"unknown queries: {missing}", file=sys.stderr)
            return 2
        pairs = {n: pairs[n] for n in args.names}

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = 0
    for name in sorted(pairs):
        fn, sql = pairs[name]
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sorted(sdf.columns)
        srows = sorted(
            tuple(str(norm(r[c])) for c in scols) for r in sdf.collect()
        )
        rel = con.sql(sql)
        idx = {c: i for i, c in enumerate(rel.columns)}
        if scols != sorted(rel.columns):
            print(f"FAIL {name}: columns {scols} vs {sorted(rel.columns)}")
            failures += 1
            continue
        drows = sorted(
            tuple(str(norm(row[idx[c]])) for c in scols)
            for row in rel.fetchall()
        )
        if srows != drows:
            diff = next(
                (a, b) for a, b in zip(srows, drows) if a != b
            ) if len(srows) == len(drows) else ("rows", (len(srows), len(drows)))
            print(f"FAIL {name}: first diff {diff}")
            failures += 1
        else:
            tag = " (VACUOUS 0 rows)" if not srows else ""
            print(
                f"OK {name} rows={len(srows)} "
                f"spark={time.time() - t0:.2f}s{tag}",
                flush=True,
            )
        spark.catalog.clearCache()
    print(f"{len(pairs) - failures}/{len(pairs)} green at {args.sf}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
