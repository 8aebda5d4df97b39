"""Measured scale-up study: run the flagship plan shapes on a lineitem
expanded past the reference's ENTIRE multi-year load in a single table.

The reference's published envelope is 113.9M rows processed across its full
2021-2025 ELT (BASELINE.md). This probe writes a SCALE×-expanded lineitem
(default 200× sf0.1 = 120.1M rows, > the whole reference load) to local
parquet, then times three shapes that together cover the hot paths:

  q1_scan_agg   full-pass 8-aggregate groupBy (9 groups)    — scan + map-side combine
  order_rollup  groupBy l_orderkey (30M groups)             — full-width shuffle
  order_window  running sum per order over linenumber       — shuffle + window pass

Each probe is timed as a noop write (full materialization, no sink I/O) and
reported as rows/sec. Keys are re-spaced on expansion (orderkey*SCALE+rep)
so group cardinality scales with the data — the shuffles get harder, not
just wider.

Not part of bench.py (runtime is minutes); results live in PERFORMANCE.md
("Round-4 scale-up study"). Run:

  SPARK_GRAFT_DRIVER_MEM=32g python tools/scale_probe.py [SCALE]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql import Window

from wheels_in_motion_analytics_spark.session import get_session
from wheels_in_motion_analytics_spark.compat import dsum, davg


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = os.environ.get("SCALE_DIR", "/tmp/scale_lineitem")
    # mirror the reference's shuffle parallelism (BASELINE.md: 64)
    spark = get_session("scale-probe", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    base_rows = li.count()
    t0 = time.perf_counter()
    (
        # repartition BEFORE the explode: the 200x row fan-out must run in
        # the 64 post-exchange tasks, not in the handful of parquet scan
        # splits (an 11-task explode stage straggles for minutes)
        li.repartition(64)
        .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(scale - 1))))
        .withColumn("l_orderkey", F.col("l_orderkey") * scale + F.col("rep"))
        .drop("rep")
        .write.mode("overwrite")
        .parquet(out)
    )
    gen_s = time.perf_counter() - t0
    big = spark.read.parquet(out)
    n = base_rows * scale
    print(f"# generated {n:,} rows ({scale}x sf0.1) in {gen_s:.1f}s -> {out}")
    # Warm the page cache for every column the probes touch: a cold first
    # scan of the 120M-row parquet costs minutes of disk I/O and buries the
    # compute signal (the q1 probe read 413s cold vs 5.9s warm).
    big.select([F.max(c) for c in big.columns]).write.mode("overwrite").format(
        "noop"
    ).save()

    def probe(name: str, df) -> dict:
        dt = 1e18
        for _ in range(2):
            t = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            dt = min(dt, time.perf_counter() - t)
        rec = {
            "probe": name,
            "rows": n,
            "sec": round(dt, 1),
            "rows_per_sec": int(n / dt),
        }
        print(json.dumps(rec))
        return rec

    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    probe(
        "q1_scan_agg",
        big.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base"),
            dsum(disc).alias("sum_disc"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("n"),
        ),
    )
    probe(
        "order_rollup",
        big.groupBy("l_orderkey").agg(
            F.sum("l_quantity").alias("qty"),
            F.max("l_shipdate").alias("last_ship"),
            F.count(F.lit(1)).alias("lines"),
        ),
    )
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    probe(
        "order_window",
        big.select(
            "l_orderkey",
            "l_linenumber",
            F.sum("l_quantity").over(w).alias("running_qty"),
        ),
    )
    # large-large join: the 120M-row fact against its own 30M-key rollup —
    # both sides far beyond broadcast, so this is the shuffled join shape
    # (SMJ/shuffled-hash under AQE) that dominates 100 TB star-schema work
    rollup = big.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("lines"))
    probe(
        "large_join",
        big.join(rollup, "l_orderkey").where(F.col("lines") >= 4).select(
            "l_orderkey", "l_linenumber", "lines"
        ),
    )
    shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
