"""Differential for a subset of queries: python tools/quick_diff.py q1 q2 ...
Same vanilla-session + canon comparison as driver_check.py, but only for the
named queries (fast iteration on new operators). Optional --sf=DIR."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from tools.driver_check import canon


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("--sf=")]
    sf_dir = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--sf=")),
        "/root/testdata/sf0.01",
    )
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from wheels_in_motion_analytics_spark.tables import TABLE_NAMES

    qs, os_sql = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    fails = []
    for name in names:
        sdf = qs[name](spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = list(sdf.columns)
        if name not in os_sql:
            print(f"  {name}: rows-only, {len(srows)} rows")
            continue
        cur = con.execute(os_sql[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        if sorted(scols) != sorted(ocols):
            fails.append(name)
            print(f"FAIL {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
            continue
        cs, co = canon(srows, scols), canon(orows, ocols)
        if cs != co:
            fails.append(name)
            print(f"FAIL {name}: {len(srows)} vs {len(orows)} rows")
            for a, b in list(zip(cs, co))[:200]:
                if a != b:
                    print(f"   spark={a}\n  oracle={b}")
                    break
        else:
            print(f"  OK {name}: {len(srows)} rows")
    return len(fails)


if __name__ == "__main__":
    sys.exit(main())
