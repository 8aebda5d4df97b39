"""Full driver simulation: run EVERY registry query on a vanilla
SparkSession (no engine configs — exactly what the driver does) at the given
sf dir and diff against its DuckDB oracle (row count + column names +
order-insensitive exact values, floats via repr).

Usage: python tools/driver_check.py [sf_dir]   (default /root/testdata/sf0.01)
Exit code = number of failing queries.
Set SPARK_GRAFT_ONLY=name1,name2 to check a subset while iterating (the
pre-commit run must still be the full, unfiltered sweep).
Set SPARK_GRAFT_DRIVER_ORDER=1 to run queries in the order queries()
yields them (the driver's own order: _DRIVER_PRIORITY head first) instead
of alphabetically — the rotation recipe's "sweep the head green in driver
order" without an ad-hoc script; combine with SPARK_GRAFT_ONLY=head names.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from wheels_in_motion_analytics_spark.oracle_types import type_kind_diff


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = "NaN" if math.isnan(v) else repr(v)
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    builder = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
    )
    if os.environ.get("SPARK_GRAFT_ADVERSARIAL"):
        # hostile accumulation orders: prime shuffle-partition count + tiny
        # input splits (the NOTES.md determinism-stress recipe)
        builder = builder.config("spark.sql.shuffle.partitions", "7").config(
            "spark.sql.files.maxPartitionBytes", str(512 * 1024)
        )
    # extra hostile session confs, semicolon-separated key=value pairs, e.g.
    # SPARK_GRAFT_EXTRA_CONF="spark.sql.autoBroadcastJoinThreshold=-1" forces
    # every un-hinted join onto SortMergeJoin — a different accumulation
    # order than any broadcast plan (determinism axis beyond ADVERSARIAL).
    for pair in filter(None, os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(";")):
        k, _, v = pair.partition("=")
        builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from wheels_in_motion_analytics_spark.tables import TABLE_NAMES

    qs, os_sql = entrymod.queries(), entrymod.oracle_sql()
    only = [s for s in os.environ.get("SPARK_GRAFT_ONLY", "").split(",") if s]
    if only:
        missing = [s for s in only if s not in qs]
        assert not missing, f"unknown query names: {missing}"
        qs = {k: v for k, v in qs.items() if k in only}
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n = len(entrymod.entry(spark).collect())
    print(f"entry(): {n} rows")
    assert n > 0

    failures = []
    order = list(qs) if os.environ.get("SPARK_GRAFT_DRIVER_ORDER") else sorted(qs)
    for name in order:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            if name not in os_sql:
                print(f"  rows-only {name}: {len(srows)} rows  {time.time()-t0:.1f}s")
                continue
            dtab = con.execute(os_sql[name]).arrow()
            dcols = dtab.column_names
            drows = list(zip(*(col.to_pylist() for col in dtab.columns)))
            if not dtab.columns:
                drows = []
            tdiff = type_kind_diff(sdf.dtypes, dtab.schema)
            ok = (
                sorted(sdf.columns) == sorted(dcols)
                and len(srows) == len(drows)
                and not tdiff
                and canon(srows, sdf.columns) == canon(drows, dcols)
            )
            status = "OK" if ok else "FAIL"
            if not ok:
                failures.append(name)
            extra = f"  TYPE-DRIFT {tdiff}" if tdiff else ""
            print(f"  {status} {name}: {len(srows)} rows  {time.time()-t0:.1f}s{extra}")
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"  ERROR {name}: {str(exc)[:160]}")

    print(f"{len(qs)} queries, {len(failures)} failures: {failures}")
    return len(failures)


if __name__ == "__main__":
    raise SystemExit(main())
