"""Z-order layout efficacy: under a 2-D predicate box, the z-clustered
layout must let parquet min/max footer stats skip files that a 1-D sorted
layout cannot."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from wheels_in_motion_analytics_spark.functions.layout import zorder_layout

N_FILES = 16


def _overlapping_files(path: str, box: dict[str, tuple[int, int]]) -> tuple[int, int]:
    """(files whose [min,max] stats overlap the box, total files)."""
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        cols = {
            md.schema.column(i).name: i for i in range(md.schema.names.__len__())
        }
        overlaps = True
        for col, (lo, hi) in box.items():
            cmin = min(
                md.row_group(r).column(cols[col]).statistics.min
                for r in range(md.num_row_groups)
            )
            cmax = max(
                md.row_group(r).column(cols[col]).statistics.max
                for r in range(md.num_row_groups)
            )
            if cmax < lo or cmin > hi:
                overlaps = False
                break
        if overlaps:
            hit += 1
    return hit, len(files)


def test_zorder_layout_prunes_2d_box(spark, tmp_path):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    # 1-D baseline: range-sorted by partkey only — perfect on partkey,
    # nothing on suppkey.
    linear = str(tmp_path / "linear")
    li.repartitionByRange(N_FILES, "l_partkey").sortWithinPartitions(
        "l_partkey"
    ).write.mode("overwrite").parquet(linear)
    zpath = str(tmp_path / "zorder")
    zorder_layout(li, "l_partkey", "l_suppkey", N_FILES).write.mode(
        "overwrite"
    ).parquet(zpath)

    maxes = li.agg(
        F.max("l_partkey").alias("p"), F.max("l_suppkey").alias("s")
    ).first()

    def quarter_pow2(m: int) -> int:
        # largest 2^k - 1 not above ~a third of the key range: keeps the box
        # aligned to the Morton grid (an unaligned box fragments across
        # curve segments and defeats the point of the comparison)
        k = max((m // 3).bit_length(), 1)
        return (1 << k) - 1

    box = {
        "l_partkey": (0, quarter_pow2(maxes["p"])),
        "l_suppkey": (0, quarter_pow2(maxes["s"])),
    }
    lin_hit, lin_total = _overlapping_files(linear, box)
    z_hit, z_total = _overlapping_files(zpath, box)
    assert lin_total == N_FILES and z_total == N_FILES
    # linear layout: every partkey-matching file spans all suppkeys, so the
    # box hits ~1/4 of files; z-order confines both dims, hitting fewer.
    assert z_hit < lin_hit, (z_hit, lin_hit)
    # and the z-layout must still return the same rows
    got = (
        spark.read.parquet(zpath)
        .where(
            F.col("l_partkey").between(*box["l_partkey"])
            & F.col("l_suppkey").between(*box["l_suppkey"])
        )
        .count()
    )
    want = li.where(
        F.col("l_partkey").between(*box["l_partkey"])
        & F.col("l_suppkey").between(*box["l_suppkey"])
    ).count()
    assert got == want


def test_zone_map_clustered_layout_skips_most_zones(spark):
    """The audit must show the point of clustering: under the date-sorted
    layout the quarter predicate opens only the contiguous zones that hold
    the quarter, while the natural (insert-order) layout opens nearly all
    zones. Zone counts must agree between layouts (same rows, same size)."""
    from wheels_in_motion_analytics_spark.functions.layout import (
        ZONE_HI,
        ZONE_LO,
        ZONE_ROWS,
        zone_map_skipping_audit,
    )
    from wheels_in_motion_analytics_spark.tables import table

    rows = {r["layout"]: r for r in zone_map_skipping_audit(spark, SF_SMALL).collect()}
    nat, clu = rows["natural"], rows["date_clustered"]
    n_orders = table(spark, SF_SMALL, "orders").count()
    assert nat["n_zones"] == clu["n_zones"] == -(-n_orders // ZONE_ROWS)
    matching = (
        table(spark, SF_SMALL, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit(ZONE_LO).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(ZONE_HI).cast("timestamp"))
        )
        .count()
    )
    # every matching row lives in an opened zone under BOTH layouts
    assert clu["rows_scanned"] >= matching and nat["rows_scanned"] >= matching
    # the clustered layout opens only the quarter's contiguous zone run
    # (+1 zone of boundary slack); natural order spreads the quarter
    # across nearly every zone
    assert clu["zones_opened"] <= matching // ZONE_ROWS + 2
    assert nat["zones_opened"] >= 3 * clu["zones_opened"]
    assert clu["rows_scanned"] < nat["rows_scanned"]
