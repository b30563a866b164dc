"""Skew-adversarial probe of the prefix-sum family (VERDICT r06 #5).

running_total relies on ``repartitionByRange`` over the order key; a
pathological tie distribution (90 % identical values — the worst case for
a range sampler's boundary placement) stresses whether the tiebreak key in
the order tuple actually lets the sampler SPLIT the tied mass.  This probe
runs the pareto-shaped prefix (value DESC, unique key tiebreak) at ×100 of
the sf0.1 grain (15 M rows) with a 90 %-constant value column and checks:

1. EXACT equality against the single-partition window oracle (checksum +
   count — collecting 15 M rows to the driver would measure the driver);
2. range-partition balance: max partition ≤ 2× the mean;
3. wall-clock of both shapes, for the record.

Run:  python tools/skew_probe_prefix.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from olap_sus_spark.operators.prefix import running_total
from olap_sus_spark.session import get_spark


def checksum(df, col):
    # sum-of-hashes over (key, prefix) — order-insensitive exact compare
    return df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(F.col("k"), F.col(col)).cast("decimal(38,0)")).alias("h"),
    ).first()


def main() -> None:
    n = int(os.environ.get("SKEW_PROBE_ROWS", 15_000_000))
    ranges = 32
    spark = get_spark("skew-probe")
    # 90 % of rows share ONE value; the rest spread over 97 distinct values
    df = (
        spark.range(n)
        .select(
            F.when(F.col("id") % 10 == 0, (F.col("id") % 97).cast("double"))
            .otherwise(F.lit(5.0))
            .alias("v"),
            F.col("id").alias("k"),
        )
        .localCheckpoint()  # freeze the input so both shapes read identical rows
    )
    order = [F.col("v").desc(), F.col("k")]

    t0 = time.perf_counter()
    two_phase = running_total(df, order, F.col("v"), "rt", num_ranges=ranges)
    got = checksum(two_phase, "rt")
    t_prefix = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = checksum(df.withColumn("rt", F.sum("v").over(w)), "rt")
    t_window = round(time.perf_counter() - t0, 2)

    sizes = [
        r[1]
        for r in df.repartitionByRange(ranges, *order)
        .groupBy(F.spark_partition_id())
        .count()
        .collect()
    ]
    mean = sum(sizes) / len(sizes)
    print(
        json.dumps(
            {
                "rows": n,
                "tie_fraction": 0.9,
                "match": got == want,
                "checksum": str(got[1]),
                "prefix_sec": t_prefix,
                "single_partition_window_sec": t_window,
                "partitions": len(sizes),
                "max_over_mean": round(max(sizes) / mean, 3),
                "balanced": max(sizes) <= 2 * mean,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
