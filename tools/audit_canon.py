"""Audit every registered query for driver-canonicalizer-hostile output
dtypes.

The round driver compares Spark output against the DuckDB oracle through
pandas (``toPandas()`` vs ``fetchdf()``) and hashes values *with their
dtypes*.  Three classes of equal-value outputs therefore hash differently:

- raw DECIMAL columns (Spark -> object/Decimal, DuckDB -> float64);
- DuckDB HUGEINT (SUM over BIGINT) -> float64 vs Spark int64;
- list/struct-valued cells (unhashable in the driver's canonicalizer).

This script runs each query + oracle at sf0.001 and reports any column whose
pandas dtype kind differs between the two sides, plus any Spark-side
Decimal/Array/Map/Struct output column on rows-only queries.

Usage: python tools/audit_canon.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import olap_sus_spark.queries  # noqa: F401 — populate registry
from olap_sus_spark.catalog import TABLES
from olap_sus_spark.registry import ORACLE, QUERIES
from olap_sus_spark.session import get_spark

HOSTILE_SPARK_TYPES = ("decimal", "array", "map", "struct")


def dtype_kind(s: pd.Series) -> str:
    k = s.dtype.kind
    if k == "O":
        for v in s:
            if v is None:
                continue
            return f"object:{type(v).__name__}"
        return "object:empty"
    # int64 vs Int64 etc. both compare as 'i'; float32/64 both 'f'
    return k


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("audit-canon")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    problems: list[str] = []
    for name in sorted(QUERIES):
        try:
            sdf = QUERIES[name](spark, sf_dir)
            for f in sdf.schema.fields:
                tn = f.dataType.simpleString()
                if any(tn.startswith(h) for h in HOSTILE_SPARK_TYPES):
                    problems.append(f"{name}: spark col {f.name} is {tn}")
            if name not in ORACLE:
                print(f"{name}: rows-only (spark schema clean)")
                continue
            spdf = sdf.toPandas()
            dpdf = con.execute(ORACLE[name]).fetchdf()
            for c in sorted(spdf.columns):
                if c not in dpdf.columns:
                    problems.append(f"{name}: col {c} missing in oracle")
                    continue
                sk, dk = dtype_kind(spdf[c]), dtype_kind(dpdf[c])
                if sk == "object:date" and dk == "M":
                    # Spark DATE -> python date objects, DuckDB -> datetime64.
                    # Empirically driver-safe: retention_cohorts and
                    # rolling_active_users passed the round-1 value hash with
                    # exactly this pairing (CORRECTNESS_r01.json).
                    continue
                if sk != dk:
                    problems.append(
                        f"{name}: col {c} dtype kind spark={sk} "
                        f"({spdf[c].dtype}) duckdb={dk} ({dpdf[c].dtype})"
                    )
            print(f"{name}: ok")
        except Exception as e:  # noqa: BLE001 — audit must not stop
            problems.append(f"{name}: ERROR {type(e).__name__}: {e}")
            print(f"{name}: ERROR {e}")
    print("\n=== PROBLEMS ===")
    for p in problems:
        print(p)
    print(f"total: {len(problems)}")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
