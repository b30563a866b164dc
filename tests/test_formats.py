"""Multi-format round-trips: every supported format must reproduce the
exact rows it was given (timestamps at micros grain, doubles bit-exact),
and the columnar formats must push filters into the scan."""

from __future__ import annotations

import io
import contextlib

import pytest
from pyspark.sql import functions as F

from olap_sus_spark.catalog import load_table
from olap_sus_spark.sources.formats import FORMATS, read_table, write_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def orders(spark):
    # timestamps, doubles, strings, longs — the full type surface the
    # text formats must round-trip losslessly
    return load_table(spark, SF_DIR, "orders")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("fmt", FORMATS)
def test_round_trip_exact(spark, orders, fmt, tmp_path):
    path = str(tmp_path / f"orders_{fmt}")
    write_table(orders, path, fmt)
    back = read_table(spark, path, fmt, schema=orders.schema)
    assert back.schema == orders.schema
    assert _rows(back) == _rows(orders)


@pytest.mark.parametrize("fmt", ["parquet", "orc"])
def test_columnar_pushdown(spark, orders, fmt, tmp_path):
    """Filter + projection must reach the columnar scan (the 100 TB
    contract: a 2-column query never reads the other columns)."""
    path = str(tmp_path / f"orders_{fmt}")
    write_table(orders, path, fmt)
    q = (
        read_table(spark, path, fmt)
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_totalprice")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "o_orderstatus" in plan.split("PushedFilters")[1].split("\n")[0]
    read_schema = plan.split("ReadSchema")[1].split("\n")[0]
    assert "o_orderpriority" not in read_schema


def test_json_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="schema"):
        read_table(spark, str(tmp_path), "json")


def test_partitioned_write_prunes(spark, orders, tmp_path):
    """A partitioned write + partition predicate scans only one directory."""
    path = str(tmp_path / "orders_part")
    write_table(
        orders.withColumn("ano", F.year("o_orderdate")), path, "parquet",
        partition_by=["ano"],
    )
    q = read_table(spark, path, "parquet").filter(F.col("ano") == 1996)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    n96 = orders.filter(F.year("o_orderdate") == 1996).count()
    assert q.count() == n96
