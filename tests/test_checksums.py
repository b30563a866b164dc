"""Partition content checksums: the digest must be engine-portable on the
inputs the gate data never exercises — NULL key fields (concat must
propagate NULL exactly as SQL ||, dropping the row from the xor on both
engines) and fractional quantities (floor, not a truncate-vs-round cast).
Drives the PRODUCTION expression (_partition_checksums) on a synthetic
frame against a DuckDB replay of the registered oracle's arithmetic.
"""

from __future__ import annotations

import datetime

import duckdb

from olap_sus_spark.queries.timeseries import _partition_checksums

_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_returnflag string, "
    "l_quantity double, l_shipdate timestamp"
)

_ROWS = [
    (1, 10, 100, "N", 2.0, datetime.datetime(1995, 3, 1)),
    (2, None, 100, "N", 2.0, datetime.datetime(1995, 3, 2)),  # NULL key field
    (3, 11, None, "R", 2.5, datetime.datetime(1995, 3, 3)),  # NULL + fractional
    (4, 12, 101, "A", 7.5, datetime.datetime(1995, 4, 1)),  # fractional only
]


def _duck(rows):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE li (l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT,"
        " l_returnflag VARCHAR, l_quantity DOUBLE, l_shipdate TIMESTAMP)"
    )
    con.executemany("INSERT INTO li VALUES (?,?,?,?,?,?)", rows)
    return sorted(
        tuple(r)
        for r in con.execute(
            """
        SELECT strftime(l_shipdate, '%Y-%m') AS mes_dt,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(bit_xor(CAST('0x' || substr(md5(
                     CAST(l_orderkey AS VARCHAR) || '|' ||
                     CAST(l_partkey AS VARCHAR) || '|' ||
                     CAST(l_suppkey AS VARCHAR) || '|' ||
                     l_returnflag || '|' ||
                     CAST(CAST(FLOOR(l_quantity) AS BIGINT) AS VARCHAR) || '|' ||
                     strftime(l_shipdate, '%Y-%m-%d')), 1, 12) AS BIGINT))
                    AS BIGINT) AS checksum
        FROM li GROUP BY 1
        """
        ).fetchall()
    )


def test_null_fields_and_fractional_quantities_stay_portable(spark):
    got = sorted(
        tuple(r)
        for r in _partition_checksums(
            spark.createDataFrame(_ROWS, _SCHEMA)
        ).collect()
    )
    assert got == _duck(_ROWS)
    # and the NULL-keyed rows genuinely dropped out of the xor (not hashed
    # as a shifted string): March's digest equals the digest of row 1 alone
    solo = _partition_checksums(
        spark.createDataFrame(_ROWS[:1], _SCHEMA)
    ).first()
    march = [r for r in got if r[0] == "1995-03"][0]
    assert march[2] == solo["checksum"]
    assert march[1] == 3  # n_rows still counts the NULL-keyed rows
