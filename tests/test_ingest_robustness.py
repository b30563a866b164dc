"""Ingest robustness: ragged/malformed CSV rows and multi-file partitions."""

from __future__ import annotations

import os
import shutil

import pytest

from olap_sus_spark import etl
from tests.test_etl_e2e import DT, LANDING, SEEDS


@pytest.fixture()
def env(spark, tmp_path):
    landing = str(tmp_path / "landing")
    shutil.copytree(LANDING, landing)
    wh = str(tmp_path / "wh")
    etl.bootstrap_warehouse(spark, SEEDS, wh)
    return landing, wh


def test_multi_file_partition_single_scan(spark, env):
    """Several CSV drops in one dt= folder are read as one dataset (the
    reference looped per file; this engine must not care how many files a
    day arrives in)."""
    landing, wh = env
    day = os.path.join(landing, "sinasc", f"dt={DT}")
    src = os.path.join(day, "part-0.csv")
    with open(src) as f:
        header, *rows = f.read().strip().split("\n")
    # split the same rows across three files
    os.remove(src)
    for i, chunk in enumerate([rows[:2], rows[2:4], rows[4:]]):
        with open(os.path.join(day, f"part-{i}.csv"), "w") as f:
            f.write("\n".join([header, *chunk]) + "\n")
    etl.run_ingest(spark, "sinasc", DT, landing, wh)
    fact = spark.read.parquet(os.path.join(wh, "fact_nascimentos"))
    assert sum(r.quantidade_nascimentos for r in fact.collect()) == 5


def test_ragged_and_malformed_rows_tolerated(spark, env):
    """Rows with too few/too many fields or garbage values must not abort
    the job: missing fields -> NULL -> sentinel keys; garbage dates drop the
    row (event-date rule); extra fields are ignored."""
    landing, wh = env
    day = os.path.join(landing, "sinasc", f"dt={DT}")
    with open(os.path.join(day, "part-0.csv"), "a") as f:
        f.write("15012024;1200\n")                # ragged: only 2 of 14 fields
        f.write("garbage;;;;;;;;;;;;;extra;extra;extra\n")  # bad date + extra fields
        f.write("15012024;1200;3550308;3550308;abc;1;4;2;1;1;xyz;1;5;1\n")  # junk ints
    etl.run_ingest(spark, "sinasc", DT, landing, wh)
    fact = spark.read.parquet(os.path.join(wh, "fact_nascimentos"))
    total = sum(r.quantidade_nascimentos for r in fact.collect())
    # 5 original valid + ragged row (valid date, everything else sentinel)
    # + junk-ints row (valid date, age/weight -> Ignorado band); the
    # bad-date row is dropped.
    assert total == 7
