"""Two-process race probe for the shared maintained-partials contract
(operators/maintained.py): two separate Spark drivers concurrently serve
the SAME KMV cube / CMS grid / histogram — first cold (both build), then
against STALE markers (both take the retire-then-promote path, the race
the contract's try/except choreography exists for).

Pass criteria: every worker finishes green with IDENTICAL served values,
and the index root holds no staging (``__build__``) or tomb (``.stale``)
debris afterwards.

Usage: python tools/race_probe_maintained.py
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys, os
sys.path.insert(0, %(repo)r)
from olap_sus_spark.session import get_spark
from olap_sus_spark.queries import sketches as sk
from olap_sus_spark.queries import cms as qc
from olap_sus_spark.queries import hist as qh
spark = get_spark("race-m-%(tag)s")
spark.sparkContext.setLogLevel("ERROR")
a = sk.kmv_distinct_orders_served(spark, %(sf)r).first()[0]
b = sorted(tuple(r) for r in qc.cms_supplier_counts_served(spark, %(sf)r).collect())
c = sorted(tuple(r) for r in qh.hist_order_value_served(spark, %(sf)r).collect())
import hashlib
digest = hashlib.md5(repr((a, b, c)).encode()).hexdigest()[:12]
print("WORKER_OK", digest, flush=True)
spark.stop()
"""


def _race(env: dict, sf: str, label: str) -> str:
    t0 = time.perf_counter()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER % {"repo": REPO, "sf": sf, "tag": i}],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate()[0] for p in procs]
    digests = []
    for i, out in enumerate(outs):
        ok = [ln for ln in out.splitlines() if ln.startswith("WORKER_OK")]
        assert ok, f"{label}: worker {i} died:\n{out}"
        digests.append(ok[0].split()[1])
    assert digests[0] == digests[1], f"{label}: divergent serves {digests}"
    print(f"{label}: both workers green, identical digest {digests[0]}, "
          f"{time.perf_counter() - t0:.1f}s")
    return digests[0]


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    root = tempfile.mkdtemp(prefix="race_probe_maint_")
    env = dict(os.environ, SPARK_GRAFT_INDEX_DIR=root, SPARK_GRAFT_DRIVER_MEM="4g")

    d1 = _race(env, sf, "cold race (both build)")

    # corrupt every table's stamp marker -> both workers detect stale and
    # race through retire-then-promote
    markers = 0
    for dirpath, _, files in os.walk(root):
        if "_corpus_stamp.txt" in files:
            with open(os.path.join(dirpath, "_corpus_stamp.txt"), "w") as f:
                f.write("stale-junk")
            markers += 1
    assert markers >= 3, f"expected >=3 maintained tables, found {markers}"
    d2 = _race(env, sf, f"stale-marker race ({markers} tables retired)")
    assert d1 == d2, "rebuild after stale marker changed served values"

    debris = []
    for dirpath, dirs, _ in os.walk(root):
        for d in dirs:
            if "__build__" in d or d.endswith(".stale") or "__ingest__" in d:
                debris.append(os.path.join(dirpath, d))
    assert not debris, f"staging/tomb debris left behind: {debris}"
    print("no staging/tomb debris; PROBE PASS")


if __name__ == "__main__":
    main()
