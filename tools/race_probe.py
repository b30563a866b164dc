"""Two-process index-build race probe: both ADVICE rounds focused on the
maintained-index promotion races, so exercise them for real — two separate
Spark drivers concurrently build the SAME SRP and IVF indexes into a fresh
index root.  Pass criteria: both processes finish green, exactly one
promoted copy of each index exists, it is readable with the expected row
count, and no staging/tomb debris is left behind.

Usage: python tools/race_probe.py
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
from olap_sus_spark.operators import similarity as sim
spark = get_spark("race-%(tag)s")
spark.sparkContext.setLogLevel("ERROR")
b = sim.load_or_build_srp_index(spark, %(sf)r, dim=64, n_tables=12, n_bits=4)
a, c = sim.load_or_build_ivf_index(spark, %(sf)r, num_centroids=16)
print("WORKER_OK", b.count(), a.count(), c.count(), flush=True)
spark.stop()
"""


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    root = tempfile.mkdtemp(prefix="race_probe_idx_")
    env = dict(os.environ, SPARK_GRAFT_INDEX_DIR=root, SPARK_GRAFT_DRIVER_MEM="4g")
    t0 = time.perf_counter()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER % {"repo": REPO, "sf": sf, "tag": i}],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate()[0] for p in procs]
    rcs = [p.returncode for p in procs]
    print(f"workers done in {time.perf_counter() - t0:.1f}s rcs={rcs}")
    for i, o in enumerate(outs):
        ok = [ln for ln in o.splitlines() if ln.startswith("WORKER_OK")]
        print(f"worker {i}: {ok[0] if ok else 'NO OK LINE'}")
    entries = sorted(os.listdir(root))
    debris = [e for e in entries if ".__build__" in e]
    promoted = [e for e in entries if ".__build__" not in e]
    print(f"index root: promoted={promoted} debris={debris}")
    assert rcs == [0, 0], "a worker failed"
    assert all("WORKER_OK" in o for o in outs), "a worker produced no result"
    assert len(promoted) == 2 and not debris, "promotion invariant violated"
    # both workers must have seen identical row counts
    counts = {o.split("WORKER_OK ")[1].strip() for o in outs if "WORKER_OK" in o}
    assert len(counts) == 1, f"divergent results: {counts}"
    print("RACE PROBE PASS")


if __name__ == "__main__":
    main()
