"""Two-process race probe for the month-swap REFRESH choreography
(operators/maintained.refresh_partials, round 6): two separate Spark
drivers concurrently refresh the SAME day of the SAME maintained KMV cube
while serving it between refreshes — the refresh-vs-refresh and
refresh-vs-serve interleavings the stage-and-swap was built for.

Pass criteria:
- every worker finishes green; a serve is allowed AT MOST ONE transient
  retry per iteration (the two-renames-per-month swap window is real and
  documented — readers retry, they never see partial/merged data);
- both workers' final served values are identical AND equal a fresh
  rebuild in a clean index root (refresh races never corrupt);
- no staging/tomb debris afterwards.

Usage: python tools/race_probe_refresh.py
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
spark = get_spark("race-refresh-%(tag)s")
spark.sparkContext.setLogLevel("ERROR")
sf = %(sf)r
day = %(day)r
retries = 0
val = None
for it in range(5):
    sk.refresh_orderkey_kmv(spark, sf, [day])
    try:
        val = sorted(tuple(r) for r in sk.kmv_distinct_orders_served(spark, sf).collect())
    except Exception:
        retries += 1  # transient swap window: retry once, must succeed
        val = sorted(tuple(r) for r in sk.kmv_distinct_orders_served(spark, sf).collect())
import hashlib
digest = hashlib.md5(repr(val).encode()).hexdigest()[:12]
print("WORKER_OK", digest, "retries=%%d" %% retries, flush=True)
spark.stop()
"""


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    root = tempfile.mkdtemp(prefix="race_probe_refresh_")
    env = dict(os.environ, SPARK_GRAFT_INDEX_DIR=root, SPARK_GRAFT_DRIVER_MEM="4g")

    # pre-build once so both workers race the REFRESH path, not the build
    pre = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys; sys.path.insert(0, %r)\n"
            "from olap_sus_spark.session import get_spark\n"
            "from olap_sus_spark.queries import sketches as sk\n"
            "s = get_spark('race-refresh-pre'); s.sparkContext.setLogLevel('ERROR')\n"
            "p = sk.load_or_build_orderkey_kmv(s, %r)\n"
            "print('DAY', str(p.select('dia').orderBy('dia').first()[0]))\n"
            "s.stop()" % (REPO, sf),
        ],
        env=env,
        capture_output=True,
        text=True,
    )
    day_lines = [ln for ln in pre.stdout.splitlines() if ln.startswith("DAY ")]
    assert day_lines, f"pre-build failed:\n{pre.stdout}\n{pre.stderr}"
    day = day_lines[0].split()[1]

    t0 = time.perf_counter()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER % {"repo": REPO, "sf": sf, "tag": i, "day": day}],
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
        assert ok, f"worker {i} died:\n{out}"
        digests.append(ok[0].split()[1])
        print(f"worker {i}: {ok[0]}")
    assert digests[0] == digests[1], f"divergent serves {digests}"
    print(f"refresh race: identical digest {digests[0]}, {time.perf_counter() - t0:.1f}s")

    # ground truth: fresh rebuild in a clean root must serve the same values
    clean = tempfile.mkdtemp(prefix="race_probe_refresh_clean_")
    truth = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys, hashlib; sys.path.insert(0, %r)\n"
            "from olap_sus_spark.session import get_spark\n"
            "from olap_sus_spark.queries import sketches as sk\n"
            "s = get_spark('race-refresh-truth'); s.sparkContext.setLogLevel('ERROR')\n"
            "v = sorted(tuple(r) for r in sk.kmv_distinct_orders_served(s, %r).collect())\n"
            "print('TRUTH', hashlib.md5(repr(v).encode()).hexdigest()[:12])\n"
            "s.stop()" % (REPO, sf),
        ],
        env=dict(env, SPARK_GRAFT_INDEX_DIR=clean),
        capture_output=True,
        text=True,
    )
    truth_lines = [ln for ln in truth.stdout.splitlines() if ln.startswith("TRUTH ")]
    assert truth_lines, f"truth build failed:\n{truth.stdout}\n{truth.stderr}"
    assert truth_lines[0].split()[1] == digests[0], "raced refresh diverged from rebuild"
    print("raced refresh == fresh rebuild")

    debris = []
    for dirpath, dirs, _ in os.walk(root):
        for d in dirs:
            if "__build__" in d or d.endswith(".stale"):
                debris.append(os.path.join(dirpath, d))
    assert not debris, f"staging/tomb debris left behind: {debris}"
    print("no staging/tomb debris; PROBE PASS")


if __name__ == "__main__":
    main()
