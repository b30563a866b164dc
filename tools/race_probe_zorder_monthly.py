"""Cross-process race probe for the MONTHLY z-layout maintenance
(sources/zorder.refresh_zorder_monthly over the maintained-partials month
swap) — VERDICT r07 #3.  The global z-copy has race coverage
(tools/race_probe_refresh.py exercises the shared refresh_partials
choreography on the KMV cube); this probe drives the monthly z-layout's
OWN surfaces, which add the persisted Morton-domain sidecar and the
(mes_dt,_z) range-exchange layout hook:

- two WRITER processes concurrently refresh the SAME day of the SAME
  layout while serving the box aggregate between refreshes
  (refresh-vs-refresh and refresh-vs-serve interleavings);
- one pure READER process serves the box aggregate in a loop the whole
  time (reader-vs-swap window);
- afterwards: all final serves identical AND equal a fresh rebuild in a
  clean index root; the _zdomain.json sidecar survives intact; no
  staging/tomb debris.

Pass criteria match the maintained-partials contract: a serve may hit AT
MOST ONE transient retry per iteration (the two-renames-per-month window
is documented — readers retry the action, they never see partial or
merged data).

Usage: python tools/race_probe_zorder_monthly.py
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SERVE = """
def serve():
    import olap_sus_spark.queries  # populate registry
    from olap_sus_spark.registry import QUERIES
    return sorted(tuple(r) for r in QUERIES["zorder_box_revenue"](spark, sf).collect())
"""

WRITER = r"""
import sys, os, hashlib
sys.path.insert(0, %(repo)r)
from olap_sus_spark.session import get_spark
from olap_sus_spark.sources import zorder as zo
spark = get_spark("race-zm-w%(tag)s")
spark.sparkContext.setLogLevel("ERROR")
sf = %(sf)r
day = %(day)r
%(serve)s
retries = 0
val = None
for it in range(5):
    zo.refresh_zorder_monthly(spark, sf, "lineitem", "l_partkey", "l_suppkey", "l_shipdate", [day])
    try:
        val = serve()
    except Exception:
        retries += 1  # transient swap window: retry once, must succeed
        val = serve()
digest = hashlib.md5(repr(val).encode()).hexdigest()[:12]
print("WORKER_OK", digest, "retries=%%d" %% retries, flush=True)
spark.stop()
"""

READER = r"""
import sys, os, hashlib, time
sys.path.insert(0, %(repo)r)
from olap_sus_spark.session import get_spark
spark = get_spark("race-zm-reader")
spark.sparkContext.setLogLevel("ERROR")
sf = %(sf)r
%(serve)s
retries = 0
deadline = time.time() + %(secs)d
val = None
it = 0
while time.time() < deadline:
    it += 1
    try:
        val = serve()
    except Exception:
        retries += 1  # at most one transient retry per iteration
        val = serve()
digest = hashlib.md5(repr(val).encode()).hexdigest()[:12]
print("READER_OK", digest, "iters=%%d retries=%%d" %% (it, retries), flush=True)
spark.stop()
"""

TRUTH = r"""
import sys, hashlib
sys.path.insert(0, %(repo)r)
from olap_sus_spark.session import get_spark
spark = get_spark("race-zm-truth")
spark.sparkContext.setLogLevel("ERROR")
sf = %(sf)r
%(serve)s
print("TRUTH", hashlib.md5(repr(serve()).encode()).hexdigest()[:12], flush=True)
spark.stop()
"""


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    root = tempfile.mkdtemp(prefix="race_probe_zm_")
    env = dict(os.environ, SPARK_GRAFT_INDEX_DIR=root, SPARK_GRAFT_DRIVER_MEM="4g")

    # pre-build once so the writers race the REFRESH path, not the build,
    # and grab a day inside the layout's month domain
    pre = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys; sys.path.insert(0, %r)\n"
            "from olap_sus_spark.session import get_spark\n"
            "from olap_sus_spark.sources import zorder as zo\n"
            "from olap_sus_spark.catalog import load_table\n"
            "import pyspark.sql.functions as F\n"
            "s = get_spark('race-zm-pre'); s.sparkContext.setLogLevel('ERROR')\n"
            "zo.load_or_build_zorder_monthly(s, %r, 'lineitem', 'l_partkey', 'l_suppkey', 'l_shipdate')\n"
            "d = load_table(s, %r, 'lineitem').agg(F.min('l_shipdate')).first()[0]\n"
            "print('DAY', str(d))\n"
            "s.stop()" % (REPO, sf, sf),
        ],
        env=env,
        capture_output=True,
        text=True,
    )
    day_lines = [ln for ln in pre.stdout.splitlines() if ln.startswith("DAY ")]
    assert day_lines, f"pre-build failed:\n{pre.stdout}\n{pre.stderr}"
    day = day_lines[0].split()[1]

    t0 = time.perf_counter()
    writers = [
        subprocess.Popen(
            [
                sys.executable,
                "-c",
                WRITER % {"repo": REPO, "sf": sf, "tag": i, "day": day, "serve": _SERVE},
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    reader = subprocess.Popen(
        [
            sys.executable,
            "-c",
            READER % {"repo": REPO, "sf": sf, "serve": _SERVE, "secs": 60},
        ],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    outs = [p.communicate()[0] for p in writers]
    reader_out = reader.communicate()[0]
    digests = []
    for i, out in enumerate(outs):
        ok = [ln for ln in out.splitlines() if ln.startswith("WORKER_OK")]
        assert ok, f"writer {i} died:\n{out}"
        digests.append(ok[0].split()[1])
        print(f"writer {i}: {ok[0]}")
    rok = [ln for ln in reader_out.splitlines() if ln.startswith("READER_OK")]
    assert rok, f"reader died:\n{reader_out}"
    print(f"reader:   {rok[0]}")
    digests.append(rok[0].split()[1])
    assert len(set(digests)) == 1, f"divergent serves {digests}"
    print(f"zorder-monthly race: identical digest {digests[0]}, {time.perf_counter() - t0:.1f}s")

    # Morton-domain sidecar must have survived every swap
    from glob import glob

    sidecars = glob(os.path.join(root, "**", "_zdomain.json"), recursive=True)
    assert sidecars, "Morton-domain sidecar missing after the race"
    print(f"domain sidecar intact: {sidecars[0]}")

    # ground truth: fresh rebuild in a clean root serves the same values
    clean = tempfile.mkdtemp(prefix="race_probe_zm_clean_")
    truth = subprocess.run(
        [sys.executable, "-c", TRUTH % {"repo": REPO, "sf": sf, "serve": _SERVE}],
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
