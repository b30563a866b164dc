"""Race probe for the r9 gram serving chain (partials → rollup/cut →
scrub output; operators/gramfreq.py).

Legs match the documented concurrency contract — refreshes are
single-refresher (in-place dynamic overwrite / derived-merge promote),
builds and reads are race-safe:

1. two concurrent COLD builds of the full 3-level chain → exactly one
   promoted copy per level, zero staging/tomb debris, identical counts;
2. append a part file, then ONE refresher runs refresh_gram_scrub while a
   READER hammers direct parquet reads of the scrub + cut components —
   the reader may hit the documented transient windows (rollup dir
   retire→promote swap, per-partition dynamic overwrite) but must never
   need more than one retry per iteration and must settle on the final
   state;
3. the settled scrub/cut digests equal a fresh rebuild of the grown
   corpus in a clean index root.

Usage: python tools/race_probe_gramscrub.py
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BUILDER = r"""
import sys
sys.path.insert(0, %(repo)r)
from olap_sus_spark.session import get_spark
from olap_sus_spark.operators import gramfreq as gf
spark = get_spark("race-gs-%(tag)s")
spark.sparkContext.setLogLevel("ERROR")
n = gf.load_or_build_gram_scrub(spark, %(sf)r).count()
m = gf.shared_grams_cut(spark, %(sf)r).count()
print("BUILDER_OK", n, m, flush=True)
spark.stop()
"""

REFRESHER = r"""
import sys, hashlib
sys.path.insert(0, %(repo)r)
from olap_sus_spark.session import get_spark
from olap_sus_spark.operators import gramfreq as gf
spark = get_spark("race-gs-refresh-%(tag)s")
spark.sparkContext.setLogLevel("ERROR")
gf.refresh_gram_scrub(spark, %(sf)r)
rows = sorted(tuple(r) for r in gf.load_or_build_gram_scrub(spark, %(sf)r).collect())
cut = sorted(r[0] for r in gf.shared_grams_cut(spark, %(sf)r).collect())
print("REFRESHER_OK",
      hashlib.md5(repr(rows).encode()).hexdigest()[:12],
      hashlib.md5(repr(cut).encode()).hexdigest()[:12],
      flush=True)
spark.stop()
"""

READER = r"""
import sys, time
sys.path.insert(0, %(repo)r)
from olap_sus_spark.session import get_spark
from olap_sus_spark.operators import gramfreq as gf
spark = get_spark("race-gs-reader")
spark.sparkContext.setLogLevel("ERROR")
spath, rpath = gf.scrub_path(%(sf)r), gf.rollup_path(%(sf)r)
iters = retries = 0
deadline = time.time() + %(secs)d
while time.time() < deadline:
    iters += 1
    for path, comp in ((spath, "docs"), (rpath, "cut")):
        try:
            spark.read.parquet(path + "/" + comp).count()
        except Exception:
            retries += 1
            time.sleep(0.05)
            try:
                spark.read.parquet(path + "/" + comp).count()
            except Exception:
                print("READER_DOUBLE_FAIL", flush=True)
print("READER_OK iters=%%d retries=%%d" %% (iters, retries), flush=True)
spark.stop()
"""


def _run(script: str, env: dict, **fmt) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, "-c", script % fmt],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )


def main() -> None:
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    work = tempfile.mkdtemp(prefix="race_gs_corpus_")
    sf = os.path.join(work, "sf")
    os.makedirs(os.path.join(sf, "documents.parquet"))
    shutil.copy(
        os.path.join(base, "documents.parquet"),
        os.path.join(sf, "documents.parquet", "part-00.parquet"),
    )
    root = tempfile.mkdtemp(prefix="race_gs_idx_")
    env = dict(os.environ, SPARK_GRAFT_INDEX_DIR=root, SPARK_GRAFT_DRIVER_MEM="4g")

    # Leg 1: two concurrent cold 3-level builds.
    t0 = time.perf_counter()
    procs = [_run(BUILDER, env, repo=REPO, sf=sf, tag=i) for i in range(2)]
    outs = [p.communicate()[0] for p in procs]
    rcs = [p.returncode for p in procs]
    print(f"cold builders done in {time.perf_counter() - t0:.1f}s rcs={rcs}")
    for i, o in enumerate(outs):
        ok = [ln for ln in o.splitlines() if ln.startswith("BUILDER_OK")]
        print(f"builder {i}: {ok[0] if ok else 'NO OK LINE'}")
    entries = sorted(os.listdir(root))
    debris = [e for e in entries if ".__build__" in e or e.endswith(".stale")]
    promoted = [e for e in entries if e not in debris]
    print(f"index root: promoted={promoted} debris={debris}")
    assert rcs == [0, 0] and all("BUILDER_OK" in o for o in outs)
    kinds = {e.split("_")[0] for e in promoted}
    assert len(promoted) == 3 and kinds == {"gramfreq", "gramrollup", "gramscrub"}, (
        "expected exactly one promoted dir per level"
    )
    assert not debris, "staging/tomb debris left"
    counts = {o.split("BUILDER_OK ")[1].strip() for o in outs}
    assert len(counts) == 1, f"divergent builds: {counts}"

    # Leg 2: append, then ONE refresher + a hammering reader.
    shutil.copy(
        os.path.join(base, "documents.parquet"),
        os.path.join(sf, "documents.parquet", "part-01.parquet"),
    )
    reader = _run(READER, env, repo=REPO, sf=sf, secs=45)
    refresher = _run(REFRESHER, env, repo=REPO, sf=sf, tag="r")
    r_out = refresher.communicate()[0]
    reader_out = reader.communicate()[0]
    ok = [ln for ln in r_out.splitlines() if ln.startswith("REFRESHER_OK")]
    rd = [ln for ln in reader_out.splitlines() if ln.startswith("READER_OK")]
    print(f"refresher: {ok[0] if ok else 'NO OK LINE'}")
    print(f"reader: {rd[0] if rd else 'NO OK LINE'}")
    assert refresher.returncode == 0 and ok, "refresher failed"
    assert reader.returncode == 0 and rd, "reader failed"
    assert "READER_DOUBLE_FAIL" not in reader_out, "reader needed >1 retry"

    # Leg 3: fresh rebuild in a clean root must match the refreshed state.
    env2 = dict(env, SPARK_GRAFT_INDEX_DIR=tempfile.mkdtemp(prefix="race_gs_fresh_"))
    p = _run(REFRESHER, env2, repo=REPO, sf=sf, tag="fresh")
    out = p.communicate()[0]
    assert p.returncode == 0, "fresh rebuild failed"
    fresh = [ln for ln in out.splitlines() if ln.startswith("REFRESHER_OK")][0]
    print(f"fresh: {fresh}")
    assert fresh.split()[1:] == ok[0].split()[1:], "refreshed state != fresh rebuild"
    entries = sorted(os.listdir(root))
    debris = [e for e in entries if ".__build__" in e or e.endswith(".stale")]
    assert not debris, f"debris left: {debris}"
    print("GRAMSCRUB RACE PROBE PASS")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
