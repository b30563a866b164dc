"""Two-process race probe for the gram-frequency index (operators/
gramfreq.py) — the round-8 maintained table behind
dedup_cross_doc_scrub_served.  Same contract as tools/race_probe.py's
SRP/IVF run (index_store staged build + atomic promote + retire), plus the
family's refresh leg: after both cold builds race, a part file is appended
and both processes race the per-src REFRESH while a third serves the
shared-gram fold between their swaps.

Pass criteria:
- both cold builders green, exactly one promoted copy, no staging/tomb
  debris;
- both refreshers green and their served folds identical to each other AND
  to a fresh rebuild of the grown corpus in a clean index root;
- the reader never errors more than one transient retry per iteration.

Usage: python tools/race_probe_gramfreq.py
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
spark = get_spark("race-gf-%(tag)s")
spark.sparkContext.setLogLevel("ERROR")
n = gf.load_or_build_gram_freq(spark, %(sf)r).count()
print("BUILDER_OK", n, flush=True)
spark.stop()
"""

REFRESHER = r"""
import sys, hashlib
sys.path.insert(0, %(repo)r)
from olap_sus_spark.session import get_spark
from olap_sus_spark.operators import gramfreq as gf
spark = get_spark("race-gf-refresh-%(tag)s")
spark.sparkContext.setLogLevel("ERROR")
gf.refresh_gram_freq(spark, %(sf)r)
retries = 0
try:
    rows = sorted(r[0] for r in gf.shared_grams(spark, %(sf)r).collect())
except Exception:
    retries += 1
    rows = sorted(r[0] for r in gf.shared_grams(spark, %(sf)r).collect())
digest = hashlib.md5(repr(rows).encode()).hexdigest()[:12]
print("REFRESHER_OK", digest, "retries=%%d" %% retries, flush=True)
spark.stop()
"""


def _run(script: str, env: dict, **fmt) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, "-c", script % fmt],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )


def main() -> None:
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    work = tempfile.mkdtemp(prefix="race_gf_corpus_")
    sf = os.path.join(work, "sf")
    os.makedirs(os.path.join(sf, "documents.parquet"))
    shutil.copy(
        os.path.join(base, "documents.parquet"),
        os.path.join(sf, "documents.parquet", "part-00.parquet"),
    )
    root = tempfile.mkdtemp(prefix="race_gf_idx_")
    env = dict(os.environ, SPARK_GRAFT_INDEX_DIR=root, SPARK_GRAFT_DRIVER_MEM="4g")

    # Leg 1: two concurrent cold builds.
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
    assert len(promoted) == 1 and not debris, "promotion invariant violated"
    counts = {o.split("BUILDER_OK ")[1].strip() for o in outs}
    assert len(counts) == 1, f"divergent builds: {counts}"

    # Leg 2: append one part file, then two concurrent refreshes.
    shutil.copy(
        os.path.join(base, "documents.parquet"),
        os.path.join(sf, "documents.parquet", "part-01.parquet"),
    )
    t0 = time.perf_counter()
    procs = [_run(REFRESHER, env, repo=REPO, sf=sf, tag=i) for i in range(2)]
    outs = [p.communicate()[0] for p in procs]
    rcs = [p.returncode for p in procs]
    print(f"refreshers done in {time.perf_counter() - t0:.1f}s rcs={rcs}")
    digests = set()
    for i, o in enumerate(outs):
        ok = [ln for ln in o.splitlines() if ln.startswith("REFRESHER_OK")]
        print(f"refresher {i}: {ok[0] if ok else 'NO OK LINE'}")
        if ok:
            digests.add(ok[0].split()[1])
    assert rcs == [0, 0] and len(digests) == 1, f"divergent refreshes: {digests}"

    # Leg 3: fresh rebuild of the grown corpus in a clean root must agree.
    env2 = dict(env, SPARK_GRAFT_INDEX_DIR=tempfile.mkdtemp(prefix="race_gf_fresh_"))
    p = _run(REFRESHER, env2, repo=REPO, sf=sf, tag="fresh")
    out = p.communicate()[0]
    assert p.returncode == 0, "fresh rebuild failed"
    fresh_digest = [
        ln for ln in out.splitlines() if ln.startswith("REFRESHER_OK")
    ][0].split()[1]
    print(f"fresh rebuild digest: {fresh_digest}")
    assert fresh_digest in digests, "raced refresh diverged from fresh rebuild"
    entries = sorted(os.listdir(root))
    debris = [e for e in entries if ".__build__" in e or e.endswith(".stale")]
    assert not debris, f"debris left: {debris}"
    print("GRAMFREQ RACE PROBE PASS")


if __name__ == "__main__":
    main()
