"""Two-process race probe for the two r10 maintained families — the
semantic-dedup index (codebook + assignments + verdicts under one staged
root) and the per-source quality histogram: two separate Spark drivers
concurrently serve the SAME index, first cold (both build, one promotion
wins, the loser discards), then against a STALE manifest (both take the
retire-then-promote path — the race `_retire_and_promote`'s freshness
re-check exists for).

Pass criteria: every worker finishes green with IDENTICAL served values,
and the index root holds no staging (``__build__``) or tomb (``.stale``)
debris afterwards.

Usage: python tools/race_probe_semantic.py
"""

from __future__ import annotations

import json
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
from olap_sus_spark.operators import qualhist as qh
from olap_sus_spark.operators import similarity as sim
spark = get_spark("race-sem-%(tag)s")
spark.sparkContext.setLogLevel("ERROR")
a = sorted(tuple(r) for r in
           sim.load_or_build_semantic_index(spark, %(sf)r).collect())
b = sorted(tuple(r) for r in
           qh.load_or_build_quality_hist(spark, %(sf)r).collect())
import hashlib
digest = hashlib.md5(repr((a, b)).encode()).hexdigest()[:12]
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
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    root = tempfile.mkdtemp(prefix="race_probe_sem_")
    env = dict(os.environ, SPARK_GRAFT_INDEX_DIR=root, SPARK_GRAFT_DRIVER_MEM="4g")

    d1 = _race(env, sf, "cold race (both build)")

    # corrupt every manifest's file map -> both workers see a stale index
    # and race through retire-then-promote
    stale = 0
    for dirpath, _, files in os.walk(root):
        if "_corpus_manifest.json" in files:
            p = os.path.join(dirpath, "_corpus_manifest.json")
            man = json.load(open(p))
            man["files"] = {"junk.parquet": [0, 0]}
            man["epochs"] = []
            with open(p, "w") as f:
                json.dump(man, f)
            stale += 1
    assert stale >= 2, f"expected both families' manifests, found {stale}"
    d2 = _race(env, sf, f"stale-manifest race ({stale} indexes retired)")
    assert d1 == d2, "rebuild after stale manifest changed served values"

    debris = []
    for dirpath, dirs, _ in os.walk(root):
        for d in dirs:
            if "__build__" in d or d.endswith(".stale"):
                debris.append(os.path.join(dirpath, d))
    assert not debris, f"staging/tomb debris left behind: {debris}"
    print("no staging/tomb debris; PROBE PASS")


if __name__ == "__main__":
    main()
