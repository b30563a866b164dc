"""Unit tests for the maintained-index persistence contract
(operators/index_store.py) and its consumers' recovery behavior —
especially the quarantine-then-verify path that ADVICE round 3 flagged
(a partial-looking index dir must never be deleted if a concurrent
builder promoted a complete one into place)."""

from __future__ import annotations

import os
import shutil

from olap_sus_spark.operators import index_store as ix


def test_promote_never_deletes_live_destination(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    path = str(tmp_path / "idx_live")
    os.makedirs(os.path.join(path, "assignments"))
    staging = ix.staging_path(path)
    os.makedirs(staging)
    open(os.path.join(staging, "marker"), "w").write("loser")
    ix.promote(staging, path)  # race loser
    assert os.path.exists(os.path.join(path, "assignments"))  # live untouched
    assert not os.path.exists(staging)  # loser's copy reaped


def test_promote_renames_into_empty_slot(tmp_path):
    path = str(tmp_path / "idx_new")
    staging = ix.staging_path(path)
    os.makedirs(staging)
    open(os.path.join(staging, "marker"), "w").write("winner")
    ix.promote(staging, path)
    assert open(os.path.join(path, "marker")).read() == "winner"
    assert not os.path.exists(staging)


def test_sweep_reaps_only_stale_staging(tmp_path, monkeypatch):
    import time

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    old = str(tmp_path / "x.__build__123_dead")
    fresh = str(tmp_path / "y.__build__456_live")
    live_index = str(tmp_path / "srp_abc")
    for d in (old, fresh, live_index):
        os.makedirs(d)
    past = time.time() - 7200
    os.utime(old, (past, past))
    ix.sweep_stale_staging(max_age_sec=3600)
    assert not os.path.exists(old)
    assert os.path.exists(fresh)
    assert os.path.exists(live_index)


def test_corpus_stamp_tracks_part_file_rewrites(tmp_path):
    src = tmp_path / "sf" / "documents.parquet"
    src.mkdir(parents=True)
    (src / "part-0").write_bytes(b"aaaa")
    s1 = ix.corpus_stamp(str(tmp_path / "sf"), "documents")
    (src / "part-0").write_bytes(b"bbbb-longer")  # in-place rewrite
    s2 = ix.corpus_stamp(str(tmp_path / "sf"), "documents")
    assert s1 != s2
    assert ix.corpus_stamp(str(tmp_path / "nope"), "documents") == "na"


def test_ivf_loader_restores_concurrently_completed_index(spark, tmp_path, monkeypatch):
    """The ADVICE race: the loader sees a partial dir, but by the time it
    acts a complete index exists.  Simulate by pre-building the real index,
    then removing one component and planting a COMPLETE copy under the
    exact path again before the loader's delete can run — the quarantine
    rename must verify completeness and keep serving rather than rebuild.
    Here we exercise the two reachable outcomes: (a) complete index reused
    untouched, (b) verified-partial index quarantined + rebuilt."""
    from olap_sus_spark.operators import similarity as sim
    from tests.conftest import SF_DIR

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    a1, c1 = sim.load_or_build_ivf_index(spark, SF_DIR, num_centroids=4)
    path = sim.ivf_index_path(SF_DIR, 4)
    stamp = os.path.getmtime(path)
    # (a) complete: loader must not touch it
    sim.load_or_build_ivf_index(spark, SF_DIR, num_centroids=4)
    assert os.path.getmtime(path) == stamp
    # (b) partial: centroids missing -> quarantine + rebuild, never an
    # in-place rmtree of the live path name while readers might resolve it
    shutil.rmtree(os.path.join(path, "centroids"))
    a2, c2 = sim.load_or_build_ivf_index(spark, SF_DIR, num_centroids=4)
    assert os.path.exists(os.path.join(path, "centroids"))
    assert c2.count() == 4
    # no quarantine/staging debris left behind
    leftovers = [e for e in os.listdir(tmp_path) if ".__build__" in e]
    assert leftovers == []
