"""Manifest compaction (operators/index_store.py epochs): the per-file
corpus manifest must stay BOUNDED under unbounded daily ingest — old rows
roll into sealed epochs (one hash per epoch) — while every staleness/diff
decision the index families make stays exactly as safe:

- intact epoch  → contributes zero diff (O(1) manifest rows per epoch);
- broken epoch  → its surviving members re-sign (O(epoch), never O(corpus));
- vanished member → removed → the families' full-rebuild fallback fires;
- refresh == fresh-rebuild equality holds across sealing.
"""

from __future__ import annotations

import os

import pytest

from olap_sus_spark.operators import index_store as ix
from olap_sus_spark.operators import similarity as sim
from tests.test_index_refresh import (
    _DIM,
    _append_embeddings,
    _mk_corpus,
    _srp_rows,
)


# ---------------------------------------------------------------------------
# pure-unit: compact / is_current / diff


def _files(*pairs):
    return {n: [s, m] for n, s, m in pairs}


def test_compact_seals_oldest_and_bounds_loose(monkeypatch):
    monkeypatch.setattr(ix, "EPOCH_KEEP", 2)
    monkeypatch.setattr(ix, "EPOCH_SIZE", 2)
    cur = _files(("a", 1, 10), ("b", 1, 20), ("c", 1, 30), ("d", 1, 40), ("e", 1, 50))
    man = ix.compact_manifest(None, cur)
    assert len(man["files"]) <= 2
    sealed = sorted(n for e in man["epochs"] for n in e["names"])
    assert sealed == ["a", "b", "c"]  # oldest by mtime sealed first
    assert set(man["files"]) == {"d", "e"}
    # sealed + loose exactly covers current, and the result is current
    assert ix.manifest_is_current(man, cur)


def test_compact_carries_intact_epochs_and_reloosens_broken(monkeypatch):
    monkeypatch.setattr(ix, "EPOCH_KEEP", 2)
    monkeypatch.setattr(ix, "EPOCH_SIZE", 2)
    cur = _files(("a", 1, 10), ("b", 1, 20), ("c", 1, 30), ("d", 1, 40))
    man = ix.compact_manifest(None, cur)
    assert man["epochs"]
    # unchanged corpus: epochs carried forward verbatim
    again = ix.compact_manifest(man, cur)
    assert again["epochs"][0] == man["epochs"][0]
    # rewrite a sealed member: its epoch is dropped and members re-loosen /
    # re-seal from current identities
    cur2 = dict(cur, a=[2, 99])
    re = ix.compact_manifest(man, cur2)
    assert ix.manifest_is_current(re, cur2)
    assert not ix.manifest_is_current(man, cur2)


def test_diff_classifies_epoch_breakage(monkeypatch):
    monkeypatch.setattr(ix, "EPOCH_KEEP", 1)
    monkeypatch.setattr(ix, "EPOCH_SIZE", 2)
    cur = _files(("a", 1, 10), ("b", 1, 20), ("c", 1, 30))
    man = ix.compact_manifest(None, cur)
    assert {n for e in man["epochs"] for n in e["names"]} == {"a", "b"}
    # intact: appended file is the only diff
    cur_app = dict(cur, d=[1, 40])
    assert ix.manifest_diff(man, cur_app) == (["d"], [], [])
    # broken epoch (member rewritten): every member conservatively changed
    cur_rw = dict(cur, a=[9, 99])
    a, c, r = ix.manifest_diff(man, cur_rw)
    assert (a, r) == ([], []) and set(c) == {"a", "b"}
    # vanished member: removed (families fall back to full rebuild)
    cur_rm = {n: v for n, v in cur.items() if n != "a"}
    a, c, r = ix.manifest_diff(man, cur_rm)
    assert r == ["a"] and set(c) == {"b"}
    # loose-file removal still detected
    cur_rm2 = {n: v for n, v in cur.items() if n != "c"}
    assert ix.manifest_diff(man, cur_rm2)[2] == ["c"]


def test_uncompacted_manifest_still_reads(monkeypatch):
    """Backward compat: pre-epoch manifests ({"files": ...} only) keep
    working through the new helpers."""
    cur = _files(("a", 1, 10), ("b", 1, 20))
    man = {"files": {n: list(v) for n, v in cur.items()}}
    assert ix.manifest_is_current(man, cur)
    assert ix.manifest_diff(man, dict(cur, c=[1, 30])) == (["c"], [], [])


# ---------------------------------------------------------------------------
# integration over the SRP family (the same machinery serves IVF / cluster /
# inverted — all four call the identical helpers)


def test_srp_manifest_stays_bounded_under_churn(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    monkeypatch.setattr(ix, "EPOCH_KEEP", 2)
    monkeypatch.setattr(ix, "EPOCH_SIZE", 2)
    sf = _mk_corpus(spark, tmp_path)
    sim.load_or_build_srp_index(spark, sf, dim=_DIM, n_tables=2, n_bits=4)
    for i in range(1, 7):  # six ingest "days"
        _append_embeddings(spark, sf, f"part-{i:02d}.parquet", id_shift=100000 * i)
        sim.refresh_srp_index(spark, sf, dim=_DIM, n_tables=2, n_bits=4)
    man = ix.read_manifest(sim.srp_index_path(sf, _DIM, 2, 4))
    # 7 corpus files total, loose rows bounded by KEEP + one batch of slack
    assert len(man["files"]) <= 3, man["files"]
    assert man["epochs"], "old files must have been sealed"
    sealed = {n for e in man["epochs"] for n in e["names"]}
    assert len(sealed) + len(man["files"]) == 7


def test_srp_refresh_equals_rebuild_after_sealing(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    monkeypatch.setattr(ix, "EPOCH_KEEP", 1)
    monkeypatch.setattr(ix, "EPOCH_SIZE", 2)
    sf = _mk_corpus(spark, tmp_path)
    sim.load_or_build_srp_index(spark, sf, dim=_DIM, n_tables=2, n_bits=4)
    for i in range(1, 4):
        _append_embeddings(spark, sf, f"part-{i:02d}.parquet", id_shift=100000 * i)
        got = _srp_rows(sim.refresh_srp_index(spark, sf, dim=_DIM, n_tables=2, n_bits=4))
    man = ix.read_manifest(sim.srp_index_path(sf, _DIM, 2, 4))
    assert man["epochs"]
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx_fresh"))
    fresh = sim.load_or_build_srp_index(spark, sf, dim=_DIM, n_tables=2, n_bits=4)
    assert got == _srp_rows(fresh)


def test_srp_sealed_file_rewrite_resigns_epoch_only(spark, tmp_path, monkeypatch):
    """Rewriting a SEALED part file re-signs its epoch's members (the
    deliberate O(epoch) trade) and the refreshed index still equals a
    fresh rebuild; partitions outside the epoch keep their bytes."""
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    monkeypatch.setattr(ix, "EPOCH_KEEP", 1)
    monkeypatch.setattr(ix, "EPOCH_SIZE", 2)
    sf = _mk_corpus(spark, tmp_path)
    sim.load_or_build_srp_index(spark, sf, dim=_DIM, n_tables=2, n_bits=4)
    for i in range(1, 4):
        _append_embeddings(spark, sf, f"part-{i:02d}.parquet", id_shift=100000 * i)
        sim.refresh_srp_index(spark, sf, dim=_DIM, n_tables=2, n_bits=4)
    path = sim.srp_index_path(sf, _DIM, 2, 4)
    man = ix.read_manifest(path)
    sealed = sorted(n for e in man["epochs"] for n in e["names"])
    target = sealed[-1]
    i = int(target.split("-")[1].split(".")[0]) if "-" in target else 0
    unsealed_part = os.path.join(path, f"src={sorted(man['files'])[-1]}")
    stamps = {
        f: os.path.getmtime(os.path.join(unsealed_part, f))
        for f in os.listdir(unsealed_part)
        if f.endswith(".parquet")
    }
    # rewrite the sealed file in place (different derivation)
    _append_embeddings(spark, sf, target, id_shift=100000 * i + 50000)
    got = _srp_rows(sim.refresh_srp_index(spark, sf, dim=_DIM, n_tables=2, n_bits=4))
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx_fresh"))
    fresh = sim.load_or_build_srp_index(spark, sf, dim=_DIM, n_tables=2, n_bits=4)
    assert got == _srp_rows(fresh)
    # a partition whose file stayed loose (outside the epoch) is untouched
    for f, ts in stamps.items():
        assert os.path.getmtime(os.path.join(unsealed_part, f)) == ts
