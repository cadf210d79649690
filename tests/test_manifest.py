"""Manifest lifecycle unit tests (no Spark): the vacuum grace clock runs
from SUPERSESSION, not file creation, and retained generations keep their
files so time-travel reads stay resolvable."""

import os
import time

from eventstore_spark import manifest


def _touch(path, name, age_s=0.0):
    full = os.path.join(path, name)
    with open(full, "w") as f:
        f.write("x")
    if age_s:
        old = time.time() - age_s
        os.utime(full, (old, old))
    return full


def test_vacuum_grace_runs_from_supersession(tmp_path):
    path = str(tmp_path / "log")
    os.makedirs(path)
    a = _touch(path, "a.parquet")
    b = _touch(path, "b.parquet")
    manifest.append_files(path, ["a.parquet", "b.parquet"])
    # age the DATA files and manifest 0 a day: creation age must not matter
    day = time.time() - 86400
    for p in (a, b, os.path.join(path, "_manifest", "manifest-0000000000.json")):
        os.utime(p, (day, day))

    # a rewrite NOW supersedes them (manifest 1, fresh)
    _touch(path, "c.parquet")
    manifest.replace_snapshot(path, ["c.parquet"])

    # grace 1h: superseded only milliseconds ago → day-old files SURVIVE,
    # and the superseded generation stays time-travel-resolvable
    res = manifest.vacuum(path, grace_s=3600)
    assert res == {"removed": 0, "manifests_removed": 0}
    assert os.path.exists(a) and os.path.exists(b)
    assert manifest.files_at(path, 0) == ["a.parquet", "b.parquet"]

    # grace 0: generation 0 drains — its files and its manifest go, the
    # current generation is untouched
    res = manifest.vacuum(path, grace_s=0)
    assert res["removed"] == 2 and res["manifests_removed"] == 1
    assert not os.path.exists(a) and not os.path.exists(b)
    assert os.path.exists(os.path.join(path, "c.parquet"))
    assert manifest.history(path) == [1]
    assert manifest.files_at(path, 0) is None


def test_vacuum_keeps_files_shared_with_retained_generations(tmp_path):
    """A file referenced by BOTH a drained and a retained generation must
    survive (the keep-set is the union over retained manifests)."""
    path = str(tmp_path / "log")
    os.makedirs(path)
    shared = _touch(path, "shared.parquet", age_s=86400)
    only_old = _touch(path, "only_old.parquet", age_s=86400)
    manifest.append_files(path, ["shared.parquet", "only_old.parquet"])
    day = time.time() - 86400
    os.utime(os.path.join(path, "_manifest", "manifest-0000000000.json"), (day, day))
    # generation 1 drops only_old but keeps shared; make it LOOK old too,
    # but current generations are always retained
    manifest.replace_snapshot(path, ["shared.parquet"])
    res = manifest.vacuum(path, grace_s=0)
    assert os.path.exists(shared)
    assert not os.path.exists(only_old)
    assert res["removed"] == 1


def test_replace_snapshot_cas_against_base_generation(tmp_path):
    """A rewrite computed from generation N must fail its publish if an
    append moved the snapshot to N+1 meanwhile — losing the race loudly
    instead of silently dropping the appended file."""
    import pytest

    from eventstore_spark.manifest import ManifestConflictError

    path = str(tmp_path / "log")
    os.makedirs(path)
    _touch(path, "a.parquet")
    manifest.append_files(path, ["a.parquet"])
    seq, _files = manifest.latest(path)  # rewrite snapshots here
    _touch(path, "b.parquet")
    manifest.append_files(path, ["b.parquet"])  # concurrent append wins
    with pytest.raises(ManifestConflictError):
        manifest.replace_snapshot(path, ["rewrite.parquet"], base_seq=seq)
    assert set(manifest.snapshot_files(path)) == {"a.parquet", "b.parquet"}


def test_scavenge_racing_append_conflicts_and_unwinds(spark, tmp_path, monkeypatch):
    """End-to-end maintenance race: an append lands between scavenge's
    snapshot read and its publish → the scavenge raises, the appended
    event survives, and no half-published rewrite files remain in the
    snapshot or on disk."""
    import pytest

    from eventstore_spark import maintenance
    from eventstore_spark.manifest import ManifestConflictError
    from eventstore_spark.writer import EventLogWriter, ProposedEvent

    path = str(tmp_path / "log")
    w = EventLogWriter(spark, path)
    w.append("acct-1", [ProposedEvent("A", "{}"), ProposedEvent("B", "{}")])

    orig = maintenance._read_snapshot

    def racy(spark_, path_):
        df, seq = orig(spark_, path_)
        w.append("race-1", [ProposedEvent("C", "{}")])  # after the snapshot
        return df, seq

    monkeypatch.setattr(maintenance, "_read_snapshot", racy)
    with pytest.raises(ManifestConflictError):
        maintenance.scavenge(spark, path)
    monkeypatch.setattr(maintenance, "_read_snapshot", orig)

    assert w.load().where("stream_id = 'race-1'").count() == 1
    assert not [n for n in os.listdir(path) if n.startswith("part-scavenge")]
    # and a CLEAN re-run (no race) succeeds from the new snapshot
    stats = maintenance.scavenge(spark, path)
    assert stats["events_after"] == 3
    assert w.load().count() == 3


def test_archiving_transparent_reads_and_retention(spark, tmp_path):
    """Cold-tier archiving (reference archiving.md): cold files upload to
    the archive, reads reach through transparently before AND after the
    hot copies drain, the checkpoint records archived history, and a new
    subscription below the checkpoint fails loudly instead of silently
    skipping archived events."""
    import pytest

    from eventstore_spark.engine import EventStoreEngine
    from eventstore_spark.streaming.subscriptions import subscribe_all
    from eventstore_spark.writer import ProposedEvent

    store = str(tmp_path / "log")
    cold = str(tmp_path / "cold")
    eng = EventStoreEngine(spark, store)
    for i in range(6):  # one commit file per append
        eng.append(f"acct-{i % 2}", [ProposedEvent("E", f'{{"i": {i}}}')])
    before = [(r.log_position, r.stream_id)
              for r in eng.events().orderBy("log_position").collect()]

    stats = eng.archive_cold(cold, keep_files=2)
    assert stats["uploaded"] == 4 and stats["checkpoint"] == 4
    # hot copies still present → reads unchanged, nothing dropped yet
    assert [(r.log_position, r.stream_id)
            for r in eng.events().orderBy("log_position").collect()] == before
    assert eng.drop_archived_local(grace_s=3600)["removed"] == 0  # grace holds

    # drain the hot copies; reads now resolve through the archive
    assert eng.drop_archived_local(grace_s=0)["removed"] == 4
    assert [(r.log_position, r.stream_id)
            for r in eng.events().orderBy("log_position").collect()] == before
    assert eng.read_stream("acct-0").count() == 3
    st = eng.store_statistics()
    assert st["archived_files"] == 4 and st["archive_checkpoint"] == 4
    assert st["archived_bytes"] > 0

    # appends continue normally on the hot tier
    eng.append("acct-0", [ProposedEvent("E", '{"i": 99}')])
    assert eng.events().count() == 7

    # re-running is idempotent for already-archived names
    again = eng.archive_cold(cold, keep_files=2)
    assert again["archived_total"] >= 4

    # streaming the archived history must fail loudly...
    with pytest.raises(ValueError):
        subscribe_all(spark, store)
    # ...but subscribing past the (latest) checkpoint works
    s = subscribe_all(spark, store, from_position=again["checkpoint"] + 1)
    assert s.isStreaming


def test_backup_restore_differential_and_consistent(spark, tmp_path):
    """Online manifest-pinned backup (reference backup.md translated):
    the backup copies exactly the pinned generation's files (superseded
    pre-vacuum files are never included), a second backup copies only
    the delta and prunes dropped names, and restore into a fresh dir
    reproduces the store bit-for-bit — while refusing a non-empty
    destination."""
    import pytest

    from eventstore_spark.engine import EventStoreEngine
    from eventstore_spark.maintenance import backup, restore
    from eventstore_spark.writer import ProposedEvent

    store, bdir, rdir = (str(tmp_path / d) for d in ("log", "bak", "rest"))
    eng = EventStoreEngine(spark, store)
    for i in range(4):
        eng.append(f"acct-{i % 2}", [ProposedEvent("E", f'{{"i": {i}}}')])
    eng.set_stream_metadata("acct-0", max_count=1)
    eng.scavenge()  # both generations now on disk (pre-vacuum)

    s1 = backup(store, bdir)
    # only the pinned (post-scavenge) generation was copied
    import os as _os

    from eventstore_spark import manifest as M

    assert sorted(
        n for n in _os.listdir(bdir) if n.endswith(".parquet")
    ) == sorted(M.snapshot_files(store))
    assert s1["copied"] > 0 and s1["skipped"] == 0

    # differential: new append → second backup copies just the delta
    eng.append("acct-1", [ProposedEvent("E", '{"i": 99}')])
    s2 = backup(store, bdir)
    assert s2["copied"] == 1 and s2["skipped"] >= s1["copied"]

    want = [(r.log_position, r.stream_id, r.event_id)
            for r in eng.events().orderBy("log_position").collect()]

    restore(bdir, rdir)
    r_eng = EventStoreEngine(spark, rdir)
    got = [(r.log_position, r.stream_id, r.event_id)
           for r in r_eng.events().orderBy("log_position").collect()]
    assert got == want
    # the restored store appends correctly from the restored head
    r_eng.append("acct-1", [ProposedEvent("E", '{"i": 100}')])
    assert r_eng.events().count() == len(want) + 1

    with pytest.raises(ValueError):
        restore(bdir, store)  # non-empty destination refused


def test_redaction_blanks_targets_only(spark, tmp_path):
    """Redaction (reference redaction.md): the targeted events' data is
    blanked and their metadata carries $redacted; every other property
    (position, number, type, created) and every other EVENT — including
    ones in the same file — are byte-identical. Only files containing
    targets are rewritten, and the manifest commit keeps in-flight
    readers safe."""
    import json as _json

    from eventstore_spark.engine import EventStoreEngine
    from eventstore_spark.writer import ProposedEvent

    store = str(tmp_path / "log")
    eng = EventStoreEngine(spark, store)
    # two events per commit file → redacting one must not disturb its
    # file-mate
    eng.append("acct-1", [
        ProposedEvent("E", '{"secret": "a"}', metadata='{"k": 1}'),
        ProposedEvent("E", '{"keep": 1}'),
    ])
    eng.append("acct-2", [ProposedEvent("E", '{"secret": "b"}')])
    eng.append("acct-3", [ProposedEvent("E", '{"keep": 2}')])
    before = {r.log_position: r for r in eng.events().collect()}
    n_files_before = len(
        [f for f in __import__("os").listdir(store) if f.endswith(".parquet")]
    )

    stats = eng.redact(["0@acct-1", "0@acct-2"])
    assert stats["redacted"] == 2 and stats["files_rewritten"] == 2

    after = {r.log_position: r for r in eng.events().collect()}
    assert set(after) == set(before)
    for pos, r in after.items():
        b = before[pos]
        assert (r.stream_id, r.event_number, r.event_type, r.event_id,
                r.created) == (b.stream_id, b.event_number, b.event_type,
                               b.event_id, b.created)
        if (r.stream_id, r.event_number) in {("acct-1", 0), ("acct-2", 0)}:
            assert r.data is None
            meta = _json.loads(r.metadata)
            assert meta["$redacted"] is True
            if b.metadata:  # pre-existing metadata keys survive the merge
                assert meta["k"] == 1
        else:
            assert r.data == b.data and r.metadata == b.metadata
    # the untouched acct-3 file was NOT rewritten (name still in snapshot)
    from eventstore_spark import manifest as M

    snap = set(M.snapshot_files(store))
    assert sum(1 for f in snap if f.startswith("part-redact-")) == stats["files_new"]
    # bad target format rejected
    import pytest

    with pytest.raises(ValueError):
        eng.redact(["nope"])
