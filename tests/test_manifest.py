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
