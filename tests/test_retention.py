"""Manifest version retention (expire_versions).

Expired versions are tombstoned IN PLACE, never unlinked: the name
must stay occupied so a stale committer's create-if-absent still
loses the CAS (deleting would reopen the slot — the ABA documented
in manifest._after_publish)."""

from __future__ import annotations

import os

import pytest

from kmers_spark import manifest
from kmers_spark.metrics import snapshot_history


def _chain(tmp_path, n=6):
    out = str(tmp_path / "store")
    for i in range(n):
        manifest.save(out, {"snapshot_id": "s", "i": i})
    return out


def test_expire_keeps_last_and_tombstones_rest(tmp_path):
    out = _chain(tmp_path, 6)
    expired = manifest.expire_versions(out, keep_last=2)
    assert expired == [1, 2, 3, 4]
    # latest still loads; the newest kept ancestor too
    assert manifest.load(out)["i"] == 5
    assert manifest.load(out, version=5)["i"] == 4
    # expired time-travel reads fail loudly
    with pytest.raises(FileNotFoundError, match="expired"):
        manifest.load(out, version=2)
    # idempotent: nothing left to expire
    assert manifest.expire_versions(out, keep_last=2) == []


def test_expired_name_stays_occupied_blocks_stale_cas(tmp_path):
    out = _chain(tmp_path, 4)
    manifest.expire_versions(out, keep_last=1)
    # a stale committer that loaded version 2 long ago would publish 3;
    # the tombstone must make its create-if-absent FAIL (not succeed on
    # a reopened slot and vanish from the chain)
    tmp = os.path.join(out, ".stale-commit")
    with open(tmp, "w") as f:
        f.write("{}")
    with pytest.raises(FileExistsError):
        os.link(tmp, os.path.join(out, "manifest-v3.json"))
    os.unlink(tmp)


def test_commit_continues_after_expire(tmp_path):
    out = _chain(tmp_path, 5)
    manifest.expire_versions(out, keep_last=1)
    m = manifest.commit(out, lambda cur: {**cur, "extra": 1})
    assert m["extra"] == 1 and m["i"] == 4
    assert manifest.current_version(out) == 6


def test_history_marks_expired(tmp_path):
    out = _chain(tmp_path, 4)
    manifest.expire_versions(out, keep_last=2)
    hist = snapshot_history(out)
    assert [h.get("expired", False) for h in hist] == [True, True, False, False]


def test_keep_last_validated(tmp_path):
    out = _chain(tmp_path, 2)
    with pytest.raises(ValueError):
        manifest.expire_versions(out, keep_last=0)
    # keep_last >= chain length: no-op
    assert manifest.expire_versions(out, keep_last=10) == []
