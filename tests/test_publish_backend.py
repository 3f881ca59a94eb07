"""CAS publish-backend contract suite (VERDICT r3 #3): the same
race/retention scenarios run against BOTH backends — the default
POSIX-link backend and the mock object-store conditional-PUT backend —
so "swap os.link for a conditional put" is an executable claim, not
prose. No Spark needed: the manifest protocol is pure driver code.
"""

from __future__ import annotations

import json
import os
import threading

import pytest

from kmers_spark import manifest


@pytest.fixture(params=["local_link", "conditional_put"])
def backend(request):
    b = (manifest.LocalLinkBackend() if request.param == "local_link"
         else manifest.ConditionalPutBackend())
    prev = manifest.set_publish_backend(b)
    yield b
    manifest.set_publish_backend(prev)


def _init(out):
    return manifest.init(out, snapshot_id="s", schema={"a": "int64"},
                         num_buckets=4, key="a")


def test_publish_primitive_create_if_absent(backend, tmp_path):
    out = str(tmp_path)
    tmp = os.path.join(out, "t1")
    with open(tmp, "w") as f:
        json.dump({"v": 1}, f)
    target = os.path.join(out, "obj.json")
    assert backend.publish(tmp, target) is True
    tmp2 = os.path.join(out, "t2")
    with open(tmp2, "w") as f:
        json.dump({"v": 2}, f)
    assert backend.publish(tmp2, target) is False  # name taken: CAS lost
    with open(target) as f:
        assert json.load(f) == {"v": 1}  # loser never clobbers


def test_commit_chain_and_time_travel(backend, tmp_path):
    out = str(tmp_path / "snap")
    _init(out)
    for i in range(3):
        def mutate(m, i=i):
            m[f"field_{i}"] = i
            return m
        manifest.commit(out, mutate)
    assert manifest.current_version(out) == 4
    # every version readable as published (immutable chain)
    v2 = manifest.load(out, version=2)
    assert "field_0" in v2 and "field_2" not in v2
    latest = manifest.load(out)
    assert all(f"field_{i}" in latest for i in range(3))


def test_concurrent_commits_merge_not_clobber(backend, tmp_path):
    out = str(tmp_path / "snap")
    _init(out)
    barrier = threading.Barrier(6)
    errs = []

    def commit(i):
        def mutate(m):
            m.setdefault("fields", {})[str(i)] = i
            return m
        try:
            barrier.wait()
            manifest.commit(out, mutate)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=commit, args=(i,)) for i in range(6)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    m = manifest.load(out)
    assert sorted(m["fields"]) == [str(i) for i in range(6)]
    assert manifest.current_version(out) == 7  # init + 6 serialized commits


def test_commit_buckets_conflict_raises(backend, tmp_path):
    out = str(tmp_path / "snap")
    _init(out)
    os.makedirs(os.path.join(out, "blocks/w_a"), exist_ok=True)
    manifest.commit_buckets(out, {0: []}, wave_dir="blocks/w_a")
    os.makedirs(os.path.join(out, "blocks/w_b"), exist_ok=True)
    with pytest.raises(ValueError, match="commit conflict"):
        manifest.commit_buckets(out, {0: []}, wave_dir="blocks/w_b")


def test_expire_tombstones_and_blocks_name_reuse(backend, tmp_path):
    out = str(tmp_path / "snap")
    _init(out)
    for i in range(5):
        manifest.commit(out, lambda m, i=i: {**m, "n": i})
    expired = manifest.expire_versions(out, keep_last=2)
    assert expired == [1, 2, 3, 4]
    with pytest.raises(FileNotFoundError, match="expired"):
        manifest.load(out, version=2)
    # the tombstoned NAME stays occupied: a stale committer's
    # create-if-absent on it must still lose
    tmp = os.path.join(out, "stale")
    with open(tmp, "w") as f:
        json.dump({"stale": True}, f)
    assert backend.publish(tmp, os.path.join(out, "manifest-v2.json")) is False
    # and the live chain continues past the tombstones
    manifest.commit(out, lambda m: {**m, "after": True})
    assert manifest.load(out)["after"] is True


def test_truncated_object_reads_as_absent(backend, tmp_path):
    """The conditional-PUT mock has a create-then-write window; a
    truncated JSON object must read as not-yet-visible (retry), never
    crash a reader mid-commit."""
    p = str(tmp_path / "part.json")
    with open(p, "w") as f:
        f.write('{"half": ')
    assert manifest._read_json(p) is None
