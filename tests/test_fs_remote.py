"""Hadoop-scheme branches of the fs abstraction, driven through fake JVM
objects (no cluster in this sandbox — the local branches are covered by
the cache roundtrip suite; these pin the remote-only contracts the r6
advisor flagged: a missing dir lists as empty instead of failing the
first sink batch, and a lost rename race to an identical
content-addressed sidecar succeeds silently).
"""
from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbfs_spark_cache_spark import fs


class _FakePath:
    def __init__(self, path: str):
        self._path = path

    def toString(self):
        return self._path

    def getName(self):
        return self._path.rstrip("/").rsplit("/", 1)[-1]

    def getParent(self):
        return _FakePath(self._path.rsplit("/", 1)[0])


class _FakeStatus:
    def __init__(self, path: str, size: int = 3, mtime: int = 1000):
        self._p = _FakePath(path)
        self._size, self._mtime = size, mtime

    def getPath(self):
        return self._p

    def getLen(self):
        return self._size

    def getModificationTime(self):
        return self._mtime

    def isDirectory(self):
        return False


class _FakeJfs:
    """In-memory stand-in for org.apache.hadoop.fs.FileSystem: exists /
    listStatus / rename semantics, with listStatus throwing on a missing
    path exactly like the real one."""

    def __init__(self):
        self.files: dict[str, str] = {}
        self.rename_results: list[bool] = []

    def exists(self, jpath):
        p = jpath.toString()
        return p in self.files or any(
            f.startswith(p.rstrip("/") + "/") for f in self.files
        )

    def listStatus(self, jpath):
        p = jpath.toString().rstrip("/")
        children = [f for f in self.files if f.startswith(p + "/")]
        if not children and p not in self.files:
            raise RuntimeError(
                f"java.io.FileNotFoundException: File {p} does not exist"
            )
        return [_FakeStatus(f) for f in children]

    def delete(self, jpath, recursive):
        return self.files.pop(jpath.toString(), None) is not None

    def mkdirs(self, jpath):
        return True

    def rename(self, src, dst):
        ok = self.rename_results.pop(0) if self.rename_results else True
        if ok:
            self.files[dst.toString()] = self.files.pop(src.toString(), "")
        return ok


@pytest.fixture()
def fake_fs(monkeypatch):
    jfs = _FakeJfs()
    monkeypatch.setattr(
        fs, "_active_jvm_fs", lambda path: (jfs, _FakePath(path))
    )
    return jfs


def test_list_dir_missing_remote_path_is_empty(fake_fs):
    """The first micro-batch of a fresh exactly-once sink probes the
    ledger dir before anything created it; on Hadoop schemes listStatus
    throws FileNotFoundException, which must read as 'no entries', not an
    error (the local branch already returns [])."""
    assert fs.list_dir("s3a://bucket/sink/_committed") == []


def test_list_dir_remote_lists_existing_entries(fake_fs):
    fake_fs.files["s3a://bucket/sink/_committed/1.txt"] = "x"
    fake_fs.files["s3a://bucket/sink/_committed/2.txt"] = "y"
    names = {s.name for s in fs.list_dir("s3a://bucket/sink/_committed")}
    assert names == {"1.txt", "2.txt"}


def _install_fake_jvm(monkeypatch, fake_fs):
    """Wire the fake FileSystem into write_text's and read_text's JVM
    plumbing: create() returns a write stream, open()+IOUtils.toString
    serve the stored content back (write_text re-reads the target to
    verify a lost race left IDENTICAL content before succeeding
    silently)."""

    class _WriteStream:
        def write(self, data):
            pass

        def close(self):
            pass

    class _ReadStream:
        def __init__(self, content):
            self.content = content

        def close(self):
            pass

    fake_fs.create = lambda jpath, overwrite: _WriteStream()
    fake_fs.open = lambda jpath: _ReadStream(
        fake_fs.files.get(jpath.toString())
    )

    class _IOUtils:
        @staticmethod
        def toString(stream, encoding):
            if stream.content is None:
                raise RuntimeError("java.io.FileNotFoundException")
            return stream.content

    class _FakeJvm:
        class org:
            class apache:
                class hadoop:
                    class fs:
                        Path = _FakePath

                class commons:
                    class io:
                        IOUtils = _IOUtils

    class _FakeSession:
        _jvm = _FakeJvm

    monkeypatch.setattr(
        "pyspark.sql.SparkSession.getActiveSession",
        classmethod(lambda cls: _FakeSession()),
    )


def test_write_text_lost_rename_race_with_identical_content_is_silent(
    fake_fs, monkeypatch
):
    """A racer's IDENTICAL sidecar landing between our delete and rename
    makes our rename return False with the goal state already in place
    (content-addressed writes are byte-identical per key) — the caller's
    job must not fail."""
    _install_fake_jvm(monkeypatch, fake_fs)
    target = "s3a://bucket/cache/key.meta.txt"

    def losing_rename(src, dst):
        fake_fs.files.pop(src.toString(), None)
        fake_fs.files[target] = "racer-wrote-identical-content"
        return False

    fake_fs.rename = losing_rename
    fs.write_text(target, "racer-wrote-identical-content")  # must not raise
    assert fake_fs.files[target] == "racer-wrote-identical-content"


def test_write_text_lost_rename_race_with_different_content_raises(
    fake_fs, monkeypatch
):
    """The silent path is content-gated: losing a rename race to a
    DIFFERENT document (the mutable ledger manifest, not a
    content-addressed sidecar) must raise, or a compactor would proceed
    to delete markers its surviving manifest never absorbed."""
    _install_fake_jvm(monkeypatch, fake_fs)
    target = "s3a://bucket/sink/_committed/manifest.txt"

    def losing_rename(src, dst):
        fake_fs.files.pop(src.toString(), None)
        fake_fs.files[target] = "1\n2\n3"
        return False

    fake_fs.rename = losing_rename
    with pytest.raises(OSError):
        fs.write_text(target, "1\n2\n3\n7")
    assert fake_fs.files[target] == "1\n2\n3"  # racer's document intact


def test_write_text_rename_failure_without_target_still_raises(
    fake_fs, monkeypatch
):
    """A rename that fails with NO replacement in place is a real error —
    the silent-success path is strictly for the won-by-someone-else race."""
    _install_fake_jvm(monkeypatch, fake_fs)

    def broken_rename(src, dst):
        fake_fs.files.pop(src.toString(), None)
        return False

    fake_fs.rename = broken_rename
    with pytest.raises(OSError):
        fs.write_text("s3a://bucket/cache/other.meta.txt", "content")
