"""IndexWriter write.lock (L/store/NativeFSLockFactory.java /
SimpleFSLockFactory.java; demo lucene/index/LockStree.java): O_EXCL
create-exclusive single-writer guard, stale-owner breaking, same-process
reentrancy, mutator wiring."""

import json
import os

import pytest

from lucene_7_x_9_x_spark.index import (LockObtainFailedError, WRITE_LOCK,
                                        locked_writer, writer_lock)


def test_acquire_release_cycle(tmp_path):
    d = str(tmp_path / "idx")
    with writer_lock(d):
        p = os.path.join(d, WRITE_LOCK)
        assert os.path.exists(p)
        owner = json.load(open(p))
        assert owner["pid"] == os.getpid()
    assert not os.path.exists(p)
    with writer_lock(d):  # re-acquirable after release
        pass


def test_live_foreign_lock_raises(tmp_path):
    d = str(tmp_path / "idx")
    os.makedirs(d)
    p = os.path.join(d, WRITE_LOCK)
    # parent pid: alive on this host, not us -> genuinely held
    json.dump({"pid": os.getppid(), "host": os.uname()[1]},
              open(p, "w"))
    with pytest.raises(LockObtainFailedError):
        with writer_lock(d):
            pass
    assert os.path.exists(p)  # a failed obtain never clobbers the lock


def test_remote_host_lock_never_broken(tmp_path):
    d = str(tmp_path / "idx")
    os.makedirs(d)
    p = os.path.join(d, WRITE_LOCK)
    json.dump({"pid": 1, "host": "some-other-executor"}, open(p, "w"))
    with pytest.raises(LockObtainFailedError):
        with writer_lock(d):
            pass


def test_stale_same_host_lock_broken(tmp_path):
    d = str(tmp_path / "idx")
    os.makedirs(d)
    p = os.path.join(d, WRITE_LOCK)
    dead = 2 ** 22 - 3  # far above this sandbox's pid ceiling
    json.dump({"pid": dead, "host": os.uname()[1]}, open(p, "w"))
    with writer_lock(d):  # stale owner -> broken and re-acquired
        assert json.load(open(p))["pid"] == os.getpid()
    assert not os.path.exists(p)


def test_reentrant_nesting(tmp_path):
    d = str(tmp_path / "idx")
    with writer_lock(d):
        with writer_lock(d):  # update = delete + add composition
            assert os.path.exists(os.path.join(d, WRITE_LOCK))
        # inner exit must NOT release the outer hold
        assert os.path.exists(os.path.join(d, WRITE_LOCK))
    assert not os.path.exists(os.path.join(d, WRITE_LOCK))


def test_corrupt_lock_treated_as_live(tmp_path):
    d = str(tmp_path / "idx")
    os.makedirs(d)
    open(os.path.join(d, WRITE_LOCK), "w").write("{mid-write garbage")
    with pytest.raises(LockObtainFailedError):
        with writer_lock(d):
            pass


def test_locked_writer_decorator(tmp_path):
    d = str(tmp_path / "idx")

    @locked_writer("out_dir")
    def mutate(out_dir, val):
        assert os.path.exists(os.path.join(out_dir, WRITE_LOCK))
        return val * 2

    assert mutate(d, 21) == 42
    assert mutate(out_dir=d, val=1) == 2
    os.makedirs(d, exist_ok=True)
    json.dump({"pid": os.getppid(), "host": os.uname()[1]},
              open(os.path.join(d, WRITE_LOCK), "w"))
    with pytest.raises(LockObtainFailedError):
        mutate(d, 1)


def test_build_index_holds_and_releases_lock(spark, tmp_path):
    from lucene_7_x_9_x_spark.index import build_index
    d = str(tmp_path / "locked_idx")
    docs = spark.createDataFrame([(0, "a b c"), (1, "b c d")],
                                 "doc_id long, text string")
    idx = build_index(spark, docs, d, id_cols=["doc_id"], text_col="text",
                      num_segments=1)
    assert not os.path.exists(os.path.join(d, WRITE_LOCK))
    # a held foreign lock blocks a rebuild
    json.dump({"pid": os.getppid(), "host": os.uname()[1]},
              open(os.path.join(d, WRITE_LOCK), "w"))
    with pytest.raises(LockObtainFailedError):
        build_index(spark, docs, d, id_cols=["doc_id"], text_col="text",
                    num_segments=1)
    os.unlink(os.path.join(d, WRITE_LOCK))
    assert idx.stats["max_doc"] == 2


def test_format_version_gate(spark, tmp_path):
    # IndexFormatTooOld/TooNewException role (OldVersionTest demo): a
    # manifest from another layout generation is refused with a remedy
    from lucene_7_x_9_x_spark.index import (FORMAT_VERSION,
                                            IndexFormatError,
                                            IndexSnapshot, build_index)
    d = str(tmp_path / "fmt_idx")
    docs = spark.createDataFrame([(0, "a b"), (1, "b c")],
                                 "doc_id long, text string")
    build_index(spark, docs, d, id_cols=["doc_id"], text_col="text",
                num_segments=1)
    mpath = os.path.join(d, "manifest.json")
    m = json.load(open(mpath))
    assert m["format_version"] == FORMAT_VERSION
    for bad in (1, FORMAT_VERSION + 1):
        m["format_version"] = bad
        json.dump(m, open(mpath, "w"))
        with pytest.raises(IndexFormatError):
            IndexSnapshot(spark, d)
    m["format_version"] = FORMAT_VERSION
    json.dump(m, open(mpath, "w"))
    assert IndexSnapshot(spark, d).stats["max_doc"] == 2
