"""Commit points, snapshots and file retention — the
IndexDeletionPolicy family (demos IndexDeletePolicyTest.java,
PersistentSnapshotDeletionPolicyTest.java, HistoryRetention.java,
StaleIndexCommit.java, IndexFileDeleteTest.java,
CheckPointInIndexFileDeleter.java; reference classes
solr-8.4.0/.../index/IndexDeletionPolicy.java,
SnapshotDeletionPolicy.java, PersistentSnapshotDeletionPolicy.java,
IndexFileDeleter.java).

The manifest IS the commit (segments_N analogue): every mutation writes
a new manifest atomically, and data files are immutable once written. A
COMMIT POINT is therefore just a retained copy of the manifest under
commits/ — readers opened at it keep working as long as the files it
references survive. Retention (`purge_commits`) plays IndexFileDeleter:
a file is deleted only when NO retained commit (nor the live manifest)
references it — the reference's refcount sweep, computed from the
manifests themselves."""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import SparkSession

from ..index import (MANIFEST, IndexSnapshot, _atomic_write_json,
                     locked_writer)

_COMMITS_DIR = "commits"
_COMMIT_RE = re.compile(r"commit_(\d+)\.json$")


def _commit_files(index_dir: str) -> dict[int, str]:
    d = os.path.join(index_dir, _COMMITS_DIR)
    if not os.path.isdir(d):
        return {}
    out = {}
    for fn in os.listdir(d):
        m = _COMMIT_RE.match(fn)
        if m:
            out[int(m.group(1))] = os.path.join(_COMMITS_DIR, fn)
    return out


def commit_point(index_dir: str, label: str | None = None) -> int:
    """SnapshotDeletionPolicy.snapshot(): pin the CURRENT commit so
    retention never reclaims its files. Returns the commit generation."""
    commits = _commit_files(index_dir)
    gen = max(commits, default=0) + 1
    with open(os.path.join(index_dir, MANIFEST)) as f:
        m = json.load(f)
    m["commit_gen"] = gen
    if label is not None:
        m["commit_label"] = label
    os.makedirs(os.path.join(index_dir, _COMMITS_DIR), exist_ok=True)
    _atomic_write_json(
        os.path.join(index_dir, _COMMITS_DIR, f"commit_{gen}.json"), m)
    return gen


def list_commits(index_dir: str) -> list[dict]:
    """IndexReader.listCommits analogue: retained commit points, oldest
    first, each with its generation and label."""
    out = []
    for gen, rel in sorted(_commit_files(index_dir).items()):
        with open(os.path.join(index_dir, rel)) as f:
            m = json.load(f)
        out.append({"gen": gen, "label": m.get("commit_label"),
                    "run_id": m.get("run_id"),
                    "batches": list(m.get("batches", []))})
    return out


def open_commit(spark: SparkSession, index_dir: str, gen: int,
                include_soft_deleted: bool = False) -> IndexSnapshot:
    """DirectoryReader.open(IndexCommit): a point-in-time reader at a
    retained commit, unaffected by later mutations."""
    commits = _commit_files(index_dir)
    if gen not in commits:
        raise ValueError(f"no retained commit with gen {gen}; "
                         f"have {sorted(commits)}")
    return IndexSnapshot(spark, index_dir,
                         include_soft_deleted=include_soft_deleted,
                         manifest_name=commits[gen])


def release_commit(index_dir: str, gen: int) -> None:
    """SnapshotDeletionPolicy.release(): drop the pin. Files become
    reclaimable at the next purge unless another commit holds them."""
    commits = _commit_files(index_dir)
    if gen not in commits:
        raise ValueError(f"no retained commit with gen {gen}")
    os.remove(os.path.join(index_dir, commits[gen]))


@locked_writer("index_dir")
def rollback_to(spark: SparkSession, index_dir: str,
                gen: int) -> IndexSnapshot:
    """Open-at-commit + make it CURRENT (IndexWriter opened with
    openMode=APPEND on a past commit — StaleIndexCommit.java's recovery
    move): atomically replaces the live manifest with the commit's."""
    commits = _commit_files(index_dir)
    if gen not in commits:
        raise ValueError(f"no retained commit with gen {gen}")
    with open(os.path.join(index_dir, commits[gen])) as f:
        m = json.load(f)
    _atomic_write_json(os.path.join(index_dir, MANIFEST), m)
    return IndexSnapshot(spark, index_dir)


def _referenced_roots(manifest: dict) -> set[str]:
    """Top-level data directories a manifest pins (batches hold the
    postings/docmap parquet; deletes/soft_deletes/dv_updates are overlay
    files; terms/segnorms are global but rewritten in place only by
    finalize, which always runs under the live manifest)."""
    roots = set(manifest.get("batches", []))
    roots.update(manifest.get("deletes", []))
    roots.update(manifest.get("soft_deletes", []))
    roots.update(e["path"] for e in manifest.get("dv_updates", []))
    return roots


@locked_writer("index_dir")
def purge_commits(index_dir: str, keep_last: int = 1) -> dict:
    """KeepLastN deletion policy + IndexFileDeleter sweep: retain the
    newest keep_last commit points (the live manifest is always
    retained), delete older commit files, then remove every batch /
    tombstone / overlay directory referenced by NO retained manifest.
    Returns {"released_commits": [...], "removed_dirs": [...]}."""
    import shutil
    commits = _commit_files(index_dir)
    gens = sorted(commits)
    drop = gens[:-keep_last] if keep_last > 0 else gens
    for g in drop:
        os.remove(os.path.join(index_dir, commits[g]))
    live: set[str] = set()
    with open(os.path.join(index_dir, MANIFEST)) as f:
        live |= _referenced_roots(json.load(f))
    for g, rel in _commit_files(index_dir).items():
        with open(os.path.join(index_dir, rel)) as f:
            live |= _referenced_roots(json.load(f))
    removed = []
    # candidate roots: batch dirs at the top level, and files/dirs under
    # the overlay dirs. Never touch terms/segnorms/commits/checkpoints.
    for name in sorted(os.listdir(index_dir)):
        if name.startswith("batch_") and name not in live:
            shutil.rmtree(os.path.join(index_dir, name),
                          ignore_errors=True)
            removed.append(name)
    for sub in ("deletes", "soft_deletes", "dv_updates"):
        d = os.path.join(index_dir, sub)
        if not os.path.isdir(d):
            continue
        for fn in sorted(os.listdir(d)):
            rel = os.path.join(sub, fn)
            if rel not in live:
                shutil.rmtree(os.path.join(d, fn), ignore_errors=True)
                removed.append(rel)
    return {"released_commits": drop, "removed_dirs": removed}
