"""Versioned parquet tables: snapshot log + copy-on-write + time travel.

The reference gets row-level ops and time travel from Iceberg
(bodo/io/iceberg/*); the Iceberg runtime jars are absent in this
container, so this module provides the same CAPABILITY as a
self-contained format (an honest miniature of the lakehouse design --
NOT Iceberg-compatible):

    table/
      _snapshots/00000001.json   <- ordered commit log (one JSON per
      _snapshots/00000002.json      snapshot: id, timestamp, operation,
      ...                           list of data files)
      data/<commit-uuid>/part-*.parquet

Commit protocol: data files are fully written BEFORE the snapshot JSON
exists, and the JSON is created with O_EXCL -- a reader either sees a
complete snapshot or not at all, and two racing writers cannot claim
the same snapshot id (the loser retries with the next id). Old data
files are never touched: every snapshot remains readable (time travel
by id or timestamp), and MERGE becomes a new overwrite snapshot rather
than an in-place rewrite -- the failure-safety hole of bare-directory
COW (operators/merge.py) disappears because the previous snapshot is
still the table until the new JSON lands.

On object stores the same protocol works with conditional PUT; only
`_commit` would change.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Snapshot:
    snapshot_id: int
    timestamp_ms: int
    operation: str
    files: list[str]


def _snap_dir(path: str) -> str:
    return os.path.join(path, "_snapshots")


def snapshots(path: str) -> list[Snapshot]:
    """The commit log, oldest first."""
    d = _snap_dir(path)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(d, name)) as f:
            j = json.load(f)
        out.append(Snapshot(j["snapshot_id"], j["timestamp_ms"],
                            j["operation"], j["files"]))
    return out


def _commit(path: str, operation: str, files: list[str]) -> Snapshot:
    os.makedirs(_snap_dir(path), exist_ok=True)
    while True:
        prev = snapshots(path)
        sid = (prev[-1].snapshot_id + 1) if prev else 1
        snap = Snapshot(sid, int(time.time() * 1000), operation, files)
        target = os.path.join(_snap_dir(path), f"{sid:08d}.json")
        try:
            fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            continue  # lost the race; retry with the next id
        with os.fdopen(fd, "w") as f:
            json.dump(snap.__dict__, f)
        return snap


def _write_data(df: DataFrame, path: str) -> list[str]:
    commit_dir = os.path.join(path, "data", uuid.uuid4().hex[:12])
    df.write.mode("errorifexists").parquet(commit_dir)
    return sorted(
        os.path.join(commit_dir, f) for f in os.listdir(commit_dir)
        if f.endswith(".parquet"))


def write_versioned(df: DataFrame, path: str,
                    mode: str = "append") -> Snapshot:
    """Commit ``df`` as a new snapshot. ``append`` unions with the
    current snapshot's files; ``overwrite`` replaces the file set (old
    snapshots stay readable)."""
    if mode not in ("append", "overwrite"):
        raise ValueError("mode must be 'append' or 'overwrite'")
    new_files = _write_data(df, path)
    if mode == "append":
        prev = snapshots(path)
        base = prev[-1].files if prev else []
        new_files = base + new_files
    return _commit(path, mode, new_files)


def read_versioned(spark: SparkSession, path: str,
                   snapshot_id: int | None = None,
                   as_of_ms: int | None = None) -> DataFrame:
    """Read the table at the latest snapshot, at an explicit snapshot
    id, or as of a timestamp (the last snapshot committed <= as_of_ms)."""
    snaps = snapshots(path)
    if not snaps:
        raise FileNotFoundError(f"no snapshots under {path}")
    if snapshot_id is not None:
        matches = [s for s in snaps if s.snapshot_id == snapshot_id]
        if not matches:
            raise ValueError(f"snapshot {snapshot_id} not found")
        snap = matches[0]
    elif as_of_ms is not None:
        eligible = [s for s in snaps if s.timestamp_ms <= as_of_ms]
        if not eligible:
            raise ValueError(f"no snapshot at or before {as_of_ms}")
        snap = eligible[-1]
    else:
        snap = snaps[-1]
    if not snap.files:
        raise ValueError(f"snapshot {snap.snapshot_id} is empty")
    return spark.read.parquet(*snap.files)


def merge_versioned(spark: SparkSession, path: str, source: DataFrame,
                    on: list[str], **merge_kwargs) -> Snapshot:
    """MERGE INTO a versioned table: read the current snapshot, apply
    operators.merge.merge_into, commit the result as an overwrite
    snapshot. Copy-on-write with full history -- the prior snapshot
    stays the table until the commit lands, so a mid-write failure
    loses nothing."""
    from ..operators.merge import merge_into

    target = read_versioned(spark, path)
    merged = merge_into(target, source, on, **merge_kwargs)
    return write_versioned(merged, path, mode="overwrite")
