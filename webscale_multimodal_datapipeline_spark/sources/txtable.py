"""Minimal transactional table format — versioned parquet snapshots with
an append-only JSON commit log (the open Delta-protocol shape: a
``_txlog/`` of numbered commit files whose replay defines the snapshot;
see delta.io PROTOCOL.md for the public design this follows).

The reference's W2 Iceberg writer (``writers/iceberg_writer.py:28-207``)
buffers parquet under a table path and never commits to a real catalog;
Spark's real ``writeTo`` path stays jar-gated in this container
(``sinks.py``). This module supplies what that leaves missing — ACID
table semantics testable with nothing but a filesystem:

- **Atomic commits.** A commit is ONE ``os.open(..., O_CREAT | O_EXCL)``
  of ``_txlog/<version>.json``: either the file is created (commit wins)
  or the version is taken (conflict). POSIX gives the atomicity; no
  locks, no rename dance.
- **Optimistic concurrency.** On conflict an ``append`` re-reads the log
  and retries at the next version (appends commute); an ``overwrite``
  raises ``CommitConflict`` (it invalidates what the loser read).
- **Snapshot isolation.** Readers resolve the file list from the commit
  log only — parquet written by an in-flight (uncommitted) writer is
  invisible because data files live in per-commit directories that only
  a committed log entry references. A reader holding version N is
  unaffected by later commits.
- **Time travel.** ``read(spark, path, version=k)`` replays the log to
  k. ``history`` exposes the log for audit.

Scale notes: the log is O(commits) JSON files — the known small-file
bottleneck of log-structured tables at high commit rates; production
formats checkpoint the log periodically, and ``compact_parquet``
(``sinks.py``) is this repo's data-file-side answer. Data files are
whatever Spark's distributed writer produced — the driver only ever
lists filenames (bounded by files-per-commit), never rows.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_LOG_DIR = "_txlog"


class CommitConflict(RuntimeError):
    """Another writer committed the version this transaction targeted."""


@dataclass(frozen=True)
class Commit:
    version: int
    action: str  # "append" | "overwrite"
    files: tuple[str, ...]
    schema_json: str


def _log_path(table: str) -> str:
    return os.path.join(table, _LOG_DIR)


def _commit_file(table: str, version: int) -> str:
    return os.path.join(_log_path(table), f"{version:08d}.json")


def read_log(table: str) -> list[Commit]:
    """Parse the commit log in version order; missing log -> empty table."""
    log = _log_path(table)
    if not os.path.isdir(log):
        return []
    commits = []
    for name in sorted(os.listdir(log)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(log, name)) as f:
            d = json.load(f)
        commits.append(
            Commit(d["version"], d["action"], tuple(d["files"]), d["schema"])
        )
    return commits


def latest_version(table: str) -> int:
    """Highest committed version, -1 for an empty/absent table."""
    log = read_log(table)
    return log[-1].version if log else -1


def snapshot_files(table: str, version: int | None = None) -> list[str]:
    """Replay the log to ``version`` (default: latest): overwrite resets
    the file set, append extends it."""
    files: list[str] = []
    for c in read_log(table):
        if version is not None and c.version > version:
            break
        if c.action == "overwrite":
            files = list(c.files)
        else:
            files.extend(c.files)
    return files


def _write_data(df: DataFrame, table: str) -> tuple[list[str], str]:
    """Stage the DataFrame as parquet under a unique per-commit directory;
    only a committed log entry will ever make these files visible."""
    stage = f"data-{uuid.uuid4().hex[:12]}"
    out = os.path.join(table, stage)
    df.write.option("compression", "snappy").parquet(out)
    files = [
        os.path.join(stage, f)
        for f in sorted(os.listdir(out))
        if f.endswith(".parquet")
    ]
    return files, df.schema.json()


def _try_commit(table: str, commit: Commit) -> bool:
    """Atomically claim ``_txlog/<version>.json``; False if taken."""
    os.makedirs(_log_path(table), exist_ok=True)
    path = _commit_file(table, commit.version)
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return False
    with os.fdopen(fd, "w") as f:
        json.dump(
            {
                "version": commit.version,
                "action": commit.action,
                "files": list(commit.files),
                "schema": commit.schema_json,
            },
            f,
        )
    return True


def _schema_compatible(table: str, schema_json: str) -> bool:
    log = read_log(table)
    return not log or log[-1].schema_json == schema_json


def append(df: DataFrame, table: str, max_retries: int = 10) -> int:
    """Append-commit; retries past version conflicts (appends commute).
    Returns the committed version."""
    files, schema_json = _write_data(df, table)
    for _ in range(max_retries):
        if not _schema_compatible(table, schema_json):
            raise ValueError(
                f"append schema does not match table schema at {table}"
            )
        version = latest_version(table) + 1
        if _try_commit(table, Commit(version, "append", tuple(files), schema_json)):
            return version
    raise CommitConflict(f"gave up after {max_retries} contended versions")


def overwrite(df: DataFrame, table: str) -> int:
    """Replace-the-table commit; a version conflict is surfaced, not
    retried (the overwrite was decided against a snapshot that no longer
    exists). Returns the committed version."""
    files, schema_json = _write_data(df, table)
    version = latest_version(table) + 1
    if not _try_commit(table, Commit(version, "overwrite", tuple(files), schema_json)):
        raise CommitConflict(f"version {version} was committed concurrently")
    return version


def merge(
    spark: SparkSession,
    delta: DataFrame,
    table: str,
    key: str,
    max_retries: int = 10,
    _on_staged=None,
) -> int:
    """Transactional MERGE upsert (round-5 W2 closure): read the latest
    snapshot, apply ``operators/curation.py::merge_upsert`` (delta wins on
    key match, unmatched delta inserts, unmatched base carries over), and
    commit the merged result as an overwrite — so the CDC path the
    reference's Iceberg writer implies (``writers/iceberg_writer.py:28-207``)
    is ACID end-to-end here.

    Unlike ``append``, a merge's RESULT depends on the snapshot it read, so
    the commit must target exactly ``read_version + 1``: the target version
    is pinned BEFORE staging, and a concurrent commit at that version forces
    a full re-read + re-merge + re-stage retry (optimistic concurrency, the
    Delta-protocol "blind overwrites lose" rule). Plain ``overwrite`` would
    silently clobber an interleaved commit; this never does.

    Readers are never torn: they resolve file lists from committed log
    entries only, so any concurrent reader sees the pre-merge or post-merge
    snapshot, never a mix.

    ``_on_staged`` is a test seam: called after data staging, before the
    commit attempt (used to interleave a concurrent commit deterministically).

    Returns the committed version.
    """
    from webscale_multimodal_datapipeline_spark.operators.curation import merge_upsert

    for _ in range(max_retries):
        read_version = latest_version(table)
        if read_version < 0:
            raise FileNotFoundError(f"no committed table at {table}")
        base = read(spark, table, version=read_version)
        merged = merge_upsert(base, delta, key, check_unique_delta_keys=True)
        files, schema_json = _write_data(merged, table)
        if _on_staged is not None:
            _on_staged()
        target = read_version + 1
        if _try_commit(
            table, Commit(target, "overwrite", tuple(files), schema_json)
        ):
            return target
    raise CommitConflict(f"gave up after {max_retries} contended merges")


def read(spark: SparkSession, table: str, version: int | None = None) -> DataFrame:
    """Snapshot read at ``version`` (default latest). Empty table -> an
    empty DataFrame with the last committed schema (or an error if no
    schema was ever committed)."""
    files = snapshot_files(table, version)
    log = read_log(table)
    if not log:
        raise FileNotFoundError(f"no committed table at {table}")
    if not files:
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(json.loads(log[-1].schema_json))
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*[os.path.join(table, f) for f in files])


def history(table: str) -> list[dict]:
    """Commit history for audit: version, action, file count."""
    return [
        {"version": c.version, "action": c.action, "n_files": len(c.files)}
        for c in read_log(table)
    ]
