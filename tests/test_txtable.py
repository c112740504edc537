"""Transactional table format (sources/txtable.py): atomic commits,
optimistic concurrency, snapshot isolation, time travel.

The reference's Iceberg writer never reaches a real catalog
(``writers/iceberg_writer.py:28-207``); these tests pin the ACID
semantics the txlog layer supplies in its place.
"""

from __future__ import annotations

import os

import pytest

from webscale_multimodal_datapipeline_spark.sources import txtable as TX


def _df(spark, rows):
    return spark.createDataFrame([(int(i), f"r{i}") for i in rows], "id long, v string")


def test_append_overwrite_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v0 = TX.append(_df(spark, range(3)), t)
    v1 = TX.append(_df(spark, range(3, 5)), t)
    v2 = TX.overwrite(_df(spark, range(100, 102)), t)
    assert (v0, v1, v2) == (0, 1, 2)

    assert sorted(r.id for r in TX.read(spark, t).collect()) == [100, 101]
    assert sorted(r.id for r in TX.read(spark, t, version=1).collect()) == [0, 1, 2, 3, 4]
    assert sorted(r.id for r in TX.read(spark, t, version=0).collect()) == [0, 1, 2]
    assert [h["action"] for h in TX.history(t)] == ["append", "append", "overwrite"]


def test_append_conflict_retries_to_next_version(spark, tmp_path):
    t = str(tmp_path / "tbl")
    TX.append(_df(spark, range(2)), t)
    # simulate a concurrent winner claiming version 1
    conflicting = TX.Commit(1, "append", (), _df(spark, [9]).schema.json())
    assert TX._try_commit(t, conflicting)
    v = TX.append(_df(spark, range(2, 4)), t)
    assert v == 2  # retried past the contended slot
    assert sorted(r.id for r in TX.read(spark, t).collect()) == [0, 1, 2, 3]


def test_overwrite_conflict_raises(spark, tmp_path, monkeypatch):
    """The stale-snapshot race: a concurrent writer commits between the
    overwrite's log read and its commit attempt."""
    t = str(tmp_path / "tbl")
    TX.append(_df(spark, range(2)), t)
    monkeypatch.setattr(TX, "latest_version", lambda _t: 0)  # stale read
    conflicting = TX.Commit(1, "append", (), _df(spark, [9]).schema.json())
    assert TX._try_commit(t, conflicting)  # the concurrent winner
    with pytest.raises(TX.CommitConflict):
        TX.overwrite(_df(spark, [7]), t)


def test_uncommitted_data_is_invisible(spark, tmp_path):
    """Snapshot isolation: staged parquet without a log entry never
    surfaces in a read (the in-flight-writer case)."""
    t = str(tmp_path / "tbl")
    TX.append(_df(spark, range(3)), t)
    # an in-flight writer stages data but dies before committing
    TX._write_data(_df(spark, range(50, 60)), t)
    assert sorted(r.id for r in TX.read(spark, t).collect()) == [0, 1, 2]


def test_reader_snapshot_unaffected_by_later_commits(spark, tmp_path):
    t = str(tmp_path / "tbl")
    TX.append(_df(spark, range(3)), t)
    pinned = TX.latest_version(t)
    TX.overwrite(_df(spark, [99]), t)
    assert sorted(r.id for r in TX.read(spark, t, version=pinned).collect()) == [0, 1, 2]


def test_append_schema_mismatch_rejected(spark, tmp_path):
    t = str(tmp_path / "tbl")
    TX.append(_df(spark, range(2)), t)
    other = spark.createDataFrame([(1.5,)], "x double")
    with pytest.raises(ValueError, match="schema"):
        TX.append(other, t)


def test_widening_append_keeps_declared_slot_schema(spark, tmp_path):
    """A non-nullable append into a nullable table must not narrow the
    DECLARED table schema (round 9, ADVICE): the gate records the wider
    existing slot schema, so a later append of the table's original
    nullable shape still passes — the gate is order-independent across
    writers."""
    import pyspark.sql.functions as F

    t = str(tmp_path / "tbl")
    nullable = _df(spark, range(2))  # createDataFrame → all nullable
    TX.append(nullable, t)
    # Expression-derived column: non-nullable by construction.
    nonnull = nullable.select(
        F.coalesce("id", F.lit(0)).alias("id"),
        F.coalesce("v", F.lit("")).alias("v"),
    )
    assert not nonnull.schema["id"].nullable  # premise of the test
    TX.append(nonnull, t)
    # Declared schema stayed the wide (nullable) one...
    import json as _json

    latest = _json.loads(TX.read_log(t)[-1].schema_json)
    assert all(f["nullable"] for f in latest["fields"])
    # ...so the original nullable shape is still appendable.
    TX.append(_df(spark, range(5, 7)), t)
    assert TX.read(spark, t).count() == 6


def test_read_missing_table_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        TX.read(spark, str(tmp_path / "nope"))


def test_commit_files_are_create_exclusive(spark, tmp_path):
    """The atomicity primitive itself: second claim of a version fails."""
    t = str(tmp_path / "tbl")
    c = TX.Commit(0, "append", (), _df(spark, [1]).schema.json())
    assert TX._try_commit(t, c)
    assert not TX._try_commit(t, c)
    assert os.path.exists(TX._commit_file(t, 0))


def test_merge_upsert_transactional(spark, tmp_path):
    """MERGE (delta wins on key, unmatched inserts, base carries over) as
    an ACID commit: result visible at the new version, pre-merge snapshot
    intact via time travel."""
    t = str(tmp_path / "tbl")
    TX.append(_df(spark, range(3)), t)  # ids 0,1,2 with v="r0".."r2"
    delta = spark.createDataFrame([(1, "UPDATED"), (7, "NEW")], "id long, v string")
    v = TX.merge(spark, delta, t, "id")
    assert v == 1
    got = {r.id: r.v for r in TX.read(spark, t).collect()}
    assert got == {0: "r0", 1: "UPDATED", 2: "r2", 7: "NEW"}
    # pre-merge snapshot is still exactly readable
    old = {r.id: r.v for r in TX.read(spark, t, version=0).collect()}
    assert old == {0: "r0", 1: "r1", 2: "r2"}
    assert [h["action"] for h in TX.history(t)] == ["append", "overwrite"]


def test_merge_duplicate_delta_keys_rejected(spark, tmp_path):
    t = str(tmp_path / "tbl")
    TX.append(_df(spark, range(2)), t)
    dup = spark.createDataFrame([(1, "a"), (1, "b")], "id long, v string")
    with pytest.raises(ValueError, match="duplicate delta keys"):
        TX.merge(spark, dup, t, "id")


def test_merge_retries_after_interleaved_commit(spark, tmp_path):
    """Optimistic concurrency: a commit that lands between the merge's
    snapshot read and its commit attempt forces a re-read + re-merge, so
    the final state contains BOTH the interleaved append and the merge
    (a plain overwrite would have silently clobbered the append)."""
    t = str(tmp_path / "tbl")
    TX.append(_df(spark, range(2)), t)  # ids 0,1

    interleaved = {"done": False}

    def commit_concurrently():
        # fires after the merge stages its data, before its commit attempt
        if not interleaved["done"]:
            interleaved["done"] = True
            TX.append(_df(spark, [5]), t)

    delta = spark.createDataFrame([(1, "UPDATED")], "id long, v string")
    v = TX.merge(spark, delta, t, "id", _on_staged=commit_concurrently)
    # versions: 0=seed append, 1=interleaved append, 2=the merge's overwrite
    assert v == 2
    got = {r.id: r.v for r in TX.read(spark, t).collect()}
    assert got == {0: "r0", 1: "UPDATED", 5: "r5"}


def test_merge_reader_never_torn(spark, tmp_path):
    """A reader pinned at the pre-merge version sees exactly the pre-merge
    rows while (and after) the merge commits — either-snapshot, never a
    mix of old and new files."""
    t = str(tmp_path / "tbl")
    TX.append(_df(spark, range(3)), t)
    pinned = TX.latest_version(t)
    pre = TX.read(spark, t, version=pinned)  # plan resolved against v0 files
    delta = spark.createDataFrame([(0, "X"), (9, "Y")], "id long, v string")
    TX.merge(spark, delta, t, "id")
    assert {r.id: r.v for r in pre.collect()} == {0: "r0", 1: "r1", 2: "r2"}
    assert {r.id: r.v for r in TX.read(spark, t).collect()} == {
        0: "X", 1: "r1", 2: "r2", 9: "Y",
    }


def test_commit_stats_and_file_pruning(spark, tmp_path):
    """Data skipping: per-file [min,max] stats land in the commit log at
    write time; a between-read skips disjoint files entirely (log-only
    decision) and returns exactly the filtered rows."""
    t = str(tmp_path / "tbl")
    # two appends with disjoint id ranges -> disjoint per-commit files
    TX.append(_df(spark, range(0, 100)).coalesce(1), t)
    TX.append(_df(spark, range(1000, 1100)).coalesce(1), t)
    all_files = TX.snapshot_files(t)
    assert len(all_files) == 2
    stats = TX.snapshot_file_stats(t)
    assert all("id" in st for st in stats.values())
    kept = TX.pruned_files(t, "id", 1000, 1050)
    assert len(kept) == 1
    rows = TX.read(spark, t, between=("id", 1000, 1050)).collect()
    assert sorted(r.id for r in rows) == list(range(1000, 1051))
    # range touching neither file's span reads nothing
    assert TX.pruned_files(t, "id", 500, 600) == []
    assert TX.read(spark, t, between=("id", 500, 600)).count() == 0


def test_pruning_is_conservative_without_stats(spark, tmp_path):
    """Files from commits without stats are always kept (never silently
    skipped) — backward compatibility with pre-stats commit logs."""
    t = str(tmp_path / "tbl")
    TX.append(_df(spark, range(5)).coalesce(1), t)
    # simulate a legacy commit: strip stats from the log entry
    import json as _json

    p = TX._commit_file(t, 0)
    d = _json.load(open(p))
    d.pop("stats")
    _json.dump(d, open(p, "w"))
    assert TX.snapshot_file_stats(t) == {f: {} for f in TX.snapshot_files(t)}
    assert TX.pruned_files(t, "id", 9999, 10000) == TX.snapshot_files(t)
    assert TX.read(spark, t, between=("id", 0, 2)).count() == 3


def test_compact_preserves_data_and_history(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for lo in range(0, 40, 10):
        TX.append(_df(spark, range(lo, lo + 10)).coalesce(1), t)
    assert len(TX.snapshot_files(t)) == 4
    v = TX.compact(spark, t, target_files=1)
    assert len(TX.snapshot_files(t)) == 1
    assert sorted(r.id for r in TX.read(spark, t).collect()) == list(range(40))
    # every pre-compaction version still time-travels
    assert TX.read(spark, t, version=v - 1).count() == 40
    assert TX.read(spark, t, version=0).count() == 10


def test_epoch_idempotent_commits(spark, tmp_path):
    """At-least-once delivery: re-running a commit with an already-
    committed app_epoch is a no-op for both append and merge."""
    t = str(tmp_path / "tbl")
    TX.append(_df(spark, range(3)), t, app_epoch="e0")
    v = TX.append(_df(spark, range(3)), t, app_epoch="e0")  # retry: no-op
    assert v == 0 and TX.read(spark, t).count() == 3
    delta = spark.createDataFrame([(1, "U")], "id long, v string")
    v1 = TX.merge(spark, delta, t, "id", app_epoch="e1")
    v2 = TX.merge(spark, delta, t, "id", app_epoch="e1")  # retry: no-op
    assert v1 == v2 == 1
    assert len(TX.history(t)) == 2
    assert TX.committed_epochs(t) == {"e0", "e1"}


def _orphan_stage_dirs(t: str) -> list[str]:
    """data-* dirs under the table not referenced by ANY committed entry."""
    referenced = {f.split(os.sep)[0] for c in TX.read_log(t) for f in c.files}
    return sorted(
        d
        for d in os.listdir(t)
        if d.startswith("data-") and d not in referenced
    )


def test_failed_commits_do_not_leak_staged_data(spark, tmp_path, monkeypatch):
    """ADVICE r5: every non-commit exit path reclaims its staging dir —
    overwrite conflict, merge retry iterations, append epoch no-op,
    append schema mismatch. A contended table must not grow unreferenced
    data-* directories."""
    t = str(tmp_path / "tbl")
    TX.append(_df(spark, range(2)), t)
    assert _orphan_stage_dirs(t) == []

    # overwrite losing the version race: staged dir reclaimed
    with monkeypatch.context() as m:
        m.setattr(TX, "latest_version", lambda _t: 0)  # stale read
        assert TX._try_commit(t, TX.Commit(1, "append", (), _df(spark, [9]).schema.json()))
        with pytest.raises(TX.CommitConflict):
            TX.overwrite(_df(spark, [7]), t)
    assert _orphan_stage_dirs(t) == []

    # merge retry: the lost iteration's staged result is reclaimed
    interleaved = {"done": False}

    def commit_concurrently():
        if not interleaved["done"]:
            interleaved["done"] = True
            TX.append(_df(spark, [5]), t)

    delta = spark.createDataFrame([(1, "U")], "id long, v string")
    TX.merge(spark, delta, t, "id", _on_staged=commit_concurrently)
    assert _orphan_stage_dirs(t) == []

    # append epoch no-op after staging: reclaimed
    TX.append(_df(spark, [50]), t, app_epoch="eA")
    TX.append(_df(spark, [50]), t, app_epoch="eA")
    assert _orphan_stage_dirs(t) == []

    # append schema mismatch: reclaimed
    bad = spark.createDataFrame([(1.5,)], "x double")
    with pytest.raises(ValueError):
        TX.append(bad, t)
    assert _orphan_stage_dirs(t) == []


def test_vacuum_sweeps_aged_orphans_only(spark, tmp_path):
    """vacuum() removes unreferenced data-* dirs past the retention age;
    committed dirs (including historical ones) and fresh stages survive,
    so time travel and in-flight writers are safe."""
    t = str(tmp_path / "tbl")
    TX.append(_df(spark, range(3)), t)
    TX.overwrite(_df(spark, range(10, 12)), t)
    # a crashed writer's orphan, backdated past retention
    orphan = os.path.join(t, "data-deadbeef0000")
    os.makedirs(orphan)
    open(os.path.join(orphan, "part-0.parquet"), "wb").close()
    os.utime(orphan, (0, 0))
    # a FRESH stage (in-flight writer): must survive the sweep
    fresh = os.path.join(t, "data-fresh0000beef")
    os.makedirs(fresh)

    removed = TX.vacuum(t, min_age_seconds=3600)
    assert removed == ["data-deadbeef0000"]
    assert not os.path.isdir(orphan) and os.path.isdir(fresh)
    # both committed versions still read (v0 is historical after overwrite)
    assert TX.read(spark, t, version=0).count() == 3
    assert TX.read(spark, t).count() == 2


def test_file_stats_drop_column_when_any_rowgroup_unusable(tmp_path):
    """ADVICE r5: a column whose min/max is unusable in ANY row group is
    dropped from the file's stats entirely — a partial merge would commit
    an under-covering range and data skipping could skip matching rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "f.parquet")
    # 4 rows, row_group_size=2: rg0's b-values decode as UTF-8, rg1's do
    # not (invalid byte 0xff) -> decode fails for rg1 only
    tbl = pa.table(
        {
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "b": pa.array([b"aa", b"ab", b"\xff\xfe", b"\xff\xff"], pa.binary()),
        }
    )
    pq.write_table(tbl, path, row_group_size=2)
    md = pq.ParquetFile(path).metadata
    assert md.num_row_groups == 2  # precondition for the scenario
    st = TX._file_stats(path)
    assert st.get("id") == [1, 4]  # fully-usable column keeps full range
    assert "b" not in st  # partially-usable column dropped == never skipped


def test_append_with_decimal_columns_skips_unextractable_stats(spark, tmp_path):
    """A decimal column must not fail the append: pyarrow raises
    ArrowNotImplementedError extracting parquet min/max for DECIMAL, so
    the column is dropped from the file stats (conservatively kept by
    the skipper) while numeric columns still carry ranges."""
    from pyspark.sql import functions as F

    from webscale_multimodal_datapipeline_spark.sources import txtable as TX

    table = str(tmp_path / "dec_tbl")
    df = spark.range(10).select(
        F.col("id"),
        (F.col("id") * 1.5).cast("decimal(18,2)").alias("amount"),
    )
    TX.append(df, table)  # raised ArrowNotImplementedError before the guard
    assert TX.read(spark, table).count() == 10
    stats = TX.read_log(table)[-1].stats
    merged = {}
    for per_file in stats.values():
        merged.update(per_file)
    assert "id" in merged  # int stats still collected
    assert "amount" not in merged  # decimal: no stats == conservatively kept


def test_compact_cluster_by_prunes_both_columns(spark, tmp_path):
    """OPTIMIZE-ZORDER analog: after a clustered compaction, file-level
    stats prune narrow ranges on EITHER clustered column; contents are
    unchanged. An ingest-order table of the same data prunes neither."""
    t = str(tmp_path / "ztbl")
    # 4K rows over a 64x64 grid of (a, b), appended in ingest order so
    # every pre-compaction file spans the full range of both columns
    rows = [(i, (i * 7) % 64, (i * 13) % 64) for i in range(4096)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    TX.append(df.repartition(4), t)
    total_before = len(TX.snapshot_files(t))
    # ingest order: a narrow range on either column hits ~every file
    assert len(TX.pruned_files(t, "a", 0, 3)) == total_before
    v = TX.compact(spark, t, target_files=16, cluster_by=["a", "b"])
    files = TX.snapshot_files(t)
    assert len(files) > 1  # range partitioner actually split the key space
    # both-column skipping: narrow ranges read a strict subset of files
    hit_a = TX.pruned_files(t, "a", 0, 3)
    hit_b = TX.pruned_files(t, "b", 0, 3)
    assert len(hit_a) < len(files) and len(hit_b) < len(files)
    # contents identical (multiset), filtered reads exact
    assert sorted(r.id for r in TX.read(spark, t).collect()) == list(range(4096))
    got = sorted(
        r.id for r in TX.read(spark, t, between=("a", 0, 3)).collect()
    )
    want = sorted(i for i, a, b in rows if 0 <= a <= 3)
    assert got == want
    # still a transaction: pre-compaction version time-travels
    assert TX.read(spark, t, version=v - 1).count() == 4096
