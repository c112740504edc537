"""Streaming tests: batch-vs-streaming parity (the streaming plan over the
same bounded input must agree with the batch plan) + stateful dedup +
session windows + foreachBatch dual-write."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webscale_multimodal_datapipeline_spark.catalog import load_table
from webscale_multimodal_datapipeline_spark.streaming import pipeline as SP


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir):
    return SP.read_events_stream(spark, sf_dir)


def test_windowed_counts_match_batch(spark, sf_dir, events_stream):
    # complete mode: emit every window at end-of-stream (append mode would
    # hold back windows the watermark hasn't closed yet)
    SP.run_stream_to_memory(SP.windowed_counts(events_stream), "win_out", "complete")
    got = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
    )
    want = {
        (r["w"]["start"], r.event_type): (r.n, r.total_value) for r in batch.collect()
    }
    assert set(got) == set(want)
    for k, (n, tv) in want.items():
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(tv, rel=1e-12)  # float sum order differs


def test_streaming_dedup_matches_batch_first_events(spark, sf_dir, events_stream):
    SP.run_stream_to_memory(SP.streaming_dedup(events_stream), "dedup_out")
    n_stream = spark.sql("SELECT COUNT(*) AS n FROM dedup_out").first().n
    n_batch = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert n_stream == n_batch
    # one row per key
    assert (
        spark.sql("SELECT COUNT(*) AS n FROM (SELECT DISTINCT user_id, event_type FROM dedup_out)")
        .first()
        .n
        == n_stream
    )


def test_session_windows_complete_mode(spark, sf_dir, events_stream):
    SP.run_stream_to_memory(SP.session_windows(events_stream), "sess_out", "complete")
    rows = spark.sql("SELECT * FROM sess_out").collect()
    assert len(rows) > 0
    assert all(r.session_end > r.session_start for r in rows)
    # total events across sessions == table size
    assert sum(r.n_events for r in rows) == load_table(spark, sf_dir, "events").count()


def test_foreach_batch_dual_write(spark, sf_dir, events_stream, tmp_path):
    SP.foreach_batch_dual_write(
        events_stream,
        str(tmp_path / "passed"),
        str(tmp_path / "rejected"),
        F.col("event_type") != "error",
        str(tmp_path / "ckpt"),
    )
    n_pass = spark.read.parquet(str(tmp_path / "passed")).count()
    n_rej = spark.read.parquet(str(tmp_path / "rejected")).count()
    ev = load_table(spark, sf_dir, "events")
    assert n_pass == ev.filter(F.col("event_type") != "error").count()
    assert n_rej == ev.filter(F.col("event_type") == "error").count()


def test_batch_operators_apply_to_stream(spark, sf_dir):
    """Refiner/Filter chains are mode-agnostic: the same operator objects
    compile onto a streaming DataFrame."""
    from webscale_multimodal_datapipeline_spark.operators.filters import text_length_filter

    stream = SP.read_events_stream(spark, sf_dir)
    op = text_length_filter(1, 100, length_col=None, text_col="event_type", name="f")
    out = op.apply(stream)
    assert out.isStreaming
    SP.run_stream_to_memory(out, "op_out")
    n_total = load_table(spark, sf_dir, "events").count()
    assert spark.sql("SELECT COUNT(*) AS n FROM op_out").first().n == n_total


def test_compiler_stream_applies_operator_chain(spark, sf_dir):
    """The YAML-compiled operator chain runs unchanged on a stream."""
    from webscale_multimodal_datapipeline_spark.compiler import compile_pipeline

    cfg = {
        "data_loader": {"table": "events"},
        "stages": [
            {
                "name": "s",
                "operators": [
                    {
                        "type": "text_length_filter",
                        "params": {
                            "min_length": 5,
                            "max_length": 100,
                            "length_col": None,
                            "text_col": "event_type",
                        },
                    }
                ],
            }
        ],
    }
    pipe = compile_pipeline(cfg)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out = pipe.stream(spark, sf_dir, SP.EVENTS_SCHEMA)
    assert out.isStreaming
    SP.run_stream_to_memory(out, "cstream_out")
    got = spark.sql("SELECT COUNT(*) n FROM cstream_out").first().n
    want = load_table(spark, sf_dir, "events").filter(
        "length(event_type) BETWEEN 5 AND 100"
    ).count()
    assert got == want


def test_compiler_stream_rejects_dedup(spark, sf_dir):
    from webscale_multimodal_datapipeline_spark.compiler import compile_pipeline
    import pytest as _pt

    cfg = {
        "data_loader": {"table": "events"},
        "stages": [{"name": "s", "operators": [{"type": "text_exact_dedup"}]}],
    }
    with _pt.raises(ValueError, match="streaming"):
        compile_pipeline(cfg).stream(spark, sf_dir, SP.EVENTS_SCHEMA)


def test_compiler_stream_collects_operator_metrics(spark, sf_dir):
    """A1 per-operator counters on the streaming path: observed counts
    summed over micro-batches equal the batch-side pass counts."""
    from webscale_multimodal_datapipeline_spark.compiler import compile_pipeline

    cfg = {
        "data_loader": {"table": "events"},
        "stages": [
            {
                "name": "s",
                "operators": [
                    {
                        "type": "text_length_filter",
                        "params": {
                            "min_length": 5,
                            "max_length": 100,
                            "length_col": None,
                            "text_col": "event_type",
                        },
                    }
                ],
            }
        ],
    }
    pipe = compile_pipeline(cfg)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out = pipe.stream(spark, sf_dir, SP.EVENTS_SCHEMA, max_files_per_trigger=1)
    counts = SP.run_stream_collect_metrics(out, "mstream_out")
    want = load_table(spark, sf_dir, "events").filter(
        "length(event_type) BETWEEN 5 AND 100"
    ).count()
    assert counts == {"m.s.0.text_length_filter": want}


def test_stream_static_dimension_join_matches_batch(spark, sf_dir, events_stream):
    """Stream-static broadcast enrichment agrees with the batch join."""
    dim = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .withColumn("user_tier", (F.col("user_id") % 3).cast("int"))
    )
    enriched = SP.enrich_with_dimension(events_stream, dim, "user_id")
    agg = enriched.groupBy("user_tier").agg(F.count(F.lit(1)).alias("n"))
    SP.run_stream_to_memory(agg, "tier_out", "complete")
    got = {r.user_tier: r.n for r in spark.sql("SELECT * FROM tier_out").collect()}
    batch = (
        load_table(spark, sf_dir, "events")
        .join(F.broadcast(dim), "user_id", "left")
        .groupBy("user_tier")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = {r.user_tier: r.n for r in batch.collect()}
    assert got == want


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed counts must DROP a row that arrives after the
    watermark has passed its window — the late-data contract that
    distinguishes event-time streaming from batch re-aggregation.

    File 1 carries the on-time rows plus a watermark-advancing event;
    file 2 (strictly later mtime -> later micro-batch) carries a late row
    whose event time is behind the advanced watermark."""
    import os
    import datetime as dt

    from webscale_multimodal_datapipeline_spark.streaming import pipeline as SP

    d = str(tmp_path / "late_stream")
    os.makedirs(d)

    def _write(name, rows, mtime):
        # the file stream source lists FILES in the dir — stage the parquet
        # part and move it in flat, with a controlled mtime so
        # maxFilesPerTrigger=1 processes files in write order
        import glob
        import shutil

        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp_ntz, user_id long, event_type string,"
            " value double, props string",
        )
        stage = f"{d}_stage_{name}"
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        p = f"{d}/{name}.parquet"
        shutil.move(part, p)
        shutil.rmtree(stage)
        os.utime(p, (mtime, mtime))
        return p

    t0 = dt.datetime(2024, 3, 1, 10, 0, 0)
    adv = dt.datetime(2024, 3, 1, 15, 0, 0)  # watermark -> 13:00 (2h delay)
    late = dt.datetime(2024, 3, 1, 10, 15, 0)  # < 13:00 -> must be dropped
    p1 = _write(
        "ev1",
        [
            (1, t0, 1, "click", 1.0, "{}"),
            (2, t0 + dt.timedelta(minutes=30), 1, "click", 1.0, "{}"),
            (3, adv, 1, "click", 1.0, "{}"),
        ],
        1_000_000,
    )
    # the input-side watermark filter uses the PREVIOUS batch's watermark
    # (global watermark lags one micro-batch), so the late row must arrive
    # two batches after the advancing event to be genuinely dropped —
    # batch 1 closes the 10:00 window, batch 2 faces wm=13:00 on input
    _write("ev2", [(4, adv + dt.timedelta(minutes=30), 1, "click", 1.0, "{}")], 2_000_000)
    _write("ev3", [(5, late, 1, "click", 1.0, "{}")], 3_000_000)

    schema = SP.events_schema(spark, p1)
    from webscale_multimodal_datapipeline_spark.catalog import normalize_events_ts

    stream = normalize_events_ts(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    SP.run_stream_to_memory(
        SP.windowed_counts(stream, "1 hour", "2 hours"), "late_out", "append"
    )
    got = {
        r.window_start: r.n
        for r in spark.sql("SELECT * FROM late_out").collect()
    }
    # the 10:00 window closed with exactly the two on-time rows; the late
    # arrival in micro-batch 2 was discarded by the watermark
    assert got[dt.datetime(2024, 3, 1, 10, 0, 0)] == 2, got


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """Two-sided streaming join (clicks x purchases, 1h attribution
    window) must equal the same join evaluated in batch."""
    from webscale_multimodal_datapipeline_spark.catalog import load_table
    from webscale_multimodal_datapipeline_spark.streaming import pipeline as SPL

    ev_stream = SPL.read_events_stream(spark, sf_dir)
    clicks_s = ev_stream.filter(F.col("event_type") == "click")
    purch_s = ev_stream.filter(F.col("event_type") == "purchase")
    joined = SPL.stream_stream_click_purchase_join(clicks_s, purch_s)
    SPL.run_stream_to_memory(joined, "ssj_out")
    got = {
        (r.purchase_id, r.click_id)
        for r in spark.sql("SELECT * FROM ssj_out").collect()
    }

    ev = load_table(spark, sf_dir, "events")
    c = ev.filter("event_type = 'click'").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    want = {
        (r.purchase_id, r.click_id)
        for r in c.join(
            p,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")),
        ).collect()
    }
    assert got == want and len(want) > 0


def test_stateful_streaming_on_rocksdb_state_store(spark, sf_dir):
    """The production state-store backend: RocksDB (bundled rocksdbjni)
    instead of the default HDFS-backed in-memory map. At 100 TB of keyed
    state the in-memory provider OOMs executors; RocksDB spills to local
    disk with changelog checkpointing. Same stateful dedup, same results
    — only the provider differs."""
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = SP.read_events_stream(spark, sf_dir)
        SP.run_stream_to_memory(SP.streaming_dedup(stream), "rocksdb_dedup_out")
        n_stream = spark.sql("SELECT COUNT(*) AS n FROM rocksdb_dedup_out").first().n
        n_batch = (
            load_table(spark, sf_dir, "events")
            .dropDuplicates(["user_id", "event_type"])
            .count()
        )
        assert n_stream == n_batch
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)


def test_checkpoint_resume_exactly_once(spark, sf_dir, tmp_path):
    """Kill-and-restart recovery: a file-sink query with a checkpoint
    processes files added before the stop exactly once, and after a
    restart picks up ONLY the new files — no reprocessing, no loss. The
    property the reference's resume logic (loader_worker.py shard
    checkpointing) hand-rolls; Spark's offset log + sink commit log give
    it per-batch."""
    import shutil

    from pyspark.sql import functions as F

    from webscale_multimodal_datapipeline_spark.catalog import load_table

    src = tmp_path / "src"
    sink = tmp_path / "sink"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    a.write.mode("overwrite").parquet(str(src / "part_a"))

    schema = a.schema

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 4)
            .parquet(f"{src}/*")
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    n_a = a.count()
    assert spark.read.parquet(str(sink)).count() == n_a

    # new data lands while the query is DOWN; restart must resume from
    # the checkpoint and emit only the delta
    b.write.mode("overwrite").parquet(str(src / "part_b"))
    run_once()
    out = spark.read.parquet(str(sink))
    assert out.count() == n_a + b.count()
    assert out.select("event_id").distinct().count() == n_a + b.count()
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def _pin_part_mtimes(ev_dir: str) -> None:
    """Pin strictly increasing mtimes on the ts-range part files (in
    part-file = ts-range order): the files are written by PARALLEL tasks,
    so their mtimes can finish out of ts order, and FileStreamSource feeds
    files in mtime order — a latest-range file landing first would advance
    the watermark and (correctly) drop the earlier files as late."""
    import os
    import time as _time

    base = _time.time()
    for i, p in enumerate(
        sorted(
            f for f in os.listdir(ev_dir)
            if f.startswith("part-") and f.endswith(".parquet")
        )
    ):
        os.utime(os.path.join(ev_dir, p), (base + 10 * i, base + 10 * i))


def test_streaming_spike_pipeline_matches_batch(spark, sf_dir, tmp_path):
    """Round-5 streaming lift of e_spike_zscore: watermarked UPDATE-mode
    hourly rollup → per-trigger MERGE into a transactional table → the
    shared exact-integer scorer. Input is split into 3 ts-range files
    (1 per trigger, processed in ts order — the arrival pattern a real
    file stream has) so boundary hours genuinely span triggers and the
    MERGE path (not just the initial append) executes; a time-scrambled
    split would instead have the watermark legitimately drop two files
    as late. Parity with the batch query is EXACT — the z-test is
    integer algebra, no float tolerance needed."""
    from webscale_multimodal_datapipeline_spark.plans.events_queries import (
        e_spike_zscore,
    )
    from webscale_multimodal_datapipeline_spark.sources import txtable as TX

    ev_dir = str(tmp_path / "evparts")
    load_table(spark, sf_dir, "events").repartitionByRange(3, "ts").write.parquet(
        ev_dir
    )
    _pin_part_mtimes(ev_dir)

    stream = SP.read_parquet_events_stream(spark, ev_dir, max_files_per_trigger=1)
    table = str(tmp_path / "rollup_tbl")
    SP.stream_rollup_to_txtable(
        SP.hourly_rollup(stream), table, str(tmp_path / "ckpt")
    )
    # multi-trigger actually happened: initial append + ≥1 merge commit
    actions = [h["action"] for h in TX.history(table)]
    assert actions[0] == "append" and "overwrite" in actions[1:]

    got = {
        (r.event_type, r.hour): (r.cnt, r.is_spike)
        for r in SP.spike_flags_from_rollup(spark, table).collect()
    }
    want = {
        (r.event_type, r.hour): (r.cnt, r.is_spike)
        for r in e_spike_zscore(spark, sf_dir).collect()
    }
    assert got == want


def test_streaming_srm_pipeline_matches_batch(spark, sf_dir, tmp_path):
    """Round-5 streaming lift #2 (e_srm_check): stateful first-seen user
    dedup → UPDATE-mode arm counts → per-trigger MERGE into a
    transactional table → the shared exact-integer chi-square scorer.
    3 ts-range files arrive in order (pinned mtimes, see the spike test)
    so users spanning triggers exercise the dedup state and the MERGE
    path; parity with the batch query is EXACT."""
    from webscale_multimodal_datapipeline_spark.plans.events_queries import (
        e_srm_check,
    )
    from webscale_multimodal_datapipeline_spark.sources import txtable as TX

    ev_dir = str(tmp_path / "evparts")
    load_table(spark, sf_dir, "events").repartitionByRange(3, "ts").write.parquet(
        ev_dir
    )
    _pin_part_mtimes(ev_dir)

    stream = SP.read_parquet_events_stream(spark, ev_dir, max_files_per_trigger=1)
    table = str(tmp_path / "srm_tbl")
    SP.stream_arm_counts_to_txtable(
        SP.user_arm_counts(stream), table, str(tmp_path / "ckpt")
    )
    # multi-trigger actually happened: initial append + ≥1 merge commit
    actions = [h["action"] for h in TX.history(table)]
    assert actions[0] == "append" and "overwrite" in actions[1:]

    got = SP.srm_from_arm_counts(spark, table).collect()[0]
    want = e_srm_check(spark, sf_dir).collect()[0]
    assert (got.n_arm0, got.n_arm1, got.chi2) == (
        want.n_arm0,
        want.n_arm1,
        want.chi2,
    )


def test_stream_incremental_dedup_exact_parity_with_batch(spark, sf_dir, tmp_path):
    """VERDICT r5 #5 acceptance: 3-file replay of the documents table
    through streaming incremental dedup → txtable equals the batch exact
    dedup (replay files ascend by doc_id, so arrival-order first-seen ==
    min-id winner), and a re-delivered epoch (at-least-once retry) is a
    committed no-op."""
    import os

    import numpy as np
    import pandas as pd

    from webscale_multimodal_datapipeline_spark.operators.dedup import (
        text_exact_dedup,
    )
    from webscale_multimodal_datapipeline_spark.sources import txtable as TX

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = str(tmp_path / "replay")
    os.makedirs(src)
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    # the sf0.001 corpus has no exact dups — inject cross-batch recrawls:
    # later files re-carry early texts under fresh ids (the crawler shape)
    chunks = [c.copy() for c in np.array_split(pdf, 3)]
    for i in (1, 2):
        recrawl = chunks[0].head(25).copy()
        recrawl["doc_id"] = recrawl["doc_id"] + 10_000 * i
        chunks[i] = pd.concat([chunks[i], recrawl], ignore_index=True)
    replay = pd.concat(chunks, ignore_index=True)
    for i, chunk in enumerate(chunks):
        p = f"{src}/file-{i}.parquet"
        chunk.to_parquet(p, index=False)
        os.utime(p, (1_000_000 + i, 1_000_000 + i))  # deterministic order

    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    SP.stream_incremental_dedup_to_txtable(
        SP.read_parquet_stream(spark, src, max_files_per_trigger=1),
        table,
        ckpt,
    )
    # one commit per micro-batch epoch (3 replay files)
    assert [h["action"] for h in TX.history(table)] == ["append"] * 3

    got = sorted(r.doc_id for r in TX.read(spark, table).collect())
    expected = sorted(
        r.doc_id
        for r in text_exact_dedup().apply(spark.createDataFrame(replay)).collect()
    )
    assert got == expected and len(got) < len(replay)

    # injected duplicate epoch: re-deliver epoch 0's batch verbatim
    handler = SP.incremental_dedup_batch_handler(table)
    handler(spark.read.parquet(f"{src}/file-0.parquet"), 0)
    assert len(TX.history(table)) == 3  # epoch no-op: nothing committed
    assert sorted(r.doc_id for r in TX.read(spark, table).collect()) == got

    # a NEW epoch carrying only already-seen content commits zero docs
    handler(spark.read.parquet(f"{src}/file-1.parquet"), 99)
    assert sorted(r.doc_id for r in TX.read(spark, table).collect()) == got


def test_streaming_cusum_pipeline_matches_batch(spark, sf_dir, tmp_path):
    """Round-6 third streaming statistics lift: hourly rollup → MERGE →
    shared CUSUM scorer == the batch e_cusum_hourly, EXACTLY (BIGINT
    argmax algebra, no tolerance). Same 3-ts-range-file arrival harness
    as the spike test so the MERGE path genuinely executes."""
    from webscale_multimodal_datapipeline_spark.plans.events_queries import (
        e_cusum_hourly,
    )
    from webscale_multimodal_datapipeline_spark.sources import txtable as TX

    ev_dir = str(tmp_path / "evparts")
    load_table(spark, sf_dir, "events").repartitionByRange(3, "ts").write.parquet(
        ev_dir
    )
    _pin_part_mtimes(ev_dir)

    stream = SP.read_parquet_events_stream(spark, ev_dir, max_files_per_trigger=1)
    table = str(tmp_path / "rollup_tbl")
    SP.stream_rollup_to_txtable(
        SP.hourly_rollup(stream), table, str(tmp_path / "ckpt")
    )
    actions = [h["action"] for h in TX.history(table)]
    assert actions[0] == "append" and "overwrite" in actions[1:]

    got = SP.cusum_from_rollup(spark, table).collect()
    want = e_cusum_hourly(spark, sf_dir).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def _py_minhash(text: str, k: int = 3):
    """Independent pure-Python mirror of norm_tokens → word_shingles →
    md5-MinHash → bands (the cross-engine md5 constants from
    operators/dedup.py). ASCII-only corpus by construction, so Python
    str.lower()/\\s+ semantics coincide with the JVM's."""
    import hashlib
    import re

    from webscale_multimodal_datapipeline_spark.operators.dedup import (
        LSH_BANDS,
        MINHASH_A,
        MINHASH_B,
        MINHASH_P,
        NUM_MINHASHES,
    )

    toks = re.split(r"\s+", text.lower().strip()) if text.strip() else []
    if len(toks) >= k:
        shingles = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    else:
        shingles = {" ".join(toks)}
    hashes = [
        int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MINHASH_P
        for s in sorted(shingles)
    ]
    sig = [
        min((h * a + b) % MINHASH_P for h in hashes)
        for a, b in zip(MINHASH_A, MINHASH_B)
    ]
    r = NUM_MINHASHES // LSH_BANDS
    bands = {
        "|".join([str(j)] + [str(sig[j * r + i]) for i in range(r)])
        for j in range(LSH_BANDS)
    }
    return shingles, sig, bands


def _py_incremental_neardup(files, threshold: float = 0.7):
    """Greedy replay reference: within-file exact-Jaccard LSH dedup
    (min-id winner, chain semantics: rejected iff ANY smaller-id verified
    near-dup, like minhash_lsh_dup_map), then signature-agreement probe
    of the accumulated index — exactly the handler's two verify tiers."""
    import math

    from webscale_multimodal_datapipeline_spark.operators.dedup import (
        NUM_MINHASHES,
    )

    min_agree = int(math.ceil(threshold * NUM_MINHASHES - 1e-9))
    index = []  # (sig, bands) of committed survivors
    survivors = []
    for docs in files:  # docs: list of (doc_id, text)
        feats = {i: _py_minhash(t) for i, t in docs}
        ids = sorted(feats)
        batch_ok = []
        for i in ids:
            sh_i, _, b_i = feats[i]
            rejected = False
            for j in ids:
                if j >= i:
                    break
                sh_j, _, b_j = feats[j]
                if b_i & b_j:
                    jac = len(sh_i & sh_j) / len(sh_i | sh_j)
                    if jac >= threshold:
                        rejected = True
                        break
            if not rejected:
                batch_ok.append(i)
        committed = []
        for i in batch_ok:
            _, sig_i, b_i = feats[i]
            hit = any(
                (b_i & b_old)
                and sum(x == y for x, y in zip(sig_i, s_old)) >= min_agree
                for s_old, b_old in index
            )
            if not hit:
                committed.append(i)
        for i in committed:
            _, sig_i, b_i = feats[i]
            index.append((sig_i, b_i))
        survivors.extend(committed)
    return sorted(survivors)


def test_stream_incremental_neardup_matches_python_reference(spark, tmp_path):
    """Round-6 near-dup CDC composition: 3-file replay through
    MinHash-LSH incremental dedup → txtable equals an INDEPENDENT pure-
    Python greedy replay (md5 minhash recomputed from scratch), and the
    injected duplicate/exact/near-copy docs behave as designed."""
    import os

    import numpy as np

    from webscale_multimodal_datapipeline_spark.sources import txtable as TX

    rng = np.random.RandomState(7)
    pool = [f"w{n:03d}" for n in range(200)]

    def mk_text(n_words=25):
        return " ".join(rng.choice(pool, size=n_words))

    base = [(1000 + i, mk_text()) for i in range(30)]
    files = [base[:10], base[10:20], base[20:30]]
    # cross-epoch exact duplicate of an epoch-0 doc (agreement 12/12)
    files[1] = files[1] + [(2001, base[3][1])]
    # cross-epoch near-copy: one word changed (estimator decides)
    w = base[4][1].split()
    w[10] = "zzchanged"
    files[1] = files[1] + [(2002, " ".join(w))]
    # cross-epoch near-copy: one word appended to an epoch-1 doc
    files[2] = files[2] + [(3001, base[12][1] + " zztail")]
    # within-batch near pair: 3002 survives, 3003 is its 1-word mutation
    # (position 4 chosen so the pair provably shares LSH bands on these
    # md5 constants — at J=0.769 a band match has p≈0.91 per pair, and a
    # probabilistic test would flake; the parity assert below is the
    # real check, this pair pins the within-batch reject path)
    t = mk_text()
    files[2] = files[2] + [(3002, t)]
    w = t.split()
    w[4] = "zzother"
    files[2] = files[2] + [(3003, " ".join(w))]

    import pandas as pd

    src = str(tmp_path / "replay")
    os.makedirs(src)
    for i, docs in enumerate(files):
        p = f"{src}/file-{i}.parquet"
        pd.DataFrame(docs, columns=["doc_id", "text"]).to_parquet(p, index=False)
        os.utime(p, (1_000_000 + i, 1_000_000 + i))  # deterministic order

    # stream each file as its own micro-batch, in mtime order
    table = str(tmp_path / "tbl")
    handler = SP.incremental_neardup_batch_handler(table)
    for i in range(3):
        handler(spark.read.parquet(f"{src}/file-{i}.parquet"), i)
    assert [h["action"] for h in TX.history(table)] == ["append"] * 3

    got = sorted(r.doc_id for r in TX.read(spark, table).collect())
    want = _py_incremental_neardup(files)
    assert got == want

    # designed behaviors: exact cross-epoch dup rejected; within-batch
    # 1-word mutation rejected (exact Jaccard 20/26 = 0.769); its
    # original survives; all 30 base docs are mutually non-near.
    assert 2001 not in got and 3003 not in got and 3002 in got
    assert all(i in got for i, _ in base)

    # duplicate epoch (at-least-once retry) is a committed no-op
    handler(spark.read.parquet(f"{src}/file-1.parquet"), 1)
    assert len(TX.history(table)) == 3
    assert sorted(r.doc_id for r in TX.read(spark, table).collect()) == got

    # the streaming runner drives the same handler end-to-end
    table2 = str(tmp_path / "tbl2")
    SP.stream_incremental_neardup_to_txtable(
        SP.read_parquet_stream(spark, src, max_files_per_trigger=1),
        table2,
        str(tmp_path / "ckpt2"),
    )
    assert sorted(r.doc_id for r in TX.read(spark, table2).collect()) == want


def test_streaming_cuped_pipeline_matches_batch(spark, sf_dir, tmp_path):
    """Fourth streaming statistics lift: per-user (x, y) rollup → MERGE →
    shared CUPED scorer == the batch e_cuped EXACTLY (decimal sums +
    identical float tree, no tolerance). 3-ts-range-file replay so users
    span epochs and the MERGE accumulation genuinely executes."""
    from webscale_multimodal_datapipeline_spark.plans.events_queries import e_cuped
    from webscale_multimodal_datapipeline_spark.sources import txtable as TX

    ev_dir = str(tmp_path / "evparts")
    load_table(spark, sf_dir, "events").repartitionByRange(3, "ts").write.parquet(
        ev_dir
    )
    _pin_part_mtimes(ev_dir)

    stream = SP.read_parquet_events_stream(spark, ev_dir, max_files_per_trigger=1)
    table = str(tmp_path / "xy_tbl")
    SP.stream_user_xy_to_txtable(
        SP.user_xy(stream), table, str(tmp_path / "ckpt")
    )
    actions = [h["action"] for h in TX.history(table)]
    assert actions[0] == "append" and "overwrite" in actions[1:]

    got = SP.cuped_from_user_xy(spark, table).collect()
    want = e_cuped(spark, sf_dir).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_streaming_kmv_pipeline_matches_batch(spark, sf_dir, tmp_path):
    """Round-7 fifth streaming statistics lift: per-source KMV k-min pool
    accumulated through epoch-idempotent txtable MERGE == the batch
    x_kmv_distinct estimator, EXACTLY (shared constants + float
    spelling). Min-k over a union is associative/commutative/idempotent,
    so any replay order converges to the batch pool."""
    import os

    import numpy as np
    import pandas as pd

    from webscale_multimodal_datapipeline_spark.plans.sketch_queries import (
        x_kmv_distinct,
    )
    from webscale_multimodal_datapipeline_spark.sources import txtable as TX
    from webscale_multimodal_datapipeline_spark.streaming import pipeline as SP2

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = str(tmp_path / "replay")
    os.makedirs(src)
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    chunks = [c.copy() for c in np.array_split(pdf, 3)]
    for i, chunk in enumerate(chunks):
        p = f"{src}/file-{i}.parquet"
        chunk.to_parquet(p, index=False)
        os.utime(p, (1_000_000 + i, 1_000_000 + i))

    table = str(tmp_path / "kmv_tbl")
    ckpt = str(tmp_path / "kmv_ckpt")
    SP2.stream_kmv_to_txtable(
        SP2.read_parquet_stream(spark, src, max_files_per_trigger=1),
        table,
        ckpt,
    )

    got = {
        (r.source, r.sketch_n, r.kth_hash, r.kmv_estimate)
        for r in SP2.kmv_from_pool(spark, table).collect()
    }
    want = {
        (r.source, r.sketch_n, r.kth_hash, r.kmv_estimate)
        for r in x_kmv_distinct(spark, sf_dir).collect()
    }
    assert got == want  # bit-exact, no tolerance

    # re-delivered epoch: committed no-op
    n_commits = len(TX.history(table))
    handler = SP2.kmv_batch_handler(table)
    handler(spark.read.parquet(f"{src}/file-0.parquet"), 0)
    assert len(TX.history(table)) == n_commits
    still = {
        (r.source, r.sketch_n, r.kth_hash, r.kmv_estimate)
        for r in SP2.kmv_from_pool(spark, table).collect()
    }
    assert still == want

    # a NEW epoch re-carrying seen content cannot move the pool
    handler(spark.read.parquet(f"{src}/file-1.parquet"), 99)
    assert {
        (r.source, r.sketch_n, r.kth_hash, r.kmv_estimate)
        for r in SP2.kmv_from_pool(spark, table).collect()
    } == want


def test_stream_incremental_embdedup_matches_numpy_reference(
    spark, sf_dir, tmp_path
):
    """Embedding-cosine CDC == an independent numpy greedy replay of the
    same semantics (within-batch: drop vs ANY smaller-id same-bucket row
    at cosine >= t; cross-epoch: drop vs any STORED same-bucket row),
    over a 3-file arrival with injected cross-batch recrawls."""
    import os

    import numpy as np
    import pandas as pd

    from webscale_multimodal_datapipeline_spark.operators import dedup as OD
    from webscale_multimodal_datapipeline_spark.sources import txtable as TX
    from webscale_multimodal_datapipeline_spark.streaming import pipeline as SP2

    dim, planes, thr = 64, 8, 0.9
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    src = str(tmp_path / "replay")
    os.makedirs(src)
    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    chunks = [c.copy() for c in np.array_split(pdf, 3)]
    for i in (1, 2):
        recrawl = chunks[0].head(10).copy()
        recrawl["vec_id"] = recrawl["vec_id"] + 100_000 * i
        chunks[i] = pd.concat([chunks[i], recrawl], ignore_index=True)
    for i, chunk in enumerate(chunks):
        p = f"{src}/file-{i}.parquet"
        chunk.to_parquet(p, index=False)
        os.utime(p, (1_000_000 + i, 1_000_000 + i))

    table = str(tmp_path / "embtbl")
    SP2.stream_incremental_embdedup_to_txtable(
        SP2.read_parquet_stream(spark, src, max_files_per_trigger=1),
        table,
        str(tmp_path / "ckpt"),
        dim=dim,
        threshold=thr,
        planes=planes,
    )
    got = sorted(r.vec_id for r in TX.read(spark, table).collect())

    # independent numpy replay
    C = np.array(
        [[OD._plane_coef(p, i) for i in range(dim)] for p in range(planes)],
        dtype=np.float64,
    )

    def bucket(x):
        return int(sum(1 << p for p in range(planes) if C[p] @ x > 0))

    def cos(a, b):
        den = np.linalg.norm(a) * np.linalg.norm(b)
        return (a @ b / den) if den else None

    stored = []  # (bucket, vec)
    accepted = []
    for chunk in chunks:
        rows = sorted(
            ((int(r.vec_id), np.asarray(r.embedding, dtype=np.float64))
             for r in chunk.itertuples()),
            key=lambda t: t[0],
        )
        survivors = []
        for vid, v in rows:
            b = bucket(v)
            hit = any(
                b == bucket(u) and (c := cos(v, u)) is not None and c >= thr
                for uid, u in rows
                if uid < vid
            )
            if not hit:
                survivors.append((vid, v, b))
        for vid, v, b in survivors:
            if any(b == sb and (c := cos(v, u)) is not None and c >= thr
                   for sb, u in stored):
                continue
            stored.append((b, v))
            accepted.append(vid)
    assert got == sorted(accepted)
    # the injected recrawls never make it past the snapshot probe
    assert not any(v >= 100_000 for v in got)

    # re-delivered epoch: committed no-op
    n = len(TX.history(table))
    handler = SP2.incremental_embdedup_batch_handler(
        table, dim=dim, threshold=thr, planes=planes
    )
    handler(spark.read.parquet(f"{src}/file-0.parquet"), 0)
    assert len(TX.history(table)) == n
    assert sorted(r.vec_id for r in TX.read(spark, table).collect()) == got


def test_cdc_compaction_cadence_keeps_data_and_epochs(spark, tmp_path):
    """Round 9: the handlers' built-in index maintenance. compact_every=2
    must bound the snapshot file count, keep data bit-identical, and keep
    epoch idempotency working ACROSS the compaction commit (the r8
    nullability-widening gate made post-compaction appends legal; this
    pins the cadence composition end to end)."""
    from webscale_multimodal_datapipeline_spark.sources import txtable as TX

    table = str(tmp_path / "idx")
    handler = SP.incremental_dedup_batch_handler(table, compact_every=2)

    def batch(e):
        return spark.createDataFrame(
            [(100 * e + i, f"doc {e} token{i} body") for i in range(8)],
            "doc_id long, text string",
        ).repartition(4)  # several files per append: growth is real

    for e in range(5):
        handler(batch(e), e)
    actions = [h["action"] for h in TX.history(table)]
    # appends for epochs 0-4 plus overwrites from the epoch-2/4 compactions
    assert actions.count("append") == 5
    assert actions.count("overwrite") == 2
    # last cadence fired at epoch 4: the snapshot is one compacted
    # rewrite (5 files here) — far fewer than 5 epochs x 4-file appends
    assert len(TX.snapshot_files(table)) <= 8
    got = sorted(r.doc_id for r in TX.read(spark, table).collect())
    assert got == sorted(100 * e + i for e in range(5) for i in range(8))

    # re-delivered epoch AFTER compaction: still a committed no-op
    n_hist = len(TX.history(table))
    handler(batch(1), 1)
    assert len(TX.history(table)) == n_hist
    assert sorted(r.doc_id for r in TX.read(spark, table).collect()) == got

    # fresh epoch appends fine against the compacted (re-read) schema
    handler(batch(7), 7)
    assert TX.read(spark, table).count() == 48


def test_stream_incremental_spandedup_matches_batch_and_blocks_recrawl(
    spark, tmp_path
):
    """CDC span dedup (round 9 session 2): a single epoch equals the
    batch scrub exactly; across epochs, text already seen in ANY earlier
    epoch is cut from later docs (earlier-wins online ExactSubstr) even
    when the earlier in-batch copies were themselves scrubbed; epoch
    re-delivery is a committed no-op."""
    import os

    from webscale_multimodal_datapipeline_spark.operators.dedup import (
        dup_span_scrub,
    )
    from webscale_multimodal_datapipeline_spark.sources import txtable as TX

    e0 = [
        (1, "alpha beta gamma delta unique0"),
        (2, "p q alpha beta gamma r"),          # shares a 3-run with doc 1
        (3, "solo text nothing shared here"),
    ]
    e1 = [
        (10, "x y alpha beta gamma z"),          # recrawl of e0's run
        (11, "p q r s t u"),                     # novel
        (12, "solo text nothing shared here"),   # full recrawl of doc 3
    ]
    import pandas as pd

    src = str(tmp_path / "replay")
    os.makedirs(src)
    for i, rows in enumerate([e0, e1]):
        p = f"{src}/file-{i}.parquet"
        pd.DataFrame(rows, columns=["doc_id", "text"]).astype(
            {"doc_id": "int64"}
        ).to_parquet(p, index=False)
        os.utime(p, (1_000_000 + i, 1_000_000 + i))

    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    SP.stream_incremental_spandedup_to_txtable(
        SP.read_parquet_stream(spark, src, max_files_per_trigger=1),
        table,
        ckpt,
    )
    assert [h["action"] for h in TX.history(table)] == ["append"] * 2
    got = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in TX.read(spark, table).collect()
    }

    # Epoch 0 == the batch scrub of e0 (single-epoch parity).
    batch0 = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in dup_span_scrub(
            spark.createDataFrame(e0, "doc_id long, text string")
        ).collect()
    }
    for d in (1, 2, 3):
        assert got[d] == batch0[d]
    assert got[1] == ("delta unique0", 3)
    assert got[2] == ("p q r", 3)
    assert got[3] == ("solo text nothing shared here", 0)

    # Epoch 1: the recrawled run is cut (index probe), novel text kept,
    # the FULL recrawl of doc 3 scrubs to empty.
    assert got[10] == ("x y z", 3)
    assert got[11] == ("p q r s t u", 0)
    assert got[12] == ("", 5)

    # The wrapper resolves mode=auto; a FRESH table must land on the
    # sketch layout (r10 default flip — gram sidecar is authoritative).
    assert TX.latest_version(table + "__grams") >= 0

    # A third epoch repeating a run whose epoch-0 copies were BOTH
    # scrubbed (doc 1/2's "alpha beta gamma" never survived) must still
    # be blocked: the index carries ORIGINAL grams, not survivors.
    # span_cdc_batch_handler(auto) continues the sketch layout.
    handler = SP.span_cdc_batch_handler(table)
    e2 = spark.createDataFrame(
        [(20, "now alpha beta gamma again")], "doc_id long, text string"
    )
    handler(e2, 7)
    got2 = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in TX.read(spark, table).collect()
    }
    assert got2[20] == ("now again", 3)

    # Re-delivered epoch: nothing commits.
    n_hist = len(TX.history(table))
    handler(e2, 7)
    assert len(TX.history(table)) == n_hist


def test_sketch_spandedup_parity_and_generation_growth(spark, tmp_path, monkeypatch):
    """Scale-path span CDC == inline span CDC on the same replay (same
    scrub for every doc), the bloom candidates verify EXACTLY (no false
    scrubs), and the generation ritual writes a 'full' row when the
    epoch-row bound trips — with dedup semantics intact afterwards."""
    from webscale_multimodal_datapipeline_spark.sources import txtable as TX

    epochs = [
        [
            (1, "alpha beta gamma delta unique0"),
            (2, "p q alpha beta gamma r"),
            (3, "solo text nothing shared here"),
        ],
        [
            (10, "x y alpha beta gamma z"),
            (11, "p q r s t u"),
            (12, "solo text nothing shared here"),
        ],
        [
            (20, "now alpha beta gamma again"),
            (21, "fresh words only in here"),
        ],
    ]
    # epoch-row bound of 1 forces a 'full' rebuild ritual mid-replay
    monkeypatch.setattr(SP, "SPAN_SKETCH_MAX_EPOCH_ROWS", 1)

    t_inline = str(tmp_path / "inline")
    t_sketch = str(tmp_path / "sketch")
    h_inline = SP.incremental_spandedup_batch_handler(t_inline)
    h_sketch = SP.incremental_spandedup_sketch_batch_handler(t_sketch)
    for i, rows in enumerate(epochs):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        h_inline(df, i)
        h_sketch(df, i)

    a = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in TX.read(spark, t_inline).collect()
    }
    b = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in TX.read(spark, t_sketch).collect()
    }
    assert a == b
    assert b[20] == ("now again", 3)  # cross-epoch block survived rebuilds
    assert b[21] == ("fresh words only in here", 0)

    # ritual evidence: at least one 'full' sketch row landed, and the
    # exact gram sidecar carries every distinct gram ever seen
    kinds = [r.kind for r in TX.read(spark, t_sketch + "__sketch").collect()]
    assert "full" in kinds and "epoch" in kinds
    n_grams = (
        TX.read(spark, t_sketch + "__grams").select("_h").distinct().count()
    )
    assert n_grams > 0

    # epoch re-delivery: committed no-op on the docs table
    n_hist = len(TX.history(t_sketch))
    h_sketch(
        spark.createDataFrame(epochs[2], "doc_id long, text string"), 2
    )
    assert len(TX.history(t_sketch)) == n_hist


def test_sketch_spandedup_retry_after_partial_commit(spark, tmp_path, monkeypatch):
    """Crash-retry exactness (round 9 session 2 self-review): the sketch
    handler commits grams -> sketch -> docs; a crash after the side
    commits leaves the batch's OWN grams in the index, and an unguarded
    retry would self-match every position and scrub the whole batch to
    ''. The epoch-stamped gram rows + strictly-earlier verify filter
    make the retry compute exactly what the first attempt would have."""
    from webscale_multimodal_datapipeline_spark.sources import txtable as TX

    t = str(tmp_path / "t")
    h = SP.incremental_spandedup_sketch_batch_handler(t)
    h(
        spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, "unrelated words entirely here")],
            "doc_id long, text string",
        ),
        0,
    )
    df1 = spark.createDataFrame(
        [(10, "novel fresh tokens nothing repeated"), (11, "alpha beta gamma tail")],
        "doc_id long, text string",
    )
    orig_append = TX.append

    def flaky(df, table, **kw):
        if table == t and kw.get("app_epoch") == "incspansk-epoch-1":
            raise RuntimeError("injected crash before docs commit")
        return orig_append(df, table, **kw)

    monkeypatch.setattr(TX, "append", flaky)
    with pytest.raises(RuntimeError, match="injected crash"):
        h(df1, 1)
    # side tables committed, docs did not
    assert TX.latest_version(t + "__grams") >= 1
    assert "incspansk-epoch-1" not in TX.committed_epochs(t)
    monkeypatch.setattr(TX, "append", orig_append)

    h(df1, 1)  # retry
    got = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in TX.read(spark, t).collect()
    }
    # novel text survives the retry (no self-match)...
    assert got[10] == ("novel fresh tokens nothing repeated", 0)
    # ...while the genuinely-earlier epoch-0 run is still blocked
    assert got[11] == ("tail", 3)


def test_span_cdc_auto_mode_layout_gate(spark, tmp_path):
    """r10 default flip (VERDICT r9 task 3): span_cdc_batch_handler(auto)
    gives a FRESH table the sketch layout (flat-epoch scale path), but
    CONTINUES a legacy inline-layout table with the inline handler — the
    legacy index lives as a `_grams` column on doc rows, invisible to the
    sketch probe, so flipping mid-table would break earlier-wins."""
    from webscale_multimodal_datapipeline_spark.sources import txtable as TX

    e0 = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "other words here now")],
        "doc_id long, text string",
    )
    e1 = spark.createDataFrame(
        [(10, "tail alpha beta gamma cut")], "doc_id long, text string"
    )

    # fresh table -> sketch layout (gram sidecar authoritative, lean rows)
    fresh = str(tmp_path / "fresh")
    SP.span_cdc_batch_handler(fresh)(e0, 0)
    assert TX.latest_version(fresh + "__grams") >= 0
    assert "_grams" not in TX.read(spark, fresh).columns

    # legacy inline table -> auto continues inline (no sidecar appears,
    # cross-epoch block still enforced via the row-borne gram index)
    legacy = str(tmp_path / "legacy")
    SP.incremental_spandedup_batch_handler(legacy)(e0, 0)
    SP.span_cdc_batch_handler(legacy)(e1, 1)
    assert TX.latest_version(legacy + "__grams") < 0
    got = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in TX.read(spark, legacy).collect()
    }
    assert got[10] == ("tail cut", 3)

    # forced modes still resolve, bad mode refuses loudly
    assert SP.span_cdc_batch_handler(fresh, mode="sketch") is not None
    with pytest.raises(ValueError, match="auto|sketch|inline"):
        SP.span_cdc_batch_handler(fresh, mode="bogus")


def test_sketch_table_truncated_by_rebuild(spark, tmp_path, monkeypatch):
    """r10 (found by the extended CDC probe): the sketch table must stay
    BOUNDED — the full-row rebuild overwrites the table (superseded
    epoch/full rows drop), so the per-epoch state read is 1 full +
    <= MAX_EPOCH_ROWS epoch rows regardless of stream age. Epoch
    idempotency must survive the overwrite (markers live in the txlog)."""
    from webscale_multimodal_datapipeline_spark.sources import txtable as TX

    monkeypatch.setattr(SP, "SPAN_SKETCH_MAX_EPOCH_ROWS", 1)
    t = str(tmp_path / "t")
    h = SP.incremental_spandedup_sketch_batch_handler(t)
    for i in range(6):
        h(
            spark.createDataFrame(
                [(100 * i + j, f"w{i} x{j} unique tokens row {i} {j}")
                 for j in range(3)],
                "doc_id long, text string",
            ),
            i,
        )
    rows = TX.read(spark, t + "__sketch").collect()
    # bounded: never accumulates one row per epoch (6 epochs, bound 1 ->
    # at most latest full + a couple of post-rebuild epoch rows)
    assert len(rows) <= 3, [r.kind for r in rows]
    assert sum(r.kind == "full" for r in rows) <= 1
    # idempotency across the overwrite: re-delivering an old epoch is a
    # no-op on the docs table even though its sketch rows were truncated
    n_hist = len(TX.history(t))
    h(
        spark.createDataFrame(
            [(1, "whatever text here")], "doc_id long, text string"
        ),
        2,
    )
    assert len(TX.history(t)) == n_hist
