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
