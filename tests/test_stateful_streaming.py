"""applyInPandasWithState operator tests — state must persist ACROSS
micro-batches (events split into multiple files, maxFilesPerTrigger=1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webscale_multimodal_datapipeline_spark.catalog import load_table
from webscale_multimodal_datapipeline_spark.streaming import pipeline as SP
from webscale_multimodal_datapipeline_spark.streaming import stateful as ST


@pytest.fixture(scope="module")
def multi_file_events(spark, sf_dir, tmp_path_factory):
    """events split into 4 parquet files -> 4 micro-batches."""
    out = str(tmp_path_factory.mktemp("ev_stream"))
    ev = load_table(spark, sf_dir, "events")
    ev.withColumn("ts", F.col("ts").cast("timestamp_ntz")).repartition(
        4
    ).write.mode("overwrite").parquet(out)
    return out


def _stream(spark, path):
    from webscale_multimodal_datapipeline_spark.catalog import normalize_events_ts

    raw = (
        spark.readStream.schema(SP.events_schema(spark, path))
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    return normalize_events_ts(raw)


def test_running_totals_accumulate_across_batches(spark, sf_dir, multi_file_events):
    st = _stream(spark, multi_file_events)
    SP.run_stream_to_memory(ST.running_user_totals(st), "run_tot", "update")
    # update mode emits one row per user per batch containing them; the
    # MAX n_events per user is the final cumulative value
    final = spark.sql(
        "SELECT user_id, MAX(n_events) AS n, COUNT(*) AS emissions FROM run_tot GROUP BY user_id"
    ).collect()
    want = {
        r.user_id: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {r.user_id: r.n for r in final}
    assert got == want
    # state actually crossed batches: users appearing in >1 file emitted >1 row
    assert any(r.emissions > 1 for r in final)


def test_running_totals_value_sum(spark, sf_dir, multi_file_events):
    st = _stream(spark, multi_file_events)
    SP.run_stream_to_memory(ST.running_user_totals(st), "run_tot2", "update")
    got = {
        r.user_id: r.v
        for r in spark.sql(
            "SELECT user_id, MAX(total_value) AS v FROM run_tot2 GROUP BY user_id"
        ).collect()
    }
    want = {
        r.user_id: r.v
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.sum("value").alias("v"))
        .collect()
    }
    for uid, v in want.items():
        assert got[uid] == pytest.approx(v, rel=1e-9)


def test_stateful_seen_filter_one_winner_per_key(spark, sf_dir, multi_file_events):
    st = _stream(spark, multi_file_events)
    SP.run_stream_to_memory(ST.stateful_seen_filter(st), "seen_out", "update")
    rows = spark.sql("SELECT * FROM seen_out").collect()
    keys = [(r.user_id, r.event_type) for r in rows]
    assert len(keys) == len(set(keys))  # exactly one emission per key
    n_keys = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert len(keys) == n_keys


def test_transform_with_state_matches_apply_in_pandas(spark, sf_dir, multi_file_events):
    """Spark 4 transformWithStateInPandas agrees with the
    applyInPandasWithState op on final cumulative totals (RocksDB state
    store, state crossing micro-batches).

    Capability-gated: the TransformWithState Python driver worker speaks
    protobuf to the JVM; without the ``google.protobuf`` package the
    runner crashes at init, so this skips where protobuf is absent (the
    ``applyInPandasWithState`` tests above cover the stateful semantics
    either way)."""
    pytest.importorskip("google.protobuf")
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        st = _stream(spark, multi_file_events)
        SP.run_stream_to_memory(ST.running_user_totals_tws(st), "tws_tot", "update")
        got = {
            r.user_id: (r.n_events, r.total_value)
            for r in spark.sql(
                "SELECT user_id, MAX(n_events) n_events, MAX(total_value) total_value"
                " FROM tws_tot GROUP BY user_id"
            ).collect()
        }
        ev = load_table(spark, sf_dir, "events")
        want = {
            r.user_id: (r.n, r.tv)
            for r in ev.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
            .collect()
        }
        assert set(got) == set(want)
        for k, (n, tv) in want.items():
            assert got[k][0] == n
            assert abs(got[k][1] - tv) < 1e-6
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
