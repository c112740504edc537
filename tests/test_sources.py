"""Source/sink tests: WARC parse + extract, file sharding (no gaps/overlaps
— the reference's loader-assignment test, ``test_file_loader.py:19-45``),
format dispatch, rejected sink partitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webscale_multimodal_datapipeline_spark.sources import files as SF
from webscale_multimodal_datapipeline_spark.sources import sinks as SK
from webscale_multimodal_datapipeline_spark.sources import warc as SW


def _warc_record(url: str, body: bytes, rtype: bytes = b"response") -> bytes:
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + rtype + b"\r\n"
        b"WARC-Target-URI: " + url.encode() + b"\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"\r\n" + http + b"\r\n\r\n"
    )


HTML = b"<html><head><title>My Page</title><script>junk()</script></head><body><p>Hello readable world</p></body></html>"


def test_html_extract():
    title, text, n = SW.html_extract_text(HTML)
    assert title == "My Page"
    assert "Hello readable world" in text
    assert "junk" not in text
    assert n == len(text)


def test_html_extract_malformed_returns_none():
    assert SW.html_extract_text(b"") is None
    # invalid UTF-8 must not raise (panic-regression from the reference,
    # test_rust_accelerated_ops.py:62-122)
    out = SW.html_extract_text(b"<html><body>\xff\xfe ok</body></html>")
    assert out is None or isinstance(out[1], str)


def test_warc_read_end_to_end(spark, tmp_path):
    payload = (
        _warc_record("http://a.com/1", HTML)
        + _warc_record("http://a.com/2", b"not html at all")  # filtered: no <html
        + _warc_record("http://a.com/3", HTML, rtype=b"request")  # filtered: type
        + _warc_record("http://a.com/4", b"<html><body>Second doc text</body></html>")
    )
    p = tmp_path / "test.warc"
    p.write_bytes(payload)
    df = SW.read_warc(spark, str(p), crawl_id="c1")
    rows = {r.url: r for r in df.collect()}
    assert set(rows) == {"http://a.com/1", "http://a.com/4"}
    assert rows["http://a.com/1"].title == "My Page"
    assert rows["http://a.com/4"].text_length == len("Second doc text")
    assert all(r.crawl_id == "c1" for r in rows.values())


def test_split_files_no_gaps_no_overlaps():
    files = [f"f{i:03d}" for i in range(10)]
    shards = SF.split_files(files, 3)
    assert [len(s) for s in shards] == [4, 3, 3]
    flat = [f for s in shards for f in s]
    assert flat == files  # order preserved, no gap/overlap


def test_split_more_workers_than_files():
    shards = SF.split_files(["a"], 4)
    assert shards == [["a"], [], [], []]


def test_read_dataset_dispatch_and_limit(spark, sf_dir, tmp_path):
    df = SF.read_dataset(spark, sf_dir, pattern="documents*", max_samples=7)
    assert df.count() == 7
    with pytest.raises(FileNotFoundError):
        SF.read_dataset(spark, str(tmp_path), pattern="*.nope")


def test_rejected_sink_partitioned_by_operator(spark, sf_dir, tmp_path):
    from webscale_multimodal_datapipeline_spark.catalog import load_table
    from webscale_multimodal_datapipeline_spark.operators.filters import text_length_filter

    d = load_table(spark, sf_dir, "documents")
    res = text_length_filter(100, 450).split(d)
    SK.write_rejected(res.rejected, str(tmp_path / "rej"), mode="overwrite")
    dirs = {p.name for p in (tmp_path / "rej").iterdir() if p.is_dir()}
    assert "operator=text_length_filter" in dirs


def test_iceberg_gated(spark, sf_dir):
    from webscale_multimodal_datapipeline_spark.catalog import load_table

    if SK.iceberg_available(spark):
        pytest.skip("iceberg present")
    with pytest.raises(NotImplementedError):
        SK.write_iceberg(load_table(spark, sf_dir, "region"), "cat.db.t")


class _FakeRemoteFS:
    """Minimal fsspec-like filesystem: find + unstrip_protocol."""

    def __init__(self, files):
        self._files = files

    def find(self, path):
        return [f for f in self._files if f.startswith(path)]

    def unstrip_protocol(self, p):
        return f"hf://{p}"


def test_remote_listing_with_mock_fs():
    from webscale_multimodal_datapipeline_spark.sources import files as SF

    fs = _FakeRemoteFS(
        [
            "datasets/org/repo/data/b.parquet",
            "datasets/org/repo/data/a.parquet",
            "datasets/org/repo/data/readme.md",
            "datasets/org/repo/data/c.csv",
        ]
    )
    got = SF.list_remote_data_files("hf://datasets/org/repo", fs=fs)
    # parquet family wins over csv; sorted; protocol re-attached
    assert got == [
        "hf://datasets/org/repo/data/a.parquet",
        "hf://datasets/org/repo/data/b.parquet",
    ]
    # pattern filtering + family fallback
    got_csv = SF.list_remote_data_files("hf://datasets/org/repo", pattern="*.csv", fs=fs)
    assert got_csv == ["hf://datasets/org/repo/data/c.csv"]


def test_remote_listing_gate_without_fsspec():
    import pytest as _pt

    from webscale_multimodal_datapipeline_spark.sources import files as SF

    if SF.HAVE_FSSPEC:  # pragma: no cover
        _pt.skip("fsspec present")
    with _pt.raises(NotImplementedError, match="fsspec"):
        SF.list_remote_data_files("hf://datasets/org/repo")


def test_html_extract_len_udf_matches_function(spark):
    from pyspark.sql import functions as F

    from webscale_multimodal_datapipeline_spark.sources.warc import (
        html_extract_len_udf,
        html_extract_text,
    )

    samples = [
        b"<html><head><title>t</title></head><body><p>hello world</p></body></html>",
        b"<html><script>junk()</script><body>text here</body></html>",
        b"",
        b"\xff\xfe garbage \x00",
    ]
    df = spark.createDataFrame([(s,) for s in samples], ["html"])
    got = [r["n"] for r in df.select(html_extract_len_udf()("html").alias("n")).collect()]
    want = [(html_extract_text(s) or ("", "", 0))[2] for s in samples]
    assert got == want


def test_jsonl_and_csv_sinks_round_trip(spark, sf_dir, tmp_path):
    from webscale_multimodal_datapipeline_spark.catalog import load_table
    from webscale_multimodal_datapipeline_spark.sources import sinks

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    jp, cp = str(tmp_path / "j"), str(tmp_path / "c")
    sinks.write_jsonl(d, jp)
    back = spark.read.json(jp)
    assert back.count() == d.count()
    assert set(back.columns) == set(d.columns)
    sinks.write_csv(d, cp)
    back_csv = spark.read.option("header", "true").csv(cp, inferSchema=True)
    assert back_csv.count() == d.count()
    # nested columns are rejected loudly
    import pytest as _pt

    nested = d.withColumn("arr", F.array(F.lit(1)))
    with _pt.raises(ValueError, match="nested"):
        sinks.write_csv(nested, str(tmp_path / "c2"))


def test_compact_parquet_merges_small_files(spark, sf_dir, tmp_path):
    import os

    from webscale_multimodal_datapipeline_spark.catalog import load_table
    from webscale_multimodal_datapipeline_spark.sources import sinks

    d = load_table(spark, sf_dir, "documents")
    frag, out = str(tmp_path / "frag"), str(tmp_path / "compact")
    d.repartition(37).write.parquet(frag)  # simulate small-files buildup
    n_in = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    assert n_in == 37
    n_files = sinks.compact_parquet(spark, frag, out, target_rows_per_file=10**6)
    assert n_files == 1
    n_out = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert n_out == 1
    assert spark.read.parquet(out).count() == d.count()


def test_load_table_remote_root_routes_through_fsspec_gate(spark):
    """A catalog root with a protocol routes through the remote listing
    hook; without fsspec in the container that surfaces the documented
    NotImplementedError gate (not a file-not-found or a silent local
    read)."""
    import pytest as _pt

    from webscale_multimodal_datapipeline_spark.catalog import load_table
    from webscale_multimodal_datapipeline_spark.sources import files as SF

    if SF.HAVE_FSSPEC:  # pragma: no cover - container has no fsspec
        _pt.skip("fsspec present; gate not reachable")
    with _pt.raises(NotImplementedError, match="fsspec"):
        load_table(spark, "hf://datasets/org/repo", "documents")


def test_warc_python_datasource(spark, tmp_path):
    """The Spark-4 Python DataSource yields the same records as the
    binaryFile + mapInPandas path, with one partition per file."""
    payload = (
        _warc_record("http://a.com/1", HTML)
        + _warc_record("http://a.com/4", b"<html><body>Second doc text</body></html>")
    )
    (tmp_path / "a.warc").write_bytes(payload)
    (tmp_path / "b.warc").write_bytes(_warc_record("http://b.com/1", HTML))
    SW.register_warc_source(spark)
    df = (
        spark.read.format("warc")
        .option("crawl_id", "c1")
        .load(str(tmp_path / "*.warc"))
    )
    assert df.schema == SW.WARC_RECORD_SCHEMA
    rows = df.collect()
    assert {r.url for r in rows} == {"http://a.com/1", "http://a.com/4", "http://b.com/1"}
    assert all(r.crawl_id == "c1" and r.text_length > 0 for r in rows)
    assert df.rdd.getNumPartitions() == 2
    # parity with the binaryFile path (binaryFile reports file: URIs;
    # the posix reader reports bare paths — normalize before comparing)
    legacy = SW.read_warc(spark, str(tmp_path / "*.warc"), crawl_id="c1")

    def _norm(r):
        d = r.asDict()
        d["warc_path"] = d["warc_path"].removeprefix("file:")
        return tuple(d.values())

    assert {_norm(r) for r in rows} == {_norm(r) for r in legacy.collect()}


def test_orc_round_trip_and_dispatch(spark, tmp_path):
    """ORC as a first-class columnar source: write, read back through the
    extension dispatcher, predicate pushdown visible in the plan."""
    from webscale_multimodal_datapipeline_spark.sources.files import read_dataset

    src = spark.range(100).selectExpr("id", "id % 7 AS grp", "CAST(id AS STRING) AS s")
    out = str(tmp_path / "orcds")
    src.write.orc(out)
    back = read_dataset(spark, out, pattern="*.orc")
    assert back.count() == 100
    assert {f.name for f in back.schema} == {"id", "grp", "s"}
    import re

    plan = back.filter("grp = 3")._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "grp" in m.group(1), f"ORC scan did not push the grp filter: {m}"


def test_parquet_merge_schema_evolution(spark, tmp_path):
    """Schema evolution on read: two parquet generations with different
    columns union under mergeSchema — the add-a-column migration every
    long-lived corpus hits (reference infers per-batch schemas,
    iceberg_writer.py:81-116; Spark resolves the union statically)."""
    import pandas as pd

    p = tmp_path / "ds"
    p.mkdir()
    pd.DataFrame({"doc_id": [1, 2], "text": ["a", "b"]}).to_parquet(p / "gen1.parquet")
    pd.DataFrame(
        {"doc_id": [3], "text": ["c"], "lang": ["en"]}
    ).to_parquet(p / "gen2.parquet")
    df = spark.read.option("mergeSchema", "true").parquet(str(p))
    assert {f.name for f in df.schema} == {"doc_id", "text", "lang"}
    rows = {r.doc_id: r for r in df.collect()}
    assert rows[1].lang is None and rows[3].lang == "en"


def test_xml_source_and_zstd_codec(spark, tmp_path):
    """Spark-4 native XML source through the dispatcher, and zstd
    parquet round-trip (the production codec at 100 TB — ~30% smaller
    than snappy at similar scan speed)."""
    from webscale_multimodal_datapipeline_spark.sources.files import read_dataset

    xd = tmp_path / "xmlds"
    xd.mkdir()
    (xd / "feed.xml").write_text(
        "<rows><row><id>1</id><txt>a</txt></row>"
        "<row><id>2</id><txt>b</txt></row></rows>"
    )
    # SECOND file: load() must receive the path LIST (a comma-joined
    # string is one unsplittable path — the round-4 ADVICE bug).
    (xd / "feed2.xml").write_text(
        "<rows><row><id>3</id><txt>c</txt></row></rows>"
    )
    df = read_dataset(spark, str(xd), pattern="*.xml")
    assert df.count() == 3 and set(df.columns) == {"id", "txt"}
    assert {r.id for r in df.collect()} == {1, 2, 3}
    zp = str(tmp_path / "z")
    spark.range(100).write.option("compression", "zstd").parquet(zp)
    import os

    assert any(f.endswith(".zstd.parquet") for f in os.listdir(zp))
    assert spark.read.parquet(zp).count() == 100
