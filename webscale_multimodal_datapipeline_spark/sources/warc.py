"""CommonCrawl-style WARC source (reference S2 ``loaders/
commoncrawl_loader.py:17-179``).

Spark shape: ``spark.read.format("binaryFile")`` over ``.warc`` files →
``mapInPandas`` parsing each archive into N response records (the 1-file →
N-rows UDTF shape) → HTML→text extraction.

The reference keeps ``response`` records with ``text/html`` content and
emits ``{crawl_id, warc_path, url, warc_date, title, text, text_length}``
(``commoncrawl_loader.py:139-147``); the readability step
(``src/text_ops.rs:19-43``) is stood in for by a regex extractor with the
same contract — (title, text, length), None for unparseable HTML.

Scale note: WARC files are independent units → file-granular parallelism is
exactly Spark's binaryFile splitting; a crawl's 80K WARC files spread over
executors with zero coordination (the reference needs listing + manual
worker assignment, ``:38-64`` — Spark's FileIndex does this natively).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("crawl_id", T.StringType()),
        T.StructField("warc_path", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("text_length", T.LongType()),
    ]
)

_TAG_RE = re.compile(rb"<[^>]+>")
_SCRIPT_RE = re.compile(rb"<(script|style)[^>]*>.*?</\1>", re.DOTALL | re.IGNORECASE)
_TITLE_RE = re.compile(rb"<title[^>]*>(.*?)</title>", re.DOTALL | re.IGNORECASE)
_WS_RE = re.compile(r"\s+")


def html_extract_text(html: bytes) -> tuple[str, str, int] | None:
    """Readability stand-in (contract of ``src/text_ops.rs:48-60``):
    (title, text, text_length) or None. Panic-safe like the Rust kernel's
    catch_unwind (``text_ops.rs:23-42``) — any parse error → None."""
    try:
        title_m = _TITLE_RE.search(html)
        title = title_m.group(1).decode("utf-8", "replace").strip() if title_m else ""
        body = _SCRIPT_RE.sub(b" ", html)
        text = _TAG_RE.sub(b" ", body).decode("utf-8", "replace")
        text = _WS_RE.sub(" ", text).strip()
        if not text:
            return None
        return title, text, len(text)
    except Exception:
        return None


def parse_warc_bytes(payload: bytes, path: str, crawl_id: str) -> list[dict]:
    """Minimal WARC/1.0 parser: split records, keep ``response`` records
    with text/html payloads, extract readable text."""
    out: list[dict] = []
    if not payload:
        return out
    for chunk in payload.split(b"WARC/1.0\r\n")[1:]:
        try:
            header_blob, _, rest = chunk.partition(b"\r\n\r\n")
            headers = {}
            for line in header_blob.split(b"\r\n"):
                k, _, v = line.partition(b":")
                headers[k.strip().lower()] = v.strip()
            if headers.get(b"warc-type") != b"response":
                continue
            # skip the HTTP response header block
            _, _, http_body = rest.partition(b"\r\n\r\n")
            if b"<html" not in http_body[:4096].lower() and b"<!doctype" not in http_body[:4096].lower():
                continue
            extracted = html_extract_text(http_body)
            if extracted is None:
                continue
            title, text, n = extracted
            out.append(
                {
                    "crawl_id": crawl_id,
                    "warc_path": path,
                    "url": headers.get(b"warc-target-uri", b"").decode("utf-8", "replace"),
                    "warc_date": headers.get(b"warc-date", b"").decode("utf-8", "replace"),
                    "title": title,
                    "text": text,
                    "text_length": n,
                }
            )
        except Exception:
            continue  # malformed record — skip, never fail the task
    return out


def read_warc(spark: SparkSession, path_glob: str, crawl_id: str = "crawl") -> DataFrame:
    """WARC files → one DataFrame of extracted text records."""
    binary = spark.read.format("binaryFile").load(path_glob)

    def _parse(batches):
        for pdf in batches:
            rows: list[dict] = []
            for _, row in pdf.iterrows():
                rows.extend(parse_warc_bytes(row["content"], row["path"], crawl_id))
            yield pd.DataFrame(rows, columns=[f.name for f in WARC_RECORD_SCHEMA.fields])

    return binary.select("path", "content").mapInPandas(_parse, WARC_RECORD_SCHEMA)


def html_extract_len_udf():
    """Vectorized html-extract lane (bench comparison surface for the
    reference's Rust readability kernel, 5,000 doc/s single-node —
    ``docs/ARCHITECTURE.md:408-414``): binary html → extracted text length
    (0 when unparseable). Arrow-batched so the Python kernel amortizes
    per-row overhead the way the Rust batch kernel does."""
    import pandas as pd
    from pyspark.sql import functions as F

    @F.pandas_udf("int")
    def _extract_len(s: pd.Series) -> pd.Series:
        return s.map(
            lambda b: (html_extract_text(b) or ("", "", 0))[2]
        ).astype("int32")

    return _extract_len


# ---------------------------------------------------------------------------
# Spark 4 Python DataSource: spark.read.format("warc")
# ---------------------------------------------------------------------------

try:  # pyspark >= 4.0
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class WarcDataSource(DataSource):
        """``spark.read.format("warc").load(glob)`` — the WARC loader as a
        first-class Spark data source (Python DataSource API, Spark 4).

        Same record contract as ``read_warc`` (reference
        ``loaders/commoncrawl_loader.py:139-147``), but the format shows
        up in the catalog/reader machinery like any built-in: schema is
        declared (not inferred), each WARC file is one InputPartition
        (file-granular parallelism — a crawl's 80K files = 80K splits),
        and the executor-side generator streams records without
        materializing a batch DataFrame first.

        This path opens files with local/posix IO; for object stores go
        through ``read_warc`` (binaryFile rides Hadoop's FileSystem).
        Options: ``path`` (glob), ``crawl_id``.
        """

        @classmethod
        def name(cls) -> str:
            return "warc"

        def schema(self):
            return WARC_RECORD_SCHEMA

        def reader(self, schema):
            return _WarcReader(self.options)

    class _WarcReader(DataSourceReader):
        def __init__(self, options):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("warc source requires a path, e.g. .load('/data/*.warc')")
            self.crawl_id = options.get("crawl_id", "crawl")

        def partitions(self):
            import glob as _glob

            files = sorted(_glob.glob(self.path))
            if not files:
                raise FileNotFoundError(f"no WARC files match {self.path}")
            return [InputPartition(f) for f in files]

        def read(self, partition):
            path = partition.value
            with open(path, "rb") as fh:
                payload = fh.read()
            cols = [f.name for f in WARC_RECORD_SCHEMA.fields]
            for rec in parse_warc_bytes(payload, path, self.crawl_id):
                yield tuple(rec[c] for c in cols)

    def register_warc_source(spark: SparkSession) -> None:
        """Idempetent per-session registration of the ``warc`` format."""
        spark.dataSource.register(WarcDataSource)

except ImportError:  # pragma: no cover — pyspark < 4 fallback

    def register_warc_source(spark: SparkSession) -> None:
        raise NotImplementedError(
            "the Python DataSource API needs pyspark >= 4.0; use read_warc()"
        )
