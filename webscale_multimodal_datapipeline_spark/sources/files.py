"""File-shard enumeration + dataset-layout readers (reference S1
``loaders/huggingface_loader.py:17-131``).

The reference lists a dataset repo's data files, sorts them for
deterministic sharding, splits them evenly across loader workers, and
supports resume. Spark subsumes almost all of it (FileIndex, input
splits, task retry); what remains useful is the explicit enumeration API
(deterministic file ordering + subsetting + ``max_samples``) and
multi-format dispatch (.parquet/.csv/.jsonl — ``huggingface_loader.py:
42-74`` extension priority).
"""

from __future__ import annotations

import fnmatch
import os

from pyspark.sql import DataFrame, SparkSession

EXTENSION_PRIORITY = (".parquet", ".orc", ".arrow", ".csv", ".jsonl", ".json", ".xml")

HAVE_FSSPEC = False
try:  # pragma: no cover - fsspec absent in this container
    import fsspec  # noqa: F401

    HAVE_FSSPEC = True
except ImportError:
    pass


def _pick_extension_family(
    paths: list[str], pattern: str, join=os.path.join
) -> list[str]:
    """Shared listing semantics: fnmatch on the basename, keep the best
    extension family present (``huggingface_loader.py:42-74`` priority),
    sorted for deterministic sharding (``:71``)."""
    found: dict[str, list[str]] = {ext: [] for ext in EXTENSION_PRIORITY}
    for p in paths:
        base = p.rsplit("/", 1)[-1]
        if not fnmatch.fnmatch(base, pattern):
            continue
        for ext in EXTENSION_PRIORITY:
            if base.endswith(ext):
                found[ext].append(p)
                break
    for ext in EXTENSION_PRIORITY:
        if found[ext]:
            return sorted(found[ext])
    return []


def list_data_files(root: str, pattern: str = "*") -> list[str]:
    """Deterministic sorted file listing (``huggingface_loader.py:71``:
    sorted for stable worker assignment). Picks the best extension family
    present, mirroring the reference's priority order. Remote URLs
    (``hf://``, ``s3://``, …) route through the fsspec hook."""
    if "://" in root:
        return list_remote_data_files(root, pattern)
    paths = []
    for dirpath, _, files in os.walk(root):
        paths.extend(os.path.join(dirpath, f) for f in files)
    return _pick_extension_family(paths, pattern)


def list_remote_data_files(url: str, pattern: str = "*", fs=None) -> list[str]:
    """Remote dataset listing via fsspec (``hf://datasets/...``-style repos
    and any other fsspec protocol), mirroring the reference's HF listing
    semantics (``huggingface_loader.py:42-74``): recursive find, extension
    family priority, sorted full URLs.

    Gated: raises ``NotImplementedError`` without fsspec installed. ``fs``
    injects a filesystem object (tests use a fake; production resolves the
    URL's protocol). Reading the listed files through Spark additionally
    needs the matching Hadoop connector on the cluster classpath — the
    listing itself only needs fsspec."""
    if fs is None:
        if not HAVE_FSSPEC:
            raise NotImplementedError(
                "remote listing requires fsspec (pip install fsspec "
                "huggingface_hub for hf://); this container has neither. "
                "Local paths work without it."
            )
        import fsspec as _fsspec

        fs, _ = _fsspec.core.url_to_fs(url)
    path = url.split("://", 1)[1] if "://" in url else url
    paths = [str(p) for p in fs.find(path)]
    picked = _pick_extension_family(paths, pattern)
    # re-attach the protocol so Spark/readers receive full URLs
    unstrip = getattr(fs, "unstrip_protocol", None)
    return [unstrip(p) if unstrip else p for p in picked]


def split_files(files: list[str], num_workers: int) -> list[list[str]]:
    """Even contiguous split (``huggingface_loader.py:42-74`` /
    ``executor.py:262-290``): no gaps, no overlaps. In Spark this is only
    needed for side-channel readers (e.g. streaming a listing); normal
    reads let the FileIndex assign splits."""
    if num_workers <= 0:
        raise ValueError("num_workers must be positive")
    n = len(files)
    base, extra = divmod(n, num_workers)
    out, start = [], 0
    for w in range(num_workers):
        size = base + (1 if w < extra else 0)
        out.append(files[start : start + size])
        start += size
    return out


def read_dataset(
    spark: SparkSession,
    root: str,
    pattern: str = "*",
    max_samples: int | None = None,
) -> DataFrame:
    """Read a file-based dataset with format dispatch + optional row cap
    (``max_samples`` → ``df.limit``, reference ``executor.py:254-260``)."""
    files = list_data_files(root, pattern)
    if not files:
        raise FileNotFoundError(f"no data files under {root} matching {pattern}")
    ext = next(e for e in EXTENSION_PRIORITY if files[0].endswith(e))
    if ext == ".parquet":
        df = spark.read.parquet(*files)
    elif ext == ".orc":
        df = spark.read.orc(files)  # list form (orc() has kw params after path)
    elif ext == ".csv":
        df = spark.read.csv(files, header=True)
    elif ext in (".jsonl", ".json"):
        df = spark.read.json(files)
    elif ext == ".xml":
        # Spark 4 native XML; rowTag "row" by convention (override by
        # reading directly when a feed uses a different element). Pass the
        # LIST — load() does not split comma-joined paths, so the joined
        # form breaks on any multi-file dataset.
        df = spark.read.option("rowTag", "row").format("xml").load(files)
    else:
        raise NotImplementedError(f"format {ext} needs pyarrow bridge")
    if max_samples:
        df = df.limit(int(max_samples))
    return df
