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

EXTENSION_PRIORITY = (".parquet", ".arrow", ".csv", ".jsonl", ".json")


def list_data_files(root: str, pattern: str = "*") -> list[str]:
    """Deterministic sorted file listing (``huggingface_loader.py:71``:
    sorted for stable worker assignment). Picks the best extension family
    present, mirroring the reference's priority order."""
    found: dict[str, list[str]] = {ext: [] for ext in EXTENSION_PRIORITY}
    for dirpath, _, files in os.walk(root):
        for f in files:
            if not fnmatch.fnmatch(f, pattern):
                continue
            for ext in EXTENSION_PRIORITY:
                if f.endswith(ext):
                    found[ext].append(os.path.join(dirpath, f))
                    break
    for ext in EXTENSION_PRIORITY:
        if found[ext]:
            return sorted(found[ext])
    return []


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
    elif ext == ".csv":
        df = spark.read.csv(files, header=True)
    elif ext in (".jsonl", ".json"):
        df = spark.read.json(files)
    else:
        raise NotImplementedError(f"format {ext} needs pyarrow bridge")
    if max_samples:
        df = df.limit(int(max_samples))
    return df
