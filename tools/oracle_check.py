"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same sf dir, then compares row count, column names/order-insensitive
sorted values. Reports exact-match and a tolerance diagnostic so float
divergences are visible before the driver sees them.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
       python tools/oracle_check.py --json OUT.json [sf_dir] [query ...]

``--json`` writes a CORRECTNESS-shaped artifact (one record per query:
rows/schema/hash match + row counts) so the repo carries committed
oracle evidence for EVERY registered query, not just the driver's
50-per-round sample (round-4 ADVICE: 54 queries had no in-repo record).
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from __spark_entry__ import oracle_sql, queries  # noqa: E402
from webscale_multimodal_datapipeline_spark.catalog import TABLES  # noqa: E402
from webscale_multimodal_datapipeline_spark.session import get_spark  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]) or pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif isinstance(df[c].dtype, object.__class__) or df[c].dtype == object:
            # canonicalize NA first: Spark toPandas renders object NULLs as
            # None ('None'), DuckDB nullable BOOLEAN/VARCHAR as NaN ('nan')
            df[c] = df[c].map(
                lambda v: "<NULL>"
                if (not isinstance(v, (list, tuple)) and pd.isna(v) is True)
                else str(v)
            )
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> tuple[bool, str]:
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return False, f"columns differ: {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    if len(spark_pdf) != len(duck_pdf):
        return False, f"row count {len(spark_pdf)} vs {len(duck_pdf)}"
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        if a[c].dtype != b[c].dtype:
            return False, f"dtype {c}: {a[c].dtype} vs {b[c].dtype}"
        if a[c].dtype == np.float64:
            ae, be = a[c].to_numpy(), b[c].to_numpy()
            if not np.array_equal(ae, be, equal_nan=True):
                close = np.allclose(ae, be, rtol=1e-9, atol=1e-12, equal_nan=True)
                worst = np.nanmax(np.abs(ae - be)) if len(ae) else 0.0
                return False, f"float col {c}: exact mismatch (close={close}, worst={worst:.3e})"
        else:
            if not a[c].equals(b[c]):
                n_bad = int((a[c] != b[c]).sum())
                ex = a.loc[a[c] != b[c], c].head(3).tolist(), b.loc[a[c] != b[c], c].head(3).tolist()
                return False, f"col {c}: {n_bad} mismatched values, e.g. {ex}"
    return True, "ok"


def is_resource_err(e: Exception) -> bool:
    """True iff a DuckDB oracle failure is a RESOURCE interrupt (memory
    limit / temp-dir limit / wall-cap ``con.interrupt()``), not a value
    divergence. Split out so artifacts are machine-distinguishable
    (VERDICT r8 #4: the sf1 sweep's four interrupt rows were recorded as
    plain fails, leaving only the ``err`` string to tell a harness limit
    from a red row)."""
    tname = type(e).__name__
    if "OutOfMemory" in tname or "Interrupt" in tname:
        return True
    msg = str(e).lower()
    return (
        "memory limit" in msg
        or "out of memory" in msg
        or "temp_directory" in msg
        or "temporary directory" in msg
        or "interrupt" in msg
    )


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark("oracle_check")
    con = duckdb.connect()
    # Resource guards for large-SF runs (round 8): the sf1 sweep found one
    # wedge-heavy graph oracle spilling 55 GB of DuckDB temp and filling
    # the disk. With ORACLE_DUCK_MEM set (e.g. "48GB"), a runaway oracle
    # errors out as a clean FAIL record instead of taking the box down —
    # the failure is then a documented ORACLE resource limit, not an
    # engine divergence.
    import os

    duck_mem = os.environ.get("ORACLE_DUCK_MEM")
    # per-oracle wall cap (seconds; 0 = off): a runaway oracle is
    # interrupted and recorded as a FAIL with the interrupt error
    duck_timeout = float(os.environ.get("ORACLE_DUCK_TIMEOUT", "0"))
    if duck_mem:
        con.sql(f"SET memory_limit='{duck_mem}'")
        con.sql(
            "SET max_temp_directory_size='"
            + os.environ.get("ORACLE_DUCK_TEMP", "30GB")
            + "'"
        )
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, oracles = queries(), oracle_sql()
    n_pass = n_fail = n_rows_only = n_resource = 0
    records: dict[str, dict] = {}

    def _flush() -> None:
        # incremental artifact write: a multi-hour large-SF sweep must not
        # lose every record to a crash at query N (round-8 sf1 lesson)
        if json_out:
            import json as _json

            with open(json_out, "w") as fh:
                _json.dump(
                    {
                        "sf_dir": sf_dir,
                        "n_pass": n_pass,
                        "n_fail": n_fail,
                        # n_fail split (VERDICT r8 #4): resource = the
                        # ORACLE hit its memory/temp/wall guard (harness
                        # limit); divergence = a real red row.
                        "n_fail_resource": n_resource,
                        "n_fail_divergence": n_fail - n_resource,
                        "n_rows_only": n_rows_only,
                        "queries": records,
                    },
                    fh,
                    indent=1,
                )

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            records[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": None, "oracle_rows": None,
                "err": f"spark {type(e).__name__}: {e}"[:300],
            }
            n_fail += 1
            _flush()
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{t_spark:.1f}s]")
            records[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(sdf), "oracle_rows": None, "err": None,
                "no_oracle": True,
            }
            n_rows_only += 1
            _flush()
            continue
        t0 = time.time()
        timer = None
        if duck_timeout:
            import threading

            timer = threading.Timer(duck_timeout, con.interrupt)
            timer.start()
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            resource = is_resource_err(e)
            kind = "oracle-resource" if resource else "duckdb error"
            print(f"FAIL  {name}: {kind}: {type(e).__name__}: {e}")
            records[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": len(sdf), "oracle_rows": None,
                "err": f"duckdb {type(e).__name__}: {e}"[:300],
                "oracle_resource_fail": resource,
            }
            n_fail += 1
            n_resource += resource
            _flush()
            continue
        finally:
            if timer is not None:
                timer.cancel()
        t_duck = time.time() - t0
        ok, msg = compare(name, sdf, ddf)
        status = "PASS" if ok else "FAIL"
        print(f"{status}  {name}: {len(sdf)} rows, {msg} [spark {t_spark:.1f}s, duck {t_duck:.1f}s]")
        records[name] = {
            "rows_match": len(sdf) == len(ddf),
            "schema_match": sorted(sdf.columns) == sorted(ddf.columns),
            "hash_match": bool(ok),
            "spark_rows": len(sdf),
            "oracle_rows": len(ddf),
            "err": None if ok else msg[:300],
        }
        n_pass += ok
        n_fail += not ok
        _flush()
    print(
        f"\n{n_pass} pass, {n_fail} fail"
        f" ({n_fail - n_resource} divergence, {n_resource} oracle-resource),"
        f" {n_rows_only} rows-only"
    )
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "n_fail_resource": n_resource,
                    "n_fail_divergence": n_fail - n_resource,
                    "n_rows_only": n_rows_only,
                    "queries": records,
                },
                fh,
                indent=1,
            )
        print(f"wrote {json_out} ({len(records)} records)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
