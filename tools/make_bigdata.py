"""Scale the driver's sf0.1 fixtures to a ~sf1 dataset for the large-SF
full-catalog oracle run (VERDICT r7 #3: all 281 green rows were sf0.1;
size-dependent divergences — array limits, decimal overflow, window spill,
the simhash bucket_cap routing — only show at scale).

The driver owns /root/testdata (read-only to us), so the scaled set lands
in /root/repo/.bigdata/sf1 (gitignored; ~10× the sf0.1 bytes). Both
engines read the SAME files, so correctness comparisons are exactly as
strong as on driver data — only the distributions matter, and those are
the fixtures' own, replicated with referential integrity preserved:

- every replicated table's keys remap ``k*F + rep`` where F is the HOME
  table's factor, so FK edges (orders→customer, lineitem→orders/part/
  supplier) stay valid within each replica;
- nation/region (dimension leaves) are not replicated — fan-out to them
  grows, their cardinality doesn't, which is exactly how a real corpus
  scales;
- documents get a per-replica suffix TOKEN (cross-replica copies become
  near-dups, not exact dups — the probe replicator's rule: verbatim
  copies would manufacture bucket cliques);
- embeddings get hash-seeded float32 noise on the first 16 coordinates
  (same rule, vector form) and a factor chosen so ``scaled_planes`` stays
  at the oracle-pinned 8 (16,000 rows → ceil(log2(250)) = 8; a 10× factor
  would cross to 9 planes and desync every pinned LSH oracle).

Factors (sf0.1 base): relational 10× (6M lineitem), events 4× (400K),
documents 4× (20K), embeddings 8× (16K).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.bigdata/sf1"

FACTORS = {
    "region": 1,
    "nation": 1,
    "customer": 10,
    "supplier": 10,
    "part": 10,
    "orders": 10,
    "lineitem": 10,
    "events": 4,
    "documents": 4,
    "embeddings": 8,
}

# key column → the factor of its HOME table (applied as k*F + rep
# everywhere the key appears, so foreign keys stay valid per replica)
KEY_FACTOR = {
    "c_custkey": 10,
    "o_custkey": 10,
    "o_orderkey": 10,
    "l_orderkey": 10,
    "p_partkey": 10,
    "l_partkey": 10,
    "s_suppkey": 10,
    "l_suppkey": 10,
    "event_id": 4,
    "user_id": 4,
    "doc_id": 4,
    "vec_id": 8,
}


def scale_table(name: str) -> None:
    src = f"{SRC}/{name}.parquet"
    dst = f"{DST}/{name}.parquet"
    table = pq.read_table(src)
    factor = FACTORS[name]
    if factor == 1:
        pq.write_table(table, dst)
        print(f"{name}: copied ({table.num_rows} rows)")
        return
    pdf = table.to_pandas()
    reps = []
    for rep in range(factor):
        r = pdf.copy()
        for col in r.columns:
            f = KEY_FACTOR.get(col)
            if f is not None:
                r[col] = r[col] * f + rep
        if rep > 0 and name == "documents":
            # near-dup (not exact-dup) replicas: one extra token
            r["text"] = r["text"] + f" rep{rep}"
        if rep > 0 and name == "embeddings":
            rng = np.random.default_rng(20260816 + rep)
            mat = np.stack(r["embedding"].to_numpy()).astype(np.float32)
            noise = rng.uniform(-4.0, 4.0, size=(len(r), 16)).astype(np.float32)
            mat[:, :16] = mat[:, :16] + noise
            r["embedding"] = list(mat)
        reps.append(r)
    big = pd.concat(reps, ignore_index=True)
    out = pa.Table.from_pandas(big, schema=table.schema, preserve_index=False)
    pq.write_table(out, dst)
    print(f"{name}: {table.num_rows} -> {out.num_rows} rows")


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    for name in FACTORS:
        scale_table(name)


if __name__ == "__main__":
    main()
