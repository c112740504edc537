"""Repo-wide plan audit: flag 100-TB liabilities across every registered
query WITHOUT executing anything (plans only).

Checks, per query:
- physical: ``Exchange SinglePartition`` whose consumer is NOT a final
  scalar aggregate (a data-sized single-task stage);
- physical: ``CartesianProduct`` (an unbroadcast cross join gone
  quadratic);
- logical (analyzed plan): an EXPLICIT broadcast hint whose subtree
  reads a SCALING table with no reducing operator (Aggregate / Distinct
  / Limit) between hint and scan. Stats-chosen physical broadcasts are
  NOT flagged — AQE re-decides those per run, which is exactly the
  behavior we want at 100 TB; only a forced hint survives scale-up.

Filter-only hinted subtrees are allowed when the filter is bounded BY
DESIGN (a query set, a blocklist, a benchmark split) — those cases are
named in _ALLOW with the reason, so the allowlist is an audit artifact,
not a bypass.

Usage: python tools/plan_audit.py [sf_dir]. Exit 1 on findings.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from webscale_multimodal_datapipeline_spark.plans.registry import QUERIES  # noqa: E402
from webscale_multimodal_datapipeline_spark.session import get_spark  # noqa: E402

SCALING_TABLES = ("customer", "orders", "lineitem", "documents", "events", "embeddings")
REDUCING = re.compile(r"Aggregate|Distinct|Deduplicate|GlobalLimit|LocalLimit|Intersect")

# query -> reason the finding is bounded by design (audit artifact)
_ALLOW: dict[str, str] = {
    "v_cosine_topk": "hinted side = the QUERY set (vec_id < 3): queries are user-supplied and small by contract",
    "v_lsh_topk": "hinted side = the query set (vec_id < 3)",
    "v_ivf_topk": "hinted side = the query set / centroid table (k-bounded)",
    "v_maxsim_topk": "hinted side = the 4-vector query bag",
    "v_pq_adc_topk": "hinted side = query set + codebooks (k*m-bounded)",
    "v_crossmodal_filter": "hinted side = per-id scored pairs capped by the query set",
    "d_decontaminate": "hinted side = benchmark shingle set (eval suites are small by nature; documented)",
    "d_contamination_score": "hinted side = benchmark shingle set (same split as d_decontaminate)",
    "m_phash_blocklist": "hinted side = curated hash blocklist (distributed as a small list by nature)",
    "x_revenue_share": "single-partition window input = per-nation rollup (bounded by the nation dim)",
    "a_semantic_dedup": "hinted side = KMeans centroids (k-bounded)",
}


def audit_physical(name: str, plan: str) -> list[str]:
    finds: list[str] = []
    lines = plan.split("\n")
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            nxt = lines[i + 1] if i + 1 < len(lines) else ""
            prev = lines[i - 1] if i > 0 else ""
            ok = ("partial_" in nxt and "keys=[]" in nxt) or (
                "keys=[]" in prev or "Aggregate(keys=[]" in prev
            )
            if not ok:
                finds.append(f"single-partition exchange: {ln.strip()[:90]}")
    if "CartesianProduct" in plan:
        finds.append("CartesianProduct present")
    return finds


def audit_hints(name: str, analyzed: str) -> list[str]:
    finds: list[str] = []
    lines = analyzed.split("\n")
    for i, ln in enumerate(lines):
        if "ResolvedHint" not in ln or "broadcast" not in ln:
            continue
        depth = len(ln) - len(ln.lstrip(" :+-"))
        subtree = []
        for nxt in lines[i + 1 :]:
            nd = len(nxt) - len(nxt.lstrip(" :+-"))
            if nd <= depth:
                break
            subtree.append(nxt)
            if REDUCING.search(nxt):
                subtree = None  # reduced before any scan below matters
                break
        if subtree is None:
            continue
        blob = "\n".join(subtree)
        # analyzed-plan Relation nodes don't carry the file name — identify
        # scaling tables by their signature id column
        sig = {
            "customer": "c_custkey#",
            "orders": "o_orderkey#",
            "lineitem": "l_orderkey#",
            "documents": "doc_id#",
            "events": "event_id#",
            "embeddings": "vec_id#",
        }
        for t, col in sig.items():
            if re.search(rf"Relation \[[^\]]*{re.escape(col)}", blob):
                finds.append(f"forced broadcast over filter-only {t}")
                break
    return finds


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit")
    bad = 0
    allowed_hits: list[str] = []
    for name, fn in sorted(QUERIES.items()):
        try:
            qe = fn(spark, sf_dir)._jdf.queryExecution()
            finds = audit_physical(name, qe.executedPlan().toString()) + audit_hints(
                name, qe.analyzed().toString()
            )
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:120]}")
            bad += 1
            continue
        for f in finds:
            if name in _ALLOW:
                allowed_hits.append(f"{name}: {f} [allowed: {_ALLOW[name]}]")
            else:
                print(f"FLAG  {name}: {f}")
                bad += 1
    for a in allowed_hits:
        print(f"OK    {a}")
    print(f"\n{len(QUERIES)} plans audited, {bad} findings, {len(allowed_hits)} allowed-by-design")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
