"""Independent-reference tests for the statistics layer (sweeps 20-23).

The DuckDB oracles mirror each query's ALGEBRA, so a shared algorithmic
bug (wrong run-algebra for the Gini rank sum, a dropped tie correction
in Mann-Whitney) would pass both engines. These tests recompute each
statistic from the raw sf0.001 parquet with a DIFFERENT algorithm —
direct sort-based formulas in plain Python/numpy — the reference
repo's Python-vs-Rust differential house style
(`/root/reference/tests/test_image_technical_quality.py`) aimed at the
statistics instead of the kernels.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/events.parquet")


def _run(spark, name):
    from webscale_multimodal_datapipeline_spark.plans.registry import QUERIES

    return QUERIES[name](spark, SF_DIR).toPandas()


# ---------------------------------------------------------------------------
# e_activity_gini vs the direct sorted-rank formula
# ---------------------------------------------------------------------------


def test_gini_matches_direct_formula(spark, events):
    x = np.sort(events.groupby("user_id").size().to_numpy())
    n = len(x)
    i = np.arange(1, n + 1)
    gini = (2 * np.sum(i * x) - (n + 1) * np.sum(x)) / (n * np.sum(x))
    row = _run(spark, "e_activity_gini").iloc[0]
    assert row["n_users"] == n
    assert row["total_events"] == int(np.sum(x))
    assert abs(row["gini"] - gini) < 1e-6


# ---------------------------------------------------------------------------
# s_ks_test vs direct empirical CDFs
# ---------------------------------------------------------------------------


def test_ks_matches_direct_cdfs(spark, docs):
    a = np.sort(docs.loc[docs.lang == "en", "n_chars"].to_numpy())
    b = np.sort(docs.loc[docs.lang != "en", "n_chars"].to_numpy())
    grid = np.unique(np.concatenate([a, b]))
    f1 = np.searchsorted(a, grid, side="right") / len(a)
    f2 = np.searchsorted(b, grid, side="right") / len(b)
    d = np.max(np.abs(f1 - f2))
    row = _run(spark, "s_ks_test").iloc[0]
    assert row["n1"] == len(a) and row["n2"] == len(b)
    assert abs(row["d_stat"] - d) < 1e-6


# ---------------------------------------------------------------------------
# s_mannwhitney_u vs direct midrank computation
# ---------------------------------------------------------------------------


def test_mannwhitney_matches_direct_midranks(spark, docs):
    a = docs.loc[docs.lang == "en", "n_chars"].to_numpy()
    b = docs.loc[docs.lang != "en", "n_chars"].to_numpy()
    combined = np.concatenate([a, b])
    # midranks via average rank of ties (pandas implements exactly this)
    ranks = pd.Series(combined).rank(method="average").to_numpy()
    r1 = np.sum(ranks[: len(a)])
    n1, n2 = len(a), len(b)
    # standard (scipy) convention: U1 = R1 − n1(n1+1)/2; z > 0 ⇔ group 1
    # tends larger (round-5 fix — the old complement form inverted z's sign)
    u1 = r1 - n1 * (n1 + 1) / 2
    _, t_counts = np.unique(combined, return_counts=True)
    ties = np.sum(t_counts.astype(np.float64) ** 3 - t_counts)
    nn = n1 + n2
    var = n1 * n2 / 12.0 * ((nn + 1) - ties / (nn * (nn - 1)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var)
    row = _run(spark, "s_mannwhitney_u").iloc[0]
    assert row["n1"] == n1 and row["n2"] == n2
    assert abs(row["u_stat"] - u1) < 1e-9
    assert abs(row["z_score"] - z) < 1e-5


# ---------------------------------------------------------------------------
# s_shard_jackknife: pseudovalues average back to the full-sample mean
# ---------------------------------------------------------------------------


def test_jackknife_pseudovalues_consistent(spark, docs):
    import hashlib

    out = _run(spark, "s_shard_jackknife").set_index("shard")
    assert len(out) == 10
    assert out["n_docs"].sum() == len(docs)
    # direct recomputation with the same md5 sharding (shards are
    # UNEQUAL-sized, so K·x̄ − (K−1)·mean(loo) ≠ x̄ exactly — compare the
    # per-shard values themselves, not the equal-weight identity)
    shard = docs.doc_id.map(
        lambda d: int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16) % 10
    )
    s_all, c_all = docs.n_chars.sum(), len(docs)
    overall = s_all / c_all
    for k, grp in docs.groupby(shard):
        loo = (s_all - grp.n_chars.sum()) / (c_all - len(grp))
        pv = 10 * overall - 9 * loo
        row = out.loc[k]
        assert row["n_docs"] == len(grp)
        assert abs(row["loo_mean"] - loo) < 1e-6
        assert abs(row["pseudovalue"] - pv) < 1e-6
    # and the pseudovalue mean still lands near the overall mean
    assert abs(out["pseudovalue"].mean() - overall) < 1.0


# ---------------------------------------------------------------------------
# s_psi_drift vs a direct histogram PSI
# ---------------------------------------------------------------------------


def test_psi_matches_direct_histogram(spark):
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    bucket = np.floor(orders.o_totalprice.to_numpy() / 50_000).astype(int)
    year = orders.o_orderdate.dt.year.to_numpy()
    base = bucket[year <= 1997]
    curr = bucket[year > 1997]
    vals = np.unique(bucket)
    nb, nc, k = len(base), len(curr), len(vals)
    psi = 0.0
    for v in vals:
        pb = (np.sum(base == v) + 1) / (nb + k)
        pc = (np.sum(curr == v) + 1) / (nc + k)
        psi += (pc - pb) * math.log(pc / pb)
    row = _run(spark, "s_psi_drift").iloc[0]
    assert row["n_base"] == nb and row["n_curr"] == nc and row["n_buckets"] == k
    assert abs(row["psi"] - psi) < 1e-5


# ---------------------------------------------------------------------------
# e_funnel_wilson_ci vs the direct Wilson formula
# ---------------------------------------------------------------------------


def _wilson(k: int, n: int) -> tuple[float, float]:
    z = 1.96
    ph = k / n
    center = (ph + z * z / (2 * n)) / (1 + z * z / n)
    half = z * math.sqrt(ph * (1 - ph) / n + z * z / (4 * n * n)) / (1 + z * z / n)
    return center - half, center + half


def test_wilson_ci_matches_direct(spark, events):
    flags = events.pivot_table(
        index="user_id",
        columns="event_type",
        values="event_id",
        aggfunc="count",
    ).notna()
    for col in ("view", "click", "purchase"):
        assert col in flags.columns
    n_view = int(flags["view"].sum())
    n_vc = int((flags["view"] & flags["click"]).sum())
    n_vcp = int((flags["view"] & flags["click"] & flags["purchase"]).sum())
    out = _run(spark, "e_funnel_wilson_ci").set_index("stage")
    vc = out.loc["view_to_click"]
    assert vc["n"] == n_view and vc["k"] == n_vc
    lo, hi = _wilson(n_vc, n_view)
    assert abs(vc["wilson_low"] - lo) < 1e-6 and abs(vc["wilson_high"] - hi) < 1e-6
    cp = out.loc["click_to_purchase"]
    assert cp["n"] == n_vc and cp["k"] == n_vcp
    lo, hi = _wilson(n_vcp, n_vc)
    assert abs(cp["wilson_low"] - lo) < 1e-6 and abs(cp["wilson_high"] - hi) < 1e-6
    # interval sanity: rate inside bounds
    assert lo <= n_vcp / n_vc <= hi


# ---------------------------------------------------------------------------
# x_cramers_v vs a direct contingency computation
# ---------------------------------------------------------------------------


def test_cramers_v_matches_direct(spark, events):
    ct = pd.crosstab(events.event_type, events.ts.dt.hour)
    o = ct.to_numpy().astype(np.float64)
    n = o.sum()
    e = np.outer(o.sum(axis=1), o.sum(axis=0)) / n
    chi2 = float(np.sum((o - e) ** 2 / e))
    v = math.sqrt(chi2 / (n * min(o.shape[0] - 1, o.shape[1] - 1)))
    row = _run(spark, "x_cramers_v").iloc[0]
    assert row["n_events"] == int(n)
    assert row["n_rows"] == o.shape[0] and row["n_cols"] == o.shape[1]
    # the query decimal-rounds per cell at 6 decimals; tolerance covers it
    assert abs(row["chi2"] - chi2) < 1e-3
    assert abs(row["cramers_v"] - v) < 1e-5


# ---------------------------------------------------------------------------
# t_char_entropy vs a direct Counter-based entropy
# ---------------------------------------------------------------------------


def test_char_entropy_matches_direct(spark, docs):
    letters = set("abcdefghijklmnopqrstuvwxyz")

    def ent(text: str) -> float:
        lt = text.lower()
        if not lt:
            return 0.0
        counts: dict[str, int] = {}
        for ch in lt:
            key = ch if ch in letters else ("#" if ch.isdigit() else (" " if ch == " " else "?"))
            counts[key] = counts.get(key, 0) + 1
        total = len(lt)
        return -sum(c / total * math.log(c / total) for c in counts.values())

    per_doc = docs.assign(ent=[ent(t) for t in docs.text])
    expected = per_doc.groupby("source")["ent"].agg(["count", "mean", "min", "max"])
    out = _run(spark, "t_char_entropy").set_index("source")
    assert set(out.index) == set(expected.index)
    for src, row in expected.iterrows():
        got = out.loc[src]
        assert got["n_docs"] == row["count"]
        assert abs(got["mean_entropy"] - row["mean"]) < 1e-4
        assert abs(got["min_entropy"] - row["min"]) < 1e-5
        assert abs(got["max_entropy"] - row["max"]) < 1e-5


# ---------------------------------------------------------------------------
# t_ttr_diversity vs direct distinct-token counting
# ---------------------------------------------------------------------------


def test_ttr_matches_direct(spark, docs):
    def ttr_ppm(text: str) -> int | None:
        toks = [t for t in text.lower().split() if t]
        if not toks:
            return None
        return len(set(toks)) * 1_000_000 // len(toks)

    vals = docs.assign(ttr=[ttr_ppm(t) for t in docs.text]).dropna(subset=["ttr"])
    expected = vals.groupby("source")["ttr"].agg(["count", "min", "max"])
    out = _run(spark, "t_ttr_diversity").set_index("source")
    for src, row in expected.iterrows():
        got = out.loc[src]
        assert got["n_docs"] == row["count"]
        assert got["min_ttr_ppm"] == row["min"]
        assert got["max_ttr_ppm"] == row["max"]


# ---------------------------------------------------------------------------
# v_knn_classify vs a direct numpy k-NN
# ---------------------------------------------------------------------------


def test_knn_matches_numpy(spark):
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    mat = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    ids = emb.vec_id.to_numpy()
    labels = emb.label.to_numpy()
    hold = ids < 10
    corpus_m, corpus_ids, corpus_lab = mat[~hold], ids[~hold], labels[~hold]
    out = _run(spark, "v_knn_classify").set_index("query_id")
    for qi in np.where(hold)[0]:
        q = mat[qi]
        cos = corpus_m @ q / (
            np.linalg.norm(corpus_m, axis=1) * np.linalg.norm(q)
        )
        # (cosine DESC, vec_id ASC) ordering
        order = np.lexsort((corpus_ids, -cos))[:5]
        votes: dict[int, int] = {}
        for lab in corpus_lab[order]:
            votes[int(lab)] = votes.get(int(lab), 0) + 1
        pred = min(votes, key=lambda l: (-votes[l], l))
        row = out.loc[ids[qi]]
        assert row["pred_label"] == pred
        assert row["true_label"] == labels[qi]
        assert row["votes"] == votes[pred]


# ---------------------------------------------------------------------------
# g_common_neighbors vs a direct set-based computation
# ---------------------------------------------------------------------------


def test_common_neighbors_matches_sets(spark):
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    edges: set[tuple[int, int]] = set()
    for _, grp in li.groupby("l_orderkey"):
        ss = sorted(set(grp.l_suppkey))
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                edges.add((ss[i], ss[j]))
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    scores: dict[tuple[int, int], int] = {}
    for center, nbrs in adj.items():
        if len(nbrs) > 50:
            continue
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                pair = (ns[i], ns[j])
                scores[pair] = scores.get(pair, 0) + 1
    cands = [(p, c) for p, c in scores.items() if p not in edges]
    cands.sort(key=lambda pc: (-pc[1], pc[0]))
    expected = cands[:15]
    out = _run(spark, "g_common_neighbors")
    got = [
        ((int(r.supp_a), int(r.supp_b)), int(r.common_neighbors))
        for r in out.itertuples()
    ]
    assert got == expected


# ---------------------------------------------------------------------------
# c_length_bucket_batching vs a direct batching simulation
# ---------------------------------------------------------------------------


def test_batching_waste_matches_simulation(spark, docs):
    out = _run(spark, "c_length_bucket_batching").set_index("bucket")
    sim: dict[int, list[int]] = {}
    for n in docs.n_chars:
        sim.setdefault(int(n) // 64, []).append(int(n))
    for bucket, lens in sim.items():
        lens.sort(reverse=True)
        padded = total = batches = 0
        for i in range(0, len(lens), 8):
            chunk = lens[i : i + 8]
            padded += len(chunk) * chunk[0]
            total += sum(chunk)
            batches += 1
        row = out.loc[bucket]
        assert row["n_docs"] == len(lens)
        assert row["n_batches"] == batches
        assert row["total_chars"] == total
        assert row["padded_chars"] == padded
        assert row["waste_ppm"] == (padded - total) * 1_000_000 // padded


# ---------------------------------------------------------------------------
# e_theil_index vs the direct per-user formula
# ---------------------------------------------------------------------------


def test_theil_matches_direct(spark, events):
    x = events.groupby("user_id").size().to_numpy().astype(np.float64)
    mu = x.mean()
    theil = float(np.mean((x / mu) * np.log(x / mu)))
    row = _run(spark, "e_theil_index").iloc[0]
    assert row["n_users"] == len(x)
    assert row["total_events"] == int(x.sum())
    assert abs(row["theil"] - theil) < 1e-5


# ---------------------------------------------------------------------------
# e_seasonality_strength vs a direct one-way ANOVA eta²
# ---------------------------------------------------------------------------


def test_seasonality_matches_direct_anova(spark, events):
    cells = (
        events.assign(d=events.ts.dt.date, hr=events.ts.dt.hour)
        .groupby(["d", "hr"])
        .size()
        .reset_index(name="c")
    )
    c = cells.c.to_numpy().astype(np.float64)
    grand = c.mean()
    sst = float(np.sum((c - grand) ** 2))
    ssb = float(
        sum(
            len(g) * (g.c.mean() - grand) ** 2
            for _, g in cells.groupby("hr")
        )
    )
    row = _run(spark, "e_seasonality_strength").iloc[0]
    assert row["n_cells"] == len(c)
    assert row["n_events"] == int(c.sum())
    assert abs(row["eta2"] - ssb / sst) < 1e-4
    by_hr = cells.groupby("hr")["c"].sum()
    peak = by_hr.sort_values(ascending=False).index[0]
    assert row["peak_events"] == by_hr.max()
    assert row["peak_hour"] == min(
        h for h in by_hr.index if by_hr[h] == by_hr.max()
    )


# ---------------------------------------------------------------------------
# Round-5 additions: CUSUM, BH-FDR, bootstrap, Neyman, power, ACF
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def orders() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/orders.parquet")


def test_cusum_matches_direct_argmax(spark, orders):
    daily = orders.groupby("o_orderdate").size().sort_index()
    c = daily.to_numpy().cumsum()
    n, N = len(daily), int(daily.sum())
    t = np.arange(1, n + 1)
    dev = np.abs(n * c - t * N)
    # argmax with earliest-date tie-break = numpy's first-max semantics
    i = int(np.argmax(dev))
    row = _run(spark, "ts_cusum_changepoint").iloc[0]
    assert row["day_idx"] == i + 1
    assert str(row["changepoint_date"]) == str(daily.index[i])[:10]
    assert row["abs_dev"] == int(dev[i])
    assert abs(row["cusum_stat"] - dev[i] / (n * N)) < 1e-8


def test_bh_fdr_matches_direct_stepup(spark, docs):
    g = docs.groupby("source")["n_chars"]
    N, S = len(docs), int(docs["n_chars"].sum())
    Q = int((docs["n_chars"].astype(object) ** 2).sum())
    rows = []
    for src, grp in g:
        n_s, s_s = len(grp), int(grp.sum())
        dev = N * s_s - n_s * S
        p = 1.0 if dev == 0 else min(1.0, n_s * (N * Q - S * S) / float(dev) ** 2)
        rows.append((src, round(p, 8)))
    rows.sort(key=lambda r: (r[1], r[0]))
    m = len(rows)
    ks = [i + 1 for i, (_, p) in enumerate(rows) if p <= (i + 1) * 0.05 / m]
    k = max(ks) if ks else 0
    want = {src: (i + 1, int(i + 1 <= k)) for i, (src, _) in enumerate(rows)}
    got = _run(spark, "s_bh_fdr")
    for _, r in got.iterrows():
        rank, rej = want[r["source"]]
        assert r["bh_rank"] == rank and r["bh_reject"] == rej, r["source"]


def test_poisson_bootstrap_matches_direct_replicates(spark, docs):
    import hashlib

    cuts = (367879, 735759, 919699, 981012)

    def md5_long(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    ids = docs["doc_id"].to_numpy()
    lens = docs["n_chars"].to_numpy()
    means = []
    for b in range(32):
        u = np.array([md5_long(f"{i}|{b}") % 1_000_000 for i in ids])
        w = np.searchsorted(cuts, u, side="right")  # inverse CDF: 0..4
        means.append(round(float((w * lens).sum()) / float(w.sum()), 6))
    ms = sorted(means)
    row = _run(spark, "s_poisson_bootstrap").iloc[0]
    assert row["n_docs"] == len(docs)
    assert abs(row["boot_mean"] - round(sum(ms) / 32, 6)) < 1e-6
    se = math.sqrt((32 * sum(m * m for m in ms) - sum(ms) ** 2) / (32 * 31))
    assert abs(row["boot_se"] - se) < 1e-5
    assert row["ci_lo"] == ms[1] and row["ci_hi"] == ms[30]


def test_neyman_matches_direct_allocation(spark, docs):
    g = docs.groupby("source")["n_chars"]
    sigs = {}
    for src, grp in g:
        n_h, s_h = len(grp), int(grp.sum())
        q_h = int((grp.astype(object) ** 2).sum())
        sigs[src] = (n_h, math.sqrt((n_h * q_h - s_h * s_h) / (n_h * n_h)))
    wsum = sum(round(n * s, 6) for n, s in sigs.values())
    ntot = sum(n for n, _ in sigs.values())
    got = _run(spark, "s_neyman_allocation")
    for _, r in got.iterrows():
        n_h, sig = sigs[r["source"]]
        assert r["n_docs"] == n_h
        assert abs(r["sigma_len"] - round(sig, 6)) < 1e-6
        assert r["n_prop"] == math.floor(10_000 * n_h / ntot + 0.5)
        assert r["n_neyman"] == math.floor(
            10_000 * (round(n_h * sig, 6) / wsum) + 0.5
        )


def test_power_analysis_matches_direct_formula(spark, events):
    x = events.groupby("user_id").size().to_numpy()
    n = len(x)
    mean = x.sum() / n
    var = (n * (x.astype(np.int64) ** 2).sum() - x.sum() ** 2) / (n * n)
    delta = 0.05 * mean
    z = 1.959964 + 0.841621
    row = _run(spark, "e_power_analysis").iloc[0]
    assert row["n_users"] == n
    assert abs(row["var_events"] - round(var, 6)) < 1e-6
    assert row["n_per_arm"] == math.ceil(z * z * 2.0 * var / (delta * delta))


def test_autocorrelation_matches_numpy_corrcoef(spark, orders):
    daily = orders.groupby("o_orderdate").size().sort_index().to_numpy().astype(float)
    got = {int(r["lag"]): r for _, r in _run(spark, "ts_autocorrelation").iterrows()}
    for lag in (1, 7):
        x, y = daily[lag:], daily[:-lag]
        r = np.corrcoef(x, y)[0, 1]
        assert got[lag]["n_pairs"] == len(x)
        assert abs(got[lag]["acf"] - r) < 1e-6, lag


def test_runs_test_matches_direct_scan(spark, orders):
    daily = orders.groupby("o_orderdate").size().sort_index().to_numpy()
    med = int(np.sort(daily)[(len(daily) - 1) // 2])  # exact lower median
    s = (daily > med).astype(int)
    runs = 1 + int((s[1:] != s[:-1]).sum())
    n, n1 = len(s), int(s.sum())
    n0 = n - n1
    mu = 2.0 * n1 * n0 / n + 1.0
    var = (mu - 1) * (mu - 2) / (n - 1)
    row = _run(spark, "s_runs_test").iloc[0]
    assert (row["n"], row["n1"], row["n0"], row["runs"]) == (n, n1, n0, runs)
    assert abs(row["z"] - (runs - mu) / math.sqrt(var)) < 1e-6


def test_exact_lower_median_is_lower_for_even_n(spark, docs):
    """ADVICE r5: `cum*2 >= n+1` picked the UPPER median for even n (both
    engines shared the bug, so oracle parity masked it). The fixture
    check: documents.n_chars at sf0.001 has even n, distinct lower/upper
    medians — assert the true (n+1)//2-th order statistic on both the
    Spark helper and the SQL mirror, plus a tiny even-n case with no ties
    at the cut."""
    import duckdb

    from webscale_multimodal_datapipeline_spark.functions import stats as ST
    from webscale_multimodal_datapipeline_spark.plans import oracle_fragments as OQ

    vals = docs["n_chars"].dropna().to_numpy()
    true_lower = int(np.sort(vals)[(len(vals) - 1) // 2])
    got = ST.exact_lower_median(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"), "n_chars"
    ).collect()[0]["median"]
    assert got == true_lower

    # minimal even-n case where lower != upper: [1, 2, 3, 4] -> 2
    tiny = spark.createDataFrame([(1,), (2,), (3,), (4,)], "v int")
    assert ST.exact_lower_median(tiny, "v").collect()[0]["median"] == 2

    con = duckdb.connect()
    sql = OQ.sql_lower_median("v", "(SELECT UNNEST([1, 2, 3, 4]) AS v) s")
    assert con.execute(f"SELECT {sql}").fetchone()[0] == 2
    sql = OQ.sql_lower_median("v", "(SELECT UNNEST([1, 2, 3]) AS v) s")
    assert con.execute(f"SELECT {sql}").fetchone()[0] == 2  # odd n unchanged


# ---------------------------------------------------------------------------
# Round-6 additions: independent numpy/pandas recomputation
# ---------------------------------------------------------------------------


def test_cuped_matches_direct_numpy(spark, events):
    ev = events[events["user_id"].notna()]
    import hashlib

    def arm(u):
        h = hashlib.md5((str(int(u)) + "#cuped").encode()).hexdigest()
        return int(h[:15], 16) % 2

    per = ev.groupby("user_id").apply(
        lambda g: pd.Series(
            {
                "x": g.loc[g.event_type == "view", "value"].sum(),
                "y": g.loc[g.event_type == "purchase", "value"].sum(),
            }
        ),
        include_groups=False,
    ).reset_index()
    per["arm"] = per["user_id"].map(arm)
    x, y = per["x"].to_numpy(), per["y"].to_numpy()
    n = len(per)
    cov = (x * y).sum() - x.sum() * y.sum() / n
    varx = (x * x).sum() - x.sum() ** 2 / n
    vary = (y * y).sum() - y.sum() ** 2 / n
    theta = cov / varx
    a, b = per[per.arm == 0], per[per.arm == 1]
    adj = lambda g: g["y"].mean() - theta * (g["x"].mean() - x.mean())  # noqa: E731
    row = _run(spark, "e_cuped").iloc[0]
    assert row["n_users"] == n
    assert abs(row["theta"] - theta) < 1e-4
    assert abs(row["diff_raw"] - (a["y"].mean() - b["y"].mean())) < 1e-4
    assert abs(row["diff_cuped"] - (adj(a) - adj(b))) < 1e-4
    assert abs(row["var_reduction"] - cov * cov / (varx * vary)) < 1e-6


def test_sprt_matches_direct_scan(spark, events):
    got = {r["event_type"]: r for _, r in _run(spark, "s_sprt_boundary").iterrows()}
    c1, c0 = math.log(0.5 / 0.4), math.log(0.5 / 0.6)
    A = math.log(19.0)
    for et, g in events.dropna(subset=["ts", "value"]).groupby("event_type"):
        g = g.sort_values(["ts", "event_id"])
        succ = (g["value"] > 50.0).to_numpy().astype(int)
        s = succ.cumsum()
        t = np.arange(1, len(succ) + 1)
        llr = s * c1 + (t - s) * c0
        row = got[et]
        assert row["n_total"] == len(succ)
        assert row["n_success"] == int(s[-1])
        assert abs(row["llr_final"] - llr[-1]) < 1e-5
        crossed = np.where((llr >= A) | (llr <= -A))[0]
        if len(crossed) == 0:
            assert row["decision"] == "continue" and pd.isna(row["first_cross_n"])
        else:
            k = crossed[0]
            assert row["first_cross_n"] == k + 1
            assert row["decision"] == ("accept_h1" if llr[k] >= A else "accept_h0")


def test_g_test_terms_match_direct(spark, docs):
    counts = docs.groupby("source").size()
    e = counts.sum() / len(counts)
    got = {r["source"]: r for _, r in _run(spark, "s_g_test").iterrows()}
    g_total = 0.0
    for src, o in counts.items():
        row = got[src]
        assert row["observed"] == o
        term = 2.0 * o * math.log(o / e)
        assert abs(row["g_term"] - term) < 1e-5
        g_total += term
    # sanity: G is non-negative for any observed-vs-uniform layout
    assert g_total >= 0.0


def test_holt_linear_matches_python_loop(spark, orders):
    daily = orders.groupby("o_orderdate").size().sort_index().to_numpy().astype(float)
    l, b = daily[0], daily[1] - daily[0]
    for yv in daily[2:]:
        l_new = 0.3 * yv + 0.7 * (l + b)
        b = 0.1 * (l_new - l) + 0.9 * b
        l = l_new
    row = _run(spark, "ts_holt_linear").iloc[0]
    assert row["n_days"] == len(daily)
    assert abs(row["level"] - l) < 1e-5
    assert abs(row["trend"] - b) < 1e-5
    assert abs(row["forecast_7d"] - (l + 7.0 * b)) < 1e-5


def test_join_cardinality_actual_matches_pandas_merge(spark, orders):
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    got = {r["join_name"]: r for _, r in _run(spark, "x_join_cardinality_estimate").iterrows()}
    co = len(cust.merge(orders, left_on="c_custkey", right_on="o_custkey"))
    ol = len(orders.merge(li, left_on="o_orderkey", right_on="l_orderkey"))
    assert got["customer_orders"]["actual_rows"] == co
    assert got["orders_lineitem"]["actual_rows"] == ol
    for r in got.values():
        est, act = r["est_uniform"], float(r["actual_rows"])
        assert abs(r["q_error"] - max(est, act) / min(est, act)) < 1e-4


def test_oov_rate_matches_pandas(spark, docs):
    import re

    def toks(s):
        s = re.sub(r"\s+", " ", s.lower()).strip()
        return [t for t in s.split(" ") if t]

    all_toks = docs["text"].map(toks)
    flat = pd.Series([t for ts in all_toks for t in ts])
    cnt = flat.value_counts()
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    vocab = {t for t, _ in ranked}
    got = {r["source"]: r for _, r in _run(spark, "t_oov_rate").iterrows()}
    for src, g in docs.groupby("source"):
        ts = [t for txt in g["text"] for t in toks(txt)]
        oov = sum(1 for t in ts if t not in vocab)
        row = got[src]
        assert row["n_tokens"] == len(ts) and row["n_oov"] == oov
