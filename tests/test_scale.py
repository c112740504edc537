"""Scale-pattern tests: salted join correctness (must equal plain join),
co-partition zero-exchange, sized repartition."""

from __future__ import annotations

from pyspark.sql import functions as F

from webscale_multimodal_datapipeline_spark.operators import scale as SC


def test_salted_join_equals_plain_join(spark):
    # skewed left: 90% of rows share key 1
    left = spark.range(1000).select(
        F.when(F.col("id") < 900, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("lval"),
    )
    right = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 10).alias("rval"))
    plain = {(r.k, r.lval, r.rval) for r in left.join(right, "k").collect()}
    salted = {(r.k, r.lval, r.rval) for r in SC.salted_join(left, right, "k", 8).collect()}
    assert salted == plain
    assert len(salted) == 900 + len({i for i in range(900, 1000) if i < 50})


def test_salted_join_left_outer(spark):
    left = spark.range(10).select(F.col("id").alias("k"))
    right = spark.range(5).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    out = SC.salted_join(left, right, "k", 4, how="left")
    rows = {r.k: r.v for r in out.collect()}
    assert len(rows) == 10
    assert rows[3] == "x" and rows[9] is None


def test_salted_join_zipfian_skew_stress(spark):
    """Skew-stress (round-4 hardening): a zipfian key column (exponent
    ~1.1, 200K rows, hottest key ≈ 19% of all rows) through salted_join
    must (a) match the plain join exactly and (b) actually spread the hot
    key: after salting, the largest hash-partition holds ≤ 3x the MEAN
    partition's rows, while the UNsalted shuffle concentrates the hot key
    in one partition (≥ 5x mean) — the straggler condition that stalls a
    1000-executor stage on one task."""
    import math

    n, nkeys, parts = 200_000, 1_000, 32
    # inverse-CDF zipf: rank = floor(nkeys^(u)) with u uniform — heavy head
    zipf_key = F.floor(
        F.pow(F.lit(float(nkeys)), F.pow(F.rand(seed=7), F.lit(3.0)))
    ).cast("long").alias("k")
    left = spark.range(n).select(zipf_key, F.col("id").alias("lval")).cache()
    hot_share = left.groupBy("k").count().orderBy(F.desc("count")).first()["count"] / n
    assert hot_share > 0.1  # the distribution really is skewed
    right = spark.range(nkeys).select(F.col("id").alias("k"), (F.col("id") * 3).alias("rval"))

    out = SC.salted_join(left, right, "k", 16)
    assert out.count() == left.join(right, "k").count()

    mean = n / parts

    def max_partition(df, cols):
        return max(
            r["c"]
            for r in df.repartition(parts, *cols)
            .groupBy(F.spark_partition_id().alias("p"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )

    salted = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(16)).cast("int")
    )
    mx_s = max_partition(salted, ["k", "_salt"])
    mx_u = max_partition(left, ["k"])
    assert mx_u >= 5 * mean, (mx_u, mean)  # unsalted: one straggler partition
    assert mx_s <= 3 * mean, (mx_s, mean)  # salted: bounded imbalance
    left.unpersist()


def test_heavy_hitters_zipfian_recovers_head(spark):
    """key_histogram over the same zipfian column must surface the true
    head keys with exact counts (one-scan groupBy + top-k — the pattern's
    whole point is that a skew DIAGNOSIS must not itself be skew-prone)."""
    n, nkeys = 200_000, 1_000
    zipf_key = F.floor(
        F.pow(F.lit(float(nkeys)), F.pow(F.rand(seed=7), F.lit(3.0)))
    ).cast("long").alias("k")
    df = spark.range(n).select(zipf_key).cache()
    truth = {r.k: r["count"] for r in df.groupBy("k").count().orderBy(F.desc("count")).limit(5).collect()}
    got = {r.k: r.n for r in SC.key_histogram(df, "k", top=5).collect()}
    assert got == truth
    df.unpersist()


def test_co_partition_no_extra_exchange(spark):
    a = spark.range(100).select(F.col("id").alias("k"), F.lit(1).alias("a"))
    b = spark.range(100).select(F.col("id").alias("k"), F.lit(2).alias("b"))
    ap, bp = SC.co_partition(a, b, "k", 8)
    joined = ap.join(bp, "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the join itself must not introduce a new exchange beyond the two
    # repartitions (exchange reuse / ensure-requirements satisfied)
    assert plan.count("Exchange hashpartitioning(k#") <= 2
    assert joined.count() == 100


def test_sized_repartition(spark):
    df = spark.range(10_000)
    out = SC.sized_repartition(df, target_rows_per_partition=2_500)
    assert out.rdd.getNumPartitions() == 4


def test_key_histogram_flags_skew(spark):
    df = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit("hot")).otherwise(F.col("id").cast("string")).alias("k")
    )
    top = SC.key_histogram(df, "k", top=1).collect()[0]
    assert top.k == "hot" and abs(top.share - 0.9) < 1e-9


def test_relational3_plan_shapes(spark, sf_dir):
    """Scale regression guard for the Q8/Q9/Q11 family: dimension joins
    must broadcast, and nothing may degrade to a cartesian product or a
    row-at-a-time Python UDF."""
    from webscale_multimodal_datapipeline_spark.plans import relational3 as R3

    for name, fn in R3.QUERIES.items():
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan, name


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, tmp_path):
    """Same-key bucketed tables join without any Exchange; an unbucketed
    join of the same inputs shuffles both sides."""
    from webscale_multimodal_datapipeline_spark.catalog import load_table
    from webscale_multimodal_datapipeline_spark.operators.scale import (
        bucketed_join,
        write_bucketed,
    )

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    # spark-warehouse under tmp: keep test hermetic
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(o.withColumnRenamed("o_custkey", "custkey"), "b_orders", "custkey")
        write_bucketed(c.withColumnRenamed("c_custkey", "custkey"), "b_cust", "custkey")
        j = bucketed_join(spark, "b_orders", "b_cust", "custkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # sanity: same row count as the plain join
        plain = o.join(c, o.o_custkey == c.c_custkey)
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
        assert j.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_cust")


def test_filters_push_into_parquet_scan(spark, sf_dir):
    """Native predicates must reach the parquet reader (PushedFilters) and
    projections must prune the read schema — the two properties that decide
    whether a 100 TB scan reads terabytes or gigabytes."""
    from webscale_multimodal_datapipeline_spark.catalog import load_table

    l = load_table(spark, sf_dir, "lineitem")
    q = l.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_quantity" in plan.split("PushedFilters")[1][:200]
    rs = plan.split("ReadSchema")[1][:200]
    assert "l_orderkey" in rs and "l_extendedprice" not in rs


def test_zorder_layout_clusters_both_columns(spark, sf_dir):
    """Morton-range partitioning must give every partition a narrow extent
    in BOTH key columns (vs single-column sorting, which scatters the
    second column across the full domain) — the property min/max file
    skipping depends on."""
    from webscale_multimodal_datapipeline_spark.catalog import load_table
    from webscale_multimodal_datapipeline_spark.operators.scale import (
        zorder_key,
        zorder_layout,
        zorder_sql,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 256).alias("px"),
        (F.col("l_suppkey") % 256).alias("sy"),
    )
    laid = zorder_layout(li, ["px", "sy"], partitions=16)
    stats = (
        laid.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            F.max("px").alias("px_max"), F.min("px").alias("px_min"),
            F.max("sy").alias("sy_max"), F.min("sy").alias("sy_min"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert len(stats) > 4  # range partitioner actually spread the data
    # average per-partition extent must be far below the full 0..255 domain
    avg_px = sum(r.px_max - r.px_min for r in stats) / len(stats)
    avg_sy = sum(r.sy_max - r.sy_min for r in stats) / len(stats)
    assert avg_px < 160 and avg_sy < 160, (avg_px, avg_sy)
    # row-preserving
    assert laid.count() == li.count()
    # expression mirror: Spark and the SQL string agree on a probe value
    probe = spark.createDataFrame([(3, 5)], "px int, sy int")
    k = probe.withColumn("z", zorder_key(["px", "sy"])).first().z
    import duckdb

    kd = duckdb.sql(
        f"SELECT {zorder_sql(['px','sy'])} AS z FROM (SELECT 3 AS px, 5 AS sy)"
    ).fetchone()[0]
    assert k == kd == 0b100111  # x bits at even positions, y at odd


def test_star_join_dimensions_broadcast(spark, sf_dir):
    """q3/q5's star shape must broadcast every dimension side — a plan
    regression to sort-merge on a dimension would add full-table shuffles
    that dominate at 100x scale."""
    from webscale_multimodal_datapipeline_spark.plans.registry import QUERIES

    for name in ("q3_shipping_priority", "q5_region_revenue"):
        plan = QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, f"{name}: no broadcast join\n{plan[:800]}"
        assert "SortMergeJoin" not in plan, f"{name}: dimension fell to SMJ"


def _tree_depth(ln: str) -> int:
    j = 0
    while j < len(ln) and ln[j] in " :+-":
        j += 1
    return j


def _subtree(lines: list[str], i: int) -> str:
    d = _tree_depth(lines[i])
    out = []
    for ln in lines[i + 1:]:
        if ln.strip() and _tree_depth(ln) <= d:
            break
        out.append(ln)
    return "\n".join(out)


def test_no_broadcast_hint_on_scaling_tables(spark, sf_dir):
    """Explicit broadcast hints are reserved for FIXED-cardinality
    dimensions (nation=25, region=5) and by-contract-bounded inputs.
    customer/orders/lineitem AND part (200K x SF)/supplier (10K x SF)
    scale linearly with the corpus — billions of rows at 100 TB — so a
    forced broadcast of any of them, or of an aggregate GROUPED BY their
    keys (per-partkey averages have cardinality ~ |part|), would OOM
    executors and override AQE's size-based judgment. Delegates to the
    repo audit (tools/plan_audit.py) so the test and the tool cannot
    drift apart; every finding class is covered, per-class allowlisted."""
    import tools.plan_audit as PA

    for mod_name in ("relational", "relational2", "relational3", "misc_queries",
                     "text_queries", "dedup_queries", "vector_queries"):
        import importlib

        mod = importlib.import_module(
            f"webscale_multimodal_datapipeline_spark.plans.{mod_name}"
        )
        for name, fn in mod.QUERIES.items():
            analyzed = fn(spark, sf_dir)._jdf.queryExecution().analyzed().toString()
            for cls, f in PA.audit_hints(name, analyzed):
                assert (name, cls) in PA._ALLOW, f"{name}: {f}"


def test_no_single_partition_exchange_in_rank_queries(spark, sf_dir):
    """The two dense-rank queries built on the range-repartition +
    broadcast-offset pattern must not fall back to a single-task global
    sort: no `Exchange SinglePartition` anywhere in the physical plan
    (an unpartitioned window or global sort would introduce one)."""
    from webscale_multimodal_datapipeline_spark.plans.registry import QUERIES

    for name in ("x_acctbal_deciles", "t_tokenize_ids"):
        plan = QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        lines = plan.split("\n")
        for i, ln in enumerate(lines):
            if "Exchange SinglePartition" not in ln:
                continue
            # the only allowed single-partition stage is the FINAL step of
            # a global scalar aggregate — its input is one partial-agg row
            # per partition, bounded by parallelism, not by data size
            nxt = lines[i + 1] if i + 1 < len(lines) else ""
            assert "Aggregate(keys=[]" in nxt and "partial_" in nxt, (
                f"{name}: data-sized single-task stage\n{ln}\n{nxt}"
            )


def test_lsh_dedup_shuffles_only_small_columns(spark, sf_dir):
    """MinHash-LSH dedup must never shuffle document text with the band
    keys — the (id, band) projection is what makes the plan survive
    100 TB; text is re-joined by id only for candidate verification."""
    from webscale_multimodal_datapipeline_spark.plans.registry import QUERIES

    plan = (
        QUERIES["d_minhash_lsh_dedup"](spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # Each band-key explode must sit directly above a projection carrying
    # only (id, _sig) — neither text NOR the shingle arrays may ride the
    # band shuffle. (Since the round-6 signature-table materialization the
    # subtree bottoms out in a LogicalRDD [doc_id, _shingles, _sig], so the
    # pruning Project above it is what this test pins.)
    import re

    projs = re.findall(r"Generate explode[^\n]*\n[^\[]*Project \[([^\]]*)\]", plan)
    assert projs, plan[:500]
    for cols in projs:
        assert "text" not in cols and "_shingles" not in cols, (
            "band explode carries document content into the shuffle: " + cols
        )


def test_runtime_bloom_filter_injects_on_unbroadcastable_join(spark, sf_dir):
    """The session enables runtime bloom-filter pruning; when a selective
    build side can't broadcast (thresholds forced here to simulate the
    100-TB condition locally), the optimizer must inject a
    bloom_filter_agg on the build side and an application filter on the
    probe scan — the pruning the engine relies on INSTEAD of forced
    broadcast hints on scaling tables. (The r10 scan-spread is opt-in per
    query and NOT requested here: its round-robin exchange between the
    probe scan and the join would — correctly — block probe-side
    runtime-filter injection, which is one of the measured reasons the
    relational lanes don't opt in.)"""
    from pyspark.sql import functions as F

    from webscale_multimodal_datapipeline_spark.catalog import load_table

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, sf_dir, "lineitem")
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:1200]
        assert "might_contain" in plan, plan[:1200]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_results_invariant_under_shuffle_partition_count(spark, sf_dir):
    """Determinism under re-planning: a representative slice of the
    registry (window ranks, decimal aggregation, LM scoring, dictionary
    ranking, dedup winners) must produce IDENTICAL values when the
    shuffle parallelism changes (32 -> 7). Catches partition-order
    dependence — first()/collect_list/float-accumulation bugs that stay
    invisible until a cluster resizes."""
    from webscale_multimodal_datapipeline_spark.plans.registry import QUERIES

    names = (
        "x_acctbal_deciles",
        "t_unigram_logprob",
        "t_tokenize_ids",
        "d_exact_dedup",
        "e_markov_transitions",
        "x_argmax_agg",
    )

    def snapshot():
        out = {}
        for n in names:
            rows = QUERIES[n](spark, sf_dir).collect()
            out[n] = sorted(tuple(r) for r in rows)
        return out

    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    try:
        base = snapshot()
        spark.conf.set(key, "7")
        alt = snapshot()
    finally:
        spark.conf.set(key, old)
    for n in names:
        assert base[n] == alt[n], f"{n} changed under partitions=7"


def test_ewma_and_trigram_share_one_window_sort(spark, sf_dir):
    """K lag terms (ts_ewma) and two leads (e_trigram_paths) must all bind
    to ONE per-user WindowExec — if the per-key sort were duplicated per
    term, the dominant cost would multiply by K at scale."""
    from webscale_multimodal_datapipeline_spark.plans.registry import QUERIES

    for name in ("ts_ewma", "e_trigram_paths"):
        plan = QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        n_user_windows = sum(
            1
            for ln in plan.split("\n")
            if "Window" in ln and "user_id" in ln and "Exchange" not in ln
        )
        assert n_user_windows == 1, f"{name}: {n_user_windows} per-user WindowExec\n{plan}"


def test_column_profile_single_scan(spark, sf_dir):
    """x_column_profile computes 6x5 stats in ONE scan of orders — the
    plan must contain exactly one parquet scan (no per-column re-reads;
    DuckDB's UNION-ALL oracle scans 6 times, the Spark plan must not)."""
    from webscale_multimodal_datapipeline_spark.plans.registry import QUERIES

    plan = QUERIES["x_column_profile"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("Scan parquet")
    assert n_scans == 1, f"{n_scans} scans\n{plan}"


def test_layout_queries_plan_shapes(spark, sf_dir):
    """The registered bucketed-layout queries keep their plan contract:
    the orders-lineitem SortMergeJoin runs on the bucket distribution
    with NO join-side Exchange (the only Exchange is the bounded
    o_orderstatus re-agg), and the per-l_orderkey aggregate in
    x_bucketed_agg runs shuffle-free below the histogram re-agg."""
    from webscale_multimodal_datapipeline_spark.plans import layout_queries as LQ

    j = LQ.x_bucketed_join(spark, sf_dir)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    exchanges = [ln for ln in plan.split("\n") if "Exchange" in ln]
    assert len(exchanges) == 1, exchanges
    assert "o_orderstatus" in exchanges[0], exchanges

    a = LQ.x_bucketed_agg(spark, sf_dir)
    plan_a = a._jdf.queryExecution().executedPlan().toString()
    ex_a = [ln for ln in plan_a.split("\n") if "Exchange" in ln]
    assert len(ex_a) == 1, ex_a
    assert "items_per_order" in ex_a[0], ex_a
    # bucketed scan, not a plain file scan
    assert "SelectedBucketsCount" in plan_a or "Bucketed: true" in plan_a, plan_a


def test_minhash_ml_crosscheck_deterministic(spark, sf_dir):
    """The ml MinHashLSH arm is seeded: two runs return identical rows,
    and the invariant booleans hold."""
    from webscale_multimodal_datapipeline_spark.plans.dedup_queries import (
        d_minhash_ml_crosscheck,
    )

    r1 = d_minhash_ml_crosscheck(spark, sf_dir).collect()[0]
    r2 = d_minhash_ml_crosscheck(spark, sf_dir).collect()[0]
    assert r1 == r2
    assert r1.ml_subset_ok and r1.recall_ok


def test_calibration_curve_no_single_partition_rank(spark, sf_dir):
    """v_calibration_curve's global decile rank must use the
    range-repartition + offset pattern, never an unpartitioned window
    (review finding, round 4 session 2)."""
    from webscale_multimodal_datapipeline_spark.plans.registry import QUERIES

    plan = (
        QUERIES["v_calibration_curve"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    lines = plan.split("\n")
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        nxt = lines[i + 1] if i + 1 < len(lines) else ""
        assert "Aggregate(keys=[]" in nxt and "partial_" in nxt, (
            f"data-sized single-task stage:\n{ln}\n{nxt}"
        )


def test_binary_quantize_scan_reads_no_floats_below_candidates(spark, sf_dir):
    """v_binary_quantize_rerank contract: the corpus-wide hamming pass
    must not project the float embedding column — floats join in for
    candidate rows only (review finding, round 4 session 2). Verified on
    the optimized plan: the WindowExec computing h_rank must not have
    `embedding` among its child's output columns."""
    from webscale_multimodal_datapipeline_spark.plans.registry import QUERIES

    plan = (
        QUERIES["v_binary_quantize_rerank"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    lines = plan.split("\n")
    win_idx = [i for i, ln in enumerate(lines) if "Window" in ln and "h_rank" in ln]
    assert win_idx, "h_rank window not found in plan"
    cos_idx = [i for i, ln in enumerate(lines) if "AS cosine#" in ln]
    assert cos_idx, "cosine projection not found in plan"
    # Spark prints parents first: the exact-cosine projection must sit
    # ABOVE (smaller index than) the h_rank window — i.e. it evaluates
    # only for rows that survived the candidate filter. The pre-fix plan
    # computed it below the window (for every corpus x query pair).
    assert min(cos_idx) < min(win_idx), (
        "cosine computed below the candidate window (all-pairs float math)"
    )
    # and the window input carries only the code-tier columns: the
    # partial top-C (WindowGroupLimit) below the window mentions
    # hamming, never the float cosine
    below = "\n".join(lines[min(win_idx) : min(win_idx) + 8])
    assert "WindowGroupLimit" in below and "cosine#" not in below


def test_static_partition_pruning(spark, tmp_path, sf_dir):
    """Hive-partitioned layout + a partition-key predicate must prune at
    the DIRECTORY level: the scan's PartitionFilters carries the
    predicate and only matching partition rows are read — at 100 TB this
    is the difference between listing 3 directories and scanning the
    corpus."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "by_source")
    docs.write.partitionBy("source").parquet(out)
    back = spark.read.parquet(out)
    one = back.filter(F.col("source") == "src3")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "src3" in plan, plan[:800]
    # pruned scan reads exactly the one partition's rows
    expected = docs.filter(F.col("source") == "src3").count()
    assert one.count() == expected


def test_dynamic_partition_pruning_on_fact_join(spark, tmp_path, sf_dir):
    """Dynamic partition pruning: joining a partitioned fact to a
    FILTERED dimension must inject a runtime subquery filter on the fact
    scan (`dynamicpruning` in the plan) so only matching partitions are
    read — the mechanism that makes star-schema queries feasible when
    the fact table is 1000x the dimension."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    fact = str(tmp_path / "orders_by_pri")
    o.write.partitionBy("o_orderpriority").parquet(fact)
    f = spark.read.parquet(fact)
    dim_all = spark.createDataFrame(
        [("1-URGENT", "hot"), ("2-HIGH", "warm"), ("3-MEDIUM", "cold"),
         ("4-NOT SPECIFIED", "cold"), ("5-LOW", "cold")],
        "o_orderpriority string, tag string",
    )
    # DPP fires when the dim side carries a selective FILTER and the join
    # key is the fact's partition column
    joined = f.join(dim_all.filter(F.col("tag") == "hot"), "o_orderpriority")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:1200]
    assert joined.count() == o.filter(F.col("o_orderpriority") == "1-URGENT").count()


def test_scan_spread_is_scale_adaptive(spark, sf_dir):
    """r10 scan-spread contract (guide §2.5 input skew): an opted-in
    (``spread=True``) single-file fixture scan gains a round-robin
    repartition up to ``defaultParallelism``; the default is the raw
    scan; a source that already has >= that many partitions is returned
    UNCHANGED (the 100-TB case — no added exchange); the A/B env knob
    restores the raw scan."""
    import os

    from webscale_multimodal_datapipeline_spark.catalog import (
        _spread_scan,
        load_table,
    )

    n = spark.sparkContext.defaultParallelism
    saved = os.environ.get("SPARK_GRAFT_NO_SCAN_SPREAD")
    try:
        os.environ.pop("SPARK_GRAFT_NO_SCAN_SPREAD", None)
        # opted-in fixture scan: one split -> spread to defaultParallelism
        d = load_table(spark, sf_dir, "documents", spread=True)
        assert d.rdd.getNumPartitions() == n
        # default: raw single-split scan, no exchange
        assert load_table(spark, sf_dir, "documents").rdd.getNumPartitions() < n
        # already-parallel source: no exchange added (identity object)
        wide = spark.range(0, 1000, 1, n + 3)
        assert _spread_scan(spark, wide) is wide
        # env knob restores the raw scan even when opted in
        os.environ["SPARK_GRAFT_NO_SCAN_SPREAD"] = "1"
        raw = load_table(spark, sf_dir, "documents", spread=True)
        assert raw.rdd.getNumPartitions() < n
    finally:
        if saved is None:
            os.environ.pop("SPARK_GRAFT_NO_SCAN_SPREAD", None)
        else:
            os.environ["SPARK_GRAFT_NO_SCAN_SPREAD"] = saved
