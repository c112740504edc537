"""Deduplication queries over ``documents`` (reference D1-D3 + the near-dup
family: MinHash+LSH, SimHash, n-gram Jaccard — SURVEY §2.5 and the
training-pipeline extensions).

The DuckDB oracles reproduce the exact same md5-derived signatures and the
exact same candidate-generation topology (band join / chunk join), so the
comparison validates the *algorithm*, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from webscale_multimodal_datapipeline_spark.catalog import load_table
from webscale_multimodal_datapipeline_spark.functions import text as TX
from webscale_multimodal_datapipeline_spark.functions import vectors as VX
from webscale_multimodal_datapipeline_spark.operators import dedup as OD
from webscale_multimodal_datapipeline_spark.plans import oracle_fragments as OQ

# ---------------------------------------------------------------------------
# D1: exact dedup (composite key) + rejected side-output
# ---------------------------------------------------------------------------


def d_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup, ``source|text`` composite key (FineWeb style,
    ``text_exact_dedup.py:104-108``); winner = min(doc_id)."""
    d = load_table(spark, sf_dir, "documents")
    op = OD.text_exact_dedup(composite_col="source")
    return op.apply(d).select("doc_id", "source")


D_EXACT_SQL = f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY concat_ws('|', source, {OQ.sql_norm('text')})
           ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1
"""

def _coarse_key():
    # built lazily — Column construction needs an active SparkContext.
    return F.concat_ws("|", F.col("lang"), F.substring(TX.normalize_text("text"), 1, 16))


_COARSE_KEY_SQL = f"concat_ws('|', lang, substr({OQ.sql_norm('text')}, 1, 16))"


def d_coarse_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a coarse derived key (lang + 16-char prefix) — same
    machinery, but actually produces duplicates on the synthetic corpus so
    the winner-selection path is exercised."""
    d = load_table(spark, sf_dir, "documents")
    op = OD.DedupOperator("coarse_dedup", _coarse_key(), order_col="doc_id")
    return op.apply(d).select("doc_id", "lang")


D_COARSE_SQL = f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY {_COARSE_KEY_SQL} ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1
"""


def d_coarse_dedup_rejected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rejected side-output of the coarse dedup, with the
    ``_rejection_details`` annotation flattened (reference
    ``framework/operator.py:345-352``: reason/operator/dedup_key/
    representative_id)."""
    d = load_table(spark, sf_dir, "documents")
    op = OD.DedupOperator("coarse_dedup", _coarse_key(), order_col="doc_id")
    rej = op.split(d).rejected
    return rej.select(
        "doc_id",
        F.col("_rejection_details.reason").alias("reason"),
        F.col("_rejection_details.operator").alias("operator"),
        F.col("_rejection_details.dedup_key").alias("dedup_key"),
        F.col("_rejection_details.representative_id").alias("representative_id"),
    )


D_COARSE_REJ_SQL = f"""
SELECT doc_id,
       'duplicate' AS reason,
       'coarse_dedup' AS operator,
       dedup_key,
       CAST(rep AS VARCHAR) AS representative_id
FROM (
  SELECT doc_id,
         {_COARSE_KEY_SQL} AS dedup_key,
         ROW_NUMBER() OVER (PARTITION BY {_COARSE_KEY_SQL} ORDER BY doc_id) AS rn,
         MIN(doc_id) OVER (PARTITION BY {_COARSE_KEY_SQL}) AS rep
  FROM documents
) WHERE rn > 1
"""


# ---------------------------------------------------------------------------
# MinHash signatures + LSH dedup + Jaccard pairs
# ---------------------------------------------------------------------------


def d_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three sampled elements of the 12-element MinHash signature."""
    d = (
        load_table(spark, sf_dir, "documents")
        .withColumn("_toks", TX.norm_tokens("text"))
        .withColumn("_sh", TX.word_shingles("text", k=3, toks=F.col("_toks")))
        .withColumn("_h", OD.shingle_hashes(F.col("_sh")))
    )

    # Compute only the three sampled permutations — element_at over the full
    # signature array gets re-inlined by CollapseProject into 3 copies of a
    # 12-permutation expression, and the codegen COMPILE dominates runtime.
    def mh(i: int):
        a, b = OD.MINHASH_A[i], OD.MINHASH_B[i]
        return F.array_min(
            F.transform(F.col("_h"), lambda h: (h * a + b) % OD.MINHASH_P)
        )

    return d.select(
        "doc_id", mh(0).alias("mh0"), mh(6).alias("mh6"), mh(11).alias("mh11")
    )


_SH_CTE = f"""
WITH toks AS (
  SELECT doc_id, source, {OQ.sql_tokens(OQ.sql_norm('text'))} AS t FROM documents
), sh AS (
  SELECT doc_id, source, {OQ.sql_shingles_from_tokens('t')} AS sh FROM toks
), hs AS (
  SELECT doc_id, source, sh, {OQ.sql_shingle_hashes('sh')} AS h FROM sh
)
"""

_SIG_ELEMS = OQ.sql_minhash_sig_elements("h")

D_MINHASH_SIG_SQL = (
    _SH_CTE
    + f"""
SELECT doc_id, {_SIG_ELEMS[0]} AS mh0, {_SIG_ELEMS[6]} AS mh6, {_SIG_ELEMS[11]} AS mh11
FROM hs
"""
)


def d_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash→band→bucket-join→Jaccard-verify dedup; survivors."""
    d = load_table(spark, sf_dir, "documents", spread=True)
    return OD.minhash_lsh_dedup(d, jaccard_threshold=0.7).select("doc_id", "source")


def _minhash_pipeline_sql(threshold: float) -> str:
    sig_list = "[" + ", ".join(_SIG_ELEMS) + "]"
    bands_list = "[" + ", ".join(OQ.sql_lsh_bands("sig")) + "]"
    return (
        _SH_CTE
        + f""", sig AS (
  SELECT doc_id, sh, {sig_list} AS sig FROM hs
), bands AS (
  SELECT doc_id, unnest({bands_list}) AS band FROM sig
), cand AS (
  SELECT DISTINCT l.doc_id AS lid, r.doc_id AS rid
  FROM bands l JOIN bands r ON l.band = r.band AND l.doc_id > r.doc_id
), ver AS (
  SELECT c.lid, c.rid,
         len(list_intersect(a.sh, b.sh)) / len(list_distinct(a.sh || b.sh)) AS jaccard
  FROM cand c JOIN sh a ON a.doc_id = c.lid JOIN sh b ON b.doc_id = c.rid
)
"""
    )


D_MINHASH_DEDUP_SQL = (
    _minhash_pipeline_sql(0.7)
    + """
SELECT doc_id, source FROM documents
WHERE doc_id NOT IN (SELECT DISTINCT lid FROM ver WHERE jaccard >= 0.7)
"""
)


def d_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup pairs (LSH candidates, exact verify ≥ 0.2):
    (id_l, id_r, jaccard)."""
    d = load_table(spark, sf_dir, "documents")
    base = (
        d.withColumn("_toks", TX.norm_tokens("text"))
        .withColumn("_shingles", TX.word_shingles("text", k=3, toks=F.col("_toks")))
        .withColumn("_hashes", OD.shingle_hashes(F.col("_shingles")))
        .withColumn("_sig", OD.minhash_signature("text", k=3, hashes=F.col("_hashes")))
    )
    sh = base.select("doc_id", "_shingles")
    banded = base.select("doc_id", F.explode(OD.lsh_bands(F.col("_sig"))).alias("_band"))
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(r, (F.col("l._band") == F.col("r._band")) & (F.col("l.doc_id") > F.col("r.doc_id")))
        .select(F.col("l.doc_id").alias("id_l"), F.col("r.doc_id").alias("id_r"))
        .dropDuplicates(["id_l", "id_r"])
    )
    jac = F.size(F.array_intersect("_ls", "_rs")) / F.size(F.array_union("_ls", "_rs"))
    return (
        cand.join(sh.select(F.col("doc_id").alias("id_l"), F.col("_shingles").alias("_ls")), "id_l")
        .join(sh.select(F.col("doc_id").alias("id_r"), F.col("_shingles").alias("_rs")), "id_r")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.2)
        .select("id_l", "id_r", "jaccard")
    )


D_JACCARD_PAIRS_SQL = (
    _minhash_pipeline_sql(0.2)
    + """
SELECT lid AS id_l, rid AS id_r, CAST(jaccard AS DOUBLE) AS jaccard
FROM ver WHERE jaccard >= 0.2
"""
)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def d_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per document — Arrow-kernel hot path
    (``simhash_fast_udf``; the SQL-HOF ``simhash()`` is the parity-tested
    spec mirrored by this oracle)."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "_th", OD.token_hashes("text")
    )
    return d.select("doc_id", OD.simhash_fast_udf("_th").alias("simhash"))


D_SIMHASH_SQL = f"""
WITH h AS (SELECT doc_id, {OQ.sql_token_hashes('text')} AS h FROM documents)
SELECT doc_id, {OQ.sql_simhash_from_hashes('h')} AS simhash FROM h
"""


def d_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-near pairs via chunk-LSH (share >= 1 of 4 15-bit chunks) with
    bit_count(xor) <= 12 verify: (id_l, id_r, hamming)."""
    d = load_table(spark, sf_dir, "documents")
    return OD.simhash_near_pairs(d, max_hamming=12)


_CHUNK_W = OD.SIMHASH_BITS // 4
_CHUNK_MASK = (1 << _CHUNK_W) - 1


def _chunks_for(col: str) -> list[str]:
    """Chunk-LSH key expressions over a simhash column — parameterized so
    every consumer names its own column (a string-replace on a sibling's
    literal broke silently on reformat; review finding)."""
    return [
        f"concat_ws('|', '{c}', CAST((({col} >> {c * _CHUNK_W}) & {_CHUNK_MASK}) AS VARCHAR))"
        for c in range(4)
    ]


_CHUNKS = _chunks_for("sh")

D_SIMHASH_PAIRS_SQL = f"""
WITH h AS (SELECT doc_id, {OQ.sql_token_hashes('text')} AS h FROM documents),
s AS (SELECT doc_id, {OQ.sql_simhash_from_hashes('h')} AS sh FROM h),
chunked AS (SELECT doc_id, sh, unnest([{', '.join(_CHUNKS)}]) AS chunk FROM s),
pairs AS (
  SELECT DISTINCT l.doc_id AS id_l, r.doc_id AS id_r,
         bit_count(xor(l.sh, r.sh)) AS hamming
  FROM chunked l JOIN chunked r ON l.chunk = r.chunk AND l.doc_id < r.doc_id
)
SELECT id_l, id_r, CAST(hamming AS INTEGER) AS hamming FROM pairs WHERE hamming <= 12
"""


QUERIES = {
    "d_exact_dedup": d_exact_dedup,
    "d_coarse_dedup": d_coarse_dedup,
    "d_coarse_dedup_rejected": d_coarse_dedup_rejected,
    "d_minhash_signature": d_minhash_signature,
    "d_minhash_lsh_dedup": d_minhash_lsh_dedup,
    "d_jaccard_pairs": d_jaccard_pairs,
    "d_simhash": d_simhash,
    "d_simhash_near_pairs": d_simhash_near_pairs,
}

ORACLE = {
    "d_exact_dedup": D_EXACT_SQL,
    "d_coarse_dedup": D_COARSE_SQL,
    "d_coarse_dedup_rejected": D_COARSE_REJ_SQL,
    "d_minhash_signature": D_MINHASH_SIG_SQL,
    "d_minhash_lsh_dedup": D_MINHASH_DEDUP_SQL,
    "d_jaccard_pairs": D_JACCARD_PAIRS_SQL,
    "d_simhash": D_SIMHASH_SQL,
    "d_simhash_near_pairs": D_SIMHASH_PAIRS_SQL,
}


def d_shared_shingle_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-span dedup (Lee et al. 2021 simplified): drop docs
    sharing any k-word shingle with an earlier doc; survivors. k=3 here so
    the synthetic corpus actually produces shared spans."""
    d = load_table(spark, sf_dir, "documents", spread=True)
    return OD.shared_shingle_dedup(d, k=3).select("doc_id", "source")


D_SHARED_SHINGLE_SQL = f"""
WITH toks AS (
  SELECT doc_id, {OQ.sql_tokens(OQ.sql_norm('text'))} AS t FROM documents
), sh AS (
  SELECT doc_id, {OQ.sql_shingles_from_tokens('t')} AS sh FROM toks
), pairs AS (
  SELECT DISTINCT doc_id, h
  FROM (SELECT doc_id, unnest({OQ.sql_shingle_hashes('sh')}) AS h FROM sh)
), owners AS (
  SELECT h, MIN(doc_id) AS owner FROM pairs GROUP BY h
), first_owner AS (
  SELECT p.doc_id, MIN(o.owner) AS fo
  FROM pairs p JOIN owners o ON p.h = o.h
  GROUP BY p.doc_id
)
SELECT d.doc_id, d.source
FROM documents d JOIN first_owner f ON d.doc_id = f.doc_id AND f.fo = d.doc_id
"""

QUERIES["d_shared_shingle_dedup"] = d_shared_shingle_dedup
ORACLE["d_shared_shingle_dedup"] = D_SHARED_SHINGLE_SQL


def d_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (public FineWeb / GPT-3-appendix practice;
    no reference analog — training-pipeline extension): flag training docs
    that share any k-word shingle with a held-out eval split, so benchmark
    text can be removed before training.

    The "benchmark" is a deterministic slice (``doc_id % 41 == 0``); the
    rest is the corpus. Scale shape: the benchmark shingle-hash set is tiny
    relative to the corpus (eval suites are thousands of docs vs billions),
    so it is collected into a broadcast hash join applied BEFORE any
    corpus-side shuffle — the join prunes the exploded corpus down to
    contaminated (doc_id, h) pairs map-side, and the only shuffle is the
    final per-doc countDistinct over that pruned set (per-doc h dupes are
    rare mod-P collisions; countDistinct absorbs them without a corpus-wide
    pre-distinct).
    """
    d = load_table(spark, sf_dir, "documents")
    base = (
        d.withColumn("_toks", TX.norm_tokens("text"))
        .withColumn("_sh", TX.word_shingles("text", k=3, toks=F.col("_toks")))
        .select("doc_id", OD.shingle_hashes(F.col("_sh")).alias("_h"))
    )
    pairs = base.select("doc_id", F.explode("_h").alias("h"))
    bench = pairs.filter(F.col("doc_id") % 41 == 0).select("h").distinct()
    corpus = pairs.filter(F.col("doc_id") % 41 != 0)
    return (
        corpus.join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(F.countDistinct("h").alias("n_shared"))
    )


D_DECONTAMINATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, {OQ.sql_tokens(OQ.sql_norm('text'))} AS t FROM documents
), sh AS (
  SELECT doc_id, {OQ.sql_shingles_from_tokens('t')} AS sh FROM toks
), pairs AS (
  SELECT DISTINCT doc_id, h
  FROM (SELECT doc_id, unnest({OQ.sql_shingle_hashes('sh')}) AS h FROM sh)
), bench AS (
  SELECT DISTINCT h FROM pairs WHERE doc_id % 41 = 0
)
SELECT p.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM pairs p JOIN bench b ON p.h = b.h
WHERE p.doc_id % 41 <> 0
GROUP BY p.doc_id
"""

QUERIES["d_decontaminate"] = d_decontaminate
ORACLE["d_decontaminate"] = D_DECONTAMINATE_SQL


def d_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster resolution: SimHash hamming pairs → connected
    components → every doc labeled with its cluster representative
    (min reachable doc_id; singletons label themselves). The step between
    pair generation and row dropping in every real near-dup pipeline.

    Iterative (min-label propagation, `operators/dedup.py::
    connected_components`); the DuckDB oracle computes the same closure
    with a recursive CTE, so even this non-single-query op is value-checked
    exactly.

    Scan-spread examined and REJECTED for this lane (r11, VERDICT r10 #4):
    the simhash pair kernel looks like the §2.5 spread-winning shape, but
    the steal-clean A/B reads spread 3.28 s vs raw 2.70 s on the star
    variant — the components lanes are dominated by the iterative phase,
    and round-robin spreading both adds an exchange of raw text AND
    scatters the fixture's naturally co-located near-dups across
    partitions, so the partition-local union-find contracts less per
    batch and hands the loop a bigger residual graph. Numbers in
    OPTIMIZATION_r11.md.
    """
    d = load_table(spark, sf_dir, "documents")
    pairs = OD.simhash_near_pairs(d, max_hamming=12)
    comp = OD.connected_components(pairs, "id_l", "id_r")
    return d.select("doc_id").join(
        comp, d["doc_id"] == comp["id"], "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("comp"), F.col("doc_id")).alias("comp"),
        (F.coalesce(F.col("comp"), F.col("doc_id")) == F.col("doc_id")).alias(
            "is_representative"
        ),
    )


D_COMPONENTS_SQL = f"""
WITH RECURSIVE npairs AS (
  {D_SIMHASH_PAIRS_SQL}
), edges AS (
  SELECT id_l AS src, id_r AS dst FROM npairs
  UNION ALL
  SELECT id_r AS src, id_l AS dst FROM npairs
), nodes AS (
  SELECT DISTINCT src AS id FROM edges
), reach AS (
  SELECT id, id AS r FROM nodes
  UNION
  SELECT e.src AS id, reach.r FROM edges e JOIN reach ON e.dst = reach.id
), comp AS (
  SELECT id, MIN(r) AS comp FROM reach GROUP BY id
)
SELECT d.doc_id,
       COALESCE(c.comp, d.doc_id) AS comp,
       COALESCE(c.comp, d.doc_id) = d.doc_id AS is_representative
FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
"""

QUERIES["d_dedup_components"] = d_dedup_components
ORACLE["d_dedup_components"] = D_COMPONENTS_SQL


def d_dedup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same cluster resolution as ``d_dedup_components`` but via the
    large-star/small-star algorithm (Kiveris et al. 2014) — O(log n)
    rounds on ANY pair-graph shape, including adversarial long chains
    where min-label propagation needs diameter-many rounds
    (`operators/dedup.py::connected_components_star`). Identical output
    contract, so it shares the recursive-CTE oracle: the two algorithms
    are value-checked against each other through DuckDB.

    Scan-spread examined and REJECTED — same A/B as ``d_dedup_components``
    above (spread 3.28 s vs raw 2.70 s, steal-clean passes): the iterative
    phase dominates and spreading hurts the union-find's batch locality.
    """
    d = load_table(spark, sf_dir, "documents")
    pairs = OD.simhash_near_pairs(d, max_hamming=12)
    comp = OD.connected_components_star(pairs, "id_l", "id_r", edges_distinct=True)
    return d.select("doc_id").join(
        comp, d["doc_id"] == comp["id"], "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("comp"), F.col("doc_id")).alias("comp"),
        (F.coalesce(F.col("comp"), F.col("doc_id")) == F.col("doc_id")).alias(
            "is_representative"
        ),
    )


QUERIES["d_dedup_components_star"] = d_dedup_components_star
ORACLE["d_dedup_components_star"] = D_COMPONENTS_SQL


# ---------------------------------------------------------------------------
# Continuous contamination scoring (graded decontamination signal)
# ---------------------------------------------------------------------------


def d_contamination_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded benchmark-contamination score: for every corpus document,
    the fraction of its DISTINCT 3-word shingles that also occur in the
    held-out eval split (``doc_id % 41 == 0`` — same split as
    ``d_decontaminate``). Extends the boolean flag to the continuous
    signal real curation uses for thresholding (drop > 0.8, review
    0.2-0.8, keep < 0.2 — the GPT-3-appendix / FineWeb practice).

    Scale shape: one corpus explode; the benchmark shingle-hash set stays
    a broadcast hash build (eval suites are thousands of docs vs
    billions), joined LEFT so uncontaminated docs keep a 0 score; the
    only shuffle is the per-doc aggregate, with BOTH distinct counts
    (total + matched) computed in that single pass. Ratio emitted at
    1e-4 integer resolution (exact-integer operands, so the quotient is
    the identical IEEE double in both engines).
    """
    d = load_table(spark, sf_dir, "documents")
    pairs = (
        d.withColumn("_toks", TX.norm_tokens("text"))
        .withColumn("_sh", TX.word_shingles("text", k=3, toks=F.col("_toks")))
        .select("doc_id", F.explode(OD.shingle_hashes(F.col("_sh"))).alias("h"))
    )
    bench = (
        pairs.filter(F.col("doc_id") % 41 == 0)
        .select("h")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    corpus = pairs.filter(F.col("doc_id") % 41 != 0)
    return (
        corpus.join(F.broadcast(bench), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("h").alias("n_shingles"),
            F.countDistinct(F.when(F.col("_hit") == 1, F.col("h"))).alias("n_shared"),
        )
        .select(
            "doc_id",
            F.col("n_shingles").cast("bigint").alias("n_shingles"),
            F.col("n_shared").cast("bigint").alias("n_shared"),
            (
                F.round(
                    (F.col("n_shared") * 10000).cast("double") / F.col("n_shingles"),
                    0,
                )
                / F.lit(10000.0)
            ).alias("contamination"),
        )
    )


D_CONTAMINATION_SQL = f"""
WITH toks AS (
  SELECT doc_id, {OQ.sql_tokens(OQ.sql_norm('text'))} AS t FROM documents
), sh AS (
  SELECT doc_id, {OQ.sql_shingles_from_tokens('t')} AS sh FROM toks
), pairs AS (
  SELECT DISTINCT doc_id, h
  FROM (SELECT doc_id, unnest({OQ.sql_shingle_hashes('sh')}) AS h FROM sh)
), bench AS (
  SELECT DISTINCT h FROM pairs WHERE doc_id % 41 = 0
)
SELECT p.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(COUNT(b.h) AS BIGINT) AS n_shared,
       ROUND(CAST(COUNT(b.h) * 10000 AS DOUBLE) / COUNT(*)) / 10000.0
         AS contamination
FROM pairs p LEFT JOIN bench b ON p.h = b.h
WHERE p.doc_id % 41 <> 0
GROUP BY p.doc_id
"""

QUERIES["d_contamination_score"] = d_contamination_score
ORACLE["d_contamination_score"] = D_CONTAMINATION_SQL


# ---------------------------------------------------------------------------
# Incremental dedup (continuous-crawl shape: new batch vs snapshot index)
# ---------------------------------------------------------------------------


def d_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup — the continuous-crawl shape: a NEW batch
    (``doc_id % 5 == 0`` stands in for today's crawl) is deduplicated
    against the accumulated snapshot (everything else) by normalized-
    content hash, keeping only genuinely new content. The reference's
    backend seen-set persists across runs for exactly this purpose
    (``framework/backend.py:13-74``); Spark-first it is a keys-only
    anti-join.

    Scale shape: the snapshot side is reduced to its DISTINCT 64-bit
    key column before the join — at 100 TB the historical index is a
    compact key table (bucketed on disk in production), the new batch
    is small relative to it, and AQE/bloom pruning pick the physical
    strategy; no hint, no full-snapshot column traffic."""
    d = load_table(spark, sf_dir, "documents")
    key = TX.md5_long(TX.normalize_text("text"))
    snapshot_keys = (
        d.filter(F.col("doc_id") % 5 != 0).select(key.alias("_k")).distinct()
    )
    batch = d.filter(F.col("doc_id") % 5 == 0).withColumn("_k", key)
    survivors = batch.join(snapshot_keys, "_k", "left_anti")
    return survivors.select("doc_id", "source")


D_INCREMENTAL_SQL = f"""
WITH keyed AS (
  SELECT doc_id, source, {OQ.sql_md5_long(OQ.sql_norm('text'))} AS k
  FROM documents
), snapshot AS (
  SELECT DISTINCT k FROM keyed WHERE doc_id % 5 <> 0
)
SELECT b.doc_id, b.source
FROM keyed b LEFT JOIN snapshot s ON b.k = s.k
WHERE b.doc_id % 5 = 0 AND s.k IS NULL
"""

QUERIES["d_incremental_dedup"] = d_incremental_dedup
ORACLE["d_incremental_dedup"] = D_INCREMENTAL_SQL


# ---------------------------------------------------------------------------
# Bloom-style bounded-index membership prefilter
# ---------------------------------------------------------------------------

_BLOOM_BITS = 4096  # m: index cardinality bound (buckets), NOT corpus-sized
_BLOOM_K = 3  # hash functions


def d_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter-shaped membership prefilter: the member set (docs
    from ``src1``) is indexed as the DISTINCT set of k hash buckets per
    member (k=3 seeded hashes mod m=4096) — an index whose size is
    bounded by m regardless of corpus scale, the property that lets a
    100-TB probe side check membership against a broadcastable
    structure. A doc is a CANDIDATE iff all k of its buckets are
    present (Bloom semantics: no false negatives, bounded false
    positives). Output per source: docs, candidates, true members —
    plus the no-false-negative invariant as an oracle-pinned boolean.

    Scale shape: probe side explodes to k rows/doc, ONE join against
    the bounded index, count-hits==k per doc; the index aggregate is
    map-side combinable. (Spark's native runtime bloom pruning is the
    same idea applied physically — session-enabled; this operator is
    the LOGICAL form with exact cross-engine bucket math.)"""
    d = load_table(spark, sf_dir, "documents")
    nt = TX.normalize_text("text")
    buckets = F.array(
        *[
            F.pmod(TX.md5_long(F.concat(nt, F.lit(f"#s{i}"))), F.lit(_BLOOM_BITS))
            for i in range(_BLOOM_K)
        ]
    )
    keyed = d.select(
        "doc_id",
        "source",
        # null-safe: a NULL source is NOT a member (plain == yields NULL,
        # which poisons the n_members SUM where the oracle's CASE counts 0)
        F.col("source").eqNullSafe(F.lit("src1")).alias("_member"),
        buckets.alias("_bk"),
    )
    index = (
        keyed.filter("_member")
        .select(F.explode("_bk").alias("_b"))
        .distinct()
    )
    probe = keyed.select("doc_id", "source", "_member", F.explode("_bk").alias("_b"))
    hits = (
        probe.join(index, "_b", "left_semi")
        .groupBy("doc_id", "source", "_member")
        .agg(F.count(F.lit(1)).alias("_nhit"))
        .withColumn("_cand", F.col("_nhit") == _BLOOM_K)
    )
    per_doc = keyed.select("doc_id", "source", "_member").join(
        hits.select("doc_id", "_cand"), "doc_id", "left"
    ).withColumn("_cand", F.coalesce(F.col("_cand"), F.lit(False)))
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("_cand").cast("bigint")).alias("n_candidates"),
            F.sum(F.col("_member").cast("bigint")).alias("n_members"),
            F.min(F.when(F.col("_member"), F.col("_cand")).otherwise(F.lit(True))).alias(
                "no_false_negatives"
            ),
        )
    )


_BLOOM_BUCKET_SQL = ", ".join(
    OQ.sql_md5_long("concat(" + OQ.sql_norm("text") + f", '#s{i}')")
    + f" % {_BLOOM_BITS}"
    for i in range(_BLOOM_K)
)

D_BLOOM_SQL = f"""
WITH keyed AS (
  SELECT doc_id, source, source = 'src1' AS member,
         [{_BLOOM_BUCKET_SQL}] AS bk
  FROM documents
), idx AS (
  SELECT DISTINCT b FROM (SELECT unnest(bk) AS b FROM keyed WHERE member)
), probe AS (
  SELECT doc_id, unnest(bk) AS b FROM keyed
), hits AS (
  SELECT p.doc_id, COUNT(*) AS nhit
  FROM probe p JOIN idx i ON p.b = i.b
  GROUP BY p.doc_id
), per_doc AS (
  SELECT k.doc_id, k.source, k.member,
         COALESCE(h.nhit = {_BLOOM_K}, FALSE) AS cand
  FROM keyed k LEFT JOIN hits h ON k.doc_id = h.doc_id
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN cand THEN 1 ELSE 0 END) AS BIGINT) AS n_candidates,
       CAST(SUM(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
       MIN(CASE WHEN member THEN cand ELSE TRUE END) AS no_false_negatives
FROM per_doc
GROUP BY source
"""

QUERIES["d_bloom_prefilter"] = d_bloom_prefilter
ORACLE["d_bloom_prefilter"] = D_BLOOM_SQL


# ---------------------------------------------------------------------------
# Train/test leakage audit (split hygiene)
# ---------------------------------------------------------------------------


def d_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-hygiene audit: after the same deterministic 80/10/10
    id-hash split as ``t_dataset_split``, count normalized-content keys
    that LEAK across split boundaries (identical content in train AND
    val/test — the eval-contamination failure mode dedup-by-id misses,
    Lee et al. 2022 §5). Output: one row per (split pair) with the
    leaked-key count, plus per-split totals.

    Scale shape: one scan → (key, split) pairs → per-key bitmask of
    splits via bit_or (map-side combinable) → bounded 3-row rollup;
    no self-join of the corpus."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(TX.md5_long(F.col("doc_id").cast("string")), F.lit(100))
    split_bit = (
        F.when(bucket < 80, F.lit(1)).when(bucket < 90, F.lit(2)).otherwise(F.lit(4))
    )
    key = TX.md5_long(TX.normalize_text("text"))
    per_key = (
        d.select(key.alias("_k"), split_bit.alias("_b"))
        .groupBy("_k")
        .agg(F.expr("bit_or(_b)").alias("_mask"), F.count(F.lit(1)).alias("_n"))
    )
    return per_key.agg(
        F.sum(F.when((F.col("_mask").bitwiseAND(1) > 0) & (F.col("_mask").bitwiseAND(2) > 0), 1).otherwise(0)).cast("bigint").alias("train_val_leaks"),
        F.sum(F.when((F.col("_mask").bitwiseAND(1) > 0) & (F.col("_mask").bitwiseAND(4) > 0), 1).otherwise(0)).cast("bigint").alias("train_test_leaks"),
        F.sum(F.when((F.col("_mask").bitwiseAND(2) > 0) & (F.col("_mask").bitwiseAND(4) > 0), 1).otherwise(0)).cast("bigint").alias("val_test_leaks"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_keys"),
        F.sum(F.when(F.col("_n") > 1, 1).otherwise(0)).cast("bigint").alias("n_duplicated_keys"),
    )


D_LEAKAGE_SQL = f"""
WITH per_key AS (
  SELECT {OQ.sql_md5_long(OQ.sql_norm('text'))} AS k,
         BIT_OR(CASE WHEN b < 80 THEN 1 WHEN b < 90 THEN 2 ELSE 4 END) AS mask,
         COUNT(*) AS n
  FROM (SELECT text, {OQ.sql_md5_long("CAST(doc_id AS VARCHAR)")} % 100 AS b
        FROM documents)
  GROUP BY 1
)
SELECT CAST(SUM(CASE WHEN (mask & 1) > 0 AND (mask & 2) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS train_val_leaks,
       CAST(SUM(CASE WHEN (mask & 1) > 0 AND (mask & 4) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS train_test_leaks,
       CAST(SUM(CASE WHEN (mask & 2) > 0 AND (mask & 4) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS val_test_leaks,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_keys,
       CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_duplicated_keys
FROM per_key
"""

QUERIES["d_split_leakage_audit"] = d_split_leakage_audit
ORACLE["d_split_leakage_audit"] = D_LEAKAGE_SQL


# ---------------------------------------------------------------------------
# Duplicate-mass profile (the dedup AUDIT: where does the corpus mass sit?)
# ---------------------------------------------------------------------------


def d_cluster_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dup cluster-size histogram: for each cluster size s, how many
    clusters and how many documents — the first number a curation run
    reports after dedup ("X% of the corpus is in clusters of ≥ 2"), and
    the skew diagnostic for the dedup shuffle itself (a heavy head here
    is the reference's bucket-hot-spot case, ``backend.py:134-138``).

    Scale shape: two map-side-combinable aggregates (corpus → cluster
    sizes → size histogram); output bounded by |distinct sizes| — never
    corpus-sized. Uses the same coarse key as ``d_coarse_dedup`` (the
    synthetic corpus has no byte-exact dups, so the exact-key profile is
    the degenerate all-ones row; the coarse key exercises the histogram)."""
    d = load_table(spark, sf_dir, "documents")
    sizes = d.groupBy(_coarse_key().alias("_k")).agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("cluster_size").alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


D_CLUSTER_SIZE_SQL = f"""
WITH sizes AS (
  SELECT {_COARSE_KEY_SQL} AS k, COUNT(*) AS cluster_size
  FROM documents GROUP BY 1
)
SELECT cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(cluster_size) AS BIGINT) AS n_docs
FROM sizes GROUP BY cluster_size ORDER BY cluster_size
"""

QUERIES["d_cluster_size_profile"] = d_cluster_size_profile
ORACLE["d_cluster_size_profile"] = D_CLUSTER_SIZE_SQL


# ---------------------------------------------------------------------------
# pyspark.ml MinHashLSH cross-check — two independent implementations of
# the same near-dup contract must agree
# ---------------------------------------------------------------------------


def d_minhash_ml_crosscheck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-validate the hand-rolled banded MinHash-LSH
    (``operators/dedup.py``) against Spark ML's own ``MinHashLSH`` —
    binarized shingle vectors via ``HashingTF``, 8 seeded hash tables,
    ``approxSimilarityJoin`` at Jaccard distance < 0.5. Two fully
    independent codepaths (md5-banded vs ml murmur-perm) over the same
    shingle sets, judged against the EXACT shared-shingle pair set:

    - ``n_exact``: |pairs with true shingle-Jaccard >= 0.5| — exact,
      value-matched against the DuckDB oracle;
    - ``ml_subset_ok``: every ML-returned pair is a true pair at >= 0.45
      (hashing-trick collisions can only inflate the vector Jaccard, so a
      small tolerance band below the query threshold is the correct
      acceptance region);
    - ``recall_ok``: ML recall over the exact pair set >= 0.9 (with 8
      single-hash tables, per-pair candidate probability at s >= 0.5 is
      1-(1-s)^8 >= 0.996; vacuously true when n_exact = 0).

    Scale shape: the exact arm is the shared-shingle explode->join (never
    all-pairs); the ML arm is Spark ML's own explode-on-hash-tables join —
    both bucketed, both shuffle-on-key only.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    d = load_table(spark, sf_dir, "documents")
    sh = (
        d.withColumn("_toks", TX.norm_tokens("text"))
        .withColumn("_sh", TX.word_shingles("text", k=3, toks=F.col("_toks")))
        .select("doc_id", "_sh")
    )

    # exact arm: shared-shingle candidates (J >= t > 0 => intersection
    # nonempty), verified with exact set Jaccard
    ex = sh.select("doc_id", F.explode("_sh").alias("_s"))
    l, r = ex.alias("l"), ex.alias("r")
    cand = (
        l.join(r, (F.col("l._s") == F.col("r._s")) & (F.col("l.doc_id") > F.col("r.doc_id")))
        .select(F.col("l.doc_id").alias("id_l"), F.col("r.doc_id").alias("id_r"))
        .dropDuplicates(["id_l", "id_r"])
    )
    jac = F.size(F.array_intersect("_ls", "_rs")) / F.size(F.array_union("_ls", "_rs"))
    exact = (
        cand.join(sh.select(F.col("doc_id").alias("id_l"), F.col("_sh").alias("_ls")), "id_l")
        .join(sh.select(F.col("doc_id").alias("id_r"), F.col("_sh").alias("_rs")), "id_r")
        .withColumn("_j", jac)
        .select("id_l", "id_r", "_j")
    )
    exact_pairs = exact.filter(F.col("_j") >= 0.5).select("id_l", "id_r")

    # ML arm: binarized shingle vectors -> seeded MinHashLSH
    tf = HashingTF(inputCol="_sh", outputCol="_v", numFeatures=1 << 20, binary=True)
    feat = tf.transform(sh)
    lsh = MinHashLSH(inputCol="_v", outputCol="_hashes", numHashTables=8, seed=42)
    model = lsh.fit(feat)
    ml_pairs = (
        model.approxSimilarityJoin(feat, feat, 0.5, distCol="_dist")
        .filter(F.col("datasetA.doc_id") > F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("id_l"),
            F.col("datasetB.doc_id").alias("id_r"),
        )
        .dropDuplicates(["id_l", "id_r"])
    )

    judged = ml_pairs.join(
        exact.withColumnRenamed("_j", "_true_j"), ["id_l", "id_r"], "left"
    )
    hits = ml_pairs.join(exact_pairs, ["id_l", "id_r"], "left_semi")
    n_exact = exact_pairs.agg(F.count(F.lit(1)).alias("n_exact"))
    stats = judged.agg(
        F.min(F.coalesce(F.col("_true_j"), F.lit(0.0))).alias("_min_j"),
        F.count(F.lit(1)).alias("_n_ml"),
    )
    n_hits = hits.agg(F.count(F.lit(1)).alias("_n_hits"))
    return (
        n_exact.crossJoin(stats)
        .crossJoin(n_hits)
        .select(
            F.col("n_exact").cast("long").alias("n_exact"),
            (F.col("_n_ml") == 0) | (F.col("_min_j") >= 0.45),
            (F.col("n_exact") == 0)
            | (F.col("_n_hits") >= F.lit(0.9) * F.col("n_exact")),
        )
        .toDF("n_exact", "ml_subset_ok", "recall_ok")
    )


D_MINHASH_ML_SQL = f"""
WITH toks AS (
  SELECT doc_id, {OQ.sql_tokens(OQ.sql_norm('text'))} AS t FROM documents
), shl AS (
  SELECT doc_id, {OQ.sql_shingles_from_tokens('t')} AS sh FROM toks
), ex AS (
  SELECT doc_id, unnest(sh) AS s FROM shl
), cand AS (
  SELECT DISTINCT l.doc_id AS lid, r.doc_id AS rid
  FROM ex l JOIN ex r ON l.s = r.s AND l.doc_id > r.doc_id
), ver AS (
  SELECT c.lid, c.rid,
         len(list_intersect(a.sh, b.sh)) * 1.0 / len(list_distinct(a.sh || b.sh)) AS j
  FROM cand c JOIN shl a ON a.doc_id = c.lid JOIN shl b ON b.doc_id = c.rid
)
SELECT CAST(COUNT(*) FILTER (j >= 0.5) AS BIGINT) AS n_exact,
       TRUE AS ml_subset_ok, TRUE AS recall_ok
FROM ver
"""

QUERIES["d_minhash_ml_crosscheck"] = d_minhash_ml_crosscheck
ORACLE["d_minhash_ml_crosscheck"] = D_MINHASH_ML_SQL


def d_ngram_dup_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated n-gram mass per source — the corpus-health number the
    dedup stage is judged by (Lee et al. 2021 report it as "% of tokens
    in duplicated 50-grams"; k=3 here to match the synthetic corpus).
    For each source: how many shingle instances exist, how many belong
    to a shingle seen in MORE THAN ONE document, and the dup percentage.

    Scale shape: instances are exploded as 64-bit shingle HASHES, not
    strings (the d_shared_shingle_dedup lesson: string keys through the
    shuffle cost 10x; measured 21s -> ~4s at sf0.1), and shuffled ONCE —
    a (hash, source) aggregate (map-side combinable; a doc has exactly
    one source, so corpus doc-frequency = the per-source distinct-doc
    sum) — then everything runs on the distinct-(hash, source) table,
    orders of magnitude smaller than the instance stream. No join back
    to the exploded instances, no pair join.
    """
    d = load_table(spark, sf_dir, "documents")
    inst = (
        d.withColumn("_toks", TX.norm_tokens("text"))
        .withColumn("_sh", TX.word_shingles("text", k=3, toks=F.col("_toks")))
        .select("doc_id", "source", F.explode(OD.shingle_hashes(F.col("_sh"))).alias("_s"))
    )
    per_src = inst.groupBy("_s", "source").agg(
        F.count(F.lit(1)).alias("_n"), F.countDistinct("doc_id").alias("_nd")
    )
    w = Window.partitionBy("_s")
    return (
        per_src.withColumn("_ndocs", F.sum("_nd").over(w))
        .groupBy("source")
        .agg(
            F.sum("_n").alias("n_instances"),
            F.sum(F.when(F.col("_ndocs") > 1, F.col("_n")).otherwise(F.lit(0))).alias(
                "dup_instances"
            ),
        )
        .withColumn(
            "dup_pct",
            F.round(F.col("dup_instances") * 100.0 / F.col("n_instances"), 4),
        )
    )


D_NGRAM_DUP_MASS_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, {OQ.sql_tokens(OQ.sql_norm('text'))} AS t FROM documents
), shl AS (
  SELECT doc_id, source, {OQ.sql_shingles_from_tokens('t')} AS sh FROM toks
), inst AS (
  SELECT doc_id, source, unnest({OQ.sql_shingle_hashes('sh')}) AS s FROM shl
), per_src AS (
  SELECT s, source, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS nd
  FROM inst GROUP BY s, source
), with_tot AS (
  SELECT source, n, SUM(nd) OVER (PARTITION BY s) AS ndocs FROM per_src
)
SELECT source,
       CAST(SUM(n) AS BIGINT) AS n_instances,
       CAST(SUM(CASE WHEN ndocs > 1 THEN n ELSE 0 END) AS BIGINT) AS dup_instances,
       ROUND(SUM(CASE WHEN ndocs > 1 THEN n ELSE 0 END) * 100.0 / SUM(n), 4) AS dup_pct
FROM with_tot
GROUP BY source
"""

QUERIES["d_ngram_dup_mass"] = d_ngram_dup_mass
ORACLE["d_ngram_dup_mass"] = D_NGRAM_DUP_MASS_SQL


def d_soft_dedup_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft dedup: instead of DROPPING duplicates, weight every doc by
    1/cluster_size so a dup cluster contributes exactly one document's
    worth of training mass (the down-weighting alternative used when
    hard dedup is too aggressive — e.g. boilerplate-heavy but distinct
    pages). Per source: raw doc count vs effective (weighted) corpus
    size. Two map-side-combinable aggregates, no join back to the corpus
    (weights roll up from the cluster-size table directly:
    sum over clusters of size·(1/size) = cluster count... per source the
    cluster may span sources, so weights ARE joined back — but on the
    compact (key, size) table, never doc-to-doc)."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select("doc_id", "source", _coarse_key().alias("_k"))
    sizes = keyed.groupBy("_k").agg(F.count(F.lit(1)).alias("_sz"))
    return (
        keyed.join(sizes, "_k")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.sum(F.lit(1.0).cast("decimal(18,9)") / F.col("_sz")), 4)
            .cast("double")
            .alias("effective_docs"),
        )
    )


D_SOFT_DEDUP_SQL = f"""
WITH keyed AS (
  SELECT doc_id, source, {_COARSE_KEY_SQL} AS k FROM documents
), sizes AS (
  SELECT k, COUNT(*) AS sz FROM keyed GROUP BY k
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(ROUND(SUM(CAST(1.0 AS DECIMAL(18,9)) / sz), 4) AS DOUBLE) AS effective_docs
FROM keyed JOIN sizes USING (k)
GROUP BY source
"""

QUERIES["d_soft_dedup_weight"] = d_soft_dedup_weight
ORACLE["d_soft_dedup_weight"] = D_SOFT_DEDUP_SQL


_CONTAIN_DF_CAP = 50  # stop-shingle cap: drop shingles in > CAP docs
_CONTAIN_T = 0.8


def d_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-CONTAINMENT pairs: |A∩B| / min(|A|,|B|) >= 0.8 — the
    asymmetric cousin of Jaccard that catches quotes, supersets and
    wrapped copies (a page embedding another whole page scores ~1.0 here
    but can score arbitrarily low on Jaccard; Broder 1997 distinguishes
    resemblance vs containment for exactly this reason).

    Scale shape: candidates come from the shared-shingle-HASH join with a
    document-frequency cap (shingles in > 50 docs are dropped from
    CANDIDATE GENERATION only — the ubiquitous-boilerplate shingles whose
    join fanout would otherwise go quadratic; intersection counts still
    use every shingle). The cap is part of the spec and mirrored in the
    oracle, so the comparison stays exact."""
    d = load_table(spark, sf_dir, "documents")
    inst = (
        d.withColumn("_toks", TX.norm_tokens("text"))
        .withColumn("_sh", TX.word_shingles("text", k=3, toks=F.col("_toks")))
        .select("doc_id", F.explode(OD.shingle_hashes(F.col("_sh"))).alias("_h"))
        .dropDuplicates(["doc_id", "_h"])
    )
    sizes = inst.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_n"))
    df_tab = inst.groupBy("_h").agg(F.count(F.lit(1)).alias("_df"))
    narrow = inst.join(
        df_tab.filter(F.col("_df") <= _CONTAIN_DF_CAP), "_h"
    ).select("doc_id", "_h")
    l, r = narrow.alias("l"), narrow.alias("r")
    shared = (
        l.join(r, (F.col("l._h") == F.col("r._h")) & (F.col("l.doc_id") > F.col("r.doc_id")))
        .groupBy(F.col("l.doc_id").alias("id_l"), F.col("r.doc_id").alias("id_r"))
        .agg(F.count(F.lit(1)).alias("_shared"))
    )
    nl = sizes.select(F.col("doc_id").alias("id_l"), F.col("_n").alias("_nl"))
    nr = sizes.select(F.col("doc_id").alias("id_r"), F.col("_n").alias("_nr"))
    return (
        shared.join(nl, "id_l")
        .join(nr, "id_r")
        .withColumn(
            "containment",
            F.round(F.col("_shared") / F.least("_nl", "_nr"), 4),
        )
        .filter(F.col("containment") >= _CONTAIN_T)
        .select("id_l", "id_r", "containment")
    )


D_CONTAINMENT_SQL = f"""
WITH toks AS (
  SELECT doc_id, {OQ.sql_tokens(OQ.sql_norm('text'))} AS t FROM documents
), shl AS (
  SELECT doc_id, {OQ.sql_shingles_from_tokens('t')} AS sh FROM toks
), inst AS (
  SELECT DISTINCT doc_id, unnest({OQ.sql_shingle_hashes('sh')}) AS h FROM shl
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM inst GROUP BY doc_id
), keep AS (
  SELECT h FROM inst GROUP BY h HAVING COUNT(*) <= {_CONTAIN_DF_CAP}
), narrow AS (
  SELECT i.doc_id, i.h FROM inst i JOIN keep USING (h)
), shared AS (
  SELECT l.doc_id AS id_l, r.doc_id AS id_r, COUNT(*) AS ns
  FROM narrow l JOIN narrow r ON l.h = r.h AND l.doc_id > r.doc_id
  GROUP BY 1, 2
)
SELECT id_l, id_r,
       ROUND(ns * 1.0 / LEAST(a.n, b.n), 4) AS containment
FROM shared JOIN sizes a ON a.doc_id = id_l JOIN sizes b ON b.doc_id = id_r
WHERE ns * 1.0 / LEAST(a.n, b.n) >= {_CONTAIN_T}
"""

QUERIES["d_containment_pairs"] = d_containment_pairs
ORACLE["d_containment_pairs"] = D_CONTAINMENT_SQL


# ---------------------------------------------------------------------------
# Dedup savings accounting (token-budget audit)
# ---------------------------------------------------------------------------


def d_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What did dedup buy? Per source: documents and whitespace tokens
    before vs after exact dedup (min-doc_id winner over the normalized
    text key), plus savings in exact basis points — the accounting table
    a corpus release publishes next to its dedup method (Lee et al. §6
    report exactly this per-corpus table).

    Scale shape: token counts ride the SAME aggregate as the dedup
    winner decision — one window over the key partition annotates the
    winner, then a single per-source conditional rollup; no second scan
    of the corpus and no join between the before/after sides (they are
    conditional sums of one annotated stream). Output bounded by
    |sources|."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(
        F.concat_ws("|", F.col("source"), TX.normalize_text("text"))
    ).orderBy("doc_id")
    ann = d.select(
        "source",
        TX.token_count("text").alias("toks"),
        (F.row_number().over(w) == 1).cast("long").alias("keep"),
    )
    return (
        ann.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs_before"),
            F.sum("keep").alias("docs_after"),
            F.sum("toks").alias("toks_before"),
            F.sum(F.col("toks") * F.col("keep")).alias("toks_after"),
        )
        .withColumn(
            "tok_savings_bps",
            # zero-token source: savings undefined -> NULL in both engines
            # (bare integer div raises DIVIDE_BY_ZERO under ANSI mode)
            F.when(
                F.col("toks_before") != 0,
                F.expr("(toks_before - toks_after) * 10000 div toks_before"),
            ),
        )
        .orderBy("source")
    )


D_SAVINGS_SQL = f"""
WITH ann AS (
  SELECT source,
         {OQ.sql_token_count('text')} AS toks,
         CASE WHEN ROW_NUMBER() OVER (
             PARTITION BY concat_ws('|', source, {OQ.sql_norm('text')})
             ORDER BY doc_id) = 1 THEN 1 ELSE 0 END AS keep
  FROM documents
)
SELECT source,
       COUNT(*) AS docs_before,
       CAST(SUM(keep) AS BIGINT) AS docs_after,
       CAST(SUM(toks) AS BIGINT) AS toks_before,
       CAST(SUM(toks * keep) AS BIGINT) AS toks_after,
       CAST(CASE WHEN SUM(toks) <> 0
                 THEN (SUM(toks) - SUM(toks * keep)) * 10000 // SUM(toks)
            END AS BIGINT) AS tok_savings_bps
FROM ann GROUP BY source ORDER BY source
"""

QUERIES["d_dedup_savings"] = d_dedup_savings
ORACLE["d_dedup_savings"] = D_SAVINGS_SQL


# ---------------------------------------------------------------------------
# Cosine dedup threshold sweep
# ---------------------------------------------------------------------------

_SWEEP_THRESHOLDS = (0.80, 0.85, 0.90, 0.95)


def d_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How aggressive should semantic dedup be? The threshold-selection
    audit: for each candidate cosine threshold, how many embeddings
    would be dropped (have a higher-priority near-neighbor ≥ t in their
    LSH bucket) and the implied survivor count — computed from ONE
    bucket-join pass with per-threshold conditional aggregation, not one
    dedup run per threshold.

    Scale shape: the pairwise cosine evaluates once per same-bucket pair
    (the d_cosine_dedup candidate set); thresholds are CASE flags over
    that single pair stream, so sweeping 4 thresholds costs the same
    shuffle as sweeping one. Output: 4 rows."""
    from webscale_multimodal_datapipeline_spark.operators.dedup import (
        hyperplane_bucket,
    )

    e = load_table(spark, sf_dir, "embeddings")
    b = e.select(
        "vec_id", "embedding", hyperplane_bucket("embedding", 64).alias("bucket")
    )
    l, r = b.alias("l"), b.alias("r")
    pairs = l.join(
        r,
        (F.col("l.bucket") == F.col("r.bucket"))
        & (F.col("l.vec_id") > F.col("r.vec_id")),
    ).select(
        F.col("l.vec_id").alias("vid"),
        VX.cosine(F.col("l.embedding"), F.col("r.embedding")).alias("cos"),
    )
    n_total = e.count()
    per_vid = pairs.groupBy("vid").agg(F.max("cos").alias("max_cos"))
    # coalesce: with ZERO same-bucket pairs per_vid is empty and SUM over
    # no rows is NULL — the report must read 0 dropped / n_total survivors.
    rows = [
        per_vid.agg(
            F.lit(int(t * 100)).alias("threshold_pct"),
            F.coalesce(
                F.sum((F.col("max_cos") >= t).cast("long")), F.lit(0)
            ).alias("n_dropped"),
            (
                F.lit(n_total)
                - F.coalesce(
                    F.sum((F.col("max_cos") >= t).cast("long")), F.lit(0)
                )
            ).alias("n_survivors"),
        )
        for t in _SWEEP_THRESHOLDS
    ]
    out = rows[0]
    for x in rows[1:]:
        out = out.unionByName(x)
    return out.orderBy("threshold_pct")


_SWEEP_ARMS = "\nUNION ALL\n".join(
    f"""SELECT {int(t * 100)} AS threshold_pct,
       CAST(COALESCE(SUM(CASE WHEN max_cos >= {t} THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_dropped,
       CAST((SELECT COUNT(*) FROM embeddings)
            - COALESCE(SUM(CASE WHEN max_cos >= {t} THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_survivors
FROM per_vid"""
    for t in _SWEEP_THRESHOLDS
)

D_SWEEP_SQL = f"""
WITH b AS (
  SELECT vec_id, embedding, {OQ.sql_hyperplane_bucket('embedding', 64)} AS bucket
  FROM embeddings
), pairs AS (
  SELECT l.vec_id AS vid,
         {OQ.sql_cosine('l.embedding', 'r.embedding', 64)} AS cos
  FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id > r.vec_id
), per_vid AS (
  SELECT vid, MAX(cos) AS max_cos FROM pairs GROUP BY vid
)
{_SWEEP_ARMS}
ORDER BY threshold_pct
"""

QUERIES["d_threshold_sweep"] = d_threshold_sweep
ORACLE["d_threshold_sweep"] = D_SWEEP_SQL


# ---------------------------------------------------------------------------
# Cross-source duplication matrix
# ---------------------------------------------------------------------------


def d_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus forensics: which SOURCES duplicate each other? For every
    source pair (a < b), the number of distinct 3-word shingle hashes
    they share — the matrix that catches a mirror site, a re-crawled
    feed, or a dataset assembled twice under different names (the
    between-source analog of ``d_split_leakage_audit``).

    Scale shape: the corpus stream reduces to DISTINCT (source, hash)
    BEFORE any pairing (hashes carried as 64-bit ints, never strings —
    the d_ngram_dup_mass lesson); the self-join runs on the hash key and
    its fanout per hash is |sources having it| ≤ |sources| — bounded,
    never quadratic in documents. Output ≤ |sources|² rows."""
    from webscale_multimodal_datapipeline_spark.functions.text import word_shingles
    from webscale_multimodal_datapipeline_spark.operators.dedup import shingle_hashes

    d = load_table(spark, sf_dir, "documents")
    # tokens MATERIALIZED as a column before word_shingles — inlining the
    # tokenize expression re-evaluates the split per element_at inside the
    # shingle lambda (the 50x trap word_shingles documents; measured 19.6s
    # -> 1.8s for the distinct at sf0.1)
    toks = d.withColumn("_t", TX.norm_tokens("text"))
    sh = (
        toks.select(
            "source",
            F.explode(
                shingle_hashes(word_shingles("text", toks=F.col("_t")))
            ).alias("h"),
        )
        .distinct()
        # referenced on BOTH join sides: materialize once (the g_pagerank
        # reused-subtree policy) so the corpus explode+distinct runs once
        .localCheckpoint(eager=True)
    )
    a, bb = sh.alias("a"), sh.alias("b")
    return (
        a.join(bb, (F.col("a.h") == F.col("b.h")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
        .orderBy("source_a", "source_b")
    )


D_CROSS_SOURCE_SQL = f"""
WITH sh AS (
  SELECT DISTINCT source, h
  FROM (
    SELECT source, unnest({OQ.sql_shingle_hashes(OQ.sql_shingles_from_tokens('t'))}) AS h
    FROM (SELECT source, {OQ.sql_tokens(OQ.sql_norm('text'))} AS t FROM documents)
  )
)
SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS shared_shingles
FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
GROUP BY a.source, b.source
ORDER BY source_a, source_b
"""

QUERIES["d_cross_source_overlap"] = d_cross_source_overlap
ORACLE["d_cross_source_overlap"] = D_CROSS_SOURCE_SQL


# ---------------------------------------------------------------------------
# LSH S-curve tuning audit
# ---------------------------------------------------------------------------


def d_lsh_s_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-curve audit of the MinHash-LSH banding (b=4 bands × r=3 rows):
    for every candidate pair the banding ACTUALLY produced, count
    matching signature positions k (the signature-estimated Jaccard is
    k/12), and attach the THEORETICAL collision probability
    ``p(s) = 1 − (1 − s^r)^b`` at s = k/12 (Leskovec/Rajaraman/Ullman,
    MMDS ch.3). A well-tuned banding shows candidate mass concentrated
    where p(s) is high; heavy mass at low k means the bands are wasting
    verify work on chance collisions — THE dial a 100-TB dedup run
    tunes before paying for the exact-Jaccard verify stage.

    Exactness: k is an integer sum of 12 per-position equality tests
    over exact signature elements; the two reported doubles divide /
    exponentiate bit-identical operands in both engines. Candidates by
    construction share a full band, so k ≥ r = 3 always holds — a
    built-in sanity floor for the audit.

    Scale shape: the pair set comes from the band-bucket equi-join
    (never all-pairs), grouped straight down to ≤ 13 rows (k ∈ 3..12).
    Signatures ride along the band rows, so no second fact join.
    NULL-text docs have no signature and are excluded by spec (the
    null-parity test pins this — Spark's concat_ws-built bands would
    otherwise collide where DuckDB's propagate NULL).
    """
    d = load_table(spark, sf_dir, "documents", spread=True).filter(
        F.col("text").isNotNull()
    )
    base = (
        d.withColumn("_toks", TX.norm_tokens("text"))
        .withColumn("_shingles", TX.word_shingles("text", k=3, toks=F.col("_toks")))
        .withColumn("_hashes", OD.shingle_hashes(F.col("_shingles")))
        .withColumn("_sig", OD.minhash_signature("text", k=3, hashes=F.col("_hashes")))
        .select("doc_id", "_sig")
    )
    banded = base.select(
        "doc_id", "_sig", F.explode(OD.lsh_bands(F.col("_sig"))).alias("_band")
    )
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l._band") == F.col("r._band"))
            & (F.col("l.doc_id") > F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("id_l"),
            F.col("r.doc_id").alias("id_r"),
            F.col("l._sig").alias("_ls"),
            F.col("r._sig").alias("_rs"),
        )
        .dropDuplicates(["id_l", "id_r"])
    )
    k = F.size(
        F.filter(
            F.zip_with("_ls", "_rs", lambda x, y: x == y), lambda v: v
        )
    ).cast("long")
    n, b = OD.NUM_MINHASHES, OD.LSH_BANDS
    rr = n // b
    s = F.col("sig_match_k").cast("double") / F.lit(float(n))
    return (
        cand.select(k.alias("sig_match_k"))
        .groupBy("sig_match_k")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            "sig_match_k",
            "n_pairs",
            F.round(s, 6).alias("est_jaccard"),
            F.round(
                F.lit(1.0) - F.pow(F.lit(1.0) - F.pow(s, F.lit(float(rr))), F.lit(float(b))),
                6,
            ).alias("p_collide_theory"),
        )
    )


def _lsh_s_curve_sql() -> str:
    n, b = OD.NUM_MINHASHES, OD.LSH_BANDS
    rr = n // b
    sig_list = "[" + ", ".join(_SIG_ELEMS) + "]"
    bands_list = "[" + ", ".join(OQ.sql_lsh_bands("sig")) + "]"
    kmatch = " + ".join(
        f"(CASE WHEN l.sig[{i}] = r.sig[{i}] THEN 1 ELSE 0 END)"
        for i in range(1, n + 1)
    )
    s = f"CAST(sig_match_k AS DOUBLE) / CAST({n} AS DOUBLE)"
    # own CTE head (not _SH_CTE): the NULL-text exclusion is part of this
    # query's spec (see the docstring / null-parity test)
    return (
        f"""
WITH toks AS (
  SELECT doc_id, {OQ.sql_tokens(OQ.sql_norm('text'))} AS t
  FROM documents WHERE text IS NOT NULL
), sh AS (
  SELECT doc_id, {OQ.sql_shingles_from_tokens('t')} AS sh FROM toks
), hs AS (
  SELECT doc_id, sh, {OQ.sql_shingle_hashes('sh')} AS h FROM sh
)"""
        + f""", sig AS (
  SELECT doc_id, {sig_list} AS sig FROM hs
), bands AS (
  SELECT doc_id, sig, unnest({bands_list}) AS band FROM sig
), cand AS (
  SELECT l.doc_id AS id_l, r.doc_id AS id_r,
         CAST(MIN({kmatch}) AS BIGINT) AS sig_match_k
  FROM bands l JOIN bands r
    ON l.band = r.band AND l.doc_id > r.doc_id
  GROUP BY 1, 2
)
SELECT sig_match_k, COUNT(*) AS n_pairs,
       ROUND({s}, 6) AS est_jaccard,
       ROUND(CAST(1 AS DOUBLE) - POW(CAST(1 AS DOUBLE)
               - POW({s}, CAST({rr} AS DOUBLE)),
             CAST({b} AS DOUBLE)), 6) AS p_collide_theory
FROM cand
GROUP BY sig_match_k
"""
    )


QUERIES["d_lsh_s_curve"] = d_lsh_s_curve
ORACLE["d_lsh_s_curve"] = _lsh_s_curve_sql()


# ---------------------------------------------------------------------------
# n-gram novelty: eval-split shingles unseen in the train split
# ---------------------------------------------------------------------------


def d_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source n-gram NOVELTY of the eval split vs the train split:
    the fraction of an eval document's distinct 3-word shingles that
    appear in NO train document — the memorization-exposure dial of
    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better") turned around: low novelty means the eval set is largely
    reconstructible from training n-grams and its scores are
    contaminated-optimistic. Uses the same deterministic id-hash
    80/10/10 split as ``t_dataset_split``, so the split is reproducible
    across engines and runs.

    Scale shape: the train side is reduced to a DISTINCT shingle-hash
    key index (keys only — the ``d_incremental_dedup`` trick) before a
    hash-partitioned LEFT JOIN from the eval instance table; nothing is
    broadcast, nothing quadratic, and the rollup is m-source-bounded.
    Novelty is an exact integer ratio divided once at the end.
    """
    d = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(TX.md5_long(F.col("doc_id").cast("string")), F.lit(100))
    inst = (
        d.withColumn("_b", bucket)
        .withColumn("_toks", TX.norm_tokens("text"))
        .withColumn("_sh", TX.word_shingles("text", k=3, toks=F.col("_toks")))
        .select(
            "doc_id",
            "source",
            "_b",
            F.explode(OD.shingle_hashes(F.col("_sh"))).alias("_h"),
        )
        .dropDuplicates(["doc_id", "_h"])
    )
    train_h = (
        inst.filter(F.col("_b") < 80).select(F.col("_h"), F.lit(1).alias("_seen"))
        .dropDuplicates(["_h"])
    )
    ev = inst.filter(F.col("_b") >= 90)
    return (
        ev.join(train_h, "_h", "left")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_eval_docs"),
            F.count(F.lit(1)).alias("n_shingles"),
            F.count(F.when(F.col("_seen").isNull(), 1)).alias("n_novel"),
        )
        .select(
            "source",
            "n_eval_docs",
            "n_shingles",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double") / F.col("n_shingles").cast("double"), 6
            ).alias("novelty"),
        )
    )


D_NGRAM_NOVELTY_SQL = f"""
WITH toks AS (
  SELECT doc_id, source,
         {OQ.sql_md5_long("CAST(doc_id AS VARCHAR)")} % 100 AS b,
         {OQ.sql_tokens(OQ.sql_norm('text'))} AS t
  FROM documents
), shl AS (
  SELECT doc_id, source, b, {OQ.sql_shingles_from_tokens('t')} AS sh FROM toks
), inst AS (
  SELECT DISTINCT doc_id, source, b, unnest({OQ.sql_shingle_hashes('sh')}) AS h
  FROM shl
), train_h AS (
  SELECT DISTINCT h FROM inst WHERE b < 80
)
SELECT e.source,
       CAST(COUNT(DISTINCT e.doc_id) AS BIGINT) AS n_eval_docs,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(COUNT(*) FILTER (WHERE t.h IS NULL) AS BIGINT) AS n_novel,
       ROUND(CAST(COUNT(*) FILTER (WHERE t.h IS NULL) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
FROM (SELECT * FROM inst WHERE b >= 90) e
LEFT JOIN train_h t ON e.h = t.h
GROUP BY e.source
"""

QUERIES["d_ngram_novelty"] = d_ngram_novelty
ORACLE["d_ngram_novelty"] = D_NGRAM_NOVELTY_SQL


# ---------------------------------------------------------------------------
# Bloom-filter bitmap FPR audit (incremental-dedup prefilter)
# ---------------------------------------------------------------------------

_BBM_M = 1 << 16  # bits in the filter
_BBM_K = 4  # hash functions
_BBM_WORD = 32  # bits per packed word (sign-safe shifts in both engines)


def d_bloom_bitmap_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter PREFILTER audit for incremental dedup (Bloom 1970;
    the Broder/Mitzenmacher network-survey workhorse): pack the
    snapshot's content-hash keys into an m=2^16-bit filter (k=4 affine
    hashes, 32-bit words via bit_or rollup), probe the new batch, and
    measure what the prefilter buys — candidates vs true duplicates,
    the realized false-positive rate, and the ``(1−e^{−kn/m})^k``
    theoretical rate beside it. At 100 TB this is the step that turns
    "anti-join every new key against a billion-row snapshot index" into
    "anti-join the ~FPR fraction the filter couldn't clear": the filter
    is a few KB broadcast everywhere, the snapshot index is touched
    only for candidates. ``n_missed`` is the no-false-negatives
    invariant and must be 0 by construction.

    Exactness: bit positions are affine-mod arithmetic over exact
    integer key hashes; the packed words are integer bit_or rollups;
    both FPR floats divide/exponentiate bit-identical operands.

    Scale shape: the filter build is ONE bounded rollup (≤ 2^11 word
    rows — bounded BY CONSTRUCTION, its broadcast is free at any scale);
    the probe is a key-side explode (k rows per key) joined to that
    bounded table; the exact-truth arm is the keys-only semi-join of
    ``d_incremental_dedup``. Output is 1 row.
    """
    m, k, wbits = _BBM_M, _BBM_K, _BBM_WORD
    d = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(TX.md5_long(F.col("doc_id").cast("string")), F.lit(100))
    keyed = d.select(
        bucket.alias("_b"),
        F.pmod(TX.md5_long(TX.normalize_text(F.col("text"))), F.lit(OD.MINHASH_P)).alias(
            "_key"
        ),
    )
    train = keyed.filter(F.col("_b") < 80).select("_key").dropDuplicates(["_key"])
    probe = keyed.filter(F.col("_b") >= 90).select("_key").dropDuplicates(["_key"])

    def positions(df):
        return df.select(
            "_key",
            F.explode(
                F.array(
                    *[
                        F.pmod(
                            (F.col("_key") * (2 * i + 3) + (7 * i + 1)),
                            F.lit(OD.MINHASH_P),
                        )
                        % m
                        for i in range(k)
                    ]
                )
            ).alias("_pos"),
        ).select(
            "_key",
            (F.col("_pos") / wbits).cast("long").alias("_word"),
            F.pmod(F.col("_pos"), F.lit(wbits)).alias("_bit"),
        )

    words = (
        positions(train)
        .groupBy("_word")
        .agg(F.bit_or(F.expr(f"shiftleft(CAST(1 AS BIGINT), _bit)")).alias("_mask"))
    )
    probed = (
        positions(probe)
        .join(F.broadcast(words), "_word", "left")
        .withColumn(
            "_present",
            F.expr("(shiftright(coalesce(_mask, CAST(0 AS BIGINT)), _bit) & 1)"),
        )
        .groupBy("_key")
        .agg(F.min("_present").alias("_hit"))
    )
    truth = probe.join(train, "_key", "left_semi").select(
        F.col("_key"), F.lit(1).alias("_dup")
    )
    joined = probed.join(truth, "_key", "left")
    agg = joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_probe_keys"),
        F.sum("_hit").cast("long").alias("n_candidates"),
        F.count(F.when(F.col("_dup") == 1, 1)).cast("long").alias("n_true_dups"),
        F.count(F.when((F.col("_dup") == 1) & (F.col("_hit") == 0), 1))
        .cast("long")
        .alias("n_missed"),
    )
    ntr = train.agg(F.count(F.lit(1)).cast("long").alias("n_train_keys"))
    fp = F.col("n_candidates") - F.col("n_true_dups")
    clean = F.col("n_probe_keys") - F.col("n_true_dups")
    fpr_theory = F.pow(
        F.lit(1.0)
        - F.pow(
            F.lit(1.0) - F.lit(1.0) / m,
            (F.lit(k) * F.col("n_train_keys")).cast("double"),
        ),
        F.lit(float(k)),
    )
    return agg.crossJoin(F.broadcast(ntr)).select(
        "n_train_keys",
        "n_probe_keys",
        "n_candidates",
        "n_true_dups",
        "n_missed",
        F.round(
            F.when(clean > 0, fp.cast("double") / clean.cast("double")).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("fpr"),
        F.round(fpr_theory, 6).alias("fpr_theory"),
    )


def _bloom_sql() -> str:
    m, k, wbits = _BBM_M, _BBM_K, _BBM_WORD
    P = OD.MINHASH_P
    pos_list = "[" + ", ".join(
        f"((_key * {2 * i + 3} + {7 * i + 1}) % {P}) % {m}" for i in range(k)
    ) + "]"
    return f"""
WITH keyed AS (
  SELECT {OQ.sql_md5_long("CAST(doc_id AS VARCHAR)")} % 100 AS b,
         {OQ.sql_md5_long(OQ.sql_norm('text'))} % {P} AS _key
  FROM documents
), train AS (
  SELECT DISTINCT _key FROM keyed WHERE b < 80
), probe AS (
  SELECT DISTINCT _key FROM keyed WHERE b >= 90
), tpos AS (
  SELECT _key, unnest({pos_list}) AS pos FROM train
), words AS (
  SELECT CAST(floor(pos / {wbits}) AS BIGINT) AS word,
         bit_or(CAST(1 AS BIGINT) << (pos % {wbits})) AS mask
  FROM tpos GROUP BY 1
), ppos AS (
  SELECT _key, unnest({pos_list}) AS pos FROM probe
), probed AS (
  SELECT p._key,
         MIN((COALESCE(w.mask, 0) >> (p.pos % {wbits})) & 1) AS hit
  FROM (SELECT _key, pos, CAST(floor(pos / {wbits}) AS BIGINT) AS word
        FROM ppos) p
  LEFT JOIN words w ON w.word = p.word
  GROUP BY p._key
), joined AS (
  SELECT pr._key, pr.hit,
         CASE WHEN t._key IS NULL THEN 0 ELSE 1 END AS dup
  FROM probed pr LEFT JOIN train t ON t._key = pr._key
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_probe_keys,
         CAST(SUM(hit) AS BIGINT) AS n_candidates,
         CAST(COUNT(*) FILTER (WHERE dup = 1) AS BIGINT) AS n_true_dups,
         CAST(COUNT(*) FILTER (WHERE dup = 1 AND hit = 0) AS BIGINT) AS n_missed
  FROM joined
), ntr AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_train_keys FROM train
)
SELECT n_train_keys, n_probe_keys, n_candidates, n_true_dups, n_missed,
       ROUND(CASE WHEN n_probe_keys - n_true_dups > 0
         THEN CAST(n_candidates - n_true_dups AS DOUBLE)
              / CAST(n_probe_keys - n_true_dups AS DOUBLE)
         ELSE 0.0 END, 6) AS fpr,
       ROUND(POW(CAST(1 AS DOUBLE) - POW(CAST(1 AS DOUBLE)
                   - CAST(1 AS DOUBLE) / {m},
                 CAST({k} * n_train_keys AS DOUBLE)),
             CAST({k} AS DOUBLE)), 6) AS fpr_theory
FROM agg, ntr
"""


QUERIES["d_bloom_bitmap_fpr"] = d_bloom_bitmap_fpr
ORACLE["d_bloom_bitmap_fpr"] = _bloom_sql()


# ---------------------------------------------------------------------------
# Capture–recapture estimate of total near-dup pairs
# ---------------------------------------------------------------------------

_CR_JACCARD_T = 0.5  # detector A: verified n-gram Jaccard >= 0.5


def d_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture–recapture (Lincoln–Petersen / Chapman) estimate of the
    TRUE near-duplicate pair count from two INDEPENDENT detectors —
    MinHash-verified Jaccard (≥ 0.5) and SimHash Hamming (≤ 12). Each
    detector misses pairs; treating one's catch as a "marking" of the
    population, the overlap rate estimates what BOTH miss:
    ``N̂ = (nA+1)(nB+1)/(nAB+1) − 1`` (Chapman's bias-corrected form).
    This is how a dedup QA pass reports "we removed X% of duplication"
    with an honest denominator instead of assuming its own recall is 1
    — mark-recapture applied to data quality (the Lee et al. 2022
    dedup-coverage question made estimable). Caveat carried with the
    number: LP assumes equal catchability; detectors tuned to different
    similarity notions (strict Jaccard vs Hamming) violate it, so treat
    the estimate as a coverage DIAGNOSTIC (at sf0.01 it reads: the
    J≥0.5 detector sees 1.5% of the hamming-near population) rather
    than a census.

    Determinism: both pair sets are existing oracle-checked pipelines;
    pairs are normalized to (lo, hi) id order before the equi-join;
    every count is an exact BIGINT, the estimator a double of exact
    integers, rounded.

    Scale shape: two bucketed pair generators (never all-pairs), one
    hash join of pair keys, one scalar aggregate. At 100 TB both pair
    sets are materialized dedup by-products — the audit is a join of
    two existing tables.
    """
    a = (
        d_jaccard_pairs(spark, sf_dir)
        .filter(F.col("jaccard") >= _CR_JACCARD_T)
        .select(
            F.least("id_l", "id_r").alias("lo"),
            F.greatest("id_l", "id_r").alias("hi"),
        )
    )
    b = d_simhash_near_pairs(spark, sf_dir).select(
        F.least("id_l", "id_r").alias("lo"),
        F.greatest("id_l", "id_r").alias("hi"),
    )
    na = a.agg(F.count(F.lit(1)).cast("long").alias("n_minhash"))
    nb = b.agg(F.count(F.lit(1)).cast("long").alias("n_simhash"))
    nab = (
        a.join(b, ["lo", "hi"])
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    est = (
        (F.col("n_minhash") + 1) * (F.col("n_simhash") + 1)
    ).cast("double") / (F.col("n_both") + 1).cast("double") - F.lit(1.0)
    return (
        na.crossJoin(nb)
        .crossJoin(nab)
        .select(
            "n_minhash",
            "n_simhash",
            "n_both",
            F.round(est, 2).alias("chapman_estimate"),
            F.round(F.col("n_minhash").cast("double") / est, 4).alias(
                "coverage_minhash"
            ),
            F.round(F.col("n_simhash").cast("double") / est, 4).alias(
                "coverage_simhash"
            ),
        )
    )


def _capture_recapture_sql() -> str:
    chunks = ", ".join(_chunks_for("s"))
    return (
        _minhash_pipeline_sql(_CR_JACCARD_T)
        + f""", a AS (
  SELECT LEAST(lid, rid) AS lo, GREATEST(lid, rid) AS hi
  FROM ver WHERE jaccard >= {_CR_JACCARD_T}
), sh2 AS (
  SELECT doc_id, {OQ.sql_token_hashes('text')} AS th FROM documents
), sims AS (
  SELECT doc_id, {OQ.sql_simhash_from_hashes('th')} AS s FROM sh2
), chunked AS (
  SELECT doc_id, s, unnest([{chunks}]) AS chunk FROM sims
), b AS (
  SELECT DISTINCT LEAST(l.doc_id, r.doc_id) AS lo,
         GREATEST(l.doc_id, r.doc_id) AS hi
  FROM chunked l JOIN chunked r ON l.chunk = r.chunk AND l.doc_id < r.doc_id
  WHERE bit_count(xor(l.s, r.s)) <= 12
), na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_minhash FROM a),
nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_simhash FROM b),
nab AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_both
        FROM a JOIN b ON a.lo = b.lo AND a.hi = b.hi)
SELECT n_minhash, n_simhash, n_both,
       ROUND(CAST((n_minhash + 1) * (n_simhash + 1) AS DOUBLE)
             / CAST(n_both + 1 AS DOUBLE) - CAST(1 AS DOUBLE), 2)
         AS chapman_estimate,
       ROUND(CAST(n_minhash AS DOUBLE)
             / (CAST((n_minhash + 1) * (n_simhash + 1) AS DOUBLE)
                / CAST(n_both + 1 AS DOUBLE) - CAST(1 AS DOUBLE)), 4)
         AS coverage_minhash,
       ROUND(CAST(n_simhash AS DOUBLE)
             / (CAST((n_minhash + 1) * (n_simhash + 1) AS DOUBLE)
                / CAST(n_both + 1 AS DOUBLE) - CAST(1 AS DOUBLE)), 4)
         AS coverage_simhash
FROM na, nb, nab
"""
    )


QUERIES["d_capture_recapture"] = d_capture_recapture
ORACLE["d_capture_recapture"] = _capture_recapture_sql()


def d_cluster_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity terms of the near-dup pair graph under its
    connected-component clustering — the cluster-quality readout for a
    dedup run: for component c, q_term = m_c/m − (d_c/2m)² (intra-edge
    fraction minus the degree-sum null model; Newman & Girvan 2004).
    Since components make every edge intra-cluster, Σ m_c = m and
    Q = Σ q_term = 1 − Σ (d_c/2m)² — small dense cliques score high,
    one giant hairball scores ~0, which is exactly the "did my LSH
    threshold over-merge?" signal. Top 20 components by intra-edge count.

    Per-component rows (the ``s_kl_per_source`` pattern) keep all float
    expressions row-local over exact integers. Scale shape: degrees and
    intra-edge counts are two count rollups over the pair set; the
    component labels come from the O(log n) star algorithm; nothing
    materializes beyond (node, comp, degree)."""
    d = load_table(spark, sf_dir, "documents")
    pairs = OD.simhash_near_pairs(d, max_hamming=12).select("id_l", "id_r")
    comp = OD.connected_components_star(pairs, "id_l", "id_r", edges_distinct=True)
    m_tot = pairs.agg(F.count(F.lit(1)).cast("double").alias("_m"))
    deg = (
        pairs.select(F.col("id_l").alias("id"))
        .unionAll(pairs.select(F.col("id_r").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("_deg"))
    )
    node_stats = deg.join(comp, "id").groupBy("comp").agg(
        F.count(F.lit(1)).alias("n_nodes"), F.sum("_deg").alias("d_c")
    )
    intra = (
        pairs.join(comp.withColumnRenamed("id", "id_l"), "id_l")
        .groupBy("comp")
        .agg(F.count(F.lit(1)).alias("m_c"))
    )
    two_m = F.lit(2.0) * F.col("_m")
    return (
        node_stats.join(intra, "comp")
        .crossJoin(F.broadcast(m_tot))
        .select(
            F.col("comp").cast("bigint").alias("comp"),
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
            F.col("m_c").cast("bigint").alias("m_c"),
            F.col("d_c").cast("bigint").alias("d_c"),
            F.round(
                F.col("m_c").cast("double") / F.col("_m")
                - (F.col("d_c").cast("double") / two_m)
                * (F.col("d_c").cast("double") / two_m),
                6,
            ).alias("q_term"),
        )
        .orderBy(F.desc("m_c"), "comp")
        .limit(20)
    )


D_MODULARITY_SQL = f"""
WITH RECURSIVE npairs AS (
  {D_SIMHASH_PAIRS_SQL}
), edges AS (
  SELECT id_l AS src, id_r AS dst FROM npairs
  UNION ALL
  SELECT id_r AS src, id_l AS dst FROM npairs
), nodes AS (
  SELECT DISTINCT src AS id FROM edges
), reach AS (
  SELECT id, id AS r FROM nodes
  UNION
  SELECT e.src AS id, reach.r FROM edges e JOIN reach ON e.dst = reach.id
), comp AS (
  SELECT id, MIN(r) AS comp FROM reach GROUP BY id
), m_tot AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM npairs
), deg AS (
  SELECT src AS id, COUNT(*) AS deg FROM edges GROUP BY 1
), node_stats AS (
  SELECT c.comp, COUNT(*) AS n_nodes, SUM(deg.deg) AS d_c
  FROM deg JOIN comp c USING (id) GROUP BY 1
), intra AS (
  SELECT c.comp, COUNT(*) AS m_c
  FROM npairs p JOIN comp c ON p.id_l = c.id GROUP BY 1
)
SELECT CAST(ns.comp AS BIGINT) AS comp,
       CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(m_c AS BIGINT) AS m_c,
       CAST(d_c AS BIGINT) AS d_c,
       ROUND(CAST(m_c AS DOUBLE) / m
             - (CAST(d_c AS DOUBLE) / (2.0 * m)) * (CAST(d_c AS DOUBLE) / (2.0 * m)),
             6) AS q_term
FROM node_stats ns JOIN intra i ON ns.comp = i.comp, m_tot
ORDER BY m_c DESC, comp LIMIT 20
"""

QUERIES["d_cluster_modularity"] = d_cluster_modularity
ORACLE["d_cluster_modularity"] = D_MODULARITY_SQL


def d_minhash_est_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator-quality audit: for every LSH candidate pair,
    the signature-agreement estimate ĵ = |{i: sig_l[i]=sig_r[i]}| / 12
    against the exact shingle Jaccard, with the absolute error — the
    Broder 1997 unbiasedness check run on one's OWN signature
    implementation (a salted-hash bug or a band/row mix-up shows up as
    systematic bias here long before it degrades dedup recall).

    All ratios are int/int double divisions, identical both engines.
    Scale shape: candidates come from the band bucket join (never
    all-pairs); signatures ride the existing row-local pipeline."""
    d = load_table(spark, sf_dir, "documents", spread=True)
    base = (
        d.withColumn("_toks", TX.norm_tokens("text"))
        .withColumn("_shingles", TX.word_shingles("text", k=3, toks=F.col("_toks")))
        .withColumn("_hashes", OD.shingle_hashes(F.col("_shingles")))
        .withColumn("_sig", OD.minhash_signature("text", k=3, hashes=F.col("_hashes")))
    )
    sh = base.select("doc_id", "_shingles", "_sig")
    banded = base.select("doc_id", F.explode(OD.lsh_bands(F.col("_sig"))).alias("_band"))
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(r, (F.col("l._band") == F.col("r._band")) & (F.col("l.doc_id") > F.col("r.doc_id")))
        .select(F.col("l.doc_id").alias("id_l"), F.col("r.doc_id").alias("id_r"))
        .dropDuplicates(["id_l", "id_r"])
    )
    matches = F.aggregate(
        F.zip_with("_sl", "_sr", lambda a, b: (a == b).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    exact = F.size(F.array_intersect("_ls", "_rs")) / F.size(F.array_union("_ls", "_rs"))
    est = matches.cast("double") / F.lit(float(OD.NUM_MINHASHES))
    return (
        cand.join(
            sh.select(
                F.col("doc_id").alias("id_l"),
                F.col("_shingles").alias("_ls"),
                F.col("_sig").alias("_sl"),
            ),
            "id_l",
        )
        .join(
            sh.select(
                F.col("doc_id").alias("id_r"),
                F.col("_shingles").alias("_rs"),
                F.col("_sig").alias("_sr"),
            ),
            "id_r",
        )
        .select(
            "id_l",
            "id_r",
            est.alias("est_jaccard"),
            exact.alias("exact_jaccard"),
            F.round(F.abs(est - exact), 6).alias("abs_err"),
        )
        .orderBy("id_l", "id_r")
    )


_SIG_MATCH = " + ".join(
    f"(CASE WHEN a.sig[{i + 1}] = b.sig[{i + 1}] THEN 1 ELSE 0 END)"
    for i in range(OD.NUM_MINHASHES)
)

D_MH_EST_SQL = (
    _minhash_pipeline_sql(0.0).split(", ver AS (")[0]
    + f"""
SELECT c.lid AS id_l, c.rid AS id_r,
       CAST({_SIG_MATCH} AS DOUBLE) / {float(OD.NUM_MINHASHES)} AS est_jaccard,
       len(list_intersect(sa.sh, sb.sh)) / len(list_distinct(sa.sh || sb.sh)) AS exact_jaccard,
       ROUND(ABS(CAST({_SIG_MATCH} AS DOUBLE) / {float(OD.NUM_MINHASHES)}
                 - len(list_intersect(sa.sh, sb.sh)) / len(list_distinct(sa.sh || sb.sh))), 6) AS abs_err
FROM cand c
JOIN sig a ON a.doc_id = c.lid JOIN sig b ON b.doc_id = c.rid
JOIN sh sa ON sa.doc_id = c.lid JOIN sh sb ON sb.doc_id = c.rid
ORDER BY id_l, id_r
"""
)

QUERIES["d_minhash_est_vs_exact"] = d_minhash_est_vs_exact
ORACLE["d_minhash_est_vs_exact"] = D_MH_EST_SQL


# ---------------------------------------------------------------------------
# Duplicated-substring span removal (round 9) — Lee et al. 2021 ExactSubstr,
# k-gram formulation (operators/dedup.py::dup_span_spans / dup_span_scrub).
# The whole-record d_* family above decides KEEP/DROP per doc; this family
# excises the duplicated token runs themselves and keeps the remainder —
# the dedup mode Lee et al. report the larger LM-quality win for. The
# oracle replays positional gram hashing, the global >1-occurrence test,
# the interval merge, and the text rebuild — hash-exact end to end.
# ---------------------------------------------------------------------------

_SPAN_K = OD.DUP_SPAN_K

_D_SPAN_CTE = f"""
toks AS (
  SELECT doc_id, {OQ.sql_tokens(OQ.sql_norm('text'))} AS t FROM documents
), inst AS (
  SELECT doc_id, CAST(unnest(range(0, len(t) - {_SPAN_K - 1})) AS BIGINT) AS pos, t
  FROM toks WHERE len(t) >= {_SPAN_K}
), hashed AS (
  SELECT doc_id, pos,
         {OQ.sql_md5_long(" || ' ' || ".join(f"t[pos + {j + 1}]" for j in range(_SPAN_K)))} AS h
  FROM inst
), dup AS (
  SELECT h FROM hashed GROUP BY h HAVING COUNT(*) > 1
), cov AS (
  SELECT doc_id, pos FROM hashed JOIN dup USING (h)
), mrk AS (
  SELECT doc_id, pos,
         CASE WHEN pos > COALESCE(
                  LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) + {_SPAN_K}, -1)
              THEN 1 ELSE 0 END AS brk
  FROM cov
), isl AS (
  SELECT doc_id, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS span_id
  FROM mrk
), spans AS (
  SELECT doc_id, CAST(span_id AS BIGINT) AS span_id,
         CAST(MIN(pos) AS BIGINT) AS start_tok,
         CAST(MAX(pos) + {_SPAN_K} AS BIGINT) AS end_tok
  FROM isl GROUP BY doc_id, span_id
)"""


def d_dup_span_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated-substring spans per document (Lee et al. 2021
    ExactSubstr, k-gram formulation, k=3 to match the corpus' doc
    lengths): every token run covered by a k-gram that occurs more than
    once anywhere in the corpus, merged into maximal [start, end) spans.

    Plan shape (the scale story): one narrow explode to 64-bit positional
    gram hashes, one map-side-combinable occurrence count, one hash-keyed
    join back, one per-doc window pass for the interval merge. No pair
    join, no suffix array, no global sort."""
    d = load_table(spark, sf_dir, "documents", spread=True)
    return OD.dup_span_spans(d, "text", "doc_id", k=_SPAN_K).orderBy(
        "doc_id", "span_id"
    )


D_DUP_SPAN_DETECT_SQL = f"""
WITH {_D_SPAN_CTE}
SELECT doc_id, span_id, start_tok, end_tok,
       end_tok - start_tok AS span_tokens
FROM spans ORDER BY doc_id, span_id
"""


def d_dup_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The removal step: cut every duplicated span out of every document
    and rebuild the surviving text (normalized-token join, '' when the
    whole doc was duplicated mass). Every input doc appears exactly once
    — this is the operator a user points at a corpus, so the contract is
    total."""
    d = load_table(spark, sf_dir, "documents", spread=True)
    return OD.dup_span_scrub(d, "text", "doc_id", k=_SPAN_K).orderBy("doc_id")


D_DUP_SPAN_SCRUB_SQL = f"""
WITH {_D_SPAN_CTE}
, tk AS (
  SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, u.tok AS tok FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) + 1),
                                 i -> {{'pos': i - 1, 'tok': t[i]}})) AS u
    FROM toks
  )
), kept AS (
  SELECT tk.doc_id, tk.pos, tk.tok
  FROM tk LEFT JOIN spans s
    ON tk.doc_id = s.doc_id AND tk.pos >= s.start_tok AND tk.pos < s.end_tok
  WHERE s.doc_id IS NULL
), reb AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(len(t.t), 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(COALESCE(len(t.t), 0) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(r.clean_text, '') AS clean_text
FROM documents d
JOIN toks t ON d.doc_id = t.doc_id
LEFT JOIN reb r ON d.doc_id = r.doc_id
ORDER BY d.doc_id
"""


def d_dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health rollup of the span scrub per source: docs touched,
    token mass removed, and the removal percentage — the number Lee et
    al. headline ("% of tokens in duplicated 50-grams") computed from the
    ACTUAL merged spans rather than instance counts (cf. d_ngram_dup_mass,
    which reports instance mass without merging overlaps)."""
    # no scan-spread here (unlike detect/scrub): the stats row joins the
    # raw (doc_id, source) projection back against the scrub output, and
    # the A/B reads 0.78 s raw vs 0.85-1.45 s spread — the extra exchange
    # on the narrow join side costs more than the kernel gains.
    d = load_table(spark, sf_dir, "documents")
    scrub = OD.dup_span_scrub(d, "text", "doc_id", k=_SPAN_K)
    return (
        d.select("doc_id", "source")
        .join(scrub, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum((F.col("n_removed") > 0).cast("bigint")).alias("docs_affected"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("n_removed").cast("bigint").alias("removed_tokens"),
            F.round(
                F.sum("n_removed") * 100.0
                / F.greatest(F.sum("n_tokens"), F.lit(1)),
                4,
            ).alias("removed_pct"),
        )
        .orderBy("source")
    )


D_DUP_SPAN_STATS_SQL = f"""
WITH {_D_SPAN_CTE}
, per_doc AS (
  SELECT t.doc_id,
         COALESCE(len(t.t), 0) AS n_tokens,
         COALESCE(s.rm, 0) AS n_removed
  FROM toks t LEFT JOIN (
    SELECT doc_id, SUM(end_tok - start_tok) AS rm FROM spans GROUP BY doc_id
  ) s ON t.doc_id = s.doc_id
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN p.n_removed > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_affected,
       CAST(SUM(p.n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(p.n_removed) AS BIGINT) AS removed_tokens,
       ROUND(SUM(p.n_removed) * 100.0 / GREATEST(SUM(p.n_tokens), 1), 4)
         AS removed_pct
FROM documents d JOIN per_doc p ON d.doc_id = p.doc_id
GROUP BY d.source ORDER BY d.source
"""

QUERIES["d_dup_span_detect"] = d_dup_span_detect
ORACLE["d_dup_span_detect"] = D_DUP_SPAN_DETECT_SQL
QUERIES["d_dup_span_scrub"] = d_dup_span_scrub
ORACLE["d_dup_span_scrub"] = D_DUP_SPAN_SCRUB_SQL
QUERIES["d_dup_span_stats"] = d_dup_span_stats
ORACLE["d_dup_span_stats"] = D_DUP_SPAN_STATS_SQL


# ---------------------------------------------------------------------------
# Span dedup at PRODUCTION k (round 10, VERDICT r9 task 2). Lee et al. run
# ExactSubstr at k=50 TOKENS; the rows above pin k=3 because the synthetic
# corpus' docs are 30-70 tokens. These rows exercise the SAME operator at
# k=50 over a deterministic LONG-document corpus derived from `documents`:
#
#   * 40 long docs — doc_id % 40 groups of ~10 docs, bodies concatenated
#     in doc_id order (~300-600 tokens each);
#   * a shared ~150-token BOILERPLATE (texts of docs 1,3,5,7 concatenated)
#     appended to every EVEN group — genuine >= 50-token cross-doc runs,
#     the shape production span dedup actually removes (navigation chrome,
#     license blocks, templated footers);
#   * odd groups carry no boilerplate but CONTAIN docs 1,3,5,7 (they land
#     in odd groups by id % 40), so 50-gram runs inside those constituent
#     texts are duplicated across the even/odd boundary too — spans that
#     START mid-document, exercising the interval merge off the easy path.
#
# Semantics are k-independent by construction (the k=3 property test pins
# the algebra); what these rows add is the PRODUCTION COST SHAPE — 50-term
# gram concat hashing, ~50x wider covered-position overlap per duplicated
# run, and interval merges spanning hundreds of positions — value-verified
# against the same DuckDB replay.
# ---------------------------------------------------------------------------

_SPAN_K50 = 50
_LD_GROUPS = 40
_LD_MAX_ID = 400
_LD_BP_IDS = (1, 3, 5, 7)


def _long_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic long-document corpus (see section comment):
    (doc_id, text) with doc_id = the 0..39 group id."""
    # no scan-spread: the k50 family's gram hashing runs on the 40
    # POST-aggregation long docs, not on this scan — A/B flips sign run
    # to run (1.78/1.69, 1.35/1.61), i.e. pure session noise, so the
    # default (no exchange) stands.
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _LD_MAX_ID
    )

    def _cat():
        # doc_id-ordered concat: array_sort on (doc_id, text) structs sorts
        # by the unique id first, so the aggregation is order-deterministic
        # (same rule as the DuckDB string_agg ... ORDER BY doc_id mirror).
        return F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                lambda s: s["text"],
            ),
            " ",
        )

    body = (
        d.withColumn("g", F.col("doc_id") % _LD_GROUPS)
        .groupBy("g")
        .agg(_cat().alias("body"))
    )
    bp = d.filter(F.col("doc_id").isin(*_LD_BP_IDS)).agg(_cat().alias("bp"))
    return body.crossJoin(F.broadcast(bp)).select(
        F.col("g").cast("bigint").alias("doc_id"),
        F.when(
            F.col("g") % 2 == 0, F.concat_ws(" ", "body", "bp")
        )
        .otherwise(F.col("body"))
        .alias("text"),
    )


_LD_CTE = f"""
ld_base AS (
  SELECT doc_id % {_LD_GROUPS} AS g, doc_id, text
  FROM documents WHERE doc_id < {_LD_MAX_ID}
), ld_body AS (
  SELECT g, string_agg(text, ' ' ORDER BY doc_id) AS body
  FROM ld_base GROUP BY g
), ld_bp AS (
  SELECT string_agg(text, ' ' ORDER BY doc_id) AS bp
  FROM documents WHERE doc_id IN {_LD_BP_IDS}
), long_docs AS (
  SELECT CAST(g AS BIGINT) AS doc_id,
         CASE WHEN g % 2 = 0 THEN body || ' ' || (SELECT bp FROM ld_bp)
              ELSE body END AS text
  FROM ld_body
)"""


def _span_cte_k(k: int, src: str) -> str:
    """The span-detection CTE chain over ``src(doc_id, text)`` at width
    ``k`` — the parametrized form of ``_D_SPAN_CTE`` (same algebra,
    verified equal at k=3)."""
    return f"""
toks AS (
  SELECT doc_id, {OQ.sql_tokens(OQ.sql_norm('text'))} AS t FROM {src}
), inst AS (
  SELECT doc_id, CAST(unnest(range(0, len(t) - {k - 1})) AS BIGINT) AS pos, t
  FROM toks WHERE len(t) >= {k}
), hashed AS (
  SELECT doc_id, pos,
         {OQ.sql_md5_long(" || ' ' || ".join(f"t[pos + {j + 1}]" for j in range(k)))} AS h
  FROM inst
), dup AS (
  SELECT h FROM hashed GROUP BY h HAVING COUNT(*) > 1
), cov AS (
  SELECT doc_id, pos FROM hashed JOIN dup USING (h)
), mrk AS (
  SELECT doc_id, pos,
         CASE WHEN pos > COALESCE(
                  LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) + {k}, -1)
              THEN 1 ELSE 0 END AS brk
  FROM cov
), isl AS (
  SELECT doc_id, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS span_id
  FROM mrk
), spans AS (
  SELECT doc_id, CAST(span_id AS BIGINT) AS span_id,
         CAST(MIN(pos) AS BIGINT) AS start_tok,
         CAST(MAX(pos) + {k} AS BIGINT) AS end_tok
  FROM isl GROUP BY doc_id, span_id
)"""


def d_dup_span_detect_k50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated spans over the long-doc corpus at the Lee et
    al. production gram width k=50 — same operator, production run
    lengths (boilerplate spans are 150+ tokens; the merge folds ~100
    overlapping covered positions per run instead of ~1)."""
    return OD.dup_span_spans(
        _long_docs(spark, sf_dir), "text", "doc_id", k=_SPAN_K50
    ).orderBy("doc_id", "span_id")


D_DUP_SPAN_DETECT_K50_SQL = f"""
WITH {_LD_CTE}, {_span_cte_k(_SPAN_K50, "long_docs")}
SELECT doc_id, span_id, start_tok, end_tok,
       end_tok - start_tok AS span_tokens
FROM spans ORDER BY doc_id, span_id
"""


def d_dup_span_scrub_k50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k=50 removal step over the long-doc corpus: every long doc
    back with its boilerplate (and any other duplicated >= 50-token run)
    excised — the total-contract scrub at production width."""
    return OD.dup_span_scrub(
        _long_docs(spark, sf_dir), "text", "doc_id", k=_SPAN_K50
    ).orderBy("doc_id")


D_DUP_SPAN_SCRUB_K50_SQL = f"""
WITH {_LD_CTE}, {_span_cte_k(_SPAN_K50, "long_docs")}
, tk AS (
  SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, u.tok AS tok FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) + 1),
                                 i -> {{'pos': i - 1, 'tok': t[i]}})) AS u
    FROM toks
  )
), kept AS (
  SELECT tk.doc_id, tk.pos, tk.tok
  FROM tk LEFT JOIN spans s
    ON tk.doc_id = s.doc_id AND tk.pos >= s.start_tok AND tk.pos < s.end_tok
  WHERE s.doc_id IS NULL
), reb AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(len(t.t), 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(COALESCE(len(t.t), 0) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(r.clean_text, '') AS clean_text
FROM long_docs d
JOIN toks t ON d.doc_id = t.doc_id
LEFT JOIN reb r ON d.doc_id = r.doc_id
ORDER BY d.doc_id
"""

QUERIES["d_dup_span_detect_k50"] = d_dup_span_detect_k50
ORACLE["d_dup_span_detect_k50"] = D_DUP_SPAN_DETECT_K50_SQL
QUERIES["d_dup_span_scrub_k50"] = d_dup_span_scrub_k50
ORACLE["d_dup_span_scrub_k50"] = D_DUP_SPAN_SCRUB_K50_SQL


# ---------------------------------------------------------------------------
# Polynomial gram keys at k=50 (round 10): the md5 gram key hashes the
# CONCATENATED 50-token string per position — ~50x the corpus' hashing
# bytes. The poly variant md5-hashes each token ONCE and combines per
# position with a double Rabin-Karp polynomial (integer multiply-adds —
# see operators/dedup.py::_poly_gram_hashes for the collision stance).
# This row proves the production hashing path cross-engine: the oracle
# replays the per-token hash, both modular polynomials, the 62-bit key
# pairing, and the same merge — hash-exact.
# ---------------------------------------------------------------------------


def _span_cte_poly(k: int, src: str) -> str:
    """Span-detection CTE chain with POLYNOMIAL gram keys over
    ``src(doc_id, text)`` — mirrors _poly_gram_hashes exactly."""
    p1, p2 = OD.POLY_P1, OD.POLY_P2
    pw1, pw2 = OD._POLY_POW1, OD._POLY_POW2
    s1 = " + ".join(
        f"((th1[pos + {j + 1}] * {pw1[j]}) % {p1})" for j in range(k)
    )
    s2 = " + ".join(
        f"((th2[pos + {j + 1}] * {pw2[j]}) % {p2})" for j in range(k)
    )
    return f"""
toks AS (
  SELECT doc_id, {OQ.sql_tokens(OQ.sql_norm('text'))} AS t FROM {src}
), th AS (
  SELECT doc_id, t,
         list_transform(t, s -> {OQ.sql_md5_long('s')} % {p1}) AS th1,
         list_transform(t, s -> {OQ.sql_md5_long('s')} % {p2}) AS th2
  FROM toks
), inst AS (
  SELECT doc_id, CAST(unnest(range(0, len(t) - {k - 1})) AS BIGINT) AS pos,
         th1, th2
  FROM th WHERE len(t) >= {k}
), hashed AS (
  SELECT doc_id, pos,
         (({s1}) % {p1}) * {p2} + (({s2}) % {p2}) AS h
  FROM inst
), dup AS (
  SELECT h FROM hashed GROUP BY h HAVING COUNT(*) > 1
), cov AS (
  SELECT doc_id, pos FROM hashed JOIN dup USING (h)
), mrk AS (
  SELECT doc_id, pos,
         CASE WHEN pos > COALESCE(
                  LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) + {k}, -1)
              THEN 1 ELSE 0 END AS brk
  FROM cov
), isl AS (
  SELECT doc_id, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS span_id
  FROM mrk
), spans AS (
  SELECT doc_id, CAST(span_id AS BIGINT) AS span_id,
         CAST(MIN(pos) AS BIGINT) AS start_tok,
         CAST(MAX(pos) + {k} AS BIGINT) AS end_tok
  FROM isl GROUP BY doc_id, span_id
)"""


def d_dup_span_detect_k50_poly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=50 span detection with the O(n)-hashing polynomial gram key —
    same long-doc corpus and merge as d_dup_span_detect_k50; only the
    gram key recipe differs (per-token md5 + double polynomial instead
    of md5 over the 50-token concat)."""
    return OD.dup_span_spans(
        _long_docs(spark, sf_dir), "text", "doc_id", k=_SPAN_K50,
        gram_hash="poly",
    ).orderBy("doc_id", "span_id")


D_DUP_SPAN_DETECT_K50_POLY_SQL = f"""
WITH {_LD_CTE}, {_span_cte_poly(_SPAN_K50, "long_docs")}
SELECT doc_id, span_id, start_tok, end_tok,
       end_tok - start_tok AS span_tokens
FROM spans ORDER BY doc_id, span_id
"""

QUERIES["d_dup_span_detect_k50_poly"] = d_dup_span_detect_k50_poly
ORACLE["d_dup_span_detect_k50_poly"] = D_DUP_SPAN_DETECT_K50_POLY_SQL
