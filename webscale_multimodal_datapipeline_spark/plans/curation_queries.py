"""Round-2 curation queries: sequence packing, boilerplate detection,
stratified sampling, quantile filtering, URL canonicalization, cross-modal
join scoring, vocabulary extraction.

These extend the training-data-pipeline operator set (VERDICT r1 grades
these as first-class alongside SURVEY §2). Every query has an exact DuckDB
oracle; shared constants are imported from the operator modules so the two
engines can never drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webscale_multimodal_datapipeline_spark.catalog import load_table
from webscale_multimodal_datapipeline_spark.functions import text as TX
from webscale_multimodal_datapipeline_spark.functions import urls as URLS
from webscale_multimodal_datapipeline_spark.functions import vectors as VX
from webscale_multimodal_datapipeline_spark.operators import curation as CU
from webscale_multimodal_datapipeline_spark.plans import oracle_fragments as OQ

# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------


def c_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sequence rollup of the packed corpus: how many docs and tokens
    landed in each (bucket, seq) training sequence."""
    d = load_table(spark, sf_dir, "documents")
    packed = CU.sequence_pack(d)
    return packed.groupBy("pack_bucket", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("seq_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


def _sql_pack_bucket() -> str:
    return f"{OQ.sql_md5_long('CAST(doc_id AS VARCHAR)')} % {CU.PACK_BUCKETS}"


C_PACK_SQL = f"""
WITH t AS (
  SELECT doc_id,
         {_sql_pack_bucket()} AS pack_bucket,
         CAST({OQ.sql_token_count('text')} AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, pack_bucket, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY pack_bucket ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT pack_bucket,
       CAST(floor((cum - n_tokens) / {CU.PACK_BUDGET}) AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
       MIN(doc_id) AS first_doc
FROM c GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Boilerplate (shingle document-frequency) stats
# ---------------------------------------------------------------------------


def c_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc boilerplate ratio + keep flag (CCNet-style repeated-content
    heuristic over word shingles)."""
    d = load_table(spark, sf_dir, "documents")
    stats = CU.boilerplate_stats(d)
    return stats.select(
        "doc_id",
        "n_shingles",
        "n_common",
        F.col("boiler_ratio").cast("double").alias("boiler_ratio"),
        (F.col("boiler_ratio") <= CU.BOILER_MAX_RATIO).alias("keep"),
    )


C_BOILER_SQL = f"""
WITH t AS (
  SELECT doc_id, {OQ.sql_tokens(OQ.sql_norm('text'))} AS tk FROM documents
), s AS (
  SELECT doc_id, {OQ.sql_shingles_from_tokens('tk', CU.BOILER_K)} AS sh FROM t
), e AS (
  SELECT doc_id, unnest(sh) AS shingle FROM s
), common AS (
  SELECT shingle FROM e GROUP BY shingle HAVING COUNT(*) >= {CU.BOILER_MIN_DF}
), pd AS (
  SELECT e.doc_id, COUNT(*) AS n_common
  FROM e JOIN common USING (shingle) GROUP BY e.doc_id
)
SELECT s.doc_id,
       CAST(len(s.sh) AS BIGINT) AS n_shingles,
       CAST(COALESCE(pd.n_common, 0) AS BIGINT) AS n_common,
       CAST(COALESCE(pd.n_common, 0) AS DOUBLE) / len(s.sh) AS boiler_ratio,
       (CAST(COALESCE(pd.n_common, 0) AS DOUBLE) / len(s.sh)) <= {CU.BOILER_MAX_RATIO} AS keep
FROM s LEFT JOIN pd USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Stratified sampling / quantile filtering
# ---------------------------------------------------------------------------

SAMPLE_PER_STRATUM = 30
QUANTILE_KEEP_FRAC = 0.2


def c_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    out = CU.stratified_sample(d, n_per_stratum=SAMPLE_PER_STRATUM)
    return out.select("doc_id", "lang", "sample_rank")


C_SAMPLE_SQL = f"""
SELECT doc_id, lang, CAST(sample_rank AS BIGINT) AS sample_rank FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY {OQ.sql_md5_long('CAST(doc_id AS VARCHAR)')}, doc_id
         ) AS sample_rank
  FROM documents
) WHERE sample_rank <= {SAMPLE_PER_STRATUM}
"""


def c_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 20% by quality score within each language (exact rank form;
    the approx-threshold form is ``CU.quantile_threshold_filter`` — the
    100 TB path, sketch-error tolerant so not the oracle spec)."""
    d = load_table(spark, sf_dir, "documents")
    out = CU.quantile_filter(
        d, TX.quality_score("text").cast("double"), keep_frac=QUANTILE_KEEP_FRAC
    )
    return out.select("doc_id", "lang", F.col("score").cast("double").alias("score"))


C_QUANTILE_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, CAST({OQ.sql_quality_score('text')} AS DOUBLE) AS score
  FROM documents
), r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score DESC, doc_id) AS rnk,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM t
)
SELECT doc_id, lang, score FROM r WHERE rnk <= CEIL(n * {QUANTILE_KEEP_FRAC})
"""


# ---------------------------------------------------------------------------
# URL canonicalization + canonical-key dedup
# ---------------------------------------------------------------------------

# Deterministic messy URL per doc: mixed-case scheme/host, default port,
# path-dupe modulus, trailing slash, tracking params, fragment — exercises
# every canonicalization rule; both engines build the identical string.
_URL_PATH_MOD = 40

_SPARK_MESSY = None  # built in _with_messy_url


def _with_messy_url(d: DataFrame) -> DataFrame:
    host = F.concat(F.lit("www."), F.col("source"), F.lit(".example.com"))
    return d.withColumn(
        "url",
        F.concat(
            F.when(F.col("doc_id") % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("https")),
            F.lit("://"),
            F.when(F.col("doc_id") % 3 == 0, F.upper(host)).otherwise(host),
            F.when(F.col("doc_id") % 4 == 0, F.lit(":443")).otherwise(F.lit("")),
            F.lit("/page/"),
            (F.col("doc_id") % _URL_PATH_MOD).cast("string"),
            F.when(F.col("doc_id") % 5 == 0, F.lit("/")).otherwise(F.lit("")),
            F.lit("?utm_source=feed&b=2&ref=abc&a=1"),
            F.when(F.col("doc_id") % 7 == 0, F.lit("#frag")).otherwise(F.lit("")),
        ),
    )


# || not concat(): DuckDB concat() ignores NULL args; Spark propagates —
# a NULL source must yield a NULL messy URL in both engines
_SQL_MESSY = f"""(
  CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END || '://' ||
  CASE WHEN doc_id % 3 = 0 THEN upper('www.' || source || '.example.com')
       ELSE 'www.' || source || '.example.com' END ||
  CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END ||
  '/page/' || CAST(doc_id % {_URL_PATH_MOD} AS VARCHAR) ||
  CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END ||
  '?utm_source=feed&b=2&ref=abc&a=1' ||
  CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END)"""

# DuckDB mirror of functions/urls.py (token-for-token)
_SQL_CANON = """(
  lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) || '://' ||
  lower(regexp_replace(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1), ':(443|80)$', '')) ||
  regexp_replace(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1), '/$', '') ||
  (CASE WHEN array_to_string(list_sort(list_filter(string_split(regexp_extract(u, '\\?([^#]*)', 1), '&'),
        p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|ref)='))), '&') <> ''
        THEN '?' || array_to_string(list_sort(list_filter(string_split(regexp_extract(u, '\\?([^#]*)', 1), '&'),
        p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|ref)='))), '&')
        ELSE '' END)
)"""


def u_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _with_messy_url(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id", "url", URLS.canonical_url("url").alias("canonical")
    )


U_CANON_SQL = f"""
SELECT doc_id, u AS url, {_SQL_CANON} AS canonical
FROM (SELECT doc_id, {_SQL_MESSY} AS u FROM documents)
"""


def u_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup on the canonical key: keeper = min doc_id, with the
    duplicate count per canonical URL (web-crawl re-fetch collapse)."""
    d = _with_messy_url(load_table(spark, sf_dir, "documents"))
    return (
        d.withColumn("canonical", URLS.canonical_url("url"))
        .groupBy("canonical")
        .agg(
            F.min("doc_id").alias("keeper"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


U_CANON_DEDUP_SQL = f"""
SELECT {_SQL_CANON} AS canonical, MIN(doc_id) AS keeper, COUNT(*) AS n_dups
FROM (SELECT doc_id, {_SQL_MESSY} AS u FROM documents)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Cross-modal join + embedding-score filter
# ---------------------------------------------------------------------------

CROSSMODAL_DIM = 64
# Deterministic "CLIP text anchor" direction — same Knuth-mix construction
# as the MLP heads (functions/vectors.py), materialized identically by both
# engines, so no weights file is needed.
CROSSMODAL_REF = [
    ((i * 2654435761 + 12345) % 2001 - 1000) / 1000.0 for i in range(CROSSMODAL_DIM)
]


def v_crossmodal_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ⋈ embeddings (doc_id = vec_id) scored against a reference
    direction; keep positive alignment. The join is key-equi on the shared
    id — at scale both sides co-partition on the id (bucketed layout), so
    this is a zero-extra-shuffle sort-merge join; the scoring is a codegen'd
    fold, no UDF."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    e = load_table(spark, sf_dir, "embeddings")
    ref = F.array(*[F.lit(float(x)) for x in CROSSMODAL_REF])
    prods = F.zip_with(
        VX.to_double_array("embedding"), ref, lambda x, y: x * y
    )
    score = F.aggregate(prods, F.lit(0.0), lambda a, x: a + x)
    return (
        d.join(e, d.doc_id == e.vec_id)
        .withColumn("score", score)
        .filter(F.col("score") > 0)
        .select("doc_id", "lang", "label", "score")
    )


_SQL_XMODAL_DOT = "(" + " + ".join(
    f"embedding[{i + 1}]::DOUBLE * {float(c)!r}" for i, c in enumerate(CROSSMODAL_REF)
) + ")"

V_CROSSMODAL_SQL = f"""
SELECT doc_id, lang, label, score FROM (
  SELECT d.doc_id, d.lang, e.label, {_SQL_XMODAL_DOT} AS score
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
) WHERE score > 0
"""


# ---------------------------------------------------------------------------
# Vocabulary extraction (global top-k tokens)
# ---------------------------------------------------------------------------

VOCAB_TOP_K = 50


def c_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-k tokens by frequency (count desc, token asc
    — a total order, so the top-k set is unique). Partial aggregation
    map-side; the final top-k is TakeOrderedAndProject over the (small)
    aggregated vocab, never a global row sort."""
    d = load_table(spark, sf_dir, "documents")
    toks = TX.norm_tokens(F.col("text"))
    return (
        d.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "token")
        .limit(VOCAB_TOP_K)
    )


C_VOCAB_SQL = f"""
SELECT token, COUNT(*) AS cnt
FROM (SELECT unnest({OQ.sql_tokens(OQ.sql_norm('text'))}) AS token FROM documents)
GROUP BY token ORDER BY cnt DESC, token LIMIT {VOCAB_TOP_K}
"""


QUERIES = {
    "c_sequence_pack": c_sequence_pack,
    "c_boilerplate": c_boilerplate,
    "c_stratified_sample": c_stratified_sample,
    "c_quantile_filter": c_quantile_filter,
    "u_url_canonicalize": u_url_canonicalize,
    "u_canonical_dedup": u_canonical_dedup,
    "v_crossmodal_filter": v_crossmodal_filter,
    "c_vocab_topk": c_vocab_topk,
}

ORACLE = {
    "c_sequence_pack": C_PACK_SQL,
    "c_boilerplate": C_BOILER_SQL,
    "c_stratified_sample": C_SAMPLE_SQL,
    "c_quantile_filter": C_QUANTILE_SQL,
    "u_url_canonicalize": U_CANON_SQL,
    "u_canonical_dedup": U_CANON_DEDUP_SQL,
    "v_crossmodal_filter": V_CROSSMODAL_SQL,
    "c_vocab_topk": C_VOCAB_SQL,
}


# ---------------------------------------------------------------------------
# Duplicate-line removal (CCNet paragraph-hash / RefinedWeb line dedup)
# ---------------------------------------------------------------------------

# The fixture corpus has no newlines, so the query materializes a "lined"
# view first: a line break after every 3rd word (non-overlapping regex
# replace, identical left-to-right semantics in Java regex and RE2).
_LINE_RE_SPARK = r"(\S+ \S+ \S+) "


def c_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-line removal over a line-structured view
    of documents: any 3-word line occurring in >= 2 distinct docs is
    scrubbed; docs are rebuilt in original line order."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "text", F.regexp_replace("text", _LINE_RE_SPARK, "$1\n")
    )
    out = CU.duplicate_line_removal(d)
    return out.select(
        "doc_id",
        "source",
        "n_lines",
        "n_removed",
        F.md5("text").alias("text_md5"),
        F.length("text").cast("bigint").alias("new_len"),
    )


C_LINE_DEDUP_SQL = r"""
WITH lined AS (
  SELECT doc_id, source,
         regexp_replace(text, '(\S+ \S+ \S+) ', '\1' || chr(10), 'g') AS text
  FROM documents
), lines AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1) AS pos
  FROM lined
), keyed AS (
  SELECT doc_id, pos, line, lower(trim(line)) AS k FROM lines
), dup_keys AS (
  SELECT k FROM (SELECT k, COUNT(DISTINCT doc_id) AS df FROM keyed GROUP BY k)
  WHERE df >= 2
), kept AS (
  SELECT doc_id, pos, line FROM keyed WHERE k NOT IN (SELECT k FROM dup_keys)
), rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS new_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT l.doc_id, l.source,
       CAST(len(string_split(l.text, chr(10))) AS BIGINT) AS n_lines,
       CAST(len(string_split(l.text, chr(10))) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed,
       md5(COALESCE(r.new_text, '')) AS text_md5,
       CAST(length(COALESCE(r.new_text, '')) AS BIGINT) AS new_len
FROM lined l LEFT JOIN rebuilt r ON l.doc_id = r.doc_id
"""

QUERIES["c_line_dedup"] = c_line_dedup
ORACLE["c_line_dedup"] = C_LINE_DEDUP_SQL


# ---------------------------------------------------------------------------
# Merge / upsert (CDC delta application)
# ---------------------------------------------------------------------------


def c_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC-style delta to orders: every key % 97 == 0 is an update
    (price bump), every key % 193 == 0 arrives as a brand-new order id.
    Returns a per-status rollup of the merged table (count + exact decimal
    price sum) so the oracle pins both match arms and the insert arm."""
    o = load_table(spark, sf_dir, "orders")
    updates = o.filter(F.col("o_orderkey") % 97 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 1.1
    )
    inserts = o.filter(F.col("o_orderkey") % 193 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(1_000_000_000)
    )
    merged = CU.merge_upsert(o, updates.unionByName(inserts), "o_orderkey")
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 4)
        .cast("double")
        .alias("total_price"),
        F.max("o_orderkey").alias("max_key"),
    )


C_UPSERT_SQL = """
WITH delta AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 1.1 AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 97 = 0
  UNION ALL
  SELECT o_orderkey + 1000000000, o_custkey, o_orderstatus, o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 193 = 0
), merged AS (
  -- matched-flag row pick (UPDATE SET *): a matched delta row wins
  -- WHOLESALE, so delta NULLs overwrite base values — mirrors
  -- operators/curation.py::merge_upsert
  SELECT CASE WHEN d.o_orderkey IS NOT NULL THEN d.o_orderkey ELSE b.o_orderkey END AS o_orderkey,
         CASE WHEN d.o_orderkey IS NOT NULL THEN d.o_orderstatus ELSE b.o_orderstatus END AS o_orderstatus,
         CASE WHEN d.o_orderkey IS NOT NULL THEN d.o_totalprice ELSE b.o_totalprice END AS o_totalprice
  FROM orders b FULL OUTER JOIN delta d ON b.o_orderkey = d.o_orderkey
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_price,
       MAX(o_orderkey) AS max_key
FROM merged GROUP BY o_orderstatus
"""

QUERIES["c_upsert"] = c_upsert
ORACLE["c_upsert"] = C_UPSERT_SQL


# ---------------------------------------------------------------------------
# Curriculum export: deterministic shards, quality-ordered within shard
# ---------------------------------------------------------------------------

_CURR_SHARDS = 8


def c_curriculum_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-ordered training export: every doc lands in a
    deterministic hash shard (reproducible across runs and cluster
    sizes — the property a resumable 100-TB export needs), and within a
    shard docs are ordered easy-to-hard by token count. Returns the
    per-shard manifest a trainer consumes: doc count, token budget, the
    easiest/hardest doc ids (exact argmin/argmax, no window sort).

    Scale shape: ONE map-side-combinable aggregate over the corpus;
    shard assignment is pure hashing (no shuffle beyond the bounded
    8-shard rollup); the within-shard ORDER BY is delegated to the
    writer's sortWithinPartitions at export time and captured here by
    the argmin/argmax endpoints (min_by/max_by — SURVEY x_argmax_agg
    precedent)."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "_ntok", TX.token_count("text")
    )
    shard = F.pmod(TX.md5_long(F.col("text")), F.lit(_CURR_SHARDS))
    # all-integer ordering key: tokens first, doc_id breaks ties (negated
    # so min_by/max_by tie-break on the LOWEST id in both directions)
    ord_key = F.col("_ntok") * F.lit(10_000_000_000) - F.col("doc_id")
    return (
        d.withColumn("shard", shard)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_ntok").alias("n_tokens"),
            F.min_by("doc_id", ord_key).alias("easiest_doc"),
            F.max_by("doc_id", ord_key).alias("hardest_doc"),
        )
    )


C_CURRICULUM_SQL = f"""
WITH scored AS (
  SELECT doc_id, {OQ.sql_token_count('text')} AS ntok,
         {OQ.sql_md5_long('text')} % {_CURR_SHARDS} AS m
  FROM documents
)
SELECT CASE WHEN m < 0 THEN m + {_CURR_SHARDS} ELSE m END AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ntok) AS BIGINT) AS n_tokens,
       arg_min(doc_id, ntok * 10000000000 - doc_id) AS easiest_doc,
       arg_max(doc_id, ntok * 10000000000 - doc_id) AS hardest_doc
FROM scored
GROUP BY 1
"""

QUERIES["c_curriculum_export"] = c_curriculum_export
ORACLE["c_curriculum_export"] = C_CURRICULUM_SQL


# ---------------------------------------------------------------------------
# Cross-source score calibration
# ---------------------------------------------------------------------------


def c_score_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source score calibration: raw quality scores are not
    comparable across sources (each crawl/source has its own score
    distribution), so a global threshold over raw scores over- or
    under-selects entire sources. The fix every mixed-corpus pipeline
    applies: replace the raw score with its WITHIN-SOURCE rank bucket
    (here deciles via ``(row_number-1)*10 div n`` — the exact-integer
    stand-in for percent_rank, whose (rank-1)/(n-1) float would need
    identical division trees in both engines), making one global cutoff
    mean "top X% of each source".

    Scale shape: one window sort per source partition — the same
    exchange the per-source quantile filter already pays; no global
    sort, no driver percentiles. Output: per (source, calibrated-decile)
    counts (bounded |sources| × 10) + each source's raw-score spread, the
    audit that shows WHY calibration is needed."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    score = F.round(TX.quality_score("text").cast("double"), 9)
    ws = W.partitionBy("source").orderBy(F.asc("score"), F.asc("doc_id"))
    scored = d.select("doc_id", "source", score.alias("score"))
    ranked = scored.withColumn("rnk", F.row_number().over(ws)).withColumn(
        "n", F.count(F.lit(1)).over(W.partitionBy("source"))
    )
    caldec = F.least(F.expr("(rnk - 1) * 10 div n"), F.lit(9))
    return (
        ranked.groupBy("source", caldec.alias("cal_decile"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.min("score"), 6).alias("decile_min_score"),
            F.round(F.max("score"), 6).alias("decile_max_score"),
        )
        .orderBy("source", "cal_decile")
    )


C_SCORE_NORM_SQL = f"""
WITH scored AS (
  SELECT doc_id, source,
         ROUND(CAST({OQ.sql_quality_score('text')} AS DOUBLE), 9) AS score
  FROM documents
), ranked AS (
  SELECT source, score,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY score ASC, doc_id ASC) AS rnk,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM scored
)
SELECT source,
       LEAST((rnk - 1) * 10 // n, 9) AS cal_decile,
       COUNT(*) AS n_docs,
       ROUND(MIN(score), 6) AS decile_min_score,
       ROUND(MAX(score), 6) AS decile_max_score
FROM ranked GROUP BY source, LEAST((rnk - 1) * 10 // n, 9)
ORDER BY source, cal_decile
"""

QUERIES["c_score_normalize"] = c_score_normalize
ORACLE["c_score_normalize"] = C_SCORE_NORM_SQL


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle
# ---------------------------------------------------------------------------

_EPOCHS = 3
_EPOCH_HEAD = 5


def c_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch reshuffle — the data-order contract of
    multi-epoch training: every epoch visits every document exactly once
    in an order that (a) differs between epochs, (b) is reproducible
    across runs and cluster sizes, and (c) needs no materialized
    permutation table. Order key = md5(doc_id ‖ epoch) — the
    ``t_dataset_split`` / ``c_curriculum_export`` hash-assignment rule
    applied to ordering.

    Scale shape: emitting an epoch is ONE range-partitioned sort by the
    hash key (what ``orderBy`` compiles to — no global single-task
    sort); nothing is stored per epoch because the permutation is a pure
    function. The query pins the contract by emitting the first
    ``_EPOCH_HEAD`` docs of each epoch plus a per-epoch checksum over
    ALL positions (catches any divergence beyond the head)."""
    d = load_table(spark, sf_dir, "documents")
    epochs = []
    for ep in range(_EPOCHS):
        key = TX.md5_long(F.concat(F.col("doc_id").cast("string"), F.lit(f"#ep{ep}")))
        ranked = d.select(
            F.lit(ep).alias("epoch"),
            "doc_id",
            key.alias("k"),
        )
        head = (
            ranked.orderBy("k", "doc_id")
            .limit(_EPOCH_HEAD)
            .select("epoch", "doc_id", F.lit("head").alias("part"))
        )
        chk = ranked.agg(
            F.max("epoch").alias("epoch"),
            F.sum(F.col("k") % 1_000_003).alias("doc_id"),
        ).select("epoch", "doc_id", F.lit("checksum").alias("part"))
        epochs.extend([head, chk])
    out = epochs[0]
    for x in epochs[1:]:
        out = out.unionByName(x)
    return out.orderBy("epoch", "part", "doc_id")


def _epoch_arm(ep: int) -> str:
    key = OQ.sql_md5_long(f"concat(doc_id, '#ep{ep}')")
    return f"""SELECT * FROM (
  SELECT {ep} AS epoch, doc_id, 'head' AS part
  FROM documents ORDER BY {key}, doc_id LIMIT {_EPOCH_HEAD}
)
UNION ALL
SELECT {ep} AS epoch, CAST(SUM({key} % 1000003) AS BIGINT) AS doc_id,
       'checksum' AS part
FROM documents"""


C_EPOCH_SQL = (
    "\nUNION ALL\n".join(_epoch_arm(ep) for ep in range(_EPOCHS))
    + "\nORDER BY epoch, part, doc_id"
)

QUERIES["c_epoch_shuffle"] = c_epoch_shuffle
ORACLE["c_epoch_shuffle"] = C_EPOCH_SQL


# ---------------------------------------------------------------------------
# Tokenizer fertility audit
# ---------------------------------------------------------------------------


def c_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language — tokens-per-100-chars and
    chars-per-token, the efficiency audit run before committing a
    tokenizer to a multilingual corpus (high fertility on a language
    means its share of the TOKEN budget exceeds its share of the TEXT —
    the compute-allocation skew the Aya/BLOOM reports document).

    Whitespace tokens stand in for the trained tokenizer (the engine's
    token-count convention); ratios are exact integer scalings (ppm and
    per-100-chars), one map-side-combinable rollup per language."""
    d = load_table(spark, sf_dir, "documents")
    toks = TX.token_count("text")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(toks).alias("total_tokens"),
            F.sum(F.length("text")).alias("total_chars"),
        )
        .withColumn(
            "tokens_per_100_chars",
            # zero/NULL-token language groups: ratio undefined -> NULL in
            # both engines (bare integer div raises under ANSI mode)
            F.expr(
                "CASE WHEN total_chars <> 0"
                " THEN total_tokens * 100 div total_chars END"
            ),
        )
        .withColumn(
            "chars_per_token_milli",
            F.expr(
                "CASE WHEN total_tokens <> 0"
                " THEN total_chars * 1000 div total_tokens END"
            ),
        )
        .orderBy("lang")
    )


C_FERTILITY_SQL = f"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM({OQ.sql_token_count('text')}) AS BIGINT) AS total_tokens,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(CASE WHEN SUM(length(text)) <> 0
                 THEN SUM({OQ.sql_token_count('text')}) * 100
                      // SUM(length(text)) END AS BIGINT) AS tokens_per_100_chars,
       CAST(CASE WHEN SUM({OQ.sql_token_count('text')}) <> 0
                 THEN SUM(length(text)) * 1000
                      // SUM({OQ.sql_token_count('text')}) END AS BIGINT)
         AS chars_per_token_milli
FROM documents GROUP BY lang ORDER BY lang
"""

QUERIES["c_tokenizer_fertility"] = c_tokenizer_fertility
ORACLE["c_tokenizer_fertility"] = C_FERTILITY_SQL


# ---------------------------------------------------------------------------
# Length-bucketed batching: padding-waste accounting
# ---------------------------------------------------------------------------

_LBB_BUCKET = 64
_LBB_BATCH = 8


def c_length_bucket_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste accounting for length-bucketed batching — the
    standard training-loader trick (bucket by length, batch within
    bucket, pad to the batch max) quantified per bucket: how many pad
    characters does each length bucket cost, in exact ppm of the padded
    volume? The table is what you read to pick bucket/batch widths
    before exporting (``c_curriculum_export`` orders; this sizes).

    Batches are deterministic: within a bucket, docs are ordered by
    (n_chars DESC, doc_id) and cut into fixed runs of ``_LBB_BATCH``;
    descending order makes each batch max its FIRST element, which is
    how bucketed loaders minimize within-batch spread. Padded volume =
    Σ_batches batch_count·batch_max (partial tail batches pay only
    their own count). All integers; one ``div`` at the end.

    Scale shape: row-local bucket key, ONE window pass per bucket
    (hash-distributed — buckets are the partition key, same shape as
    ``x_weighted_median``), per-batch rollup, bounded per-bucket output.
    """
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    bucketed = d.select(
        "doc_id",
        "n_chars",
        (F.col("n_chars") / _LBB_BUCKET).cast("long").alias("bucket"),
    )
    w = W.partitionBy("bucket").orderBy(F.desc("n_chars"), "doc_id")
    batches = (
        bucketed.withColumn(
            "batch", ((F.row_number().over(w) - 1) / _LBB_BATCH).cast("long")
        )
        .groupBy("bucket", "batch")
        .agg(
            F.count(F.lit(1)).alias("bn"),
            F.max("n_chars").alias("bmax"),
            F.sum("n_chars").alias("bsum"),
        )
    )
    return (
        batches.groupBy("bucket")
        .agg(
            F.sum("bn").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_batches"),
            F.sum("bsum").cast("bigint").alias("total_chars"),
            F.sum(F.col("bn") * F.col("bmax")).cast("bigint").alias("padded_chars"),
        )
        .select(
            "bucket",
            "n_docs",
            "n_batches",
            "total_chars",
            "padded_chars",
            F.expr(
                "(padded_chars - total_chars) * 1000000 div padded_chars"
            ).alias("waste_ppm"),
        )
        .orderBy("bucket")
    )


C_LBB_SQL = f"""
WITH bucketed AS (
  SELECT doc_id, n_chars, CAST(n_chars // {_LBB_BUCKET} AS BIGINT) AS bucket
  FROM documents
), numbered AS (
  SELECT bucket, n_chars,
         CAST((ROW_NUMBER() OVER (PARTITION BY bucket
                                  ORDER BY n_chars DESC, doc_id) - 1)
              // {_LBB_BATCH} AS BIGINT) AS batch
  FROM bucketed
), batches AS (
  SELECT bucket, batch, COUNT(*) AS bn, MAX(n_chars) AS bmax,
         SUM(n_chars) AS bsum
  FROM numbered GROUP BY bucket, batch
)
SELECT bucket, CAST(SUM(bn) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_batches,
       CAST(SUM(bsum) AS BIGINT) AS total_chars,
       CAST(SUM(bn * bmax) AS BIGINT) AS padded_chars,
       CAST((SUM(bn * bmax) - SUM(bsum)) * 1000000 // SUM(bn * bmax) AS BIGINT)
         AS waste_ppm
FROM batches GROUP BY bucket
ORDER BY bucket
"""

QUERIES["c_length_bucket_batching"] = c_length_bucket_batching
ORACLE["c_length_bucket_batching"] = C_LBB_SQL


def c_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency audit of the sequence packer: per pack bucket,
    how many training sequences were produced, the fill rate against the
    token budget (tokens / (n_seqs · budget)) and how many sequences
    overflow the budget (a doc whose start offset lands near the seq
    boundary runs past it — the concat-then-split packer's known cost,
    vs. the padding waste a first-fit packer trades it for). This is
    the one-screen answer to "how much compute does our packing waste?".

    All-integer rollups over the existing packed layout; one double
    division per bucket row."""
    d = load_table(spark, sf_dir, "documents")
    packed = CU.sequence_pack(d)
    seqs = packed.groupBy("pack_bucket", "seq_id").agg(
        F.sum("n_tokens").alias("seq_tokens")
    )
    return (
        seqs.groupBy("pack_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_seqs"),
            F.sum("seq_tokens").cast("long").alias("total_tokens"),
            F.sum(F.when(F.col("seq_tokens") > CU.PACK_BUDGET, 1).otherwise(0))
            .cast("long")
            .alias("n_overflow_seqs"),
        )
        .select(
            F.col("pack_bucket").cast("bigint").alias("pack_bucket"),
            "n_seqs",
            "total_tokens",
            F.round(
                F.col("total_tokens").cast("double")
                / (F.col("n_seqs").cast("double") * float(CU.PACK_BUDGET)),
                6,
            ).alias("fill_rate"),
            "n_overflow_seqs",
        )
        .orderBy("pack_bucket")
    )


C_PACK_EFF_SQL = f"""
WITH t AS (
  SELECT doc_id,
         {_sql_pack_bucket()} AS pack_bucket,
         CAST({OQ.sql_token_count('text')} AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, pack_bucket, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY pack_bucket ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
), seqs AS (
  SELECT pack_bucket,
         CAST(floor((cum - n_tokens) / {CU.PACK_BUDGET}) AS BIGINT) AS seq_id,
         SUM(n_tokens) AS seq_tokens
  FROM c GROUP BY 1, 2
)
SELECT CAST(pack_bucket AS BIGINT) AS pack_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_seqs,
       CAST(SUM(seq_tokens) AS BIGINT) AS total_tokens,
       ROUND(CAST(SUM(seq_tokens) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * {float(CU.PACK_BUDGET)}), 6) AS fill_rate,
       CAST(COUNT(*) FILTER (WHERE seq_tokens > {CU.PACK_BUDGET}) AS BIGINT) AS n_overflow_seqs
FROM seqs GROUP BY 1 ORDER BY 1
"""

QUERIES["c_pack_efficiency"] = c_pack_efficiency
ORACLE["c_pack_efficiency"] = C_PACK_EFF_SQL
