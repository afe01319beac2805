"""Reproducible sampling, sharding and mixture weighting (SURVEY.md
§2.11 — the training-data assembly stages after cleaning/dedup).

Everything here is HASH-BASED, never rand(): a production corpus job
must give the same sample/shard on re-run, across engines, after task
retries, and when the corpus is re-partitioned — properties only a
content-derived hash has. ``rand(seed)`` is none of those (Spark seeds
per-partition; a repartition reshuffles the sample). md5 is used as the
selector because it is cross-engine specified (see fx_hash); the cost
is one digest per row inside codegen.

* ``llm_sample_hash``  — stratified deterministic p% sample: keep a doc
  iff the first 4 digest bytes, read as an integer, fall under p * 2^32.
  Selection is per-document content-stable; strata just partition the
  report.
* ``llm_shard``        — assign every doc to one of N training shards
  by digest modulo; shard sizes stay within binomial noise of N^-1 and
  the assignment survives arbitrary re-partitioning.
* ``llm_mix_weights``  — per-(lang, source) token counts -> the sampling
  weight that makes the mixture uniform across langs (target share /
  actual share); the one-aggregate form of "data mixing" recipes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import spec

SAMPLE_CUT = 51  # of 256: ~19.9% kept
N_SHARDS = 8

#: uniform variate in [0, 256): the first two md5 hex digits, decoded
#: via position lookup — string ops only, because hex->integer casts are
#: NOT portable (DuckDB's from_hex yields a BLOB with no integer cast;
#: Spark's conv() has no DuckDB twin). strpos/instr exist in both.
_HEX = "0123456789abcdef"


def _hash_u8() -> F.Column:
    h = F.md5(F.col("doc_id").cast("string"))
    hi = F.instr(F.lit(_HEX), F.substring(h, 1, 1)) - 1
    lo = F.instr(F.lit(_HEX), F.substring(h, 2, 1)) - 1
    return hi * 16 + lo


def llm_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~20% sample, reported per language stratum."""
    d = table(spark, sf_dir, "documents")
    kept = d.filter(_hash_u8() < F.lit(SAMPLE_CUT))
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


_ORACLE_HASH_U8 = (
    "((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)"
)

ORACLE_LLM_SAMPLE_HASH = f"""
SELECT
  lang,
  COUNT(*) AS n_sampled,
  MIN(doc_id) AS min_doc,
  MAX(doc_id) AS max_doc
FROM documents
WHERE {_ORACLE_HASH_U8} < 51
GROUP BY lang
"""


def llm_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-sharding for training-file assembly: shard id + size audit.

    In production the next step is ``write.partitionBy(shard)`` (or
    repartition(shard) -> one file per shard); here the registered form
    is the audit query proving the assignment is balanced and stable.
    """
    d = table(spark, sf_dir, "documents")
    shard = F.pmod(_hash_u8(), F.lit(N_SHARDS)).cast("long").alias("shard")
    return (
        d.select(shard, "n_chars")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )
    )


ORACLE_LLM_SHARD = f"""
SELECT
  {_ORACLE_HASH_U8} % 8 AS shard,
  COUNT(*) AS n_docs,
  -- CAST: DuckDB SUM(BIGINT) is HUGEINT -> pandas float64 vs Spark int64
  CAST(SUM(n_chars) AS BIGINT) AS n_chars
FROM documents
GROUP BY 1
"""


def llm_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture reweighting: the per-language sampling weight that makes
    the token mixture uniform across languages.

    weight(lang) = target_share / actual_share, with shares in exact
    integer token counts (whitespace tokens, the llm_token_count
    definition) — so the division is the only float op and both engines
    compute it from identical integers. Rounded to 6 for the boundary
    discipline. At 100 TB this is one mergeable aggregate over the
    corpus; the weights then drive llm_sample_hash-style thresholds per
    stratum.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "lang", F.size(F.split("text", " ")).alias("n_tok")
    )
    per_lang = toks.groupBy("lang").agg(F.sum("n_tok").alias("lang_toks"))
    total = per_lang.agg(
        F.sum("lang_toks").alias("total_toks"),
        F.count(F.lit(1)).alias("n_langs"),
    )
    j = per_lang.crossJoin(F.broadcast(total))
    weight = (
        F.col("total_toks").cast("double")
        / F.col("n_langs").cast("double")
        / F.col("lang_toks").cast("double")
    )
    return j.select(
        "lang",
        "lang_toks",
        F.round(weight, 6).alias("mix_weight"),
    )


ORACLE_LLM_MIX_WEIGHTS = """
WITH per_lang AS (
  SELECT lang,
         CAST(SUM(LEN(string_split(text, ' '))) AS BIGINT) AS lang_toks
  FROM documents
  GROUP BY lang
),
total AS (
  SELECT SUM(lang_toks) AS total_toks, COUNT(*) AS n_langs FROM per_lang
)
SELECT
  lang,
  lang_toks,
  ROUND(CAST(total_toks AS DOUBLE) / CAST(n_langs AS DOUBLE)
        / CAST(lang_toks AS DOUBLE), 6) AS mix_weight
FROM per_lang CROSS JOIN total
"""


#: importance-sampling length cap: keep-probability ramps linearly with
#: document length and saturates at 1 for docs >= this many chars.
IMP_LEN_CAP = 500


def llm_sample_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance sampling: keep probability proportional to document
    length (capped at 1) — the weighted variant of llm_sample_hash,
    the shape quality-weighted corpus downsampling takes (weight by a
    quality score, a domain multiplier, a dedup cluster size, ...).

    The acceptance test is ONE exact integer inequality: keep iff
    u8 * CAP < min(n_chars, CAP) * 256, with u8 the content-stable
    md5 variate. No floats, no rand() — repartition-stable and
    engine-identical, like every selector in this family.

    At 100 TB: a scan-side filter (no shuffle); the per-language audit
    aggregate here exists for the oracle and would be dropped in the
    write path.
    """
    d = table(spark, sf_dir, "documents")
    kept = d.filter(
        _hash_u8() * F.lit(IMP_LEN_CAP)
        < F.least(F.col("n_chars"), F.lit(IMP_LEN_CAP)) * F.lit(256)
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


ORACLE_LLM_SAMPLE_IMPORTANCE = f"""
SELECT
  lang,
  COUNT(*) AS n_sampled,
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
  MIN(doc_id) AS min_doc,
  MAX(doc_id) AS max_doc
FROM documents
WHERE {_ORACLE_HASH_U8} * {IMP_LEN_CAP} < LEAST(n_chars, {IMP_LEN_CAP}) * 256
GROUP BY lang
"""


#: rows kept per (lang) group by the reservoir-style exact-size sample
RESERVOIR_K = 20


def llm_sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-size deterministic per-group sample — "give me exactly K
    docs per language, uniformly-ish, reproducibly" (the eval-split /
    human-review draw; Bernoulli sampling cannot promise the size).

    The reservoir equivalent for a deterministic engine: rank every row
    by the content-stable md5 order within its group, keep the first K.
    A hash order is exchangeable with respect to the data (no
    correlation with doc content beyond the hash), so the draw is
    uniform for all practical purposes, yet reproducible across
    retries, partitionings and engines — this family's no-rand()
    discipline. Compiles to WindowGroupLimit: each map task keeps at
    most K rows per group BEFORE the shuffle (the same pushdown
    sort_topn_per_key pins), so at 100 TB the exchange carries
    K*groups*partitions rows, never the corpus. The md5-of-doc_id sort
    key is unique, so the kept set is total-order deterministic.
    """
    d = table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    key = F.md5(F.col("doc_id").cast("string"))
    w = W.partitionBy("lang").orderBy(key.asc(), F.col("doc_id"))
    return (
        d.select("doc_id", "lang", "n_chars")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= RESERVOIR_K)
    )


ORACLE_LLM_SAMPLE_RESERVOIR = f"""
SELECT doc_id, lang, n_chars, rk FROM (
  SELECT
    doc_id, lang, n_chars,
    ROW_NUMBER() OVER (
      PARTITION BY lang
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
    ) AS rk
  FROM documents
) WHERE rk <= {RESERVOIR_K}
"""


QUERIES = {
    "llm_sample_hash": spec(
        llm_sample_hash, ORACLE_LLM_SAMPLE_HASH, "llm",
        doc="deterministic hash-based stratified sample (repartition-stable)",
    ),
    "llm_shard": spec(
        llm_shard, ORACLE_LLM_SHARD, "llm",
        doc="hash-sharding audit for training-file assembly",
    ),
    "llm_mix_weights": spec(
        llm_mix_weights, ORACLE_LLM_MIX_WEIGHTS, "llm",
        doc="per-language mixture reweighting from exact token counts",
    ),
    "llm_sample_importance": spec(
        llm_sample_importance, ORACLE_LLM_SAMPLE_IMPORTANCE, "llm",
        doc="length-weighted importance sampling, one integer inequality",
    ),
    "llm_sample_reservoir": spec(
        llm_sample_reservoir, ORACLE_LLM_SAMPLE_RESERVOIR, "llm",
        doc="exact-size per-group deterministic sample (md5 rank, "
            "WindowGroupLimit pushdown)",
    ),
}
