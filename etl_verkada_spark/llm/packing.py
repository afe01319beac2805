"""Sequence packing and stratified sampling — the training-batch
assembly stages after cleaning/dedup/sharding (SURVEY.md §2.11; the
reference has no analogue, tags are "llm"/beyond).

* ``llm_pack_sequences``    — concat-stream packing: per (lang) stream
  in deterministic doc order, documents are laid head-to-tail and the
  stream is cut every ``PACK_BUDGET`` tokens; a document belongs to the
  sequence where it STARTS (the standard attribute-to-start convention
  for packed pretraining batches). One window cumsum, no shuffle beyond
  the partition-by — at 100 TB this runs per shard/partition with
  bounded state, and the assignment is a pure function of (order key,
  token counts), so re-runs and task retries reproduce it bit-for-bit.
* ``llm_sample_stratified`` — exact-size per-stratum sample: every
  language contributes exactly ``CEIL(frac * n_stratum)`` documents,
  chosen by content-stable md5 rank (same selector discipline as
  llm_sample_hash — never rand(), which is neither re-run- nor
  repartition-stable). Two window functions over one shuffle.

Both are window-expressible, hence DuckDB-oracle-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import spec

#: tokens per packed training sequence. 512 keeps dozens of sequences
#: per language stratum at sf0.01 (avg doc ~54 ws tokens); production
#: would use the model context length (2k/4k/8k) — the plan is the same.
PACK_BUDGET = 512

#: stratified sample fraction (exact per-stratum, not expected-value)
STRAT_FRAC = 0.25


def llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document a (sequence id, offset) in its language's
    packed token stream.

    ``cum_before`` = tokens of all preceding docs in the stream (window
    SUM over rows unbounded-preceding..1-preceding — runs as one pass
    per partition, map-side size O(1)); then

    * ``seq_id``     = cum_before // PACK_BUDGET  (the cut the doc starts in)
    * ``seq_offset`` = cum_before %  PACK_BUDGET  (position inside the cut)

    Docs longer than the remaining room straddle cuts — exactly what
    concat-and-chunk packing does; the mapping stays 1:1 doc -> start
    sequence. Deterministic order key: doc_id (unique per corpus).
    """
    d = table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = d.select("doc_id", "lang", n_tok.alias("n_tok"))
    # integer `div`, never float `/`: exact for ANY budget (a double
    # division is only floor-safe when the divisor is a power of two),
    # and computing cum_before once keeps the Window to a single
    # aggregate expression.
    return (
        toks.withColumn(
            "__cum", F.coalesce(F.sum("n_tok").over(w), F.lit(0))
        )
        .select(
            "doc_id",
            "lang",
            "n_tok",
            F.expr(f"__cum div {PACK_BUDGET}").alias("seq_id"),
            F.pmod(F.col("__cum"), F.lit(PACK_BUDGET))
            .cast("long")
            .alias("seq_offset"),
        )
    )


ORACLE_LLM_PACK_SEQUENCES = f"""
WITH toks AS (
  SELECT doc_id, lang, LEN(string_split(text, ' ')) AS n_tok
  FROM documents
),
cum AS (
  SELECT *,
         COALESCE(SUM(n_tok) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum_before
  FROM toks
)
SELECT
  doc_id,
  lang,
  n_tok,
  CAST(cum_before // {PACK_BUDGET} AS BIGINT) AS seq_id,
  CAST(cum_before % {PACK_BUDGET} AS BIGINT) AS seq_offset
FROM cum
"""


def llm_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size stratified sample: CEIL(frac * n) docs per language.

    Rank docs inside each stratum by md5(doc_id) (content-stable, so
    identical across engines, re-runs, and repartitions; doc_id
    tie-break makes the order total), keep ranks up to the exact
    per-stratum quota. Unlike the Bernoulli llm_sample_hash, the output
    SIZE is deterministic per stratum — what curriculum / eval-split
    builders need. One shuffle (the lang partition), two windows over
    the same sort.
    """
    d = table(spark, sf_dir, "documents")
    sel = F.md5(F.col("doc_id").cast("string"))
    w_rank = Window.partitionBy("lang").orderBy(sel, "doc_id")
    w_all = Window.partitionBy("lang")
    ranked = d.select(
        "doc_id",
        "lang",
        F.row_number().over(w_rank).cast("long").alias("sample_rank"),
        F.count(F.lit(1)).over(w_all).alias("n_stratum"),
    )
    quota = F.ceil(F.lit(STRAT_FRAC) * F.col("n_stratum"))
    return ranked.filter(F.col("sample_rank") <= quota).select(
        "doc_id", "lang", "sample_rank", "n_stratum"
    )


ORACLE_LLM_SAMPLE_STRATIFIED = f"""
WITH ranked AS (
  SELECT
    doc_id,
    lang,
    ROW_NUMBER() OVER (
      PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
    ) AS sample_rank,
    COUNT(*) OVER (PARTITION BY lang) AS n_stratum
  FROM documents
)
SELECT doc_id, lang, sample_rank, n_stratum
FROM ranked
WHERE sample_rank <= CEIL({STRAT_FRAC} * n_stratum)
"""


#: length-bucket width in whitespace tokens. Docs are batched only with
#: peers from the same bucket, so in-batch padding is bounded by the
#: bucket width regardless of corpus length distribution.
BUCKET_TOKENS = 16

#: documents per padded batch inside a bucket
BATCH_DOCS = 16


def llm_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch assembly + padding-waste accounting — the
    OTHER batching strategy next to llm_pack_sequences' concat-stream:
    variable-length fine-tuning/inference batches pad every sequence to
    the batch max, so batching like-sized docs together is what keeps
    the pad overhead down. Bucketing by ``n_tok div BUCKET_TOKENS``
    bounds in-batch length spread by construction.

    Output is the per-batch manifest: doc count, padded length (batch
    max), real tokens, and wasted pad tokens — the quantity this
    strategy exists to minimize (n_docs * pad_len - sum_tok).

    Deterministic: batch membership is a pure function of (bucket,
    doc_id order), so re-runs and task retries rebuild identical
    batches — same selector discipline as the sampling family.

    At 100 TB the bucket key alone is too coarse a partition key
    (~dozens of buckets, arbitrarily many docs each); production runs
    the identical window per (bucket, shard) with shard = a doc_id
    range, which keeps determinism and bounds partition state — the
    same note as llm_pack_sequences' per-lang stream. The manifest
    output is batches-sized, ~1/BATCH_DOCS of the input rows, counts
    only, no text.
    """
    d = table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    toks = d.select(
        "doc_id",
        n_tok.alias("n_tok"),
    ).withColumn("bucket", F.expr(f"n_tok div {BUCKET_TOKENS}"))
    batched = toks.withColumn(
        "batch_id",
        F.expr(f"(row_number() over (partition by bucket order by doc_id)"
               f" - 1) div {BATCH_DOCS}"),
    )
    return (
        batched.groupBy("bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tok").alias("pad_len"),
            F.sum("n_tok").alias("sum_tok"),
        )
        .withColumn(
            "waste_tok",
            F.col("n_docs") * F.col("pad_len") - F.col("sum_tok"),
        )
    )


ORACLE_LLM_LENGTH_BUCKETS = f"""
WITH toks AS (
  SELECT doc_id,
         LEN(string_split(text, ' ')) AS n_tok,
         LEN(string_split(text, ' ')) // {BUCKET_TOKENS} AS bucket
  FROM documents
),
batched AS (
  SELECT *,
         (ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id) - 1)
           // {BATCH_DOCS} AS batch_id
  FROM toks
)
SELECT
  bucket,
  batch_id,
  COUNT(*) AS n_docs,
  MAX(n_tok) AS pad_len,
  CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
  COUNT(*) * MAX(n_tok) - CAST(SUM(n_tok) AS BIGINT) AS waste_tok
FROM batched
GROUP BY bucket, batch_id
"""


QUERIES = {
    "llm_pack_sequences": spec(
        llm_pack_sequences, ORACLE_LLM_PACK_SEQUENCES, "llm",
        doc="concat-stream sequence packing: doc -> (seq_id, offset) per lang",
    ),
    "llm_sample_stratified": spec(
        llm_sample_stratified, ORACLE_LLM_SAMPLE_STRATIFIED, "llm",
        doc="exact-size per-stratum sample by content-stable md5 rank",
    ),
    "llm_length_buckets": spec(
        llm_length_buckets, ORACLE_LLM_LENGTH_BUCKETS, "llm",
        doc="length-bucketed batch manifest with padding-waste accounting",
    ),
}
