"""Distributed BPE merge-step statistics (SURVEY.md §2.11 adjacent —
tokenizer-training support; the reference has no analogue, tag "llm").

Byte-pair-encoding training is a loop of "count adjacent symbol pairs
across the corpus, merge the most frequent". The counting step is the
only part that touches corpus-scale data, and it is exactly one
distributed aggregation — this module implements it Spark-first.

The trick that makes it scale is the same one every BPE trainer uses:
collapse the corpus to its WORD FREQUENCY table first. Pair counts are
then computed over the distinct vocabulary (bounded, ~Heaps-law sized)
with each word's pairs weighted by its corpus count — so the expensive
per-position explode runs over the vocabulary, not the corpus. At
100 TB the word-collapse is a mergeable map-side-combined aggregate of
(word) tokens (text itself never shuffles — split+explode happens in
the scan stage), and everything downstream is vocabulary-sized.
Subsequent merge iterations would re-pair the re-segmented vocabulary
(same plan, new symbol boundaries); the first iteration is the
representative one and the only one whose input is raw text.

Exactness: counts are integers; the top-K cut is totally ordered by
(count DESC, pair ASC), so the driver hash-check is deterministic on
both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import spec

#: how many top pairs the merge-step reports (a real trainer takes 1
#: per iteration; reporting the top 32 makes the result a stable,
#: hashable surface and shows the full candidate ranking).
BPE_TOP = 32


def llm_bpe_pair_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE merge-iteration's pair statistics: the BPE_TOP most
    frequent adjacent character pairs inside whitespace words, each
    occurrence weighted by the word's corpus frequency (a pair that
    repeats inside a word counts once per position, per occurrence —
    the textbook BPE count).

    Plan: corpus -> word counts (the only corpus-scale exchange,
    partially aggregated map-side) -> per-position pair explode over
    the DISTINCT vocabulary (sequence+transform, whole-stage codegen,
    no Python) -> vocabulary-sized hash aggregate ->
    TakeOrderedAndProject for the top-K.
    """
    docs = table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wn"))
    )
    pairs = words.select(
        "wn",
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1),"
                   " i -> substring(w, i, 2))")
        ).alias("pair"),
    )
    top = pairs.groupBy("pair").agg(F.sum("wn").alias("n"))
    return top.orderBy(F.col("n").desc(), "pair").limit(BPE_TOP)


ORACLE_LLM_BPE_PAIR_COUNT = f"""
WITH words AS (
  SELECT w, COUNT(*) AS wn
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE LEN(w) >= 2
  GROUP BY w
),
pairs AS (
  SELECT
    unnest([substring(w, i, 2)
            for i in generate_series(1, LEN(w) - 1)]) AS pair,
    wn
  FROM words
)
SELECT pair, CAST(SUM(wn) AS BIGINT) AS n
FROM pairs
GROUP BY pair
ORDER BY n DESC, pair
LIMIT {BPE_TOP}
"""


QUERIES = {
    "llm_bpe_pair_count": spec(
        llm_bpe_pair_count, ORACLE_LLM_BPE_PAIR_COUNT, "llm",
        doc="BPE merge-step pair counts over the word-frequency table",
    ),
}
