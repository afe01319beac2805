"""Deduplication family over ``documents`` (SURVEY.md §2.11).

* exact      — normalize -> MD5 -> min-doc-id per hash. One hash-agg
               shuffle on the 16-byte digest, never on the text.
* minhash    — shingle -> 128-perm MinHash -> 32-band LSH -> candidate
               pairs -> exact-Jaccard verification. Pure DataFrame ops;
               at 100 TB the band join shuffles only (band, hash) pairs
               (a few dozen bytes/doc), candidate verification touches
               only the colliding docs.
* simhash    — 60-bit cross-engine SimHash from md5 token hashes;
               near-dups = small Hamming distance, found via 15-bit
               band blocking (any pair within distance 3 shares at
               least one of 4 bands). Oracle-checked.
* ngram      — exact n-gram Jaccard via inverted-index join (the
               ground-truth metric the sketches approximate).

Determinism: all hashing is xxhash64/md5 with fixed seeds — stable
across runs and partitionings, which is what makes the rows-only driver
checks reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..checkpoints import release
from ..registry import spec
from .text import normalized_text, with_shingles

# 128 perms in 32 bands of 4 (round-4 widening from 64/16): the s-curve
# midpoint (1/b)^(1/r) = (1/32)^(1/4) ~= 0.42, so candidate recall at
# the measured true-pair similarities is effectively total — per-pair
# miss (1-J^4)^32 is ~4e-7 at the sf0.1 minimum true J=0.78 and ~2e-8
# at J=0.8 (at 64/16 it was ~5% over sf0.1's 256 pairs — a
# coin-flip-level driver row-count risk at larger SFs). Random pairs
# (J~0.07 measured) stay non-candidates: 32 * 0.07^4 ~= 8e-4 expected
# band collisions. Exact-Jaccard verification bounds false-positive
# cost either way.
N_PERMS = 128
BAND_SIZE = 4  # -> 32 bands

# Driver-surface verification threshold (r5, closes the last open ADVICE
# item): the oracle is a brute-force exact-Jaccard scan, so it asserts
# 100% LSH recall above the threshold. At 0.5 the 32x4 s-curve misses a
# boundary pair with p = (1-0.5^4)^32 ~= 0.126 — a latent row-count FAIL
# if any driver sf/seed ever produces mid-similarity pairs. At 0.75 the
# boundary miss is (1-0.75^4)^32 ~= 5.2e-6 (4e-7 at J=0.78, the
# measured sf0.1 true-pair minimum; 2e-8 at 0.8, the sf0.01 minimum), so
# cumulative miss stays <1e-2 even at a million boundary pairs — and the
# measured pair population is bimodal (J>=0.78 true / J<=0.07 background
# at sf0.1; verified by test_llm.py's population scan), so
# the visible output is IDENTICAL to the 0.5-threshold output at every
# tested sf. The general operators below stay threshold-free.
MINHASH_THRESHOLD = 0.75


def llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content hash, keep min doc_id.

    The shuffle key is the digest, so payload text never crosses the
    wire; at 100 TB this is the cheapest possible full-corpus dedup.
    """
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.md5(normalized_text()).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


ORACLE_LLM_DEDUP_EXACT = """
SELECT
  md5(LOWER(TRIM(regexp_replace(text, '\\s+', ' ', 'g')))) AS content_hash,
  MIN(doc_id) AS keep_id,
  COUNT(*) AS n_copies
FROM documents
GROUP BY 1
"""


def llm_dedup_soft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft dedup: keep EVERY document, but emit a sampling weight
    1/|duplicate cluster| so repeated content contributes once in
    expectation (the reweighting alternative to hard removal —
    SoftDeDup-style down-weighting instead of llm_dedup_exact's
    keep-min-id drop; hard dedup loses paraphrase diversity, soft
    dedup keeps it at unchanged effective epochs).

    Plan: digest map-side (text never crosses the wire), then ONE
    shuffle on the digest with a partition-frame window count — no
    groupBy+join-back (which would shuffle the corpus twice). Weight is
    a single IEEE double division, bit-identical in both engines. At
    100 TB: shuffle payload is (digest, doc_id) = ~24 B/doc, and a
    pathological mega-cluster is just a big count — no row explosion.
    """
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("content_hash")
    return (
        d.select(F.md5(normalized_text()).alias("content_hash"), "doc_id")
        .withColumn("n_copies", F.count(F.lit(1)).over(w))
        .select(
            "doc_id",
            "n_copies",
            (F.lit(1.0) / F.col("n_copies")).alias("weight"),
        )
    )


ORACLE_LLM_DEDUP_SOFT = """
SELECT
  doc_id,
  COUNT(*) OVER (
    PARTITION BY md5(LOWER(TRIM(regexp_replace(text, '\\s+', ' ', 'g'))))
  ) AS n_copies,
  CAST(1 AS DOUBLE) / COUNT(*) OVER (
    PARTITION BY md5(LOWER(TRIM(regexp_replace(text, '\\s+', ' ', 'g'))))
  ) AS weight
FROM documents
"""


#: canonical-pick packing: quality * 10^12 - doc_id keeps
#: (quality DESC, doc_id ASC) as ONE bigint max (n_chars < 10^6 and
#: doc_id < 10^12 by generator contract, so no overflow)
KEEP_BEST_PACK = 1_000_000_000_000


def llm_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keeping the best-quality copy per cluster instead of
    llm_dedup_exact's min-id: the canonical-document selection step of
    corpus pipelines (near-identical crawls keep the longest/cleanest
    capture, not an arbitrary one).

    The pick is ``max_by`` over a packed BIGINT (quality DESC, doc_id
    ASC as one scalar), so the aggregate stays a whole-stage
    HashAggregate — a struct ordering key would fall back to
    SortAggregate (measured on cdc_snapshot_diff, same round). Quality
    here is document length (n_chars); any scalar score — e.g.
    llm_quality_ensemble's — slots into the same packing. One
    digest-keyed shuffle, text never ships.
    """
    d = table(spark, sf_dir, "documents")
    packed = F.col("n_chars") * F.lit(KEEP_BEST_PACK) - F.col("doc_id")
    return (
        d.select(
            F.md5(normalized_text()).alias("content_hash"),
            "doc_id",
            "n_chars",
            packed.alias("pick"),
        )
        .groupBy("content_hash")
        .agg(
            F.max_by("doc_id", F.col("pick")).alias("keep_id"),
            F.max("n_chars").alias("kept_chars"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


ORACLE_LLM_DEDUP_KEEP_BEST = f"""
SELECT
  md5(LOWER(TRIM(regexp_replace(text, '\\s+', ' ', 'g')))) AS content_hash,
  ARG_MAX(doc_id, n_chars * {KEEP_BEST_PACK} - doc_id) AS keep_id,
  MAX(n_chars) AS kept_chars,
  COUNT(*) AS n_copies
FROM documents
GROUP BY 1
"""


def _doc_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) distinct — the set representation."""
    return with_shingles(docs).select(
        "doc_id", F.explode(F.array_distinct("shingles")).alias("s")
    )


def minhash_signatures(docs: DataFrame, n_perms: int = N_PERMS) -> DataFrame:
    """doc_id -> n_perms min-hashes. Permutation p = xxhash64(p || s):
    seeded, deterministic, no stored permutation tables."""
    sh = _doc_shingles(docs)
    aggs = [
        F.min(F.xxhash64(F.concat(F.lit(f"{p}|"), F.col("s")))).alias(f"h{p}")
        for p in range(n_perms)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(sig: DataFrame, n_perms: int = N_PERMS,
                        band_size: int = BAND_SIZE) -> DataFrame:
    """Band the signatures and self-join on (band_idx, band_hash)."""
    n_bands = n_perms // band_size
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col(f"h{b * band_size + i}") for i in range(band_size)]
                        ).alias("bh"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bh")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def exact_jaccard(pairs: DataFrame, shingles: DataFrame) -> DataFrame:
    """Verify candidates with exact set Jaccard (join back to shingles)."""
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    sa = shingles.select(F.col("doc_id").alias("doc_a"), "s")
    sb = shingles.select(F.col("doc_id").alias("doc_b"), "s")
    inter = (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            ).alias("jaccard"),
        )
    )


def llm_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dedup: candidates from banding, verified exactly.

    Oracle-checked: the OUTPUT is the exact-Jaccard-verified pair list at
    MINHASH_THRESHOLD, which DuckDB recomputes by brute force — identical
    to the LSH result whenever the banding recalls every pair above the
    threshold.  The threshold sits where 32x4 banding recall is ~1
    (boundary miss 5.2e-6 per pair at J=0.75; 4e-7 at the measured
    sf0.1 true-pair minimum J=0.78 — see MINHASH_THRESHOLD), so the one
    probabilistic element of the check is bounded below any plausible
    driver pair population; a miss would surface as a row-count diff,
    never silent corruption.  The measured population is bimodal
    (J>=0.78 true / J<=0.07 background at sf0.1; J>=0.8 at sf0.01), so
    this output equals the 0.5-threshold output at every tested sf.
    """
    docs = table(spark, sf_dir, "documents")
    sig = minhash_signatures(docs)
    pairs = lsh_candidate_pairs(sig)
    verified = exact_jaccard(pairs, _doc_shingles(docs))
    return verified.filter(F.col("jaccard") >= MINHASH_THRESHOLD).select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
    )


#: brute-force twin of the LSH pipeline: every pair with exact 4-gram
#: Jaccard >= MINHASH_THRESHOLD (same shingle CTE as
#: ORACLE_LLM_DEDUP_NGRAM; threshold inlined below, keep in sync).
ORACLE_LLM_DEDUP_MINHASH = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws, text FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, s
  FROM (
    SELECT doc_id,
           unnest([array_to_string(ws[i:i+3], ' ')
                   for i in generate_series(1, LEN(ws) - 3)]) AS s
    FROM w WHERE LEN(ws) >= 4
    UNION ALL
    SELECT doc_id, text AS s FROM w WHERE LEN(ws) < 4
  )
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT
  i.doc_a,
  i.doc_b,
  ROUND(CAST(i.inter AS DOUBLE) / (za.sz + zb.sz - i.inter), 6) AS jaccard
FROM inter i
JOIN sizes za ON i.doc_a = za.doc_id
JOIN sizes zb ON i.doc_b = zb.doc_id
WHERE CAST(i.inter AS DOUBLE) / (za.sz + zb.sz - i.inter) >= 0.75
"""


FUZZY_PREFIX = 64   # edit distance on the document head, not the body
FUZZY_MAX_DIST = 5
FUZZY_LEN_BAND = 16


def llm_dedup_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dedup: Levenshtein over blocked candidates.

    The fuzzy-match family member (typo-level duplicates that n-gram
    Jaccard over-penalizes and embedding cosine can't localize).
    Levenshtein is O(m*n) per PAIR, so the operator's whole design is
    about never running it on the cross product: candidates must share
    a (lang, length-band) block — length differing by more than the
    distance budget can't be within budget anyway — and the metric runs
    on the first FUZZY_PREFIX chars (near-dups agree on their head; the
    bounded prefix caps per-pair cost at a constant). Both engines
    implement unit-cost Levenshtein identically, so the result is
    oracle-exact. At 100 TB the blocks shard like every other blocked
    dedup here; the prefix bound is what keeps a block's pair cost
    linear in pairs, not in document bytes.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.substring("text", 1, FUZZY_PREFIX).alias("head"),
        # integer div, not `/` + cast: Spark's double->long cast
        # truncates but DuckDB's ROUNDS — floor-divide in integers so
        # both engines band identically
        F.expr(f"length(text) div {FUZZY_LEN_BAND}").alias("band"),
    )
    a, b = d.alias("a"), d.alias("b")
    dist = F.levenshtein(F.col("a.head"), F.col("b.head"))
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= FUZZY_MAX_DIST)
    )


ORACLE_LLM_DEDUP_FUZZY = """
WITH d AS (
  SELECT
    doc_id,
    lang,
    substr(text, 1, 64) AS head,
    LENGTH(text) // 16 AS band
  FROM documents
)
SELECT
  a.doc_id AS doc_a,
  b.doc_id AS doc_b,
  levenshtein(a.head, b.head) AS edit_dist
FROM d a
JOIN d b
  ON a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id
WHERE levenshtein(a.head, b.head) <= 5
"""


#: SimHash geometry: 60-bit fingerprints (15 hex chars of md5 — the
#: widest slice that stays positive in a signed BIGINT in BOTH engines,
#: which is what makes the oracle possible: Spark conv(hex,16,10) and
#: DuckDB ('0x'||hex)::BIGINT decode it identically), 4 bands x 15 bits.
SIMHASH_BITS = 60
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS
SIMHASH_MAX_HAMMING = 3


def token_hash_column() -> F.Column:
    """Per-token 60-bit hash array, computed ONCE per document (the
    fingerprint's 60 bit-votes then fold over this array instead of
    re-hashing the token per bit). md5 rather than xxhash64 solely
    because md5 is the cross-engine hash (sampling.py's discipline);
    every downstream bit is engine-identical integer arithmetic.
    """
    return F.expr(
        "transform(split(text, ' '), t -> "
        "cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint))"
    )


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 60-bit SimHash packed into a BIGINT.

    Shape matters here: 60 per-row array folds (the obvious "single
    expression" form) generate a method so large codegen bails to
    interpreted mode — measured ~30s at sf0.01. Instead the token
    hashes EXPLODE and the 60 bit-votes become 60 simple SUM(CASE)
    columns in ONE map-side-combinable hash aggregate (~2s): the
    vote state is 60 longs per doc, the exchange carries only
    partially-combined votes, and the final bit-pack is a cheap
    projection over n_docs rows.
    """
    toks = docs.select(
        "doc_id", F.explode(token_hash_column()).alias("h")
    )
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1,
                    1,
                ).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    pack = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN 1L << {b} ELSE 0L END)"
        for b in range(SIMHASH_BITS)
    )
    return votes.select("doc_id", F.expr(pack).alias("simhash"))


def llm_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dedup: 60-bit fingerprints + 15-bit band blocking.

    Any pair with Hamming distance <= 3 collides on at least one of the
    four 15-bit bands (pigeonhole), so the block join finds all of them
    without an O(n^2) comparison. Oracle-checked: the fingerprint is
    pure integer arithmetic over cross-engine md5 token hashes, so
    DuckDB recomputes the identical BIGINTs relationally.
    """
    # localCheckpoint: the band self-join references the fingerprint
    # table twice; without materialization the 60-sum aggregate (and
    # its hefty codegen compile) runs once PER SIDE. The checkpointed
    # table is (doc_id, 8-byte simhash) — n_docs rows, trivially small
    # relative to the corpus at any scale (graph_pagerank discipline).
    docs = simhash_fingerprints(
        table(spark, sf_dir, "documents")
    ).localCheckpoint(eager=True)
    band_mask = (1 << SIMHASH_BAND_BITS) - 1
    bands = docs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(
                            F.col("simhash"), b * SIMHASH_BAND_BITS
                        )
                        .bitwiseAND(F.lit(band_mask))
                        .alias("bh"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.bh")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("doc_a", "doc_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= SIMHASH_MAX_HAMMING
    )


def _simhash_oracle() -> str:
    """Relational twin of llm_dedup_simhash: identical md5-slice token
    hashes, identical 60 integer bit-votes, identical band block join."""
    votes = "\n    + ".join(
        f"(CASE WHEN list_sum(list_transform(th, h -> "
        f"CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN (1::BIGINT << {b}) ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    band_mask = (1 << SIMHASH_BAND_BITS) - 1
    band_rows = ", ".join(f"({b})" for b in range(SIMHASH_BANDS))
    return f"""
WITH th AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '),
           t -> ('0x' || substring(md5(t), 1, 15))::BIGINT) AS th
  FROM documents
),
sh AS (
  SELECT doc_id,
    CAST({votes} AS BIGINT) AS simhash
  FROM th
),
bands AS (
  SELECT doc_id, simhash, b.band,
         (simhash >> (b.band * {SIMHASH_BAND_BITS})) & {band_mask} AS bh
  FROM sh, (VALUES {band_rows}) b(band)
),
cand AS (
  SELECT DISTINCT
    a.doc_id AS doc_a, b.doc_id AS doc_b,
    a.simhash AS sh_a, b.simhash AS sh_b
  FROM bands a
  JOIN bands b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, hamming FROM (
  SELECT doc_a, doc_b,
         CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
  FROM cand
) WHERE hamming <= {SIMHASH_MAX_HAMMING}
"""


ORACLE_LLM_DEDUP_SIMHASH = _simhash_oracle()


def ngram_jaccard_pairs(docs: DataFrame) -> DataFrame:
    """All (doc_a, doc_b, jaccard) pairs via inverted-index join on the
    shingle — the exact metric MinHash/SimHash approximate."""
    sh = _doc_shingles(docs)
    pairs = (
        sh.select(F.col("doc_id").alias("doc_a"), "s")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "s"), "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        pairs.join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
    )


def llm_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 4-gram Jaccard: top-20 most similar pairs (ground truth).

    Oracle-checked: deterministic total order (rounded jaccard desc,
    then pair ids).
    """
    docs = table(spark, sf_dir, "documents")
    jac = ngram_jaccard_pairs(docs)
    return jac.orderBy(F.col("jaccard").desc(), "doc_a", "doc_b").limit(20)


ORACLE_LLM_DEDUP_NGRAM = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws, text FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, s
  FROM (
    SELECT doc_id,
           unnest([array_to_string(ws[i:i+3], ' ')
                   for i in generate_series(1, LEN(ws) - 3)]) AS s
    FROM w WHERE LEN(ws) >= 4
    UNION ALL
    SELECT doc_id, text AS s FROM w WHERE LEN(ws) < 4
  )
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT
  i.doc_a,
  i.doc_b,
  ROUND(CAST(i.inter AS DOUBLE) / (za.sz + zb.sz - i.inter), 6) AS jaccard
FROM inter i
JOIN sizes za ON i.doc_a = za.doc_id
JOIN sizes zb ON i.doc_b = zb.doc_id
ORDER BY jaccard DESC, i.doc_a, i.doc_b
LIMIT 20
"""


#: prefix-filter Jaccard threshold. Lower than MINHASH_THRESHOLD on
#: purpose: the prefix filter is EXACT at any tau (candidates are a
#: superset of all qualifying pairs by construction), so it can afford
#: the recall-sensitive regime where LSH banding would need many more
#: bands.
PF_TAU = 0.5


def prefix_filter_pairs(docs: DataFrame, tau: float = PF_TAU) -> DataFrame:
    """AllPairs/PPJoin-style candidate generation: index only each
    document's PREFIX — its ``|S| - ceil(tau*|S|) + 1`` globally rarest
    shingles — instead of the full inverted index.

    Why this is lossless: J(a,b) >= tau implies |a n b| >= tau*|a| (and
    tau*|b|), so at most ``|S| - ceil(tau*|S|)`` of a document's
    shingles can be missing from the other document. Order every
    document's shingles by one GLOBAL total order (document frequency
    ascending, then shingle value); if two documents shared no prefix
    token, each would need all its matches outside its prefix — more
    misses than the bound allows. Hence every qualifying pair collides
    on >= 1 prefix token.

    Why it scales where the plain inverted-index join does not: the
    join fan-out of a token is df^2, and the full index pays that for
    the COMMON shingles (df in the millions at corpus scale). The
    df-ascending prefix keeps each document's rarest tokens, so the
    candidate join runs almost entirely on the long tail where df is
    single digits; the head tokens that dominate the full join's cost
    are exactly the ones the prefix drops. Index size shrinks to
    ~(1-tau) of the corpus shingle count, and text never ships.

    Three A/B'd-and-rejected variants (sf0.1, min-of-5, same session):
    (a) carrying ``sz`` from the pre-explode array instead of the count
    window — wider exchange rows, 2.4s -> 3.4s; (b) hashing shingles to
    xxhash64 BIGINT ids for the candidate pipeline — the per-shingle
    hash pass costs more than the int keys save at bench scale (at true
    corpus scale the 8-byte keys win shuffle bytes and the switch is
    one line); (c) hashing 4 words straight out of the split array —
    CollapseProject inlines the split into the lambda and re-splits the
    text per element (the text.py:SHINGLES_FROM_WS O(tokens^2) trap,
    2.7s -> 6.1s).
    """
    sh = _doc_shingles(docs)
    df_ = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    by_doc = Window.partitionBy("doc_id")
    ranked = (
        sh.join(df_, "s")
        .withColumn("sz", F.count(F.lit(1)).over(by_doc))
        .withColumn("r", F.row_number().over(by_doc.orderBy("df", "s")))
    )
    prefix = ranked.filter(
        F.col("r") <= F.col("sz") - F.ceil(F.lit(tau) * F.col("sz")) + 1
    ).select("doc_id", "s")
    a, b = prefix.alias("a"), prefix.alias("b")
    return (
        a.join(b, "s")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def array_jaccard(pairs: DataFrame, docs: DataFrame) -> DataFrame:
    """Verify candidate pairs with exact set Jaccard via per-doc shingle
    ARRAYS: two equi-joins on the doc ids, intersection computed with
    ``array_intersect`` inside codegen.

    Versus :func:`exact_jaccard` (explode + inverted re-join +
    group-by), this replaces ~7 exchanges with 2 joins whose build side
    is the doc->array table — AQE broadcasts it at bench scale, and at
    corpus scale they are plain hash joins keyed on doc id. The array
    payload per row is bounded by the document length (the same bound
    the explode form pays in aggregate), so nothing here changes the
    asymptotics — only the constant: measured 2.9s -> see SCALE.md §24.
    exact_jaccard remains the verifier of choice when candidates per
    doc are so many that shipping the array per pair loses to the
    shared inverted index.
    """
    arrs = with_shingles(docs).select(
        "doc_id", F.array_distinct("shingles").alias("arr")
    )
    a = arrs.select(
        F.col("doc_id").alias("doc_a"), F.col("arr").alias("arr_a")
    )
    b = arrs.select(
        F.col("doc_id").alias("doc_b"), F.col("arr").alias("arr_b")
    )
    inter = F.size(F.array_intersect("arr_a", "arr_b"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                inter.cast("double")
                / (F.size("arr_a") + F.size("arr_b") - inter)
            ).alias("jaccard"),
        )
    )


def llm_dedup_prefixfilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact similarity join via prefix filtering: all pairs with
    4-gram Jaccard >= PF_TAU, computed WITHOUT the all-shingle
    inverted-index join (prefix_filter_pairs above) and verified with
    exact Jaccard — so the output is bit-identical to brute force,
    which is precisely what the DuckDB oracle recomputes.

    Complements the probabilistic family: MinHash/LSH trades recall
    for index size at high tau; prefix filtering keeps recall = 1 at
    ANY tau and wins whenever the exactness contract matters
    (compliance-grade dedup, eval-set decontamination). Verification
    uses :func:`array_jaccard` (array-intersect joins) — prefix
    filtering emits FEW candidates per doc by construction, which is
    exactly the regime where shipping the doc arrays to the pairs
    beats rebuilding the inverted index.
    """
    docs = table(spark, sf_dir, "documents")
    cands = prefix_filter_pairs(docs)
    verified = array_jaccard(cands, docs)
    return verified.filter(F.col("jaccard") >= PF_TAU).select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
    )


#: brute-force exact-Jaccard twin at PF_TAU (same shingle CTE as
#: ORACLE_LLM_DEDUP_NGRAM) — identical output because prefix filtering
#: is lossless and the verify step discards every false candidate.
ORACLE_LLM_DEDUP_PREFIXFILTER = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws, text FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, s
  FROM (
    SELECT doc_id,
           unnest([array_to_string(ws[i:i+3], ' ')
                   for i in generate_series(1, LEN(ws) - 3)]) AS s
    FROM w WHERE LEN(ws) >= 4
    UNION ALL
    SELECT doc_id, text AS s FROM w WHERE LEN(ws) < 4
  )
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT
  i.doc_a,
  i.doc_b,
  ROUND(CAST(i.inter AS DOUBLE) / (za.sz + zb.sz - i.inter), 6) AS jaccard
FROM inter i
JOIN sizes za ON i.doc_a = za.doc_id
JOIN sizes zb ON i.doc_b = zb.doc_id
WHERE CAST(i.inter AS DOUBLE) / (za.sz + zb.sz - i.inter) >= {PF_TAU}
"""


#: BENCH-ONLY sf1 twin for llm_dedup_prefixfilter — the SAME
#: prefix-filter algorithm (df-ascending prefix index -> candidate
#: join -> exact-Jaccard verify) in DuckDB SQL, NOT the correctness
#: oracle. The correctness gate keeps the brute-force all-pairs twin
#: above (it independently proves recall = 1); but at sf1 (500k docs)
#: brute force never finishes on ANY engine, so a crossover ratio is
#: only meaningful engine-vs-engine on the equal-work algorithm. Output
#: is identical to the oracle's by the same losslessness argument.
SF1_TWIN_LLM_DEDUP_PREFIXFILTER = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws, text FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, s
  FROM (
    SELECT doc_id,
           unnest([array_to_string(ws[i:i+3], ' ')
                   for i in generate_series(1, LEN(ws) - 3)]) AS s
    FROM w WHERE LEN(ws) >= 4
    UNION ALL
    SELECT doc_id, text AS s FROM w WHERE LEN(ws) < 4
  )
),
dfreq AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY s),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
ranked AS (
  SELECT sh.doc_id, sh.s, z.sz,
         ROW_NUMBER() OVER (
           PARTITION BY sh.doc_id ORDER BY d.df, sh.s
         ) AS r
  FROM sh
  JOIN dfreq d ON d.s = sh.s
  JOIN sizes z ON z.doc_id = sh.doc_id
),
pfx AS (
  SELECT doc_id, s FROM ranked
  WHERE r <= sz - CEIL({PF_TAU} * sz) + 1
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM pfx a JOIN pfx b ON a.s = b.s AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.s = a.s
  GROUP BY 1, 2
)
SELECT
  i.doc_a,
  i.doc_b,
  ROUND(CAST(i.inter AS DOUBLE) / (za.sz + zb.sz - i.inter), 6) AS jaccard
FROM inter i
JOIN sizes za ON i.doc_a = za.doc_id
JOIN sizes zb ON i.doc_b = zb.doc_id
WHERE CAST(i.inter AS DOUBLE) / (za.sz + zb.sz - i.inter) >= {PF_TAU}
"""


CC_THRESHOLD = 0.5
CC_MAX_ITER = 20


def connected_components(edges: DataFrame, max_iter: int = CC_MAX_ITER) -> DataFrame:
    """Min-label propagation: each node converges to the smallest id in
    its component. Deterministic and partition-independent (min is
    associative/commutative), which is what lets the DuckDB recursive-CTE
    oracle check an ITERATIVE Spark job.

    Each iteration is one join + one min-aggregate on the (small) edge
    set; ``localCheckpoint`` truncates the growing lineage so iteration
    N doesn't replan iterations 1..N-1. Converges in O(diameter)
    rounds — near-dup clusters are shallow; a 100 TB graph with long
    chains would switch to the large-star/small-star algorithm (same
    primitives, O(log n) rounds).

    Expects columns (doc_a, doc_b); returns (doc_id, cluster_root) for
    every node that has at least one edge.
    """
    # Materialize the edge set ONCE: every iteration joins against sym,
    # and without this checkpoint the (expensive) edge-derivation lineage
    # re-executes per round (measured 3x end-to-end on the n-gram graph).
    sym = (
        edges.selectExpr("doc_a AS src", "doc_b AS dst")
        .unionAll(edges.selectExpr("doc_b AS src", "doc_a AS dst"))
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("src").alias("id")).distinct()
        .withColumn("root", F.col("id"))
        .localCheckpoint(eager=True)
    )
    changed = -1
    for _ in range(max_iter):
        neighbor_roots = (
            sym.join(labels, sym["src"] == labels["id"])
            .select(F.col("dst").alias("id"), "root")
        )
        new_labels = (
            labels.unionByName(neighbor_roots)
            .groupBy("id")
            .agg(F.min("root").alias("root"))
            .localCheckpoint(eager=True)
        )
        changed = (
            labels.alias("old")
            .join(new_labels.alias("new"), "id")
            .filter(F.col("old.root") != F.col("new.root"))
            .count()
        )
        # both uses of the old snapshot (superstep + delta count) are
        # done — release it before rebinding (checkpoints.py contract)
        release(labels)
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # A silent exit here would return partially-propagated labels
        # that diverge from the recursive-CTE oracle with no signal
        # (ADVICE r1). Component diameter > max_iter means this graph
        # needs the O(log n) large-star/small-star variant, not more
        # quiet rounds.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); component diameter "
            "exceeds max_iter — raise it or use large-star/small-star"
        )
    # the result plan reads only the final labels snapshot — the edge
    # snapshot is not referenced by it, so free it now
    release(sym)
    return labels.select(
        F.col("id").alias("doc_id"), F.col("root").alias("cluster_root")
    )


def llm_dedup_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clustering: connected components over the
    exact n-gram-Jaccard edge graph (>= 0.5).

    Pairwise dedup (llm_dedup_embed et al.) under-merges chains
    (A~B, B~C but A!~C); cluster-level dedup needs the transitive
    closure. This is the engine's iterative-algorithm surface — a
    driver-side fixpoint loop over DataFrame ops, checked against a
    DuckDB WITH RECURSIVE oracle.
    """
    docs = table(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(docs).filter(
        F.col("jaccard") >= CC_THRESHOLD
    ).select("doc_a", "doc_b")
    labels = connected_components(edges)
    return labels.withColumn("cluster_root", F.col("cluster_root").cast("long"))


ORACLE_LLM_DEDUP_CC = """
WITH RECURSIVE w AS (
  SELECT doc_id, string_split(text, ' ') AS ws, text FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, s
  FROM (
    SELECT doc_id,
           unnest([array_to_string(ws[i:i+3], ' ')
                   for i in generate_series(1, LEN(ws) - 3)]) AS s
    FROM w WHERE LEN(ws) >= 4
    UNION ALL
    SELECT doc_id, text AS s FROM w WHERE LEN(ws) < 4
  )
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sizes za ON i.doc_a = za.doc_id
  JOIN sizes zb ON i.doc_b = zb.doc_id
  WHERE ROUND(CAST(i.inter AS DOUBLE) / (za.sz + zb.sz - i.inter), 6) >= 0.5
),
sym AS (
  SELECT doc_a AS src, doc_b AS dst FROM edges
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM edges
),
nodes AS (SELECT DISTINCT src AS id FROM sym),
reach(a, b) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src
)
SELECT a AS doc_id, MIN(b) AS cluster_root
FROM reach
GROUP BY a
"""


INCR_NEW_MOD = 10  # doc_id % 10 >= 8 -> the "new crawl" batch


def llm_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: flag NEW-batch docs already present in the
    existing corpus (exact normalized-content match).

    The production dedup shape: a crawl lands a new batch and only that
    batch is checked against the corpus — never corpus-vs-corpus. Both
    sides reduce to (content_hash[, doc_id]) BEFORE the join, so the
    shuffle carries digests, not text, and the corpus side ships one
    hash column (in production: a pre-computed hash index, making the
    per-batch cost O(batch) + a hash-index probe). Left join against
    the min-doc_id hash dictionary (not semi) so the output also names
    WHICH corpus doc each duplicate collides with — the lineage a
    keep/drop audit needs. Batch split is doc_id mod, deterministic.
    """
    from .text import normalized_text

    d = table(spark, sf_dir, "documents")
    hashed = d.select(
        "doc_id", F.md5(normalized_text()).alias("content_hash")
    )
    is_new = F.col("doc_id") % INCR_NEW_MOD >= INCR_NEW_MOD - 2
    corpus_index = (
        hashed.filter(~is_new)
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("dup_of"))
    )
    return (
        hashed.filter(is_new)
        .join(corpus_index, "content_hash", "left")
        .select(
            "doc_id",
            F.col("dup_of").isNotNull().alias("is_dup"),
            "dup_of",
        )
    )


ORACLE_LLM_DEDUP_INCREMENTAL = """
WITH hashed AS (
  SELECT
    doc_id,
    md5(LOWER(TRIM(regexp_replace(text, '\\s+', ' ', 'g')))) AS content_hash
  FROM documents
),
corpus_index AS (
  SELECT content_hash, MIN(doc_id) AS dup_of
  FROM hashed WHERE doc_id % 10 < 8
  GROUP BY content_hash
)
SELECT
  n.doc_id,
  c.dup_of IS NOT NULL AS is_dup,
  c.dup_of
FROM hashed n
LEFT JOIN corpus_index c USING (content_hash)
WHERE n.doc_id % 10 >= 8
"""


PASSAGE_WORDS = 16
#: owner encoding: doc_id * OWNER_BASE + p_idx must be injective; docs
#: here run a few hundred words -> tens of passages, bound 1e5 is safe.
OWNER_BASE = 100_000


def llm_dedup_passage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (passage-level) dedup: the pretraining-corpus pass
    that removes boilerplate repeated ACROSS documents (headers, nav
    text, license blocks) that whole-document hashing can't see.

    Chunk each document into fixed 16-word passages, hash each passage,
    and pick one canonical owner per distinct passage — the smallest
    (doc_id, p_idx), encoded as ``doc_id * 1e5 + p_idx`` so min() is an
    ordinary long aggregate on both engines. Every other occurrence is
    a duplicate. Output: per-doc passage count + duplicate count.

    100 TB: passages never leave the scan un-hashed — only (doc_id,
    p_idx, md5) shuffles, ~48 bytes/passage. Owner resolution is one
    groupBy on the digest; the join back is digest-keyed and
    co-partitioned with it. Same wire discipline as llm_dedup_exact.
    """
    d = table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    n_pass = F.ceil(F.size(ws) / F.lit(PASSAGE_WORDS)).cast("int")
    passages = F.transform(
        F.sequence(F.lit(0), n_pass - 1),
        lambda i: F.array_join(
            F.slice(ws, i * PASSAGE_WORDS + 1, PASSAGE_WORDS), " "
        ),
    )
    occ = d.select(
        "doc_id", F.posexplode(passages).alias("p_idx", "passage")
    ).select(
        "doc_id",
        "p_idx",
        F.md5(F.col("passage")).alias("h"),
        (F.col("doc_id") * OWNER_BASE + F.col("p_idx")).alias("occ_key"),
    )
    owners = occ.groupBy("h").agg(F.min("occ_key").alias("owner_key"))
    flagged = occ.join(owners, "h").select(
        "doc_id",
        (F.col("occ_key") != F.col("owner_key")).cast("int").alias("is_dup"),
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_passages"),
        F.sum("is_dup").alias("n_dup_passages"),
    )


ORACLE_LLM_DEDUP_PASSAGE = f"""
WITH ws AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
occ AS (
  SELECT
    doc_id,
    i AS p_idx,
    md5(array_to_string(
      w[i * {PASSAGE_WORDS} + 1 : i * {PASSAGE_WORDS} + {PASSAGE_WORDS}],
      ' ')) AS h,
    doc_id * {OWNER_BASE} + i AS occ_key
  FROM ws,
       LATERAL (SELECT UNNEST(generate_series(
         0, CAST(CEIL(LEN(w) / {PASSAGE_WORDS}.0) AS INT) - 1)) AS i)
),
owners AS (
  SELECT h, MIN(occ_key) AS owner_key FROM occ GROUP BY h
)
SELECT
  o.doc_id,
  COUNT(*) AS n_passages,
  CAST(SUM(CASE WHEN o.occ_key <> w2.owner_key THEN 1 ELSE 0 END)
       AS BIGINT) AS n_dup_passages
FROM occ o JOIN owners w2 USING (h)
GROUP BY o.doc_id
"""


SUBSTR_WINDOW = 8  # tokens per sliding window


def llm_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window substring-level dedup — the k-token duplicate-span
    pass of large-corpus pipelines (the Spark-native approximation of
    suffix-array span dedup): unlike llm_dedup_passage's fixed 16-word
    chunks, windows slide by ONE token, so duplicate spans that
    straddle chunk boundaries are caught.

    Every 8-token window of every document is hashed; one canonical
    owner per distinct window digest (min (doc_id, w_idx), encoded as
    a single long); every other occurrence is a duplicated window.
    Per-doc output adds the span-union metric pipelines act on:
    ``n_dup_tokens`` = tokens covered by at least one duplicated window
    (overlapping windows merged via lead() gap arithmetic, capped at
    both the window size and the document tail).

    100 TB: wire cost is ~(16 B digest + 16 B keys) per TOKEN — k times
    passage dedup's per-chunk cost; that is the price of stride-1
    recall and exactly what the published span-dedup passes pay. Only
    digests shuffle (never window text). Owner resolution is
    ``min(occ_key) OVER (PARTITION BY h)`` — ONE exchange of the
    occurrence set plus a partition-local sort, versus the
    groupBy+join-back form's TWO full exchanges (measured at sf0.1:
    2.23 s -> 1.14 s; an Arrow-kernel map side measured the same, so
    the builtin HOF stays). The per-doc coverage window then sorts
    within doc partitions only (no global sort).
    """
    K = SUBSTR_WINDOW
    d = table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    base = d.select(
        "doc_id",
        F.size(ws).cast("long").alias("n_tokens"),
        F.greatest(F.size(ws) - K + 1, F.lit(1)).cast("long")
        .alias("n_windows"),
        ws.alias("w"),
    )
    wins = F.transform(
        F.sequence(F.lit(0), (F.col("n_windows") - 1).cast("int")),
        lambda i: F.array_join(F.slice("w", i + 1, K), " "),
    )
    occ = base.select(
        "doc_id",
        "n_tokens",
        F.posexplode(wins).alias("w_idx", "win"),
    ).select(
        "doc_id",
        "n_tokens",
        "w_idx",
        F.md5("win").alias("h"),
        (F.col("doc_id") * OWNER_BASE + F.col("w_idx")).alias("occ_key"),
    )
    dup = occ.withColumn(
        "owner_key", F.min("occ_key").over(Window.partitionBy("h"))
    ).filter(F.col("occ_key") != F.col("owner_key"))
    seq = Window.partitionBy("doc_id").orderBy("w_idx")
    covered = F.least(
        F.coalesce(F.lead("w_idx").over(seq) - F.col("w_idx"), F.lit(K)),
        F.lit(K),
        (F.col("n_tokens") - F.col("w_idx")).cast("int"),
    )
    per_doc = (
        dup.withColumn("covered", covered)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_dup_windows"),
            F.sum("covered").cast("long").alias("n_dup_tokens"),
        )
    )
    return base.select("doc_id", "n_tokens", "n_windows").join(
        per_doc, "doc_id", "left"
    ).select(
        "doc_id",
        "n_tokens",
        "n_windows",
        F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
        F.coalesce("n_dup_tokens", F.lit(0)).alias("n_dup_tokens"),
    )


ORACLE_LLM_DEDUP_SUBSTRING = f"""
WITH ws AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
base AS (
  SELECT doc_id, CAST(LEN(w) AS BIGINT) AS n_tokens,
         CAST(GREATEST(LEN(w) - {SUBSTR_WINDOW} + 1, 1) AS BIGINT)
           AS n_windows,
         w
  FROM ws
),
occ AS (
  SELECT doc_id, n_tokens, i AS w_idx,
    md5(array_to_string(w[i + 1 : i + {SUBSTR_WINDOW}], ' ')) AS h,
    doc_id * {OWNER_BASE} + i AS occ_key
  FROM base,
       LATERAL (SELECT UNNEST(generate_series(
         0, CAST(n_windows AS INT) - 1)) AS i)
),
owners AS (
  SELECT h, MIN(occ_key) AS owner_key FROM occ GROUP BY h
),
dup AS (
  SELECT o.doc_id, o.n_tokens, o.w_idx,
    LEAD(o.w_idx) OVER (PARTITION BY o.doc_id ORDER BY o.w_idx) AS nxt
  FROM occ o JOIN owners USING (h)
  WHERE o.occ_key <> owner_key
),
agg AS (
  SELECT doc_id,
    COUNT(*) AS n_dup_windows,
    CAST(SUM(LEAST(COALESCE(nxt - w_idx, {SUBSTR_WINDOW}),
                   {SUBSTR_WINDOW}, n_tokens - w_idx)) AS BIGINT)
      AS n_dup_tokens
  FROM dup GROUP BY doc_id
)
SELECT b.doc_id, b.n_tokens, b.n_windows,
  COALESCE(a.n_dup_windows, 0) AS n_dup_windows,
  COALESCE(a.n_dup_tokens, 0) AS n_dup_tokens
FROM base b LEFT JOIN agg a USING (doc_id)
"""


#: Bloom prejoin parameters: m = 4096 bits (64 BIGINT words), k = 3
#: md5-slice hashes. Production sizes m to the history cardinality
#: (~10 bits/key for ~1% FP); the FIXED test-scale m keeps the oracle
#: literal and deliberately spans the filter's whole operating range
#: across the test SFs — near-empty at sf0.001, ~25% load at sf0.01
#: (real false positives, engine-identical), SATURATED at the
#: synthesized sf1 (every probe a maybe: the undersized-filter failure
#: mode, where the exact verify carries the full incoming set — the
#: cost curve production sizing exists to avoid, priced honestly in
#: the bench row).
BLOOM_M_BITS = 4096
BLOOM_K = 3


def llm_dedup_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter prejoin for INCREMENTAL ingest dedup: the history
    corpus (doc_id % 10 < 8) is summarized into a 16 KB bit table; each
    incoming doc (doc_id % 10 >= 8) probes k=3 bits and only
    bloom-maybe docs proceed to the exact digest verification — the
    standard new-data-vs-petabyte-history gate (a Bloom side filter
    materialized as data, the pattern Spark's runtime row-level filters
    apply inside joins).

    Determinism discipline: the k hash functions are md5-slice BIGINTs
    (8 hex chars per slice of the content digest), so both engines set
    and probe IDENTICAL bits — the false-positive SET itself is
    engine-identical, which is what makes a probabilistic structure
    oracle-checkable. No false negatives by construction (the test
    pins: every exact dup is bloom_maybe=1); false positives appear as
    bloom_maybe=1 / is_exact_dup=0 rows — the honest cost of the
    filter, visible in the output.

    At 100 TB: the filter build is one map-side-combined bit_or over
    history digests (word-indexed, 2048 groups); probes broadcast-join
    the 16 KB table; ONLY maybe-docs reach the exact semi-join against
    history — incoming-scale work everywhere, history touched once.
    """
    d = table(spark, sf_dir, "documents")
    # The digest table feeds FOUR consumers (history bit-set build,
    # incoming probe, and both sides of the exact verify) — without
    # materialization each re-runs the text scan + md5 (4x the corpus
    # bytes through the hash, measured 2.0 s of llm_dedup_bloom's sf1
    # wall). localCheckpoint pins the (doc_id, dg) table — ~40 B/doc,
    # text dropped — so every consumer reads digests, not text; at
    # 100 TB that is one corpus scan instead of four, for a digest
    # table 1000x smaller than its source (the bm25 checkpointed-index
    # precedent).
    docs = d.select(
        "doc_id", F.md5(normalized_text()).alias("dg")
    ).localCheckpoint(eager=False)
    hist = docs.filter(F.col("doc_id") % 10 < 8)
    inc = docs.filter(F.col("doc_id") % 10 >= 8)

    def slices(df: DataFrame) -> DataFrame:
        hs = F.array(
            *[
                F.expr(
                    f"cast(conv(substring(dg, {1 + j * 8}, 8), 16, 10) "
                    f"as bigint) % {BLOOM_M_BITS}"
                )
                for j in range(BLOOM_K)
            ]
        )
        return df.select("doc_id", "dg", F.explode(hs).alias("h"))

    bloom = (
        slices(hist)
        .select(
            F.expr("h div 64").alias("w"),
            F.expr("shiftleft(1L, int(h % 64))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )
    hits = (
        slices(inc)
        .join(F.broadcast(bloom), F.expr("h div 64") == F.col("w"), "left")
        .select(
            "doc_id",
            "dg",
            F.when(
                F.col("word").isNotNull()
                & (F.expr("(word >> int(h % 64)) & 1") == 1),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("hit"),
        )
    )
    maybe = hits.groupBy("doc_id", "dg").agg(
        F.min("hit").alias("bloom_maybe")
    )
    exact = (
        inc.join(hist.select("dg").distinct(), "dg", "left_semi")
        .select("doc_id")
        .withColumn("is_exact_dup", F.lit(1))
    )
    return (
        maybe.join(exact, "doc_id", "left")
        .select(
            "doc_id",
            F.col("bloom_maybe").cast("long").alias("bloom_maybe"),
            F.coalesce("is_exact_dup", F.lit(0))
            .cast("long")
            .alias("is_exact_dup"),
        )
    )


ORACLE_LLM_DEDUP_BLOOM = f"""
WITH docs AS (
  SELECT doc_id,
         md5(LOWER(TRIM(regexp_replace(text, '\\s+', ' ', 'g')))) AS dg
  FROM documents
),
hist AS (SELECT * FROM docs WHERE doc_id % 10 < 8),
inc AS (SELECT * FROM docs WHERE doc_id % 10 >= 8),
hbits AS (
  SELECT ('0x' || substring(dg, 1 + j.j * 8, 8))::BIGINT
           % {BLOOM_M_BITS} AS h
  FROM hist, (VALUES (0), (1), (2)) j(j)
),
bloom AS (
  SELECT h // 64 AS w,
         bit_or(CAST(1 AS UBIGINT) << CAST(h % 64 AS INT)) AS word
  FROM hbits GROUP BY 1
),
probes AS (
  SELECT inc.doc_id, inc.dg,
         ('0x' || substring(dg, 1 + j.j * 8, 8))::BIGINT
           % {BLOOM_M_BITS} AS h
  FROM inc, (VALUES (0), (1), (2)) j(j)
),
hits AS (
  SELECT p.doc_id, p.dg,
         CASE WHEN b.word IS NOT NULL
                   AND ((b.word >> CAST(p.h % 64 AS INT)) & 1) = 1
              THEN 1 ELSE 0 END AS hit
  FROM probes p LEFT JOIN bloom b ON b.w = p.h // 64
),
maybe AS (
  SELECT doc_id, dg, MIN(hit) AS bloom_maybe FROM hits GROUP BY 1, 2
),
ex AS (SELECT DISTINCT i.doc_id FROM inc i JOIN hist h ON h.dg = i.dg)
SELECT
  m.doc_id,
  CAST(m.bloom_maybe AS BIGINT) AS bloom_maybe,
  CAST(CASE WHEN ex.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
    AS is_exact_dup
FROM maybe m LEFT JOIN ex USING (doc_id)
"""


#: containment threshold: doc A is an excerpt/quote of doc B when
#: |S(A) ∩ S(B)| / |S(A)| >= CT_TAU.
CT_TAU = 0.8


def llm_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup: find documents whose shingle set
    is >= {CT_TAU} contained in ANOTHER document — the quote-inclusion
    / excerpt-dup case Jaccard misses by construction (a 50-word quote
    inside a 5000-word page has Jaccard ~0.01 but containment ~1.0;
    RealNewsLike/C4 dedup and eval-set decontamination both need the
    directional form).

    Candidate generation is the containment variant of prefix
    filtering: C(A,B) >= tau bounds MISSES FROM A ONLY (<= |A| -
    ceil(tau|A|)), so A indexes just its ``|A| - ceil(tau|A|) + 1``
    globally rarest shingles while B indexes everything — and the join
    still runs on the rare tail, because the fan-out of shingle s is
    prefix_df(s) x full_df(s) and the df-ascending prefix keeps
    exactly the s with tiny full_df. A size prune (|B| >= tau|A|,
    necessary since C <= |B|/|A|) rides the same ranked projection.
    Verification ships the per-doc shingle arrays to the candidates
    (the array_jaccard discipline) and keeps integer
    ``inter * 1e6 div |A|`` ppm — bit-identical to the brute-force
    oracle, recall 1 by the prefix lemma. Output is DIRECTIONAL
    (contained -> container); near-equal pairs appear in both
    directions, which is the correct reading.

    Shape at 100 TB (r15, found weak by the bench rotation at 6.8x
    sf0.1; SCALE.md §30a decomposition): the shingle-set table
    ``base`` — (doc_id, distinct-shingle array, sz) — is built at DOC
    scale (sz = size(array_distinct(..)) needs no window) and
    ``localCheckpoint``-pinned: it feeds the exploded index, the
    prefix rank, AND the verify arrays directly, so the corpus
    tokenizes exactly once and nothing row-scale is materialized (the
    r15 A/B vs a row-scale ranked-table checkpoint: 1.47 vs 1.75 s at
    sf0.1, and the collect_list re-aggregation disappears entirely).
    Per-shingle document frequency is a COUNT window over ``s`` (not a
    groupBy + join-back, which shuffles the corpus-scale shingle table
    twice: measured 1.72 s vs 0.56 s for the attach alone); the df
    rank then rides one doc_id exchange. The full inverted-index side
    needs no df, so it re-derives from the checkpoint and shares the
    join's s-partitioning. Otherwise the same scale contract as
    llm_dedup_prefixfilter — the inverted index is (1-tau)-sized on
    the A side, text never ships, candidates per doc are few by
    construction; a pathologically hot shingle skews the s-window
    exactly as it would the groupBy form, and AQE skew-join covers
    the candidate join.
    """
    docs = table(spark, sf_dir, "documents")
    base = (
        with_shingles(docs)
        .select("doc_id", F.array_distinct("shingles").alias("arr"))
        .withColumn("sz", F.size("arr"))
        .localCheckpoint(eager=False)
    )
    sh = base.select("doc_id", "sz", F.explode("arr").alias("s"))
    by_s = Window.partitionBy("s")
    by_doc = Window.partitionBy("doc_id")
    prefix = (
        sh.withColumn("df", F.count(F.lit(1)).over(by_s))
        .withColumn("r", F.row_number().over(by_doc.orderBy("df", "s")))
        .filter(
            F.col("r") <= F.col("sz") - F.ceil(F.lit(CT_TAU) * F.col("sz")) + 1
        )
        .select(F.col("doc_id").alias("doc_a"), "s", F.col("sz").alias("sz_a"))
    )
    full = sh.select(
        F.col("doc_id").alias("doc_b"), "s", F.col("sz").alias("sz_b")
    )
    cands = (
        prefix.join(full, "s")
        .filter(
            (F.col("doc_a") != F.col("doc_b"))
            & (F.col("sz_b") >= F.ceil(F.lit(CT_TAU) * F.col("sz_a")))
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    a = base.select(F.col("doc_id").alias("doc_a"), F.col("arr").alias("arr_a"))
    b = base.select(F.col("doc_id").alias("doc_b"), F.col("arr").alias("arr_b"))
    inter = F.size(F.array_intersect("arr_a", "arr_b"))
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.expr(
                f"{1_000_000} * size(array_intersect(arr_a, arr_b))"
                " div size(arr_a)"
            ).alias("containment_ppm"),
            F.size("arr_a").cast("long").alias("n_shingles_a"),
        )
        .filter(
            inter * 10 >= F.lit(int(CT_TAU * 10)) * F.size("arr_a")
        )
    )


ORACLE_LLM_DEDUP_CONTAINMENT = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws, text FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, s
  FROM (
    SELECT doc_id,
           unnest([array_to_string(ws[i:i+3], ' ')
                   for i in generate_series(1, LEN(ws) - 3)]) AS s
    FROM w WHERE LEN(ws) >= 4
    UNION ALL
    SELECT doc_id, text AS s FROM w WHERE LEN(ws) < 4
  )
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT
  i.doc_a,
  i.doc_b,
  i.inter * 1000000 // za.sz AS containment_ppm,
  za.sz AS n_shingles_a
FROM inter i
JOIN sizes za ON i.doc_a = za.doc_id
WHERE i.inter * 10 >= {int(CT_TAU * 10)} * za.sz
"""


QUERIES = {
    "llm_dedup_exact": spec(
        llm_dedup_exact, ORACLE_LLM_DEDUP_EXACT, "llm",
        doc="exact dedup via content hash, keep min doc_id",
    ),
    "llm_dedup_soft": spec(
        llm_dedup_soft, ORACLE_LLM_DEDUP_SOFT, "llm",
        doc="soft dedup: 1/|cluster| sampling weights, no row dropped",
    ),
    "llm_dedup_keep_best": spec(
        llm_dedup_keep_best, ORACLE_LLM_DEDUP_KEEP_BEST, "llm",
        doc="exact dedup keeping the best-quality copy (packed max_by)",
    ),
    "llm_dedup_minhash": spec(
        llm_dedup_minhash, ORACLE_LLM_DEDUP_MINHASH, "llm",
        doc="MinHash 128-perm + 32-band LSH, exact-Jaccard verified "
            "(oracle: brute-force exact Jaccard >= 0.75)",
    ),
    "llm_dedup_prefixfilter": spec(
        llm_dedup_prefixfilter, ORACLE_LLM_DEDUP_PREFIXFILTER, "llm",
        doc="exact Jaccard join via PPJoin-style prefix filtering "
            "(recall 1 by construction; oracle: brute force >= 0.5)",
    ),
    "llm_dedup_containment": spec(
        llm_dedup_containment, ORACLE_LLM_DEDUP_CONTAINMENT, "llm",
        doc="directional excerpt/quote dedup: shingle containment "
            ">= 0.8 via asymmetric prefix filtering (recall 1; "
            "oracle: brute force)",
    ),
    "llm_dedup_fuzzy": spec(
        llm_dedup_fuzzy, ORACLE_LLM_DEDUP_FUZZY, "llm",
        doc="Levenshtein near-dedup, (lang, length-band)-blocked, prefix-bounded",
    ),
    "llm_dedup_simhash": spec(
        llm_dedup_simhash, ORACLE_LLM_DEDUP_SIMHASH, "llm",
        doc="60-bit SimHash + band blocking, Hamming<=3 (oracle-checked)",
    ),
    "llm_dedup_ngram": spec(
        llm_dedup_ngram, ORACLE_LLM_DEDUP_NGRAM, "llm",
        doc="exact 4-gram Jaccard top-20 pairs (ground truth)",
    ),
    "llm_dedup_cc": spec(
        llm_dedup_cc, ORACLE_LLM_DEDUP_CC, "llm",
        doc="transitive near-dup clustering (iterative CC vs recursive CTE)",
    ),
    "llm_dedup_bloom": spec(
        llm_dedup_bloom, ORACLE_LLM_DEDUP_BLOOM, "llm",
        doc="Bloom-filter prejoin for incremental ingest dedup "
            "(md5-slice bits, engine-identical FP set, exact verify)",
    ),
    "llm_dedup_incremental": spec(
        llm_dedup_incremental, ORACLE_LLM_DEDUP_INCREMENTAL, "llm",
        doc="new-batch dedup against the corpus hash index (with lineage)",
    ),
    "llm_dedup_passage": spec(
        llm_dedup_passage, ORACLE_LLM_DEDUP_PASSAGE, "llm",
        doc="passage-level (16-word chunk) cross-document dedup",
    ),
    "llm_dedup_substring": spec(
        llm_dedup_substring, ORACLE_LLM_DEDUP_SUBSTRING, "llm",
        doc="stride-1 sliding-window (8-token) substring-span dedup "
            "with merged span coverage",
    ),
}
