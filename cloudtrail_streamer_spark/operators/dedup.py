"""Near-duplicate detection operators (SURVEY.md §2.B B-56 + north-star
dedup family: MinHash-LSH, SimHash, n-gram Jaccard).

Everything is deterministic, seed-fixed, and built from ``xxhash64`` /
higher-order array functions — no MLlib, no RDDs, no Python in the row
path (SURVEY.md §4.2 MinHash row).

Scale architecture (the reason these exist at all): pairwise comparison
of N docs is O(N²) — at 100 TB that is never computed. Both MinHash-LSH
and SimHash reduce near-dup search to an equi-join on a bucket key
(band hash / signature chunk), so the only shuffle is keyed by bucket
and each task compares only within-bucket candidates. The exact-Jaccard
verification then runs on the (tiny) candidate set.

DuckDB has no xxhash64, so the hash-based ops are Tier R (driver
rows-only); their recall/containment properties are asserted in
tests/test_engine.py instead (exact duplicates MUST collide).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudtrail_streamer_spark.catalog import table
from cloudtrail_streamer_spark.registry import query

N_HASHES = 32  # MinHash signature length
N_BANDS = 8  # LSH bands (4 rows each): catches Jaccard ≳ 0.6 pairs


def _shingles(d: DataFrame) -> DataFrame:
    """doc_id + distinct word-3-shingle array (docs <3 tokens fall back
    to the whole text as a single shingle)."""
    return d.select(
        "doc_id",
        F.expr(
            """
            array_distinct(
              CASE WHEN size(split(lower(text), ' ')) >= 3
                   THEN transform(
                          sequence(0, size(split(lower(text), ' ')) - 3),
                          i -> concat_ws(' ',
                                 split(lower(text), ' ')[i],
                                 split(lower(text), ' ')[i + 1],
                                 split(lower(text), ' ')[i + 2]))
                   ELSE array(lower(text))
              END)
            """
        ).alias("shingles"),
    )


def minhash_candidates(docs: DataFrame) -> DataFrame:
    """MinHash-LSH candidate pairs over any (doc_id, text) DataFrame.

    signature[s] = min over shingles of xxhash64(shingle, seed_s);
    band j hashes signature rows 4j..4j+3; docs sharing any (band, hash)
    bucket become candidates. Returns distinct pairs (id_a < id_b) with
    the number of colliding bands.
    """
    sh = _shingles(docs)
    sig = sh.select(
        "doc_id",
        F.expr(
            f"""
            transform(sequence(0, {N_HASHES - 1}),
                      s -> array_min(transform(shingles,
                             sh -> xxhash64(concat(sh, '#', CAST(s AS STRING))))))
            """
        ).alias("sig"),
    )
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"""
                transform(sequence(0, {N_BANDS - 1}),
                          b -> xxhash64(concat_ws(',',
                                 transform(slice(sig, b * 4 + 1, 4),
                                           v -> CAST(v AS STRING)))))
                """
            )
        ).alias("band_id", "band_hash"),
    )
    a = bands.select(
        F.col("doc_id").alias("id_a"), "band_id", "band_hash"
    )
    b = bands.select(
        F.col("doc_id").alias("id_b"), "band_id", "band_hash"
    )
    return (
        a.join(b, ["band_id", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


@query("dedup_near_minhash", survey_id="B-56")  # Tier R (xxhash64 is Spark-only)
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH over the documents table (see minhash_candidates;
    recall property tested on a synthetic near-dup corpus in
    tests/test_engine.py — the fixture has no engineered dup groups)."""
    return minhash_candidates(table(spark, sf_dir, "documents"))


def simhash_candidates(docs: DataFrame) -> DataFrame:
    """SimHash near-dup candidates over any (doc_id, text) DataFrame.

    Per doc: fold token hashes into 64 signed bit-counters (+1/-1 per
    bit), sign → bit. The 64-bit signature is emitted as eight 8-bit
    chunks; pairs agreeing on ≥2 chunks become candidates (a pair at
    Hamming distance h keeps ≥ 8-h chunks intact, so h ≤ 6 is caught
    with certainty; measured near-dup distances run 0-8).
    """
    d = docs
    sig = d.select(
        "doc_id",
        # counters[i] = sum over tokens of (bit_i(xxhash64(tok))*2 - 1)
        F.expr(
            """
            transform(sequence(0, 63),
              i -> aggregate(split(lower(text), ' '),
                             0L,
                             (acc, tok) -> acc
                               + (CASE WHEN (shiftright(xxhash64(tok), i) & 1) = 1
                                       THEN 1 ELSE -1 END)))
            """
        ).alias("counters"),
    ).select(
        "doc_id",
        # chunk j (0..7) packs bits 8j..8j+7 (bit set iff counter > 0)
        F.expr(
            """
            transform(sequence(0, 7),
              j -> aggregate(sequence(0, 7),
                             0L,
                             (acc, k) -> acc
                               + (CASE WHEN counters[j * 8 + k] > 0
                                       THEN shiftleft(1L, k) ELSE 0L END)))
            """
        ).alias("chunks"),
    )
    parts = sig.select("doc_id", F.posexplode("chunks").alias("chunk_id", "chunk_val"))
    a = parts.select(F.col("doc_id").alias("id_a"), "chunk_id", "chunk_val")
    b = parts.select(F.col("doc_id").alias("id_b"), "chunk_id", "chunk_val")
    return (
        a.join(b, ["chunk_id", "chunk_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_chunks"))
        .where(F.col("n_chunks") >= 2)
    )


@query("dedup_simhash", survey_id="north-star")  # Tier R (xxhash64 is Spark-only)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash over the documents table (see simhash_candidates)."""
    return simhash_candidates(table(spark, sf_dir, "documents"))


_JACCARD_ORACLE = """
WITH grams AS (
  SELECT doc_id,
         list_distinct(
           CASE WHEN len(string_split(lower(text), ' ')) >= 2
                THEN list_transform(
                       string_split(lower(text), ' ')[1:len(string_split(lower(text), ' ')) - 1],
                       (x, i) -> concat(x, ' ', string_split(lower(text), ' ')[i + 1]))
                ELSE [lower(text)]
           END) AS bigrams
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(CAST(len(list_intersect(a.bigrams, b.bigrams)) AS DOUBLE)
             / len(list_distinct(a.bigrams || b.bigrams)), 4) AS jaccard
FROM grams a JOIN grams b ON b.doc_id = a.doc_id + 1
"""


@query("text_ngram_jaccard", oracle=_JACCARD_ORACLE, survey_id="north-star")
def text_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact bigram-Jaccard similarity for consecutive doc-id pairs —
    the verification kernel that LSH candidates feed at scale (kept to a
    linear pair set here so the DuckDB oracle is exact)."""
    d = table(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id",
        F.expr(
            """
            array_distinct(
              CASE WHEN size(split(lower(text), ' ')) >= 2
                   THEN transform(
                          sequence(0, size(split(lower(text), ' ')) - 2),
                          i -> concat(split(lower(text), ' ')[i], ' ',
                                      split(lower(text), ' ')[i + 1]))
                   ELSE array(lower(text))
              END)
            """
        ).alias("bigrams"),
    )
    a = grams.select(F.col("doc_id").alias("id_a"), F.col("bigrams").alias("ga"))
    b = grams.select(F.col("doc_id").alias("id_b"), F.col("bigrams").alias("gb"))
    inter = F.size(F.array_intersect(F.col("ga"), F.col("gb")))
    union = F.size(F.array_union(F.col("ga"), F.col("gb")))
    return (
        a.join(b, F.col("id_b") == F.col("id_a") + 1)
        .select(
            "id_a",
            "id_b",
            F.round(inter.cast("double") / union, 4).alias("jaccard"),
        )
    )
