"""Near-duplicate detection operators (SURVEY.md §2.B B-56 + north-star
dedup family: MinHash-LSH, SimHash, n-gram Jaccard).

Everything is deterministic, seed-fixed, and built from md5-derived
hashes / higher-order array functions — no MLlib, no RDDs, no Python in
the row path (SURVEY.md §4.2 MinHash row).

Scale architecture (the reason these exist at all): pairwise comparison
of N docs is O(N²) — at 100 TB that is never computed. Both MinHash-LSH
and SimHash reduce near-dup search to an equi-join on a bucket key
(band hash / signature chunk), so the only shuffle is keyed by bucket
and each task compares only within-bucket candidates. The exact-Jaccard
verification then runs on the (tiny) candidate set.

Every op here is Tier H since r9: the r1 xxhash64 hash family (which
DuckDB cannot compute, SURVEY §5.3 rule 7) was replaced by md5-derived
families both engines evaluate byte-identically — MinHash signatures
are 32 affine permutations of ONE md5-prefix per shingle (_MH_*, also
32× fewer digests), SimHash bit-counters fold the two 32-bit halves of
one md5 per token. Signatures, buckets, candidate pairs, recall
certificates, and the fused pipeline's end-to-end decision table all
hash-match declarative DuckDB mirrors; recall/containment properties
remain asserted in tests/test_engine.py (exact duplicates MUST
collide).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudtrail_streamer_spark.catalog import table
from cloudtrail_streamer_spark.registry import query

N_HASHES = 32  # MinHash signature length
N_BANDS = 8  # LSH bands (4 rows each): catches Jaccard ≳ 0.6 pairs


def _shingles(d: DataFrame) -> DataFrame:
    """doc_id + distinct word-3-shingle array (docs <3 tokens fall back
    to the whole text as a single shingle).

    Let-binding idiom (the _MH_SIG_EXPR lesson, r11): the token array is
    bound ONCE per row as the lambda variable ``ws``. The r1-r10 form
    re-evaluated split(lower(text), ' ') THREE TIMES PER SEQUENCE
    ELEMENT inside the shingle lambda (HOF bodies are interpreted, no
    cross-element CSE), i.e. O(tokens x text_len) per doc — measured
    30.0 s -> 1.9 s (-94%) for the sf1 shingle pass, row-identical
    (r11 A/B, /tmp/ab_mutate_letbind.log)."""
    return d.select(
        "doc_id",
        F.expr(
            """
            transform(array(split(lower(text), ' ')), ws ->
              array_distinct(
                CASE WHEN size(ws) >= 3
                     THEN transform(
                            sequence(0, size(ws) - 3),
                            i -> concat_ws(' ', ws[i], ws[i + 1], ws[i + 2]))
                     ELSE array(lower(text))
                END))[0]
            """
        ).alias("shingles"),
    )


# Cross-engine affine MinHash family (r9, upgrades B-56 R→H): ONE md5
# per shingle (first 8 hex digits → h < 2³²), then N_HASHES affine
# permutations h_s = (A[s]·h + B[s]) mod P over the md5-uniform h —
# 32× fewer digest computations per shingle than a per-seed digest
# family (the r6–r8 pipeline's shape) at the same LSH quality
# (min-wise over a pairwise-independent affine family), and, unlike
# the r1 xxhash64 family, byte-identical in DuckDB
# ('0x'||substr(md5,1,8) cast ≡ Spark conv(substring(md5,1,8),16,10) —
# SURVEY §5.3 rule 7's one cross-engine hash). Bounds: A < 2²⁹ (odd),
# B < 2³¹, h < 2³² → A·h+B < 2⁶² — wrap-free in BOTH engines (Spark
# LONG would wrap silently, DuckDB BIGINT would error; neither can).
# Constants: random.Random(56).sample, fixed literals in both SQL texts.
_MH_P = 2147483647  # 2^31 - 1, prime
_MH_A = [
    12344143, 24048161, 32583279, 58443359, 68042435, 72689605,
    100924733, 101477605, 134938855, 146912281, 167108397, 193776389,
    198313467, 200318277, 204095963, 210424905, 222497373, 226463117,
    230329395, 234872257, 247965843, 264858721, 274276559, 323347783,
    362234715, 402317679, 413016357, 413387977, 413854211, 451578829,
    476880259, 508601319,
]
_MH_B = [
    1666059, 2077376, 11269744, 74798445, 211795242, 290055310,
    377265315, 416205143, 772151232, 775560042, 792644388, 798252504,
    827007218, 997822056, 1023021252, 1066946695, 1069880732,
    1103180324, 1130081766, 1180258104, 1190688165, 1219602250,
    1252759788, 1310134065, 1374437243, 1412284992, 1448524527,
    1448751744, 1455159281, 1579966976, 1703092456, 1875335826,
]
if not (len(_MH_A) == len(_MH_B) == N_HASHES):  # survives python -O
    raise ValueError("MinHash constant tables must have N_HASHES entries each")
_MH_A_CSV = ", ".join(str(a) for a in _MH_A)
_MH_B_CSV = ", ".join(str(b) for b in _MH_B)

# Per-shingle 32-bit hash (one md5 per shingle, computed ONCE), then the
# N_HASHES mins are UNROLLED as independent array_min/list_min exprs over
# that precomputed hash list — the loop-over-s lambda form
# (element_at(array(...), s+1) inside a nested transform) re-evaluated
# the 32-literal array per element and measured 10× slower in BOTH
# engines at 500 docs.
_MH_HV_EXPR = (
    "transform(shingles, x -> "
    "CAST(conv(substring(md5(x), 1, 8), 16, 10) AS BIGINT))"
)
_MH_HV_DUCK = (
    "list_transform(shingles, x -> "
    "CAST('0x' || substr(md5(x), 1, 8) AS BIGINT))"
)

# Spark signature expression over a relation exposing ``shingles``.
# Let-binding idiom (transform(array(e), x -> body)[0]): the per-shingle
# hash array is bound ONCE as the lambda variable ``hv`` — a chained
# hv-select would be re-inlined into all 32 array_min references by
# CollapseProject, recomputing the md5s 32× (the dedup_simhash 443-s
# lesson, same commit).
_MH_SIG_EXPR = "transform(array({hv}), hv -> array({mins}))[0]".format(
    hv=_MH_HV_EXPR,
    mins=", ".join(
        f"array_min(transform(hv, h -> ({a} * h + {b}) % {_MH_P}))"
        for a, b in zip(_MH_A, _MH_B)
    ),
)

# DuckDB twin over a CTE exposing ``hv``.
_MH_SIG_DUCK = "[{}]".format(
    ", ".join(
        f"list_min(list_transform(hv, h -> ({a} * h + {b}) % {_MH_P}))"
        for a, b in zip(_MH_A, _MH_B)
    )
)

# DuckDB twin of the hashing + banding tail; format with the CTE name
# that provides (doc_id, shingles).
_MH_CAND_DUCK_TAIL = f"""
hv AS (
  SELECT doc_id, {_MH_HV_DUCK} AS hv FROM {{sh}}
),
sig AS (
  SELECT doc_id, {_MH_SIG_DUCK} AS sig FROM hv
),
bands AS (
  SELECT doc_id, b.band_id,
         CAST('0x' || substr(md5(array_to_string(
             list_transform(sig[b.band_id * 4 + 1 : b.band_id * 4 + 4],
                            v -> CAST(v AS VARCHAR)), ',')), 1, 15) AS BIGINT)
           AS band_hash
  FROM sig, (SELECT unnest(range(0, {N_BANDS})) AS band_id) b
)
"""

# Band key as an 8-byte BIGINT (first 15 md5 hex digits < 2^60), not the
# 32-char digest string: the (band_id, band_hash) bucket join is the
# ONLY data-sized shuffle in the LSH stage, so the key should be the
# narrowest deterministic value both engines share.
_MH_BANDS_EXPR = f"""
transform(sequence(0, {N_BANDS - 1}),
  b -> CAST(conv(substring(md5(concat_ws(',',
         transform(slice(sig, b * 4 + 1, 4), v -> CAST(v AS STRING)))),
         1, 15), 16, 10) AS BIGINT))
"""


def minhash_candidates(docs: DataFrame) -> DataFrame:
    """MinHash-LSH candidate pairs over any (doc_id, text) DataFrame.

    signature[s] = min over shingles of (A[s]·md5_32(shingle) + B[s])
    mod P (the cross-engine affine family above); band j hashes
    signature rows 4j..4j+3; docs sharing any (band, hash) bucket
    become candidates. Returns distinct pairs (id_a < id_b) with the
    number of colliding bands.
    """
    return _candidates_from_shingles(_shingles(docs))


def _candidates_from_shingles(sh: DataFrame) -> DataFrame:
    """LSH candidate pairs from a precomputed (doc_id, shingles) relation
    — callers that also need the shingles for exact verification pass a
    persisted ``sh`` so the corpus is tokenized exactly once."""
    sig = sh.select("doc_id", F.expr(_MH_SIG_EXPR).alias("sig"))
    bands = sig.select(
        "doc_id",
        F.posexplode(F.expr(_MH_BANDS_EXPR)).alias("band_id", "band_hash"),
    )
    # bands feeds both sides of the self-join; persist so the corpus is
    # shingled+hashed once — the cache is 8 small rows per doc, not text
    bands = bands.persist()
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


# DuckDB mirrors of _MUTATE_SQL and _shingles (1-based list lambdas).
_DUCK_MUTATE = """
array_to_string(
  list_transform(
    (string_split({t}, ' '))[1:greatest(3,
        CAST(ceil(len(string_split({t}, ' ')) * 0.9) AS INT))],
    (x, i) -> CASE WHEN i - 1 = CAST(floor(len(string_split({t}, ' ')) / 2.0) AS INT)
                   THEN 'xqzsubstituted' ELSE x END),
  ' ')
"""

_DUCK_SHINGLES = """
list_distinct(CASE WHEN len(string_split({t}, ' ')) >= 3
  THEN list_transform(
         (string_split({t}, ' '))[1:len(string_split({t}, ' ')) - 2],
         (x, i) -> concat(x, ' ', string_split({t}, ' ')[i + 1],
                          ' ', string_split({t}, ' ')[i + 2]))
  ELSE [{t}] END)
"""

_MINHASH_ORACLE = f"""
WITH sh AS (
  SELECT doc_id,
         {_DUCK_SHINGLES.format(t="lower(text)")} AS shingles
  FROM documents
),
{_MH_CAND_DUCK_TAIL.format(sh="sh")}
SELECT CAST(a.doc_id AS BIGINT) AS id_a,
       CAST(b.doc_id AS BIGINT) AS id_b,
       CAST(COUNT(*) AS BIGINT) AS n_bands
FROM bands a
JOIN bands b ON a.band_id = b.band_id AND a.band_hash = b.band_hash
            AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


@query("dedup_near_minhash", oracle=_MINHASH_ORACLE, survey_id="B-56")
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH over the documents table (see minhash_candidates;
    recall property tested on a synthetic near-dup corpus in
    tests/test_engine.py — the fixture has no engineered dup groups).

    Tier H since r9 (was the oldest R row): the r1 xxhash64 signature
    family had no DuckDB twin (SURVEY §5.3 rule 7); the affine-over-md5
    family above is byte-identical in both engines, so signatures,
    band buckets, and candidate pairs all hash-certify. LSH recall is
    probabilistic but both engines miss IDENTICALLY — determinism is
    what the driver checks; recall is pinned by dedup_minhash_recall."""
    return minhash_candidates(table(spark, sf_dir, "documents"))


# Seeded near-dup mutation (SURVEY B-56 recall check): truncate to the
# first ceil(0.9n) tokens and substitute the token at floor(n/2) —
# pure integer/list arithmetic so tests/test_engine.py can recompute the
# IDENTICAL corpus in DuckDB and cross-check the exact-Jaccard truth set.
# Let-binding idiom (the _MH_SIG_EXPR lesson, r11): the token array is
# bound ONCE per row as ``ws``; the r1-r10 form re-evaluated
# split(lower(text), ' ') once PER TOKEN inside the substitution lambda
# (interpreted HOF body, no cross-element CSE) — O(tokens x text_len)
# per doc, and the second-generation mutation (_second_mutation) pays it
# on top of the first. Measured 17.8 s -> 2.0 s (-88%) for the sf1
# seeded-corpus pass, row-identical (r11 A/B).
_MUTATE_SQL = """
transform(array(split(lower(text), ' ')), ws ->
  concat_ws(' ',
    transform(
      slice(ws, 1, greatest(3, cast(ceil(size(ws) * 0.9) AS INT))),
      (tok, i) -> IF(i = cast(floor(size(ws) / 2.0) AS INT),
                     'xqzsubstituted', tok))))[0]
"""

_SEED_OFFSET = 1000000


def _guarded_base_id():
    """doc_id pass-through with a JVM-side loud-failure guard: seeded
    corpora re-key mutations at +_SEED_OFFSET / +2·_SEED_OFFSET, so a
    base id >= _SEED_OFFSET (documents grows past 1M around sf10) would
    silently alias a mutation id — and since the DuckDB oracle applies
    the identical offsets, BOTH engines would corrupt identically and
    the hash check would still 'pass' (the ADVICE r05 latent-offset
    class). One codegen branch per row; mutations derive from base, so
    guarding the source bounds every generation."""
    return F.when(F.col("doc_id") < _SEED_OFFSET, F.col("doc_id")).otherwise(
        F.expr(
            "CAST(raise_error('seeded corpus: doc_id >= 1000000 would collide "
            "with mutation ids — raise _SEED_OFFSET') AS BIGINT)"
        )
    )


def seeded_neardup_corpus(docs: DataFrame) -> DataFrame:
    """Originals plus deterministic near-duplicate mutations (mutated ids
    offset by _SEED_OFFSET). The mutation leaves most 3-shingles intact,
    so (doc, mutation) pairs land around Jaccard 0.6-0.9 — exactly the
    band the 8×4 LSH parameters are tuned to catch."""
    base = docs.select(
        _guarded_base_id().alias("doc_id"), F.lower(F.col("text")).alias("text")
    )
    mutated = base.select(
        (F.col("doc_id") + _SEED_OFFSET).alias("doc_id"),
        F.expr(_MUTATE_SQL).alias("text"),
    )
    return base.unionByName(mutated)


_RECALL_ORACLE = f"""
WITH base AS (SELECT doc_id, lower(text) AS text FROM documents),
corpus AS (
  SELECT doc_id, text FROM base
  UNION ALL
  SELECT doc_id + {_SEED_OFFSET}, {_DUCK_MUTATE.format(t="text")} FROM base
),
sh AS (
  SELECT doc_id, {_DUCK_SHINGLES.format(t="text")} AS shingles FROM corpus
),
{_MH_CAND_DUCK_TAIL.format(sh="sh")},
cand AS (
  SELECT DISTINCT a.doc_id AS id_a
  FROM bands a
  JOIN bands b ON a.band_id = b.band_id AND a.band_hash = b.band_hash
              AND b.doc_id = a.doc_id + {_SEED_OFFSET}
),
truth AS (
  SELECT a.doc_id
  FROM sh a JOIN sh b ON b.doc_id = a.doc_id + {_SEED_OFFSET}
  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        / len(list_distinct(a.shingles || b.shingles)) >= 0.6
),
flag AS (
  SELECT t.doc_id, CASE WHEN c.id_a IS NULL THEN 0 ELSE 1 END AS caught
  FROM truth t LEFT JOIN cand c ON c.id_a = t.doc_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_truth,
       CAST(SUM(caught) AS BIGINT) AS n_caught,
       round(CAST(SUM(caught) AS DOUBLE) / COUNT(*), 4) AS recall
FROM flag
"""


@query("dedup_minhash_recall", oracle=_RECALL_ORACLE, survey_id="B-56")
def dedup_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH recall against an exact-Jaccard truth set on a seeded
    near-dup corpus — the B-56 verification SURVEY §5 calls for.

    Truth = seeded (doc, mutation) pairs whose EXACT 3-shingle Jaccard
    ≥ 0.6 (linear in N — only seeded pairs are scored, so the check
    itself stays scale-safe; tests/test_engine.py additionally asserts
    recall ≥ 0.9). Returns one row (n_truth, n_caught, recall).

    Tier H since r9: with the affine-over-md5 signature family both
    engines draw IDENTICAL signatures, so the realized recall itself is
    a deterministic cross-engine value — the driver now certifies the
    exact (n_truth, n_caught, recall) triple instead of a rows-only
    row (the agg_approx_bounds certificate pattern applied to LSH)."""
    docs = table(spark, sf_dir, "documents")
    corpus = seeded_neardup_corpus(docs)
    # one shingle pass feeds BOTH the LSH candidates and the exact-Jaccard
    # truth set; persisted so the corpus is read and tokenized once
    sh = _shingles(corpus).persist()
    cands = _candidates_from_shingles(sh).where(
        F.col("id_b") == F.col("id_a") + _SEED_OFFSET
    )
    a = sh.where(F.col("doc_id") < _SEED_OFFSET).select(
        "doc_id", F.col("shingles").alias("sa")
    )
    b = sh.where(F.col("doc_id") >= _SEED_OFFSET).select(
        (F.col("doc_id") - _SEED_OFFSET).alias("doc_id"), F.col("shingles").alias("sb")
    )
    jac = F.size(F.array_intersect("sa", "sb")).cast("double") / F.size(
        F.array_union("sa", "sb")
    )
    truth = a.join(b, "doc_id").where(jac >= 0.6).select("doc_id")
    flagged = truth.join(
        cands.select(F.col("id_a").alias("doc_id"), F.lit(1).alias("caught")),
        "doc_id",
        "left",
    )
    n_caught = F.sum(F.coalesce("caught", F.lit(0)))
    return flagged.agg(
        F.count(F.lit(1)).alias("n_truth"),
        n_caught.cast("long").alias("n_caught"),
        F.round(n_caught / F.count(F.lit(1)), 4).alias("recall"),
    )


_CONTAIN_ORACLE = f"""
WITH base AS (SELECT doc_id, lower(text) AS text FROM documents),
corpus AS (
  SELECT doc_id, text FROM base
  UNION ALL
  SELECT doc_id + {_SEED_OFFSET}, {_DUCK_MUTATE.format(t="text")} FROM base
),
sh AS (
  SELECT doc_id, {_DUCK_SHINGLES.format(t="text")} AS shingles FROM corpus
),
{_MH_CAND_DUCK_TAIL.format(sh="sh")},
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN bands b ON a.band_id = b.band_id AND a.band_hash = b.band_hash
              AND a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b,
       round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
             / len(list_distinct(sa.shingles || sb.shingles)), 4) AS jaccard,
       round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
             / len(sb.shingles), 4) AS containment
FROM cand c
JOIN sh sa ON sa.doc_id = c.id_a
JOIN sh sb ON sb.doc_id = c.id_b
WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
      / len(sb.shingles) >= 0.8
"""


@query("text_minhash_containment", oracle=_CONTAIN_ORACLE, survey_id="north-star")
def text_minhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed CONTAINMENT detection over the LSH candidate set — the
    excerpt/quote pass of a pretraining dedup stack. Symmetric Jaccard
    misses a short document fully contained in a long one (the union
    dominates); containment C(b→a) = |A∩B| / |B| flags it. The seeded
    corpus makes hits certain: each mutation is a 90%-truncation of its
    original, so its shingles are ≈contained while Jaccard can sit
    below a dedup threshold. Emits candidate pairs with BOTH scores at
    containment ≥ 0.8 — the decision table for "drop the excerpt, keep
    the source".

    Scale shape: identical to the MinHash ops — candidates come from
    the banded equi-join (never all pairs), and the exact set math runs
    only on candidate pairs. A production stack lowers the LSH
    threshold (more bands, shorter rows) when tuning for containment
    rather than symmetric similarity; the decision rule downstream is
    the only change. Exact-integer set sizes → one rounded double per
    score, mirrored (SURVEY §5.3)."""
    docs = table(spark, sf_dir, "documents")
    corpus = seeded_neardup_corpus(docs)
    sh = _shingles(corpus).persist()
    cands = _candidates_from_shingles(sh).select("id_a", "id_b")
    sa = sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sa"))
    sb = sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb")).cast("double")
    jac = inter / F.size(F.array_union("sa", "sb"))
    containment = inter / F.size("sb")
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .where(containment >= 0.8)
        .select(
            "id_a",
            "id_b",
            F.round(jac, 4).alias("jaccard"),
            F.round(containment, 4).alias("containment"),
        )
    )


def connected_components(
    edges: DataFrame, nodes: DataFrame, rounds: int = 5
) -> DataFrame:
    """Connected components over an undirected edge list — the dedup
    GROUPING step: near-dup candidate pairs form a graph; each component
    is one duplicate cluster and min(id) its canonical representative.

    Min-label propagation fused with pointer jumping: each round (1)
    lowers every node's label to the minimum over its neighbors' labels,
    then (2) rewrites label[v] ← label[label[v]]. Jumping doubles the
    distance a label travels per round, so convergence is O(log diameter)
    rounds — ``rounds=5`` covers diameter ≈ 2⁵; at 100 TB this is the
    GraphX/large-star shape: every step is an equi-join + min-aggregate
    keyed by node id, no driver loop-carried data. Lineage is truncated
    per round (localCheckpoint) so the plan doesn't deepen geometrically.

    Every join carries an explicit MERGE hint: labels/nb/ptr are all
    O(|nodes|) relations that GROW with the data, and without the hint
    AQE's runtime size estimate happily converts the loop's joins to
    broadcasts — which re-ships the full label table to every executor
    per round (5× at 1000 executors) and OOM'd the sf1 stress drive
    under the plain driver-protocol session. Sort-merge keyed by node id
    is the GraphX-shaped plan: after the first exchange the loop reuses
    the same hash partitioning, and sorts spill instead of dying.

    edges: columns (id_a, id_b); nodes: column (id). Returns (id, comp).
    """
    # Persist the undirected edge list (r11): every round executes as its
    # own AQE query (localCheckpoint → toRdd materializes the stages), so
    # exchange reuse does NOT span rounds — without the persist each of
    # the ``rounds`` iterations re-ran the caller's edge subtree TWICE
    # (once per union arm), i.e. 2·rounds executions of the LSH-verify
    # join feeding pipeline_dedup_e2e (measured 22.8 s → 8.4 s CC
    # construction at sf0.1r). Same query-lifetime persist discipline as
    # the callers' sh/bands caches; O(|edges|) rows of two BIGINTs.
    und = edges.select(F.col("id_a").alias("a"), F.col("id_b").alias("b")).unionByName(
        edges.select(F.col("id_b").alias("a"), F.col("id_a").alias("b"))
    ).persist()
    labels = nodes.select("id", F.col("id").alias("comp"))
    for _ in range(rounds):
        nb = (
            und.join(labels.select(F.col("id").alias("b"), "comp").hint("merge"), "b")
            .groupBy("a")
            .agg(F.min("comp").alias("nb_comp"))
        )
        labels = (
            labels.join(nb.hint("merge"), labels.id == nb.a, "left")
            .select(
                "id", F.least("comp", F.coalesce("nb_comp", "comp")).alias("comp")
            )
        )
        ptr = labels.select(F.col("id").alias("pid"), F.col("comp").alias("pcomp"))
        labels = (
            labels.join(ptr.hint("merge"), labels.comp == ptr.pid, "left")
            .select("id", F.coalesce("pcomp", "comp").alias("comp"))
            .localCheckpoint(eager=False)
        )
    return labels


def _second_mutation(m1: DataFrame) -> DataFrame:
    """Mutation applied to the already-mutated text (ids offset again) —
    m2 stays near m1 but drifts far enough from the original that the
    (base, m2) edge usually fails the 0.7 bar while (base, m1) and
    (m1, m2) pass: components only form through TRANSITIVITY."""
    return m1.select(
        (F.col("doc_id") + _SEED_OFFSET).alias("doc_id"),
        F.expr(_MUTATE_SQL).alias("text"),
    )


_CC_EDGE_THRESHOLD = 0.7

_CC_ORACLE = f"""
WITH RECURSIVE base AS (
  SELECT doc_id AS id, lower(text) AS text FROM documents
),
m1 AS (
  SELECT id + 1000000 AS id, {_DUCK_MUTATE.format(t="text")} AS text FROM base
),
m2 AS (
  SELECT id + 1000000 AS id, {_DUCK_MUTATE.format(t="text")} AS text FROM m1
),
nodes AS (
  SELECT id, text FROM base
  UNION ALL SELECT id, text FROM m1
  UNION ALL SELECT id, text FROM m2
),
sh AS (
  SELECT id, {_DUCK_SHINGLES.format(t="text")} AS s FROM nodes
),
pairs AS (
  SELECT id AS id_a, id + 1000000 AS id_b FROM base
  UNION ALL SELECT id + 1000000, id + 2000000 FROM base
  UNION ALL SELECT id, id + 2000000 FROM base
),
edges AS (
  SELECT p.id_a, p.id_b
  FROM pairs p
  JOIN sh sa ON sa.id = p.id_a
  JOIN sh sb ON sb.id = p.id_b
  WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
        / len(list_distinct(sa.s || sb.s)) >= {_CC_EDGE_THRESHOLD}
),
und AS (
  SELECT id_a AS a, id_b AS b FROM edges
  UNION SELECT id_b, id_a FROM edges
),
reach(src, dst) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a
)
SELECT src AS id, CAST(MIN(dst) AS BIGINT) AS comp
FROM reach GROUP BY src ORDER BY id
"""


@query("dedup_groups_connected", oracle=_CC_ORACLE, survey_id="north-star")
def dedup_groups_connected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster extraction: seeded 3-node families (doc,
    mutation, double-mutation) → exact-Jaccard edges at 0.7 → connected
    components → (id, comp) with comp = canonical min id.

    The oracle recomputes the identical corpus, edges, and components
    with a DuckDB recursive CTE — transitive closure then MIN — so the
    iterative Spark algorithm is hash-checked against a declarative
    fixpoint. Tier H."""
    docs = table(spark, sf_dir, "documents")
    base = docs.select(
        _guarded_base_id().alias("doc_id"), F.lower(F.col("text")).alias("text")
    )
    m1 = base.select(
        (F.col("doc_id") + _SEED_OFFSET).alias("doc_id"),
        F.expr(_MUTATE_SQL).alias("text"),
    )
    m2 = _second_mutation(m1)
    corpus = base.unionByName(m1).unionByName(m2)
    sh = _shingles(corpus)
    fam = base.select(F.col("doc_id").alias("d"))
    pairs = fam.select(
        F.col("d"),
        F.explode(
            F.array(
                F.struct(
                    F.col("d").alias("id_a"),
                    (F.col("d") + _SEED_OFFSET).alias("id_b"),
                ),
                F.struct(
                    (F.col("d") + _SEED_OFFSET).alias("id_a"),
                    (F.col("d") + 2 * _SEED_OFFSET).alias("id_b"),
                ),
                F.struct(
                    F.col("d").alias("id_a"),
                    (F.col("d") + 2 * _SEED_OFFSET).alias("id_b"),
                ),
            )
        ).alias("p"),
    ).select("p.id_a", "p.id_b")
    sa = sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sa"))
    sb = sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sb"))
    jac = F.size(F.array_intersect("sa", "sb")).cast("double") / F.size(
        F.array_union("sa", "sb")
    )
    # merge hints: both join inputs are O(N) (pairs) or O(N)-with-fat-
    # shingle-arrays (sa/sb) — every side grows with the corpus, so a
    # runtime-estimate broadcast is wrong at scale and OOMs the plain
    # 1 g driver session at sf1; SMJ on doc id is the plan that survives
    edges = (
        pairs.join(sa.hint("merge"), "id_a")
        .join(sb.hint("merge"), "id_b")
        .where(jac >= _CC_EDGE_THRESHOLD)
        .select("id_a", "id_b")
    )
    nodes = corpus.select(F.col("doc_id").alias("id"))
    return connected_components(edges, nodes, rounds=5).orderBy("id")


def simhash_candidates(docs: DataFrame) -> DataFrame:
    """SimHash near-dup candidates over any (doc_id, text) DataFrame.

    Per doc: fold token hashes into 64 signed bit-counters (+1/-1 per
    bit), sign → bit. The 64-bit signature is emitted as eight 8-bit
    chunks; pairs agreeing on ≥2 chunks become candidates (a pair at
    Hamming distance h keeps ≥ 8-h chunks intact, so h ≤ 6 is caught
    with certainty; measured near-dup distances run 0-8).
    """
    d = docs
    # ONE md5 per token, split into two 32-bit halves (conv of 8 hex
    # digits can't overflow BIGINT; a full 16-hex conv would exceed
    # 2^63 for half of all tokens). Cross-engine: DuckDB mirrors with
    # '0x'||substr casts — and this is also 64× fewer digest calls than
    # the r1 xxhash64-inside-the-bit-loop fold.
    #
    # Let-binding idiom (transform(array(e), x -> body)[0]): the token
    # hashes and the 64 counters are each bound ONCE as a lambda
    # variable. Chained selects inline aliased expressions at every
    # reference (CollapseProject), so the naive 3-select version
    # recomputed the md5 fold 64×8 times — measured 443 s for 500 docs
    # vs ~1 s with the bindings.
    sig = d.select(
        "doc_id",
        F.expr(
            """
            transform(
              array(transform(split(lower(text), ' '),
                tok -> named_struct(
                  'lo', CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT),
                  'hi', CAST(conv(substring(md5(tok), 9, 8), 16, 10) AS BIGINT)))),
              hs -> transform(
                array(transform(sequence(0, 63),
                  i -> aggregate(hs,
                                 0L,
                                 (acc, t) -> acc
                                   + (CASE WHEN (shiftright(
                                           IF(i < 32, t.lo, t.hi),
                                           i % 32) & 1) = 1
                                           THEN 1 ELSE -1 END)))),
                cs -> transform(sequence(0, 7),
                  j -> aggregate(sequence(0, 7),
                                 0L,
                                 (acc, k) -> acc
                                   + (CASE WHEN cs[j * 8 + k] > 0
                                           THEN shiftleft(1L, k)
                                           ELSE 0L END))))[0])[0]
            """
        ).alias("chunks"),
    )
    # parts feeds both self-join sides; persist so the 64-bit signature
    # fold runs once per doc — the cache is 8 small rows per doc
    parts = sig.select(
        "doc_id", F.posexplode("chunks").alias("chunk_id", "chunk_val")
    ).persist()
    a = parts.select(F.col("doc_id").alias("id_a"), "chunk_id", "chunk_val")
    b = parts.select(F.col("doc_id").alias("id_b"), "chunk_id", "chunk_val")
    return (
        a.join(b, ["chunk_id", "chunk_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_chunks"))
        .where(F.col("n_chunks") >= 2)
    )


_SIMHASH_ORACLE = """
WITH hs AS (
  SELECT doc_id,
         list_transform(string_split(lower(text), ' '),
           tok -> struct_pack(
             lo := CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT),
             hi := CAST('0x' || substr(md5(tok), 9, 8) AS BIGINT))) AS hs
  FROM documents
),
counters AS (
  SELECT doc_id,
         list_transform(range(0, 64),
           i -> list_sum(list_transform(hs,
                  t -> CASE WHEN ((CASE WHEN i < 32 THEN t.lo ELSE t.hi END)
                                  >> (i % 32)) & 1 = 1
                            THEN 1 ELSE -1 END))) AS counters
  FROM hs
),
chunks AS (
  SELECT doc_id, j.chunk_id,
         list_sum(list_transform(range(0, 8),
           k -> CASE WHEN counters[j.chunk_id * 8 + k + 1] > 0
                     THEN 1 << k ELSE 0 END)) AS chunk_val
  FROM counters, (SELECT unnest(range(0, 8)) AS chunk_id) j
)
SELECT CAST(a.doc_id AS BIGINT) AS id_a,
       CAST(b.doc_id AS BIGINT) AS id_b,
       CAST(COUNT(*) AS BIGINT) AS n_chunks
FROM chunks a
JOIN chunks b ON a.chunk_id = b.chunk_id AND a.chunk_val = b.chunk_val
             AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= 2
"""


@query("dedup_simhash", oracle=_SIMHASH_ORACLE, survey_id="north-star")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash over the documents table (see simhash_candidates).

    Tier H since r9 (was R for xxhash64): token hashes are the two
    32-bit halves of md5 — byte-identical across engines — so the
    64 signed bit-counters, the packed 8-bit chunks, and the
    hamming-band candidate pairs all hash-certify against the
    declarative DuckDB twin.

    EXACT-GROUP PREPASS (r11, guide §8): the signature is a pure
    function of lower(text), so identical texts share all 8 chunks and
    the pair relation factors through distinct-text groups — within a
    group every pair matches all 8 chunks; across groups the match
    count is the group representatives' match count. The 64-counter
    fold and the (chunk_id, chunk_val) bucket self-join therefore run
    over DISTINCT texts only (sf1: 4,992 of 50,000), and doc-level
    pairs are re-expanded by digest-keyed joins sized by the OUTPUT
    (which is semantically pinned), not by the squared duplication the
    bucket join previously paid. Result-identical by construction and
    oracle-checked against the unchanged all-pairs DuckDB twin."""
    d = table(spark, sf_dir, "documents")
    members = d.select("doc_id", F.md5(F.lower(F.col("text"))).alias("h")).persist()
    stats = members.groupBy("h").agg(F.min("doc_id").alias("gid")).persist()
    reps = d.join(stats, d["doc_id"] == stats["gid"]).select(
        F.col("gid").alias("doc_id"), "text"
    )
    gcand = simhash_candidates(reps)  # (id_a, id_b, n_chunks) over gids
    within = (
        members.alias("x")
        .join(
            members.alias("y"),
            (F.col("x.h") == F.col("y.h"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("id_a"),
            F.col("y.doc_id").alias("id_b"),
            F.lit(8).cast("long").alias("n_chunks"),
        )
    )
    cross = (
        gcand.join(
            stats.select(F.col("gid").alias("id_a"), F.col("h").alias("ha")), "id_a"
        )
        .join(
            stats.select(F.col("gid").alias("id_b"), F.col("h").alias("hb")), "id_b"
        )
        .join(members.select(F.col("h").alias("ha"), F.col("doc_id").alias("da")), "ha")
        .join(members.select(F.col("h").alias("hb"), F.col("doc_id").alias("db")), "hb")
        .select(
            F.least("da", "db").alias("id_a"),
            F.greatest("da", "db").alias("id_b"),
            F.col("n_chunks").cast("long").alias("n_chunks"),
        )
    )
    return within.unionByName(cross)


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
        # Let-binding idiom (r11, same fix as _shingles): bind the token
        # array once per row instead of re-splitting per bigram element.
        F.expr(
            """
            transform(array(split(lower(text), ' ')), ws ->
              array_distinct(
                CASE WHEN size(ws) >= 2
                     THEN transform(
                            sequence(0, size(ws) - 2),
                            i -> concat(ws[i], ' ', ws[i + 1]))
                     ELSE array(lower(text))
                END))[0]
            """
        ).alias("bigrams"),
    ).persist()  # both join sides — tokenize the corpus once
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


# The LSH stage runs on the cross-engine affine-over-md5 family defined
# above (_MH_*): ONE md5 per shingle, 32 affine permutations — identical
# on both engines, so signatures, bands, and candidate pairs hash-match
# cross-engine (r9: replaced the r6 per-seed md5 family, which computed
# 32 digests per shingle; measured ~2× faster on the sf1 corpus in both
# engines). Collisions are fine because both engines collide identically.
_COPY_OFFSET = 3000000  # exact-copy ids in the seeded pipeline corpus

_PIPE_ORACLE = f"""
WITH RECURSIVE base AS (
  SELECT doc_id, lower(trim(text)) AS text FROM documents
),
corpus AS (
  SELECT doc_id, text FROM base
  UNION ALL SELECT doc_id + {_COPY_OFFSET}, text FROM base
  UNION ALL SELECT doc_id + {_SEED_OFFSET},
                   {_DUCK_MUTATE.format(t="text")} FROM base
  UNION ALL
  SELECT doc_id + 2 * {_SEED_OFFSET}, {_DUCK_MUTATE.format(t="m1t")}
  FROM (SELECT doc_id, {_DUCK_MUTATE.format(t="text")} AS m1t FROM base) m1
),
exact_tag AS (
  SELECT doc_id, text,
         MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
  FROM corpus
),
surv AS (SELECT doc_id, text FROM exact_tag WHERE doc_id = keeper),
sh AS (SELECT doc_id, {_DUCK_SHINGLES.format(t="text")} AS shingles FROM surv),
{_MH_CAND_DUCK_TAIL.format(sh="sh")},
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
),
edges AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b
  WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
        / len(list_distinct(sa.shingles || sb.shingles))
        >= {_CC_EDGE_THRESHOLD}
),
und AS (
  SELECT id_a AS a, id_b AS b FROM edges
  UNION SELECT id_b, id_a FROM edges
),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM surv
  UNION
  SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a
),
comps AS (
  SELECT src AS id, MIN(dst) AS comp FROM reach GROUP BY src
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(survivor_id AS BIGINT) AS survivor_id, stage
FROM (
  SELECT doc_id, keeper AS survivor_id, 'exact' AS stage
  FROM exact_tag WHERE doc_id <> keeper
  UNION ALL
  SELECT id, comp, 'near' FROM comps WHERE comp <> id
  UNION ALL
  SELECT id, id, 'kept' FROM comps WHERE comp = id
) d
ORDER BY doc_id
"""


@query("pipeline_dedup_e2e", oracle=_PIPE_ORACLE, survey_id="north-star")
def pipeline_dedup_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE dedup pipeline as one query — the shape a training-
    data run actually executes, end to end: normalize → exact dedup
    (md5, keep min doc_id) → MinHash-LSH near-dup candidates over the
    exact survivors → exact-Jaccard edge verification → connected
    components → one canonical doc per cluster. The input is the seeded
    corpus (every doc + an exact copy + two mutation generations) so
    all three stages provably fire, and the output is the per-document
    DECISION TABLE — (doc_id, survivor_id, stage-that-removed-it) —
    not a summary row (VERDICT r03 #3): 'exact' rows point at their
    md5-group keeper, 'near' rows at their component's canonical min
    id, 'kept' rows at themselves.

    Tier H: the MinHash stage runs on md5-prefix hashes (Spark
    conv(substring(md5,1,8),16,10) ≡ DuckDB '0x'||substr(md5,1,8)
    cast), so signatures, band buckets, candidate pairs, verified
    edges, and the CC fixpoint all hash-match a declarative DuckDB
    mirror (recursive-CTE transitive closure). LSH recall is
    probabilistic, but both engines miss identically — determinism is
    what the driver checks; recall is pinned by dedup_minhash_recall.

    100 TB shape: one corpus scan feeds exact-hash and shingling; the
    only wide exchanges are keyed by md5(text) (uniform), by
    (band_id, band_hash) (bounded bucket width), and the
    |candidates|-sized CC joins — never a doc×doc product."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.trim(F.col("text"))).alias("text")
    )
    m1 = docs.select(
        (F.col("doc_id") + _SEED_OFFSET).alias("doc_id"),
        F.expr(_MUTATE_SQL).alias("text"),
    )
    corpus = (
        docs.unionByName(
            docs.select(
                (F.col("doc_id") + _COPY_OFFSET).alias("doc_id"), "text"
            )
        )
        .unionByName(m1)
        .unionByName(_second_mutation(m1))
    )
    # exact stage: min doc_id per md5 via one window (no groupBy+join back)
    exact_tag = corpus.withColumn(
        "keeper", F.min("doc_id").over(Window.partitionBy(F.md5("text")))
    ).persist()  # feeds survivors (shingle subtree) + the 'exact' decisions
    surv = exact_tag.where(F.col("doc_id") == F.col("keeper")).select(
        "doc_id", "text"
    )
    sh = _shingles(surv).persist()  # feeds signatures + both verify sides
    sig = sh.select("doc_id", F.expr(_MH_SIG_EXPR).alias("sig"))
    bands = sig.select(
        "doc_id",
        F.posexplode(F.expr(_MH_BANDS_EXPR)).alias("band_id", "band_hash"),
    ).persist()  # both sides of the bucket self-join
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    sh_a = sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sa"))
    sh_b = sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sb"))
    jac = F.size(F.array_intersect("sa", "sb")).cast("double") / F.size(
        F.array_union("sa", "sb")
    )
    edges = (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .where(jac >= _CC_EDGE_THRESHOLD)
        .select("id_a", "id_b")
    )
    comps = connected_components(edges, surv.select(F.col("doc_id").alias("id")))
    decisions = (
        exact_tag.where(F.col("doc_id") != F.col("keeper"))
        .select(
            "doc_id",
            F.col("keeper").alias("survivor_id"),
            F.lit("exact").alias("stage"),
        )
        .unionByName(
            comps.where(F.col("comp") != F.col("id")).select(
                F.col("id").alias("doc_id"),
                F.col("comp").alias("survivor_id"),
                F.lit("near").alias("stage"),
            )
        )
        .unionByName(
            comps.where(F.col("comp") == F.col("id")).select(
                F.col("id").alias("doc_id"),
                F.col("id").alias("survivor_id"),
                F.lit("kept").alias("stage"),
            )
        )
    )
    return decisions.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("survivor_id").cast("long").alias("survivor_id"),
        "stage",
    ).orderBy("doc_id")


_PAGERANK_D = 0.85
_PAGERANK_ITERS = 3

_PAGERANK_ORACLE = f"""
WITH edges AS MATERIALIZED (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
         CAST(COUNT(*) AS DOUBLE) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
  GROUP BY 1, 2
), outw AS (
  SELECT src, SUM(w) AS total_w FROM edges GROUP BY src
), norm AS MATERIALIZED (
  SELECT e.src, e.dst, e.w / o.total_w AS p
  FROM edges e JOIN outw o ON e.src = o.src
), nodes AS (
  SELECT DISTINCT n_nationkey AS id FROM nation
), n_cnt AS (SELECT COUNT(*)::DOUBLE AS n FROM nodes),
pr0 AS (
  SELECT id, 1.0 / n AS pr FROM nodes, n_cnt
),
pr1 AS (
  SELECT nodes.id,
         (1 - {_PAGERANK_D}) / n_cnt.n
         + {_PAGERANK_D} * COALESCE(SUM(pr0.pr * norm.p), 0) AS pr
  FROM nodes
  CROSS JOIN n_cnt
  LEFT JOIN norm ON norm.dst = nodes.id
  LEFT JOIN pr0 ON pr0.id = norm.src
  GROUP BY nodes.id, n_cnt.n
),
pr2 AS (
  SELECT nodes.id,
         (1 - {_PAGERANK_D}) / n_cnt.n
         + {_PAGERANK_D} * COALESCE(SUM(pr1.pr * norm.p), 0) AS pr
  FROM nodes
  CROSS JOIN n_cnt
  LEFT JOIN norm ON norm.dst = nodes.id
  LEFT JOIN pr1 ON pr1.id = norm.src
  GROUP BY nodes.id, n_cnt.n
),
pr3 AS (
  SELECT nodes.id,
         (1 - {_PAGERANK_D}) / n_cnt.n
         + {_PAGERANK_D} * COALESCE(SUM(pr2.pr * norm.p), 0) AS pr
  FROM nodes
  CROSS JOIN n_cnt
  LEFT JOIN norm ON norm.dst = nodes.id
  LEFT JOIN pr2 ON pr2.id = norm.src
  GROUP BY nodes.id, n_cnt.n
)
SELECT id AS nationkey, round(pr, 6) AS pagerank FROM pr3
"""


@query("graph_pagerank_trade", oracle=_PAGERANK_ORACLE, survey_id="north-star")
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the international trade graph (customer-nation →
    supplier-nation edges weighted by lineitem volume), 3 damped
    iterations from uniform — the second iterative-graph kernel next to
    connected components, exercising the loop-of-joins pattern where
    the per-iteration plan is one broadcast join (transition matrix is
    |edges|-sized, tiny relative to the fact table that built it) + one
    keyed sum. Edge extraction is the heavy part at 100 TB — a 4-table
    join that reduces to |nations|² rows BEFORE iteration, so the loop
    itself never touches fact data again. The oracle unrolls the same
    three iterations as chained CTEs; final ranks round to 1e-6 (sum
    order across ≤25 in-edges is commutative far beyond that)."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("total_w"))
    norm = edges.join(outw, "src").select(
        "src", "dst", (F.col("w") / F.col("total_w")).alias("p")
    )
    nodes = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("id")
    ).distinct()
    n = nodes.count()  # |nations| — a metadata-scale scalar, not data
    norm = norm.localCheckpoint()  # iterate over a materialized matrix
    pr = nodes.select("id", F.lit(1.0 / n).alias("pr"))
    for _ in range(_PAGERANK_ITERS):
        contrib = norm.join(
            pr.select(F.col("id").alias("src"), "pr"), "src"
        ).select(F.col("dst").alias("id"), (F.col("pr") * F.col("p")).alias("x"))
        pr = (
            nodes.join(
                contrib.groupBy("id").agg(F.sum("x").alias("inflow")), "id", "left"
            )
            .select(
                "id",
                (
                    F.lit((1 - _PAGERANK_D) / n)
                    + _PAGERANK_D * F.coalesce("inflow", F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint()
        )
    return pr.select(F.col("id").alias("nationkey"), F.round("pr", 6).alias("pagerank"))
