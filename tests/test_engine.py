"""Engine-local behavior tests for ops whose driver check is rows-only
(Tier R), plus cross-op consistency properties (SURVEY.md §5.2).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cloudtrail_streamer_spark.catalog import table
from cloudtrail_streamer_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


def test_approx_agg_error_bounds(spark):
    """agg_approx emits estimate/exact ratios rounded to 1 dp (the r9
    H-tier certificate form): exactly 1.0 iff the realized relative
    error is inside ±5%. Cross-check the exact distinct count so a bug
    that corrupts BOTH numerator and denominator identically can't
    fake a 1.0 ratio."""
    out = {r["status"]: r for r in all_queries()["agg_approx"](spark, SF).collect()}
    exact = {
        r["o_orderstatus"]: (r["nd"], r["n"])
        for r in table(spark, SF, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("nd"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    for status, row in out.items():
        assert row["hll_ratio_1dp"] == 1.0, f"{status}: HLL error >= 5%"
        assert row["gk_ratio_1dp"] == 1.0, f"{status}: GK error >= 5%"
        assert row["n"] == exact[status][1]


def _near_dup_corpus(spark):
    """Synthetic near-dup ground truth: 30 fixture docs + mutated copies
    (every 20th token replaced) under doc_id+100000. The fixture itself
    has no engineered duplicate groups (verified empirically), so recall
    properties are asserted on known pairs."""
    base = table(spark, SF, "documents").where(F.col("doc_id") < 30).select("doc_id", "text")
    mutated = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.array_join(
            F.expr(
                "transform(split(text, ' '), (x, i) -> "
                "CASE WHEN i % 20 = 19 THEN 'zzzz' ELSE x END)"
            ),
            " ",
        ).alias("text"),
    )
    corpus = base.unionByName(mutated)
    truth = {(i, i + 100000) for i in range(30)}
    return corpus, truth


def test_minhash_catches_near_duplicates(spark):
    """~5% token mutation keeps shingle-Jaccard high; 8 bands × 4 rows
    catches Jaccard≥0.8 pairs w.p. ≳0.98 each — demand ≥80% recall."""
    from cloudtrail_streamer_spark.operators.dedup import minhash_candidates

    corpus, truth = _near_dup_corpus(spark)
    got = {(r["id_a"], r["id_b"]) for r in minhash_candidates(corpus).collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.8, f"MinHash-LSH recall {recall:.2f} on known near-dup pairs"


def test_simhash_catches_near_duplicates(spark):
    from cloudtrail_streamer_spark.operators.dedup import simhash_candidates

    corpus, truth = _near_dup_corpus(spark)
    got = {(r["id_a"], r["id_b"]) for r in simhash_candidates(corpus).collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.8, f"SimHash recall {recall:.2f} on known near-dup pairs"


def test_ivf_recall_vs_bruteforce(spark):
    """Bucketed ANN must recover a reasonable fraction of true top-5."""
    brute = {
        (r["probe_id"], r["neighbor_id"])
        for r in all_queries()["sim_search_topk"](spark, SF).collect()
    }
    ivf = {
        (r["probe_id"], r["neighbor_id"])
        for r in all_queries()["sim_search_ivf"](spark, SF).collect()
    }
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.3, f"IVF recall {recall:.2f} too low"


def test_udf_and_pandas_udf_agree(spark):
    a = all_queries()["udf_python_scalar"](spark, SF).orderBy("o_orderkey").collect()
    b = all_queries()["udf_pandas_vectorized"](spark, SF).orderBy("o_orderkey").collect()
    assert [r["account_id"] for r in a] == [r["account_id"] for r in b]


def test_salted_join_equals_plain(spark):
    from cloudtrail_streamer_spark.functions.skew import salted_join

    o = table(spark, SF, "orders").withColumnRenamed("o_custkey", "c_custkey")
    c = table(spark, SF, "customer")
    plain = o.join(c, "c_custkey").select("o_orderkey", "c_custkey", "c_name")
    salted = salted_join(
        o, c, "c_custkey", salt_from=F.col("o_orderkey"), n_salt=8
    ).select("o_orderkey", "c_custkey", "c_name")
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_engine_facade(spark):
    from cloudtrail_streamer_spark.engine import Engine

    eng = Engine(spark, sf_dir=SF)
    assert eng.table("region").count() == 5
    n = eng.sql(
        "SELECT COUNT(*) AS n FROM orders JOIN customer ON o_custkey = c_custkey"
    ).collect()[0]["n"]
    assert n == eng.table("orders").count()
    assert len(eng.run("agg_group_q1").columns) == 10


def test_lang_id_covers_all_docs(spark):
    out = all_queries()["text_lang_id"](spark, SF)
    docs = table(spark, SF, "documents")
    # every doc classified exactly once, prediction from the lang domain
    assert out.count() == docs.count()
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert {r["pred_lang"] for r in out.select("pred_lang").distinct().collect()} <= langs


def test_image_header_roundtrip():
    """Synthesized payloads are real files: the parser must recover the
    exact dims from the bytes for every format, and reject garbage."""
    import pytest

    from cloudtrail_streamer_spark.operators.multimodal import (
        parse_image_header,
        synth_payload,
    )

    for doc_id in [0, 1, 2, 3, 191, 192, 193, 1000, 99999]:
        fmt, w, h = parse_image_header(synth_payload(doc_id))
        assert fmt == ("png", "gif", "bmp")[doc_id % 3]
        assert w == 64 + doc_id % 192
        assert h == 64 + (doc_id * 7) % 192
    with pytest.raises(ValueError):
        parse_image_header(b"not an image")


def test_png_payload_is_strictly_valid():
    """The PNG synthesizer emits chunk-CRC-correct, zlib-decodable IDAT —
    a strict decoder (not just a header sniffer) accepts it."""
    import struct
    import zlib

    from cloudtrail_streamer_spark.operators.multimodal import make_png

    raw = make_png(65, 70)
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    pos, chunks, idat = 8, [], b""
    while pos < len(raw):
        (length,) = struct.unpack(">I", raw[pos : pos + 4])
        tag = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", raw[pos + 8 + length : pos + 12 + length])
        assert crc == zlib.crc32(tag + data) & 0xFFFFFFFF, f"bad CRC on {tag}"
        chunks.append(tag)
        if tag == b"IDAT":
            idat += data
        pos += 12 + length
    assert chunks == [b"IHDR", b"IDAT", b"IEND"]
    assert len(zlib.decompress(idat)) == (1 + 65) * 70  # filter byte + row


def test_minhash_recall_vs_duckdb_truth(spark):
    """B-56 recall gate: LSH must catch >= 90% of the seeded near-dup
    pairs whose EXACT 3-shingle Jaccard >= 0.6 — and the truth-set size
    Spark computes must equal DuckDB's independent recomputation of the
    identical mutation + exact Jaccard."""
    import duckdb

    row = all_queries()["dedup_minhash_recall"](spark, SF).collect()[0]
    assert row["n_truth"] > 0, "seeded corpus must produce truth pairs"
    assert row["recall"] >= 0.9, f"LSH recall {row['recall']} below bound"

    truth_sql = f"""
    WITH base AS (
      SELECT doc_id, lower(text) AS text
      FROM read_parquet('{SF}/documents.parquet')
    ),
    mut AS (
      SELECT doc_id,
             array_to_string(
               list_transform(
                 (string_split(text, ' '))[1:greatest(3,
                    CAST(ceil(len(string_split(text, ' ')) * 0.9) AS INT))],
                 (x, i) -> CASE WHEN i - 1 = CAST(floor(len(string_split(text, ' ')) / 2.0) AS INT)
                                THEN 'xqzsubstituted' ELSE x END),
               ' ') AS text
      FROM base
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(string_split(text, ' ')) >= 3
               THEN list_transform(
                      (string_split(text, ' '))[1:len(string_split(text, ' ')) - 2],
                      (x, i) -> concat(x, ' ', string_split(text, ' ')[i + 1],
                                       ' ', string_split(text, ' ')[i + 2]))
               ELSE [text] END) AS s
      FROM base
    ),
    shm AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(string_split(text, ' ')) >= 3
               THEN list_transform(
                      (string_split(text, ' '))[1:len(string_split(text, ' ')) - 2],
                      (x, i) -> concat(x, ' ', string_split(text, ' ')[i + 1],
                                       ' ', string_split(text, ' ')[i + 2]))
               ELSE [text] END) AS s
      FROM mut
    )
    SELECT COUNT(*) AS n_truth
    FROM sh JOIN shm USING (doc_id)
    WHERE CAST(len(list_intersect(sh.s, shm.s)) AS DOUBLE)
          / len(list_distinct(sh.s || shm.s)) >= 0.6
    """
    n_truth_duck = duckdb.connect().execute(truth_sql).fetchone()[0]
    assert n_truth_duck == row["n_truth"], (
        f"Spark truth set {row['n_truth']} != DuckDB truth set {n_truth_duck}"
    )


def test_connected_components_chain_converges_in_log_rounds(spark):
    """A 21-node chain (diameter 20) must fully converge in 5 rounds —
    pointer jumping makes label travel double per round."""
    from cloudtrail_streamer_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(21)], "id long")
    labels = connected_components(edges, nodes, rounds=5).collect()
    assert len(labels) == 21
    assert all(r["comp"] == 0 for r in labels), sorted(
        (r["id"], r["comp"]) for r in labels
    )


def test_pack_sequences_invariants(spark):
    """Packing must cover every doc exactly once, never start a doc past
    its bin's budget boundary, and keep per-shard doc ranges disjoint."""
    out = all_queries()["text_pack_sequences"](spark, SF).collect()
    docs = table(spark, SF, "documents")
    assert sum(r["n_docs"] for r in out) == docs.count()
    for r in out:
        # 1e12 stride per shard (widened r6 — collision headroom past
        # the 100 TB design point; see text_pack_sequences)
        shard, local_bin = divmod(r["bin_id"], 1_000_000_000_000)
        assert 0 <= shard < 8
        assert r["first_doc"] % 8 == shard and r["last_doc"] % 8 == shard
        assert r["n_docs"] >= 1 and r["total_tokens"] >= r["n_docs"]


def test_wav_parser_walks_chunks():
    """The RIFF parser must walk chunks (incl. word-aligned odd-size
    extras), not read fixed offsets, and reject non-WAV bytes."""
    import struct

    import pytest

    from cloudtrail_streamer_spark.operators.multimodal import (
        make_wav,
        parse_wav_header,
    )

    assert parse_wav_header(make_wav(22050, 2, 777)) == (22050, 2, 777)
    raw = make_wav(8000, 1, 100)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # odd size + pad
    patched = raw[:12] + extra + raw[12:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    assert parse_wav_header(patched) == (8000, 1, 100)
    with pytest.raises(ValueError):
        parse_wav_header(b"RIFFxxxxJUNK")


def test_layout_cluster_ranges_disjoint_and_covering(spark):
    """layout_cluster_ranges invariants (ADVICE r02 #2): the r9 H-tier
    certificate row must report full coverage and disjoint ranges, and
    the PER-PARTITION summaries (recomputed here — the op now emits the
    1-row certificate) must be pairwise disjoint in pid order and cover
    the whole table."""
    cert = all_queries()["layout_cluster_ranges"](spark, SF).collect()[0]
    n_events = table(spark, SF, "events").count()
    assert cert["n_rows"] == n_events
    assert cert["ranges_disjoint"] is True
    assert cert["rows_covered"] is True
    clustered = (
        table(spark, SF, "events")
        .repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id", "ts")
    )
    rows = sorted(
        clustered.select(F.spark_partition_id().alias("pid"), "user_id")
        .groupBy("pid")
        .agg(
            F.min("user_id").alias("min_key"),
            F.max("user_id").alias("max_key"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect(),
        key=lambda r: r["pid"],
    )
    assert sum(r["n_rows"] for r in rows) == n_events, "partitions must cover all rows"
    for prev, cur in zip(rows, rows[1:]):
        assert prev["min_key"] <= prev["max_key"]
        assert prev["max_key"] <= cur["min_key"], (
            f"pid {prev['pid']} range overlaps pid {cur['pid']}"
        )


def test_bucketed_join_leaves_no_catalog_residue(spark):
    """join_bucketed_colocated uses fixed overwrite tables (VERDICT r02
    wrong-#3): invoking it twice must not grow the catalog or the bucket
    directory set."""
    import os
    import tempfile

    q = all_queries()["join_bucketed_colocated"]
    q(spark, SF).count()
    tables_after_1 = {t.name for t in spark.catalog.listTables()}
    base = os.path.join(tempfile.gettempdir(), "cts_bucketed")
    dirs_after_1 = set(os.listdir(base))
    q(spark, SF).count()
    assert {t.name for t in spark.catalog.listTables()} == tables_after_1
    assert set(os.listdir(base)) == dirs_after_1
    assert {"orders_bkt", "customer_bkt"} <= tables_after_1


def test_coverage_md_matches_registry():
    """COVERAGE.md is generated; it must track the registry exactly
    (VERDICT r02 wrong-#2 — it drifted to 116 of 123 queries in r2)."""
    import tools.gen_coverage as g

    with open("/root/repo/COVERAGE.md") as f:
        assert f.read() == g.render()


def test_winnow_shared_run_shares_fingerprint(spark):
    """Winnowing guarantee: two docs sharing a run of >= 6 tokens (4
    consecutive 3-shingles) must share at least one fingerprint."""
    from cloudtrail_streamer_spark.operators.text import text_winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens
    docs = spark.createDataFrame(
        [
            (1, f"one two three {shared} four five six seven"),
            (2, f"red blue green {shared} yellow purple orange pink"),
        ],
        "doc_id LONG, text STRING",
    )
    import cloudtrail_streamer_spark.operators.text as T
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    toks = docs.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    sh = toks.select(
        "doc_id", "pos",
        F.concat_ws(" ", "tok", F.lead("tok", 1).over(w), F.lead("tok", 2).over(w)).alias("shingle"),
        F.lead("tok", 2).over(w).alias("t2"),
    ).where(F.col("t2").isNotNull())
    h = sh.select("doc_id", F.substring(F.md5("shingle"), 1, 16).alias("hv"),
                  F.row_number().over(w).alias("sidx"))
    wmin = h.select("doc_id", "sidx",
                    F.min("hv").over(Window.partitionBy("doc_id").orderBy("sidx").rowsBetween(-3, 0)).alias("fp"))
    fps = wmin.where(F.col("sidx") >= 4).select("doc_id", "fp").distinct().collect()
    d1 = {r["fp"] for r in fps if r["doc_id"] == 1}
    d2 = {r["fp"] for r in fps if r["doc_id"] == 2}
    assert d1 & d2, "shared 6-token run must produce a shared fingerprint"


def test_pq_centroids_encode_to_themselves(spark):
    """A PQ codebook vector must quantize to its own id in every
    subspace (distance zero), so vec_id<4 codes are 8 repeats of the id."""
    out = {
        r["vec_id"]: r
        for r in all_queries()["embed_pq_codebook"](spark, SF).collect()
        if r["vec_id"] < 4
    }
    for vid, r in out.items():
        assert r["pq_code"] == str(vid) * 8, r
        assert r["recon_err"] == 0.0, r


def test_rate_limit_keeps_earliest(spark):
    """events_rate_limit must keep the EARLIEST <=3 per (user, day)."""
    rows = all_queries()["events_rate_limit"](spark, SF).collect()
    from collections import Counter

    per_key = Counter((r["user_id"], r["day_start"]) for r in rows)
    assert max(per_key.values()) <= 3
    ev = table(spark, SF, "events").count()
    assert len(rows) < ev  # something was actually limited


def test_idempotent_sink_retry_is_noop(spark):
    row = all_queries()["sink_idempotent_batchid"](spark, SF).collect()[0]
    assert row["retry_delta"] == 0
    assert row["n_delivered"] == row["n_source"]


def test_bmp_resize_kernel_roundtrip():
    """The BMP pixel decoder must recover the exact pattern (incl. row
    padding and bottom-up order), and the NN resize must sample it."""
    import numpy as np

    from cloudtrail_streamer_spark.operators.multimodal import (
        _decode_bmp_pixels,
        make_patterned_bmp,
    )

    # w=17 forces a non-trivial row stride (3*17=51 -> padded 52)
    pix = _decode_bmp_pixels(make_patterned_bmp(7, 17, 9))
    assert pix.shape == (9, 17)
    ys = np.arange(9)[:, None]
    xs = np.arange(17)[None, :]
    assert (pix == ((xs * 31 + ys * 17 + 7) % 256)).all()


def test_dedup_pipeline_decision_table(spark):
    """pipeline_dedup_e2e (now H-tier, VERDICT r03 #3): the decision
    table must partition the seeded corpus — every doc decided exactly
    once, every stage non-empty, survivors self-referential, and
    'exact'/'near' survivors must themselves be 'kept' rows."""
    from cloudtrail_streamer_spark.catalog import table as cat_table

    rows = all_queries()["pipeline_dedup_e2e"](spark, SF).collect()
    n_docs = cat_table(spark, SF, "documents").count()
    assert len(rows) == 4 * n_docs, "base + copy + m1 + m2, one decision each"
    assert len({r["doc_id"] for r in rows}) == len(rows), "one decision per doc"
    by_stage: dict[str, list] = {}
    for r in rows:
        by_stage.setdefault(r["stage"], []).append(r)
    assert set(by_stage) == {"exact", "near", "kept"}, "all stages must fire"
    kept = {r["doc_id"] for r in by_stage["kept"]}
    for r in by_stage["kept"]:
        assert r["survivor_id"] == r["doc_id"]
    for r in by_stage["near"]:
        assert r["survivor_id"] in kept, "near survivor must be a kept doc"
        assert r["survivor_id"] < r["doc_id"], "canonical is the min id"
    # exact copies (+3M offset) must all be removed by the exact stage
    exact_ids = {r["doc_id"] for r in by_stage["exact"]}
    from cloudtrail_streamer_spark.operators.dedup import _COPY_OFFSET

    copies = {r["doc_id"] for r in rows if r["doc_id"] >= _COPY_OFFSET}
    assert copies <= exact_ids, "every exact copy must be caught by md5 dedup"


def test_lsh_recall_certificate(spark):
    row = all_queries()["embed_lsh_recall"](spark, SF).collect()[0]
    assert row["n_truth"] > 0, "seeded truth set must be non-empty"
    assert row["recall"] >= 0.9, f"banded hyperplane LSH recall too low: {row}"


def test_window_priority_names_exist():
    """Every name in the driver-window priority list must be a registered
    query (planned-but-renamed ops would silently waste driver slots)."""
    import cloudtrail_streamer_spark.registry as R

    R._load_all()
    missing = [n for n in R._WINDOW_PRIORITY if n not in R._REGISTRY]
    assert not missing, f"window names not in registry: {missing}"
    assert len(R._WINDOW_PRIORITY) == 50
    assert len(set(R._WINDOW_PRIORITY)) == 50, "duplicate window slots"


def test_compression_quality_monotonic(spark):
    """text_compression_quality (H since r10): the registered query now
    returns the realized-invariant certificate — zero monotonicity /
    bounds violations, x4 improves the average — and the codec-valued
    aggregates live in compression_ratio_stats(); both are checked, plus
    the raw zlib invariant on extreme inputs."""
    import zlib

    from cloudtrail_streamer_spark.operators.engine_ext import compression_ratio_stats
    from cloudtrail_streamer_spark.registry import all_queries

    rows = all_queries()["text_compression_quality"](spark, SF).collect()
    assert rows and all(r["n_mono_violations"] == 0 for r in rows)
    assert all(r["n_bounds_violations"] == 0 for r in rows)
    assert all(r["x4_improves_avg"] for r in rows)
    stats = compression_ratio_stats(spark, SF).collect()
    assert stats and all(0.0 < r["min_ratio"] <= r["avg_ratio"] <= 1.2 for r in stats)
    # the invariant the UDF encodes, pinned on extreme inputs
    rep_txt = ("spam " * 200).encode()
    var_txt = " ".join(f"w{i}" for i in range(200)).encode()
    rep = len(zlib.compress(rep_txt, 6)) / len(rep_txt)
    var = len(zlib.compress(var_txt, 6)) / len(var_txt)
    assert rep < 0.1 < var, (rep, var)


def test_markov_rows_are_distributions(spark):
    """win_markov_transitions: each current-state row must be a
    probability distribution (sums to 1 within rounding) over at most
    |event types| successors."""
    from collections import defaultdict

    from cloudtrail_streamer_spark.registry import all_queries

    rows = all_queries()["win_markov_transitions"](spark, SF).collect()
    sums = defaultdict(float)
    fanout = defaultdict(int)
    for r in rows:
        sums[r["cur"]] += r["p"]
        fanout[r["cur"]] += 1
    assert sums and all(abs(s - 1.0) < 0.01 for s in sums.values()), dict(sums)
    assert all(n <= 5 for n in fanout.values())


def test_pit_features_are_leakage_free(spark):
    """feature_pit_join: a customer's first order must see 0 prior
    orders, counts are strictly increasing along each customer's order
    sequence, and no row ever sees the customer's full order count."""
    from collections import defaultdict

    from cloudtrail_streamer_spark.registry import all_queries

    rows = all_queries()["feature_pit_join"](spark, SF).collect()
    per_cust = defaultdict(list)
    for r in rows:
        per_cust[r["o_custkey"]].append(r["n_prior_orders"])
    for cust, counts in per_cust.items():
        assert min(counts) == 0, f"customer {cust}: no zero-history row"
        assert max(counts) == len(counts) - 1, f"customer {cust}: leakage"


def test_interpolation_is_exact_on_observed_and_bounded_between(spark):
    """events_interpolate_linear: observed hours pass through verbatim;
    interpolated values lie strictly between their neighbors' values
    (linearity corollary on a 1-hour grid)."""
    from cloudtrail_streamer_spark.registry import all_queries

    rows = all_queries()["events_interpolate_linear"](spark, SF).collect()
    assert any(r["is_observed"] == 0 for r in rows), "no gaps exercised"
    for r in rows:
        assert r["n_filled"] is not None and r["n_filled"] >= 0
        if r["is_observed"] == 1:
            assert abs(r["n_filled"] - round(r["n_filled"])) < 1e-9, r


def _bpe_toks(spark, texts):
    from cloudtrail_streamer_spark.operators.engine_ext import _bpe_apply, _bpe_best  # noqa: F401

    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), " ")).alias("p", "tok"),
    ).select("doc_id", (F.col("p") + 1).cast("long").alias("pos"), "tok")


def test_bpe_merges_hand_corpus(spark):
    """text_bpe_merges kernel: known corpus, hand-computed merge chain.
    corpus = [the cat sat, the cat ran, the dog sat] →
    merge1 (the,cat)×2; after application the tie at count 1 breaks
    pair-ASC → merge2 (dog,sat); merge3 (the, dog_sat)."""
    from cloudtrail_streamer_spark.operators.engine_ext import _bpe_apply, _bpe_best

    toks = _bpe_toks(spark, ["the cat sat", "the cat ran", "the dog sat"])
    b1 = _bpe_best(toks).collect()[0]
    assert (b1["w1"], b1["w2"], b1["c"]) == ("the", "cat", 2)
    toks = _bpe_apply(toks, _bpe_best(toks))
    b2 = _bpe_best(toks).collect()[0]
    assert (b2["w1"], b2["w2"], b2["c"]) == ("dog", "sat", 1)
    toks = _bpe_apply(toks, _bpe_best(toks))
    b3 = _bpe_best(toks).collect()[0]
    assert (b3["w1"], b3["w2"]) == ("the", "dog_sat")


def test_bpe_apply_greedy_nonoverlapping(spark):
    """'a b a b a' with merge (a,b): both matches apply (non-overlapping
    since w1 ≠ w2), yielding [a_b, a_b, a]; the next iteration's best
    pair must then be (a_b, a) — the self-pair (a_b, a_b) is excluded
    by the w1 ≠ w2 rule."""
    from cloudtrail_streamer_spark.operators.engine_ext import _bpe_apply, _bpe_best

    toks = _bpe_toks(spark, ["a b a b a"])
    merged = _bpe_apply(toks, _bpe_best(toks)).orderBy("pos").collect()
    assert [r["tok"] for r in merged] == ["a_b", "a_b", "a"]
    b2 = _bpe_best(
        _bpe_apply(_bpe_toks(spark, ["a b a b a"]), _bpe_best(toks))
    ).collect()[0]
    assert (b2["w1"], b2["w2"], b2["c"]) == ("a_b", "a", 1)


def test_training_shards_manifest_covers_all_docs(spark):
    """sink_training_shards: 8 shards, doc counts sum to the corpus
    size, every token counted exactly once."""
    rows = all_queries()["sink_training_shards"](spark, SF).collect()
    assert len(rows) == 8
    docs = table(spark, SF, "documents")
    n = docs.count()
    toks = docs.select(F.sum(F.size(F.split("text", " "))).alias("t")).collect()[0]["t"]
    assert sum(r["n_docs"] for r in rows) == n
    assert sum(r["n_tokens"] for r in rows) == toks


def test_match_recognize_leftmost_nonoverlapping(spark):
    """win_match_recognize semantics on a hand sequence: 'vvcpvcpx' has
    two non-overlapping v+c+p matches, first = 'vvcp'; 'vpc' has none
    (order matters); greedy + leftmost in both engines."""
    import datetime

    rows = []
    for uid, types in [
        (1, ["view", "view", "click", "purchase", "view", "click", "purchase", "x"]),
        (2, ["view", "purchase", "click"]),
    ]:
        for i, t in enumerate(types):
            rows.append((i, datetime.datetime(2024, 1, 1, 0, i), uid, t))
    d = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    seq = d.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            "ts", "event_id", F.substring("event_type", 1, 1).alias("l")
                        )
                    )
                ),
                lambda s: s["l"],
            ),
            "",
        ).alias("s")
    )
    marked = F.regexp_replace("s", "v+c+p", "#")
    got = {
        r["user_id"]: (r["m"], r["n"])
        for r in seq.select(
            "user_id",
            F.regexp_extract("s", "v+c+p", 0).alias("m"),
            (F.length(marked) - F.length(F.regexp_replace(marked, "#", "")))
            .cast("long")
            .alias("n"),
        ).collect()
    }
    assert got[1] == ("vvcp", 2)
    assert got[2] == ("", 0)


def test_touch_attribution_conserves_purchases(spark):
    """win_touch_attribution: channels are only view/click/direct, and
    attributed purchase counts sum to the total purchase count."""
    rows = all_queries()["win_touch_attribution"](spark, SF).collect()
    ev = table(spark, SF, "events")
    n_purch = ev.where(F.col("event_type") == "purchase").count()
    assert {r["channel"] for r in rows} <= {"view", "click", "direct"}
    assert sum(r["n_purchases"] for r in rows) == n_purch


def test_staged_covers_unchecked_queries():
    """The staged next-round rotation must (a) name only registered
    queries, (b) together with the current window cover EVERY query
    lacking a driver row across all CORRECTNESS_r* captures, with no
    overlap — so the next rotation is mechanical and cannot waste
    driver slots. Since r10 the staged list holds STALE-cert queries
    (every registered query has at least one driver row after r9), so
    staged entries may already be checked — but only with an OLD cert:
    a staged name whose latest cert is from the current or previous
    round is a wasted r11 slot."""
    import json
    import os

    import cloudtrail_streamer_spark.registry as R

    R._load_all()
    staged, window = set(R._R12_STAGED), set(R._WINDOW_PRIORITY)
    missing = staged - set(R._REGISTRY)
    assert not missing, f"staged names not registered: {sorted(missing)}"
    assert not (staged & window), "staged/window overlap wastes slots"
    latest: dict[str, int] = {}
    for f in sorted(os.listdir("/root/repo")):
        if f.startswith("CORRECTNESS_r") and f.endswith(".json"):
            rnd = int(f.split("_r")[1].split(".")[0])
            for name in json.load(open(os.path.join("/root/repo", f))):
                latest[name] = max(latest.get(name, 0), rnd)
    unchecked = set(R._REGISTRY) - set(latest)
    assert unchecked <= window | staged, (
        f"every unchecked query needs a slot; "
        f"missing={sorted(unchecked - (window | staged))}"
    )
    fresh = {n for n in staged if latest.get(n, 0) >= max(latest.values()) - 1}
    assert not fresh, f"staged but freshly certified: {sorted(fresh)}"


def test_python_datasource_split_pruning():
    """The claimed EqualTo(aws_region) must prune generator splits at
    planning time — and ONLY matching splits may survive, because Spark
    deletes the Filter node for claimed predicates (a claimed-but-
    unapplied filter would silently return wrong rows)."""
    from pyspark.sql.datasource import EqualTo, GreaterThan

    from cloudtrail_streamer_spark.operators.datasource_py import _CTGenReader

    r = _CTGenReader({"n_events": "64000", "splits": "8"})
    unsupported = list(
        r.pushFilters(
            [EqualTo(("aws_region",), "us-east-1"), GreaterThan(("event_id",), 5)]
        )
    )
    # only the region equality is claimed; everything else handed back
    assert unsupported == [GreaterThan(("event_id",), 5)]
    parts = r.partitions()
    assert [(p.start, p.end, p.region) for p in parts] == [
        (0, 8000, "us-east-1"),
        (32000, 40000, "us-east-1"),
    ]
    n = sum(b.num_rows for p in parts for b in r.read(p))
    assert n == 16000
    # an impossible value prunes everything (still exhaustive, still correct)
    r2 = _CTGenReader({"n_events": "64000", "splits": "8"})
    list(r2.pushFilters([EqualTo(("aws_region",), "mars-north-1")]))
    assert r2.partitions() == []
    # no filters: all 8 splits, full domain
    r3 = _CTGenReader({"n_events": "64000", "splits": "8"})
    parts3 = r3.partitions()
    assert len(parts3) == 8
    assert sum(b.num_rows for p in parts3 for b in r3.read(p)) == 64000


def test_python_stream_reader_offset_resume():
    """The streaming reader's offset contract: chunked progress, exact
    resumption from any checkpointed offset, and a terminal empty read
    — what makes the multi-restart availableNow drive exactly-once."""
    from cloudtrail_streamer_spark.operators.datasource_py import _CTGenStreamReader

    r = _CTGenStreamReader({"n_events": "2000", "chunk": "700"})
    rows, off = r.read({"pos": 0})
    rows = list(rows)
    assert len(rows) == 700 and off == {"pos": 700}
    assert rows[0][0] == 0 and rows[-1][0] == 699
    # resume mid-stream (as a restarted query would, from the checkpoint)
    rows2, off2 = r.read({"pos": 1400})
    rows2 = list(rows2)
    assert len(rows2) == 600 and off2 == {"pos": 2000}
    assert rows2[0][0] == 1400 and rows2[-1][0] == 1999
    # terminal: no data, offset unchanged
    rows3, off3 = r.read({"pos": 2000})
    assert list(rows3) == [] and off3 == {"pos": 2000}


def test_python_datasource_writer_chunking_and_abort(tmp_path):
    """The V2 writer's delivery invariants, pinned off-cluster: record
    cap flushes at exactly 500, byte cap flushes before overflow, the
    receipts account for every row, and abort removes exactly this
    attempt's files (retry safety)."""
    import gzip
    import json
    import os

    from pyspark.sql import Row

    from cloudtrail_streamer_spark.operators.datasource_py import (
        _KinesisStubWriter,
    )

    out = str(tmp_path)
    w = _KinesisStubWriter({"path": out, "run_id": "t1"})
    msg = w.write(iter([Row(event_id=i, event_type="click") for i in range(1200)]))
    assert [c[0] for c in msg.chunks] == [500, 500, 200]
    w.commit([msg])
    man = json.load(open(os.path.join(out, "_MANIFEST_t1.json")))
    assert man["n_records"] == 1200 and man["n_chunks"] == 3
    assert man["max_chunk_records"] == 500
    # the delivered bytes re-parse to the same rows
    files = [f for f in os.listdir(out) if f.startswith("chunk_t1_")]
    n = sum(
        sum(1 for _ in gzip.open(os.path.join(out, f), "rt")) for f in files
    )
    assert n == 1200
    # byte cap: 64 KiB payloads must flush every ~4 rows, never overflow
    w2 = _KinesisStubWriter({"path": out, "run_id": "t2"})
    big = "x" * 65536
    msg2 = w2.write(iter([Row(event_id=i, payload=big) for i in range(10)]))
    assert all(b <= w2.BYTE_CAP for _, b in msg2.chunks)
    assert sum(c[0] for c in msg2.chunks) == 10
    # abort removes ONLY this attempt's files
    w2.abort([msg2])
    left = [f for f in os.listdir(out) if f.startswith("chunk_t2_")]
    assert left == []
    assert [f for f in os.listdir(out) if f.startswith("chunk_t1_")], (
        "abort must not touch other runs' deliveries"
    )


def test_python_stream_writer_epoch_idempotent(tmp_path):
    """A replayed epoch (same batchId committed twice, as after a crash
    between sink commit and checkpoint write) must be a no-op: one
    manifest, original totals — the exactly-once guarantee."""
    import json
    import os

    from pyspark.sql import Row

    from cloudtrail_streamer_spark.operators.datasource_py import (
        _KinesisStubStreamWriter,
    )

    out = str(tmp_path)
    w = _KinesisStubStreamWriter({"path": out, "run_id": "e1"})
    msg = w.write(iter([Row(event_id=i) for i in range(100)]))
    w.commit([msg], batchId=7)
    man_path = os.path.join(out, "_EPOCH_7.json")
    first = json.load(open(man_path))
    assert first["n_records"] == 100 and first["batch_id"] == 7
    # replay the same epoch with different (duplicate) content
    msg2 = w.write(iter([Row(event_id=i) for i in range(100)]))
    w.commit([msg2], batchId=7)
    assert json.load(open(man_path)) == first, "replayed epoch must not re-commit"
    # a NEW epoch commits normally
    w.commit([msg2], batchId=8)
    assert os.path.exists(os.path.join(out, "_EPOCH_8.json"))


def test_tfidf_strategies_agree(spark):
    """text_tfidf's two df stages (single-pass window vs skew-free
    aggregate+join) must produce identical rows — the cost router may
    pick either without changing results."""
    from cloudtrail_streamer_spark.operators.text import _tfidf_frame

    a = _tfidf_frame(spark, SF, "window").collect()
    b = _tfidf_frame(spark, SF, "join").collect()
    key = lambda r: (r["doc_id"], r["term"])  # noqa: E731
    assert sorted(map(tuple, a), key=lambda t: (t[0], t[1])) == sorted(
        map(tuple, b), key=lambda t: (t[0], t[1])
    )
    assert len(a) == len({key(r) for r in a})


def test_scripting_conf_restored(spark):
    """sql_scripting_param must restore spark.sql.scripting.enabled to
    its prior value — a leaked parser conf changes behavior for every
    later query in the process (ADVICE r05)."""
    before = spark.conf.get("spark.sql.scripting.enabled", None)
    all_queries()["sql_scripting_param"](spark, SF).collect()
    after = spark.conf.get("spark.sql.scripting.enabled", None)
    assert before == after, f"conf leaked: {before!r} -> {after!r}"


def test_scratch_dir_distinct_per_sf():
    """One process touching the same query at two scale factors must get
    two scratch paths — aliasing would let the second build overwrite
    files the first DataFrame's cached file index still points at
    (VERDICT r05 #2; exactly bench.py --floor's lo/hi interleave)."""
    from cloudtrail_streamer_spark.catalog import scratch_dir

    a = scratch_dir("merge_upsert_partitioned", "/root/testdata/sf0.001")
    b = scratch_dir("merge_upsert_partitioned", "/root/testdata/sf0.01")
    assert a != b
    # and stable on re-request (bench min-of-N reruns overwrite in place)
    assert a == scratch_dir("merge_upsert_partitioned", "/root/testdata/sf0.001")


def test_seeded_corpus_guard_trips(spark):
    """A base doc_id >= _SEED_OFFSET must fail LOUDLY: the oracle applies
    the identical offsets, so a silent collision would corrupt both
    engines identically and the hash check would still pass."""
    import pytest

    from cloudtrail_streamer_spark.operators.dedup import (
        _SEED_OFFSET,
        seeded_neardup_corpus,
    )

    bad = spark.createDataFrame(
        [(int(_SEED_OFFSET) + 5, "hello world")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="collide"):
        seeded_neardup_corpus(bad).collect()
    ok = spark.createDataFrame([(7, "hello world")], "doc_id long, text string")
    assert seeded_neardup_corpus(ok).count() == 2


def test_domain_mixture_invariants(spark):
    """pipeline_domain_mixture: probabilities form a distribution
    (sum≈1 within rounding), the temperature exponent (α=0.7 < 1) must
    UPWEIGHT small sources relative to proportional sampling, and the
    planned 1M draw must hit the budget within per-source rounding."""
    rows = all_queries()["pipeline_domain_mixture"](spark, SF).collect()
    tot_tokens = sum(r["n_tokens"] for r in rows)
    p_sum = sum(r["p_sample"] for r in rows)
    assert abs(p_sum - 1.0) < 1e-3 * len(rows)
    assert abs(sum(r["planned_tokens_1m"] for r in rows) - 1_000_000) <= len(rows)
    smallest = min(rows, key=lambda r: r["n_tokens"])
    largest = max(rows, key=lambda r: r["n_tokens"])
    assert smallest["p_sample"] > smallest["n_tokens"] / tot_tokens - 1e-9
    assert largest["p_sample"] < largest["n_tokens"] / tot_tokens + 1e-9


def test_crossdoc_substring_bounds(spark):
    """text_crossdoc_substring: every reported doc has 0 < n_shared <=
    n_windows, ratio consistent; and sharing is symmetric — a shared
    window implicates at least two docs, so the doc count is >= 2
    whenever any row exists."""
    rows = all_queries()["text_crossdoc_substring"](spark, SF).collect()
    for r in rows:
        assert 0 < r["n_shared"] <= r["n_windows"]
        assert abs(r["shared_ratio"] - round(r["n_shared"] / r["n_windows"], 4)) < 1e-9
    if rows:
        assert len(rows) >= 2, "shared windows must implicate >= 2 docs"


def test_psi_drift_distribution(spark):
    """agg_psi_drift: smoothed per-period probabilities each sum to ~1
    over buckets (Laplace denominator accounts for the 10-bin domain),
    and every PSI term is non-negative up to rounding — (p-q)·ln(p/q)
    has the same sign in both factors."""
    rows = all_queries()["agg_psi_drift"](spark, SF).collect()
    assert rows, "bucketed events must produce rows"
    assert all(r["psi_term"] >= -1e-6 for r in rows)
    # missing buckets contribute 1/(T+10) each; allow their mass
    missing = 10 - len(rows)
    for col, miss_unit in (("p_ref", "ta"), ("p_cur", "tb")):
        s = sum(r[col] for r in rows)
        assert 0.9 <= s <= 1.0 + 1e-6, f"{col} sums to {s}"
        assert missing >= 0


def test_exact_int_gram_both_regimes():
    """embed_covariance_matrix's Gram kernel must equal the direct int64
    matmul in BOTH the single-dgemm regime (small magnitudes) and the
    split-GEMM regime (magnitudes that overflow float64 exactness)."""
    import numpy as np

    from cloudtrail_streamer_spark.operators.stats_tests import exact_int_gram

    rng = np.random.default_rng(7)
    small = rng.integers(-600_000, 600_000, size=(1000, 64), dtype=np.int64)
    assert np.array_equal(exact_int_gram(small), small.T @ small)
    # force the split path: rows * qmax^2 >= 2^53
    big = rng.integers(-(1 << 23), 1 << 23, size=(1000, 16), dtype=np.int64)
    big[0, 0] = (1 << 24) - 1  # pin qmax near the bound
    assert 1000 * ((1 << 24) - 1) ** 2 >= (1 << 53)
    assert np.array_equal(exact_int_gram(big), big.T @ big)
    # bound violation must fail loudly, never silently lose exactness
    import pytest as _pytest

    # ValueError, not AssertionError, since ADVICE r09 #3: the guards
    # must survive `python -O`, so they are unconditional raises now
    with _pytest.raises(ValueError):
        exact_int_gram(np.array([[1 << 24]], dtype=np.int64))
    # split-path recombination bound (ADVICE r08 #2): rows*qmax^2 >= 2^63
    # would wrap the int64 shift-add — must raise, not corrupt partials
    wide = np.full((32769, 2), (1 << 24) - 1, dtype=np.int64)
    assert 32769 * ((1 << 24) - 1) ** 2 >= (1 << 63)
    with _pytest.raises(ValueError):
        exact_int_gram(wide)


def test_winsorized_mean_bounds_resolve(spark):
    """ADVICE r08 #1 regression: with float `/` rank arithmetic the lo/hi
    order statistics resolved only when (n-1) % 20 == 0 — otherwise both
    engines silently returned NULL bounds and winsorized == raw, and the
    mirrored flaw made the cross-engine hash pass anyway. sf0.001 has
    n=202 purchases ((n-1) % 20 = 1), so this fixture exercises exactly
    the broken case: bounds must be real rows and the clipped mean must
    differ from the raw mean."""
    from cloudtrail_streamer_spark.registry import all_queries

    row = all_queries()["agg_winsorized_mean"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert (row["n"] - 1) % 20 != 0, "fixture must hit a non-multiple rank"
    assert row["lo_cents"] is not None and row["hi_cents"] is not None
    assert row["lo_cents"] <= row["hi_cents"]
    assert row["winsorized_mean"] != row["raw_mean"]


def test_ordered_folds_partition_invariant(spark):
    """The r8 ordered-fold ops (DSIR per-doc sums, power-iteration
    matvecs/norms) claim bit-identical results regardless of physical
    partitioning — collect_list order varies with partition count, and
    sort_array is what normalizes it. Re-run both under a different
    shuffle-partition count and require EXACT equality."""
    from cloudtrail_streamer_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    base_dsir = all_queries()["text_dsir_importance"](spark, sf).collect()
    base_pow = all_queries()["embed_power_iteration"](spark, sf).collect()
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        alt_dsir = all_queries()["text_dsir_importance"](spark, sf).collect()
        alt_pow = all_queries()["embed_power_iteration"](spark, sf).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
    assert [tuple(r) for r in base_dsir] == [tuple(r) for r in alt_dsir]
    assert [tuple(r) for r in base_pow] == [tuple(r) for r in alt_pow]


def test_containment_catches_truncation_excerpts(spark):
    """text_minhash_containment: every seeded pair is a 90%-truncation
    (mutation ⊂ original up to one substituted token), so the op must
    flag mutation ids against their original, with containment ≥ 0.8
    and containment ≥ jaccard on every emitted row."""
    rows = all_queries()["text_minhash_containment"](spark, SF).collect()
    assert rows, "seeded excerpts must be flagged"
    for r in rows:
        assert r["containment"] >= 0.8
        assert r["containment"] >= r["jaccard"]
    seeded = {(r["id_a"], r["id_b"]) for r in rows if r["id_b"] == r["id_a"] + 1000000}
    assert len(seeded) >= 20, f"only {len(seeded)} seeded excerpt pairs flagged"
