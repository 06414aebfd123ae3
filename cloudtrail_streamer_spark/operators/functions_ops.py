"""Scalar-function operators (SURVEY.md §2.B B-38..B-44).

String / date / math / json / array / map / explode surfaces, all
expressed as built-in ``pyspark.sql.functions`` (JVM whole-stage
codegen; zero Python in the row path). The JSON ops generalize the
reference's only record-level operation — envelope parse + Records
unwrap (A-7, upstream ``main.go:~150-165`` approx).

Cross-engine pins (SURVEY.md §5.3 rule 6), each verified live against
DuckDB 1.0:
- ``dayofweek``: Spark 1=Sunday..7 vs DuckDB 0=Sunday..6 → oracle +1.
- ``date_trunc``: DuckDB returns DATE for 'month' → oracle casts back
  to TIMESTAMP.
- ``months_between`` has no DuckDB twin → oracle reproduces Spark's
  documented (y*12 + m + (d1-d2)/31) formula; both sides ROUND(,4).
- integer outputs pinned to BIGINT on both sides (DuckDB year()/len()
  return BIGINT, Spark returns int).
- float32 array math: cast elements to DOUBLE *before* any arithmetic
  on both sides, fold left-to-right, ROUND(,4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudtrail_streamer_spark.catalog import table
from cloudtrail_streamer_spark.functions import cents
from cloudtrail_streamer_spark.registry import query

_STRING_ORACLE = """
SELECT
  p_partkey,
  substr(p_name, 2, 5) AS sub5,
  upper(p_name) AS up_name,
  lower(p_brand) AS lo_brand,
  trim(concat('  ', p_name, '  ')) AS trimmed,
  concat_ws('|', p_brand, p_type) AS brand_type,
  CAST(length(p_name) AS BIGINT) AS name_len,
  replace(p_name, 'a', '@') AS replaced,
  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
  regexp_extract(p_brand, '#(\\d+)', 1) AS brand_num,
  string_split(p_type, ' ')[1] AS first_type_word
FROM part
"""


@query("fn_string", oracle=_STRING_ORACLE, survey_id="B-38")
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.substring("p_name", 2, 5).alias("sub5"),
        F.upper("p_name").alias("up_name"),
        F.lower("p_brand").alias("lo_brand"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.replace(F.col("p_name"), F.lit("a"), F.lit("@")).alias("replaced"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_num"),
        F.split("p_type", " ").getItem(0).alias("first_type_word"),
    )


_DATE_ORACLE = """
SELECT
  o_orderkey,
  CAST(year(o_orderdate) AS BIGINT) AS yr,
  CAST(month(o_orderdate) AS BIGINT) AS mo,
  CAST(day(o_orderdate) AS BIGINT) AS dy,
  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
  o_orderdate + INTERVAL 5 DAY AS plus5,
  round((year(o_orderdate) - 1995) * 12 + (month(o_orderdate) - 1)
        + (day(o_orderdate) - 15) / 31.0, 4) AS months_since,
  CAST(date_diff('day', TIMESTAMP '1995-01-15 00:00:00', o_orderdate) AS BIGINT) AS days_since,
  CAST(extract(quarter FROM o_orderdate) AS BIGINT) AS qtr
FROM orders
"""


@query("fn_date", oracle=_DATE_ORACLE, survey_id="B-39")
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    ref = F.lit("1995-01-15 00:00:00").cast("timestamp")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("yr"),
        F.month(d).cast("long").alias("mo"),
        F.dayofmonth(d).cast("long").alias("dy"),
        F.dayofweek(d).cast("long").alias("dow"),
        F.date_trunc("month", d).alias("month_start"),
        F.expr("o_orderdate + INTERVAL 5 DAYS").alias("plus5"),
        F.round(F.months_between(d, ref), 4).alias("months_since"),
        F.datediff(d, ref).cast("long").alias("days_since"),
        F.expr("extract(quarter FROM o_orderdate)").cast("long").alias("qtr"),
    )


_MATH_ORACLE = """
SELECT
  p_partkey,
  CAST(abs(p_size - 25) AS BIGINT) AS ab,
  round(p_size / 2.0, 0) AS half_rounded,
  CAST(floor(p_retailprice) AS BIGINT) AS fl,
  CAST(ceil(p_retailprice) AS BIGINT) AS cl,
  CAST(p_size % 7 AS BIGINT) AS pm,
  round(pow(p_size, 1.5), 4) AS pw,
  round(ln(p_retailprice), 4) AS lg,
  round(log10(p_retailprice), 4) AS l10,
  round(sqrt(p_size), 4) AS sq,
  CAST(sign(p_size - 25) AS DOUBLE) AS sg,
  CAST(greatest(p_size, 25) AS BIGINT) AS gr,
  CAST(least(p_size, 25) AS BIGINT) AS ls
FROM part
"""


@query("fn_math", oracle=_MATH_ORACLE, survey_id="B-40")
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pmod is safe as ``%`` here because p_size ≥ 0 (§5.3 rule 6)."""
    p = table(spark, sf_dir, "part")
    sz = F.col("p_size")
    rp = F.col("p_retailprice")
    return p.select(
        "p_partkey",
        F.abs(sz - 25).cast("long").alias("ab"),
        F.round(sz / 2.0, 0).alias("half_rounded"),
        F.floor(rp).cast("long").alias("fl"),
        F.ceil(rp).cast("long").alias("cl"),
        F.pmod(sz, 7).cast("long").alias("pm"),
        F.round(F.pow(sz, 1.5), 4).alias("pw"),
        F.round(F.log(rp), 4).alias("lg"),
        F.round(F.log10(rp), 4).alias("l10"),
        F.round(F.sqrt(sz), 4).alias("sq"),
        F.signum(sz - 25).cast("double").alias("sg"),
        F.greatest(sz, F.lit(25)).cast("long").alias("gr"),
        F.least(sz, F.lit(25)).cast("long").alias("ls"),
    )


_JSON_ORACLE = """
SELECT
  event_id,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_path,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_struct,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_tuple
FROM events
"""


@query("fn_json", oracle=_JSON_ORACLE, survey_id="B-41")
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three JSON access paths over the same value (A-7 generalized):
    path-extract, schema-parse (from_json — the 'analytics mode' parse of
    SURVEY.md §1.2), and json_tuple (generator form)."""
    e = table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k INT")
    tup = e.select("event_id", "props", F.json_tuple(F.col("props"), "k").alias("ktup"))
    return (
        tup.withColumn("k_path", F.get_json_object(F.col("props"), "$.k").cast("long"))
        .withColumn("k_struct", parsed.getField("k").cast("long"))
        .withColumn("k_tuple", F.col("ktup").cast("long"))
        .select("event_id", "k_path", "k_struct", "k_tuple")
    )


_ARRAY_ORACLE = """
SELECT
  vec_id,
  CAST(len(embedding) AS BIGINT) AS n_dims,
  CAST(embedding[1] AS DOUBLE) AS first_val,
  CAST(list_max(embedding) AS DOUBLE) AS vmax,
  CAST(list_min(embedding) AS DOUBLE) AS vmin,
  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
  round(list_aggregate(list_transform(embedding[2:4], x -> CAST(x AS DOUBLE)), 'sum'), 4) AS slice_sum,
  round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 4) AS sum_sq,
  round(list_dot_product(CAST(embedding AS DOUBLE[]), list_reverse(CAST(embedding AS DOUBLE[]))), 4) AS dot_rev
FROM embeddings
"""


@query("fn_array", oracle=_ARRAY_ORACLE, survey_id="B-42")
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the float[64] embedding column.

    All arithmetic in DOUBLE (cast before multiply) with left-to-right
    folds — matches DuckDB's list_* evaluation; ROUND(,4) on folds.
    """
    em = table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    ed = F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
    return em.select(
        "vec_id",
        F.size(e).cast("long").alias("n_dims"),
        F.element_at(e, 1).cast("double").alias("first_val"),
        F.array_max(e).cast("double").alias("vmax"),
        F.array_min(e).cast("double").alias("vmin"),
        F.size(F.filter(e, lambda x: x > 0)).cast("long").alias("n_pos"),
        F.round(
            F.aggregate(F.slice(ed, 2, 3), F.lit(0.0), lambda a, x: a + x), 4
        ).alias("slice_sum"),
        F.round(
            F.aggregate(ed, F.lit(0.0), lambda a, x: a + x * x), 4
        ).alias("sum_sq"),
        F.round(
            F.aggregate(
                F.zip_with(ed, F.reverse(ed), lambda x, y: x * y),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            4,
        ).alias("dot_rev"),
    )


_MAP_ORACLE = """
SELECT
  event_id,
  MAP{'u': user_id, 'k': CAST(json_extract_string(props, '$.k') AS BIGINT)}['u'][1] AS map_user,
  MAP{'u': user_id, 'k': CAST(json_extract_string(props, '$.k') AS BIGINT)}['k'][1] AS map_k,
  CAST(len(map_keys(MAP{'u': user_id, 'k': CAST(json_extract_string(props, '$.k') AS BIGINT)})) AS BIGINT) AS n_keys
FROM events
"""


@query("fn_map", oracle=_MAP_ORACLE, survey_id="B-44")
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType construction + key/value access (DuckDB map[k] yields a
    one-element list — oracle unwraps with [1])."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    m = F.create_map(F.lit("u"), F.col("user_id"), F.lit("k"), k)
    return e.select(
        "event_id",
        F.element_at(m, "u").alias("map_user"),
        F.element_at(m, "k").alias("map_k"),
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
    )


_EXPLODE_ORACLE = """
SELECT
  doc_id,
  unnest(string_split(text, ' ')) AS tok,
  CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) AS pos
FROM documents
"""


@query("fn_explode", oracle=_EXPLODE_ORACLE, survey_id="B-43")
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of tokenized text (the Records[]-unwrap of A-7 as a
    relational generator op); pos is 1-based to match generate_subscripts."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "tok")
    ).select("doc_id", "tok", (F.col("pos0") + 1).cast("long").alias("pos"))


_NESTED_STRUCT_ORACLE = """
WITH v AS (
  SELECT l_orderkey, l_linenumber,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
  FROM lineitem
), r AS (
  SELECT l_orderkey, cents,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_linenumber, cents) AS rn_first,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_linenumber DESC, cents DESC) AS rn_last
  FROM v
)
SELECT l_orderkey,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(MIN(CASE WHEN rn_first = 1 THEN cents END) AS BIGINT) AS first_line_cents,
       CAST(MIN(CASE WHEN rn_last = 1 THEN cents END) AS BIGINT) AS last_line_cents,
       CAST(MAX(cents) AS BIGINT) AS max_line_cents
FROM r
GROUP BY l_orderkey
"""


@query("fn_nested_struct", oracle=_NESTED_STRUCT_ORACLE, survey_id="B-42-ext")
def fn_nested_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested composite types end-to-end: rows → array<struct> per order
    (collect_list of (linenumber, cents) structs), deterministically
    array_sort'ed (struct comparison is field-order lexicographic:
    linenumber, then cents — the fixture HAS duplicate linenumbers per
    order, so the second field is load-bearing for determinism), then
    consumed with struct-field access (element_at(...).getField) and a
    higher-order transform projecting a struct field for array_max. The
    oracle states the same semantics relationally with the identical
    (linenumber, cents) total order — nested construction must agree
    with the flat answer. The per-key array is bounded by lines-per-
    order (~7), so the collect is group-local and scale-safe — this is
    the denormalize-to-nested write shape used for point-lookup layouts
    at 100 TB, not a driver-side collect."""
    li = table(spark, sf_dir, "lineitem")
    line = F.struct(F.col("l_linenumber").alias("ln"), cents("l_extendedprice").alias("c"))
    g = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list(line)).alias("lines")
    )
    return g.select(
        "l_orderkey",
        F.size("lines").cast("long").alias("n_lines"),
        F.element_at("lines", 1).getField("c").cast("long").alias("first_line_cents"),
        F.element_at("lines", -1).getField("c").cast("long").alias("last_line_cents"),
        F.array_max(F.transform("lines", lambda s: s.getField("c")))
        .cast("long")
        .alias("max_line_cents"),
    )


_INTERVAL_ORACLE = """
SELECT o_orderkey,
       CAST(o_orderdate + INTERVAL 1 MONTH AS TIMESTAMP) AS plus_month,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
       CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr
FROM orders
"""


@query("fn_interval_arith", oracle=_INTERVAL_ORACLE, survey_id="B-39-ext")
def fn_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-aware interval arithmetic — the B-39 widening that pins
    the cross-engine EDGE semantics rather than happy paths: add-month
    end-of-month clamping (Jan 31 + 1 month = Feb 28 in both engines),
    last_day, ISO week truncation (Monday start in both), and quarter
    extraction. All four are codegen'd built-ins; the oracle runs the
    ANSI equivalents so any clamping/week-origin divergence fails the
    hash."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.add_months("o_orderdate", 1).cast("timestamp").alias("plus_month"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.date_trunc("week", "o_orderdate").alias("week_start"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
    )


_STRING_ADV_ORACLE = """
SELECT p_partkey,
       array_to_string(regexp_extract_all(p_name, '[aeiou]+'), '|') AS vowel_runs,
       translate(p_brand, '#', '-') AS brand_dash,
       reverse(p_name) AS rev_name,
       repeat(p_brand, 2) AS brand2,
       CAST(strpos(p_name, 'a') AS BIGINT) AS first_a,
       CAST(ascii(p_name) AS BIGINT) AS first_cp
FROM part
"""


@query("fn_string_advanced", oracle=_STRING_ADV_ORACLE, survey_id="B-38-ext")
def fn_string_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-38 widening with the trap-prone string builtins: extract-ALL
    regex matches (joined to one string — the driver canonicalizer
    can't hash arrays), character translation, reverse, repeat,
    first-occurrence position (1-based in both engines), and the
    leading code point. All codegen'd JVM builtins; the oracle pins
    DuckDB's equivalents (strpos == instr/position, ascii ==
    unicode-of-first-char semantics verified)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.array_join(
            F.expr("regexp_extract_all(p_name, '[aeiou]+', 0)"), "|"
        ).alias("vowel_runs"),
        F.translate("p_brand", "#", "-").alias("brand_dash"),
        F.reverse(F.col("p_name")).alias("rev_name"),
        F.repeat(F.col("p_brand"), 2).alias("brand2"),
        F.instr(F.col("p_name"), "a").cast("long").alias("first_a"),
        F.ascii(F.col("p_name")).cast("long").alias("first_cp"),
    )


_MASK_ORACLE = """
SELECT c_custkey,
       regexp_replace(regexp_replace(regexp_replace(c_name,
         '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
         AS masked_name,
       substr(md5('pepper-2024' || c_name), 1, 16) AS name_token,
       CAST(length(c_name) AS BIGINT) AS name_len
FROM customer
"""


@query("fn_masking_governance", oracle=_MASK_ORACLE, survey_id="B-38-ext")
def fn_masking_governance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-governance column protection, two standard forms in one
    pass: format-preserving masking via the built-in mask() (uppercase →
    X, lowercase → x, digit → n — shape survives for validation/joins
    on structure) and deterministic peppered tokenization (md5 prefix of
    pepper||value — the same input always maps to the same token, so
    masked tables still join on identity without exposing it). Both are
    codegen'd row-local expressions — zero shuffle, applied at scan time
    in a real deployment's view layer. The oracle reproduces mask()'s
    default character classes with regexp chains, verified identical."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.mask("c_name").alias("masked_name"),
        F.substring(
            F.md5(F.concat(F.lit("pepper-2024"), F.col("c_name"))), 1, 16
        ).alias("name_token"),
        F.length("c_name").cast("long").alias("name_len"),
    )


_VARIANT_ORACLE = """
SELECT
  event_id,
  CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
  CAST(json_extract(props, '$.k') AS DOUBLE) AS k_dbl,
  json_extract_string(props, '$.k') AS k_str,
  CAST(NULL AS BIGINT) AS k_missing,
  CAST(json_extract(props, '$.k') AS BIGINT) IS NOT NULL AS has_k
FROM events
"""


@query("fn_variant_json", oracle=_VARIANT_ORACLE, survey_id="B-41-ext")
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type over the events ``props`` JSON column:
    ``parse_json`` builds the binary variant encoding once, then typed
    ``variant_get`` path extractions (bigint / double / string) read it
    without re-parsing — the open-schema answer to the reference's
    opaque ``json.RawMessage`` records (A-7): store the variant column
    in parquet and every downstream query gets shredded, typed access
    instead of per-query string parsing. ``try_variant_get`` on a
    missing path yields NULL (never errors), mirroring the permissive
    contract. At 100 TB the single-parse property is the point: the
    variant bytes are written once at ingest; path reads are
    column-pruned binary probes, not JSON string scans."""
    e = table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_int"),
        F.variant_get(v, "$.k", "double").alias("k_dbl"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.missing", "bigint").alias("k_missing"),
        F.variant_get(v, "$.k", "bigint").isNotNull().alias("has_k"),
    )


_COLLATION_ORACLE = """
SELECT lower(CASE WHEN p_partkey % 2 = 0 THEN upper(p_brand) ELSE lower(p_brand) END)
         AS brand_ci,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(COUNT(DISTINCT p_type) AS BIGINT) AS n_types
FROM part
GROUP BY 1
"""


@query("fn_collation_lcase", oracle=_COLLATION_ORACLE, survey_id="B-38-ext")
def fn_collation_lcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collation support: grouping on a UTF8_LCASE-collated
    column makes 'Brand#13' / 'BRAND#13' / 'brand#13' one group at the
    COMPARISON level — no lower() rewrite of every predicate, and the
    collation survives into joins/sorts on the same column. The input
    deliberately mixes casing by parity of p_partkey; the emitted group
    key is normalized via min(lower(...)) so the output (unlike the
    collated grouping value, whose representative casing is
    engine-internal) is deterministic and hash-checkable against the
    DuckDB lower()-group equivalent. At scale, collation beats
    expression-wrapped grouping because the optimizer still sees a bare
    column — statistics, pruning, and bucketing on it remain usable."""
    p = table(spark, sf_dir, "part")
    mixed = F.when(
        F.col("p_partkey") % 2 == 0, F.upper(F.col("p_brand"))
    ).otherwise(F.lower(F.col("p_brand")))
    return (
        p.select(
            F.collate(mixed, "UTF8_LCASE").alias("brand_coll"),
            "p_type",
        )
        .groupBy("brand_coll")
        .agg(
            F.min(F.lower(F.col("brand_coll"))).alias("brand_ci"),
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.count_distinct("p_type").cast("long").alias("n_types"),
        )
        .select("brand_ci", "n_parts", "n_types")
    )


_TRY_ARITH_ORACLE = """
SELECT
  o_orderkey,
  CAST(round(o_totalprice * 100, 0) AS BIGINT) / NULLIF(o_orderkey % 7, 0)
    AS safe_div,
  TRY_CAST(CASE WHEN o_orderkey % 3 = 0 THEN '42' ELSE o_orderstatus END
           AS BIGINT) AS safe_parse,
  ([10, 20, 30])[CAST(o_orderkey % 5 + 2 AS INTEGER)] AS safe_elem
FROM orders
"""


@query("fn_try_arithmetic", oracle=_TRY_ARITH_ORACLE, survey_id="B-40-ext")
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression surface (try_divide / try_cast /
    try_element_at): malformed or out-of-domain inputs yield NULL
    instead of failing the job — the per-ROW version of the per-record
    quarantine in source_corrupt_records, and the right default for
    100 TB batch jobs where one bad row must not kill a 10-hour run.
    Division by zero, an unparseable string, and an out-of-bounds
    element access (indices 2..6 over a 3-element 1-based array) all map to
    NULL identically in DuckDB (NULLIF guard / TRY_CAST / DuckDB's
    NULL-on-out-of-range list index)."""
    o = table(spark, sf_dir, "orders")
    arr = F.array(F.lit(10).cast("long"), F.lit(20), F.lit(30))
    return o.select(
        "o_orderkey",
        F.try_divide(
            cents("o_totalprice").cast("double"),
            (F.col("o_orderkey") % 7).cast("double"),
        ).alias("safe_div"),
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("42"))
        .otherwise(F.col("o_orderstatus"))
        .try_cast("long")
        .alias("safe_parse"),
        F.try_element_at(arr, ((F.col("o_orderkey") % 5) + 2).cast("int")).alias("safe_elem"),
    )


_XML_PARSE_ORACLE = """
SELECT o_orderkey,
       o_orderstatus AS status_from_xml,
       CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_c_from_xml,
       CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_c_xpath
FROM orders
WHERE o_orderkey % 97 = 0
"""


@query("fn_xml_parse", oracle=_XML_PARSE_ORACLE, survey_id="B-41-ext")
def fn_xml_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML expression functions (Spark 4 built-ins): ``to_xml`` renders
    each row's payload struct as an XML document, ``from_xml`` parses it
    back against an explicit schema, and ``xpath_long`` extracts the
    same field via an XPath query — both extraction paths must agree
    with the raw columns (the oracle reads them straight from parquet,
    so any render/parse asymmetry hash-fails). All three are Catalyst
    expressions: codegen'd per row, no Python, and the from_xml schema
    is explicit — schema_of_xml at 100 TB would be an extra parse of
    every document. Filtered to ~1% of orders (keyed, deterministic) to
    keep the driver compare small; the expressions are per-row, so the
    1% slice exercises exactly what the full table would."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 97 == 0)
    doc = o.select(
        "o_orderkey",
        F.to_xml(
            F.struct(
                F.col("o_orderstatus").alias("status"),
                cents("o_totalprice").alias("price_c"),
            ),
            {"rowTag": "order"},
        ).alias("x"),
    )
    parsed = doc.select(
        "o_orderkey",
        F.from_xml("x", "status STRING, price_c BIGINT").alias("v"),
        F.xpath_long("x", F.lit("/order/price_c")).alias("price_c_xpath"),
    )
    return parsed.select(
        "o_orderkey",
        F.col("v.status").alias("status_from_xml"),
        F.col("v.price_c").alias("price_c_from_xml"),
        "price_c_xpath",
    )


# ---------------------------------------------------------------------------
# fn_aes_roundtrip — column-level encryption round trip (round 7)
# ---------------------------------------------------------------------------

_AES_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_roundtrip_ok,
       CAST(COUNT(DISTINCT text) AS BIGINT) AS n_cipher_distinct
FROM documents
"""


@query("fn_aes_roundtrip", oracle=_AES_ORACLE, survey_id="B-38-ext")
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption at rest: ``aes_encrypt``/``aes_decrypt``
    (AES-128-ECB — the DETERMINISTIC mode, chosen here because the
    certificate needs ciphertext determinism; production prefers GCM,
    whose random IV makes ciphertexts non-reproducible by design, with
    the same API). The driver row certifies the full loop JVM-side:
    every document decrypts back byte-identical (n_roundtrip_ok ==
    n_rows) and distinct plaintexts map to distinct ciphertexts
    (n_cipher_distinct == COUNT(DISTINCT text) — ECB is injective per
    block sequence). Both counts are recomputable from the documents
    table, so the certificate hash-matches even though DuckDB cannot
    run the cipher itself. Scale: pure codegen'd expressions, zero
    Python, row-local — encrypt-on-write costs one map-side pass."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    enc = d.select(
        "doc_id",
        "text",
        F.expr(
            "aes_encrypt(text, '0123456789abcdef', 'ECB', 'PKCS')"
        ).alias("cipher"),
    )
    dec = enc.select(
        "doc_id",
        "text",
        "cipher",
        F.expr(
            "CAST(aes_decrypt(cipher, '0123456789abcdef', 'ECB', 'PKCS') AS STRING)"
        ).alias("plain_rt"),
    )
    return dec.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum((F.col("plain_rt") == F.col("text")).cast("long"))
        .cast("long")
        .alias("n_roundtrip_ok"),
        F.count_distinct("cipher").cast("long").alias("n_cipher_distinct"),
    )
