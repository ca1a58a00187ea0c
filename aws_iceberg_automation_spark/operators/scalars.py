"""Scalar function families (SURVEY.md §2.9 #65-71): string, date/time,
math, array (incl. higher-order), map, JSON, hash.

Everything here is a built-in ``pyspark.sql.functions`` expression —
JVM-side, whole-stage-codegen'd, zero Python boundary. That is the
point of this module: the 100 TB hot path never leaves the JVM.

Oracle notes: both engines get IEEE-identical doubles for arithmetic on
identical inputs; libm-backed functions (exp/log/pow) are rounded to 6
decimals since JVM StrictMath and C libm may differ in the last ulp.
Engine-specific hashes (xxhash64, crc32, Spark's murmur ``hash``) are
exercised via pytest invariants (test_scalars); the oracle-checked
salting/sharding path (q71b) runs on the portable md5-derived hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.compat import portable_hash64, sql_portable_hash64, ts_sec
from ..io import load_table
from ..registry import register


@register(
    "q65_string_funcs",
    oracle="""
SELECT c_custkey,
  lower(c_name) AS name_lower,
  upper(c_mktsegment) AS seg_upper,
  trim(concat('  ', c_name, '  ')) AS name_trimmed,
  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
  substring(c_name, 1, 8) AS name_prefix,
  concat_ws('|', c_mktsegment, c_name) AS seg_name,
  length(c_name) AS name_len,
  regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
  regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
  replace(c_name, 'Customer', 'Cust') AS name_replaced,
  reverse(c_mktsegment) AS seg_reversed,
  array_to_string(string_split(c_name, '#'), ',') AS name_parts,
  CAST(levenshtein(c_mktsegment, 'BUILDING') AS INT) AS lev_to_building
FROM customer
""",
    tags=("scalar",),
)
def q65_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family (#65)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias(
            "name_trimmed"
        ),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("seg_name"),
        F.length("c_name").alias("name_len"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.regexp_replace("c_name", "[0-9]", "#").alias("name_masked"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias(
            "name_replaced"
        ),
        F.reverse("c_mktsegment").alias("seg_reversed"),
        F.array_join(F.split("c_name", "#"), ",").alias("name_parts"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("lev_to_building"),
    )


@register(
    "q66_datetime_funcs",
    oracle="""
SELECT o_orderkey,
  CAST(year(o_orderdate) AS INT) AS yr,
  CAST(month(o_orderdate) AS INT) AS mo,
  CAST(day(o_orderdate) AS INT) AS dom,
  CAST(quarter(o_orderdate) AS INT) AS qtr,
  CAST(isodow(o_orderdate) AS INT) AS iso_dow,
  CAST(dayofyear(o_orderdate) AS INT) AS doy,
  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
  CAST(o_orderdate AS DATE) AS order_date,
  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
  CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS INT) AS days_to_y2k,
  last_day(CAST(o_orderdate AS DATE)) AS month_end,
  strftime(o_orderdate, '%Y-%m') AS ym
FROM orders
""",
    tags=("scalar",),
)
def q66_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family (#66), all NTZ-safe (no session-tz dependence).
    Day-of-week uses ISO numbering (Spark's dayofweek is Sunday=1,
    DuckDB's dow Sunday=0 — isodow is the portable one)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.quarter(d).alias("qtr"),
        (F.weekday(d) + 1).cast("int").alias("iso_dow"),
        F.dayofyear(d).alias("doy"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
        d.cast("date").alias("order_date"),
        F.date_add(d.cast("date"), 30).alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), d.cast("date")).alias(
            "days_to_y2k"
        ),
        F.last_day(d.cast("date")).alias("month_end"),
        F.date_format(d, "yyyy-MM").alias("ym"),
    )


@register(
    "q67_math_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
  round(l_extendedprice, 1) AS price_r1,
  floor(l_extendedprice) AS price_floor,
  ceil(l_extendedprice) AS price_ceil,
  abs(l_discount - 0.05) AS disc_dev,
  CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
  round(sqrt(l_extendedprice), 6) AS price_sqrt,
  round(pow(1.0 + l_discount, 2), 10) AS disc_sq,
  round(ln(l_extendedprice), 6) AS price_ln,
  round(log10(l_extendedprice), 6) AS price_log10,
  greatest(l_quantity, 25.0) AS qty_floor25,
  least(l_tax, l_discount) AS min_rate,
  CAST(l_quantity AS BIGINT) % 7 AS qty_mod7
FROM lineitem
""",
    tags=("scalar",),
)
def q67_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family (#67). floor/ceil return DOUBLE in DuckDB vs BIGINT in
    Spark — cast to double; libm-backed results rounded."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(p, 1).alias("price_r1"),
        F.floor(p).cast("double").alias("price_floor"),
        F.ceil(p).cast("double").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.round(F.sqrt(p), 6).alias("price_sqrt"),
        F.round(F.pow(F.lit(1.0) + F.col("l_discount"), 2), 10).alias("disc_sq"),
        F.round(F.log(p), 6).alias("price_ln"),
        F.round(F.log10(p), 6).alias("price_log10"),
        F.greatest("l_quantity", F.lit(25.0)).alias("qty_floor25"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
    )


@register(
    "q68_array_funcs",
    oracle="""
SELECT vec_id,
  len(embedding) AS dim,
  round(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
  round(CAST(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum')
        AS DOUBLE), 4) AS elem_sum,
  round(CAST(list_aggregate(list_transform(list_slice(embedding, 1, 8),
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS DOUBLE), 4) AS head_sq_norm,
  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive,
  round(CAST(list_sort(list_transform(embedding, x -> CAST(x AS DOUBLE)))[1] AS DOUBLE), 6)
    AS min_elem
FROM embeddings
""",
    tags=("scalar", "vector"),
)
def q68_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order functions (#68) over the embedding column —
    the JVM-side vector-math toolkit (transform/filter/aggregate/slice)
    that similarity search (#83) builds on. Element math is widened
    float→double on both sides before folding (left-to-right, same
    order ⇒ identical doubles), and sums rounded."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    as_double = F.transform(emb, lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.round(F.element_at(emb, 1).cast("double"), 6).alias("first_elem"),
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("elem_sum"),
        F.round(
            F.aggregate(
                F.transform(F.slice(emb, 1, 8), lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("head_sq_norm"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
        F.round(F.array_min(as_double), 6).alias("min_elem"),
    )


@register(
    "q68b_posexplode",
    oracle="""
SELECT vec_id, pos, round(raw, 6) AS elem FROM (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) AS INT) - 1 AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS raw
  FROM embeddings WHERE vec_id < 25)
WHERE raw > 0.2
""",
    tags=("scalar", "vector"),
)
def q68b_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (#68): array → (position, element) rows — the lateral
    flatten used to pivot vector columns into long form (bounded slice;
    at scale prefer staying in array form, exploding 64× multiplies the
    shuffle)."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 25)
    return (
        e.select("vec_id", F.posexplode("embedding").alias("pos", "raw"))
        .filter(F.col("raw").cast("double") > 0.2)
        .select(
            "vec_id", "pos", F.round(F.col("raw").cast("double"), 6).alias("elem")
        )
    )


@register(
    "q69_map_funcs",
    oracle="""
SELECT event_id,
  'k' AS prop_keys,
  CAST(CAST(props->>'$.k' AS INT) AS VARCHAR) AS prop_values,
  CAST(props->>'$.k' AS INT) AS k_value,
  CAST(props->>'$.k' AS INT) IS NOT NULL AS has_k
FROM events
""",
    tags=("scalar",),
)
def q69_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family (#69): events.props parsed into MAP<STRING,INT>, then
    map_keys/map_values/element_at/map_contains_key (DuckDB mirrors via
    JSON paths — its JSON→MAP story differs, values are what's checked).
    Key/value arrays surface as CSV strings — ARRAY cells crash the
    driver's pandas canonicalizer."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("prop_keys"),
        F.array_join(F.map_values(m).cast("array<string>"), ",").alias(
            "prop_values"
        ),
        F.element_at(m, "k").alias("k_value"),
        F.map_contains_key(m, "k").alias("has_k"),
    )


@register(
    "q70_json_funcs",
    oracle="""
SELECT event_id,
  CAST(props->>'$.k' AS INT) AS k_typed,
  props->>'$.k' AS k_string,
  json_valid(props) AS is_valid_json,
  to_json(struct_pack(event_type := event_type, k := CAST(props->>'$.k' AS INT)))
    AS packed
FROM events
""",
    tags=("scalar",),
)
def q70_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family (#70): schema'd from_json, path extraction
    (get_json_object), and to_json re-serialization of a struct."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "struct<k:int>")
    return ev.select(
        "event_id",
        parsed.getField("k").alias("k_typed"),
        F.get_json_object("props", "$.k").alias("k_string"),
        F.from_json("props", "map<string,string>").isNotNull().alias("is_valid_json"),
        F.to_json(
            F.struct(
                F.col("event_type").alias("event_type"),
                parsed.getField("k").alias("k"),
            )
        ).alias("packed"),
    )


@register(
    "q71_hash_funcs",
    oracle="""
SELECT doc_id,
  md5(text) AS text_md5,
  sha256(text) AS text_sha256,
  CAST(length(text) AS BIGINT) AS text_len
FROM documents
""",
    tags=("scalar", "hash"),
)
def q71_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine-stable hashes (#71): md5 / sha-256 hex — the exact-
    dedup keys of #81."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.length("text").cast("bigint").alias("text_len"),
    )


@register(
    "q71b_hash_salting",
    oracle=f"""
SELECT doc_id,
  {sql_portable_hash64("text")} AS text_h64,
  {sql_portable_hash64("text")} % 64 AS salt_bucket,
  {sql_portable_hash64("(CAST(doc_id AS VARCHAR) || ':' || lang)")} % 16
    AS shard_16,
  CASE WHEN {sql_portable_hash64("text")} % 100 < 5 THEN 1 ELSE 0 END
    AS in_5pct_sample
FROM documents
""",
    tags=("scalar", "hash"),
)
def q71b_hash_salting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int64-hash salting/sharding/sampling (#71) — the uses a cheap
    64-bit hash serves at 100 TB: skew-salt buckets for hot joins,
    deterministic shard assignment from a compound key, and a
    reproducible hash-gate sample that survives any repartitioning.

    Converted from rows-only to oracle-backed (VERDICT r03 ask #2) by
    running on :func:`portable_hash64` (md5-derived, value-equal in
    DuckDB) instead of xxhash64. The engine-specific fast hashes
    (xxhash64 / crc32 / murmur ``hash``) keep their pytest invariants
    in test_scalars — at scale they replace the md5 digest 1:1; every
    property checked here is hash-family-independent."""
    d = load_table(spark, sf_dir, "documents")
    h_text = portable_hash64("text")
    h_shard = portable_hash64(
        F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("lang"))
    )
    return d.select(
        "doc_id",
        h_text.alias("text_h64"),
        (h_text % 64).alias("salt_bucket"),
        (h_shard % 16).alias("shard_16"),
        F.when(h_text % 100 < 5, 1).otherwise(0).alias("in_5pct_sample"),
    )


@register(
    "q70b_variant_semistructured",
    oracle="""
SELECT event_type,
  CAST(SUM(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k,
  CAST(COUNT(CASE WHEN CAST(props->>'$.k' AS INT) > 50 THEN 1 END) AS BIGINT)
    AS n_big,
  CAST(COUNT(CASE WHEN props->>'$.missing' IS NULL THEN 1 END) AS BIGINT)
    AS n_missing
FROM events
GROUP BY event_type
""",
    tags=("scalar",),
)
def q70b_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics through Spark 4's VARIANT type (#70
    extension): ``parse_json`` keeps the document in Variant's binary
    form (no up-front schema, unlike ``from_json``), ``variant_get``
    extracts typed paths lazily — at scale this is the schema-on-read
    path for heterogeneous JSON where imposing one struct schema would
    drop or corrupt fields. Missing paths return NULL (``variant_get``
    in 'try' spirit), matching SQL JSON-path semantics in the oracle.
    The aggregate shapes are ordinary two-phase hash aggs."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "int")
    missing = F.variant_get(v, "$.missing", "string")
    return ev.groupBy("event_type").agg(
        F.sum(k).cast("bigint").alias("sum_k"),
        F.count(F.when(k > 50, 1)).alias("n_big"),
        F.count(F.when(missing.isNull(), 1)).alias("n_missing"),
    )


@register(
    "q166_python_datasource",
    oracle="""
WITH gen AS (
  SELECT i AS event_id,
    CAST('0x' || substring(md5('pyds:' || CAST(i AS VARCHAR)), 1, 4)
         AS BIGINT) % 500 AS user_id,
    list_value('click', 'error', 'purchase', 'signup', 'view')[
      (CAST('0x' || substring(md5('pyds:' || CAST(i AS VARCHAR)), 5, 2)
            AS BIGINT) % 5) + 1] AS event_type,
    CAST('0x' || substring(md5('pyds:' || CAST(i AS VARCHAR)), 7, 10)
         AS BIGINT) / 1099511627776.0 * 100.0 AS value
  FROM unnest(generate_series(0, 19999)) AS t(i)
)
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
  round(SUM(value), 4) AS total_value
FROM gen GROUP BY event_type
""",
    tags=("source", "pyds"),
)
def q166_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource read (#22 family, Spark-4 API): 20k
    synthetic events generated by `sources/pyds.py` across 8 parallel
    input partitions, aggregated by type. The oracle re-derives the
    exact same rows from the same md5 arithmetic in SQL — proving the
    source is a pure deterministic function of its options, i.e. the
    property a replayable source needs (restart ⇒ same data, no
    silent drift). The generator itself is the slow Python path by
    nature (that is what this API is for); everything downstream of
    the scan is ordinary JVM aggregation."""
    from ..sources.pyds import SyntheticEventsDataSource

    try:
        spark.dataSource.register(SyntheticEventsDataSource)
    except Exception:
        pass  # already registered in this session
    gen = (
        spark.read.format("synthetic_events")
        .option("n_rows", 20000)
        .option("n_partitions", 8)
        .option("seed", "pyds")
        .load()
    )
    return gen.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


@register(
    "q325_luhn_checksum_census",
    oracle="""
WITH acct AS (
  SELECT o_orderkey,
    lpad(CAST(o_orderkey * 9973 % 1000000000000000 AS VARCHAR), 15, '0')
      AS digits
  FROM orders
),
d AS (
  SELECT o_orderkey, digits,
    unnest(range(1, 16)) AS pos
  FROM acct
),
v AS (
  -- Luhn over 15 payload digits (check digit appended at position 16):
  -- counting from the RIGHT of the 16-digit number, even offsets
  -- double — with 15 payload digits that is positions 15, 13, ... (odd
  -- string positions from the left)
  SELECT o_orderkey,
    SUM(CASE WHEN pos % 2 = 1
         THEN CASE WHEN 2 * CAST(substr(digits, pos, 1) AS INT) > 9
                   THEN 2 * CAST(substr(digits, pos, 1) AS INT) - 9
                   ELSE 2 * CAST(substr(digits, pos, 1) AS INT) END
         ELSE CAST(substr(digits, pos, 1) AS INT) END) AS luhn_sum
  FROM d GROUP BY o_orderkey
)
SELECT CAST((10 - luhn_sum % 10) % 10 AS BIGINT) AS check_digit,
  CAST(COUNT(*) AS BIGINT) AS n_accounts
FROM v GROUP BY 1
""",
    tags=("scalar", "dq"),
)
def q325_luhn_checksum_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn (mod-10) CHECK-DIGIT computation — the identifier-
    validation kernel behind card/IMEI/account-number DQ rules,
    expressed as pure positional digit arithmetic (explode positions,
    double-and-subtract-nine on alternating offsets, fold mod 10): a
    census of computed check digits over deterministic synthetic
    15-digit account numbers derived from order keys. Exercises
    string↔digit manipulation at the expression layer — no UDF — and
    is bit-exact by construction.

    Scale shape: 15-way positional explode then two hash aggs; at
    100 TB the explode is map-local and the whole kernel fuses into
    one codegen stage."""
    acct = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.lpad(
            (F.col("o_orderkey") * 9973 % 1000000000000000).cast("string"),
            15,
            "0",
        ).alias("digits"),
    )
    d = acct.select(
        "o_orderkey",
        F.posexplode(F.split(F.col("digits"), "(?!^)(?=.)")).alias(
            "p0", "ch"
        ),
    ).select(
        "o_orderkey", (F.col("p0") + 1).alias("pos"), F.col("ch").cast("int").alias("dig")
    )
    doubled = F.when(
        F.col("pos") % 2 == 1,
        F.when(2 * F.col("dig") > 9, 2 * F.col("dig") - 9).otherwise(
            2 * F.col("dig")
        ),
    ).otherwise(F.col("dig"))
    v = d.groupBy("o_orderkey").agg(F.sum(doubled).alias("luhn_sum"))
    return (
        v.select(
            ((10 - F.col("luhn_sum") % 10) % 10)
            .cast("bigint")
            .alias("check_digit")
        )
        .groupBy("check_digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_accounts"))
    )
