"""Projection / filter / expression / scalar-function catalog entries.

Parity targets: the reference's own pinned expressions
(/root/reference/test/sql/table.test:31-49 — arithmetic, casts, string
concat, md5, date/timestamp arithmetic; timestamp.test:39-48 — filter
on timestamp) plus the full DuckDB scalar library the product ships
(SURVEY.md §2B "Projection / filter / expressions" and "Scalar function
families").

Dialect traps handled here (SURVEY.md §7):
- ``year()``/``month()`` return INT in Spark, BIGINT in DuckDB → cast.
- DATE outputs are cast to STRING (pandas date-vs-timestamp ambiguity).
- DuckDB ``SUM(int)`` is HUGEINT → oracle casts to BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, query, sql_query

# --- generate_series / typed projection matrix -------------------------
# Parity with /root/reference/test/sql/table.test:30-50 and
# sequence.test:11 (generate_series source + per-type expressions).

SERIES_ORACLE = """
SELECT
  seq,
  seq % 2 = 0                          AS bool_col,
  CAST((seq % 256) - 128 AS TINYINT)   AS tinyint_col,
  CAST((seq % 32768) - 16384 AS SMALLINT) AS smallint_col,
  CAST(seq AS INTEGER)                 AS int_col,
  CAST(seq * 10 AS BIGINT)             AS bigint_col,
  CAST(seq AS DOUBLE) / 100.0          AS float_as_double_col,
  CAST(seq AS DOUBLE) / 1000.0         AS double_col,
  CAST(CAST(seq AS DECIMAL(10,2)) / 10.0 AS VARCHAR) AS decimal_str_col,
  'Value ' || CAST(seq AS VARCHAR)     AS varchar_col,
  CAST(DATE '1992-03-22' + CAST(seq AS INTEGER) AS VARCHAR) AS date_str_col,
  md5(CAST(seq AS VARCHAR))            AS md5_col
FROM generate_series(1, 100) AS t(seq)
"""


@query("series_typed_projection_matrix", oracle=SERIES_ORACLE, tags=("projection", "cast", "series"))
def series_typed_projection_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """generate_series scan + the reference's type-matrix expressions
    (table.test:31-49): arithmetic, %, casts, string concat, date math,
    md5. spark.range is a parallel, partitioned source (no driver loop).
    """
    seq = F.col("seq")
    return (
        spark.range(1, 101)
        .select(F.col("id").alias("seq"))
        .select(
            seq,
            ((seq % 2) == 0).alias("bool_col"),
            ((seq % 256) - 128).cast("tinyint").alias("tinyint_col"),
            ((seq % 32768) - 16384).cast("smallint").alias("smallint_col"),
            seq.cast("int").alias("int_col"),
            (seq * 10).cast("bigint").alias("bigint_col"),
            (seq.cast("double") / 100.0).alias("float_as_double_col"),
            (seq.cast("double") / 1000.0).alias("double_col"),
            (seq.cast("decimal(10,2)") / 10.0).cast("string").alias("decimal_str_col"),
            F.concat(F.lit("Value "), seq.cast("string")).alias("varchar_col"),
            F.date_add(F.lit("1992-03-22").cast("date"), seq.cast("int"))
            .cast("string")
            .alias("date_str_col"),
            F.md5(seq.cast("string")).alias("md5_col"),
        )
    )


TS_ARITH_ORACLE = """
SELECT
  seq,
  CAST(TIMESTAMP '2025-01-01 00:00:00' + INTERVAL (seq) SECOND AS VARCHAR) AS ts_plus_sec,
  CAST(TIMESTAMP '2025-01-01 00:00:00' + INTERVAL (seq) MINUTE AS VARCHAR) AS ts_plus_min,
  CAST(DATE '1992-03-22' + CAST(seq AS INTEGER) AS VARCHAR) AS date_plus_days
FROM generate_series(1, 50) AS t(seq)
"""


@query("timestamp_arithmetic", oracle=TS_ARITH_ORACLE, tags=("datetime", "series"))
def timestamp_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp/date arithmetic parity (table.test:44-48 ``to_days``/
    ``to_seconds`` patterns) via make_interval — JVM-side, codegen'd."""
    seq = F.col("seq")
    base = F.lit("2025-01-01 00:00:00").cast("timestamp")
    return (
        spark.range(1, 51)
        .select(F.col("id").alias("seq"))
        .select(
            seq,
            (base + F.make_interval(secs=seq.cast("double"))).cast("string").alias("ts_plus_sec"),
            (base + F.make_interval(mins=seq.cast("int"))).cast("string").alias("ts_plus_min"),
            F.date_add(F.lit("1992-03-22").cast("date"), seq.cast("int"))
            .cast("string")
            .alias("date_plus_days"),
        )
    )


FILTER_TS_ORACLE = """
SELECT event_id, user_id, event_type, CAST(ts AS VARCHAR) AS ts_str
FROM events
WHERE ts > TIMESTAMP '2024-01-15 00:00:00' AND event_type = 'purchase'
"""


@query("filter_timestamp_predicate", oracle=FILTER_TS_ORACLE, tags=("filter", "datetime"))
def filter_timestamp_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE on a timestamp column (timestamp.test:39-48 parity).
    Both predicates push down to the parquet scan (PushedFilters)."""
    ev = load(spark, sf_dir, "events")
    return ev.filter(
        (F.col("ts") > F.lit("2024-01-15 00:00:00").cast("timestamp"))
        & (F.col("event_type") == "purchase")
    ).select("event_id", "user_id", "event_type", F.col("ts").cast("string").alias("ts_str"))


CASE_ORACLE = """
SELECT
  o_orderkey,
  CASE
    WHEN o_totalprice > 200000 THEN 'high'
    WHEN o_totalprice > 100000 THEN 'mid'
    ELSE 'low'
  END AS price_band,
  CASE o_orderstatus WHEN 'F' THEN 'final' WHEN 'O' THEN 'open' ELSE 'other' END AS status_name
FROM orders
"""


@query("expr_case_when", oracle=CASE_ORACLE, tags=("expression",))
def expr_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Searched + simple CASE (DuckDB core scalar surface)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.when(F.col("o_orderstatus") == "F", "final")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_name"),
    )


IN_BETWEEN_ORACLE = """
SELECT p_partkey, p_name, p_size, p_brand
FROM part
WHERE p_size BETWEEN 10 AND 20
  AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
"""


@query("expr_in_between", oracle=IN_BETWEEN_ORACLE, tags=("filter", "expression"))
def expr_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + BETWEEN predicates (both push down)."""
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_size").between(10, 20)
        & F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    ).select("p_partkey", "p_name", "p_size", "p_brand")


NULL_ORACLE = """
SELECT
  seq,
  CASE WHEN seq % 3 = 0 THEN NULL ELSE seq END AS nullable_val,
  COALESCE(CASE WHEN seq % 3 = 0 THEN NULL ELSE seq END, -1) AS coalesced,
  CASE WHEN seq % 3 = 0 THEN NULL ELSE seq END IS NULL AS is_null_flag,
  NULLIF(seq % 5, 0) AS nullif_col
FROM generate_series(1, 100) AS t(seq)
"""


@query("expr_null_handling", oracle=NULL_ORACLE, tags=("expression", "nulls"))
def expr_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL literals in typed columns, COALESCE, IS NULL, NULLIF
    (nulls.test:14-23 parity — NULL-typed columns round-trip)."""
    seq = F.col("seq")
    nullable = F.when(seq % 3 == 0, F.lit(None).cast("bigint")).otherwise(seq)
    return (
        spark.range(1, 101)
        .select(F.col("id").alias("seq"))
        .select(
            seq,
            nullable.alias("nullable_val"),
            F.coalesce(nullable, F.lit(-1)).alias("coalesced"),
            nullable.isNull().alias("is_null_flag"),
            F.nullif(seq % 5, F.lit(0)).alias("nullif_col"),
        )
    )


LIKE_ORACLE = """
SELECT p_partkey, p_name, p_type,
       p_type LIKE 'PROMO%' AS is_promo,
       regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
FROM part
WHERE p_name LIKE '%re%'
"""


@query("expr_like_regexp", oracle=LIKE_ORACLE, tags=("string", "filter"))
def expr_like_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE + regexp_extract/regexp_replace (patterns kept in the
    Java-regex ∩ RE2 common subset so both engines agree)."""
    p = load(spark, sf_dir, "part")
    return p.filter(F.col("p_name").like("%re%")).select(
        "p_partkey",
        "p_name",
        "p_type",
        F.col("p_type").like("PROMO%").alias("is_promo"),
        F.regexp_extract(F.col("p_name"), "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace(F.col("p_name"), "[aeiou]", "_").alias("devoweled"),
    )


STRING_FN_ORACLE = """
SELECT
  c_custkey,
  upper(c_name)                        AS upper_name,
  lower(c_mktsegment)                  AS lower_seg,
  substr(c_name, 1, 8)                 AS name_prefix,
  length(c_name)                       AS name_len,
  trim('  ' || c_name || '  ')         AS trimmed,
  replace(c_name, '#', '-')            AS replaced,
  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
  reverse(c_mktsegment)                AS rev_seg,
  concat_ws('|', c_name, c_mktsegment) AS joined,
  starts_with(c_name, 'Customer')      AS has_prefix,
  contains(c_name, '1')                AS has_one
FROM customer
"""


@query("string_functions", oracle=STRING_FN_ORACLE, tags=("string",))
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar family (SURVEY.md §2B string fns)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("upper_name"),
        F.lower("c_mktsegment").alias("lower_seg"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("replaced"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.reverse(F.col("c_mktsegment")).alias("rev_seg"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("joined"),
        F.startswith(F.col("c_name"), F.lit("Customer")).alias("has_prefix"),
        F.contains(F.col("c_name"), F.lit("1")).alias("has_one"),
    )


DATE_FN_ORACLE = """
SELECT
  o_orderkey,
  CAST(year(o_orderdate) AS BIGINT)    AS order_year,
  CAST(month(o_orderdate) AS BIGINT)   AS order_month,
  CAST(day(o_orderdate) AS BIGINT)     AS order_day,
  CAST(CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS VARCHAR) AS month_start,
  CAST(CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS VARCHAR) AS quarter_start,
  strftime(o_orderdate, '%Y-%m-%d')    AS formatted,
  CAST(epoch(o_orderdate) AS BIGINT)   AS epoch_sec
FROM orders
WHERE o_orderkey % 10 = 0
"""


@query("date_functions", oracle=DATE_FN_ORACLE, tags=("datetime",))
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract/date_part, date_trunc, strftime, epoch family."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("order_day"),
        F.date_trunc("month", F.col("o_orderdate")).cast("string").alias("month_start"),
        F.date_trunc("quarter", F.col("o_orderdate")).cast("string").alias("quarter_start"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("formatted"),
        F.unix_timestamp(F.col("o_orderdate")).alias("epoch_sec"),
    )


MATH_FN_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  abs(l_quantity - 25)                 AS abs_dev,
  CAST(round(CAST(l_extendedprice / 1000 AS DECIMAL(30,6)), 2) AS DOUBLE) AS price_k,
  CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
  CAST(floor(l_tax * 100) AS BIGINT)     AS tax_pct_floor,
  sqrt(l_quantity)                     AS qty_sqrt,
  round(ln(l_extendedprice), 6)        AS price_ln,
  round(exp(l_discount), 6)            AS disc_exp,
  pow(l_quantity, 2)                   AS qty_sq,
  CAST(sign(l_quantity - 25) AS BIGINT)  AS dev_sign,
  CAST(l_quantity AS BIGINT) % 7       AS qty_mod,
  greatest(l_discount, l_tax)          AS max_rate,
  least(l_discount, l_tax)             AS min_rate
FROM lineitem
WHERE l_orderkey % 20 = 0
"""


@query("math_functions", oracle=MATH_FN_ORACLE, tags=("math",))
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar family. All per-row IEEE double ops — bit-identical
    across engines (no aggregation order involved)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 20 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25).alias("abs_dev"),
        # decimal(30,6) intermediate: exact at the .005 half-way points
        # where double division diverges between engines
        F.round((F.col("l_extendedprice") / 1000).cast("decimal(30,6)"), 2)
        .cast("double")
        .alias("price_k"),
        F.ceil(F.col("l_discount") * 100).cast("bigint").alias("disc_pct_ceil"),
        F.floor(F.col("l_tax") * 100).cast("bigint").alias("tax_pct_floor"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.signum(F.col("l_quantity") - 25).cast("bigint").alias("dev_sign"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


HASH_ORACLE = """
SELECT
  doc_id,
  md5(text)          AS md5_hex,
  sha256(text)       AS sha256_hex
FROM documents
"""


@query("hash_functions", oracle=HASH_ORACLE, tags=("hash",))
def hash_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing family (md5 pinned by table.test:49; sha256 in DuckDB core)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2("text", 256).alias("sha256_hex"),
    )


JSON_ORACLE = """
SELECT
  event_id,
  json_extract_string(props, '$.k') AS k_str,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
FROM events
WHERE event_id % 5 = 0
"""


@query("json_functions", oracle=JSON_ORACLE, tags=("json",))
def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (DuckDB json extension surface → Spark
    get_json_object; both JVM-side)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 5 == 0)
    k = F.get_json_object(F.col("props"), "$.k")
    return ev.select("event_id", k.alias("k_str"), k.cast("bigint").alias("k_num"))


LIST_ORACLE = """
SELECT
  doc_id,
  len(string_split(text, ' ')) AS n_tokens,
  string_split(text, ' ')[1]   AS first_token,
  array_to_string(list_slice(string_split(text, ' '), 1, 3), '-') AS first3
FROM documents
WHERE doc_id % 7 = 0
"""


@query("list_functions", oracle=LIST_ORACLE, tags=("array",))
def list_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List/array family: split, length, index, slice, join
    (DuckDB list fns ↔ Spark array fns; 1-based indexing both)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_join(F.slice(toks, 1, 3), "-").alias("first3"),
    )


CAST_ORACLE = """
SELECT
  seq,
  CAST(CAST(seq AS VARCHAR) AS BIGINT)        AS str_roundtrip,
  CAST(seq AS DOUBLE)                          AS to_double,
  CAST(CAST(seq AS DOUBLE) AS BIGINT)          AS double_to_int,
  CAST(seq AS DECIMAL(12,3))::VARCHAR          AS decimal_str,
  CAST(seq % 2 AS BOOLEAN)                     AS to_bool,
  CAST(CAST(seq % 2 AS BOOLEAN) AS INTEGER)    AS bool_to_int,
  CAST('2024-03-0' || CAST((seq % 9) + 1 AS VARCHAR) AS DATE)::VARCHAR AS str_to_date
FROM generate_series(1, 60) AS t(seq)
"""


@query("cast_matrix", oracle=CAST_ORACLE, tags=("cast",))
def cast_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST across numeric/string/bool/date (table.test:34-42,49 parity)."""
    seq = F.col("seq")
    return (
        spark.range(1, 61)
        .select(F.col("id").alias("seq"))
        .select(
            seq,
            seq.cast("string").cast("bigint").alias("str_roundtrip"),
            seq.cast("double").alias("to_double"),
            seq.cast("double").cast("bigint").alias("double_to_int"),
            seq.cast("decimal(12,3)").cast("string").alias("decimal_str"),
            (seq % 2).cast("boolean").alias("to_bool"),
            (seq % 2).cast("boolean").cast("int").alias("bool_to_int"),
            F.concat(F.lit("2024-03-0"), ((seq % 9) + 1).cast("string"))
            .cast("date")
            .cast("string")
            .alias("str_to_date"),
        )
    )


# SQL-form entry: DISTINCT projection (common dialect subset → one text).
sql_query(
    "distinct_projection",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    tags=("distinct",),
)


STRING_EXT_ORACLE = """
SELECT
  p_partkey,
  split_part(p_type, ' ', 2) AS type_word2,
  translate(p_brand, 'B#', 'b-') AS brand_translated,
  repeat(p_brand, 2) AS brand_twice,
  left(p_name, 6) AS name_left,
  right(p_name, 4) AS name_right,
  CAST(strpos(p_name, 'a') AS BIGINT) AS first_a_pos,
  CAST(ascii(p_type) AS BIGINT) AS type_first_char,
  chr(65 + CAST(p_partkey % 26 AS INTEGER)) AS letter_code,
  printf('%s-%03d', p_brand, CAST(p_size AS INTEGER)) AS brand_size_fmt
FROM part
"""


@query("string_functions_extended", oracle=STRING_EXT_ORACLE, tags=("string",))
def string_functions_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string-family tranche: split_part / translate / repeat /
    left / right / strpos / ascii / chr / printf-style formatting
    (SURVEY.md §2B string fns; DuckDB core surface [public])."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(2)).alias("type_word2"),
        F.translate(F.col("p_brand"), "B#", "b-").alias("brand_translated"),
        F.expr("repeat(p_brand, 2)").alias("brand_twice"),
        F.expr("left(p_name, 6)").alias("name_left"),
        F.expr("right(p_name, 4)").alias("name_right"),
        F.instr(F.col("p_name"), "a").cast("bigint").alias("first_a_pos"),
        F.ascii(F.col("p_type")).cast("bigint").alias("type_first_char"),
        F.chr(F.lit(65) + (F.col("p_partkey") % 26).cast("int")).alias("letter_code"),
        F.format_string("%s-%03d", F.col("p_brand"), F.col("p_size").cast("int")).alias(
            "brand_size_fmt"
        ),
    )


DATE_EXT_ORACLE = """
SELECT
  o_orderkey,
  CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)::VARCHAR AS plus_3_months,
  CAST(make_date(CAST(year(o_orderdate) AS INTEGER), CAST(month(o_orderdate) AS INTEGER), 1)
       AS VARCHAR) AS month_first,
  CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
  CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
  CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_epoch_95
FROM orders
WHERE o_orderkey % 10 = 0
"""


@query("date_functions_extended", oracle=DATE_EXT_ORACLE, tags=("datetime",))
def date_functions_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second date-family tranche: last_day / add_months / make_date /
    dayofyear / ISO week / quarter / ISO day-of-week / datediff.
    Day-of-week dialects differ (Spark dayofweek is 1=Sunday; DuckDB
    dayofweek is 0=Sunday) — the entry pins ISO numbering on both
    (Spark weekday()+1, DuckDB isodow)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.last_day(d).cast("string").alias("month_end"),
        F.add_months(d, 3).cast("string").alias("plus_3_months"),
        F.make_date(F.year(d), F.month(d), F.lit(1)).cast("string").alias("month_first"),
        F.dayofyear(d).cast("bigint").alias("doy"),
        F.weekofyear(d).cast("bigint").alias("iso_week"),
        F.quarter(d).cast("bigint").alias("qtr"),
        (F.weekday(d) + 1).cast("bigint").alias("iso_dow"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("bigint").alias(
            "days_since_epoch_95"
        ),
    )


DISTINCT_ON_ORACLE = """
SELECT DISTINCT ON (o_custkey)
  o_custkey, o_orderkey, o_orderdate
FROM orders
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


@query("distinct_on_per_key_first", oracle=DISTINCT_ON_ORACLE, tags=("window", "dedup"))
def distinct_on_per_key_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB's DISTINCT ON (first row per key under an ORDER BY) as
    the canonical Spark window pattern: row_number()==1 over a fully
    deterministic order. This is also exact-dedup's "keep canonical"
    step — one shuffle on the key, top-1 computed partially within
    partitions (no global sort)."""
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


TRY_CAST_ORACLE = """
WITH s AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN 'x' || CAST(o_orderkey AS VARCHAR)
              ELSE CAST(o_orderkey AS VARCHAR) || '.5' END AS numstr,
         CASE WHEN o_orderkey % 4 = 0 THEN '1995-13-99' ELSE '1995-07-16' END AS datestr
  FROM orders
)
SELECT
  o_orderkey,
  TRY_CAST(numstr AS DOUBLE) AS as_double,
  TRY_CAST(CASE WHEN o_orderkey % 3 = 0 THEN numstr
                ELSE CAST(o_orderkey AS VARCHAR) END AS BIGINT) AS as_bigint,
  CAST(TRY_CAST(datestr AS DATE) AS VARCHAR) AS as_date_str
FROM s
"""


@query("cast_try_safe", oracle=TRY_CAST_ORACLE, tags=("cast",))
def cast_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_CAST parity: malformed numerics/dates coerce to NULL instead
    of failing the job — the ingestion-hardening cast for dirty data
    (both engines use ANSI semantics under try_cast, so '123.5' → NULL
    as BIGINT on both)."""
    o = load(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    numstr = F.when(key % 3 == 0, F.concat(F.lit("x"), key.cast("string"))).otherwise(
        F.concat(key.cast("string"), F.lit(".5"))
    )
    datestr = F.when(key % 4 == 0, F.lit("1995-13-99")).otherwise(F.lit("1995-07-16"))
    return o.select(
        "o_orderkey",
        numstr.try_cast("double").alias("as_double"),
        F.when(key % 3 == 0, numstr).otherwise(key.cast("string"))
        .try_cast("bigint")
        .alias("as_bigint"),
        datestr.try_cast("date").cast("string").alias("as_date_str"),
    )


BITWISE_ORACLE = """
SELECT
  l_orderkey,
  l_partkey,
  CAST(l_orderkey & l_partkey AS BIGINT) AS b_and,
  CAST(l_orderkey | l_partkey AS BIGINT) AS b_or,
  CAST(xor(l_orderkey, l_partkey) AS BIGINT) AS b_xor,
  CAST(l_partkey << 2 AS BIGINT) AS b_shl,
  CAST(l_orderkey >> 3 AS BIGINT) AS b_shr,
  CAST(~l_orderkey AS BIGINT) AS b_not
FROM lineitem
WHERE l_linenumber = 1
"""


@query("bitwise_scalar_ops", oracle=BITWISE_ORACLE, tags=("math",))
def bitwise_scalar_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar family: & | xor << >> ~ (two's-complement BIGINT
    semantics on both engines)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    a, b = F.col("l_orderkey"), F.col("l_partkey")
    return li.select(
        "l_orderkey",
        "l_partkey",
        a.bitwiseAND(b).cast("bigint").alias("b_and"),
        a.bitwiseOR(b).cast("bigint").alias("b_or"),
        a.bitwiseXOR(b).cast("bigint").alias("b_xor"),
        F.shiftleft(b, 2).cast("bigint").alias("b_shl"),
        F.shiftright(a, 3).cast("bigint").alias("b_shr"),
        F.bitwise_not(a).cast("bigint").alias("b_not"),
    )


SERIES_TS_ORACLE = """
SELECT CAST(unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                   TIMESTAMP '2024-01-03 00:00:00',
                                   INTERVAL 6 HOUR)) AS VARCHAR) AS ts_str
"""


@query("series_timestamp_range", oracle=SERIES_TS_ORACLE, tags=("generator", "datetime"))
def series_timestamp_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp-typed series generator (inclusive bounds, interval
    step) — DuckDB generate_series over timestamps ≡ Spark F.sequence
    with an interval step, exploded."""
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit("2024-01-01 00:00:00").cast("timestamp"),
                    F.lit("2024-01-03 00:00:00").cast("timestamp"),
                    F.expr("INTERVAL 6 HOURS"),
                )
            ).alias("ts")
        )
        .select(F.col("ts").cast("string").alias("ts_str"))
    )
