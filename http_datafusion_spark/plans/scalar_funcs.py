"""Scalar-function corpus — SURVEY.md §2.8.

One query per function family (string, regex, math, date/time,
conditional/null, hash, array, JSON), each exercising many functions
in one projection. The reference reaches all of these through
DataFusion's function crates via arbitrary SQL (SURVEY §2.8); Spark
has native equivalents for every family.

Dialect bridges encoded in the oracles:
- DuckDB ``dayofweek`` is 0=Sunday, Spark is 1=Sunday (+1 in oracle);
- DuckDB ``regexp_replace`` is first-match unless the 'g' flag is
  passed, Spark is always global;
- DuckDB ``sign`` returns INT, Spark DOUBLE (cast);
- DuckDB lacks ``initcap`` (exercised in unit tests instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from http_datafusion_spark.plans.registry import query
from http_datafusion_spark.plans.tables import load_tables


@query(
    "q_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                                   AS name_upper,
           lower(p_brand)                                  AS brand_lower,
           CAST(length(p_name) AS BIGINT)                  AS name_len,
           substr(p_name, 1, 5)                            AS name_head,
           concat_ws('|', p_brand, p_type)                 AS brand_type,
           lpad(CAST(p_size AS VARCHAR), 4, '0')           AS size_padded,
           rpad(p_brand, 12, '.')                          AS brand_padded,
           trim(concat(' ', p_type, ' '))                  AS type_trimmed,
           replace(p_type, ' ', '_')                       AS type_snake,
           translate(p_brand, '#', '-')                    AS brand_dashed,
           reverse(p_brand)                                AS brand_rev,
           left(p_type, 3)                                 AS type_l3,
           right(p_type, 3)                                AS type_r3,
           CAST(strpos(p_name, 'a') AS BIGINT)             AS first_a,
           repeat(p_brand, 2)                              AS brand_twice,
           CAST(ascii(p_brand) AS BIGINT)                  AS brand_ascii,
           chr(CAST(65 + (p_partkey % 26) AS INTEGER))     AS letter,
           split_part(p_type, ' ', 1)                      AS type_word1,
           CAST(levenshtein(p_brand, 'Brand#11') AS BIGINT) AS brand_dist,
           starts_with(p_type, 'STANDARD')                 AS is_standard,
           ends_with(p_name, 'e')                          AS ends_e
    FROM part
    WHERE p_partkey <= 120
    """,
    doc="string family: case/len/substr/concat/pad/trim/replace/translate/reverse/strpos/repeat/ascii/chr/split_part/levenshtein/starts/ends (SURVEY §2.8)",
    tags=("scalar",),
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir, "part")["part"]
    return p.filter(F.col("p_partkey") <= 120).select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.rpad("p_brand", 12, ".").alias("brand_padded"),
        F.trim(F.concat(F.lit(" "), F.col("p_type"), F.lit(" "))).alias("type_trimmed"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.translate("p_brand", "#", "-").alias("brand_dashed"),
        F.reverse("p_brand").alias("brand_rev"),
        F.substring("p_type", 1, 3).alias("type_l3"),
        F.substring(F.col("p_type"), -3, 3).alias("type_r3"),
        F.instr("p_name", "a").cast("bigint").alias("first_a"),
        F.repeat("p_brand", 2).alias("brand_twice"),
        F.ascii("p_brand").cast("bigint").alias("brand_ascii"),
        F.chr(F.lit(65) + (F.col("p_partkey") % 26)).alias("letter"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_word1"),
        F.levenshtein("p_brand", F.lit("Brand#11")).cast("bigint").alias("brand_dist"),
        F.startswith(F.col("p_type"), F.lit("STANDARD")).alias("is_standard"),
        F.endswith(F.col("p_name"), F.lit("e")).alias("ends_e"),
    )


@query(
    "q_regex_funcs",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)', 1)                      AS first_word,
           regexp_replace(p_name, '[aeiou]', '*', 'g')                AS devoweled,
           regexp_matches(p_type, '^STANDARD')                        AS std_match,
           CAST(len(regexp_extract_all(p_name, 'a')) AS BIGINT)       AS n_a
    FROM part
    WHERE p_partkey <= 120
    """,
    doc="regex family: extract/replace(global)/match/count (SURVEY §2.8)",
    tags=("scalar",),
)
def q_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir, "part")["part"]
    return p.filter(F.col("p_partkey") <= 120).select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        F.col("p_type").rlike("^STANDARD").alias("std_match"),
        F.regexp_count(F.col("p_name"), F.lit("a")).cast("bigint").alias("n_a"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT p_partkey,
           round(abs(p_retailprice - 1000), 4)         AS abs_delta,
           CAST(ceil(p_retailprice) AS BIGINT)         AS price_ceil,
           CAST(floor(p_retailprice) AS BIGINT)        AS price_floor,
           round(p_retailprice, 1)                     AS price_r1,
           round(sqrt(p_retailprice), 6)               AS price_sqrt,
           round(cbrt(p_retailprice), 6)               AS price_cbrt,
           round(pow(p_size, 2), 2)                    AS size_sq,
           round(exp(p_size / 100.0), 6)               AS size_exp,
           round(ln(p_retailprice), 6)                 AS price_ln,
           round(log10(p_retailprice), 6)              AS price_log10,
           round(log2(p_retailprice), 6)               AS price_log2,
           round(CAST(sign(p_retailprice - 1000) AS DOUBLE), 1) AS price_sign,
           CAST(p_size % 7 AS BIGINT)                  AS size_mod,
           round(sin(p_size), 6)                       AS size_sin,
           round(cos(p_size), 6)                       AS size_cos,
           round(atan2(p_size, 10), 6)                 AS size_atan2,
           CAST(factorial(p_size % 8) AS BIGINT)       AS size_fact,
           round(greatest(p_retailprice, 1000.0), 2)   AS price_hi,
           round(least(p_retailprice, 1000.0), 2)      AS price_lo
    FROM part
    WHERE p_partkey <= 120
    """,
    doc="math family: abs/ceil/floor/round/sqrt/cbrt/pow/exp/ln/log10/log2/sign/mod/trig/factorial/greatest/least (SURVEY §2.8)",
    tags=("scalar",),
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir, "part")["part"]
    return p.filter(F.col("p_partkey") <= 120).select(
        "p_partkey",
        F.round(F.abs(F.col("p_retailprice") - 1000), 4).alias("abs_delta"),
        F.ceil("p_retailprice").cast("bigint").alias("price_ceil"),
        F.floor("p_retailprice").cast("bigint").alias("price_floor"),
        F.round("p_retailprice", 1).alias("price_r1"),
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        F.round(F.cbrt("p_retailprice"), 6).alias("price_cbrt"),
        F.round(F.pow("p_size", F.lit(2)), 2).alias("size_sq"),
        F.round(F.exp(F.col("p_size") / 100.0), 6).alias("size_exp"),
        F.round(F.log("p_retailprice"), 6).alias("price_ln"),
        F.round(F.log10("p_retailprice"), 6).alias("price_log10"),
        F.round(F.log2("p_retailprice"), 6).alias("price_log2"),
        F.round(F.signum(F.col("p_retailprice") - 1000).cast("double"), 1).alias("price_sign"),
        (F.col("p_size") % 7).cast("bigint").alias("size_mod"),
        F.round(F.sin("p_size"), 6).alias("size_sin"),
        F.round(F.cos("p_size"), 6).alias("size_cos"),
        F.round(F.atan2(F.col("p_size").cast("double"), F.lit(10.0)), 6).alias("size_atan2"),
        F.factorial(F.col("p_size") % 8).cast("bigint").alias("size_fact"),
        F.round(F.greatest("p_retailprice", F.lit(1000.0)), 2).alias("price_hi"),
        F.round(F.least("p_retailprice", F.lit(1000.0)), 2).alias("price_lo"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT)              AS yr,
           CAST(month(o_orderdate) AS BIGINT)             AS mo,
           CAST(day(o_orderdate) AS BIGINT)               AS dy,
           CAST(quarter(o_orderdate) AS BIGINT)           AS qtr,
           CAST(dayofweek(o_orderdate) + 1 AS BIGINT)     AS dow,
           CAST(dayofyear(o_orderdate) AS BIGINT)         AS doy,
           CAST(weekofyear(o_orderdate) AS BIGINT)        AS wk,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')  AS month_start,
           strftime(date_trunc('week',  o_orderdate), '%Y-%m-%d')  AS week_start,
           strftime(last_day(o_orderdate), '%Y-%m-%d')             AS month_end,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')     AS plus_30d,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_95,
           CAST(epoch(o_orderdate) AS BIGINT)             AS epoch_sec,
           strftime(make_date(CAST(year(o_orderdate) AS INT), 1, 1), '%Y-%m-%d') AS year_start,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')     AS iso_str
    FROM orders
    WHERE o_orderkey % 37 = 0
    """,
    doc="date/time family: parts, trunc, last_day, interval arithmetic, diff, epoch, make_date, format (SURVEY §2.8)",
    tags=("scalar",),
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    d = F.col("o_orderdate")
    return o.filter(F.col("o_orderkey") % 37 == 0).select(
        "o_orderkey",
        F.year(d).cast("bigint").alias("yr"),
        F.month(d).cast("bigint").alias("mo"),
        F.dayofmonth(d).cast("bigint").alias("dy"),
        F.quarter(d).cast("bigint").alias("qtr"),
        F.dayofweek(d).cast("bigint").alias("dow"),
        F.dayofyear(d).cast("bigint").alias("doy"),
        F.weekofyear(d).cast("bigint").alias("wk"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_trunc("week", d), "yyyy-MM-dd").alias("week_start"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias("plus_30d"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).cast("bigint").alias("days_since_95"),
        F.unix_timestamp(d).alias("epoch_sec"),
        F.date_format(F.make_date(F.year(d), F.lit(1), F.lit(1)), "yyyy-MM-dd").alias("year_start"),
        F.date_format(d, "yyyy-MM-dd HH:mm:ss").alias("iso_str"),
    )


@query(
    "q_conditional_funcs",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END                                         AS price_band,
           coalesce(nullif(o_orderstatus, 'O'), 'open')                AS status_label,
           CASE WHEN o_orderstatus = 'F' THEN NULL ELSE o_orderpriority END AS prio_or_null,
           coalesce(CASE WHEN o_orderstatus = 'F' THEN NULL
                         ELSE o_orderpriority END, '0-NONE')           AS prio_filled,
           CASE WHEN o_orderstatus = 'P' THEN NULL
                ELSE round(o_totalprice, 2) END                        AS price_or_null,
           round(CASE WHEN o_orderstatus = 'P' THEN NULL
                      ELSE o_totalprice END, 2) IS NULL                AS is_partial,
           round(greatest(o_totalprice, 150000.0), 2)                  AS floor_150k,
           round(least(o_totalprice, 150000.0), 2)                     AS cap_150k
    FROM orders
    WHERE o_orderkey % 29 = 0
    """,
    doc="CASE/coalesce/nullif/IS NULL/greatest/least (SURVEY §2.8 conditional family)",
    tags=("scalar",),
)
def q_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    prio_or_null = F.when(F.col("o_orderstatus") == "F", F.lit(None)).otherwise(F.col("o_orderpriority"))
    price_or_null = F.when(F.col("o_orderstatus") == "P", F.lit(None)).otherwise(F.col("o_totalprice"))
    return o.filter(F.col("o_orderkey") % 29 == 0).select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias("status_label"),
        prio_or_null.alias("prio_or_null"),
        F.coalesce(prio_or_null, F.lit("0-NONE")).alias("prio_filled"),
        F.round(price_or_null, 2).alias("price_or_null"),
        F.round(price_or_null, 2).isNull().alias("is_partial"),
        F.round(F.greatest("o_totalprice", F.lit(150000.0)), 2).alias("floor_150k"),
        F.round(F.least("o_totalprice", F.lit(150000.0)), 2).alias("cap_150k"),
    )


@query(
    "q_hash_funcs",
    oracle="""
    SELECT c_custkey,
           md5(c_name)          AS name_md5,
           sha256(c_name)       AS name_sha256
    FROM customer
    WHERE c_custkey % 13 = 0
    """,
    doc="hash/crypto family: md5, sha256 (SURVEY §2.8)",
    tags=("scalar",),
)
def q_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir, "customer")["customer"]
    return c.filter(F.col("c_custkey") % 13 == 0).select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT)                         AS n_words,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)         AS n_distinct_words,
           list_contains(string_split(text, ' '), 'spark')                     AS has_spark,
           array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ')     AS first3,
           array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',') AS vocab_csv,
           CAST(nullif(coalesce(list_position(string_split(text, ' '), 'data'), 0), 0) AS BIGINT) AS data_pos
    FROM documents
    WHERE doc_id % 11 = 0
    """,
    doc="array family: split/size/distinct/contains/slice/sort/join/position (SURVEY §2.8 nested crate)",
    tags=("scalar", "array"),
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    words = F.split(F.col("text"), " ")
    return d.filter(F.col("doc_id") % 11 == 0).select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_words"),
        F.size(F.array_distinct(words)).cast("bigint").alias("n_distinct_words"),
        F.array_contains(words, "spark").alias("has_spark"),
        F.array_join(F.slice(words, 1, 3), " ").alias("first3"),
        F.array_join(F.array_sort(F.array_distinct(words)), ",").alias("vocab_csv"),
        # Spark array_position: 1-based, 0 when absent; DuckDB list_position
        # returns NULL when absent -> normalize absent to NULL on both sides.
        F.nullif(F.array_position(words, "data"), F.lit(0)).cast("bigint").alias("data_pos"),
    )


@query(
    "q_explode_unnest",
    oracle="""
    SELECT word, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 20
    """,
    doc="explode/unnest lateral expansion + re-aggregation (SURVEY §2.8 unnest row)",
    tags=("scalar", "array", "bench"),
)
def q_explode_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(20)
    )


@query(
    "q_json_funcs",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
    doc="JSON-in-string extraction + aggregation over events.props (SURVEY §2.8 JSON note — Spark superset)",
    tags=("scalar", "json"),
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.max(k).cast("bigint").alias("max_k"),
    )


@query(
    "q_cast_types",
    oracle="""
    SELECT l_orderkey,
           CAST(l_quantity AS BIGINT)                        AS qty_int,
           CAST(l_quantity AS VARCHAR)                       AS qty_str,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) AS price_dec_str,
           CAST(l_linenumber AS DOUBLE)                      AS line_dbl,
           TRY_CAST(l_returnflag AS BIGINT)                  AS flag_int,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR)         AS ship_date
    FROM lineitem
    WHERE l_orderkey % 97 = 0
    """,
    doc="CAST/TRY_CAST across numeric/string/decimal/date (SURVEY §2.8 casting family)",
    tags=("scalar",),
)
def q_cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.filter(F.col("l_orderkey") % 97 == 0).select(
        "l_orderkey",
        F.col("l_quantity").cast("bigint").alias("qty_int"),
        F.col("l_quantity").cast("string").alias("qty_str"),
        F.col("l_extendedprice").cast("decimal(18,2)").cast("string").alias("price_dec_str"),
        F.col("l_linenumber").cast("double").alias("line_dbl"),
        F.expr("try_cast(l_returnflag AS BIGINT)").alias("flag_int"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_date"),
    )


@query(
    "q_scalar_tail",
    oracle="""
    SELECT p_partkey,
           concat(substr(p_type, 1, 2), 'XX', substr(p_type, 5)) AS type_patched,
           CAST(coalesce(list_position(string_split('STANDARD,SMALL,MEDIUM,LARGE,ECONOMY,PROMO', ','),
                                       split_part(p_type, ' ', 1)), 0) AS BIGINT) AS type_pos,
           CAST(gcd(p_partkey % 37 + 1, p_size) AS BIGINT) AS g,
           CAST(lcm(p_partkey % 37 + 1, p_size) AS BIGINT) AS l,
           CAST(factorial(CAST(p_partkey % 10 AS INTEGER)) AS BIGINT) AS fact
    FROM part
    WHERE p_partkey <= 150
    """,
    doc="scalar tail: overlay / find_in_set / gcd / lcm / factorial — Spark lacks gcd/lcm natively, provided as bounded-domain HOF compositions (SURVEY §2.8 tail; ref via datafusion-functions, Cargo.lock:1038)",
    tags=("scalar",),
)
def q_scalar_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB lacks ``overlay`` (composed from substr in the oracle);
    Spark lacks ``gcd``/``lcm`` (composed here: divisors via
    sequence+filter+array_max — O(min(a,b)) per row, fine for bounded
    domains; general 64-bit gcd would need an iterative expression or
    a pandas_udf). ``find_in_set``'s 0-for-missing maps to DuckDB
    ``list_position``'s NULL via coalesce."""
    p = load_tables(spark, sf_dir, "part")["part"]
    a = F.pmod(F.col("p_partkey"), F.lit(37)) + 1
    b = F.col("p_size")
    gcd = F.array_max(
        F.filter(
            F.sequence(F.lit(1), F.least(a, b)),
            lambda d: (a % d == 0) & (b % d == 0),
        )
    )
    return p.filter(F.col("p_partkey") <= 150).select(
        "p_partkey",
        F.overlay(F.col("p_type"), F.lit("XX"), F.lit(3)).alias("type_patched"),
        F.expr(
            "find_in_set(split_part(p_type, ' ', 1), 'STANDARD,SMALL,MEDIUM,LARGE,ECONOMY,PROMO')"
        ).cast("bigint").alias("type_pos"),
        gcd.cast("bigint").alias("g"),
        ((a * b) / gcd).cast("bigint").alias("l"),
        F.factorial(F.pmod(F.col("p_partkey"), F.lit(10))).cast("bigint").alias("fact"),
    )


@query(
    "q_date_bin",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '15 minutes', ts), '%Y-%m-%d %H:%M:%S') AS bucket_start,
           CAST(count(*) AS BIGINT)  AS n,
           round(sum(value), 4)      AS total_value
    FROM events
    WHERE user_id < 50
    GROUP BY 1
    """,
    doc="date_bin-style bucketing: F.window(15 min).start == DuckDB time_bucket (epoch-aligned for sub-day strides) (SURVEY §2.8 date/time tail)",
    tags=("scalar", "datetime"),
)
def q_date_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-minute strides divide the 2000-01-01 origin DuckDB uses for
    sub-day buckets (946684800 % 900 == 0), so F.window's epoch
    alignment produces identical bucket boundaries."""
    e = load_tables(spark, sf_dir, "events")["events"]
    return (
        e.filter(F.col("user_id") < 50)
        .groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            "n",
            "total_value",
        )
    )


@query(
    "q_variant_json",
    oracle="""
    SELECT event_id,
           event_type                                            AS et,
           CAST(json_extract_string(props, '$.k') AS BIGINT)     AS k,
           value                                                 AS val,
           TRY_CAST(event_type AS BIGINT)                        AS et_as_int
    FROM events
    WHERE event_id % 97 = 0
    """,
    doc="VARIANT semi-structured type (Spark 4 superset of SURVEY §2.8 JSON): parse_json -> "
    "variant_get typed extraction round-trip; try_variant_get returns NULL on a type miss "
    "exactly like the oracle's TRY_CAST",
    tags=("scalar", "json"),
)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composes a JSON document per row (to_json of a struct), parses it
    into a VARIANT, and extracts typed fields back out. The double
    survives the round-trip exactly (shortest-round-trip printing), so
    no tolerance is needed; the deliberate type-miss extraction
    (string field as bigint) NULLs like TRY_CAST."""
    e = load_tables(spark, sf_dir, "events")["events"]
    j = F.to_json(
        F.struct(
            F.col("event_type").alias("et"),
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
            F.col("value").alias("val"),
        )
    )
    v = F.parse_json(j)
    return e.filter(F.col("event_id") % 97 == 0).select(
        "event_id",
        F.variant_get(v, "$.et", "string").alias("et"),
        F.variant_get(v, "$.k", "bigint").alias("k"),
        F.variant_get(v, "$.val", "double").alias("val"),
        F.try_variant_get(v, "$.et", "bigint").alias("et_as_int"),
    )
