"""Scalar function surface (SURVEY.md §2 B.7): string, regexp, split,
date, timestamp, math, conditional, array, JSON, decimal-cast.

All expressions stay JVM-side (whole-stage codegen) — no Python UDFs
in this module.  Oracle-portability rules applied: POSIX-simple
regexes, explicit DATE casts for date math, ROUND(x,4) on
transcendental outputs (libm last-ulp differences), exact decimal for
money (SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_etl_spark.functions.exact import dec2, dec6
from weather_etl_spark.io import read_table
from weather_etl_spark.registry import register


@register(
    "q_fn_string",
    oracle="""
SELECT p_partkey,
       upper(p_name)                    AS name_upper,
       lower(p_brand)                   AS brand_lower,
       substring(p_name, 1, 10)         AS name_prefix,
       trim(concat(p_type, ' '))        AS type_trim,
       length(p_name)                   AS name_len,
       replace(p_brand, 'Brand#', 'B')  AS brand_short,
       concat(p_brand, ':', p_type)     AS brand_type
FROM part
""",
    doc="upper/lower/substring/trim/concat/length/replace.",
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.trim(F.concat(F.col("p_type"), F.lit(" "))).alias("type_trim"),
        F.length("p_name").alias("name_len"),
        F.expr("replace(p_brand, 'Brand#', 'B')").alias("brand_short"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias(
            "brand_type"
        ),
    )


@register(
    "q_fn_regexp",
    oracle="""
SELECT p_partkey,
       CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS INT) AS brand_num
FROM part
WHERE regexp_matches(p_type, '^(ECONOMY|STANDARD)')
""",
    doc="regexp_extract + rlike filter (POSIX-simple patterns).",
)
def q_fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_type").rlike("^(ECONOMY|STANDARD)"))
        .select(
            "p_partkey",
            F.regexp_extract("p_brand", "Brand#([0-9]+)", 1)
            .cast("int")
            .alias("brand_num"),
        )
    )


@register(
    "q_fn_split",
    oracle="""
SELECT token, COUNT(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT 20
""",
    doc="split + explode tokens, top-20 token counts (single-space split, "
    "tie-break on token).",
    scale_notes="explode multiplies rows ~60x; the count aggregate "
    "partial-reduces map-side so the shuffle carries only distinct tokens.",
)
def q_fn_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(20)
    )


@register(
    "q_fn_date",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate)    AS y,
       month(o_orderdate)   AS m,
       day(o_orderdate)     AS d,
       CAST(date_trunc('month', o_orderdate) AS DATE)    AS month_start,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01')
                                                         AS days_to_y2k,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
                                                         AS plus_3m,
       last_day(CAST(o_orderdate AS DATE))               AS month_end
FROM orders
""",
    doc="year/month/day/date_trunc/datediff/add_months/last_day "
    "(weekofyear/dayofweek excluded — known numbering divergence, §7.4).",
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.to_date("o_orderdate"))
        .alias("days_to_y2k"),
        F.add_months(F.to_date("o_orderdate"), 3).alias("plus_3m"),
        F.last_day(F.to_date("o_orderdate")).alias("month_end"),
    )


@register(
    "q_fn_ts",
    oracle="""
SELECT event_id,
       epoch_us(ts)                          AS ts_us,
       hour(ts)                              AS h,
       minute(ts)                            AS mi,
       epoch_us(ts + INTERVAL 90 MINUTE)     AS ts_plus90m_us,
       epoch_us(date_trunc('hour', ts))      AS hour_start_us
FROM events
""",
    doc="Epoch extraction, us truncation, interval arithmetic over the "
    "ns-origin events table (reference A7 tz normalization + §7.3 recipe).",
)
def q_fn_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.unix_micros(F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias(
            "ts_plus90m_us"
        ),
        F.unix_micros(F.date_trunc("hour", "ts")).alias("hour_start_us"),
    )


@register(
    "q_fn_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice, 1)        AS price_r1,
       abs(0 - l_discount)              AS disc_abs,
       CAST(ceil(l_extendedprice) AS BIGINT)  AS price_ceil,
       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
       round(sqrt(l_quantity), 4)       AS qty_sqrt,
       l_quantity * l_quantity          AS qty_sq,
       round(ln(l_extendedprice), 4)    AS price_ln,
       round(exp(l_discount), 4)        AS disc_exp,
       l_orderkey % 7                   AS key_mod7
FROM lineitem
""",
    doc="round/abs/ceil/floor/sqrt/pow/ln/exp/mod (transcendentals "
    "rounded to 4 places — libm ulp differences across engines).",
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.lit(0) - F.col("l_discount")).alias("disc_abs"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.round(F.sqrt("l_quantity"), 4).alias("qty_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.round(F.log("l_extendedprice"), 4).alias("price_ln"),
        F.round(F.exp("l_discount"), 4).alias("disc_exp"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
    )


@register(
    "q_fn_cond",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice < 50000  THEN 'low'
            WHEN o_totalprice < 200000 THEN 'mid'
            ELSE 'high' END                            AS band,
       COALESCE(NULLIF(o_orderstatus, 'P'), '(was P)') AS status_norm,
       LEAST(o_totalprice, 100000.0)                   AS price_capped,
       GREATEST(o_totalprice, 1000.0)                  AS price_floored
FROM orders
""",
    doc="CASE WHEN / coalesce / nullif / least / greatest (the "
    "reference's status envelope logic, A13, generalized).",
)
def q_fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 200000, "mid")
        .otherwise("high")
    )
    return o.select(
        "o_orderkey",
        band.alias("band"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("(was P)")
        ).alias("status_norm"),
        F.least(F.col("o_totalprice"), F.lit(100000.0)).alias("price_capped"),
        F.greatest(F.col("o_totalprice"), F.lit(1000.0)).alias(
            "price_floored"
        ),
    )


@register(
    "q_fn_array",
    oracle="""
SELECT doc_id,
       CAST(len(toks) AS BIGINT)                AS n_toks,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
       list_contains(toks, 'spark')             AS has_spark,
       array_to_string(list_sort(toks)[1:3], ' ') AS first3
FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t
""",
    doc="Array ops on token arrays: size, distinct, contains, sorted "
    "slice (array_distinct order differs across engines — sort first; "
    "output column stringified via array_join so external row "
    "canonicalizers hash it portably, §7.4 rule 5).",
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_toks"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_uniq"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(F.slice(F.sort_array(toks), 1, 3), " ").alias("first3"),
    )


@register(
    "q_fn_json",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER))
            AS BIGINT) AS sum_k,
       COUNT(*) AS n
FROM events
GROUP BY event_type
""",
    doc="JSON field extraction from events.props ({\"k\": <int>}).",
    scale_notes="get_json_object evaluates in codegen; for repeated "
    "multi-field access use from_json once into a struct column.",
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(F.lit(1)).alias("n")
    )


@register(
    "q_fn_cast_decimal",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,6))) AS DOUBLE)
         AS net_revenue,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty_int,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
    doc="Decimal-cast arithmetic: DECIMAL(18,2) money x DECIMAL(18,6) "
    "factor, plus integral casts (§7.4 rule 1).",
)
def q_fn_cast_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    net = dec2("l_extendedprice") * dec6(F.lit(1.0) - F.col("l_discount"))
    return li.groupBy("l_returnflag").agg(
        F.sum(net).cast("double").alias("net_revenue"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty_int"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_fn_variant",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER))
            AS BIGINT) AS sum_k,
       COUNT(*) AS n
FROM events
GROUP BY event_type
""",
    doc="Semi-structured VARIANT surface (Spark 4): props parsed once "
    "into a VariantType column with parse_json, fields typed out with "
    "try_variant_get — the open-schema path a JSON-heavy pipeline uses "
    "instead of per-access string parsing. Same declared semantics as "
    "q_fn_json, so the same exact oracle applies to the variant route.",
    scale_notes="parse_json once per row beats repeated "
    "get_json_object string scans when several fields are read; the "
    "binary variant encoding flows through shuffles like any column. "
    "try_variant_get returns NULL (never throws) on shape mismatches.",
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "int")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(F.lit(1)).alias("n")
    )


@register(
    "q_fn_try",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN o_custkey % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_div_null,
       CAST(ROUND(SUM(CAST(COALESCE(o_totalprice / NULLIF(o_custkey % 3, 0),
                                    0) AS DECIMAL(18,6))), 4) AS DOUBLE)
         AS sum_safe_div,
       CAST(SUM(CASE WHEN TRY_CAST(o_orderpriority AS INTEGER) IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_uncastable
FROM orders
GROUP BY o_orderstatus
""",
    doc="Error-safe expression surface: try_divide yields NULL on "
    "division by zero and try_to_number NULL on an unparseable string "
    "— the expression-level form of the reference's structured error "
    "envelope (A13: degrade to a recorded failure, never crash the "
    "batch).",
    scale_notes="try_* stays inside whole-stage codegen (a null check, "
    "not an exception path) — same cost as the unguarded expression; "
    "the alternative, ANSI-mode task retries on bad rows, is what "
    "kills 100 TB jobs.",
)
def q_fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = read_table(spark, sf_dir, "orders")
    denom = F.col("o_custkey") % 3
    safe_div = F.try_divide(F.col("o_totalprice"), denom)
    return od.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((denom == 0).cast("bigint")).alias("n_div_null"),
        # Sum in DECIMAL(18,6) so partial-aggregation order cannot move
        # the last ulp (repo decimal-sum discipline, SURVEY §7.4 rule 1).
        F.round(
            F.sum(F.coalesce(safe_div, F.lit(0.0)).cast("decimal(18,6)")), 4
        )
        .cast("double")
        .alias("sum_safe_div"),
        F.sum(
            F.try_to_number(F.col("o_orderpriority"), F.lit("999"))
            .isNull()
            .cast("bigint")
        ).alias("n_uncastable"),
    )


@register(
    "q_fn_bitwise",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderkey & 255 AS BIGINT)        AS b_and,
       CAST(o_orderkey | 4096 AS BIGINT)       AS b_or,
       CAST(xor(o_orderkey, 1365) AS BIGINT)   AS b_xor,
       CAST(bit_count(o_orderkey) AS BIGINT)   AS popcnt,
       CAST(o_orderkey << 2 AS BIGINT)         AS shl,
       CAST(o_orderkey >> 3 AS BIGINT)         AS shr
FROM orders
WHERE o_orderkey <= 2000
""",
    doc="Bitwise expression surface (AND/OR/XOR/popcount/shifts) — the "
    "flag-mask and hash-mix primitives every fingerprint/bucketing "
    "operator builds on (q_llm_simhash, llm_editdist_banded band "
    "extraction). Spark ^ is XOR while DuckDB ^ is power — the oracle "
    "uses DuckDB's xor() to pin identical semantics.",
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    k = F.col("o_orderkey")
    return od.select(
        "o_orderkey",
        k.bitwiseAND(255).cast("bigint").alias("b_and"),
        k.bitwiseOR(4096).cast("bigint").alias("b_or"),
        k.bitwiseXOR(1365).cast("bigint").alias("b_xor"),
        F.bit_count(k).cast("bigint").alias("popcnt"),
        F.shiftleft(k, 2).cast("bigint").alias("shl"),
        F.shiftright(k, 3).cast("bigint").alias("shr"),
    )


@register(
    "q_fn_string2",
    oracle="""
SELECT p_partkey,
       translate(p_brand, '#', '-')         AS brand_tr,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
       rpad(p_brand, 12, '.')               AS brand_padded,
       reverse(p_brand)                     AS brand_rev,
       repeat('-', 3) || p_type             AS type_dashed,
       CAST(strpos(p_name, 'a') AS BIGINT)  AS first_a,
       left(p_name, 5)                      AS name_l5,
       right(p_name, 5)                     AS name_r5
FROM part
""",
    doc="Second string surface: translate/lpad/rpad/reverse/repeat/"
    "instr/left/right (initcap excluded — absent in DuckDB, would be "
    "an unverifiable oracle).",
)
def q_fn_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.translate("p_brand", "#", "-").alias("brand_tr"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.rpad("p_brand", 12, ".").alias("brand_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.concat(F.repeat(F.lit("-"), 3), F.col("p_type")).alias(
            "type_dashed"
        ),
        F.instr("p_name", "a").cast("bigint").alias("first_a"),
        F.left(F.col("p_name"), F.lit(5)).alias("name_l5"),
        F.right(F.col("p_name"), F.lit(5)).alias("name_r5"),
    )


@register(
    "q_fn_hash_encode",
    oracle="""
SELECT doc_id,
       md5(text)                                    AS h_md5,
       sha256(text)                                 AS h_sha256,
       to_base64(encode(substr(text, 1, 48)))       AS b64,
       CAST(from_base64(to_base64(encode(substr(text, 1, 48))))
            AS VARCHAR)                             AS b64_roundtrip,
       hex(encode(substr(text, 1, 8)))              AS hx
FROM documents WHERE doc_id <= 500
""",
    doc="Hash + encoding surface: md5 / sha2-256 hex digests, base64 "
    "encode + lossless round-trip, hex — the content-addressing "
    "primitives under fingerprint dedup and the multimodal payload "
    "columns (both engines emit unchunked RFC-4648 base64 and "
    "lowercase hex digests; Spark hex() is uppercased to match "
    "DuckDB's).",
)
def q_fn_hash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") <= 500
    )
    head48 = F.encode(F.substring("text", 1, 48), "UTF-8")
    return docs.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2(F.col("text").cast("binary"), 256).alias("h_sha256"),
        F.base64(head48).alias("b64"),
        F.unbase64(F.base64(head48)).cast("string").alias("b64_roundtrip"),
        F.upper(F.hex(F.encode(F.substring("text", 1, 8), "UTF-8"))).alias(
            "hx"
        ),
    )


@register(
    "q_fn_sql_udf",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price,
       CASE WHEN l_discount >= 0.05 THEN 'deep' ELSE 'light' END AS disc_band
FROM lineitem
WHERE l_linenumber = 1
""",
    doc="SQL-defined scalar UDFs (Spark 4 CREATE FUNCTION ... RETURN "
    "expr): net_price and disc_band are declared as catalog-level SQL "
    "functions and invoked from a query — the user-extensibility "
    "surface that needs NO Python and therefore no serialization "
    "boundary. The oracle inlines the same expressions.",
    scale_notes="SQL UDFs are macro-expanded into the plan at analysis "
    "time: the executed plan is identical to writing the expression "
    "inline — full codegen, pushdown, and pruning apply. The zero-cost "
    "alternative to q_udf_py's interpreter round-trip (declared there "
    "as the slow path).",
)
def q_fn_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION wes_net_price("
        "price DOUBLE, disc DOUBLE) RETURNS DOUBLE "
        "RETURN ROUND(price * (1 - disc), 4)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION wes_disc_band(disc DOUBLE) "
        "RETURNS STRING "
        "RETURN CASE WHEN disc >= 0.05 THEN 'deep' ELSE 'light' END"
    )
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "wes_sqludf_lineitem"
    )
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber,
               wes_net_price(l_extendedprice, l_discount) AS net_price,
               wes_disc_band(l_discount) AS disc_band
        FROM wes_sqludf_lineitem
        WHERE l_linenumber = 1
        """
    )


@register(
    "q_fn_map",
    oracle="""
SELECT event_id,
       len(json_keys(props)) AS n_keys,
       CAST(json_extract(props, '$.k') AS INT) AS v_k,
       json_extract(props, '$.k') IS NOT NULL AS has_k
FROM events
WHERE event_id < 2000
""",
    doc="MapType surface: the events props JSON parsed into a real "
    "map<string,int> column, then interrogated with the map-function "
    "family — size (key count), element_at lookup, map_contains_key. "
    "Complements q_fn_json (string-path extraction) with the typed "
    "collection API; the oracle reads the same facts through DuckDB's "
    "JSON functions. has_k is coalesced to false on the Spark side "
    "because map_contains_key over a null from_json result yields "
    "NULL while the oracle's IS NOT NULL yields false; assumes "
    "fixture props carry no duplicate JSON keys (from_json dedups, "
    "json_keys does not).",
    scale_notes="from_json + map ops are JVM expressions inside "
    "codegen: per-row, zero shuffle, and the event_id predicate is "
    "pushed to the parquet scan. MapType columns carry no global "
    "dictionary — safe at any cardinality.",
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(m, "k").alias("v_k"),
        F.coalesce(F.map_contains_key(m, "k"), F.lit(False)).alias("has_k"),
    )


@register(
    "q_fn_url",
    oracle="""
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.com/' || lang || '/doc/' ||
         doc_id || '?ref=r' || doc_id % 7 || '&p=' || doc_id % 3 ||
         '#sec' || doc_id % 5 AS url
  FROM documents
)
SELECT doc_id,
       regexp_extract(url, '^([a-z]+)://', 1) AS proto,
       regexp_extract(url, '://([^/]+)/', 1) AS host,
       regexp_extract(url, '://[^/]+(/[^?#]*)', 1) AS path,
       regexp_extract(url, 'ref=([a-z0-9]+)', 1) AS ref,
       regexp_extract(url, '#(.*)$', 1) AS frag
FROM u
""",
    doc="URL parsing surface: synthetic per-document URLs decomposed "
    "into protocol/host/path/query-param/fragment. The Spark side "
    "uses the dedicated parse_url function (PROTOCOL/HOST/PATH/"
    "QUERY:key/REF); the oracle re-derives every component with "
    "plain regexes, so a parse_url quirk (e.g. including the '?' or "
    "'#') would hash-mismatch.",
)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("?ref=r"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("&p="),
        (F.col("doc_id") % 3).cast("string"),
        F.lit("#sec"),
        (F.col("doc_id") % 5).cast("string"),
    )
    return docs.select(
        "doc_id",
        F.parse_url(url, F.lit("PROTOCOL")).alias("proto"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("ref")).alias("ref"),
        F.parse_url(url, F.lit("REF")).alias("frag"),
    )


@register(
    "q_fn_format",
    oracle="""
SELECT l_orderkey, l_linenumber,
       printf('%s#%04d @ %10.2f', l_returnflag, l_linenumber,
              l_extendedprice) AS line_fmt,
       printf('%08x', l_orderkey) AS key_hex,
       printf('%+d|%5.1f%%', CAST(l_quantity AS INTEGER),
              l_discount * 100) AS qty_disc
FROM lineitem WHERE l_orderkey < 2000
""",
    doc="C-style formatting parity: format_string (Spark) vs printf "
    "(DuckDB) over width/zero-pad/precision/hex/sign specifiers. "
    "Both implementations round %f by the exact binary value of the "
    "double, so the formatted strings hash-match; ties-at-.005 are "
    "not representable in binary doubles, which is why no rounding-"
    "mode divergence can occur.",
)
def q_fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") < 2000
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.format_string(
            "%s#%04d @ %10.2f",
            F.col("l_returnflag"),
            F.col("l_linenumber"),
            F.col("l_extendedprice"),
        ).alias("line_fmt"),
        F.format_string("%08x", F.col("l_orderkey")).alias("key_hex"),
        F.format_string(
            "%+d|%5.1f%%",
            F.col("l_quantity").cast("int"),
            F.col("l_discount") * 100,
        ).alias("qty_disc"),
    )


@register(
    "q_fn_math2",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(sin(l_discount), 4)                     AS disc_sin,
       round(cos(l_discount), 4)                     AS disc_cos,
       round(atan(l_discount), 4)                    AS disc_atan,
       round(atan2(l_quantity, l_extendedprice), 4)  AS qp_atan2,
       round(cbrt(l_extendedprice), 4)               AS price_cbrt,
       round(degrees(l_discount), 4)                 AS disc_deg,
       round(radians(l_quantity), 4)                 AS qty_rad,
       round(log2(l_extendedprice), 4)               AS price_log2,
       round(log10(l_extendedprice), 4)              AS price_log10,
       CAST(sign(l_discount - 0.05) AS INT)          AS disc_sign
FROM lineitem
""",
    doc="Second math surface: trig (sin/cos/atan), atan2, cbrt, "
    "degrees/radians, log2/log10, sign — the remaining math "
    "builtins present natively in BOTH engines (sinh/cosh/hypot "
    "are DuckDB-absent and excluded rather than emulated by "
    "formula, which would compare libm against a different "
    "expression tree). Transcendentals rounded to 4 places per the "
    "q_fn_math libm-ulp discipline; sign emits exact -1/0/1 "
    "ints.",
)
def q_fn_math2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin("l_discount"), 4).alias("disc_sin"),
        F.round(F.cos("l_discount"), 4).alias("disc_cos"),
        F.round(F.atan("l_discount"), 4).alias("disc_atan"),
        F.round(
            F.atan2(F.col("l_quantity"), F.col("l_extendedprice")), 4
        ).alias("qp_atan2"),
        F.round(F.cbrt("l_extendedprice"), 4).alias("price_cbrt"),
        F.round(F.degrees("l_discount"), 4).alias("disc_deg"),
        F.round(F.radians("l_quantity"), 4).alias("qty_rad"),
        F.round(F.log2("l_extendedprice"), 4).alias("price_log2"),
        F.round(F.log10("l_extendedprice"), 4).alias("price_log10"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias(
            "disc_sign"
        ),
    )


@register(
    "q_fn_array_lambda",
    oracle="""
SELECT vec_id,
       CAST(len(list_filter(emb, x -> x > 0)) AS BIGINT) AS n_pos,
       len(list_filter(emb, x -> x > 0.3)) > 0           AS any_big,
       len(list_filter(emb, x -> abs(x) >= 10)) = 0      AS all_small,
       ROUND(list_sum(list_transform(emb, x -> abs(x))), 4) AS l1,
       ROUND(list_sum(list_transform(range(1, len(emb) + 1),
                                     i -> emb[i] * emb[i])), 4) AS dot_self
FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
      FROM embeddings) t
""",
    doc="Higher-order array lambdas as a declared function surface: "
    "filter (positive-component count), exists/forall (threshold "
    "predicates, expressed as filter-length tests in DuckDB), and "
    "left-fold aggregation (L1 norm via transform+sum, "
    "self-dot-product via element-wise square) over the embedding "
    "arrays. Both engines fold element order left-to-right over the "
    "same double-cast values, so the sums are bit-identical before "
    "the final 4-place rounding.",
    scale_notes="Lambdas evaluate inside whole-stage codegen per row "
    "— zero shuffle, no UDF, array-length-proportional cost. The "
    "same constructs power the vector operators (llm_vector); this "
    "row pins their function-surface semantics directly.",
)
def q_fn_array_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    return emb.select(
        "vec_id",
        F.size(F.expr("filter(emb, x -> x > 0)"))
        .cast("bigint")
        .alias("n_pos"),
        F.expr("exists(emb, x -> x > 0.3)").alias("any_big"),
        F.expr("forall(emb, x -> abs(x) < 10)").alias("all_small"),
        F.round(
            F.expr(
                "aggregate(transform(emb, x -> abs(x)), 0D,"
                " (acc, x) -> acc + x)"
            ),
            4,
        ).alias("l1"),
        F.round(
            F.expr(
                "aggregate(zip_with(emb, emb, (a, b) -> a * b), 0D,"
                " (acc, x) -> acc + x)"
            ),
            4,
        ).alias("dot_self"),
    )


@register(
    "q_fn_regexp2",
    oracle="""
SELECT p_partkey,
       array_to_string(regexp_extract_all(p_type, '[A-Z]+'), '|')
         AS words,
       CAST(len(regexp_extract_all(p_type, '[A-Z]+')) AS BIGINT)
         AS n_words,
       CAST(len(regexp_extract_all(p_name, 'o')) AS BIGINT) AS n_o,
       regexp_replace(p_brand, '[0-9]+', '#', 'g') AS brand_masked
FROM part
""",
    doc="Extended regexp surface: regexp_extract_all (stringified "
    "via array_join, §7.4 rule 5), match counting via extract_all "
    "length (regexp_count is Spark-only, so the count is expressed "
    "portably), and global regexp_replace. Patterns are "
    "dialect-safe character classes — identical under Java regex "
    "and RE2.",
)
def q_fn_regexp2(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part")
    words = F.expr("regexp_extract_all(p_type, '[A-Z]+', 0)")
    return p.select(
        "p_partkey",
        F.array_join(words, "|").alias("words"),
        F.size(words).cast("bigint").alias("n_words"),
        F.size(F.expr("regexp_extract_all(p_name, 'o', 0)"))
        .cast("bigint")
        .alias("n_o"),
        F.regexp_replace("p_brand", "[0-9]+", "#").alias("brand_masked"),
    )


@register(
    "q_fn_date_iso",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate AS DATE)                        AS order_date,
       quarter(o_orderdate)                             AS q,
       dayofyear(o_orderdate)                           AS doy,
       isodow(CAST(o_orderdate AS DATE))                AS iso_dow,
       week(CAST(o_orderdate AS DATE))                  AS iso_week,
       CAST(CAST(o_orderdate AS DATE)
            + ((CASE WHEN (8 - isodow(CAST(o_orderdate AS DATE))) % 7 = 0
                     THEN 7
                     ELSE (8 - isodow(CAST(o_orderdate AS DATE))) % 7 END)
               || ' days')::INTERVAL AS DATE)           AS next_monday
FROM orders
""",
    doc="ISO-8601 calendar surface: quarter, day-of-year, ISO "
    "weekday (Mon=1..Sun=7), ISO week number, and strictly-next "
    "Monday. Closes q_fn_date's documented exclusion: the "
    "LOCALE-dependent dayofweek/weekofyear numberings do diverge "
    "between engines, but the ISO-8601 pair is provably aligned "
    "(probed across a year boundary, 1995-12-25..1996-01-15), and "
    "next_day is re-expressed as pure isodow arithmetic on the "
    "DuckDB side.",
)
def q_fn_date_iso(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        d.alias("order_date"),
        F.quarter("o_orderdate").alias("q"),
        F.dayofyear("o_orderdate").alias("doy"),
        (F.weekday(d) + 1).alias("iso_dow"),
        F.weekofyear(d).alias("iso_week"),
        F.next_day(d, "Mon").alias("next_monday"),
    )


@register(
    "q_fn_collate",
    oracle="""
WITH v AS (
  SELECT doc_id,
         CASE doc_id % 3
           WHEN 0 THEN upper(source)
           WHEN 1 THEN upper(substr(source, 1, 1)) || substr(source, 2)
           ELSE source
         END AS s
  FROM documents
)
SELECT lower(s) AS key_ci,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT s) AS BIGINT) AS n_case_variants,
       MIN(s) AS first_binary
FROM v
GROUP BY lower(s)
ORDER BY key_ci
""",
    doc="Collation-aware grouping (the Spark 4 COLLATE surface): "
    "deterministic case variants of the source domain (UPPER / "
    "Initcap / raw by doc_id mod 3) are grouped under the "
    "UTF8_LCASE collation, so all spellings of one domain land in "
    "one group while COUNT(DISTINCT raw) still sees the binary "
    "variants. The oracle expresses the same semantics via "
    "lower() grouping — UTF8_LCASE equality and ASCII "
    "lowercase-equality coincide on this fixture's ASCII domain "
    "names, which is exactly the contract the test pins. Group "
    "key emitted as lower() in both engines (a collated group's "
    "representative value is engine-dependent).",
    scale_notes="Collation compares run inside codegen'd hash "
    "aggregation — one shuffle on the collated key, identical "
    "physics to a binary groupBy. No normalization pass "
    "materializes: the collation IS the comparator.",
)
def q_fn_collate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    s = (
        F.when(
            F.col("doc_id") % 3 == 0, F.upper("source")
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.upper(F.substring("source", 1, 1)),
                F.expr("substring(source, 2)"),
            ),
        )
        .otherwise(F.col("source"))
    )
    return (
        docs.select(F.col("doc_id"), s.alias("s"))
        .groupBy(F.collate(F.col("s"), "UTF8_LCASE").alias("k"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count_distinct(F.collate(F.col("s"), "UTF8_BINARY"))
            .cast("bigint")
            .alias("n_case_variants"),
            F.min(F.collate(F.col("s"), "UTF8_BINARY")).alias(
                "first_binary"
            ),
        )
        .select(
            F.lower(F.col("k")).alias("key_ci"),
            "n_rows",
            "n_case_variants",
            F.col("first_binary").cast("string").alias("first_binary"),
        )
        .orderBy("key_ci")
    )


@register(
    "q_fn_geo",
    oracle="""
WITH pts AS (
  SELECT vec_id, CAST(embedding[1] AS DOUBLE) * 90 AS lat,
         CAST(embedding[2] AS DOUBLE) * 180 AS lon
  FROM embeddings WHERE vec_id <= 50
), anchor AS (
  SELECT lat AS alat, lon AS alon FROM pts WHERE vec_id = 0
)
SELECT vec_id, ROUND(lat, 4) AS lat, ROUND(lon, 4) AS lon,
       ROUND(2 * 6371.0 * ASIN(SQRT(
           POW(SIN(RADIANS(lat - alat) / 2), 2)
           + COS(RADIANS(alat)) * COS(RADIANS(lat))
             * POW(SIN(RADIANS(lon - alon) / 2), 2))), 4) AS dist_km,
       ROUND(FMOD(DEGREES(ATAN2(
           SIN(RADIANS(lon - alon)) * COS(RADIANS(lat)),
           COS(RADIANS(alat)) * SIN(RADIANS(lat))
           - SIN(RADIANS(alat)) * COS(RADIANS(lat))
             * COS(RADIANS(lon - alon)))) + 360, 360), 4) AS bearing_deg,
       (lat BETWEEN -20 AND 20) AND (lon BETWEEN -40 AND 40) AS in_box
FROM pts CROSS JOIN anchor ORDER BY vec_id
""",
    doc="Geodesic scalar-function surface: coordinates fabricated "
    "from the first two embedding dimensions (lat = e1 x 90, lon = "
    "e2 x 180 — the q_join_spatial_grid convention), haversine "
    "great-circle distance and initial bearing from the vec_id-0 "
    "anchor (radians/degrees/trig/atan2 built-ins in both engines), "
    "plus a bounding-box membership flag — the geo expressions a "
    "location-tagged corpus needs for distance filtering and "
    "geo-dedup. All trig emitted ROUND-4.",
    scale_notes="Embarrassingly parallel codegen'd JVM trig, zero "
    "shuffle; the 1-row anchor is the q_filter_ts_cursor crossJoin. "
    "A geo-radius JOIN composes this distance with "
    "q_join_spatial_grid's cell blocking — never a cross join.",
)
def q_fn_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    pts = emb.filter(F.col("vec_id") <= 50).select(
        "vec_id",
        (F.element_at("embedding", 1).cast("double") * 90).alias("lat"),
        (F.element_at("embedding", 2).cast("double") * 180).alias("lon"),
    )
    anchor = pts.filter(F.col("vec_id") == 0).select(
        F.col("lat").alias("alat"), F.col("lon").alias("alon")
    )
    dlon = F.radians(F.col("lon") - F.col("alon"))
    hav = (
        F.pow(F.sin(F.radians(F.col("lat") - F.col("alat")) / 2), 2)
        + F.cos(F.radians("alat"))
        * F.cos(F.radians("lat"))
        * F.pow(F.sin(dlon / 2), 2)
    )
    bearing = F.degrees(
        F.atan2(
            F.sin(dlon) * F.cos(F.radians("lat")),
            F.cos(F.radians("alat")) * F.sin(F.radians("lat"))
            - F.sin(F.radians("alat"))
            * F.cos(F.radians("lat"))
            * F.cos(dlon),
        )
    )
    return (
        pts.crossJoin(F.broadcast(anchor))
        .select(
            "vec_id",
            F.round("lat", 4).alias("lat"),
            F.round("lon", 4).alias("lon"),
            F.round(2 * 6371.0 * F.asin(F.sqrt(hav)), 4).alias("dist_km"),
            F.round(F.pmod(bearing + 360, F.lit(360.0)), 4).alias(
                "bearing_deg"
            ),
            (
                F.col("lat").between(-20, 20)
                & F.col("lon").between(-40, 40)
            ).alias("in_box"),
        )
        .orderBy("vec_id")
    )
