package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.GraftSql

/** Third ksqlDB 0.28 builtin-function pack, run END-TO-END through
  * [[GraftSql.sql]] with the ksql spellings — the array SET
  * operations, the BYTES codec API, `SPLIT_TO_MAP`,
  * `REGEXP_EXTRACT_ALL` (ksql pattern-first arg order), date
  * formatting, numeric `TRUNC`, and the math scalar surface — each
  * query hash-verified against a DuckDB oracle spelling the same
  * semantics natively.
  *
  * Determinism policy (the catalog-wide contract): array outputs are
  * scalarized with `ARRAY_JOIN`; libm-backed doubles (exp/ln/sqrt/
  * cbrt/atan2/atan) are rounded onto coarse integer grids (mills /
  * centi) where the nearest half-boundary across the whole key domain
  * is ≥8.6e-4 away — a last-ulp engine difference cannot flip the
  * hash; set-op inputs come from the documents token stream whose
  * vocabulary is pure lowercase ASCII, so lexicographic comparisons
  * agree bit-for-bit between engines.
  */
object KsqlFunctionQueries2 {

  private def run(s: SparkSession, d: String, statement: String): DataFrame = {
    GraftSql.init(s, d)
    GraftSql.sql(s, statement)
  }

  /** ksql array set operations (first-occurrence order, deduped —
    * Spark's namesakes share exactly those semantics, pinned here
    * against an oracle that spells order-preserving dedup explicitly),
    * ARRAY_MAX/MIN/REMOVE/CONTAINS, ENTRIES with ksql's K/V struct
    * field names, and MAP_KEYS/MAP_VALUES. */
  def arrayOps(s: SparkSession, d: String): DataFrame =
    run(s, d,
      """SELECT doc_id,
        |  ARRAY_JOIN(ARRAY_DISTINCT(SPLIT(text, ' '))) AS dis_words,
        |  ARRAY_JOIN(ARRAY_UNION(SPLIT(source, 'c'), ARRAY['sr', 'xx']))
        |    AS uni_parts,
        |  ARRAY_JOIN(ARRAY_EXCEPT(SPLIT(text, ' '),
        |    ARRAY['the', 'a', 'value'])) AS exc_words,
        |  ARRAY_JOIN(ARRAY_INTERSECT(SPLIT(text, ' '),
        |    ARRAY['the', 'scan', 'key'])) AS int_words,
        |  ARRAY_MAX(SPLIT(text, ' ')) AS max_word,
        |  ARRAY_MIN(SPLIT(text, ' ')) AS min_word,
        |  ARRAY_JOIN(ARRAY_REMOVE(SPLIT(text, ' '), 'the')) AS rem_words,
        |  CAST(ARRAY_CONTAINS(SPLIT(text, ' '), 'spark') AS BIGINT)
        |    AS has_spark,
        |  ARRAY_JOIN(TRANSFORM(ENTRIES(MAP('b' := doc_id, 'a' := doc_id * 2),
        |    true), (e) => CONCAT(e->K, '=', CAST(e->V AS STRING))))
        |    AS entries_sorted,
        |  ARRAY_JOIN(ARRAY_SORT(MAP_KEYS(MAP('b' := doc_id,
        |    'a' := doc_id * 2)))) AS mkeys,
        |  CAST(ARRAY_MAX(MAP_VALUES(MAP('b' := doc_id, 'a' := doc_id * 2)))
        |    AS BIGINT) AS mval_max
        |FROM documents""".stripMargin)

  val arrayOpsSql: String =
    """WITH t AS (
      |  SELECT doc_id, lang, source, string_split(text, ' ') AS w
      |  FROM documents)
      |SELECT doc_id,
      |  coalesce(array_to_string(list_filter(w,
      |    (x, i) -> list_position(w, x) = i), ','), '') AS dis_words,
      |  coalesce(array_to_string(list_filter(
      |    list_concat(string_split(source, 'c'), ['sr', 'xx']),
      |    (x, i) -> list_position(
      |      list_concat(string_split(source, 'c'), ['sr', 'xx']), x) = i),
      |    ','), '') AS uni_parts,
      |  coalesce(array_to_string(list_filter(
      |    list_filter(w, (x, i) -> list_position(w, x) = i),
      |    x -> NOT list_contains(['the', 'a', 'value'], x)), ','), '')
      |    AS exc_words,
      |  coalesce(array_to_string(list_filter(
      |    list_filter(w, (x, i) -> list_position(w, x) = i),
      |    x -> list_contains(['the', 'scan', 'key'], x)), ','), '') AS int_words,
      |  list_aggregate(w, 'max') AS max_word,
      |  list_aggregate(w, 'min') AS min_word,
      |  coalesce(array_to_string(list_filter(w, x -> x <> 'the'), ','), '') AS rem_words,
      |  CAST(list_contains(w, 'spark') AS BIGINT) AS has_spark,
      |  'a=' || (doc_id * 2)::VARCHAR || ',b=' || doc_id::VARCHAR
      |    AS entries_sorted,
      |  'a,b' AS mkeys,
      |  CAST(doc_id * 2 AS BIGINT) AS mval_max
      |FROM t""".stripMargin

  /** The BYTES codec API (TO_BYTES/FROM_BYTES over hex/base64/utf8/
    * ascii, lowercase hex out), SPLIT_TO_MAP with the duplicate-key
    * LAST-wins rule exercised on every row, REGEXP_EXTRACT_ALL in
    * ksql's pattern-first order, FORMAT_DATE/PARSE_DATE/UNIX_DATE,
    * and numeric TRUNC (1-arg → BIGINT toward zero incl. negatives;
    * 2-arg decimal places surfaced on a rounded e4 grid). */
  def bytesStrMap(s: SparkSession, d: String): DataFrame =
    run(s, d,
      """SELECT doc_id,
        |  FROM_BYTES(TO_BYTES(source, 'utf8'), 'hex') AS src_hex,
        |  FROM_BYTES(TO_BYTES(source, 'utf8'), 'base64') AS src_b64,
        |  FROM_BYTES(TO_BYTES(FROM_BYTES(TO_BYTES(lang, 'utf8'), 'hex'),
        |    'hex'), 'utf8') AS lang_rt,
        |  FROM_BYTES(TO_BYTES(source, 'ascii'), 'utf8') AS ascii_rt,
        |  ELEMENT_AT(SPLIT_TO_MAP(CONCAT('k1:', lang, ';k2:', source,
        |    ';k1:', CAST(doc_id AS STRING)), ';', ':'), 'k1') AS stm_last,
        |  ELEMENT_AT(SPLIT_TO_MAP(CONCAT('k1:', lang, ';k2:', source,
        |    ';k1:', CAST(doc_id AS STRING)), ';', ':'), 'k2') AS stm_k2,
        |  CAST(CARDINALITY(SPLIT_TO_MAP(CONCAT('k1:', lang, ';k2:', source,
        |    ';k1:', CAST(doc_id AS STRING)), ';', ':')) AS BIGINT)
        |    AS stm_size,
        |  ARRAY_JOIN(REGEXP_EXTRACT_ALL('([a-z]+)',
        |    CONCAT(source, '.', lang), 1)) AS rex_all,
        |  FORMAT_DATE(PARSE_DATE(CONCAT('2024-0',
        |    CAST(doc_id % 9 + 1 AS STRING), '-11'), 'yyyy-MM-dd'),
        |    'dd/MM/yyyy') AS fmt_date,
        |  CAST(UNIX_DATE(PARSE_DATE(CONCAT('2024-0',
        |    CAST(doc_id % 9 + 1 AS STRING), '-11'), 'yyyy-MM-dd'))
        |    AS BIGINT) AS epoch_days,
        |  TRUNC(CAST(doc_id AS DOUBLE) / 7) AS trunc0,
        |  TRUNC(CAST(3 - doc_id AS DOUBLE) / 7) AS trunc_neg,
        |  ROUND(TRUNC(doc_id / 7.0, 2) * 10000) AS trunc2_e4,
        |  CAST(INT_FROM_BYTES(TO_BYTES(
        |    LPAD(CAST(doc_id AS STRING), 8, '0'), 'hex')) AS BIGINT)
        |    AS ifb,
        |  CAST(DOUBLE_FROM_BYTES(TO_BYTES('3ff8000000000000', 'hex'))
        |    * doc_id * 2 AS BIGINT) AS dfb3
        |FROM documents""".stripMargin)

  val bytesStrMapSql: String =
    """SELECT doc_id,
      |  lower(hex(source)) AS src_hex,
      |  to_base64(encode(source)) AS src_b64,
      |  lang AS lang_rt,
      |  source AS ascii_rt,
      |  CAST(doc_id AS VARCHAR) AS stm_last,
      |  source AS stm_k2,
      |  CAST(2 AS BIGINT) AS stm_size,
      |  'src' || ',' || lang AS rex_all,
      |  strftime(make_date(2024, CAST(doc_id % 9 + 1 AS INT), 11),
      |    '%d/%m/%Y') AS fmt_date,
      |  CAST(date_diff('day', DATE '1970-01-01',
      |    make_date(2024, CAST(doc_id % 9 + 1 AS INT), 11)) AS BIGINT)
      |    AS epoch_days,
      |  CAST(trunc(CAST(doc_id AS DOUBLE) / 7) AS BIGINT) AS trunc0,
      |  CAST(trunc(CAST(3 - doc_id AS DOUBLE) / 7) AS BIGINT) AS trunc_neg,
      |  CAST(round(floor(doc_id / 7.0 * 100) / 100 * 10000) AS BIGINT)
      |    AS trunc2_e4,
      |  ('0x' || lpad(CAST(doc_id AS VARCHAR), 8, '0'))::BIGINT AS ifb,
      |  CAST(doc_id * 3 AS BIGINT) AS dfb3
      |FROM documents""".stripMargin

  /** The ksql math scalar surface — ABS/CEIL/FLOOR/EXP/LN/POWER/SIGN/
    * SQRT/CBRT/GREATEST/LEAST/ATAN2/ATAN/DEGREES/RADIANS/PI — over
    * events, every libm output rounded onto an integer grid (see the
    * object doc). ksql ROUND's 1-arg BIGINT return types the grid
    * columns on both engines. */
  def mathFuncs(s: SparkSession, d: String): DataFrame =
    run(s, d,
      """SELECT event_id,
        |  CAST(ABS(user_id - 100) AS BIGINT) AS abs_u,
        |  CAST(CEIL(value) AS BIGINT) AS ceil_v,
        |  CAST(FLOOR(value) AS BIGINT) AS floor_v,
        |  ROUND(EXP(CAST(user_id % 5 AS DOUBLE)) * 1000) AS exp_mills,
        |  ROUND(LN(CAST(user_id + 1 AS DOUBLE)) * 1000) AS ln_mills,
        |  CAST(POWER(CAST(user_id % 7 AS DOUBLE), 3.0) AS BIGINT) AS pow3,
        |  CAST(SIGN(value - 50.0) AS BIGINT) AS sgn,
        |  ROUND(SQRT(CAST(user_id AS DOUBLE)) * 1000) AS sqrt_mills,
        |  ROUND(CBRT(CAST(user_id AS DOUBLE)) * 1000) AS cbrt_mills,
        |  CAST(GREATEST(user_id % 7, user_id % 5, 3) AS BIGINT) AS gst,
        |  CAST(LEAST(user_id % 7, user_id % 5, 3) AS BIGINT) AS lst,
        |  ROUND(ATAN2(CAST(user_id % 9 AS DOUBLE), 4.0) * 1000)
        |    AS atan2_mills,
        |  ROUND(DEGREES(ATAN(CAST(user_id % 11 AS DOUBLE))) * 100) AS deg_c,
        |  ROUND(RADIANS(CAST(user_id AS DOUBLE)) * 10000) AS rad_e4,
        |  ROUND(PI() * 10000) AS pi_e4
        |FROM events""".stripMargin)

  val mathFuncsSql: String =
    """SELECT event_id,
      |  CAST(abs(user_id - 100) AS BIGINT) AS abs_u,
      |  CAST(ceil(value) AS BIGINT) AS ceil_v,
      |  CAST(floor(value) AS BIGINT) AS floor_v,
      |  CAST(round(exp(CAST(user_id % 5 AS DOUBLE)) * 1000) AS BIGINT)
      |    AS exp_mills,
      |  CAST(round(ln(CAST(user_id + 1 AS DOUBLE)) * 1000) AS BIGINT)
      |    AS ln_mills,
      |  CAST(power(CAST(user_id % 7 AS DOUBLE), 3.0) AS BIGINT) AS pow3,
      |  CAST(sign(value - 50.0) AS BIGINT) AS sgn,
      |  CAST(round(sqrt(CAST(user_id AS DOUBLE)) * 1000) AS BIGINT)
      |    AS sqrt_mills,
      |  CAST(round(cbrt(CAST(user_id AS DOUBLE)) * 1000) AS BIGINT)
      |    AS cbrt_mills,
      |  CAST(greatest(user_id % 7, user_id % 5, 3) AS BIGINT) AS gst,
      |  CAST(least(user_id % 7, user_id % 5, 3) AS BIGINT) AS lst,
      |  CAST(round(atan2(CAST(user_id % 9 AS DOUBLE), 4.0) * 1000)
      |    AS BIGINT) AS atan2_mills,
      |  CAST(round(degrees(atan(CAST(user_id % 11 AS DOUBLE))) * 100)
      |    AS BIGINT) AS deg_c,
      |  CAST(round(radians(CAST(user_id AS DOUBLE)) * 10000) AS BIGINT)
      |    AS rad_e4,
      |  CAST(round(pi() * 10000) AS BIGINT) AS pi_e4
      |FROM events""".stripMargin

  /** The shared-name string scalars a ported statement leans on —
    * CONCAT_WS / INITCAP / LPAD / RPAD / TRIM / REPLACE /
    * REGEXP_REPLACE (global in both ksql and Spark; DuckDB needs the
    * 'g' flag) / UCASE / LCASE — semantics identical between ksql and
    * Spark's namesakes, pinned here so the equivalence is a verified
    * fact rather than an assumption (DuckDB lacks initcap, so the
    * oracle spells it algebraically over the known token shapes). */
  def stringFuncs(s: SparkSession, d: String): DataFrame =
    run(s, d,
      """SELECT doc_id,
        |  CONCAT_WS('-', source, lang, CAST(doc_id AS STRING)) AS cw,
        |  INITCAP(CONCAT(lang, ' ', source)) AS ic,
        |  LPAD(source, 8, '*') AS lp,
        |  RPAD(lang, 5, '.') AS rp,
        |  TRIM(CONCAT('  ', source, '  ')) AS tr,
        |  REPLACE(source, 'src', 'origin_') AS rep,
        |  REGEXP_REPLACE(source, '[0-9]', '#') AS rr,
        |  UCASE(lang) AS uc,
        |  LCASE(CONCAT(UCASE(source), 'X')) AS lc
        |FROM documents""".stripMargin)

  val stringFuncsSql: String =
    """SELECT doc_id,
      |  source || '-' || lang || '-' || CAST(doc_id AS VARCHAR) AS cw,
      |  upper(substr(lang, 1, 1)) || substr(lang, 2) || ' Src' ||
      |    substr(source, 4) AS ic,
      |  lpad(source, 8, '*') AS lp,
      |  rpad(lang, 5, '.') AS rp,
      |  source AS tr,
      |  'origin_' || substr(source, 4) AS rep,
      |  regexp_replace(source, '[0-9]', '#', 'g') AS rr,
      |  upper(lang) AS uc,
      |  lower(upper(source)) || 'x' AS lc
      |FROM documents""".stripMargin

  /** ksql CAST fidelity — the Java error model the dialect executor
    * scopes in (legacy eval mode): a failed string parse yields NULL
    * (ANSI would throw CAST_INVALID_INPUT and kill the persistent
    * query a ksql user expects to keep running), a narrowing overflow
    * WRAPS (ksqlDB's SqlCasts call .intValue()), and double→int
    * truncates toward zero (DuckDB's cast ROUNDS, so the oracle
    * spells the expected values algebraically). */
  def castFidelity(s: SparkSession, d: String): DataFrame =
    run(s, d,
      """SELECT doc_id,
        |  CAST(CAST(CONCAT('x', lang) AS INT) AS BIGINT) AS bad_int,
        |  CAST(CAST('12' AS INT) + doc_id AS BIGINT) AS good_int,
        |  CAST(CAST(2147483647 + doc_id + 1 AS INT) AS BIGINT) AS wrapped,
        |  CAST(CAST(CAST(4.9 AS DOUBLE) + doc_id AS INT) AS BIGINT)
        |    AS trunc_d
        |FROM documents""".stripMargin)

  val castFidelitySql: String =
    """SELECT doc_id,
      |  CAST(NULL AS BIGINT) AS bad_int,
      |  CAST(12 + doc_id AS BIGINT) AS good_int,
      |  CAST(doc_id - 2147483648 AS BIGINT) AS wrapped,
      |  CAST(doc_id + 4 AS BIGINT) AS trunc_d
      |FROM documents""".stripMargin

  /** JSON_RECORDS (map of keys → SERIALIZED-JSON values — quotes and
    * braces intact, which no get_json_object composition reproduces)
    * and JSON_CONCAT (object merge right-wins / array concat / mixed
    * kinds wrap non-arrays into 1-element arrays, PG `||` style), the
    * two Jackson-backed native expressions
    * ([[graft.functions.JsonRecords]], [[graft.functions.JsonConcat]]),
    * end-to-end through the dialect over the events props column. */
  def jsonRecords(s: SparkSession, d: String): DataFrame =
    run(s, d,
      """SELECT event_id,
        |  ELEMENT_AT(JSON_RECORDS(props), 'k') AS rec_k,
        |  CAST(CARDINALITY(JSON_RECORDS(props)) AS BIGINT) AS n_rec,
        |  ELEMENT_AT(JSON_RECORDS(JSON_CONCAT(props,
        |    CONCAT('{"u":', CAST(user_id AS STRING), ',"k":-1}'))), 'k')
        |    AS k_after,
        |  ELEMENT_AT(JSON_RECORDS(JSON_CONCAT(props,
        |    CONCAT('{"u":"', CAST(user_id AS STRING), '"}'))), 'u')
        |    AS rec_u,
        |  JSON_CONCAT('[1,2]', CONCAT('[', CAST(user_id AS STRING), ']'))
        |    AS arr_cat,
        |  JSON_CONCAT(props, '[1]') AS mixed_wrap
        |FROM events""".stripMargin)

  val jsonRecordsSql: String =
    """SELECT event_id,
      |  CAST(json_extract(props, '$.k') AS VARCHAR) AS rec_k,
      |  CAST(1 AS BIGINT) AS n_rec,
      |  '-1' AS k_after,
      |  '"' || CAST(user_id AS VARCHAR) || '"' AS rec_u,
      |  '[1,2,' || CAST(user_id AS VARCHAR) || ']' AS arr_cat,
      |  '[{"k":' || CAST(json_extract(props, '$.k') AS VARCHAR)
      |    || '},1]' AS mixed_wrap
      |FROM events""".stripMargin

  /** The ksql `TIME` type surface ([[graft.functions.TimeCompat]]):
    * `PARSE_TIME` → INT millis-of-day (the Connect wire format,
    * `org.apache.kafka.connect.data.Time`), `FORMAT_TIME` back to
    * string, and the NULL-on-error model on BOTH sides — invalid
    * clock values, date-bearing patterns (the r11 uncaught-
    * DateTimeException edge), and out-of-range millis all yield NULL
    * without killing the query. The oracle spells millis-of-day as
    * plain integer arithmetic. */
  def timeType(s: SparkSession, d: String): DataFrame =
    run(s, d,
      """SELECT doc_id,
        |  PARSE_TIME(CONCAT(LPAD(CAST(doc_id % 24 AS STRING), 2, '0'), ':',
        |                    LPAD(CAST(doc_id % 60 AS STRING), 2, '0'), ':',
        |                    LPAD(CAST((doc_id * 7) % 60 AS STRING), 2, '0')),
        |             'HH:mm:ss') AS t_ms,
        |  FORMAT_TIME(CAST((doc_id * 9973) % 86400000 AS INT),
        |              'HH:mm:ss') AS t_str,
        |  FORMAT_TIME(PARSE_TIME('23:59:59', 'HH:mm:ss'),
        |              'HH:mm:ss') AS rt_max,
        |  FORMAT_TIME(CAST(0 AS INT), 'HH:mm:ss') AS rt_midnight,
        |  PARSE_TIME('25:00:00', 'HH:mm:ss') AS bad_hour,
        |  PARSE_TIME('2020-01-01', 'yyyy-MM-dd') AS datey_parse,
        |  FORMAT_TIME(CAST(-1 AS INT), 'HH:mm:ss') AS neg_ms,
        |  FORMAT_TIME(CAST(86400000 AS INT), 'HH:mm:ss') AS over_ms,
        |  FORMAT_TIME(CAST(doc_id % 1000 AS INT), 'yyyy-MM-dd') AS datey_fmt
        |FROM documents""".stripMargin)

  val timeTypeSql: String =
    """SELECT doc_id,
      |  CAST((doc_id % 24) * 3600000 + (doc_id % 60) * 60000
      |       + ((doc_id * 7) % 60) * 1000 AS INTEGER) AS t_ms,
      |  lpad(CAST(((doc_id * 9973) % 86400000) // 3600000 AS VARCHAR),
      |       2, '0') || ':' ||
      |  lpad(CAST((((doc_id * 9973) % 86400000) // 60000) % 60 AS VARCHAR),
      |       2, '0') || ':' ||
      |  lpad(CAST((((doc_id * 9973) % 86400000) // 1000) % 60 AS VARCHAR),
      |       2, '0') AS t_str,
      |  '23:59:59' AS rt_max,
      |  '00:00:00' AS rt_midnight,
      |  CAST(NULL AS INTEGER) AS bad_hour,
      |  CAST(NULL AS INTEGER) AS datey_parse,
      |  CAST(NULL AS VARCHAR) AS neg_ms,
      |  CAST(NULL AS VARCHAR) AS over_ms,
      |  CAST(NULL AS VARCHAR) AS datey_fmt
      |FROM documents""".stripMargin

  /** `JSON_ITEMS` ([[graft.functions.JsonItems]] — array elements in
    * SERIALIZED-JSON form, quotes/braces intact; non-array → NULL) and
    * `URL_EXTRACT_PARAMETER` (named query-string parameter,
    * percent-DECODED as ksql's URI.getQuery-based extraction yields;
    * absent parameter → NULL), end-to-end through the dialect. The
    * inputs are constructed from columns so the oracle can spell every
    * expected value algebraically — no JSON/URL library needed on the
    * DuckDB side. */
  def jsonItemsUrl(s: SparkSession, d: String): DataFrame =
    run(s, d,
      """SELECT doc_id,
        |  ARRAY_JOIN(JSON_ITEMS(CONCAT('[', CAST(doc_id AS STRING), ',"',
        |    lang, '",{"a":', CAST(doc_id % 7 AS STRING), '},null]')), '|')
        |    AS items,
        |  CAST(ARRAY_LENGTH(JSON_ITEMS(CONCAT('[', CAST(doc_id AS STRING),
        |    ',[1,2],true]'))) AS BIGINT) AS n_items,
        |  ARRAY_JOIN(JSON_ITEMS(CONCAT('{"a":', CAST(doc_id AS STRING),
        |    '}'))) AS non_array,
        |  ARRAY_JOIN(JSON_ITEMS(CONCAT('[', lang))) AS invalid_json,
        |  URL_EXTRACT_PARAMETER(CONCAT('https://ex.com/p/', source,
        |    '?lang=', lang, '&id=', CAST(doc_id AS STRING),
        |    '&tag=a%20b'), 'lang') AS p_lang,
        |  URL_EXTRACT_PARAMETER(CONCAT('https://ex.com/p/', source,
        |    '?lang=', lang, '&id=', CAST(doc_id AS STRING),
        |    '&tag=a%20b'), 'id') AS p_id,
        |  URL_EXTRACT_PARAMETER(CONCAT('https://ex.com/p/', source,
        |    '?lang=', lang, '&id=', CAST(doc_id AS STRING),
        |    '&tag=a%20b'), 'tag') AS p_tag_decoded,
        |  URL_EXTRACT_PARAMETER(CONCAT('https://ex.com/p/', source,
        |    '?lang=', lang), 'missing') AS p_missing
        |FROM documents""".stripMargin)

  val jsonItemsUrlSql: String =
    """SELECT doc_id,
      |  CAST(doc_id AS VARCHAR) || '|"' || lang || '"|{"a":' ||
      |    CAST(doc_id % 7 AS VARCHAR) || '}|null' AS items,
      |  CAST(3 AS BIGINT) AS n_items,
      |  CAST(NULL AS VARCHAR) AS non_array,
      |  CAST(NULL AS VARCHAR) AS invalid_json,
      |  lang AS p_lang,
      |  CAST(doc_id AS VARCHAR) AS p_id,
      |  'a b' AS p_tag_decoded,
      |  CAST(NULL AS VARCHAR) AS p_missing
      |FROM documents""".stripMargin

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ksql_json_items_url" -> jsonItemsUrl _,
    "q_ksql_time_type" -> timeType _,
    "q_ksql_json_records" -> jsonRecords _,
    "q_ksql_cast_fidelity" -> castFidelity _,
    "q_ksql_array_ops" -> arrayOps _,
    "q_ksql_bytes_strmap" -> bytesStrMap _,
    "q_ksql_math_funcs" -> mathFuncs _,
    "q_ksql_string_funcs" -> stringFuncs _)

  def oracles: Map[String, String] = Map(
    "q_ksql_json_items_url" -> jsonItemsUrlSql,
    "q_ksql_time_type" -> timeTypeSql,
    "q_ksql_json_records" -> jsonRecordsSql,
    "q_ksql_cast_fidelity" -> castFidelitySql,
    "q_ksql_array_ops" -> arrayOpsSql,
    "q_ksql_bytes_strmap" -> bytesStrMapSql,
    "q_ksql_math_funcs" -> mathFuncsSql,
    "q_ksql_string_funcs" -> stringFuncsSql)
}
