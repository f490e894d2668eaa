package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Scalar-function coverage (SURVEY.md §2.8): string, date, math, array,
  * map, json, base64, html-strip — every scalar family the reference's
  * transform touches, expressed as codegen'd built-ins (no UDFs).
  *
  * Where the test tables lack the reference's exact input shape (e.g.
  * `Name <addr>` from-headers, HTML bodies), the query synthesizes the
  * shape from table columns first — deterministic on both engines — and
  * then applies the same extraction the pipeline operator uses.
  */
object Scalar {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Native html_to_text expression end-to-end. General HTML semantics
    // aren't portable SQL (unit parity lives in FunctionsSpec), but on
    // THIS synthesized input the spec'd pipeline (script-drop, tag-split,
    // per-node trim, ''-join, entity decode) reduces to
    // trim(substring(text,1,40)) || '&tail' — which the oracle states,
    // so the native expression is hash-verified against DuckDB too.
    "q_html_native" -> ((s, d) =>
      documents(s, d)
        .withColumn("html",
          concat(lit("<html><body><p> "), substring(col("text"), 1, 40),
            lit(" </p><script>drop()</script>&amp;tail</body></html>")))
        .select(col("doc_id"),
          graft.functions.HtmlToText(col("html")).as("clean"))
        .orderBy(col("doc_id"))),

    // F5/F6/F10: case mapping, from-address parse
    // (gmail_functions.py:271-283), containment.
    // Error-tolerant casts (the reference's blanket try/except as
    // engine semantics): malformed input yields NULL, never a task
    // failure — one poison record must not kill a 100 TB job.
    "q_try_cast" -> ((s, d) => {
      // try_cast's failure path is exception-driven — on a
      // malformed-heavy column every bad row pays a thrown-and-caught
      // NumberFormatException per cast (~2x wall-clock on this data).
      // A SOUND invalidity guard (empty, or any character that can
      // never appear in a numeric literal) short-circuits those rows
      // to NULL without attempting the parse, and the residue still
      // gets full try_cast behavior (overflow, exotic forms). The
      // letter test alone is NOT sound: both Spark's cast and DuckDB's
      // TRY_CAST parse the float special literals 'inf'/'Infinity'/
      // 'NaN' (any case, optional sign), which are all letters — so
      // those are carved out of the guard rather than nulled. With the
      // carve-out, every guarded string is one both engines null.
      def certainlyBad(c: Column) =
        (c === "" || c.rlike("[^0-9eE+\\-. \\t]")) &&
          !c.rlike("(?i)^\\s*[+-]?(inf(inity)?|nan)\\s*$")
      orders(s, d)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 3 === 0, col("o_orderkey").cast("string"))
            .when(col("o_orderkey") % 3 === 1,
              concat(lit("x"), col("o_orderkey").cast("string")))
            .otherwise(lit("")).as("s"))
        .select(col("o_orderkey"), col("s"),
          when(certainlyBad(col("s")), lit(null).cast("long"))
            .otherwise(expr("try_cast(s AS BIGINT)")).as("parsed"),
          when(certainlyBad(col("s")), lit(null).cast("double"))
            .otherwise(expr("try_cast(s AS DOUBLE)")).as("parsed_d"),
          try_divide(col("o_orderkey"), col("o_orderkey") % 3).as("divd"))
        .orderBy(col("o_orderkey"))
    }),

    // Bitwise scalars (key packing / flag masks — e.g. the (key, salt)
    // and band-id encodings the dedup pipelines use).
    "q_bitwise" -> ((s, d) =>
      orders(s, d)
        .select(col("o_orderkey"),
          col("o_orderkey").bitwiseAND(255L).as("band"),
          col("o_orderkey").bitwiseOR(4096L).as("tagged"),
          col("o_orderkey").bitwiseXOR(col("o_custkey")).as("mixed"),
          shiftleft(col("o_orderkey"), 4).as("shifted"),
          shiftright(col("o_orderkey"), 2).as("unshifted"))
        .orderBy(col("o_orderkey"))),

    "q_string_funcs" -> ((s, d) =>
      customer(s, d)
        .withColumn("email",
          concat(col("c_name"), lit(" <cust"), col("c_custkey"),
            lit("@mail.example>")))
        .select(
          col("c_custkey"),
          lower(col("c_name")).as("lo_name"),
          upper(col("c_mktsegment")).as("up_seg"),
          length(col("c_name")).cast("long").as("name_len"),
          substring(col("c_name"), 1, 8).as("name_pfx"),
          regexp_extract(col("email"), "<([^>]*)>", 1).as("from_addr"),
          instr(col("c_name"), "1").cast("long").as("pos1"),
          when(col("c_name").contains("0"), 1L).otherwise(0L).as("has0"))
        .orderBy(col("c_custkey"))),

    // F9: delimiter field split + positional pick (gmail_functions.py:219).
    "q_split_index" -> ((s, d) =>
      documents(s, d)
        .select(
          col("doc_id"),
          element_at(split(col("text"), " "), 1).as("tok1"),
          element_at(split(col("text"), " "), 2).as("tok2"),
          element_at(split(col("text"), " "), -1).as("tok_last"),
          size(split(col("text"), " ")).cast("long").as("n_toks"))
        .orderBy(col("doc_id"))),

    // Array-function family over the token array (portable twins:
    // array_position is 0-when-missing in Spark, NULL in DuckDB —
    // coalesced on the oracle side).
    "q_array_funcs" -> ((s, d) => {
      val arr = slice(split(col("text"), " "), 1, 6)
      documents(s, d)
        .select(col("doc_id"),
          array_contains(arr, "the").as("has_the"),
          array_position(arr, "the").cast("long").as("pos_the"),
          size(array_distinct(arr)).cast("long").as("n_distinct"),
          array_join(array_sort(arr), ",").as("sorted_csv"),
          arrays_overlap(arr, array(lit("data"), lit("table")))
            .as("overlaps"),
          array_join(array_remove(arr, "the"), ",").as("no_the"))
        .orderBy(col("doc_id"))
    }),

    // F7/F8: date parts, truncation, canonical formatting
    // (gmail_functions.py:274-278).
    "q_date_funcs" -> ((s, d) =>
      orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofmonth(col("o_orderdate")).cast("long").as("dy"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("d_str"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
            .as("month_start"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("epoch_us"))
        .orderBy(col("o_orderkey"))),

    // F7 extension: date arithmetic (month-end-clamping add_months, day
    // offsets, day diffs — identical calendar semantics both engines).
    "q_date_arith" -> ((s, d) =>
      orders(s, d)
        .select(
          col("o_orderkey"),
          date_format(add_months(col("o_orderdate").cast("date"), 2),
            "yyyy-MM-dd").as("plus2m"),
          date_format(date_add(col("o_orderdate").cast("date"), 30),
            "yyyy-MM-dd").as("plus30d"),
          datediff(lit("2024-01-01").cast("date"),
            col("o_orderdate").cast("date")).cast("long").as("days_to_2024"))
        .orderBy(col("o_orderkey"))),

    // F1 (shallow twin): JSON path extract on the events props column —
    // both get_json_object and the schema'd from_json path.
    "q_json_get" -> ((s, d) =>
      events(s, d)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_get"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
            .getField("k").as("k_struct"))
        .orderBy(col("event_id"))),

    // F2: base64 encode/decode roundtrip (urlsafe variant is exercised in
    // the EmailOps unit tests; std alphabet here for DuckDB parity).
    "q_base64" -> ((s, d) =>
      documents(s, d)
        .select(
          col("doc_id"),
          base64(encode(substring(col("text"), 1, 32), "UTF-8")).as("b64"),
          decode(unbase64(base64(encode(substring(col("text"), 1, 32),
            "UTF-8"))), "UTF-8").as("roundtrip"))
        .orderBy(col("doc_id"))),

    // F3/F4: HTML strip + entity + CR/LF cleanup (gmail_functions.py:294-295)
    // over synthesized HTML.
    "q_html_strip" -> ((s, d) =>
      documents(s, d)
        .withColumn("html",
          concat(lit("<div><p class=\"x\">"), substring(col("text"), 1, 40),
            lit("</p>&nbsp;<br/></div>\r\n")))
        .select(
          col("doc_id"),
          regexp_replace(
            regexp_replace(
              regexp_replace(col("html"), "<[^>]*>", ""),
              "&nbsp;", " "),
            "[\\r\\n]", "").as("clean"))
        .orderBy(col("doc_id"))),

    // F11: JSON serialize (gmail_functions.py:129).
    "q_to_json" -> ((s, d) =>
      orders(s, d)
        .select(
          col("o_orderkey"),
          to_json(struct(col("o_orderkey").as("id"),
            col("o_orderstatus").as("st"))).as("js"))
        .orderBy(col("o_orderkey"))),

    // P2: header-map build + lookup (map_from_entries + element_at), the
    // Spark form of the reference's header scan (gmail_functions.py:270-283).
    "q_map_extract" -> ((s, d) =>
      orders(s, d)
        .withColumn("hmap", map_from_entries(array(
          struct(lit("status").as("k"), col("o_orderstatus").as("v")),
          struct(lit("prio").as("k"), col("o_orderpriority").as("v")))))
        .select(
          col("o_orderkey"),
          element_at(col("hmap"), "status").as("status"),
          element_at(col("hmap"), "prio").as("prio"),
          size(col("hmap")).cast("long").as("n_keys"))
        .orderBy(col("o_orderkey"))),

    // Math built-ins over lineitem prices.
    "q_math_funcs" -> ((s, d) =>
      lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("abs_d"),
          floor(col("l_extendedprice")).cast("long").as("floor_p"),
          ceil(col("l_extendedprice")).cast("long").as("ceil_p"),
          round(sqrt(col("l_extendedprice")), 4).as("sqrt_p"),
          pow(col("l_quantity"), 2).as("qty_sq"),
          (col("l_linenumber") % 3).cast("long").as("mod3"),
          greatest(col("l_tax"), col("l_discount")).as("max_rate"))
        // FULL-output order (see q_scan): floor_p/ceil_p are pinned only
        // to 4-decimal granularity by sqrt_p, so omitting them leaves a
        // legal tie where the two engines could order value-distinct
        // rows differently
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("abs_d"),
          col("floor_p"), col("ceil_p"), col("sqrt_p"), col("qty_sq"),
          col("max_rate")))
  )

  val oracle: Map[String, String] = Map(
    "q_try_cast" ->
      """SELECT o_orderkey, s,
        |  TRY_CAST(s AS BIGINT) AS parsed,
        |  TRY_CAST(s AS DOUBLE) AS parsed_d,
        |  o_orderkey / NULLIF(o_orderkey % 3, 0) AS divd
        |FROM (SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 3 = 0 THEN CAST(o_orderkey AS VARCHAR)
        |         WHEN o_orderkey % 3 = 1 THEN 'x' || CAST(o_orderkey AS VARCHAR)
        |         ELSE '' END AS s
        |  FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "q_bitwise" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS band,
        |  o_orderkey | 4096 AS tagged,
        |  xor(o_orderkey, o_custkey) AS mixed,
        |  o_orderkey << 4 AS shifted,
        |  o_orderkey >> 2 AS unshifted
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_string_funcs" ->
      """SELECT c_custkey, lower(c_name) AS lo_name, upper(c_mktsegment) AS up_seg,
        |  length(c_name) AS name_len, substring(c_name, 1, 8) AS name_pfx,
        |  regexp_extract(c_name || ' <cust' || c_custkey || '@mail.example>',
        |    '<([^>]*)>', 1) AS from_addr,
        |  strpos(c_name, '1') AS pos1,
        |  CASE WHEN contains(c_name, '0') THEN 1 ELSE 0 END AS has0
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_split_index" ->
      """SELECT doc_id, string_split(text, ' ')[1] AS tok1,
        |  string_split(text, ' ')[2] AS tok2,
        |  string_split(text, ' ')[-1] AS tok_last,
        |  len(string_split(text, ' ')) AS n_toks
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_array_funcs" ->
      """SELECT doc_id,
        |  list_contains(arr, 'the') AS has_the,
        |  CAST(coalesce(list_position(arr, 'the'), 0) AS BIGINT) AS pos_the,
        |  CAST(len(list_distinct(arr)) AS BIGINT) AS n_distinct,
        |  array_to_string(list_sort(arr), ',') AS sorted_csv,
        |  len(list_intersect(arr, ['data', 'table'])) > 0 AS overlaps,
        |  array_to_string(list_filter(arr, x -> x != 'the'), ',') AS no_the
        |FROM (SELECT doc_id, string_split(text, ' ')[1:6] AS arr FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  EXTRACT(year FROM o_orderdate) AS yr,
        |  EXTRACT(month FROM o_orderdate) AS mo,
        |  EXTRACT(day FROM o_orderdate) AS dy,
        |  strftime(o_orderdate, '%Y-%m-%d') AS d_str,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  epoch_us(o_orderdate) AS epoch_us
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_date_arith" ->
      """SELECT o_orderkey,
        |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus2m,
        |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30d,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2024-01-01') AS BIGINT) AS days_to_2024
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_json_get" ->
      """SELECT event_id,
        |  CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k_get,
        |  CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k_struct
        |FROM events ORDER BY event_id""".stripMargin,

    "q_base64" ->
      """SELECT doc_id, to_base64(encode(substring(text, 1, 32))) AS b64,
        |  substring(text, 1, 32) AS roundtrip
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_html_native" ->
      """SELECT doc_id, trim(substring(text, 1, 40)) || '&tail' AS clean
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_html_strip" ->
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(
        |        '<div><p class="x">' || substring(text, 1, 40)
        |          || '</p>&nbsp;<br/></div>' || chr(13) || chr(10),
        |        '<[^>]*>', '', 'g'),
        |      '&nbsp;', ' ', 'g'),
        |    '[\r\n]', '', 'g') AS clean
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_to_json" ->
      """SELECT o_orderkey,
        |  CAST(to_json(struct_pack(id := o_orderkey, st := o_orderstatus)) AS VARCHAR) AS js
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_map_extract" ->
      """SELECT o_orderkey, o_orderstatus AS status, o_orderpriority AS prio,
        |  2 AS n_keys
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_discount - 0.05) AS abs_d,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS floor_p,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_p,
        |  round(sqrt(l_extendedprice), 4) AS sqrt_p,
        |  pow(l_quantity, 2) AS qty_sq,
        |  l_linenumber % 3 AS mod3,
        |  greatest(l_tax, l_discount) AS max_rate
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, abs_d, floor_p, ceil_p,
        |  sqrt_p, qty_sq, max_rate""".stripMargin
  )
}
