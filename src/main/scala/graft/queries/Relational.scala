package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Relational coverage queries (SURVEY.md §2.1–2.7): scans, projections,
  * filters, joins, aggregations, windows, sorts, set ops. Each entry has a
  * DuckDB oracle twin in [[oracle]]; names/aliases match exactly because the
  * driver sorts columns by name before hashing.
  */
object Relational {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1/S4: parquet scan with projection + deterministic order.
    // Filter + projection both push into the parquet reader.
    "q_scan" -> ((s, d) =>
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // P1/P2/S2: pushed-down predicate + computed projection
    // (reference: per-message metadata projection, gmail_functions.py:265-296).
    "q_filter_project" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_returnflag") === "R" && col("l_quantity") > 30)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("net_price"),
          lower(col("l_linestatus")).as("status"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // J1: the reference's dedup anti-join (gmail_functions.py:173-178) —
    // incoming set minus already-seen state, as one distributed left-anti
    // join instead of N+1 point lookups. State side here: customers with
    // recent orders.
    "q_anti_join" -> ((s, d) => {
      val recent = orders(s, d)
        .filter(col("o_orderdate") >= lit("2001-01-01"))
        .select(col("o_custkey"))
      customer(s, d)
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // J2: semi-join (the reference's seen-side probe, gmail_functions.py:175).
    "q_semi_join" -> ((s, d) => {
      val recent = orders(s, d)
        .filter(col("o_orderdate") >= lit("2001-01-01"))
        .select(col("o_custkey"))
      customer(s, d)
        .join(recent, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // A1-analogue flagship: TPC-H-Q1-style group aggregation on lineitem.
    // Exact decimal arithmetic keeps double results order-independent.
    "q_agg_group" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2001-09-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumDec(col("l_quantity")).as("sum_qty"),
          sumDec(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          avgDec(col("l_quantity")).as("avg_qty"),
          avgDec(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")))
  )

  val oracle: Map[String, String] = Map(
    "q_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS net_price,
        |  lower(l_linestatus) AS status
        |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 30
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01')
        |ORDER BY c_custkey""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01')
        |ORDER BY c_custkey""".stripMargin,

    "q_agg_group" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
