package graft

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, TimestampNTZType, TimestampType}

/** Readers for the driver test tables (TESTDATA.md) plus shared
  * determinism helpers used by every verify query.
  *
  * Determinism rules (SURVEY.md §7): the driver hash-compares our parquet
  * dump against DuckDB, so every query must (a) end in a full-key ORDER BY,
  * (b) aggregate doubles through exact decimal arithmetic (summation order
  * independent), and (c) emit timestamps as epoch micros or canonical
  * strings, never raw sub-second timestamps.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** events.ts has shipped in two parquet physical types across testdata
    * generations: TIMESTAMP(NANOS) (which vanilla Spark rejects — read the
    * nanos as long via the legacy conf, then truncate to a micros
    * TIMESTAMP, exactly DuckDB's TIMESTAMP_NS→TIMESTAMP coercion) and
    * TIMESTAMP(MICROS) (pass through). Branch on the schema actually read
    * so either generation yields the identical micros TIMESTAMP column.
    * A non-UTC-adjusted micros file arrives as TIMESTAMP_NTZ; the session
    * zone is pinned UTC (Graft.configure), so the NTZ→LTZ cast is
    * value-preserving and matches DuckDB's naive read.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    adaptEventsTs(table(s, d, "events"))
  }

  /** ts physical-generation adaptation shared by the batch reader and
    * the streaming drain (`q_stream_drain` readStreams the same parquet
    * with an explicit schema, so the branch must run on whatever type
    * was physically read in both paths).
    */
  def adaptEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType        => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType   => df
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet type $other (expected nanos-long or micros timestamp)")
    }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Exact-arithmetic sum of a double column: cast each value to
    * DECIMAL(18,2) first so the fold is order-independent, then return
    * DOUBLE (matches DuckDB `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`).
    */
  def sumDec(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Order-independent average: exact decimal sum / count, evaluated as
    * one double division (identical in DuckDB). The denominator is
    * count(c) — non-null rows only — so this IS AVG semantics on a
    * nullable column too: sum() skips nulls, and dividing by an
    * all-rows count would silently deflate the average relative to an
    * oracle written with AVG(...).
    */
  def avgDec(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double") / count(c)

  /** Decimal cast shorthand for exact products, e.g. price * (1 - disc). */
  def dec(c: Column, scale: Int = 2): Column = c.cast(DecimalType(18, scale))
}
