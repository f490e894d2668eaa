package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the three connector edge-case fixes from the round-5 review, unit
  * level (this spec lives in graft.sources to reach the private classes):
  *
  *  1. the micro-batch stream advances by the ENGINE-passed ReadLimit
  *     (which may be tighter than its own maxPerTrigger), composite
  *     limits taking the minimum;
  *  2. a corrupt checkpoint offset past the Int-indexed listing range
  *     fails loudly instead of silently truncating through `.toInt`;
  *  3. a runtime `In("id", ...)` filter containing any non-String value
  *     is skipped wholesale — a lossy String-only subset would wrongly
  *     drop rows the non-String values would have kept.
  */
class ConnectorEdgeSpec extends AnyFunSuite {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-edge").toString
    val lines = (1 to 25).map(i => s"""{"id":"${f"m$i%03d"}"}""")
    Files.writeString(Paths.get(d, "messages.jsonl"), lines.mkString("\n") + "\n")
    d
  }

  private def opts = Map(
    "client" -> classOf[FixtureApiClient].getName,
    "path" -> dir, "pageSize" -> "10", "idsPerPartition" -> "8")

  private val schema = StructType(Seq(StructField("id", StringType)))

  private def totalIds(parts: Array[org.apache.spark.sql.connector.read.InputPartition]): Int =
    parts.collect { case p: PagedApiPartition => p.ids.length }.sum

  test("engine ReadLimit tighter than maxPerTrigger caps the batch") {
    val s = new PagedApiMicroBatchStream(opts + ("maxPerTrigger" -> "100"))
    val end = s.latestOffset(PagedApiOffset(0L), ReadLimit.maxRows(3))
    assert(end == PagedApiOffset(3L), s"expected offset 3, got $end")
  }

  test("composite ReadLimit advances by the tightest row cap") {
    val s = new PagedApiMicroBatchStream(opts + ("maxPerTrigger" -> "100"))
    val composite = ReadLimit.compositeLimit(
      Array(ReadLimit.maxRows(7), ReadLimit.maxRows(4)))
    assert(s.latestOffset(PagedApiOffset(0L), composite) == PagedApiOffset(4L))
  }

  test("ReadAllAvailable drains the full listing without Long overflow") {
    val s = new PagedApiMicroBatchStream(opts)
    val end = s.latestOffset(PagedApiOffset(5L), ReadLimit.allAvailable())
    assert(end == PagedApiOffset(25L))
  }

  test("corrupt checkpoint offset past Int range fails loudly, never truncates") {
    val s = new PagedApiMicroBatchStream(opts)
    val e = intercept[IllegalArgumentException] {
      s.planInputPartitions(PagedApiOffset(0L),
        PagedApiOffset(Int.MaxValue.toLong + 7L))
    }
    assert(e.getMessage.contains("exceed"), e.getMessage)
  }

  test("runtime In filter with a non-String value is skipped wholesale") {
    val scan = new PagedApiScan(opts, None, schema)
    scan.filter(Array[sources.Filter](sources.In("id",
      Array[Any]("m001", Integer.valueOf(42)))))
    // the poisoned filter must not shrink the scan at all
    assert(totalIds(scan.planInputPartitions()) == 25)
  }

  test("all-String runtime In filter DOES prune to a keyed lookup") {
    val scan = new PagedApiScan(opts, None, schema)
    scan.filter(Array[sources.Filter](
      sources.In("id", Array[Any]("m001", "m002"))))
    assert(totalIds(scan.planInputPartitions()) == 2)
  }
}
