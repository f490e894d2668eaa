package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver keeps only the last 2 KB of Bench stdout and parses the JSON
  * line out of that tail — rounds 1-3 shipped a ~5 KB line and the driver
  * recorded parsed:null every round. These specs pin the contract: the
  * rendered headline line must stay under [[Bench.MaxStdoutLineBytes]] even
  * in the worst case (every query present, maximum-width timings, a
  * catastrophic all-queries-failed run), so adding a query can never
  * silently overflow the window again.
  */
class BenchLineSpec extends AnyFunSuite {

  private def worstCase(err: Option[String]) =
    SparkEntry.queries.keys.toSeq.sorted.map { n =>
      // 99999.999 s is wider than any plausible local timing renders
      n -> (99999.999, err)
    }

  test("worst-case all-green line fits the driver tail window") {
    val line = Bench.headlineLine(worstCase(None), "/root/testdata/sf0.1")
    assert(line.getBytes("UTF-8").length <= Bench.MaxStdoutLineBytes,
      s"line is ${line.getBytes("UTF-8").length} bytes:\n$line")
    assert(!line.contains("\n") && !line.contains("\r"))
  }

  test("catastrophic all-failed line still fits (errors capped inline)") {
    // once() truncates messages at 200 chars; class names are shorter
    // than 60 — build the widest error the bench can actually emit
    val err = Some(("VeryLongSparkExceptionClassNameXYZ" * 2) + ": " + ("x" * 200))
    val line = Bench.headlineLine(worstCase(err), "/root/testdata/sf0.1")
    assert(line.getBytes("UTF-8").length <= Bench.MaxStdoutLineBytes,
      s"line is ${line.getBytes("UTF-8").length} bytes:\n$line")
    assert(line.contains("\"n_errors\":" + SparkEntry.queries.size))
  }

  test("all-failed line with multi-byte error text fits (byte-budgeted)") {
    // Error messages can quote corpus text: CJK renders 3 bytes per
    // char and passes through the escape unchanged, so the error
    // budget must count UTF-8 bytes, not chars — a char-counted budget
    // let three such errors blow the tail window.
    val err = Some("AnalysisException: " + ("文字化け" * 50))
    val line = Bench.headlineLine(worstCase(err), "/root/testdata/sf0.1")
    assert(line.getBytes("UTF-8").length <= Bench.MaxStdoutLineBytes,
      s"line is ${line.getBytes("UTF-8").length} bytes:\n$line")
  }

  test("sf dir with JSON-hostile chars renders an escaped, parseable line") {
    val line = Bench.headlineLine(worstCase(None), "/tmp/we\"ird\\dir")
    assert(line.contains("\"sf\":\"/tmp/we\\\"ird\\\\dir\""))
  }

  test("headline names all exist in the query registry") {
    val missing = Bench.Headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headline references unknown queries: $missing")
  }

  test("detail line carries every query") {
    val detail = Bench.detailLine(worstCase(None), "sf")
    SparkEntry.queries.keys.foreach(n => assert(detail.contains("\"" + n + "\"")))
  }
}
