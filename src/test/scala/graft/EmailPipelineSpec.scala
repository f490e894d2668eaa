package graft

/** Golden pins for q_email_pipeline — the oracle-gated inline-fixture run
  * of the reference's full transform chain. The DuckDB twin re-derives
  * these values independently; this spec restates the expectations so a
  * plain `sbt test` catches drift without the oracle loop.
  */
class EmailPipelineSpec extends SparkSpec {

  private lazy val rows =
    SparkEntry.queries("q_email_pipeline")(spark, "unused")
      .collect().map(r => r.getString(0) -> r).toMap

  test("fixture produces one row per message") {
    assert(rows.keySet == Set("m1", "m2", "m3", "m4"))
  }

  test("m1: Indeed chain — headers, date comment+zone strip, rtl extract") {
    val r = rows("m1")
    assert(r.getString(2) == "Indeed Application: Data Engineer")
    assert(r.getString(3) == "03/05/24 10:15:30")
    assert(r.getString(4) == "indeedapply@indeed.com")
    assert(r.getString(5) ==
      "Hi,Application submittedData Engineerapplied via Indeed - " +
        "Remote, USGraft Analytics & Co")
    assert(r.getString(6) == "Data Engineer")         // role
    assert(r.getString(7) == "Graft Analytics & Co")  // org (entity decoded)
    assert(r.getString(8) == "Remote, US")            // location
  }

  test("m2: depth-3 pre-order body join, last dup header wins, F4 cleanup") {
    val r = rows("m2")
    assert(r.getString(2) == "Quarterly report v2") // LAST subject match
    assert(r.getString(3) == "03/05/24 10:15:30")   // ISO format parsed
    assert(r.getString(4) == "alice@example.com")
    // chunk order own -> child -> grandchild; newline + e-acute removed
    assert(r.getString(5) ==
      "Team updatenumbers attachedProfit & loss: user@corpcaf summary")
    assert(r.isNullAt(6) && r.isNullAt(7) && r.isNullAt(8))
  }

  test("m3: absent payload is null-safe with empty body") {
    val r = rows("m3")
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
    assert(r.getString(5) == "")
    assert(r.isNullAt(6) && r.isNullAt(7) && r.isNullAt(8))
  }

  test("m4: unparseable date is NULL, script stripped, no extract") {
    val r = rows("m4")
    assert(r.getString(2) == "Status update")
    assert(r.isNullAt(3))
    assert(r.getString(4) == "bob@ex.org")
    assert(r.getString(5) == "Status: ok - donelink")
    assert(r.isNullAt(6) && r.isNullAt(7) && r.isNullAt(8))
  }
}
