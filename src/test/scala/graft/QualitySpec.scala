package graft

import org.apache.spark.sql.functions._
import graft.ops.Quality

/** Unit semantics of the declarative data-quality gate: clean data
  * passes every check, and each violation kind is attributed to exactly
  * its own check.
  */
class QualitySpec extends SparkSpec {
  import Quality._

  private val d = "/root/testdata/sf0.001"

  test("clean data passes every check") {
    val o = Tables.orders(spark, d)
    val rows = Quality.audit(o, Seq(
      NotNull("o_custkey"),
      InRange("o_totalprice", 0.0, 1e9),
      InSet("o_orderstatus", Seq("O", "F", "P")),
      Unique(Seq("o_orderkey")),
      RefIntegrity("o_custkey", Tables.customer(spark, d), "c_custkey")))
      .collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getBoolean(2)), rows.mkString("; "))
    assert(rows.forall(_.getLong(1) == 0L))
  }

  test("an empty table audits as zero violations, pass=true") {
    // sum() over zero rows is null; uncoalesced, an empty batch used
    // to report violations=null / pass=null — a gate on pass===false
    // AND a gate on pass===true would both wave it through/block it
    val empty = Tables.orders(spark, d).filter(lit(false))
    val rows = Quality.audit(empty, Seq(
      NotNull("o_custkey"),
      InRange("o_totalprice", 0.0, 1e9),
      Unique(Seq("o_orderkey")))).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(!r.isNullAt(1) && r.getLong(1) == 0L, r.toString)
      assert(!r.isNullAt(2) && r.getBoolean(2), r.toString)
    }
  }

  test("each violation kind lands on exactly its own check") {
    import spark.implicits._
    val base = Seq(
      (1L, Some(10L), 5.0, "O"),
      (2L, None, 6.0, "F"),      // null key
      (3L, Some(11L), -1.0, "O"),  // out of range
      (4L, Some(12L), 7.0, "Z"),   // out of set
      (4L, Some(12L), 7.0, "Z"),   // duplicate id (and a 2nd Z)
      (5L, Some(99L), 8.0, "P"))   // orphan FK
      .toDF("id", "k", "v", "s")
      .withColumn("k", col("k").cast("long"))
    val dim = Seq(10L, 11L, 12L).toDF("dk")
    val got = Quality.audit(base, Seq(
      NotNull("k"), InRange("v", 0.0, 100.0), InSet("s", Seq("O", "F", "P")),
      Unique(Seq("id")), RefIntegrity("k", dim, "dk")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("not_null(k)") == 1)
    assert(got("in_range(v)") == 1)
    assert(got("in_set(s)") == 2)
    assert(got("unique(id)") == 1)
    assert(got("ref(k)") == 1)
  }

  test("empty and duplicate-name check lists fail fast with clear errors") {
    import spark.implicits._
    val df = Seq((1L, 2.0)).toDF("id", "v")
    val e1 = intercept[IllegalArgumentException](Quality.audit(df, Seq.empty))
    assert(e1.getMessage.contains("non-empty"))
    // two InRange on one column render the same name — previously a
    // duplicate map() key throwing deep inside Spark at collect time
    val e2 = intercept[IllegalArgumentException](Quality.audit(df,
      Seq(InRange("v", 0.0, 1.0), InRange("v", 2.0, 3.0))))
    assert(e2.getMessage.contains("in_range(v)"))
  }
}
