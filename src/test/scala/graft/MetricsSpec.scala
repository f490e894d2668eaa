package graft

import org.apache.spark.sql.functions._
import graft.ops.Metrics

/** Quantitative scale assertions: the shuffle-volume claims the plan
  * audits make structurally, measured in actual bytes moved.
  */
class MetricsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.01"

  private def run(name: String): Metrics.Report =
    Metrics.measure(spark) {
      SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
    }._2

  test("broadcast join moves an order of magnitude less shuffle than SMJ") {
    val broadcastJoin = run("q_join_broadcast")
    // same fact table forced through a shuffle join
    val (_, shuffled) = Metrics.measure(spark) {
      val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val li = Tables.lineitem(spark, d)
        val o = Tables.orders(spark, d)
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)))
          .write.format("noop").mode("overwrite").save()
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    }
    assert(shuffled.shuffleWriteBytes > 0)
    assert(broadcastJoin.shuffleWriteBytes * 10 < shuffled.shuffleWriteBytes,
      s"broadcast=${broadcastJoin.shuffleWriteBytes} " +
        s"shuffled=${shuffled.shuffleWriteBytes}")
  }

  test("map-only signing shuffles only the result relation") {
    val nDocs = Tables.documents(spark, d).count() // 500 at sf0.01
    val r = run("q_dedup_simhash")
    // the native simhash16 signs inside the scan stage; the only
    // shuffled rows are the final full-key sort of the per-doc result —
    // an agg- or explode-shaped plan would shuffle tokens or partial
    // mins, tens of rows per document
    assert(r.shuffleWriteRecords <= 2 * nDocs,
      s"records=${r.shuffleWriteRecords} docs=$nDocs")
  }

  test("LSH signature pipeline shuffles signatures, never documents") {
    val r = run("q_dedup_lsh_buckets")
    assert(r.shuffleWriteRecords > 0)
    // mean document text is ~300 chars; a shuffled (band_key, count)
    // or signature row serializes to well under half that. If full
    // texts ever leak into the shuffle this blows past the bound.
    val bytesPerRecord = r.shuffleWriteBytes / r.shuffleWriteRecords
    assert(bytesPerRecord < 150,
      s"bytes/record=$bytesPerRecord (total=${r.shuffleWriteBytes} " +
        s"records=${r.shuffleWriteRecords})")
  }
}
