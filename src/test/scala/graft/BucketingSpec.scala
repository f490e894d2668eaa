package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Bucketed co-located joins (SURVEY.md §4 / 100 TB playbook): tables
  * bucketed on the join key join WITHOUT any Exchange — at petabyte
  * scale this is the difference between a map-side merge and re-shuffling
  * the fact table on every join. Asserted on the executed plan.
  */
class BucketingSpec extends SparkSpec {

  test("equal-bucket join plans zero shuffles") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val wh = Files.createTempDirectory("graft-wh").toString
    try {
      spark.read.parquet(s"$d/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/li").saveAsTable("li_bucketed")
      spark.read.parquet(s"$d/orders.parquet")
        .select("o_orderkey", "o_totalprice")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/ord").saveAsTable("ord_bucketed")

      // disable broadcast so the join exercises the co-located path the
      // test is about (at real scale neither side broadcasts anyway)
      val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = try {
        val joined = spark.table("li_bucketed")
          .join(spark.table("ord_bucketed"),
            $"l_orderkey" === $"o_orderkey")
        joined.collect()
        (joined.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }).toString
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        threshold)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)

      // same result as the unbucketed join
      val plain = spark.read.parquet(s"$d/lineitem.parquet")
        .join(spark.read.parquet(s"$d/orders.parquet"),
          $"l_orderkey" === $"o_orderkey")
      val bucketed = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), $"l_orderkey" === $"o_orderkey")
      assert(bucketed.count() == plain.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
