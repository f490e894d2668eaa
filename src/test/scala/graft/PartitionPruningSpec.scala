package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Partition pruning: data written `partitionBy(lang)` must be read
  * with the partition filter resolved at planning time — a `lang = 'de'`
  * query touches only the de/ directory, the 100 TB equivalent of
  * skipping every other partition's files entirely.
  */
class PartitionPruningSpec extends SparkSpec {

  test("hive-style partitioned write + partition-filtered read") {
    val d = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("graft-part").toString
    val docs = spark.read.parquet(s"$d/documents.parquet")
    docs.write.partitionBy("lang").parquet(s"$out/docs")

    val q = spark.read.parquet(s"$out/docs").filter(col("lang") === "de")
    q.collect()
    val plan = (q.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    // the partition predicate resolves at planning time, not per row
    // (inputFiles reflects the pre-pruning relation, so assert on the
    // executed scan's PartitionFilters instead)
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters"))
      .mkString
    assert(pf.contains("lang") && pf.contains("de"), plan.take(2000))

    // correctness: same rows as the unpartitioned filter
    val expected = docs.filter(col("lang") === "de").count()
    assert(q.count() == expected && expected > 0)
  }
}
