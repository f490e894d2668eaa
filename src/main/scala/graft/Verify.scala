package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = Graft.localSession(cpus.toInt, "graft-verify")
    new java.io.File(outDir).mkdirs()
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
        // A query failing BEFORE its overwrite starts (analysis-time
        // error) leaves any dump from an earlier run in place, and the
        // compare would then grade the broken query against stale data
        // as a pass. Delete the path so absence is the unambiguous
        // failure signal.
        try {
          val p = Paths.get(s"$outDir/$name")
          if (Files.exists(p)) {
            import scala.jdk.CollectionConverters._
            Files.walk(p).sorted(java.util.Comparator.reverseOrder())
              .iterator().asScala.foreach(Files.delete)
          }
        } catch { case d: Throwable =>
          System.err.println(
            s"[verify] could not clear stale dump for $name: ${d.getMessage}")
        }
      }
    }
    val q = Jsons.jstr _
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // A failed query's dump is deleted above, so its failure would otherwise
    // be visible only as ABSENCE in the compare. Enumerate failures as data
    // so the driver/judge see name → message directly.
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"), errJson)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries failed: ${errors.keys.mkString(", ")}")
    spark.stop()
  }
}
