package graft
import java.nio.file.{Files, Paths}
/** Dev tool: dump a comma-separated subset of SparkEntry.queries (plus
  * their oracle SQL) so tools/check.py can compare just those — a fast
  * inner loop while debugging one query instead of re-running Verify's
  * full suite.  Usage: runMain graft.RunOne <sfDir> <outDir> <q1,q2,...>
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    val wanted = names.split(",").toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = Graft.localSession(cpus.toInt, "graft-runone")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => wanted(kv._1)).foreach { case (name, fn) =>
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
    }
    val q = Jsons.jstr _
    val json = SparkEntry.oracleSql.filter(kv => wanted(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
