package graft

import java.nio.file.{Files, Paths}

/** Dev tool: write `.explain("formatted")` of named queries (or every
  * declared query) to `<outDir>/<name>.txt` — the plan evidence the
  * optimization rounds commit under plans/rNN/. Usage:
  *   sbt "runMain graft.PlanDump <outDir> <sfDir> [q_a,q_b,...]"
  * Composite lifecycle gates execute side effects while building their
  * readout, so a dump run takes real time; failures are recorded into
  * the file rather than aborting the sweep.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val names: Seq[String] =
      if (args.length > 2)
        args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.localSession(cpus.toInt, "graft-plandump",
      Map("spark.sql.files.maxPartitionBytes" -> "4m"))
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val txt =
        try {
          val df = SparkEntry.queries(n)(spark, sfDir)
          val qe = df.queryExecution
          qe.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch { case t: Throwable =>
          s"PLAN DUMP FAILED: ${t.getClass.getName}: ${t.getMessage}"
        }
      Files.writeString(Paths.get(outDir, s"$n.txt"), txt)
      println(s"[plandump] $n -> $outDir/$n.txt")
    }
    spark.stop()
  }
}
