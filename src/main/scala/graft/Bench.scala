package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      // test tables are single parquet files; split them so scans use
      // every core (at cluster scale files are already multi-block)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink: full evaluation of every column (count() would let the
    // optimizer prune the very projections being measured), zero I/O cost.
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame) = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }
    // Warmup pass JITs the scan/shuffle/codegen infrastructure so early
    // queries don't absorb one-time JVM cost; report the steady-state pass.
    SparkEntry.queries.foreach { case (_, fn) => once(fn) }
    val results = SparkEntry.queries.map { case (name, fn) => name -> once(fn) }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
