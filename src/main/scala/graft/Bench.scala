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
    // A failed query must NOT be indistinguishable from a fast one: record
    // the error and surface it in the JSON line.
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Option[String]) = {
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case t: Throwable =>
          Some(s"${t.getClass.getSimpleName}: ${Option(t.getMessage).getOrElse("").take(200)}")
        }
      ((System.nanoTime() - t0) / 1e9, err)
    }
    // Warmup pass JITs the scan/shuffle/codegen infrastructure so early
    // queries don't absorb one-time JVM cost; report the steady-state pass.
    SparkEntry.queries.foreach { case (_, fn) => once(fn) }
    val results = SparkEntry.queries.map { case (name, fn) => name -> once(fn) }
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\r\\n\\t]", " ") + "\""
    val qs = results.map { case (k, (v, _)) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, (_, Some(e))) => jstr(k) + ":" + jstr(e) }
    val errField =
      if (errors.isEmpty) "" else errors.mkString(",\"errors\":{", ",", "}")
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$errField,"sf":"$sfDir"}""")
    if (errors.nonEmpty)
      System.err.println(s"BENCH: ${errors.size} queries FAILED (see errors field)")
    spark.stop()
  }
}
