package graft


/** Dev tool: time one SparkEntry query (cold + warm) and print its
  * formatted physical plan. Usage:
  *   sbt "runMain graft.ProfileQuery q_json_get /root/testdata/sf0.1 [runs]"
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Graft.localSession(cpus.toInt, "graft-profile")
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).explain("formatted")
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[profile] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
