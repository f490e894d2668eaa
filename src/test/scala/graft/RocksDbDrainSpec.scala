package graft.queries

import org.apache.spark.sql.functions._

/** Exercises the RocksDB state-store arm of [[Relational.drainStreamFiles]]
  * (the sizing knob kept for deployments whose streaming state outgrows
  * the heap — measured slower than the HDFS-backed store for the gated
  * neardup drain, so no gated query selects it): a cross-micro-batch
  * stateful dedup drains with `rocksDb = true`, proving the provider
  * set/restore path works end to end instead of rotting as dead code.
  */
class RocksDbDrainSpec extends graft.SparkSpec {

  test("drainStreamFiles with rocksDb=true dedups across micro-batches " +
      "and restores the provider conf") {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    val dir = java.nio.file.Files.createTempDirectory("graft_rocks_in_")
    try {
      val b0 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      val b1 = Seq((3L, "c-dup"), (4L, "d")).toDF("id", "v")
      val t0 = System.currentTimeMillis()
      Relational.stageStreamFile(b0, dir, "0_rows.parquet", t0 - 60000)
      Relational.stageStreamFile(b1, dir, "1_rows.parquet", t0 - 30000)
      val raw = spark.readStream.schema(b0.schema)
        .option("maxFilesPerTrigger", 1).parquet(dir.toString)
      val base = java.nio.file.Files
        .createTempDirectory("graft_rocks_out_").toString
      val out = Relational.drainStreamFiles(raw.dropDuplicates("id"),
        base, statePartitions = 2, rocksDb = true)
      // id 3 arrived in BOTH micro-batches: surviving once proves the
      // dedup state carried across the batch boundary through RocksDB
      assert(out.count() == 4)
      assert(out.groupBy(col("id")).count()
        .filter(col("count") > 1).count() == 0)
      assert(out.filter(col("id") === 3).select(col("v"))
        .head.getString(0) == "c")
      // the provider override did not leak into the session
      assert(spark.conf.getOption(key) == before)
      Relational.deleteRecursive(java.nio.file.Paths.get(base))
    } finally Relational.deleteRecursive(dir)
  }
}
