package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew

/** Salted-join correctness: result-set equality with the plain join,
  * salt spread for hot keys, and hot-key detection.
  */
class SkewSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("saltedEquiJoin result == plain inner join result") {
    val orders = spark.read.parquet(s"$d/orders.parquet")
    val customer = spark.read.parquet(s"$d/customer.parquet")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, Seq("o_custkey"))
      .select("o_orderkey", "c_name")
    val salted = Skew.saltedEquiJoin(orders, customer, "o_custkey", 8)
      .select("o_orderkey", "c_name")
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("hot key rows spread across several salts") {
    import spark.implicits._
    // one pathological key with 10k rows, distinct payloads — salted
    // through Skew.saltCol, the SAME expression saltedEquiJoin scatters
    // the big side with (a test-local copy of the formula would keep
    // passing if the library regressed to hashing only the key, which
    // puts all 10k hot rows on one salt)
    val big = (1 to 10000).map(i => (42L, i.toLong)).toDF("k", "payload")
    val salts = big.withColumn("_salt", Skew.saltCol(big, 8))
      .select("_salt").distinct().count()
    assert(salts == 8)
  }

  test("hotKeys finds the skewed key") {
    import spark.implicits._
    val df = ((1 to 1000).map(_ => 7L) ++ (1 to 50).map(_.toLong))
      .toDF("k")
    val hot = Skew.hotKeys(df, "k", 500).collect()
    assert(hot.length == 1 && hot(0).getLong(0) == 7L)
  }

  test("AQE splits a skewed join partition at runtime") {
    import spark.implicits._
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // one key carries ~95% of the rows with a wide payload: force the
    // runtime skew split by lowering AQE's size thresholds so the hot
    // partition crosses them even at test scale
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) =>
      k -> util.Try(spark.conf.get(k)).toOption }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // stage as parquet: AQE plans real scans, not local relations.
      // payload must be incompressible (per-row pseudorandom hex) or the
      // hot shuffle partition compresses below any skew threshold
      val dir = java.nio.file.Files.createTempDirectory("graft-skew").toString
      ((1 to 20000).map(_ => 7L) ++ (1L to 1000L))
        .toDF("k").withColumn("rid", monotonically_increasing_id())
        .withColumn("payload", concat((0 until 8).map(j =>
          md5(concat(col("rid"), lit(j)))): _*))
        .drop("rid")
        .write.parquet(s"$dir/left")
      (1L to 1000L).toDF("k")
        .withColumn("dim", concat(col("k"), lit("d")))
        .write.parquet(s"$dir/right")
      val joined = spark.read.parquet(s"$dir/left")
        .join(spark.read.parquet(s"$dir/right"), "k")
      joined.collect() // materialize so AQE finalizes its runtime plan
      val plan = (joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).toString
      assert(plan.contains("skewed"), plan.take(4000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
