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
    // one pathological key with 10k rows, distinct payloads
    val big = (1 to 10000).map(i => (42L, i.toLong)).toDF("k", "payload")
    val salts = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(8)))
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
}
