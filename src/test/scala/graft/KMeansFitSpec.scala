package graft

import org.apache.spark.sql.functions._
import graft.ops.KMeansFit

/** Iterative k-means (ops.KMeansFit): recovers planted clusters, and —
  * the deterministic-algebra claim — produces BIT-IDENTICAL centroids
  * under different input partitionings.
  */
class KMeansFitSpec extends SparkSpec {

  // 300 points in 3 well-separated 2-D blobs, fully deterministic
  private def blobs = {
    import spark.implicits._
    (0 until 300).map { i =>
      val blob = i % 3
      val (cx, cy) = Seq((0.0, 0.0), (10.0, 10.0), (20.0, 0.0))(blob)
      val jx = (i * 7 % 5) * 0.1
      val jy = (i * 11 % 5) * 0.1
      (i.toLong, Array((cx + jx).toFloat, (cy + jy).toFloat))
    }.toDF("id", "vec")
  }

  test("fit recovers the planted blobs (up to label permutation)") {
    val (assigned, centroids) = KMeansFit.fit(blobs, "id", "vec", 3, 5)
    val m = assigned.withColumn("blob", col("id") % 3)
      .groupBy(col("blob"), col("cluster")).count().collect()
    // each blob lands in exactly one cluster, and the three clusters
    // are distinct
    val byBlob = m.groupBy(_.getLong(0))
    assert(byBlob.size == 3 && byBlob.values.forall(_.length == 1))
    assert(m.map(_.getLong(1)).toSet.size == 3)
    assert(centroids.count() == 3)
    // centroid coordinates sit near the planted centers (+jitter mean .2)
    val cs = centroids.collect().map(_.getSeq[Double](1)).map(v =>
      (math.round(v(0) / 10) * 10, math.round(v(1) / 10) * 10)).toSet
    assert(cs == Set((0L, 0L), (10L, 10L), (20L, 0L)))
  }

  test("centroids are bit-identical under different partitionings") {
    val a = KMeansFit.fit(blobs.repartition(3), "id", "vec", 3, 3)._2
    val b = KMeansFit.fit(blobs.repartition(11), "id", "vec", 3, 3)._2
    val sa = a.orderBy("cluster").collect().map(_.toString).toSeq
    val sb = b.orderBy("cluster").collect().map(_.toString).toSeq
    assert(sa == sb)
  }
}
