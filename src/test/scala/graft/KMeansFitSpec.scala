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

  test("an empty cluster keeps its centroid; k never silently shrinks") {
    import spark.implicits._
    // only 2 distinct locations but k=3: farthest-first seeds the third
    // centroid on top of an existing one, it captures no points, and
    // the fit must still return 3 centroids (the empty cluster keeps
    // its previous centroid) rather than silently returning 2
    val degenerate = (0 until 100).map { i =>
      val (cx, cy) = if (i % 2 == 0) (0.0, 0.0) else (10.0, 10.0)
      (i.toLong, Array(cx.toFloat, cy.toFloat))
    }.toDF("id", "vec")
    val (assigned, centroids) = KMeansFit.fit(degenerate, "id", "vec", 3, 3)
    assert(centroids.count() == 3)
    assert(assigned.count() == 100)
  }

  test("returned assignments are the argmin of the returned centroids") {
    val (assigned, centroids) = KMeansFit.fit(blobs, "id", "vec", 3, 2)
    // recompute argmin driver-side from the RETURNED centroid table;
    // any disagreement means the pair is internally inconsistent (the
    // old shape returned assignments one Lloyd round behind)
    val cs = centroids.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val pts = blobs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val got = assigned.collect().map(r => r.getLong(0) -> r.getLong(1))
    got.foreach { case (id, cid) =>
      val p = pts(id)
      val best = cs.minBy { case (c, v) =>
        (v.zip(p).map { case (a, b) => (a - b) * (a - b) }.sum, c)
      }._1
      assert(best == cid, s"point $id assigned $cid but argmin is $best")
    }
  }

  test("fitFrom keeps the caller's cluster ids and refines a medoid " +
      "init toward the blob means") {
    import spark.implicits._
    // medoid-style init: one MEMBER point per blob (not the mean),
    // with caller-chosen ids 100/200/300 that must survive the fit
    val init = Seq(
      (100L, Seq(0.2, 0.4)), (200L, Seq(10.2, 10.4)),
      (300L, Seq(20.2, 0.4))).toDF("cluster", "centroid")
    val (assigned, centroids) =
      KMeansFit.fitFrom(blobs, "id", "vec", init, 3)
    assert(centroids.collect().map(_.getLong(0)).toSet ==
      Set(100L, 200L, 300L), "caller cluster ids not preserved")
    assert(assigned.select(col("cluster")).distinct().collect()
      .map(_.getLong(0)).toSet == Set(100L, 200L, 300L))
    // each blob lands wholly in one cell
    val m = assigned.withColumn("blob", col("id") % 3)
      .groupBy(col("blob"), col("cluster")).count().collect()
    assert(m.groupBy(_.getLong(0)).values.forall(_.length == 1))
    // refinement: trained centers sit at the blob MEANS (jitter mean
    // 0.2 per axis), strictly closer than the member-point init
    val cs = centroids.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val means = Map(100L -> Array(0.2, 0.2), 200L -> Array(10.2, 10.2),
      300L -> Array(20.2, 0.2))
    means.foreach { case (cid, mu) =>
      val c = cs(cid)
      val err = math.hypot(c(0) - mu(0), c(1) - mu(1))
      assert(err < 0.05, s"cell $cid center ${c.toSeq} far from mean")
    }
  }

  test("centroids are bit-identical under different partitionings") {
    val a = KMeansFit.fit(blobs.repartition(3), "id", "vec", 3, 3)._2
    val b = KMeansFit.fit(blobs.repartition(11), "id", "vec", 3, 3)._2
    val sa = a.orderBy("cluster").collect().map(_.toString).toSeq
    val sb = b.orderBy("cluster").collect().map(_.toString).toSeq
    assert(sa == sb)
  }
}
