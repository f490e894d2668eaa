package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ext.VectorOps

/** Full iterative Lloyd k-means over an embedding column — the fit loop
  * the single M-step query (queries.Ext q_kmeans_step) is one round of.
  *
  * Deterministic end to end, which plain k-means is not:
  *  - INIT: farthest-first traversal seeded at the hash-smallest point
  *    (a deterministic k-means++ stand-in — no rand(), no
  *    partition-order dependence, and no two seeds in one blob);
  *  - E-step: assignment = argmin squared-L2, ties broken by centroid
  *    id via a min(struct(dist, cid)) aggregate — BROADCAST centroids
  *    (k rows) against the point scan, so the big side never shuffles;
  *  - M-step: per-(cluster, dimension) DECIMAL(18,9) component sums —
  *    addition-order-free, so centroids are bit-identical under any
  *    partitioning (the property q_kmeans_step's oracle proves);
  *  - each round's centroid relation is localCheckpointed: k*dim rows,
  *    and without it round N replays the full lineage of rounds 1..N-1
  *    (the same rule as ops.Clusters' label-propagation rounds).
  *
  * At scale each iteration is one map-side assignment pass plus one
  * (cluster, dim)-keyed aggregation — no all-pairs relation, no
  * driver-side data beyond the k x dim centroid table.
  */
object KMeansFit {

  /** Returns (assignments: idCol, cluster; centroids: cluster,
    * centroid) after `iters` Lloyd rounds from the deterministic
    * farthest-first init.
    */
  def fit(points: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int): (DataFrame, DataFrame) = {
    require(k >= 1 && iters >= 1)
    val pts = points.select(col(idCol), VectorOps.toDouble(col(vecCol))
      .as("_v")).localCheckpoint()

    // reproducible farthest-first init (deterministic k-means++ stand-in,
    // no rand()): seed with the hash-smallest point, then k-1 rounds of
    // "the point farthest from every centroid so far" (ties by id). Each
    // round is one broadcast pass over the points + a top-1.
    var centroids = pts
      .orderBy(md5(col(idCol).cast("string")), col(idCol)).limit(1)
      .select(lit(0L).as("_cid"), col("_v").as("_c"))
      .localCheckpoint()
    for (i <- 1 until k) {
      val far = pts.crossJoin(broadcast(centroids))
        .groupBy(col(idCol))
        .agg(first(col("_v")).as("_v"),
          min(dist2(col("_v"), col("_c"))).as("_d"))
        .orderBy(col("_d").desc, col(idCol)).limit(1)
        .select(lit(i.toLong).as("_cid"), col("_v").as("_c"))
      centroids = centroids.unionByName(far).localCheckpoint()
    }
    lloyd(pts, idCol, centroids, iters)
  }

  /** Lloyd rounds from a CALLER-SUPPLIED init — the warm-start form:
    * `init` is (cluster, centroid) with the caller's cluster ids kept
    * through the fit (an IVF coarse quantizer initialized from the
    * label medoids keeps the medoid vec_ids as cell ids, so trained
    * and medoid cells compare row for row). Same loop, same decimal
    * M-step, same tie rules as [[fit]].
    */
  def fitFrom(points: DataFrame, idCol: String, vecCol: String,
      init: DataFrame, iters: Int): (DataFrame, DataFrame) = {
    require(iters >= 1)
    val pts = points.select(col(idCol), VectorOps.toDouble(col(vecCol))
      .as("_v")).localCheckpoint()
    val c0 = init.select(col("cluster").cast("long").as("_cid"),
      VectorOps.toDouble(col("centroid")).as("_c")).localCheckpoint()
    lloyd(pts, idCol, c0, iters)
  }

  private def dist2(a: Column, b: Column): Column =
    graft.ext.TextOps.let(zip_with(a, b, (x, y) => x - y))(d =>
      VectorOps.dot(d, d))

  /** The E/M loop shared by [[fit]] and [[fitFrom]]:
    *  - E-step: assignment = argmin squared-L2, ties broken by centroid
    *    id via a min(struct(dist, cid)) aggregate — BROADCAST centroids
    *    (k rows) against the point scan, so the big side never shuffles;
    *  - M-step: per-(cluster, dimension) DECIMAL(18,9) component sums —
    *    addition-order-free, so centroids are bit-identical under any
    *    partitioning;
    *  - empty clusters keep their previous centroid (the join-back).
    */
  private def lloyd(pts: DataFrame, idCol: String, init: DataFrame,
      iters: Int): (DataFrame, DataFrame) = {
    def eStep(cs: DataFrame): DataFrame = pts.crossJoin(broadcast(cs))
      .select(col(idCol), col("_v"),
        struct(dist2(col("_v"), col("_c")).as("d"), col("_cid").as("cid"))
          .as("_dc"))
      .groupBy(col(idCol))
      .agg(first(col("_v")).as("_v"), min(col("_dc")).as("_best"))
      .select(col(idCol), col("_v"), col("_best.cid").as("_cid"))

    var centroids = init
    for (_ <- 1 to iters) {
      val assigned = eStep(centroids)
      val next = assigned
        .select(col("_cid"), posexplode(col("_v")))
        .select(col("_cid"), col("pos").cast("long").as("_dim"),
          col("col").cast(DecimalType(18, 9)).as("_xd"))
        .groupBy(col("_cid"), col("_dim"))
        .agg((sum(col("_xd")).cast("double") / count(lit(1))).as("_m"))
        .groupBy(col("_cid"))
        .agg(transform(array_sort(collect_list(struct(col("_dim"),
          col("_m")))), e => e.getField("_m")).as("_c"))
      // a cluster that captured zero points this round keeps its
      // previous centroid (standard Lloyd handling) — without the
      // join-back it would silently VANISH and the fit would return
      // fewer than k centroids
      centroids = centroids.select(col("_cid"), col("_c").as("_prev"))
        .join(next, Seq("_cid"), "left")
        .select(col("_cid"), coalesce(col("_c"), col("_prev")).as("_c"))
        .localCheckpoint()
    }
    // final assignment is computed against the RETURNED centroids (the
    // in-loop one preceded the last M-step — off by one Lloyd round,
    // so a boundary point could disagree with an argmin recomputed
    // from the returned centroid table)
    val assigned = eStep(centroids)
    (assigned.select(col(idCol), col("_cid").as("cluster")),
      centroids.select(col("_cid").as("cluster"), col("_c").as("centroid")))
  }
}
