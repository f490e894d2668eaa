package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join (SURVEY.md §2.11): for each left ("probe") row,
  * attach the single right ("build") row with the greatest build
  * timestamp <= the probe timestamp among rows sharing the join key —
  * the time-series point-in-time lookup the reference's relational
  * surface lacks (left-outer: probes with no prior build row keep nulls).
  *
  * Spark-first design — union + one window pass, NOT a range join:
  * the naive formulation (equi-join on key, filter r.ts <= l.ts, argmax
  * per probe) explodes to O(|probe| x |build|) pairs per key before
  * pruning, which is exactly the shuffle blow-up that kills a 100 TB run.
  * Instead both sides are tagged and unioned, shuffled ONCE by the join
  * key, and sorted within each partition by (ts, side); a running
  * `last(build_payload, ignoreNulls)` then propagates each build row
  * forward to every later probe row. Linear work, one shuffle, no
  * intermediate pair set, and the window's sort is the same
  * sort-within-partition a sort-merge join would have paid anyway.
  * Skew note: a single hot key serializes into one partition — at scale
  * use [[asofBucketed]], which runs the same trick per (key, time-bucket)
  * and stitches buckets with a carry-in.
  *
  * Tie semantics: a build row AT the probe timestamp matches (inclusive,
  * DuckDB `ASOF JOIN ... ON l.ts >= r.ts` semantics). The build side must
  * be unique per (key, ts) — equal-timestamp build rows have no defined
  * winner in any as-of engine; pre-aggregate (e.g. max_by) to make the
  * winner explicit. [[asofBruteForce]] is the executable spec used by the
  * property tests.
  */
object AsOfJoin {

  /** Backward-inclusive as-of join.
    *
    * @param left      probe side; ALL its columns are preserved
    * @param right     build side; must be unique per (keys, rightTs)
    * @param keys      equi-join key columns (present on both sides)
    * @param leftTs    probe timestamp column name
    * @param rightTs   build timestamp column name
    * @param tolerance max allowed probe-minus-build gap in the timestamp's
    *                  unit (micros for TimestampType via unix_micros);
    *                  None = unbounded lookback
    * @return left.* plus the build side's non-key non-ts columns
    *         (null when no build row qualifies)
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      tolerance: Option[Column] = None): DataFrame = {
    // NULL semantics match the brute-force spec (and DuckDB ASOF): an
    // equality join never matches a NULL key, and ts <= ts is NULL for a
    // NULL build timestamp — so such build rows can never win and are
    // dropped on entry. (Without this, partitionBy would group NULL keys
    // together and a NULL-ts build row would sort first in the window,
    // leaking its payload into every later probe row.) NULL-key probe
    // rows land in a partition with no surviving build rows -> no match,
    // which is the spec'd left-outer behavior.
    val buildRows = right.filter(
      (keys.map(col(_).isNotNull) :+ col(rightTs).isNotNull).reduce(_ && _))
    asofOn(left, buildRows, keys, leftTs, rightTs, tolerance)
  }

  /** Forward as-of join: the time-mirror of [[asof]] — each probe row
    * attaches the build row with the SMALLEST build timestamp >= the
    * probe timestamp ("next quote after the order", lead-time lookups).
    * Same union + one-window plan, with the within-partition sort
    * reversed; tolerance bounds `build_ts - probe_ts`. NULL semantics
    * identical to [[asof]].
    */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      tolerance: Option[Column] = None): DataFrame = {
    val buildRows = right.filter(
      (keys.map(col(_).isNotNull) :+ col(rightTs).isNotNull).reduce(_ && _))
    asofOn(left, buildRows, keys, leftTs, rightTs, tolerance,
      forward = true)
  }

  /** Skew-resistant as-of join: [[asof]] serializes each key through one
    * window partition, so a single hot key (one instrument with billions
    * of quotes) bottlenecks on one task. This variant splits time into
    * fixed-width buckets and runs the same union-window trick partitioned
    * by (key, bucket) — a hot key parallelizes across its time range.
    *
    * Cross-bucket correctness ("the match lives in an older bucket") is
    * restored by a carry-in: per (key, bucket) take the LAST build row
    * (one row per bucket — tiny), propagate it forward across buckets
    * with a second window over that per-bucket relation, and inject it
    * into each bucket as a synthetic build row timestamped at the bucket
    * boundary. Every shuffle is keyed by (key, bucket) except the
    * per-bucket carry relation (|buckets| rows per key, not |rows|).
    *
    * Semantics identical to [[asof]] — the spec tests assert equality,
    * hot key included — EXCEPT tolerance: a carried match older than the
    * probe's bucket reports the carry row's true timestamp, so tolerance
    * composes unchanged.
    */
  def asofBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, bucket: Column => Column,
      tolerance: Option[Column] = None): DataFrame = {
    val rightClean = right.filter(
      (keys.map(col(_).isNotNull) :+ col(rightTs).isNotNull).reduce(_ && _))
    val bCol = "_asof_bucket"
    val rB = rightClean.withColumn(bCol, bucket(col(rightTs)))
    val lB = left.withColumn(bCol, bucket(col(leftTs)))

    // last build row per (key, bucket): rank within bucket, keep max ts
    val payloadCols = right.columns.filterNot(keys.contains)
      .filterNot(_ == rightTs).toIndexedSeq
    val wInBucket = Window.partitionBy((keys :+ bCol).map(col): _*)
      .orderBy(col(rightTs).desc)
    val lastPerBucket = rB
      .withColumn("_asof_rn", row_number().over(wInBucket))
      .filter(col("_asof_rn") === 1)
      .drop("_asof_rn")
    // propagate forward: for bucket b, the carry is the newest build row
    // from any bucket < b (per key). |rows| here = #non-empty buckets.
    val wAcross = Window.partitionBy(keys.map(col): _*).orderBy(col(bCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carrySrc = lastPerBucket.select(
      (keys.map(col) :+ col(bCol) :+
        struct((col(rightTs) +: payloadCols.map(col)): _*).as("_asof_row")): _*)
    // buckets that have probes but no build rows still need a carry row:
    // seed the across-window with EVERY bucket either side touches
    val allBuckets = rB.select((keys.map(col) :+ col(bCol)): _*)
      .union(lB.select((keys.map(col) :+ col(bCol)): _*)).distinct()
    val carried = allBuckets
      .join(carrySrc, keys :+ bCol, "left")
      .withColumn("_asof_carry",
        last(col("_asof_row"), ignoreNulls = true).over(wAcross))
      .filter(col("_asof_carry").isNotNull)
      .select((keys.map(col) :+ col(bCol) :+
        col("_asof_carry.*")): _*)

    // inject carries as synthetic build rows; a carry keeps its TRUE
    // (older-bucket) timestamp, so within the bucket it sorts before
    // every native build row and the union-window picks it only when
    // the bucket has nothing newer than the probe
    val rAug = rB.unionByName(carried)

    // the per-bucket asof: identical union-window trick, partitioned by
    // (keys :+ bucket)
    asofOn(lB, rAug, keys :+ bCol, leftTs, rightTs, tolerance)
      .drop(bCol)
  }

  /** [[asof]] generalized to an arbitrary partition-key list (the public
    * overloads pass `keys` or `keys :+ bucket`).
    */
  private def asofOn(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, tolerance: Option[Column],
      forward: Boolean = false): DataFrame = {
    val payloadCols = right.columns.filterNot(keys.contains)
      .filterNot(_ == rightTs).toIndexedSeq
    val leftType = StructType(left.schema.fields)
    val payloadType = StructType(
      right.schema.fields.filter(f => payloadCols.contains(f.name)))
    val buildSide = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_asof_t"),
        lit(0).as("_asof_side"),
        lit(null).cast(leftType).as("_asof_probe"),
        struct(payloadCols.map(col): _*).as("_asof_payload")): _*)
    val probeSide = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("_asof_t"),
        lit(1).as("_asof_side"),
        struct(left.columns.toIndexedSeq.map(col): _*).as("_asof_probe"),
        lit(null).cast(payloadType).as("_asof_payload")): _*)
    // forward mirrors the sort: descending ts carries each build row
    // "backward in time" onto every EARLIER probe; the side tiebreak
    // keeps a build row AT the probe timestamp matching (inclusive)
    // in both directions
    val tsOrder = if (forward) col("_asof_t").desc else col("_asof_t").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("_asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = buildSide.unionByName(probeSide)
      .withColumn("_asof_match", last(col("_asof_payload"), ignoreNulls = true).over(w))
      .withColumn("_asof_match_t",
        last(when(col("_asof_side") === 0, col("_asof_t")), ignoreNulls = true)
          .over(w))
      .filter(col("_asof_side") === 1)
    val bounded = tolerance match {
      case Some(tol) =>
        val gap =
          if (forward)
            unix_micros(col("_asof_match_t")) - unix_micros(col("_asof_t"))
          else
            unix_micros(col("_asof_t")) - unix_micros(col("_asof_match_t"))
        val within = col("_asof_match_t").isNotNull && gap <= tol
        carried.withColumn("_asof_match", when(within, col("_asof_match")))
      case None => carried
    }
    bounded.select(
      left.columns.toIndexedSeq.map(c => col("_asof_probe").getField(c).as(c)) ++
        payloadCols.map(c => col("_asof_match").getField(c).as(c)): _*)
  }

  /** Executable specification: the O(n·m)-per-key formulation. Correct by
    * construction, catastrophic at scale — exists ONLY so tests can check
    * `asof` against it on small data.
    */
  def asofBruteForce(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      tolerance: Option[Column] = None): DataFrame =
    bruteForceOn(left, right, keys, leftTs, rightTs, tolerance,
      forward = false)

  /** Forward-direction executable spec (mirror of [[asofBruteForce]]). */
  def asofForwardBruteForce(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      tolerance: Option[Column] = None): DataFrame =
    bruteForceOn(left, right, keys, leftTs, rightTs, tolerance,
      forward = true)

  private def bruteForceOn(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      tolerance: Option[Column], forward: Boolean): DataFrame = {
    val l = left.columns.toIndexedSeq.map(c => col(c).as(s"_l_$c"))
    val r = right.columns.toIndexedSeq.map(c => col(c).as(s"_r_$c"))
    val keyEq = keys.map(k => col(s"_l_$k") === col(s"_r_$k")).reduce(_ && _)
    val dirOk =
      if (forward) col(s"_r_$rightTs") >= col(s"_l_$leftTs")
      else col(s"_r_$rightTs") <= col(s"_l_$leftTs")
    val gapUs =
      if (forward)
        unix_micros(col(s"_r_$rightTs")) - unix_micros(col(s"_l_$leftTs"))
      else
        unix_micros(col(s"_l_$leftTs")) - unix_micros(col(s"_r_$rightTs"))
    val timeOk = tolerance.foldLeft(dirOk)((acc, tol) => acc && gapUs <= tol)
    // The per-probe argmax partitions by a synthetic row id, so two probe
    // rows that agree on every key/ts column still yield one output row
    // EACH (partitioning by the visible columns would collapse them and
    // silently drop rows from the oracle).
    val w = Window.partitionBy(col("_l_rowid")).orderBy(
      if (forward) col(s"_r_$rightTs").asc else col(s"_r_$rightTs").desc)
    val payloadCols = right.columns.filterNot(keys.contains)
      .filterNot(_ == rightTs).toIndexedSeq
    left.select(l: _*).withColumn("_l_rowid", monotonically_increasing_id())
      .join(right.select(r: _*), keyEq && timeOk, "left")
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(
        left.columns.toIndexedSeq.map(c => col(s"_l_$c").as(c)) ++
          payloadCols.map(c => col(s"_r_$c").as(c)): _*)
  }
}
