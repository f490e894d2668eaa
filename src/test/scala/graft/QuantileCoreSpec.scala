package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.Relational

/** Adversarial-distribution tests for the bucket_idx ranged-quantile
  * core: the oracle suite exercises it on well-behaved TPC-H-ish
  * columns, so the degenerate shapes — constant columns (every sampled
  * boundary identical → one bucket), heavy ties exactly at quantile
  * positions, groups too small to sample, single-row groups — are
  * pinned here against two independent references: the by-group window
  * implementation (exactQuantilesBy) and a driver-side sort computing
  * Percentile's interpolation formula directly.
  */
class QuantileCoreSpec extends SparkSpec {

  private val qs = Seq(0.25 -> "q25", 0.5 -> "q50", 0.75 -> "q75")

  /** Percentile/quantile_cont interpolation on a sorted vector —
    * the exact float shape both engine paths implement.
    */
  private def expected(vs: Seq[Double], q: Double): Double = {
    val s = vs.sorted
    val p = q * (s.length - 1)
    val (lo, hi) = (math.floor(p).toInt, math.ceil(p).toInt)
    val v = if (lo == hi) s(lo)
    else (hi - p) * s(lo) + (p - math.floor(p)) * s(hi)
    math.rint(v * 1e6) / 1e6
  }

  private def checkAgainstReferences(df: DataFrame,
      data: Map[String, Seq[Double]]): Unit = {
    val ranged = Relational.exactQuantilesRanged(df, Seq("g"), "v", qs)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val byGroup = Relational.exactQuantilesBy(df, Seq("g"), "v", qs)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(ranged.keySet == data.keySet)
    assert(ranged == byGroup, s"ranged=$ranged byGroup=$byGroup")
    for ((g, vs) <- data) {
      val (a, b, c) = ranged(g)
      assert(a == expected(vs, 0.25), s"$g q25: got $a")
      assert(b == expected(vs, 0.5), s"$g q50: got $b")
      assert(c == expected(vs, 0.75), s"$g q75: got $c")
    }
  }

  private def toDf(data: Map[String, Seq[Double]]): DataFrame = {
    import spark.implicits._
    // 16 partitions in arbitrary interleaving — the core must not care
    spark.sparkContext
      .parallelize(data.toSeq.flatMap { case (g, vs) => vs.map((g, _)) }, 16)
      .toDF("g", "v")
  }

  test("constant column: every boundary identical, one effective bucket") {
    val data = Map("a" -> Seq.fill(5000)(42.0))
    checkAgainstReferences(toDf(data), data)
  }

  test("heavy ties at the quantile positions") {
    // 50% of mass is the single value 10.0 — the median and both hinges
    // land inside tie runs, where rank assignment is arbitrary but the
    // value at each rank is not
    val data = Map(
      "a" -> (Seq.fill(2500)(10.0) ++ (1 to 1250).map(_.toDouble)
        ++ (1 to 1250).map(i => 10000.0 + i)),
      "b" -> (Seq.fill(999)(7.0) :+ 8.0))
    checkAgainstReferences(toDf(data), data)
  }

  test("pre-aggregated histogram path equals the raw-row path " +
      "(the q_outlier_mad deviation-histogram shape)") {
    // exactQuantilesHist over an explicit (group, value, weight)
    // relation must equal exactQuantilesBy over the exploded raw rows
    // — including weights > 1 landing the interpolation inside and
    // beside tie runs, and a weight-1-only group (hist == raw)
    val data = Map(
      "a" -> (Seq.fill(7)(5.0) ++ Seq(1.0, 2.0, 9.0, 9.0, 12.0)),
      "b" -> Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0),
      "c" -> Seq.fill(4)(8.0))
    val raw = toDf(data)
    val hist = raw.groupBy(col("g"), col("v"))
      .agg(count(lit(1)).as("w"))
    val viaHist = Relational.exactQuantilesHist(hist, Seq("g"), "v", "w", qs)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val viaRaw = Relational.exactQuantilesBy(raw, Seq("g"), "v", qs)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(viaHist == viaRaw, s"hist=$viaHist raw=$viaRaw")
    for ((g, vs) <- data) {
      val (a, b, c) = viaHist(g)
      assert(a == expected(vs, 0.25), s"$g q25: got $a")
      assert(b == expected(vs, 0.5), s"$g q50: got $b")
      assert(c == expected(vs, 0.75), s"$g q75: got $c")
    }
  }

  test("q_quantile_remap: piecewise map is exact, monotone, and the " +
      "identity when a source's grid equals the pooled grid") {
    import spark.implicits._
    // source "a" short docs, source "b" long docs; driver-side
    // reference recomputes the integer quarter-space remap from the
    // float quantiles independently of the Spark plan
    val data = Map(
      "a" -> (1 to 200).map(i => 50 + (i * 7) % 120),
      "b" -> (1 to 100).map(i => 400 + (i * 13) % 300))
    val dir = java.nio.file.Files.createTempDirectory("graft-qr").toString
    data.toSeq.flatMap { case (src, ls) =>
      ls.zipWithIndex.map { case (n, i) =>
        (src.hashCode.toLong * 1000 + i, src, n) }
    }.toDF("doc_id", "source", "n_chars")
      .repartition(8).write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_quantile_remap")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2).toLong,
        r.getString(3), r.getLong(4)))
    val all = data.values.flatten.map(_.toDouble).toSeq
    def grid(vs: Seq[Double]) =
      Seq(0.25, 0.5, 0.75).map(q => (expected(vs, q) * 4).toLong)
    val pooled = grid(all)
    val grids = data.map { case (s0, vs) => s0 -> grid(vs.map(_.toDouble)) }
    def ref(src: String, n: Long): (String, Long) = {
      val (Seq(s1, s2, s3), Seq(p1, p2, p3)) = (grids(src), pooled)
      val x4 = n * 4
      if (x4 < s1) ("lo", x4 + p1 - s1)
      else if (x4 < s2) ("mid1", p1 + (x4 - s1) * (p2 - p1) / (s2 - s1))
      else if (x4 < s3) ("mid2", p2 + (x4 - s2) * (p3 - p2) / (s3 - s2))
      else ("hi", x4 + p3 - s3)
    }
    got.foreach { case (id, src, n, seg, remap) =>
      assert((seg, remap) == ref(src, n), s"doc $id ($src, $n)")
    }
    // monotone within each source: a longer doc never remaps lower
    got.groupBy(_._2).values.foreach { rows =>
      rows.sortBy(_._3).sliding(2).foreach {
        case Array((_, _, n1, _, r1), (_, _, n2, _, r2)) =>
          assert(n1 > n2 || r1 <= r2, s"non-monotone at $n1->$n2")
        case _ =>
      }
    }
    // identity: one source only => source grid IS the pooled grid, so
    // every interp knot maps to itself and remap == 4*n_chars
    val dir1 = java.nio.file.Files.createTempDirectory("graft-qr1").toString
    data("a").zipWithIndex.map { case (n, i) => (i.toLong, "a", n) }
      .toDF("doc_id", "source", "n_chars")
      .write.parquet(s"$dir1/documents.parquet")
    SparkEntry.queries("q_quantile_remap")(spark, dir1).collect()
      .foreach(r => assert(r.getLong(4) == 4L * r.getInt(2),
        s"identity broken at ${r.getInt(2)}"))
  }

  test("groups too small to sample fall back to bucket 0") {
    val data = Map(
      "one" -> Seq(3.14),
      "two" -> Seq(2.0, 1.0),
      "big" -> (1 to 4000).map(i => math.sin(i).abs * 1000))
    checkAgainstReferences(toDf(data), data)
  }

  test("heavy skew: 99% of mass on one value amid high cardinality") {
    // The hard case for any range-bucketed rank scheme: the heavy
    // value's bucket holds ~99% of the group, so a row-level
    // row_number window would sort nearly the whole extent on one
    // task. The histogram rank lookup collapses the tie run to ONE
    // per-bucket histogram row; both engine paths must still return
    // the exact interpolated quantiles (all three land inside or
    // beside the tie run).
    val data = Map(
      "a" -> (Seq.fill(99000)(42.0) ++
        (1 to 500).map(_.toDouble) ++ (1 to 500).map(i => 1e6 + i)),
      "b" -> (1 to 1000).map(_.toDouble))
    checkAgainstReferences(toDf(data), data)
  }

  test("low-cardinality groups fan out across buckets, not one task") {
    // 50 distinct values across 40k rows: a value-hash RATE sample
    // (the pre-round-5 shape) passes ~0.5 of the 50 values and the
    // whole group sorts in one bucket = one task. The bucketed
    // min_by sample must instead capture every distinct value, so
    // the bucket relation fans out — this is the invariant that keeps
    // a low-cardinality metric from becoming a single-task sort at
    // cluster scale. (Correctness is boundary-invariant and covered
    // above; this pins the PLAN property.)
    val data = Map(
      "lo" -> (1 to 40000).map(i => (i % 50).toDouble),
      "hi" -> (1 to 40000).map(i => math.sin(i) * 1e6))
    val (_, offs) = Relational.rangedCore(toDf(data), Seq("g"), "v")
    val bucketsPerGroup = offs.groupBy(col("g"))
      .agg(countDistinct(col("_pid")).as("nb"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // nearly every distinct value gets its own bucket for the low-card
    // group (a couple may share a hash cell and drop from the sample —
    // birthday collisions among 50 values in 1024 cells)
    assert(bucketsPerGroup("lo") >= 40,
      s"low-card group buckets: ${bucketsPerGroup("lo")}")
    // high-cardinality group saturates the configured bucket budget
    assert(bucketsPerGroup("hi") > 32,
      s"high-card group buckets: ${bucketsPerGroup("hi")}")
    checkAgainstReferences(toDf(data), data)
  }

  test("discrete value-at-rank returns actual data values on tie runs") {
    val data = Map(
      "a" -> (Seq.fill(100)(5.0) ++ Seq.fill(100)(6.0) ++ Seq.fill(100)(7.0)),
      "b" -> Seq(9.0))
    val got = Relational.discQuantilesRanged(toDf(data), Seq("g"), "v",
        Seq(0.5 -> "p50", 0.9 -> "p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    // DuckDB quantile_disc convention: 1-based index ceil(q*n)
    def disc(vs: Seq[Double], q: Double) =
      vs.sorted.apply(math.ceil(q * vs.length).toInt - 1)
    for ((g, vs) <- data) {
      assert(got(g)._1 == disc(vs, 0.5), s"$g p50: ${got(g)._1}")
      assert(got(g)._2 == disc(vs, 0.9), s"$g p90: ${got(g)._2}")
      assert(vs.contains(got(g)._1) && vs.contains(got(g)._2))
    }
  }

  test("q_quantile_approx: sketch honors its rank contract on " +
      "adversarial distributions, and the bound check has teeth") {
    import spark.implicits._
    // heavy-tie + skew + singleton groups — the shapes where a GK-class
    // sketch earns (or loses) its eps = 1/accuracy rank guarantee
    val data = Map(
      "A" -> (Seq.fill(9000)(100.0) ++ (1 to 1000).map(_ * 7.0)),
      "B" -> (1 to 10000).map(i => math.pow(1.001, i)),
      "C" -> Seq(42.0))
    val dir = java.nio.file.Files.createTempDirectory("graft-qa").toString
    data.toSeq.flatMap { case (g, vs) => vs.map((g, _)) }
      .toDF("l_returnflag", "x")
      .select(col("l_returnflag"),
        col("x").cast("decimal(12,2)").as("l_extendedprice"))
      .repartition(16)
      .write.parquet(s"$dir/lineitem.parquet")
    val rows = SparkEntry.queries("q_quantile_approx")(spark, dir)
      .collect()
    assert(rows.length == 9) // 3 groups x 3 quantiles
    assert(rows.forall(_.getBoolean(3)),
      s"out-of-contract sketch row: ${rows.filterNot(_.getBoolean(3)).toSeq}")
    // teeth: replicate the emitted boolean for a PLANTED value whose
    // exact rank is far off target — the check must reject it, so a
    // hash match really does pin the sketch contract (not a tautology)
    val acc = 1000
    val vsB = data("B").sorted
    val (n, q) = (vsB.length, 0.25)
    val planted = vsB(4999) // exact rank ~5000 vs target rank 2500
    val lt = vsB.count(_ < planted).toDouble
    val le = vsB.count(_ <= planted).toDouble
    val slack = n.toDouble / acc + 1.0
    val within = lt <= q * n + slack && le >= q * n - slack
    assert(!within, "planted rank-5000 value passed a q=0.25 check")
  }

  test("many-group misuse fails loudly, not as a driver collect blowup") {
    // rangedCore is a FEW-groups-huge-data core; pointing it at a
    // high-cardinality key must hit the require (with the
    // exactQuantilesBy redirect in the message), and must get there
    // WITHOUT collecting groups x 1024 boundary samples to the driver
    // first — the collect is limit(257)-bounded, so this failing fast
    // (instead of OOMing first) is the behavior under test.
    import spark.implicits._
    val manyGroups = (1 to 5000)
      .map(i => (s"g$i", i.toDouble)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      Relational.rangedCore(manyGroups, Seq("g"), "v")
    }
    assert(e.getMessage.contains("exactQuantilesBy"))
  }
}
