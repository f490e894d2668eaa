package graft

import org.apache.spark.sql.functions._

/** Contract tests for the two semantic-dedup scale grades
  * (`q_dedup_semantic` exact-within-cell vs `q_dedup_semantic_scaled`
  * adaptive band buckets — see BASELINE.md round-7 findings):
  *
  *  1. the scaled dup set is a SUBSET of the exact dup set (band
  *     bucketing only ever removes candidate pairs, never invents one);
  *  2. recall on IDENTICAL vectors is 100% by construction — equal
  *     vectors share every sign key, so they always collide;
  *  3. at n <= 512 the adaptive width degenerates to bits = 0 (one
  *     bucket per band) and the scaled output equals the exact output
  *     row for row.
  */
class SemanticDedupSpec extends SparkSpec {

  /** Deterministic 64-dim zero-centered vector for base index i. */
  private def vec(i: Int): Array[Float] =
    Array.tabulate(64)(j => math.sin(i * 64.0 + j).toFloat)

  /** nBase base vectors, each with an IDENTICAL twin (id*3+1) and a
    * slightly-shifted near-dup (id*3+2); 4 labels.
    */
  private def writeFixture(nBase: Int): String = {
    import spark.implicits._
    val rows = (0 until nBase).flatMap { i =>
      val v = vec(i)
      val near = v.map(x => x + 0.001f)
      Seq((i * 3L, s"l${i % 4}", v),
        (i * 3L + 1, s"l${i % 4}", v.clone()),
        (i * 3L + 2, s"l${i % 4}", near))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-sem").toString
    rows.toDF("vec_id", "label", "embedding")
      .repartition(8)
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def dups(name: String, dir: String): Set[Long] =
    SparkEntry.queries(name)(spark, dir).collect()
      .filter(_.getBoolean(2)).map(_.getLong(0)).toSet

  test("scaled dups are a subset of exact dups; identical twins always caught") {
    val dir = writeFixture(300) // n = 900 > 512 -> bits = 1, real buckets
    val exact = dups("q_dedup_semantic", dir)
    val scaled = dups("q_dedup_semantic_scaled", dir)
    assert(scaled.subsetOf(exact),
      s"scaled invented dups: ${(scaled -- exact).take(5)}")
    // every identical twin (base id*3 has copy id*3+1, cos = 1): the
    // twin shares all sign keys with its base, so the scaled variant
    // must flag it no matter how the buckets fall
    val twins = (0 until 300).map(i => i * 3L + 1).toSet
    assert(twins.subsetOf(scaled),
      s"missed identical twins: ${(twins -- scaled).take(5)}")
  }

  test("recall readout is consistent with the two dup sets") {
    val dir = writeFixture(300)
    val exact = dups("q_dedup_semantic", dir)
    val scaled = dups("q_dedup_semantic_scaled", dir)
    val r = SparkEntry.queries("q_dedup_semantic_recall")(spark, dir)
      .collect().head
    assert(r.getLong(0) == exact.size.toLong)
    assert(r.getLong(1) == scaled.size.toLong)
    assert(r.getLong(2) == (exact & scaled).size.toLong)
    assert(r.getLong(3) ==
      (exact & scaled).size.toLong * 1000000L / exact.size)
  }

  test("n <= 512 degenerates to the exact semantics row for row") {
    val dir = writeFixture(130) // n = 390 <= 512 -> bits = 0
    val exact = SparkEntry.queries("q_dedup_semantic")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val scaled = SparkEntry.queries("q_dedup_semantic_scaled")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(exact.sameElements(scaled))
  }

  test("band sweep: per-config counts subset-consistent, identical twins " +
      "always caught at every band count") {
    // the sweep's per-band-count rows must each be internally consistent
    // (scaled <= exact, n_both == n_scaled because scaled is a subset,
    // recall the integer ratio), and the identical-twin guarantee holds
    // at EVERY band count — an identical pair shares every sign key in
    // any window layout, so n_scaled can never drop below the twin count
    val dir = writeFixture(300) // n = 900 > 512 -> bits = 1, real buckets
    val exact = dups("q_dedup_semantic", dir)
    val rows = SparkEntry.queries("q_dedup_semantic_sweep")(spark, dir)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    rows.foreach { r =>
      val (nEx, nSc, nBoth, ppm) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nEx == exact.size.toLong)
      assert(nSc <= nEx && nBoth == nSc,
        s"bands=${r.getLong(0)}: scaled not a subset ($nSc vs both $nBoth)")
      assert(nSc >= 300L, s"bands=${r.getLong(0)} missed identical twins")
      assert(ppm == nBoth * 1000000L / nEx)
    }
  }

  test("oversized band layout fails loudly, not by silent clamping") {
    // 32-dim corpus cannot carry the default (bands-1)*stride+maxBits=60
    // layout: the dim guard must raise, because Spark's slice would
    // clamp while the DuckDB twin pads '0' — a silent hash divergence
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sem32").toString
    (0 until 600).map(i =>
        (i.toLong, s"l${i % 4}", Array.tabulate(32)(j =>
          math.sin(i * 32.0 + j).toFloat)))
      .toDF("vec_id", "label", "embedding")
      .write.parquet(s"$dir/embeddings.parquet")
    val ex = intercept[Exception] {
      SparkEntry.queries("q_dedup_semantic_scaled")(spark, dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("band layout needs embedding dim")),
      s"unexpected failure: ${messages(ex).mkString(" | ")}")
  }

  test("broadcast cell argmax is bit-identical to the literal bandify " +
      "and keeps the reps out of the plan") {
    import spark.implicits._
    // synthetic reps with DELIBERATE tie structure: reps 2 and 4 are
    // the same vector, so any input scores them equally and the tie
    // must resolve to the smaller rid in both forms
    def rv(k: Int): Array[Double] =
      Array.tabulate(64)(j => math.cos(k * 7.0 + j * 0.31))
    val reps: Array[(Long, Array[Double], Double)] =
      Array(2L -> rv(1), 4L -> rv(1), 7L -> rv(2), 11L -> rv(3))
        .map { case (id, v) =>
          (id, v, math.sqrt(v.map(x => x * x).sum)) }
    val vecs = (0 until 300).map { n =>
      (n.toLong, (0 until 64).map(j =>
        math.sin(n * 3.0 + j * 0.17)).toArray.toSeq, n % 2)
    }.toDF("vec_id", "v", "ingest_day")
    val lit = graft.queries.Ext.semanticBandifyLiteral(vecs, reps, 4)
    val bc = spark.sparkContext.broadcast(reps)
    val bcd = graft.queries.Ext.semanticBandifyBroadcast(vecs, bc, 4)
    val a = lit.orderBy(col("vec_id"), col("band")).collect().toSeq
    val b = bcd.orderBy(col("vec_id"), col("band")).collect().toSeq
    assert(a == b, "broadcast bandify diverges from the literal anchor")
    // the duplicated rep's tie really resolved low
    assert(b.forall(_.getLong(1) != 4L), "tie must resolve to rid 2, not 4")
    // plan-size contract: the literal plan carries one ARRAY literal
    // per rep vector (the typedLit payload — dim doubles each); the
    // broadcast plan carries none (counted across the whole analyzed
    // tree — the payload sits in an inner Project)
    def arrayLits(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect { case p =>
        p.expressions.map(_.collect {
          case l: org.apache.spark.sql.catalyst.expressions.Literal
            if l.dataType.isInstanceOf[
              org.apache.spark.sql.types.ArrayType] => l
        }.size).sum
      }.sum
    assert(arrayLits(lit) >= reps.length,
      s"literal plan should carry the reps: ${arrayLits(lit)}")
    assert(arrayLits(bcd) == 0, s"broadcast plan: ${arrayLits(bcd)}")
  }
}
