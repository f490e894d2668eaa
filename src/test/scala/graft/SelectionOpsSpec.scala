package graft

import org.apache.spark.sql.functions._

/** Bit-exact plain-Scala replays for the round-5 selection/fingerprint
  * operators (MMR, JL sign projection, prototype pruning, winnowing):
  * each test recomputes the query's math with the SAME strict
  * left-to-right float fold the engine kernels use, so every argmax
  * decision, tie rule, and rounded output value is checked exactly —
  * a coefficient, tie-break, or window-rule regression fails on
  * values, not just on shape. Runs on the sf0.001 driver tables.
  */
class SelectionOpsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def dot(a: Array[Double], b: Array[Double]) =
    a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val emb: Array[(Long, Array[Double])] =
    Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)

  test("mmr: picks equal a greedy replay; 0.3 is not 1 - 0.7") {
    val vecs = emb.toMap
    val nrm = emb.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val (qv, qn) = (vecs(0L), nrm(0L))
    val rel = emb.filter(_._1 != 0L).map { case (id, v) =>
      id -> dot(v, qv) / (nrm(id) * qn)
    }.toMap
    var ms = rel.map { case (id, _) => id -> 0.0 }
    var remaining = rel.keySet
    var expect = List.empty[(Long, Long, Double)]
    for (r <- 1 to 5) {
      val (pid, score) = remaining.toSeq
        .map(id => id -> (0.7 * rel(id) - 0.3 * ms(id)))
        .maxBy { case (id, sc) => (sc, -id) }
      expect ::= ((r.toLong, pid, score))
      remaining -= pid
      ms = ms.map { case (id, m) =>
        id -> math.max(m,
          dot(vecs(id), vecs(pid)) / (nrm(id) * nrm(pid)))
      }
    }
    val got = SparkEntry.queries("q_mmr_select")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = expect.reverse.map { case (r, id, sc) => (r, id, r6(sc)) }
    assert(got.toList == want, s"got ${got.toList}, want $want")
    // the 5 picks are distinct and never the query vector itself
    assert(got.map(_._2).distinct.length == 5 && !got.exists(_._2 == 0L))
  }

  test("embed_project: every projected value equals the strict-fold replay") {
    def sign(j: Int, k: Int): Double =
      if (((j * j * 13 + k * k * 7 + j * k * 3 + j * 5 + k * 11) % 17) % 2
        == 0) 1.0 else -1.0
    val want = emb.flatMap { case (id, v) =>
      (0 until 8).map { k =>
        val sv = Array.tabulate(v.length)(j => sign(j, k))
        (id, k.toLong, r6(dot(v, sv) / math.sqrt(8.0)))
      }
    }.toList
    val got = SparkEntry.queries("q_embed_project")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    assert(got == want)
    // the sign matrix is usably balanced in every output dim (a
    // degenerate all-+1 column would make the "projection" a plain sum)
    for (k <- 0 until 8) {
      val pos = (0 until 64).count(j => sign(j, k) > 0)
      assert(pos >= 20 && pos <= 44, s"dim $k unbalanced: $pos of 64 +1s")
    }
  }

  test("prune_prototypes: exact decimal centroids, ranks, and keep rule") {
    val rows = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    // centroid = per-dim mean from DECIMAL(18,9) sums (HALF_UP cast),
    // exactly as the engine and the DuckDB oracle both compute it
    val cent = rows.groupBy(_._2).map { case (lbl, vs) =>
      val dims = vs.head._3.length
      val cv = Array.tabulate(dims) { j =>
        val s = vs.map(v => BigDecimal(v._3(j))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum
        s.toDouble / vs.length
      }
      lbl -> (cv, math.sqrt(dot(cv, cv)))
    }
    val scored = rows.map { case (id, lbl, v) =>
      val (cv, cn) = cent(lbl)
      (id, lbl, 1.0 - dot(v, cv) / (math.sqrt(dot(v, v)) * cn))
    }
    val want = scored.groupBy(_._2).toList.flatMap { case (_, vs) =>
      val ranked = vs.sortBy { case (id, _, dist) => (-dist, id) }
        .zipWithIndex
      ranked.map { case ((id, lbl, dist), i) =>
        (id, lbl, r6(dist), (i + 1).toLong, (i + 1) * 2 <= vs.length)
      }.toList
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_prune_prototypes")(spark, d).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3),
        r.getBoolean(4))).toList
    assert(got == want)
    // keep rule drops exactly the ceil-half most prototypical per label
    for ((lbl, vs) <- got.groupBy(_._2))
      assert(vs.count(_._5) == vs.length / 2, s"label $lbl keep count")
  }

  test("winnow: fingerprint profiles equal a direct per-doc replay") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hash31(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) & 2147483647L
    }
    def shingles(text: String): Seq[String] = {
      val t = text.toLowerCase.split(" ", -1).toSeq
      if (t.length >= 3) (0 to t.length - 3).map(i =>
        t.slice(i, i + 3).mkString(" "))
      else Seq(t.mkString(" "))
    }
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    val want = docs.map { case (id, text) =>
      val hs = shingles(text).map(hash31) // 1-based positions = idx+1
      val ng = hs.length
      val q1 = math.max(1, ng - 3)
      val fps = (1 to q1).map { q =>
        // rightmost argmin over window [q, q+3] clipped to the doc
        val win = (q to math.min(q + 3, ng)).map(p => (p, hs(p - 1)))
        win.minBy { case (p, h) => (h, -p) }
      }.distinct
      val sel = fps.map(_._2)
      (id, ng.toLong, sel.length.toLong,
        sel.length.toLong * 1000000L / ng, sel.min, sel.max, sel.sum)
    }.toList
    val got = SparkEntry.queries("q_fingerprint_winnow")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toList
    assert(got == want)
    // winnowing guarantee: every doc keeps at least one fingerprint and
    // never more than the number of windows
    for ((_, ng, nfp, _, _, _, _) <- got)
      assert(nfp >= 1 && nfp <= math.max(1, ng - 3))
  }
}
