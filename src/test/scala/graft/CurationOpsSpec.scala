package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Structural invariants for the curation/warehouse queries added late
  * in round 3 — properties the DuckDB hash compare can't articulate:
  * SCD2 versions must tile each user's timeline, forward fill must
  * only repair synthesized holes, keep-best must pick a member of its
  * own cluster, and the PageRank step must conserve (scaled) mass.
  * Runs on the sf0.001 driver tables.
  */
class CurationOpsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("scd2: versions tile each user's timeline without overlap") {
    val rows = SparkEntry.queries("q_scd2")(spark, d)
      .orderBy(col("user_id"), col("valid_from_us"))
      .collect()
    val byUser = rows.groupBy(_.getLong(0))
    for ((_, vs) <- byUser) {
      // exactly one open (current) version per user, and it is the last
      assert(vs.count(_.getBoolean(4)) == 1)
      assert(vs.last.getBoolean(4))
      // each version closes exactly where the next opens; never empty
      for (Array(a, b) <- vs.sliding(2)) {
        assert(!a.isNullAt(3) && a.getLong(3) == b.getLong(2))
        assert(a.getLong(2) < a.getLong(3))
      }
      // consecutive versions really are state CHANGES
      for (Array(a, b) <- vs.sliding(2))
        assert(a.getString(1) != b.getString(1))
    }
  }

  test("fill_forward: repairs exactly the synthesized holes, copies the rest") {
    val out = SparkEntry.queries("q_fill_forward")(spark, d).collect()
    for (r <- out) {
      val (id, sparse, filled) =
        (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))
      if (id % 7 != 0) {
        // non-hole rows pass through untouched
        assert(sparse.isDefined && filled == sparse)
      } else {
        assert(sparse.isEmpty) // the hole was synthesized
      }
    }
    // at least one hole actually got repaired (non-degenerate data)
    assert(out.exists(r => r.getLong(0) % 7 == 0 && !r.isNullAt(2)))
  }

  test("keep-best: keeper is a maximal-token member of its own cluster") {
    val clusters = SparkEntry.queries("q_dedup_clusters")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val best = SparkEntry.queries("q_dedup_keep_best")(spark, d).collect()
    assert(best.nonEmpty)
    val sizes = clusters.groupBy(_._2).view.mapValues(_.size).toMap
    // independent token counts over the SAME relation the query scores
    // (base docs plus the truncTail2-mutated near-dup copies), so the
    // keeper rule — max n_tokens, ties to the lowest doc_id — is
    // re-derived brute-force per cluster; a regression in the query's
    // packed-long argmax (e.g. a shift that truncates n_tokens, or a
    // tie rule that flips to max doc_id) fails here on exact values,
    // not just on membership. NULL text (a degenerate mutation) counts
    // as no tokens: SQL max ignores it, so it can never win.
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"))
    val union = docs.unionByName(docs.filter(col("doc_id") < 20)
      .select((col("doc_id") + 100000).as("doc_id"),
        graft.queries.Ext.truncTail2(col("text")).as("text")))
    val nTokens = union
      .select(col("doc_id"),
        size(graft.ext.TextOps.tokens(col("text"))).as("n"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1)))
      .toMap
    val byCluster = clusters.toSeq.groupBy(_._2)
    for (r <- best) {
      val (cluster, keeper, nMembers, bestTokens) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))
      assert(clusters(keeper) == cluster)
      assert(nMembers == sizes(cluster) && nMembers >= 2)
      val members = byCluster(cluster).map(_._1)
      val maxTok = members.map(nTokens).max
      val expectKeeper = members.filter(nTokens(_) == maxTok).min
      assert(maxTok >= 0, s"cluster $cluster has only NULL-text members")
      assert(bestTokens == maxTok, s"best_tokens for cluster $cluster")
      assert(keeper == expectKeeper,
        s"keeper for cluster $cluster: got $keeper, brute=$expectKeeper")
    }
  }

  test("dsir: selection enriches the target language vs the corpus rate") {
    // the whole point of importance weighting: the top-K under the
    // target='en' bucket model must hold MORE English than a uniform
    // draw would. Oracle hashing pins the exact values; this pins the
    // semantics (a sign flip in the ratio — raw/target instead of
    // target/raw — would still oracle-match if both sides flipped, but
    // it would DE-enrich and fail here).
    val langs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val sel = SparkEntry.queries("q_dsir_select")(spark, d).collect()
    assert(sel.length == math.min(100, langs.size))
    val enSel = sel.count(r => langs(r.getLong(0)) == "en").toDouble / sel.length
    val enAll = langs.valuesIterator.count(_ == "en").toDouble / langs.size
    assert(enSel > enAll,
      f"top-${sel.length} en share $enSel%.3f <= corpus share $enAll%.3f")
    // scores arrive ranked: non-increasing importance, ties by doc_id
    val scores = sel.map(r => (r.getLong(2), r.getLong(0)))
    assert(scores.sliding(2).forall {
      case Array((s1, i1), (s2, i2)) => s1 > s2 || (s1 == s2 && i1 < i2)
      case _ => true
    })
  }

  test("bpe: merges equal a brute-force greedy trainer replay") {
    // reference BPE trainer in plain Scala: word-type frequencies,
    // per-round pair weights (every adjacent occurrence counts), top
    // pair by (weight desc, pair asc), greedy LEFTMOST non-overlapping
    // application — the exact semantics the windowed islands encode, so
    // an off-by-one in the island/offset logic fails on real values
    val words = Tables.documents(spark, d)
      .select(explode(graft.ext.TextOps.tokens(col("text"))).as("w"))
      .collect().map(_.getString(0))
      .filter(_.matches("^[a-z]{2,12}$"))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    var syms: Map[List[String], Long] =
      words.map { case (w, f) => w.split("").toList -> f }
        .groupBy(_._1).view.mapValues(_.values.sum).toMap
    def applyMerge(s: List[String], a: String, b: String): List[String] =
      s match {
        case x :: y :: rest if x == a && y == b =>
          (a + b) :: applyMerge(rest, a, b)
        case x :: rest => x :: applyMerge(rest, a, b)
        case Nil => Nil
      }
    var expect = List.empty[(Long, String, String, Long)]
    for (r <- 1 to 3) {
      val pairCnt = syms.toSeq.flatMap { case (s, f) =>
        s.zip(s.drop(1)).map(p => p -> f)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val (a, b, wt) = pairCnt.toSeq
        .map { case ((x, y), n) => (x, y, n) }
        .sortBy { case (x, y, n) => (-n, x, y) }.head
      expect ::= ((r.toLong, a, b, wt))
      syms = syms.toSeq.map { case (s, f) => applyMerge(s, a, b) -> f }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    }
    val got = SparkEntry.queries("q_bpe_merges")(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toList == expect.reverse, s"got ${got.toList}")
  }

  test("bpe encode: symbol streams equal applying the trained merges by hand") {
    def applyMerge(s: List[String], a: String, b: String): List[String] =
      s match {
        case x :: y :: rest if x == a && y == b =>
          (a + b) :: applyMerge(rest, a, b)
        case x :: rest => x :: applyMerge(rest, a, b)
        case Nil => Nil
      }
    val merges = SparkEntry.queries("q_bpe_merges")(spark, d).collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(merges.length == 3)
    val enc = SparkEntry.queries("q_bpe_encode")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(enc.nonEmpty)
    // the top-50 readout is ordered (freq desc, w)
    assert(enc.map { case (w, f, _, _) => (-f, w) }.toSeq ==
      enc.map { case (w, f, _, _) => (-f, w) }.toSeq.sorted)
    for ((w, _, nSyms, encoded) <- enc) {
      var syms = w.split("").toList
      for ((a, b) <- merges) syms = applyMerge(syms, a, b)
      assert(encoded == syms.mkString(" "), s"word $w")
      assert(nSyms == syms.length.toLong, s"word $w n_syms")
    }
  }

  test("bpe batched: merges equal a brute-force batched replay, " +
      "per-pass selections are mutually disjoint") {
    // plain-Scala reference of the batched trainer: per pass, pair
    // counts -> top-16 by (wt desc, pair asc) -> conservative disjoint
    // prefix (drop on shared symbol with ANY higher-ranked candidate)
    // -> take 3 -> one-shot greedy-leftmost apply of all selected
    val words = Tables.documents(spark, d)
      .select(explode(graft.ext.TextOps.tokens(col("text"))).as("w"))
      .collect().map(_.getString(0))
      .filter(_.matches("^[a-z]{2,12}$"))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    def applyBatch(s: List[String], ps: Set[(String, String)])
        : List[String] = s match {
      case x :: y :: rest if ps((x, y)) => (x + y) :: applyBatch(rest, ps)
      case x :: rest => x :: applyBatch(rest, ps)
      case Nil => Nil
    }
    var syms: Map[List[String], Long] =
      words.map { case (w, f) => w.split("").toList -> f }
        .groupBy(_._1).view.mapValues(_.values.sum).toMap
    var expect = List.empty[(String, String, Long)]
    for (_ <- 1 to 2) {
      val pairCnt = syms.toSeq.flatMap { case (s, f) =>
        s.zip(s.drop(1)).map(p => p -> f)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
        .map { case ((a, b), n) => (a, b, n) }
        .sortBy { case (a, b, n) => (-n, a, b) }.take(16)
      val sel = pairCnt.zipWithIndex.filter { case ((a, b, _), i) =>
        pairCnt.take(i).forall { case (ha, hb, _) =>
          ha != a && ha != b && hb != a && hb != b }
      }.map(_._1).take(3)
      // selections mutually symbol-disjoint (the batched-apply
      // soundness precondition)
      val symsUsed = sel.flatMap { case (a, b, _) => Seq(a, b) }
      assert(symsUsed.distinct.length == symsUsed.length ||
        sel.exists { case (a, b, _) => a == b }, s"overlap in $sel")
      expect = expect ++ sel
      val ps = sel.map { case (a, b, _) => (a, b) }.toSet
      syms = syms.toSeq.map { case (s, f) => applyBatch(s, ps) -> f }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    }
    val got = SparkEntry.queries("q_bpe_merges_batched")(spark, d)
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toList == expect, s"got ${got.toList}\nexp $expect")
    // rounds arrive 1..n in order
    val rounds = SparkEntry.queries("q_bpe_merges_batched")(spark, d)
      .collect().map(_.getLong(0))
    assert(rounds.toSeq == (1L to rounds.length).toSeq)
  }

  test("bpe batched: equals the sequential trainer when the top pairs " +
      "are disjoint and stable") {
    // crafted corpus: three disjoint dominant pairs whose counts a
    // co-merge cannot change — the case where batched-BPE and
    // sequential BPE provably coincide (merge order included)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe_batch_eq")
      .toString
    // two-letter words: a merge fuses the whole word, so it can
    // neither create a new pair nor change another pair's count
    val text = (Seq.fill(50)("ab") ++ Seq.fill(40)("cd") ++
      Seq.fill(30)("ef")).mkString(" ")
    Seq((1L, text, "en", "src0", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val bat = SparkEntry.queries("q_bpe_merges_batched")(spark, dir)
      .collect().map(r => (r.getString(1), r.getString(2)))
    val seq3 = graft.queries.Ext.bpeMergesSequentialForTest(spark, dir, 3)
      .map { case (_, a, b, _) => (a, b) }
    assert(bat.take(3).toList == seq3,
      s"batched ${bat.toList} vs sequential $seq3")
  }

  test("bpe: a corpus with no mergeable words yields an empty merges table") {
    // all-numeric tokens: the word filter leaves nothing, so every
    // round's top-pair relation is empty — the query must degrade to
    // zero rows exactly like the oracle's empty LIMIT 1 CTEs, not
    // crash on collect()(0)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe_degenerate")
      .toString
    Seq((1L, "123 456 789", "en", "src0", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_bpe_merges")(spark, dir)
    assert(out.collect().isEmpty)
    assert(out.columns.toSeq ==
      Seq("round", "lhs", "rhs", "weight"))
  }

  test("coreset: picks equal a brute-force greedy k-center replay") {
    // plain-Scala replay of the greedy loop with the SAME left-to-right
    // fold the engine kernel uses, so every argmax decision (and each
    // reported radius) is checked bit-for-bit — a tie-rule or running-
    // minimum regression fails on exact values
    val emb = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    val nrm = emb.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val vecs = emb.toMap
    var centers = List(emb.head._1) // seed = min vec_id
    var md = emb.map { case (id, v) =>
      id -> (1.0 - dot(v, vecs(centers.head)) /
        (nrm(id) * nrm(centers.head)))
    }.toMap
    var expect = List((1L, emb.head._1, 0.0))
    for (r <- 2 to 6) {
      val (pid, prad) = md.toSeq.maxBy { case (id, dd) => (dd, -id) }
      expect ::= ((r.toLong, pid, prad))
      centers ::= pid
      md = md.map { case (id, dd) =>
        id -> math.min(dd,
          1.0 - dot(vecs(id), vecs(pid)) / (nrm(id) * nrm(pid)))
      }
    }
    val got = SparkEntry.queries("q_coreset_kcenter")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = expect.reverse
      .map { case (r, id, rad) =>
        (r, id, BigDecimal(rad).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble) }
    assert(got.toList == want, s"got ${got.toList}, want $want")
  }

  test("pagerank step: scaled mass is conserved up to integer-div loss") {
    val pr = SparkEntry.queries("q_pagerank_step")(spark, d).collect()
    assert(pr.nonEmpty)
    val n = pr.length
    // sum of unnormalized scores ~= N (0.15*N teleport + 0.85*N walk);
    // integer division truncates <1e-12 per edge, so allow a loose but
    // one-sided tolerance: never above N, within 0.1% below
    val total = pr.map(_.getDouble(1)).sum
    assert(total <= n + 1e-6, s"mass created: $total > $n")
    assert(total > n * 0.999, s"mass lost: $total << $n")
  }

  test("pagerank iter: mass still conserved after all rounds; scores spread") {
    val pr = SparkEntry.queries("q_pagerank_iter")(spark, d).collect()
    assert(pr.nonEmpty)
    val n = pr.length
    val total = pr.map(_.getDouble(1)).sum
    assert(total <= n + 1e-6 && total > n * 0.999, s"total=$total n=$n")
    // (no spread assertion: at sf0.001 the pair graph is all symmetric
    // 2-cliques, where uniform scores are the CORRECT fixed point)
  }

  test("agg_merge: merged partial states equal the direct aggregate") {
    val merged = SparkEntry.queries("q_agg_merge")(spark, d).collect()
    val direct = graft.Tables.orders(spark, d)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority")).collect()
    assert(merged.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      direct.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("dedup_sweep: survivor counts are monotone in the threshold") {
    val r = SparkEntry.queries("q_dedup_sweep")(spark, d).head()
    val (n, g70, g80, g90) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n > 0 && n >= g70 && g70 >= g80 && g80 >= g90)
  }

  test("dedup_containment: containment bounded, subset flag consistent") {
    for (r <- SparkEntry.queries("q_dedup_containment")(spark, d).collect()) {
      val (ca, cb) = (r.getDouble(3), r.getDouble(4))
      assert(ca >= 0.0 && ca <= 1.0 && cb >= 0.0 && cb <= 1.0)
      assert(r.getBoolean(5) == (ca >= 0.9 || cb >= 0.9))
    }
  }

  test("winsorize: every row is counted once, fences clip both tails") {
    for (r <- SparkEntry.queries("q_winsorize")(spark, d).collect()) {
      val (n, lo, hi) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // p05/p95 fences: each tail is at most ~5% plus interpolation slack
      assert(lo <= n / 15 && hi <= n / 15)
      assert(lo + hi < n)
    }
  }

  test("split_leakfree: a near-dup cluster never straddles splits") {
    val rows = SparkEntry.queries("q_split_leakfree")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // every member of a unit (cluster root or own id) shares one split
    for ((_, members) <- rows.groupBy(_._2))
      assert(members.map(_._3).distinct.size == 1)
    // non-degenerate: at least one multi-member unit exists (the
    // synthetic near-dups), and more than one split value is used
    assert(rows.groupBy(_._2).exists(_._2.size >= 2))
    assert(rows.map(_._3).distinct.size >= 2)
    // clustered docs split by ROOT, not by own id: a doc whose unit
    // differs from its id must carry its root's split bucket
    assert(rows.exists { case (id, unit, _) => id != unit })
  }

  test("skyline: members are mutually non-dominated and dominate the rest") {
    val cust = Tables.orders(spark, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val sky = SparkEntry.queries("q_skyline")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def dominates(a: (Long, Long, Double), b: (Long, Long, Double)) =
      a._2 >= b._2 && a._3 >= b._3 && (a._2 > b._2 || a._3 > b._3)
    assert(sky.nonEmpty)
    for (a <- sky; b <- sky if a._1 != b._1) assert(!dominates(a, b))
    val skyIds = sky.map(_._1).toSet
    for (c <- cust if !skyIds(c._1))
      assert(sky.exists(m => dominates(m, c)), s"nothing dominates $c")
  }

  test("knn: predicted label owns a plurality of the neighbor votes") {
    // independent brute force in plain Scala over the collected
    // embeddings — cosine top-10 (ties by vec_id), majority vote, ties
    // to the smallest label — so a regression in the query's argmax /
    // tie handling fails here rather than slipping under a loose
    // bounds check (votes in [1,10] holds for ANY label the query
    // could emit)
    val emb = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    def nrm(a: Array[Double]) = math.sqrt(dot(a, a))
    val got = SparkEntry.queries("q_knn_classify")(spark, d).collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val qId = r.getLong(0)
      val (_, qLabel, qv) = emb.find(_._1 == qId).get
      val neigh = emb.filter(_._1 != qId)
        .map { case (id, lbl, v) =>
          (id, lbl, dot(qv, v) / (nrm(qv) * nrm(v))) }
        .sortBy { case (id, _, s) => (-s, id) }
        .take(10)
      val byLabel = neigh.groupBy(_._2).map { case (l, xs) => l -> xs.length }
      val maxVotes = byLabel.values.max
      val expectedPred = byLabel.filter(_._2 == maxVotes).keys.min
      assert(r.getInt(1) == qLabel, s"q_label for $qId")
      assert(r.getInt(2) == expectedPred,
        s"pred_label for $qId: got ${r.getInt(2)}, brute=$expectedPred")
      assert(r.getLong(3) == maxVotes.toLong,
        s"votes for $qId: got ${r.getLong(3)}, brute=$maxVotes")
    }
  }

  test("agg_approx: HLL estimate within its error bound of the exact count") {
    // the query now emits the bound check itself (within_bound), so the
    // spec pins that every group reports TRUE and that the exact column
    // agrees with an independent count(distinct)
    val rows = SparkEntry.queries("q_agg_approx")(spark, d).collect()
    val exact = Tables.customer(spark, d)
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("c_nationkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet == exact.keySet)
    for (r <- rows) {
      val seg = r.getString(0)
      assert(r.getLong(2) == exact(seg), s"$seg exact drift")
      assert(r.getBoolean(3), s"$seg: HLL estimate out of 3-sigma bound")
    }
  }

  test("agg_approx at sf0.1: rsd-consistent error where cardinality is real") {
    // quantitative acceptance at the largest local scale. Two regimes:
    // the query's own low-cardinality column (25 nations — the emitted
    // within_bound flag must hold), and a high-cardinality per-segment
    // count where the default 5% rsd is actually exercised (3 sigma =
    // 15%).
    val big = "/root/testdata/sf0.1"
    val rows = SparkEntry.queries("q_agg_approx")(spark, big).collect()
    val exact = Tables.customer(spark, big)
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("c_nationkey")).as("n"),
        countDistinct(col("c_custkey")).as("nk"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(rows.map(_.getString(0)).toSet == exact.keySet && rows.nonEmpty)
    for (r <- rows) {
      val seg = r.getString(0)
      assert(r.getLong(2) == exact(seg)._1, s"$seg exact drift")
      assert(r.getBoolean(3), s"$seg: HLL estimate out of 3-sigma bound")
    }
    val hi = Tables.customer(spark, big)
      .groupBy(col("c_mktsegment"))
      .agg(approx_count_distinct(col("c_custkey")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((seg, (_, ek)) <- exact) {
      assert(ek >= 1000, s"$seg: sf0.1 cardinality unexpectedly small: $ek")
      val rel = math.abs(hi(seg) - ek).toDouble / ek
      assert(rel <= 0.15,
        s"$seg: high-cardinality estimate off by ${rel * 100}% " +
          s"(est=${hi(seg)} exact=$ek) — beyond 3x the default 5% rsd")
    }
  }

  test("triangles: ordered-edge join count equals brute force; degrees obey the handshake lemma") {
    val pairs = SparkEntry.queries("q_dedup_pairs")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // independent brute force over the tiny collected edge set (the
    // oracle runs the SAME join algorithm in SQL; this does not)
    val es = pairs.toSet
    def edge(a: Long, b: Long) = es((math.min(a, b), math.max(a, b)))
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val brute = (for {
      i <- nodes.indices; j <- (i + 1) until nodes.length
      k <- (j + 1) until nodes.length
      if edge(nodes(i), nodes(j)) && edge(nodes(j), nodes(k)) &&
        edge(nodes(i), nodes(k))
    } yield 1).size
    val t = SparkEntry.queries("q_graph_triangles")(spark, d).head()
    assert(t.getLong(0) == nodes.length)
    assert(t.getLong(1) == pairs.length)
    assert(t.getLong(2) == brute, s"join=${t.getLong(2)} brute=$brute")

    // handshake lemma: sum over the degree histogram = 2|E|
    val dist = SparkEntry.queries("q_degree_dist")(spark, d).collect()
    assert(dist.map(r => r.getLong(0) * r.getLong(1)).sum ==
      2L * pairs.length)
  }

  test("cap_per_source: at most 5 docs per source, ranks contiguous") {
    val rows = SparkEntry.queries("q_cap_per_source")(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    for ((_, g) <- rows.groupBy(_._2)) {
      assert(g.size <= 5)
      assert(g.map(_._3).sorted.sameElements(1L to g.size))
    }
  }

  test("token_budget_select: histogram pushdown == naive global cumsum replay") {
    // brute-force replay of the selection rule the histogram plan must
    // reproduce: sort ALL scored docs by (score desc, doc_id), keep a
    // doc iff its EXCLUSIVE running token prefix is under budget =
    // total_tokens div 4 — which admits at most one boundary overshoot.
    val kept = SparkEntry.queries("q_token_budget_select")(spark, d)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // independent scored relation: doc_id -> (score, n_tokens), via the
    // oracle-identical quality-score query joined to a raw token count
    val scores = SparkEntry.queries("q_quality_score")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val toks = Tables.documents(spark, d)
      .select(col("doc_id"),
        size(split(lower(col("text")), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ordered = scores.toSeq
      .map { case (id, sc) => (id, sc, toks(id)) }
      .sortBy { case (id, sc, _) => (-sc, id) }
    val budget = toks.values.sum / 4
    var cum = 0L
    val expected = ordered.flatMap { case (id, sc, n) =>
      val keep = cum < budget
      cum += n
      if (keep) Some((id, sc, n)) else None
    }.sortBy(_._1)
    assert(kept.toSeq.sortBy(_._1) == expected,
      s"kept ${kept.length} vs expected ${expected.length}")
    // boundary semantics: dropping the LAST kept doc (in score order)
    // must bring the kept total under budget — at most one overshoot
    val keptTotal = expected.map(_._3).sum
    val lastKept = ordered.filter(t => expected.exists(_._1 == t._1)).last
    assert(keptTotal - lastKept._3 < budget)
  }

  test("quality_gate_per_source: ranged value-at-rank == brute-force gate replay") {
    // the gate's ranked-core plan must reproduce the definitional rule:
    // per source sort docs by (score desc, doc_id), keep k =
    // max(1, n div 4), report (n, k, score of the k-th kept doc)
    val got = SparkEntry.queries("q_quality_gate_per_source")(spark, d)
      .collect().map(r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val scored = SparkEntry.queries("q_quality_score")(spark, d)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val bySource = Tables.documents(spark, d)
      .select(col("doc_id"), col("source"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2)
    val expected = bySource.map { case (src, docs) =>
      val ordered = docs.map { case (id, _) => (id, scored(id)) }
        .sortBy { case (id, sc) => (-sc, id) }
      val n = ordered.length.toLong
      val k = math.max(1L, n / 4)
      src -> ((n, k, ordered((k - 1).toInt)._2))
    }
    assert(got == expected)
  }
}
