package graft

import org.apache.spark.sql.functions._

/** Contract tests for the trained PQ codebooks (per-subspace Lloyd,
  * `q_pq_train` family — the production quantizer the medoid book
  * anchors):
  *
  *  1. the code BUDGET is preserved: training refines codewords, it
  *     never adds/drops one — every subspace keeps exactly the medoid
  *     book's K codeword ids (the empty-cluster keep rule);
  *  2. Lloyd monotonicity: the gated per-subspace quantization MSE is
  *     strictly better (or equal) for the trained book in EVERY
  *     subspace — `improved` is the training's contract;
  *  3. the trained-ADC probe stays top-k-shaped: AnnK rows per query,
  *     rank-ordered by (adc, vec_id), adc non-negative;
  *  4. the 50-query recall-gain row is internally consistent: recalls
  *     are the hit counts over n_q * k, hits bounded by n_q * k.
  */
class PqTrainedSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("broadcast PQ encode is bit-identical to the literal form and " +
      "keeps the plan bytes-sized at production book widths") {
    import spark.implicits._
    // synthetic K=64, M=8, sub=8 book — deterministic closed form
    def w(j: Int, k: Int): Array[Double] =
      (0 until 8).map(i => ((j * 31 + k * 17 + i * 7) % 23) / 7.0).toArray
    val book: Map[Int, Array[(Long, Array[Double])]] =
      (0 until 8).map(j => j ->
        (0 until 64).map(k => (k.toLong * 3 + 1, w(j, k))).toArray).toMap
    val vecs = (0 until 500).map { n =>
      (n.toLong, (0 until 64).map(i =>
        ((n * 13 + i * 5) % 29) / 9.0).toArray.toSeq, n % 2)
    }.toDF("vec_id", "v", "ingest_day")
    val lit = graft.queries.Ext.pqEncodeLiteral(vecs, book)
    val bc = spark.sparkContext.broadcast(
      (0 until 8).map(book(_)).toArray)
    val bcd = graft.queries.Ext.pqEncodeBroadcast(vecs, bc)
    // bit-identical codes, row for row (ties included: equidistant
    // codewords must resolve to the same smaller cid in both forms)
    val a = lit.orderBy(col("vec_id")).collect().toSeq
    val b = bcd.orderBy(col("vec_id")).collect().toSeq
    assert(a == b, "broadcast codes diverge from the literal anchor")
    // every vec hit a real codeword id
    assert(b.forall(r => (1 to 8).forall(i => r.getLong(i) % 3 == 1)))
    // the plan-size contract: the literal plan carries K x M x sub
    // codeword doubles as Literal NODES (4096 here, ~4M at a
    // production 256 x 16 x 1024 book — all serialized into every
    // task binary); the broadcast plan carries a handle and only
    // bookkeeping literals. Count the nodes — plan toString truncates,
    // so string length can't pin this.
    // counted on the ANALYZED plan: the optimizer folds a projection
    // over this in-memory test relation into a LocalRelation, but a
    // real scan (the streaming source) keeps the projection — and its
    // literals — in every task
    def literals(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.expressions.map(_.collect {
        case l: org.apache.spark.sql.catalyst.expressions.Literal => l
      }.size).sum
    val (nLit, nBc) = (literals(lit), literals(bcd))
    assert(nLit >= 64 * 8 * 8, s"literal plan should carry the book: $nLit")
    assert(nBc < 100, s"broadcast plan still carries literals: $nBc")
  }

  test("training preserves the code budget: same (subspace, codeword) " +
      "key set as the medoid book") {
    val book = SparkEntry.queries("q_pq_train")(spark, d)
    val reps = spark.read.parquet(s"$d/embeddings.parquet")
      .groupBy(col("label")).agg(min(col("vec_id")).as("rep_id"))
      .select(col("rep_id")).collect().map(_.getLong(0)).toSet
    val perJ = book.groupBy(col("j"))
      .agg(countDistinct(col("cid")).as("k"), count(lit(1)).as("n"))
      .collect()
    assert(perJ.length == 8, perJ.toSeq)
    perJ.foreach { r =>
      assert(r.getLong(1) == reps.size && r.getLong(2) == reps.size,
        s"subspace ${r.get(0)}: ${r.getLong(1)} codewords, expected " +
          s"${reps.size}")
    }
    val cids = book.select(col("cid")).distinct().collect()
      .map(_.getLong(0)).toSet
    assert(cids == reps, s"codeword ids drifted from the rep set: " +
      s"${cids.diff(reps)} / ${reps.diff(cids)}")
  }

  test("Lloyd monotonicity: trained MSE <= medoid MSE in every subspace") {
    val rows = SparkEntry.queries("q_pq_distortion")(spark, d).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val (med, tr) = (r.getDouble(1), r.getDouble(2))
      assert(tr <= med, s"subspace ${r.getLong(0)}: $tr > $med")
    }
  }

  test("trained ADC probe is top-k-shaped and rank-consistent") {
    val rows = SparkEntry.queries("q_pq_adc_trained")(spark, d).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 5L).toSet)
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 5, s"query $q: ${rs.length} rows")
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to 5L),
        s"query $q ranks: ${sorted.map(_.getLong(1)).toSeq}")
      val adcs = sorted.map(_.getDouble(3))
      assert(adcs.forall(_ >= 0.0), s"negative adc for query $q")
      assert(adcs.zip(adcs.tail).forall { case (a, b) => a <= b },
        s"query $q adc not ascending: ${adcs.toSeq}")
    }
  }

  test("recall-gain row is internally consistent") {
    val r = SparkEntry.queries("q_pq_recall_gain")(spark, d).head
    val (nQ, hm, ht) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nQ == 50)
    assert(hm >= 0 && hm <= nQ * 5 && ht >= 0 && ht <= nQ * 5)
    assert(math.abs(r.getDouble(3) - hm.toDouble / (nQ * 5)) < 1e-6)
    assert(math.abs(r.getDouble(4) - ht.toDouble / (nQ * 5)) < 1e-6)
  }
}
