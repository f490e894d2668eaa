package graft.queries

import org.apache.spark.sql.functions._

/** The crash-resume contract of the streaming index-upkeep jobs
  * (q_stream_semantic_index_maintain / q_stream_pq_index_maintain /
  * q_stream_index_maintain): two separate AvailableNow runs over a
  * GROWING drop directory share ONE checkpoint, so a restart after a
  * crash must skip already-ingested files via the restored source
  * offsets and append only the new batch — never double-append the
  * corpus. Exercised through the map-only semantic bandify transform
  * the gated query streams, with a real parquet file sink.
  */
class IndexUpkeepResumeSpec extends graft.SparkSpec {

  test("index upkeep resumes from its checkpoint instead of " +
      "double-appending the corpus") {
    import spark.implicits._
    val dim = 64
    def vec(seed: Int): Array[Double] =
      Array.tabulate(dim)(i => math.sin(seed * 31 + i))
    def rn(v: Array[Double]): Double =
      math.sqrt(v.map(x => x * x).sum)
    val reps = Array(
      (10L, vec(1), rn(vec(1))),
      (20L, vec(2), rn(vec(2))))
    val dataDir = java.nio.file.Files.createTempDirectory("graft_idxr_in_")
    val root = java.nio.file.Files.createTempDirectory("graft_idxr_out_")
    try {
      val (out, ck) = (s"$root/out", s"$root/ck")
      val t0 = System.currentTimeMillis()
      val corpus = (0 until 5)
        .map(i => (i.toLong, vec(100 + i).toSeq, 0))
        .toDF("vec_id", "v", "ingest_day")
      Relational.stageStreamFile(corpus, dataDir, "0_vecs.parquet",
        t0 - 90000)
      val schema = spark.read.parquet(s"$dataDir/0_vecs.parquet").schema
      def drainOnce(): Unit = {
        val raw = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(dataDir.toString)
        Relational.drainStreamToParquet(
          Ext.semanticBandifyLiteral(raw, reps, bits = 3), out, ck)
      }
      // run 1: corpus only
      drainOnce()
      val afterRun1 = spark.read.parquet(out)
      val bands = afterRun1.count() / 5
      assert(bands >= 1 && afterRun1.count() == 5 * bands,
        s"unexpected run-1 rows: ${afterRun1.count()}")
      // the "crash": the upkeep process dies; a new day's batch lands
      val batch = Seq((1000001L, vec(200).toSeq, 1),
          (1000002L, vec(201).toSeq, 1))
        .toDF("vec_id", "v", "ingest_day")
      Relational.stageStreamFile(batch, dataDir, "1_vecs.parquet",
        t0 - 30000)
      // run 2, SAME checkpoint: must ingest only the batch file
      drainOnce()
      val idx = spark.read.parquet(out)
      assert(idx.count() == 7 * bands,
        s"double-append: ${idx.count()} rows for 7 vectors x $bands")
      // exactly one row per (vec_id, band) — the corpus was not replayed
      assert(idx.groupBy(col("vec_id"), col("band")).count()
        .filter(col("count") > 1).count() == 0)
      assert(idx.filter(col("ingest_day") === 0).count() == 5 * bands)
      // and a third run with nothing new is a no-op
      drainOnce()
      assert(spark.read.parquet(out).count() == 7 * bands)
    } finally {
      Relational.deleteRecursive(dataDir)
      Relational.deleteRecursive(root)
    }
  }
}
