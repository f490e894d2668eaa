package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale-stress harness: synthesizes an N-fold blowup of the
  * sf0.1 tables into a temp dir, times a representative expensive-query
  * set at 1x and Nx on identical code paths, and reports per-query
  * scaling exponents (log_N of the time ratio — 1.0 = perfectly linear)
  * plus the connected-components round count at both scales. This turns
  * the "100 TB-shaped" design claims (bucketed LSH, pointer-doubling CC
  * rounds, rank-selection pushdown) into measured evidence; results are
  * summarized in BASELINE.md.
  *
  * Replicas are SELF-SIMILAR, not copies: replica r offsets every key
  * space and rotates document text through a per-replica substitution
  * cipher, so shingle/token sets of different replicas are disjoint —
  * near-dup structure repeats N times instead of every document gaining
  * N-1 artificial twins (which would quadratically inflate pair counts
  * and measure a different workload). Embedding vectors get a
  * per-replica constant shift for the same reason.
  *
  * Usage:
  *   runMain graft.ScaleStress [srcSfDir] [workDir] [replicas]
  *     [queryCsv] [factTableCsv]
  * The optional subsets serve deep (100x+) runs where synthesizing
  * every fact table would dominate the wall clock; queries given must
  * only touch the listed tables. SPARK_GRAFT_SCALE_OUT overrides the
  * SCALE_STRESS.json output path.
  */
object ScaleStress {

  private val Dims = Seq("region", "nation", "customer", "supplier", "part")

  /** Lowercase alphabet rotated by r — a deterministic text transform
    * that preserves length, token boundaries, and intra-replica dup
    * structure while making cross-replica shingles disjoint.
    */
  private def rot(r: Int): String = {
    val a = "abcdefghijklmnopqrstuvwxyz"
    val k = ((r % 26) + 26) % 26
    a.substring(k) + a.substring(0, k)
  }

  private def replica(spark: SparkSession, src: String, table: String,
      r: Int): DataFrame = {
    val df = spark.read.parquet(s"$src/$table.parquet")
    val off = r * 1000000000L
    table match {
      case "documents" =>
        df.withColumn("doc_id", col("doc_id") + lit(off))
          .withColumn("text",
            translate(col("text"), "abcdefghijklmnopqrstuvwxyz", rot(r)))
      case "embeddings" =>
        df.withColumn("vec_id", col("vec_id") + lit(off))
          .withColumn("embedding",
            transform(col("embedding"),
              x => (x + lit(r * 1e-3)).cast("float")))
      case "orders" =>
        // orderkey offsets in lockstep with lineitem preserve the FK;
        // custkey stays put — scale grows data per key, not key count
        df.withColumn("o_orderkey", col("o_orderkey") + lit(off))
      case "lineitem" =>
        df.withColumn("l_orderkey", col("l_orderkey") + lit(off))
      case "events" =>
        // user_id offsets too: events replicas must be SELF-SIMILAR
        // (more users, not N-fold denser per-user activity in the same
        // time span) — shared users made every per-user time-window
        // workload quadratic in replicas: the interval join's matches
        // grew ~N^2 (each left event saw every replica's clicks in its
        // window), sessions collapsed as gaps filled in, and the
        // measured exponent tracked the inflated OUTPUT, not the
        // operator (interval drain read 1.08 at 100x on the shared-user
        // corpus; the self-similar corpus measures the operator)
        df.withColumn("event_id", col("event_id") + lit(off))
          .withColumn("user_id", col("user_id") + lit(off))
      case _ => df
    }
  }

  private val Facts = Seq("documents", "embeddings", "orders", "lineitem",
    "events")

  /** Bump whenever [[replica]]'s transform changes: a synthesized corpus
    * carries this version in its manifest, and a stale corpus (older
    * transform, different src, different replica count) is re-synthesized
    * instead of silently reused — exponents measured on the wrong data
    * are worse than no exponents.
    */
  private val SynthVersion = 2

  private def manifestFor(src: String, replicas: Int): String =
    s"""{"src":"$src","replicas":$replicas,"synth_version":$SynthVersion}"""

  /** A table synthesis is reusable iff its _SUCCESS marker landed — a
    * partial write (killed run) has no marker and is re-synthesized.
    * Deep (100x+) sweeps iterate on the QUERY set far more often than
    * on the corpus, and re-synthesizing 500 k docs per iteration would
    * dominate the wall clock. The dir-level _MANIFEST.json guards WHAT
    * the tables were synthesized from; a missing or mismatched manifest
    * wipes the dir (`rm -rf <work>` still forces a fresh corpus by hand).
    */
  private def done(dst: String, t: String): Boolean =
    Files.exists(Paths.get(s"$dst/$t.parquet/_SUCCESS"))

  private def deleteRecursive(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      val st = Files.list(p)
      try {
        val it = st.iterator()
        while (it.hasNext) deleteRecursive(it.next())
      } finally st.close()
    }
    Files.deleteIfExists(p)
  }

  private def synth(spark: SparkSession, src: String, dst: String,
      replicas: Int, facts: Seq[String]): Unit = {
    val mp = Paths.get(s"$dst/_MANIFEST.json")
    val want = manifestFor(src, replicas)
    if (Files.exists(Paths.get(dst))) {
      val have = if (Files.exists(mp)) Files.readString(mp) else "<missing>"
      if (have != want) {
        System.err.println(
          s"SCALE corpus at $dst is stale or unmarked ($have != $want)" +
            " — wiping and re-synthesizing")
        deleteRecursive(Paths.get(dst))
      }
    }
    Files.createDirectories(Paths.get(dst))
    for (t <- Dims if !done(dst, t))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    for (t <- facts if !done(dst, t)) {
      (0 until replicas).map(replica(spark, src, t, _))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    Files.writeString(mp, want)
  }

  /** The stress set: the suite's most expensive queries plus the
    * LSH/CC/ANN pipelines whose scale shape the design claims hinge on.
    */
  private val StressQueries = Seq(
    // ranged-quantile family (rank-selection pushdown; round 12 adds
    // the single-scan MAD — the deviation histogram must track distinct
    // values, not raw rows — and the map-only quantile remap apply)
    "q_agg_median", "q_winsorize", "q_outlier_iqr", "q_quantile_disc",
    "q_histogram_eqdepth", "q_outlier_mad", "q_quantile_remap",
    // text/gram pipelines (agg-before-shuffle shapes)
    "q_ngram_novelty", "q_substring_dup", "q_bigram_lm", "q_bm25",
    // near-dup pipelines (banded LSH, never all-pairs)
    "q_dedup_minhash", "q_dedup_pairs", "q_dedup_clusters", "q_dedup_hamming",
    "q_dedup_hamming64",
    // ANN (bucketed, never brute-force at scale) + PQ compression
    // (round 9 adds the TRAINED codebook fit + probe; round 11 the
    // persisted book+codes round-trip and the fused recall-vs-K sweep)
    "q_sim_topk", "q_ann_lsh", "q_ann_ivf", "q_pq_assign", "q_pq_adc",
    "q_pq_train", "q_pq_adc_trained", "q_pq_index_persist",
    "q_pq_codebook_sweep",
    // stateful sessionization over events
    "q_sessionize",
    // round-6/7 additions over documents (histogram offsets + ranged
    // boundary prefix; per-source gate; pair-graph provenance; length
    // batching)
    "q_token_budget_select", "q_quality_gate_per_source",
    "q_dedup_cross_source", "q_dedup_cross_incremental",
    "q_dedup_index_persist",
    "q_batch_by_length",
    // adaptive-occupancy semantic dedup (the production path; the exact
    // within-cell variant measured 1.22 at 100x and is excluded here —
    // its saturation row is recorded in BASELINE.md) + its daily form
    // + the disk-persisted standing index (round 11)
    "q_dedup_semantic_scaled", "q_dedup_semantic_incremental",
    "q_dedup_semantic_index_persist",
    // multimodal fan-out pipelines (frame fan-out, batched decode,
    // overlapping windows, stride resample) — the row-multiplying
    // family, measured per round since round 8
    "q_frames", "q_image_features", "q_audio_windows", "q_media_resize",
    // round-13 additions: trained coarse quantizer, incremental CC,
    // the unified snapshot table, typed/Morton zone-map deletes, and
    // the streamed resize-on-doubling lifecycle
    "q_ann_ivf_trained", "q_dedup_clusters_incremental",
    "q_snapshot_time_travel", "q_zonemap_delete_date",
    "q_zonemap_delete_zorder", "q_stream_semantic_rebits",
    // round-13 snapshot-table completion: COW merge, exactly-once
    // streaming ingest + compaction, O(metadata) MOR delete, O(delta)
    // changes feed, metadata-only aggregates, schema evolution, and
    // incremental view maintenance
    "q_snapshot_merge", "q_snapshot_stream_ingest",
    "q_snapshot_mor_delete", "q_snapshot_changes",
    "q_snapshot_stats_agg", "q_snapshot_schema_evolve",
    "q_snapshot_incremental_agg", "q_snapshot_compact_small",
    "q_snapshot_index_sync",
    // round-14 additions: pyramid-PLANNED keyed rewrites (the row that
    // proves touched-file detection no longer tracks table size),
    // typed string/date and Morton envelopes in the unified format,
    // the O(batch) merge-on-read upsert, and the checkpointed
    // changes-feed stream driving the maintained aggregate
    "q_snapshot_planned_rewrite", "q_snapshot_prune_date",
    "q_snapshot_zorder", "q_snapshot_mor_merge",
    "q_stream_snapshot_changes", "q_snapshot_bloom_delete",
    "q_stream_snapshot_upsert",
    // round-15 additions: Catalyst-pushdown reads of the snapshot
    // table, the O(metadata) predicate MOR delete and partition drop,
    // and string-key blooms — each a planning path whose cost must
    // track the DELTA or the metadata, not the table
    "q_snapshot_sql_prune", "q_snapshot_mor_delete_pred",
    "q_snapshot_part_drop", "q_snapshot_bloom_delete_str",
    "q_snapshot_agg_push",
    // round-16 additions: the DSv2 WRITE path (SQL-path append +
    // abort + exactly-once replay), SQL DML by name (catalog INSERT +
    // tombstone-routed DELETE), and bloom-probed point/IN lookups
    // through the Catalyst read path
    "q_snapshot_sql_write", "q_snapshot_sql_delete",
    "q_snapshot_sql_point", "q_snapshot_join_prune",
    "q_snapshot_runtime_filter")

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = args.drop(1).headOption.getOrElse("/tmp/graft_scale")
    val replicas = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    // replicas=1 would make dN the same directory as x1 and the scaling
    // exponent log(ratio)/log(1) = ±Infinity, which renders as invalid
    // JSON (and a duplicated "x1" cc_rounds key) — fail up front
    require(replicas >= 2,
      s"replicas must be >= 2 (x1 is the baseline); got $replicas")
    // optional subsets for deep (100x+) runs where blowing up every
    // fact table would dominate the wall clock: arg4 = query csv,
    // arg5 = fact-table csv (queries must only touch listed tables)
    val stressSet = args.drop(3).headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(StressQueries)
    val facts = args.drop(4).headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Facts)
    val spark = Graft.localSession(32, "graft-scale",
      Map("spark.sql.files.maxPartitionBytes" -> "4m",
        // the drain queries end in a memory sink (collect-shaped by
        // construction — the MEASUREMENT harness, not the operator);
        // at 100x their linear outputs pass the default 1g result cap
        "spark.driver.maxResultSize" -> "16g"))
    // events.ts generations vary (TIMESTAMP(NANOS) vs timestamp[us]); the
    // legacy conf makes a nanos source readable as INT64, and the replica
    // round-trips whichever physical type it read — Tables.events branches
    // on the replica's actual schema either way
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val d1 = s"$work/x1"
    val dN = s"$work/x$replicas"
    synth(spark, src, d1, 1, facts)
    synth(spark, src, dN, replicas, facts)

    // A single failed query (OOM at the deep scale after hours of
    // synthesis) must not abort the run and lose every other
    // measurement: failures record NaN (rendered as an "error" entry)
    // and the sweep continues.
    def run(name: String, dir: String): Double =
      try {
        // each pass must pay the full pipeline build: the shared pair
        // graph and quantile stat cores are memoized per (session, dir)
        // for the verify/bench suites, and a cache hit here would
        // hollow out the exponent
        graft.queries.Ext.invalidatePairGraph()
        graft.queries.Ext.invalidatePqTrained()
        graft.queries.Ext.invalidateIvfAssign()
        graft.queries.Relational.invalidateStatCores()
        graft.queries.Relational.invalidatePrologues()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case t: Throwable =>
          System.err.println(s"SCALE $name FAILED in $dir: ${t.getMessage}")
          Double.NaN
      }
    // JIT/codegen warmup on the small dir
    stressSet.foreach(run(_, d1))
    // min of two passes per scale (NaN-propagating: any failed pass
    // marks the query failed) — same noise protocol as Bench
    val results = stressSet.map { name =>
      val t1 = math.min(run(name, d1), run(name, d1))
      val tN = math.min(run(name, dN), run(name, dN))
      val expo = math.log(tN / t1) / math.log(replicas.toDouble)
      println(f"SCALE $name%-22s x1=$t1%7.2fs x$replicas=$tN%7.2fs exponent=$expo%5.2f")
      (name, t1, tN, expo)
    }
    // CC rounds at both scales: the O(log diameter) observable
    def ccRounds(dir: String): Int = {
      val pairs = SparkEntry.queries("q_dedup_pairs")(spark, dir)
      graft.ops.Clusters.connectedComponentsWithRounds(
        pairs, "id_a", "id_b")._2
    }
    val cc =
      if (facts.contains("documents")) {
        try {
          val (r1, rN) = (ccRounds(d1), ccRounds(dN))
          println(s"SCALE cc_rounds x1=$r1 x$replicas=$rN")
          s""","cc_rounds":{"x1":$r1,"x$replicas":$rN}"""
        } catch { case t: Throwable =>
          System.err.println(s"SCALE cc_rounds FAILED: ${t.getMessage}")
          ""
        }
      } else ""
    def num(v: Double, scale: Int) =
      if (v.isNaN || v.isInfinite) "\"error\""
      else (math.rint(v * scale) / scale).toString
    val json = results.map { case (n, t1, tN, e) =>
      s""""$n":{"t1":${num(t1, 1000)},"t$replicas":${num(tN, 1000)},"exponent":${num(e, 100)}}"""
    }.mkString("{", ",", s"$cc}")
    // anchor to the repo root (or an explicit override), not the cwd —
    // same rule as Bench's detail file: a run launched elsewhere must
    // not leave the committed results file silently stale
    val outFile = sys.env.get("SPARK_GRAFT_SCALE_OUT").getOrElse {
      val cwd = Paths.get("").toAbsolutePath
      val root = if (Files.exists(cwd.resolve("build.sbt"))) cwd.toString
        else "/root/repo"
      s"$root/SCALE_STRESS.json"
    }
    Files.writeString(Paths.get(outFile), json)
    println(s"SCALE done -> $outFile")
    spark.stop()
  }
}
