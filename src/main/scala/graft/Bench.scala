package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
object Bench {
  /** Fixed headline subset: one representative per operator family. The
    * stdout line must fit the driver's 2 KB output-tail window, so the
    * full 175-query map goes to BENCH_DETAIL.json and stdout carries
    * only these plus the suite total. */
  val Headline: Seq[String] = Seq(
    "q_scan", "q_filter_project", "q_agg_group", "q_agg_distinct",
    "q_agg_median", "q_join_inner", "q_join_broadcast", "q_join_asof_native",
    "q_join_bloom", "q_window_rank", "q_sessionize", "q_dedup_exact",
    "q_dedup_minhash", "q_dedup_pairs", "q_dedup_simhash", "q_dedup_hamming",
    "q_sim_topk", "q_ann_ivf", "q_text_tokens", "q_quality_score", "q_tfidf",
    "q_stream_tumble", "q_sql_q3", "q_unpivot", "q_histogram_eqdepth",
    "q_bigram_lm")

  /** Hard budget for the stdout line, below the driver's 2 KB tail.
    * BenchLineSpec asserts the worst-case rendered line stays under it. */
  val MaxStdoutLineBytes = 1900

  private def jstr(s: String) = Jsons.jstr(s)
  private def r3(v: Double) = math.rint(v * 1000) / 1000
  private def qmap(rs: Iterable[(String, Double)]) =
    rs.map { case (k, v) => jstr(k) + ":" + r3(v) }.mkString("{", ",", "}")

  /** One error entry, budgeted AFTER escaping and in UTF-8 BYTES: the
    * driver's tail window is a byte count, and a message quoting
    * corpus text (CJK, emoji) renders up to 4 bytes per char while
    * passing through jstr unescaped — a char-counted budget would let
    * three such errors blow the line past the window. Shrinking the
    * RAW message (not the rendering) also avoids splitting a \uXXXX
    * escape mid-sequence. */
  private def errEntry(k: String, e: String): String = {
    var raw = e.take(200)
    while (jstr(raw).getBytes("UTF-8").length > 202 && raw.nonEmpty)
      raw = raw.dropRight(8)
    jstr(k) + ":" + jstr(raw)
  }

  private def errEntries(results: Seq[(String, (Double, Option[String]))]) =
    results.collect { case (k, (_, Some(e))) => errEntry(k, e) }

  /** The single stdout line the driver parses. Inline errors are capped
    * at 3 (full detail still lands in BENCH_DETAIL.json) with the total
    * failure count always carried, so even a catastrophic run stays
    * inside the tail window.
    *
    * `value`/`n_queries` count SUCCEEDED queries only: a failed query
    * aborts in ~0.1 s, so summing it in would make a broken round read
    * as a speedup in round-over-round artifact diffs (the r5 lesson —
    * 28 analysis-time failures shrank the total by ~17 s while delivered
    * coverage dropped 15%). `n_errors` carries the failure count. */
  def headlineLine(results: Seq[(String, (Double, Option[String]))],
                   sfDir: String): String = {
    val errors = errEntries(results)
    val errField =
      if (errors.isEmpty) ""
      else errors.take(3).mkString(s""",\"errors\":{""", ",", "}")
    val ok = results.filter(_._2._2.isEmpty)
    // headline map draws from SUCCEEDED queries only — a failed query
    // aborts in ~0.1 s, and surfacing that as an ordinary duration would
    // let a driver reading the map mistake a broken headline query for a
    // fast success (its failure still shows in n_errors/errors)
    val byName = ok.toMap
    val head = Headline.flatMap(n => byName.get(n).map(n -> _._1))
    val total = r3(ok.map(_._2._1).sum)
    s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${ok.size},"n_errors":${results.size - ok.size},"queries":${qmap(head)}$errField,"sf":${jstr(sfDir)}}"""
  }

  /** Full per-query map for the judge — no size constraint. Same
    * succeeded-only `value`/`n_queries` semantics as the headline. */
  def detailLine(results: Seq[(String, (Double, Option[String]))],
                 sfDir: String): String = {
    val errors = errEntries(results)
    val errFieldFull =
      if (errors.isEmpty) "" else errors.mkString(",\"errors\":{", ",", "}")
    val ok = results.filter(_._2._2.isEmpty)
    val total = ok.map(_._2._1).sum
    s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${ok.size},"n_errors":${results.size - ok.size},"queries":${qmap(ok.map { case (k, v) => k -> v._1 })}$errFieldFull,"sf":${jstr(sfDir)}}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    // test tables are single parquet files; the small maxPartitionBytes
    // splits them so scans use every core (at cluster scale files are
    // already multi-block)
    val spark = Graft.localSession(cpus.toInt, "graft-bench",
      Map("spark.sql.files.maxPartitionBytes" -> "4m"))
    // Opt-in local-iteration filter (comma-separated query names). The
    // driver never sets it, so per-round runs always cover the suite.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val queries = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None        => SparkEntry.queries
    }
    // noop sink: full evaluation of every column (count() would let the
    // optimizer prune the very projections being measured), zero I/O cost.
    // A failed query must NOT be indistinguishable from a fast one: record
    // the error and surface it in the JSON line.
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Option[String]) = {
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case t: Throwable =>
          Some(s"${t.getClass.getSimpleName}: ${Option(t.getMessage).getOrElse("")}")
        }
      ((System.nanoTime() - t0) / 1e9, err)
    }
    // Warmup pass JITs the scan/shuffle/codegen infrastructure so early
    // queries don't absorb one-time JVM cost; one measured pass; then the
    // slow tail (>0.8 s) is re-measured and the MIN kept — profiling
    // showed single samples there carry 2-5x scheduler/GC noise (e.g.
    // q_bigram_lm 4.5 s sampled once vs 0.8 s steady-state), and the
    // re-measure pass costs seconds, not another full suite.
    queries.foreach { case (_, fn) => once(fn) }
    val pass1 = queries.map { case (name, fn) => name -> once(fn) }
    val results = pass1.map { case (name, (t1, e1)) =>
      if (t1 <= 0.8 || e1.isDefined) name -> (t1, e1)
      else {
        val (t2, e2) = once(queries(name))
        // keep the min ONLY over error-free runs: a flaky failed
        // re-measure must not replace a full successful measurement
        // with its short duration and flag the query failed
        if (e2.isDefined) name -> (t1, e1)
        else name -> (math.min(t1, t2), None)
      }
    }.toSeq
    // Anchor the detail file to the repo root (or an explicit override),
    // not the process cwd — a bench launched elsewhere must not drop the
    // judge's detail file in a random directory while stdout claims
    // success.
    val detailDir = sys.env.get("SPARK_GRAFT_BENCH_DETAIL_DIR")
      .orElse(sys.env.get("SPARK_GRAFT_REPO"))
      .getOrElse {
        val cwd = Paths.get("").toAbsolutePath
        if (Files.exists(cwd.resolve("build.sbt"))) cwd.toString
        else "/root/repo"
      }
    // The headline prints BEFORE the detail write: the stdout line is
    // the driver's only record of the run, and a bad detail dir (env
    // override pointing nowhere, read-only fs) throwing after a full
    // measured suite must not replace that record with a stack trace.
    val line = headlineLine(results, sfDir)
    println(line)
    try {
      val dir = Paths.get(detailDir)
      Files.createDirectories(dir)
      Files.writeString(dir.resolve("BENCH_DETAIL.json"),
        detailLine(results, sfDir))
    } catch { case t: Throwable =>
      System.err.println(s"BENCH: detail write to $detailDir failed: " +
        s"${t.getMessage} (headline already printed)")
    }
    val errors = errEntries(results)
    if (errors.nonEmpty)
      System.err.println(s"BENCH: ${errors.size} queries FAILED (see errors field)")
    spark.stop()
  }
}
