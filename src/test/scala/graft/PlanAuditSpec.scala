package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{GlobalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.window.WindowExec

/** Physical-plan regression tests: the scale properties the queries
  * claim (pushdown, pruning, broadcast, top-k, no cartesian joins) are
  * asserted on the actual executed plans, so a refactor that silently
  * turns a broadcast join into a cartesian product fails CI, not a
  * 1000-executor run.
  */
class PlanAuditSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  /** (executed physical plan, formatted explain) after materialization,
    * so AQE has finalized its runtime re-plan. Codegen spans show as
    * `*(n)` prefixes in the executed plan; the formatted explain carries
    * untruncated PushedFilters/ReadSchema.
    */
  private def planOf(name: String): (String, () => String) = {
    val df = SparkEntry.queries(name)(spark, d)
    df.collect() // materialize so AQE finalizes its plan
    val executed = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p: SparkPlan => p
    }
    // the formatted explain re-traverses and re-renders the whole
    // finalized plan; only two tests read it, while the ~178-query
    // no-cartesian sweep discards it — so it renders on demand, not
    // eagerly per query
    (executed.toString,
      () => df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
  }

  /** Like [[planOf]] but also hands back the finalized plan TREE, for
    * assertions on logical structure (node types, counts) that must not
    * break when a Spark version changes the rendered string format.
    */
  private def planAndTreeOf(name: String): (String, SparkPlan) = {
    val df = SparkEntry.queries(name)(spark, d)
    df.collect()
    val executed = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p: SparkPlan => p
    }
    (executed.toString, executed)
  }

  /** Leaf parquet scans that do fresh IO: file-source scan nodes in the
    * executed tree (including subquery plans), NOT descending into
    * reused-exchange subtrees — a reused exchange replays buffered rows,
    * it does not re-scan.
    */
  private def freshScanCount(p: SparkPlan): Int = {
    val self = p match {
      case _: org.apache.spark.sql.execution.FileSourceScanExec => 1
      case _ => 0
    }
    val kids: Seq[SparkPlan] = p match {
      case _: ReusedExchangeExec    => Seq.empty
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case _                        => p.children
    }
    self + (kids ++ p.subqueries).map(freshScanCount).sum
  }

  test("driver t1 contract: entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("filters and projections reach the parquet scan") {
    val (_, fThunk) = planOf("q_filter_project")
    val f = fThunk()
    assert(f.contains("EqualTo(l_returnflag,R)"), f.take(3000))
    assert(f.contains("GreaterThan(l_quantity,30.0)"), f.take(3000))
    // column pruning: the scan never reads l_tax
    val readSchema = f.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.nonEmpty && !readSchema.contains("l_tax"), readSchema)
  }

  test("small-dimension join broadcasts, big side does not shuffle") {
    val (p, _) = planOf("q_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    val (p, _) = planOf("q_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("no query plans a cartesian product or nested-loop join") {
    // the broadcast query batch in the sim/ann queries is the one sanctioned
    // nested-loop (5-row build side); q_cross_join is the explicit
    // tiny-x-tiny cartesian; everything else must be hash/merge
    val exempt = Set("q_sim_topk", "q_ann_lsh", "q_dedup_cosine",
      "q_dedup_jaccard", "q_cross_join")
    for (name <- SparkEntry.queries.keys if !exempt(name)) {
      val (p, _) = planOf(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian")
    }
  }

  test("range join is a bucketed equi-join, never a cartesian") {
    val (p, _) = planOf("q_join_range")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(p.contains("Join") && p.contains("bkt"), p.take(3000))
  }

  test("aggregations partial-aggregate map-side before the shuffle") {
    val (p, _) = planOf("q_agg_group")
    // two HashAggregate levels around one Exchange = map-side combine
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
    assert(p.contains("partial_sum"), p.take(2000))
  }

  test("whole-stage codegen covers the hot path of the flagship query") {
    val (p, _) = planOf("q_agg_group")
    // codegen'd stages carry the `*(n)` prefix in the executed plan
    assert(p.contains("*("), p.take(2000))
  }

  test("star join broadcasts every dimension — single fact pass") {
    val (p, _) = planOf("q_join_multi")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 3, p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("shared-SQL query plans identically to DataFrame idioms") {
    val (p, _) = planOf("q_sql_q3")
    // the SQL front end must land on the same physical operators:
    // broadcast joins below a TakeOrderedAndProject, no cartesian
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("native minhash signing is map-only: no aggregation shuffle") {
    val (p, _) = planOf("q_dedup_minhash")
    // the fused minhash_sig expression signs per-row; like simhash16,
    // the only exchange allowed is the output-ORDER-BY rangepartitioning
    assert(!p.contains("Exchange hashpartitioning"), p.take(2000))
    assert(!p.contains("HashAggregate"), p.take(2000))
    assert(p.contains("minhash_sig"), p.take(2000))
  }

  test("native simhash signing is map-only: no aggregation shuffle") {
    val (p, _) = planOf("q_dedup_simhash")
    // the only exchange allowed is the rangepartitioning for the
    // deterministic output ORDER BY — signing itself must not shuffle
    assert(!p.contains("Exchange hashpartitioning"), p.take(2000))
    assert(!p.contains("HashAggregate"), p.take(2000))
  }

  test("chunking is a pure map-side generator") {
    val (p, _) = planOf("q_chunk_overlap")
    assert(!p.contains("Exchange hashpartitioning"), p.take(2000))
  }

  test("decontamination broadcasts the eval side; the train scan never shuffles its text") {
    val (p, _) = planOf("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("tf-idf computes document frequency without re-scanning the token explosion") {
    val (p, _) = planOf("q_tfidf")
    // df is a COUNT window over the tf rows: exactly one generate
    // (explode) in the whole plan, no distinct-aggregate second pass,
    // no join for df (only the sanctioned 1-row n_docs broadcast)
    assert("Generate explode".r.findAllIn(p).size == 1, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("Window"), p.take(2000))
  }

  test("embedding quantization is map-only") {
    val (p, _) = planOf("q_embed_quant")
    assert(!p.contains("Exchange hashpartitioning"), p.take(2000))
    assert(!p.contains("HashAggregate"), p.take(2000))
  }

  test("rank-filter top-k per group prunes via WindowGroupLimit") {
    val (p, _) = planOf("q_window_group_limit")
    // Spark 4 rewrites rank <= k into a WindowGroupLimit that keeps k
    // rows per group before the full window sort
    assert(p.contains("WindowGroupLimit"), p.take(3000))
  }

  test("bloom semi join prefilters the big side below its shuffle") {
    val (p, _) = planOf("q_join_bloom")
    // the might_contain predicate must sit in the lineitem scan stage,
    // i.e. appear in a Filter BEFORE any exchange — pruning shuffle
    // input is the entire point of building the sketch
    val filterLine = p.linesIterator
      .filter(l => l.contains("Filter") && l.contains("might_contain"))
      .mkString
    assert(filterLine.nonEmpty, p.take(3000))
    assert(p.contains("ObjectHashAggregate") || p.contains("HashAggregate"),
      p.take(3000)) // the sketch itself is built by a distributed agg
  }

  test("winsorize: map-side bucket_idx core, fences broadcast back") {
    val (p, _) = planOf("q_winsorize")
    // the ranged core assigns value buckets with the native bucket_idx
    // expression (no repartitionByRange exchange of the relation), and
    // the computed fences come back as a broadcast join
    assert(p.contains("bucket_idx"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("OOV gate: vocabulary applies as a broadcast anti-join") {
    val (p, _) = planOf("q_oov_rate")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      p.take(3000))
  }

  test("CMS probes address a broadcast counter table") {
    val (p, _) = planOf("q_sketch_cms")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.contains("partial_sum"), p.take(3000)) // distributed build
  }

  test("incremental dedup broadcasts the batch band index") {
    val (p, _) = planOf("q_dedup_incremental")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  /** The persist queries materialize their probes eagerly (the r11
    * listing-snapshot ADVICE fix), so their final executed plan is a
    * Scan ExistingRDD; the probe's JOIN SHAPE is audited on the
    * pre-checkpoint probe hooks over the same on-disk artifacts.
    */
  private def diskProbePlan(gated: String,
      probe: () => org.apache.spark.sql.DataFrame): String = {
    SparkEntry.queries(gated)(spark, d).collect() // writes the artifacts
    val df = probe()
    df.collect()
    (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p: SparkPlan => p
    }).toString
  }

  test("persisted PQ index probe: the coded corpus joins its codewords " +
      "via broadcasts only, never a shuffle join") {
    // PqM reconstruction joins against the K-row on-disk book plus the
    // 5-row query batch — all broadcast; a regression to a sort-merge
    // join would shuffle the ~32x-compressed codes table, the scan
    // whose cheapness is the index's whole point
    val p = diskProbePlan("q_pq_index_persist",
      () => graft.queries.Ext.pqPersistedProbeForTest(spark, d))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("persisted semantic index probe: the batch broadcasts, the " +
      "on-disk index side never sort-merge-joins") {
    // the daily batch's banded rows broadcast against the standing
    // cell+band table with the cosine verify fused into the join —
    // the corpus-sized index scan must never shuffle
    val p = diskProbePlan("q_dedup_semantic_index_persist",
      () => graft.queries.Ext.semanticPersistedProbeForTest(spark, d))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("quantile remap applies map-only: knots broadcast onto the doc " +
      "scan, never a shuffle join") {
    val (p, f) = planOf("q_quantile_remap")
    // the |sources|-row knot table (and the 1-row pooled grid) must
    // broadcast back onto the documents scan; a sort-merge join here
    // would shuffle the full corpus for a per-row arithmetic apply
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      p.take(3000))
    // column pruning: the apply side reads only the three used columns
    assert(f().contains("doc_id"), "formatted plan lost the scan")
  }

  test("streamed index probes prune to the as-of day at the parquet scan") {
    // the ingest-day filter is the probe's partition-style prune: it
    // must reach PushedFilters on the on-disk index scan, not run as a
    // post-scan filter over the full index
    for (q <- Seq("q_stream_semantic_index_maintain",
        "q_stream_pq_index_maintain")) {
      val df = SparkEntry.queries(q)(spark, d)
      df.collect()
      val f = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(f.contains("PushedFilters") &&
        f.matches("(?s).*PushedFilters: \\[[^\\]]*EqualTo\\(ingest_day,0\\).*"),
        s"$q: ingest_day prune not pushed\n${f.take(4000)}")
    }
  }

  test("index deletion probes broadcast; the rewritten index never " +
      "sort-merge-joins") {
    for (q <- Seq("q_dedup_index_delete", "q_pq_index_delete")) {
      val (p, _) = planOf(q)
      assert(p.contains("BroadcastHashJoin"), s"$q\n${p.take(3000)}")
      assert(!p.contains("SortMergeJoin"), s"$q\n${p.take(3000)}")
    }
  }

  test("DSIR scores through broadcasts only — the corpus never shuffle-joins") {
    val (p, _) = planOf("q_dsir_select")
    // the 1024-row weight table broadcasts onto the per-doc counts; a
    // regression to a shuffle join would reshuffle the whole exploded
    // corpus relation on the bucket key
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      p.take(3000))
  }

  test("skyline resolves dominance on the pruned relation, winners broadcast back") {
    val (p, _) = planOf("q_skyline")
    // the dominance window runs over the per-n candidate relation, and
    // the skyline pairs come back as a broadcast semi-join — the
    // customer relation is never self-joined
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      p.take(3000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("salted aggregation partials on (key, salt) before the per-key merge") {
    val (p, _) = planOf("q_agg_salted")
    // two full aggregation levels (each with its own partial/final
    // pair): the (event_type, salt) stage and the event_type merge
    assert("HashAggregate".r.findAllIn(p).size >= 4, p.take(3000))
    assert(p.contains("salt"), p.take(3000))
  }

  test("BM25 reuses the tf relation for df and doc length — one explode total") {
    val (p, _) = planOf("q_bm25")
    assert("Generate explode".r.findAllIn(p).size == 1, p.take(3000))
    assert(p.contains("Window"), p.take(3000))
  }

  test("URL canonicalization dedup is map-side until its group-by") {
    val (p, _) = planOf("q_dedup_url")
    // two hash exchanges and no more: the (url, raw) pre-aggregate that
    // COUNT(DISTINCT raw) requires, then the per-url merge. The regex
    // canonicalization itself must run in the scan stage (stage 1
    // project), never after a shuffle.
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p.take(3000))
    val scanStage = p.linesIterator.filter(_.contains("regexp_replace"))
      .mkString
    assert(scanStage.contains("*(1)"), p.take(3000))
  }

  test("standardize transform is map-only: fitted scaler baked as literals") {
    val (p, _) = planOf("q_embed_standardize")
    // the fit collects a dims-sized stats relation at build time; the
    // transform itself must be a pure projection — no join with a stats
    // relation, no aggregation, no hash exchange (only the ORDER BY's
    // rangepartitioning)
    assert(!p.contains("Exchange hashpartitioning"), p.take(3000))
    assert(!p.contains("HashAggregate"), p.take(3000))
    assert(!p.contains("Join"), p.take(3000))
  }

  test("dim-stats fit partial-aggregates map-side; corpus shuffles once") {
    val (p, _) = planOf("q_embed_dim_stats")
    // one hash exchange total: partials collapse each partition to
    // (dims x partials) rows before the per-dim merge
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("length batching shuffles by bucket, aggregates map-side") {
    val (p, _) = planOf("q_batch_by_length")
    // bucket window exchange + the batch_id aggregation exchange — and
    // nothing else (the token count runs in the scan stage)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p.take(3000))
    assert(p.contains("Window"), p.take(3000))
    assert(p.contains("partial_count") || p.contains("partial_max"),
      p.take(3000))
  }

  test("source sketches merge in one aggregate; pairing never touches docs") {
    val (p, _) = planOf("q_source_similarity")
    // per-source positionwise-min union sketch: aggregation exchanges
    // carry fixed-width signature rows only (one per self-join side —
    // exchange reuse does not fire across the differing projections,
    // and each side is a |sources|-row relation, so rebuilding is
    // trivially cheap); the pairwise comparison joins sketch rows only
    // (the tiny non-equi join is the sanctioned nested loop)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p.take(3000))
    assert(p.contains("minhash_sig"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("audio window framing fans out map-only") {
    val (p, _) = planOf("q_audio_windows")
    // typed flatMap generator: no hash exchange, no aggregation — the
    // only exchange is the deterministic output ORDER BY
    assert(!p.contains("Exchange hashpartitioning"), p.take(3000))
    assert(!p.contains("HashAggregate"), p.take(3000))
  }

  test("leak-free split broadcasts the cluster relation onto the corpus") {
    val (p, _) = planOf("q_split_leakfree")
    val outer = p.linesIterator
      .filter(l => l.contains("BroadcastHashJoin") && l.contains("LeftOuter"))
      .mkString
    assert(outer.nonEmpty, p.take(3000))
  }

  test("per-source cap prunes through WindowGroupLimit") {
    val (p, _) = planOf("q_cap_per_source")
    assert(p.contains("WindowGroupLimit"), p.take(3000))
  }

  test("partitioned layout prunes: the status predicate becomes a PartitionFilter") {
    val (_, fThunk) = planOf("q_partition_pruned")
    val f = fThunk()
    val pf = f.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(pf.contains("o_orderstatus"), f.take(3000))
    // and the pruned column never appears as a pushed DATA filter — it
    // is resolved at directory-listing time, before any file opens
    val df = f.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(!df.contains("o_orderstatus"), f.take(3000))
  }

  test("ranged quantiles sort only target partitions: prune join sits below the window") {
    val (p, _) = planOf("q_agg_median")
    // rank-selection pushdown: the broadcast semi/inner join against the
    // target-partition list must be a CHILD of the local-rank Window
    // (printed deeper in the tree), so non-target partitions are
    // discarded before any sort
    val lines = p.linesIterator.toVector
    val win = lines.indexWhere(_.contains("Window"))
    val bhj = lines.indexWhere(_.contains("BroadcastHashJoin"), win)
    assert(win >= 0 && bhj > win,
      s"expected BroadcastHashJoin below Window (win=$win bhj=$bhj)\n" +
        p.take(3000))
  }

  /** Full preorder traversal that descends into AQE stage wrappers and
    * exchange reuse — node.children alone stops at stage boundaries.
    */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
    case q: QueryStageExec        => p +: flatten(q.plan)
    case r: ReusedExchangeExec    => p +: flatten(r.child)
    case _                        => p +: p.children.flatMap(flatten)
  }

  /** The three deliberately UNPARTITIONED windows in the suite are
    * bounded-by-construction (the verdict-flagged WindowExec warnings):
    * each must keep an aggregate or limit node between itself and the
    * raw data, with a provably small row count. Until now that
    * boundedness lived in comments; these assertions make un-bounding
    * one of them (e.g. dropping the candidate aggregate so a global
    * sort swallows the corpus) a test failure instead of a silent
    * 100TB-scale regression. Runs on sf0.1 — the largest local scale —
    * so the bound is an order-of-magnitude property, not a toy-data
    * artifact.
    */
  private def assertBoundedGlobalWindows(name: String, bound: Long): Unit = {
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.1")
    df.collect() // materialize so AQE finalizes and metrics fill
    val executed = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p: SparkPlan             => p
    }
    val unpart = flatten(executed).collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(unpart.nonEmpty,
      s"$name: expected an unpartitioned window (did the shape change?)")
    unpart.foreach { w =>
      // structural invariant: something bounding sits between the window
      // and the data, and its observed/declared cardinality is small
      val bounding = flatten(w.child).collectFirst {
        case t: TakeOrderedAndProjectExec => ("limit", t.limit.toLong)
        case l: GlobalLimitExec           => ("limit", l.limit.toLong)
        case a: HashAggregateExec => ("agg", a.metrics("numOutputRows").value)
        case a: ObjectHashAggregateExec =>
          ("agg", a.metrics("numOutputRows").value)
        case a: SortAggregateExec => ("agg", a.metrics("numOutputRows").value)
      }
      assert(bounding.isDefined,
        s"$name: unpartitioned window has NO bounding aggregate/limit " +
          s"upstream — this would globally sort the raw relation:\n$w")
      val (kind, rows) = bounding.get
      assert(rows <= bound,
        s"$name: unpartitioned window consumes $rows rows via $kind " +
          s"(bound $bound) — no longer bounded-by-construction")
    }
  }

  test("q_skyline's global window consumes only the candidate aggregate") {
    assertBoundedGlobalWindows("q_skyline", bound = 1000L)
  }

  test("q_period_change's global window consumes only the daily rollup") {
    assertBoundedGlobalWindows("q_period_change", bound = 10000L)
  }

  test("q_vocab_coverage's global window consumes only the top-N vocab") {
    assertBoundedGlobalWindows("q_vocab_coverage", bound = 1000L)
  }

  test("q_token_budget_select's global window consumes only the score histogram") {
    // the offset window runs over DISTINCT rounded scores — capped by
    // the 6-decimal value space, never the corpus — and the boundary
    // filter prunes score groups before the per-doc prefix window
    assertBoundedGlobalWindows("q_token_budget_select", bound = 5000L)
  }

  test("q_token_budget_select's per-doc prefix window is bucket-partitioned") {
    // the budget-boundary score group is ONE score value, so a window
    // partitioned by score alone would sort that whole group on a
    // single task — the de-skew distributes its prefix over doc_id
    // range buckets (weighted rangedCore) and the per-doc window must
    // partition by (score, _pid). Pin it: every window that orders by
    // doc_id carries >= 2 partition expressions, so regressing to the
    // score-only partitioning fails here, not at 100 TB.
    val df = SparkEntry.queries("q_token_budget_select")(
      spark, "/root/testdata/sf0.1")
    df.collect()
    val executed = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p: SparkPlan             => p
    }
    val perDoc = flatten(executed).collect {
      case w: WindowExec if w.orderSpec.exists(
        _.child.references.exists(_.name == "doc_id")) => w
    }
    assert(perDoc.nonEmpty,
      "expected a per-doc prefix window ordered by doc_id")
    perDoc.foreach { w =>
      assert(w.partitionSpec.size >= 2,
        s"per-doc prefix window partitions by ${w.partitionSpec} only — " +
          "the boundary score group would sort on one task at scale")
    }
  }

  test("sketch quantile: one ObjectHashAggregate pass, readout broadcasts back") {
    val (p, executed) = planAndTreeOf("q_quantile_approx")
    // the GK sketch aggregates with map-side partials
    assert(p.contains("ObjectHashAggregate") &&
      p.contains("partial_percentile_approx"), p.take(3000))
    // the 9-row sketch readout joins back as a broadcast — a shuffle
    // join here would reshuffle the whole fact scan for a 9-row probe
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      p.take(3000))
    // exactly two fact scans: the sketch pass and the rank-check pass
    // (the check exists only to put the sketch under the oracle).
    // Counted on the executed plan TREE — leaf scan nodes outside
    // reused subtrees — not on the rendered string, whose node labels
    // shift across Spark versions.
    assert(freshScanCount(executed) == 2,
      s"${freshScanCount(executed)} fresh file scans: ${p.take(3000)}")
  }

  test("bucketed co-located join: zero exchanges once broadcast is off") {
    // the whole point of paying the bucketed shuffle at WRITE time:
    // a later big-big equi-join on the bucket key must plan with NO
    // Exchange on either side (broadcast disabled to expose the
    // merge path — at 100 TB neither side broadcasts)
    val bcast = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(bcast)
    try {
      // materialize the bucketed tables via the gated query first
      SparkEntry.queries("q_join_bucketed")(spark, d).collect()
      spark.conf.set(bcast, "-1")
      val tag = Integer.toHexString(d.hashCode) +
        s"_p${ProcessHandle.current().pid}"
      import org.apache.spark.sql.functions.col
      val df = spark.table(s"graft_bkt_orders_$tag")
        .join(spark.table(s"graft_bkt_customer_$tag"),
          col("o_custkey") === col("c_custkey"))
      df.collect()
      val executed = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p: SparkPlan             => p
      }
      val p = executed.toString
      assert(!p.contains("Exchange"),
        s"bucketed join still shuffles: ${p.take(3000)}")
      assert(p.contains("SortMergeJoin"), p.take(3000))
      assert("Bucketed: true".r.findAllIn(p).size == 2,
        s"expected two bucketed scans: ${p.take(3000)}")
    } finally {
      spark.conf.set(bcast, prev)
      val tag = Integer.toHexString(d.hashCode) +
        s"_p${ProcessHandle.current().pid}"
      spark.sql(s"DROP TABLE IF EXISTS graft_bkt_orders_$tag")
      spark.sql(s"DROP TABLE IF EXISTS graft_bkt_customer_$tag")
    }
  }

  test("dynamic partition pruning reaches the fact scan at runtime") {
    val (_, fmt) = planOf("q_join_dpp")
    val p = fmt()
    // the fact scan's PartitionFilters must carry the runtime pruning
    // subquery derived from the broadcast dim filter — not a static
    // literal, and not a full scan
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning expression in plan: ${p.take(4000)}")
  }

  test("CBO reorders a fact-first join chain dimension-first") {
    // q_join_cbo writes the three catalog tables and ANALYZEs them;
    // re-deriving the same join here under the CBO flags exposes the
    // OPTIMIZED logical plan for structural assertions
    SparkEntry.queries("q_join_cbo")(spark, d).collect()
    val tag = Integer.toHexString(d.hashCode) +
      s"_p${ProcessHandle.current().pid}"
    import org.apache.spark.sql.functions.col
    val cbo = "spark.sql.cbo.enabled"
    val jr = "spark.sql.cbo.joinReorder.enabled"
    val (prevCbo, prevJr) = (spark.conf.get(cbo), spark.conf.get(jr))
    try {
      spark.conf.set(cbo, "true"); spark.conf.set(jr, "true")
      val df = spark.table(s"graft_cbo_orders_$tag")
        .join(spark.table(s"graft_cbo_customer_$tag"),
          col("o_custkey") === col("c_custkey"))
        .join(spark.table(s"graft_cbo_nation_$tag"),
          col("c_nationkey") === col("n_nationkey"))
      val opt = df.queryExecution.optimizedPlan
      // ANALYZE'd stats must reach the optimizer: the plan carries an
      // exact row count, not a size-only guess
      assert(opt.stats.rowCount.isDefined,
        s"no rowCount stats on optimized plan: ${opt.stats}")
      // the INNERMOST join must now pair the two dimensions (customer,
      // nation — the small intermediate), not the written-first
      // fact >< customer pair
      val joins = opt.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      assert(joins.size == 2, s"expected 2 joins: $opt")
      val inner = joins.last // deepest in collect's pre-order
      val innerCols = inner.output.map(_.name).toSet
      assert(innerCols.contains("c_custkey") &&
        innerCols.contains("n_nationkey") &&
        !innerCols.contains("o_orderkey"),
        s"join chain not reordered dimension-first: $opt")
    } finally {
      spark.conf.set(cbo, prevCbo); spark.conf.set(jr, prevJr)
      Seq("orders", "customer", "nation").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS graft_cbo_${t}_$tag"))
    }
  }

  test("PQ probe: codebook and query batch broadcast — the codes scan " +
      "never shuffles into a join") {
    // the ADC probe's only per-candidate data is the codes relation;
    // at 100 TB the codebook (K rows) and query batch (5 rows) must
    // come to IT, never the reverse — a sort-merge/shuffled-hash join
    // here would reshuffle the corpus-sized codes table for a
    // broadcast-sized probe
    val (p, executed) = planAndTreeOf("q_pq_adc")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      p.take(3000))
    assert(flatten(executed).collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, p.take(3000))
  }

  test("scaled semantic dedup: pair join is equi on (cell, band, key); " +
      "nested loops only broadcast the 1-row bits relation") {
    val (p, _) = planOf("q_dedup_semantic_scaled")
    // the candidate self-join must hash/merge on the composite bucket
    // key — a regression that drops `key` from the equi side turns the
    // bounded-occupancy join back into per-cell quadratic work
    assert(
      "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[cell\\S*, band\\S*, key".r
        .findFirstIn(p).isDefined, p.take(4000))
    // the cosine verify rides the join as a codegen'd kernel condition
    assert(p.contains("dot_product"), p.take(3000))
    // every nested-loop node is the sanctioned 1-row bits cross join
    // (IdentityBroadcastMode broadcast of the count-derived width),
    // reused across bands — never a data-sized build side. Counted on
    // the executed plan tree, not the rendered string.
    val (_, executed) = planAndTreeOf("q_dedup_semantic_scaled")
    val bnlj = flatten(executed).collect {
      case b: org.apache.spark.sql.execution.joins
          .BroadcastNestedLoopJoinExec => b
    }
    assert(bnlj.size <= 6, s"${bnlj.size} nested-loop joins: ${p.take(3000)}")
    assert(flatten(executed).collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, p.take(3000))
  }

  test("snapshot-table DSv2 read: band predicate reaches the scan as a " +
      "pushed filter and opens a strict subset of files") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-plansql").toString + "/t"
    val base = (0 until 2000)
      .map(i => (i.toLong, (i % 500).toDouble * 10))
    import spark.implicits._
    graft.sources.SnapshotTable.commitAppend(
      base.toDF("id", "price"), dir, "price", 10)
    val df = spark.read.format("graft.sources.SnapshotTableSource")
      .option("path", dir).load()
      .filter($"price" >= 1000 && $"price" < 2000)
    val plan = df.queryExecution.executedPlan.toString
    // the translated predicates surface on the scan node itself
    assert(plan.contains("PushedFilters"), plan.take(3000))
    assert(plan.contains("GreaterThanOrEqual(price,1000"), plan.take(3000))
    // execution drives the pyramid descent: strictly fewer files than
    // the snapshot holds, and the residual filter still applies exactly
    val n = df.count()
    val (planned, total) = (graft.sources.SnapshotTableSource.lastPlanned,
      graft.sources.SnapshotTableSource.lastTotal)
    assert(planned > 0 && planned < total,
      s"pushdown must prune files, opened $planned/$total")
    assert(n == base.count { case (_, p) => p >= 1000 && p < 2000 })
    // column pruning: a projection narrower than the table reaches the
    // v1 relation (the scan's schema is the pruned one)
    val narrow = spark.read.format("graft.sources.SnapshotTableSource")
      .option("path", dir).load().select($"id")
    assert(narrow.queryExecution.executedPlan.toString
      .contains("ReadSchema"), narrow.queryExecution.executedPlan
      .toString.take(2000))
    assert(narrow.columns.sameElements(Array("id")))
  }
}
