package graft

import org.apache.spark.sql.SparkSession

/** Public entrypoint: the one-stop session factory a library user calls
  * to get a SparkSession with everything graft provides wired in —
  * native Catalyst expressions SQL-registered (`html_to_text`,
  * `simhash16`, `minhash_sig`, `dot_product`, `cosine_sim`, `bloom_agg`,
  * `bloom_contains`), the optimizer rules that know their algebraic
  * identities, the as-of join planning rule and strategy, and the
  * scale-sensible defaults every query in this library assumes.
  *
  * On a real cluster, call `configure(builder)` on your own builder (the
  * master/deploy settings come from spark-submit); `localSession(n)` is
  * the single-JVM form the CLI mains and tests use.
  */
object Graft {

  /** Apply graft's extensions and recommended confs to any builder. */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.withExtensions(new graft.functions.GraftExtensions)
      // AQE re-plans at runtime from real sizes: coalesces shuffle
      // partitions, switches to broadcast when a side turns out small,
      // and splits skewed join partitions — all assumptions this
      // library's operators are written against.
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // UTC everywhere: timestamp arithmetic must not depend on the
      // driver host's zone.
      .config("spark.sql.session.timeZone", "UTC")

  /** Local single-JVM session (tests, CLI mains, dev loops): shuffle
    * width = core count, because the 200-partition default is sized for
    * a cluster and turns every local shuffle into mostly-empty tasks.
    * The CLI mains (Bench/Verify/RunOne/ProfileQuery/ScaleStress) all
    * route through here so a conf added to [[configure]] reaches the
    * whole harness; `extraConfs` carries per-main settings (e.g. the
    * bench's small maxPartitionBytes that splits single-file local
    * tables across every core).
    */
  def localSession(cores: Int, appName: String = "graft",
      extraConfs: Map[String, String] = Map.empty): SparkSession = {
    val base = configure(SparkSession.builder())
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
    val spark = extraConfs
      .foldLeft(base) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
