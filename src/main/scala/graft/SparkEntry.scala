package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` aggregate per-module registries; every declared
  * query is hash-compared against its DuckDB oracle by the driver (t2), so
  * each pair must follow the determinism rules in [[graft.Tables]].
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-style group aggregation (SURVEY.md §7 minimum slice).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_group")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.Scalar.queries ++
      graft.queries.Ext.queries ++ graft.queries.EmailPipeline.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++ graft.queries.Scalar.oracle ++
      graft.queries.Ext.oracle ++ graft.queries.EmailPipeline.oracle
}
