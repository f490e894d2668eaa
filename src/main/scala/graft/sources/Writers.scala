package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Layout-controlled parquet writes — the sink-side half of the 100 TB
  * playbook. A petabyte table lives or dies by its file layout: a write
  * that lets every reducer emit one file per partition value produces
  * tasks x partitions tiny files (the "small files problem"), and a
  * write that doesn't co-sort rows loses min/max pruning for every
  * later scan.
  *
  * The reference's sink is a single CSV append per daily batch
  * (reference resources/gmail_functions.py:305, `to_csv(..., mode="a")`)
  * — correct at 300 rows/day, meaningless at scale. These writers are
  * the Spark-native replacement: hive-style partition dirs, a bounded
  * file count per partition dir, optional within-file ordering for
  * pruning, and a compaction pass for layouts that have already gone
  * bad.
  */
object Writers {

  /** Write `df` as parquet partitioned by `partCols`, with AT MOST
    * `filesPerDir` files in each partition directory regardless of the
    * input's partitioning or cluster size.
    *
    * The repartition keys are (partCols, salt) where salt is a
    * deterministic per-row hash bounded by `filesPerDir`: every row of
    * one partition value lands in one of `filesPerDir` reducer groups,
    * so each directory receives at most that many files — the shuffle
    * fans the write out across the cluster (filesPerDir tasks can write
    * one directory concurrently) while still bounding the file count.
    * `sortCols` orders rows WITHIN each file so later scans can prune on
    * parquet min/max footers for those columns.
    */
  def writePartitioned(df: DataFrame, path: String, partCols: Seq[String],
      filesPerDir: Int = 1, sortCols: Seq[String] = Nil): Unit = {
    require(partCols.nonEmpty, "partCols must be non-empty")
    require(filesPerDir >= 1, "filesPerDir must be >= 1")
    val dataCols = df.columns.filterNot(partCols.contains).toIndexedSeq
    val salt = pmod(hash(dataCols.map(col): _*), lit(filesPerDir))
    df.repartition((partCols.map(col) :+ salt): _*)
      .sortWithinPartitions((partCols ++ sortCols).map(col): _*)
      .write.partitionBy(partCols: _*).mode("overwrite").parquet(path)
  }

  /** Rewrite an existing parquet directory into ~`targetRowsPerFile`
    * rows per file — the standing compaction job every streaming or
    * incremental sink needs once appends have fragmented the layout.
    * Returns (rowCount, filesBefore). The rewrite goes through a temp
    * dir so a failed compaction never destroys the source layout
    * (write-then-swap, the same commit-then-archive order as the
    * pipeline sink).
    */
  def compact(spark: SparkSession, path: String,
      targetRowsPerFile: Long): (Long, Int) = {
    val df = spark.read.parquet(path)
    val filesBefore = df.inputFiles.length
    val rows = df.count()
    val nFiles = math.max(1L, (rows + targetRowsPerFile - 1) /
      targetRowsPerFile).toInt
    val tmp = path.stripSuffix("/") + "._compact_tmp"
    df.repartition(nFiles).write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
    (rows, filesBefore)
  }
}
