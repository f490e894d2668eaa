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
    // fail early with a clear message: Spark itself rejects
    // all-columns partitioning (ALL_PARTITION_COLUMNS_NOT_ALLOWED),
    // and a zero-arg hash() would die in analysis before reaching it
    require(dataCols.nonEmpty,
      "writePartitioned: at least one non-partition column is required")
    val salt = pmod(hash(dataCols.map(col): _*), lit(filesPerDir))
    df.repartition((partCols.map(col) :+ salt): _*)
      .sortWithinPartitions((partCols ++ sortCols).map(col): _*)
      .write.partitionBy(partCols: _*).mode("overwrite").parquet(path)
  }

  /** Morton (Z-order) code of two numeric columns: each value is scaled
    * to 16 bits against its global [min, max] (computed in one tiny
    * pre-pass, floor-quantized so the mapping is engine-exact), and the
    * bits interleave via the standard mask-spread ladder — pure integer
    * Column arithmetic, fully codegen'd, no UDF.
    */
  private def spread16(c: org.apache.spark.sql.Column) = {
    // spread the low 16 bits of c so bit i lands at position 2i
    val a = c.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val d = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(0x33333333L))
    e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Write `df` Z-ORDERED on two columns into `nFiles` files: rows sort
    * by the interleaved Morton code, so each file covers a compact 2-D
    * BLOCK of the (c1, c2) space and parquet min/max footers prune scans
    * filtered on EITHER column — where a lexicographic (c1, c2) sort
    * gives c2 the full value range in every file and prunes nothing for
    * it. This is the multi-dimensional clustering every lakehouse table
    * format ships (Delta OPTIMIZE ZORDER BY, Iceberg sort orders).
    */
  def writeZOrdered(df: DataFrame, path: String, c1: String, c2: String,
      nFiles: Int): Unit = {
    val mm = df.agg(
      min(col(c1)).cast("double").as("mn1"),
      max(col(c1)).cast("double").as("mx1"),
      min(col(c2)).cast("double").as("mn2"),
      max(col(c2)).cast("double").as("mx2"))
    def scaled(c: String, mn: org.apache.spark.sql.Column,
        mx: org.apache.spark.sql.Column) =
      when(mx === mn, lit(0L)).otherwise(
        floor((col(c).cast("double") - mn) * 65535.0 / (mx - mn))
          .cast("long"))
    val z = df.crossJoin(broadcast(mm))
      .withColumn("_z",
        spread16(scaled(c1, col("mn1"), col("mx1")))
          .bitwiseOR(shiftleft(
            spread16(scaled(c2, col("mn2"), col("mx2"))), 1)))
      .drop("mn1", "mx1", "mn2", "mx2")
    z.repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Rewrite an existing parquet directory into ~`targetRowsPerFile`
    * rows per file — the standing compaction job every streaming or
    * incremental sink needs once appends have fragmented the layout.
    * Returns (rowCount, filesBefore). The rewrite goes through a temp
    * dir and swaps via two renames with the original parked at
    * `._compact_old` — at every instant either the old or the new
    * layout exists under a recoverable name, so a crash anywhere
    * leaves the data reachable (a delete-then-rename swap has a
    * window where the table is simply GONE). The filesystem resolves
    * FROM the path, not the default scheme, so compacting an
    * s3a://... table on an hdfs-default cluster works.
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
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(
      path.stripSuffix("/") + "._compact_old")
    fs.delete(old, true) // leftover from a previous crashed swap
    if (!fs.rename(dst, old))
      throw new java.io.IOException(s"compact: could not park $dst")
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)) {
      fs.rename(old, dst) // roll back: restore the original layout
      throw new java.io.IOException(s"compact: could not publish $tmp")
    }
    fs.delete(old, true)
    (rows, filesBefore)
  }

  /** Write `df` range-sorted by `zcol` into `nFiles` files and record a
    * ZONE-MAP manifest under `path/_zonemap` (underscore-prefixed, so
    * table readers skip it like `_SUCCESS`): one row per data file with
    * that file's min/max of `zcol` and its row count. This is lakehouse
    * data skipping (Iceberg manifests' column bounds, Delta's file
    * stats): at 100 TB the planner consults kilobytes of manifest
    * instead of opening thousands of parquet footers, and file-level
    * skipping composes with the row-group pruning the footers already
    * give — the manifest decides which files to LIST, the footers prune
    * within the survivors.
    */
  def writeWithZoneMap(df: DataFrame, path: String, zcol: String,
      nFiles: Int): Unit = {
    df.repartitionByRange(nFiles, col(zcol))
      .sortWithinPartitions(col(zcol))
      .write.mode("overwrite").parquet(path)
    val s = df.sparkSession
    // One column-pruned pass builds the manifest (a production writer
    // collects these bounds from the write tasks' own footers instead
    // of re-reading; the re-scan keeps this portable and still touches
    // only zcol's column chunks).
    val zm = s.read.parquet(path)
      .select(input_file_name().as("file"),
        col(zcol).cast("double").as("z"))
      .groupBy(col("file"))
      .agg(min(col("z")).as("z_min"), max(col("z")).as("z_max"),
        count(lit(1)).as("n_rows"))
    zm.coalesce(1).write.mode("overwrite").parquet(s"$path/_zonemap")
  }

  /** APPEND a batch to a zone-mapped table and maintain the manifest
    * INCREMENTALLY: stats are computed for the new files only and
    * unioned into the existing manifest — the manifest update cost
    * tracks the batch, not the table, which is what makes daily
    * appends to a 100 TB zone-mapped table affordable (a rebuild would
    * rescan everything). The merged manifest is materialized before
    * the overwrite so the rewrite never reads from the file it is
    * replacing. File identity is by basename (unique within the dir)
    * — `inputFiles` and `input_file_name()` render the scheme prefix
    * differently, so full-URI comparison would silently mismatch.
    */
  def appendWithZoneMap(df: DataFrame, path: String, zcol: String,
      nFiles: Int): Unit = {
    val s = df.sparkSession
    df.repartitionByRange(nFiles, col(zcol))
      .sortWithinPartitions(col(zcol))
      .write.mode("append").parquet(path)
    val existing = s.read.parquet(s"$path/_zonemap")
    // bounded: one manifest row per FILE, guarded like the reader
    val known = existing
      .select(substring_index(col("file"), "/", -1).as("name"))
      .collect().map(_.getString(0)).toSet
    require(known.size <= 1000000,
      s"appendWithZoneMap: manifest for $path lists ${known.size} files")
    val newPaths = s.read.parquet(path).inputFiles.toIndexedSeq
      .filterNot(p => known(p.split('/').last))
    if (newPaths.nonEmpty) {
      val add = s.read.parquet(newPaths: _*)
        .select(input_file_name().as("file"),
          col(zcol).cast("double").as("z"))
        .groupBy(col("file"))
        .agg(min(col("z")).as("z_min"), max(col("z")).as("z_max"),
          count(lit(1)).as("n_rows"))
      val merged = existing.unionByName(add).coalesce(1).localCheckpoint()
      merged.write.mode("overwrite").parquet(s"$path/_zonemap")
    }
  }

  /** [[writeZOrdered]] plus a TWO-column zone-map manifest: because the
    * Morton layout gives every file a compact block of the (c1, c2)
    * plane, the per-file min/max bounds are tight in BOTH dimensions —
    * so a range predicate on EITHER column skips files, where a
    * lexicographic (c1, c2) sort leaves c2's bounds spanning the whole
    * domain in every file and skips nothing for it. This is the
    * read-side payoff the Z-order write exists for.
    */
  def writeZOrderedWithZoneMap(df: DataFrame, path: String, c1: String,
      c2: String, nFiles: Int): Unit = {
    writeZOrdered(df, path, c1, c2, nFiles)
    val s = df.sparkSession
    val zm = s.read.parquet(path)
      .select(input_file_name().as("file"),
        col(c1).cast("double").as("z1"), col(c2).cast("double").as("z2"))
      .groupBy(col("file"))
      .agg(min(col("z1")).as("z1_min"), max(col("z1")).as("z1_max"),
        min(col("z2")).as("z2_min"), max(col("z2")).as("z2_max"),
        count(lit(1)).as("n_rows"))
    zm.coalesce(1).write.mode("overwrite").parquet(s"$path/_zonemap")
  }

  /** Prune a Z-ordered table on ranges over BOTH mapped columns (pass
    * (-inf, inf) to leave one unconstrained). Same soundness contract
    * as [[readZonePruned]]: only files whose recorded bounds exclude
    * the whole query box are skipped.
    */
  def readZonePruned2(spark: SparkSession, path: String,
      lo1: Double, hi1: Double, lo2: Double,
      hi2: Double): (DataFrame, Long, Long) = {
    val zm = spark.read.parquet(s"$path/_zonemap")
    val total = zm.count()
    require(total <= 1000000,
      s"readZonePruned2: manifest for $path lists $total files")
    val hit = zm.filter(col("z1_min") <= hi1 && col("z1_max") >= lo1 &&
        col("z2_min") <= hi2 && col("z2_max") >= lo2)
      .select(col("file")).collect().map(_.getString(0)).sorted
    val df =
      if (hit.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(hit.toIndexedSeq: _*)
    (df, hit.length.toLong, total)
  }

  /** Return (candidates, filesRead, filesTotal): a scan over ONLY the
    * files whose [z_min, z_max] intersects [lo, hi], per the zone map
    * written by [[writeWithZoneMap]]. Skipping is SOUND — a file is
    * dropped only when its recorded bounds exclude the whole range — so
    * re-applying the exact predicate on the candidates gives the same
    * answer as a full scan; only the I/O shrinks with the selectivity.
    * The manifest collect is bounded by the FILE count (one row per
    * file), not the data: the guard fails loudly if a layout ever
    * produces a manifest too large to hold on the driver.
    */
  def readZonePruned(spark: SparkSession, path: String,
      lo: Double, hi: Double): (DataFrame, Long, Long) = {
    val zm = spark.read.parquet(s"$path/_zonemap")
    val total = zm.count()
    require(total <= 1000000,
      s"readZonePruned: manifest for $path lists $total files; " +
        "driver-side planning needs a partitioned manifest at this size")
    val hit = zm.filter(col("z_min") <= hi && col("z_max") >= lo)
      .select(col("file")).collect().map(_.getString(0)).sorted
    val df =
      if (hit.isEmpty)
        spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(hit.toIndexedSeq: _*)
    (df, hit.length.toLong, total)
  }
}
