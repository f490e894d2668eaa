package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** SNAPSHOT TABLE — the unification of the repo's two half-lakehouses:
  * [[TxJsonSink]] has the commit-log mechanism (immutable versioned
  * manifests, atomic latest-pointer, time travel, vacuum) but a
  * stats-free JSON payload; the [[Writers]] zone maps have file-bounds
  * skipping but a single mutable manifest with no history. This layer
  * is one table format with BOTH, the Iceberg/Delta shape in
  * miniature, over plain parquet data files:
  *
  * {{{
  *   path/
  *     v3-p00000.parquet …      immutable data files, one prefix/commit
  *     _log/
  *       m-3.json               manifest: per-FILE zone bounds of one
  *                              commit's files (batch-sized)
  *       v1 v2 v3               snapshots: the MANIFEST LIST — one line
  *                              per manifest with its bound ENVELOPE
  *       LATEST                 atomic pointer to the current version
  * }}}
  *
  * The three-level metadata tree is what makes planning scale: a probe
  * reads the snapshot's manifest list (O(commits) lines), drops whole
  * manifests whose envelope misses the range, parses only surviving
  * manifests (each batch-sized), and opens only the files whose bounds
  * intersect — the driver never materializes the full file list of a
  * 100 TB table. This is exactly Iceberg's snapshot → manifest-list →
  * manifest pyramid; the [[Writers]] zone map's bucket meta is the
  * same idea with a hash grid instead of commit grouping.
  *
  * CRASH SAFETY: data files and manifests are written before the
  * snapshot file, the snapshot before the pointer swing, and every
  * metadata write is tmp + ATOMIC_MOVE — a crash anywhere leaves the
  * previous snapshot fully intact (readers resolve through LATEST) and
  * the orphaned files invisible; the next commit of that version
  * sweeps them. Single-writer, single-filesystem by design — the same
  * documented scope as [[TxJsonSink]] (an object-store port swaps
  * java.nio for the FileSystem API; the protocol is unchanged).
  *
  * Deletion is COPY-ON-WRITE at the file level and O(metadata) at the
  * manifest level: touched files' survivors rewrite as new files,
  * touched MANIFESTS rewrite minus their dead rows, untouched
  * manifests carry into the new snapshot BY REFERENCE. Old snapshots
  * still list the replaced files, so every prior version stays
  * readable bit for bit until [[vacuum]] reclaims it.
  */
object SnapshotTable {

  case class FileStat(file: String, zMin: Double, zMax: Double, rows: Long)
  case class ManifestRef(name: String, zMin: Double, zMax: Double,
      files: Int, rows: Long)
  /** An equality-delete tombstone: `file` holds the distinct keys of
    * column `key`; it applies to rows in manifests COMMITTED BEFORE
    * version `v` (Iceberg v2's sequence-number scoping) — a later
    * re-insert of a deleted key survives.
    */
  case class DeleteRef(file: String, key: String, rows: Long, v: Int)

  // ---- driver-side metadata I/O (tmp + ATOMIC_MOVE everywhere) --------

  private def logDir(path: String) = Paths.get(path, "_log")

  private def writeAtomic(p: java.nio.file.Path, content: String): Unit = {
    Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE)
  }

  /** The LATEST pointer's payload: (version, batch id of the commit
    * that produced it — −1 for non-streaming commits). One file, one
    * ATOMIC_MOVE, so version AND provenance publish together: that is
    * what makes the streaming commit exactly-once (see
    * [[commitAppendOnce]]) without a separate ledger whose write would
    * open a crash window after the pointer swing.
    */
  private def readPointer(path: String): Option[(Int, Long)] = {
    val p = logDir(path).resolve("LATEST")
    if (!Files.exists(p)) None
    else {
      val parts = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        .trim.split("\\s+")
      Some((parts(0).toInt,
        if (parts.length > 1) parts(1).toLong else -1L))
    }
  }

  private def swingPointer(path: String, v: Int, batchId: Long): Unit =
    writeAtomic(logDir(path).resolve("LATEST"), s"$v $batchId")

  /** Latest committed version, resolved through the atomic pointer —
    * None before the first commit.
    */
  def latestVersion(path: String): Option[Int] =
    readPointer(path).map(_._1)

  private val FileLine =
    """\{"file":"([^"]+)","z_min":([^,]+),"z_max":([^,]+),"rows":(\d+)\}""".r
  private val RefLine =
    ("""\{"manifest":"([^"]+)","z_min":([^,]+),"z_max":([^,]+),""" +
      """"files":(\d+),"rows":(\d+)\}""").r

  private def manifestLines(stats: Seq[FileStat]): String =
    stats.map(f =>
      s"""{"file":"${f.file}","z_min":${f.zMin},"z_max":${f.zMax},""" +
        s""""rows":${f.rows}}""").mkString("\n")

  private def parseManifest(path: String, name: String): Seq[FileStat] =
    Files.readAllLines(logDir(path).resolve(name), StandardCharsets.UTF_8)
      .asScala.toIndexedSeq.collect {
        case FileLine(f, mn, mx, n) =>
          FileStat(f, mn.toDouble, mx.toDouble, n.toLong)
      }

  private def snapshotLines(refs: Seq[ManifestRef]): String =
    refs.map(refLine).mkString("\n")

  private def refLine(r: ManifestRef): String =
    s"""{"manifest":"${r.name}","z_min":${r.zMin},"z_max":${r.zMax},""" +
      s""""files":${r.files},"rows":${r.rows}}"""

  private val DelLine =
    """\{"delete":"([^"]+)","key":"([^"]+)","rows":(\d+),"v":(\d+)\}""".r

  private def delLine(d: DeleteRef): String =
    s"""{"delete":"${d.file}","key":"${d.key}","rows":${d.rows},""" +
      s""""v":${d.v}}"""

  /** The raw snapshot lines of `v` — manifest refs AND tombstone refs,
    * carried verbatim by append commits so a tombstone stays visible
    * until a compaction materializes it.
    */
  private def rawSnapshotLines(path: String, v: Int): Seq[String] = {
    val p = logDir(path).resolve(s"v$v")
    require(Files.exists(p), s"snapshot v$v does not exist (vacuumed?)")
    Files.readAllLines(p, StandardCharsets.UTF_8).asScala.toIndexedSeq
  }

  /** The equality-delete tombstones of `version`'s snapshot. */
  def deleteRefs(path: String, version: Option[Int] = None)
      : Seq[DeleteRef] = {
    val v = version.orElse(latestVersion(path)).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot in $path"))
    rawSnapshotLines(path, v).collect {
      case DelLine(f, k, n, dv) => DeleteRef(f, k, n.toLong, dv.toInt)
    }
  }

  /** The commit version a manifest's FILES belong to for tombstone
    * scoping ("m-5.json" and the COW rewrite "m-5-r2.json" are both 5
    * — a rewrite can only happen tombstone-free, see [[commitDelete]],
    * so its rows re-enter the sequence at the rewrite version).
    */
  private def manifestVersion(name: String): Int =
    name.stripPrefix("m-").takeWhile(_.isDigit).toInt

  /** The manifest list of `version` (or latest). */
  def snapshot(path: String, version: Option[Int] = None)
      : Seq[ManifestRef] = {
    val v = version.orElse(latestVersion(path)).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot in $path"))
    val p = logDir(path).resolve(s"v$v")
    require(Files.exists(p), s"snapshot v$v does not exist (vacuumed?)")
    Files.readAllLines(p, StandardCharsets.UTF_8).asScala.toIndexedSeq
      .collect {
        case RefLine(m, mn, mx, nf, nr) =>
          ManifestRef(m, mn.toDouble, mx.toDouble, nf.toInt, nr.toLong)
      }
  }

  private def envelope(stats: Seq[FileStat], name: String): ManifestRef = {
    // zero-row files carry the fileStats sentinels; the envelope over
    // finite bounds only, falling back to the never-selected sentinel
    // envelope when every file is empty
    val finite = stats.filter(_.rows > 0)
    if (finite.isEmpty)
      ManifestRef(name, Double.MaxValue, -Double.MaxValue, stats.size, 0L)
    else ManifestRef(name, finite.map(_.zMin).min, finite.map(_.zMax).max,
      stats.size, stats.map(_.rows).sum)
  }

  // ---- schema evolution: the schema travels in the commit log --------
  // Every commit writes `s-<v>.json` — the MERGE of the previous
  // version's schema with the committed batch's (new columns append;
  // a column absent on either side becomes nullable; a TYPE change is
  // rejected). Reads apply the version's schema explicitly, so (a) old
  // files fill evolved columns with null, (b) planning never runs a
  // footer-sampling mergeSchema job over a 100 TB file list — the same
  // reason Iceberg/Delta keep schemas in metadata — and (c) time
  // travel sees the schema AS OF that version.

  private def schemaPath(path: String, v: Int) =
    logDir(path).resolve(s"s-$v.json")

  /** The committed schema of `version` — None for tables written
    * before schema tracking (reads then fall back to file inference).
    */
  def readSchema(path: String, version: Int): Option[StructType] = {
    val p = schemaPath(path, version)
    if (!Files.exists(p)) None
    else Some(DataType.fromJson(
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
      .asInstanceOf[StructType])
  }

  private def mergeSchemas(prev: StructType, next: StructType)
      : StructType = {
    val pNames = prev.fieldNames.toSet
    val nNames = next.fieldNames.toSet
    next.fields.filter(f => pNames(f.name)).foreach { f =>
      require(prev(f.name).dataType == f.dataType,
        s"schema evolution cannot change the type of '${f.name}': " +
          s"${prev(f.name).dataType} -> ${f.dataType}")
    }
    StructType(
      prev.fields.map(f => if (nNames(f.name)) f
        else f.copy(nullable = true)) ++
      next.fields.filterNot(f => pNames(f.name))
        .map(_.copy(nullable = true)))
  }

  private def writeMergedSchema(path: String, v: Int, prevV: Option[Int],
      batch: StructType): Unit = {
    val merged = prevV.flatMap(readSchema(path, _)) match {
      case Some(p) => mergeSchemas(p, batch)
      case None => batch
    }
    writeAtomic(schemaPath(path, v), merged.json)
  }

  /** Read `paths` under `version`'s committed schema — files written
    * before a column existed fill it with null; without a schema file
    * the read falls back to inference (pre-evolution tables).
    */
  private def readFiles(spark: SparkSession, path: String, version: Int,
      paths: Seq[String]): DataFrame = readSchema(path, version) match {
    case Some(sc) => spark.read.schema(sc).parquet(paths: _*)
    case None => spark.read.parquet(paths: _*)
  }

  /** Sweep data files and metadata of an uncommitted version `v` — the
    * leftovers of an attempt that died before its pointer swing. They
    * were never visible (readers resolve through LATEST), and the
    * retrying commit must not interleave with them.
    */
  private def sweepUncommitted(path: String, v: Int): Unit = {
    Option(new java.io.File(path).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => (f.getName.startsWith(s"v$v-p") ||
        f.getName.startsWith(s"v$v-d")) && f.isFile)
      .foreach(_.delete())
    val log = logDir(path).toFile
    Option(log.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName == s"v$v" || f.getName == s"m-$v.json" ||
        f.getName == s"s-$v.json" || f.getName.startsWith(s"m-$v-r") ||
        f.getName.matches(s"m-\\d+-r$v-\\d+\\.json"))
      .foreach(_.delete())
  }

  /** Stage `df` range-sorted on `zcol`, move the staged parts to their
    * immutable `v<N>-p<i>.parquet` names, and return their stats (the
    * distributed bound scan; the collect is batch-sized by
    * construction).
    */
  private def writeDataFiles(df: DataFrame, path: String, v: Int,
      zcol: String, nFiles: Int): Seq[FileStat] = {
    val s = df.sparkSession
    val stage = s"$path/_log/_stage"
    df.repartitionByRange(nFiles, col(zcol))
      .sortWithinPartitions(col(zcol))
      .write.mode("overwrite").parquet(stage)
    val stageDir = Paths.get(stage)
    val parts = Files.list(stageDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("part-"))
      .toIndexedSeq.sorted
    val moved = parts.zipWithIndex.map { case (nm, i) =>
      val dst = f"v$v-p$i%05d.parquet"
      Files.move(stageDir.resolve(nm), Paths.get(path, dst),
        StandardCopyOption.ATOMIC_MOVE)
      dst
    }
    Writers.fileStats(s, path, moved.map(n => s"$path/$n"), zcol)
      .collect().map(r => FileStat(
        r.getString(0).split('/').last, r.getDouble(1), r.getDouble(2),
        r.getLong(3))).toIndexedSeq.sortBy(_.file)
  }

  /** APPEND commit: new data files + their manifest + a new snapshot
    * inheriting every previous manifest by reference + the pointer
    * swing. Returns the committed version. Cost tracks the batch —
    * the inherited metadata is copied as lines, never re-derived.
    */
  def commitAppend(df: DataFrame, path: String, zcol: String,
      nFiles: Int): Int = {
    val prev = latestVersion(path)
    val v = prev.getOrElse(0) + 1
    sweepUncommitted(path, v)
    writeMergedSchema(path, v, prev, df.schema)
    val stats = writeDataFiles(df, path, v, zcol, nFiles)
    val mName = s"m-$v.json"
    writeAtomic(logDir(path).resolve(mName), manifestLines(stats))
    // raw-line carry: manifest refs AND tombstone refs survive appends
    val prevLines = prev.map(p => rawSnapshotLines(path, p)).getOrElse(Nil)
    writeAtomic(logDir(path).resolve(s"v$v"),
      (prevLines :+ refLine(envelope(stats, mName))).mkString("\n"))
    swingPointer(path, v, -1L)
    v
  }

  /** EXACTLY-ONCE streaming append — the foreachBatch body that makes
    * the snapshot table a streaming sink: Spark's contract is
    * at-least-once (a batch can replay after a crash anywhere in the
    * commit), and a naive [[commitAppend]] would commit the replay as
    * a SECOND version. The batch id rides the LATEST pointer itself
    * (one file, one ATOMIC_MOVE — version and provenance publish
    * together), so the two crash windows both converge:
    *  - crash BEFORE the pointer swing: nothing became visible, the
    *    retry sweeps the uncommitted version's orphans and re-commits;
    *  - crash AFTER the swing: the retry reads its own batch id off
    *    the pointer and short-circuits to "already committed".
    * Checking only the LAST batch id suffices because foreachBatch is
    * sequential — batch N+1 never starts until N's commit returned
    * (the same argument as [[Writers.zoneMapIngestCommit]]'s ledger,
    * collapsed into the pointer). Returns false on the short-circuit.
    */
  def commitAppendOnce(df: DataFrame, path: String, zcol: String,
      nFiles: Int, batchId: Long): Boolean = {
    require(batchId >= 0, "batchId must be >= 0 (-1 marks non-batch commits)")
    val prev = readPointer(path)
    if (prev.exists(_._2 == batchId)) return false
    val v = prev.map(_._1).getOrElse(0) + 1
    sweepUncommitted(path, v)
    writeMergedSchema(path, v, prev.map(_._1), df.schema)
    val stats = writeDataFiles(df, path, v, zcol, nFiles)
    val mName = s"m-$v.json"
    writeAtomic(logDir(path).resolve(mName), manifestLines(stats))
    val prevLines =
      prev.map(p => rawSnapshotLines(path, p._1)).getOrElse(Nil)
    writeAtomic(logDir(path).resolve(s"v$v"),
      (prevLines :+ refLine(envelope(stats, mName))).mkString("\n"))
    swingPointer(path, v, batchId)
    true
  }

  /** COMPACTION commit — the OPTIMIZE job every streaming sink needs
    * once per-batch appends have fragmented the layout: the latest
    * snapshot's rows rewrite into ~`targetRowsPerFile` files as a NEW
    * version whose manifest replaces every previous one (same rows,
    * fresh layout — the oracle proves no row lost or doubled), while
    * prior versions keep reading the ORIGINAL files bit for bit until
    * vacuum. Cost is table-sized by definition; at scale this runs as
    * the standing background job, bin-packing only the small-file tail
    * — the full rewrite here keeps the gate's oracle sharp. Returns
    * (filesBefore, filesAfter, newVersion).
    */
  def compactCommit(spark: SparkSession, path: String, zcol: String,
      targetRowsPerFile: Long): (Int, Int, Int) = {
    val prev = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot in $path"))
    val refs = snapshot(path, Some(prev))
    val stats = refs.flatMap(r => parseManifest(path, r.name))
    val filesBefore = stats.size
    val rows = stats.map(_.rows).sum
    val nFiles = math.max(1L,
      (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    val v = prev + 1
    sweepUncommitted(path, v)
    val df = read(spark, path, Some(prev))
    writeMergedSchema(path, v, Some(prev), df.schema)
    val newStats = writeDataFiles(df, path, v, zcol, nFiles)
    val mName = s"m-$v.json"
    writeAtomic(logDir(path).resolve(mName), manifestLines(newStats))
    writeAtomic(logDir(path).resolve(s"v$v"),
      snapshotLines(Seq(envelope(newStats, mName))))
    swingPointer(path, v, -1L)
    (filesBefore, newStats.size, v)
  }

  /** INCREMENTAL COMPACTION — the standing background job of a
    * streamed-into table at scale, where [[compactCommit]]'s full
    * rewrite is not an option: only files UNDER `smallThresholdRows`
    * rewrite (bin-packed to ~`targetRowsPerFile`); every file at or
    * above the threshold carries — its name unchanged, its manifest
    * rewritten minus the compacted files (the COW delete's metadata
    * surgery), untouched manifests by reference. Cost tracks the
    * SMALL-FILE TAIL, not the table. Live tombstones are handled by
    * PARTIAL MATERIALIZATION: the rewritten rows read through
    * [[readApplying]], so each small file's applicable tombstones are
    * applied before its rows re-enter the sequence at the new version
    * (they would otherwise escape scoping), while carried files keep
    * their tombstone refs and read-time anti-joins — the same rows
    * before and after, which the gate's oracle pins. Returns
    * (filesCompacted, filesCarried, newVersion; the previous version
    * when fewer than two files are under the threshold).
    */
  def compactSmallFiles(spark: SparkSession, path: String, zcol: String,
      smallThresholdRows: Long, targetRowsPerFile: Long)
      : (Int, Int, Int) = {
    val prev = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot in $path"))
    val dels = deleteRefs(path, Some(prev))
    val byManifest = snapshot(path, Some(prev))
      .map(r => r -> parseManifest(path, r.name))
    val isSmall = (f: FileStat) => f.rows < smallThresholdRows
    val small = byManifest.flatMap { case (r, fs) =>
      fs.filter(isSmall).map(f => (manifestVersion(r.name), f)) }
    val carriedCount = byManifest.map(_._2.count(f => !isSmall(f))).sum
    if (small.size <= 1) return (0, carriedCount + small.size, prev)
    val v = prev + 1
    sweepUncommitted(path, v)
    val df = readApplying(spark, path, prev,
      small.map { case (mv, f) => (mv, s"$path/${f.file}") })
    val smallRows = small.map(_._2.rows).sum
    val nFiles = math.max(1L,
      (smallRows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    readSchema(path, prev).foreach(sc =>
      writeAtomic(schemaPath(path, v), sc.json))
    val newStats = writeDataFiles(df, path, v, zcol, nFiles)
    val mName = s"m-$v.json"
    writeAtomic(logDir(path).resolve(mName), manifestLines(newStats))
    val smallNames = small.map(_._2.file).toSet
    var ri = 0
    val carried = byManifest.flatMap { case (ref, fs) =>
      val kept = fs.filterNot(f => smallNames(f.file))
      if (kept.size == fs.size) Some(ref)
      else if (kept.isEmpty) None
      else {
        // the rewrite KEEPS the original version in its name: the
        // carried rows were NOT materialized, so they must stay at
        // their old sequence number or pending tombstones (dv < v)
        // would stop applying to them — unlike the COW delete/merge
        // rewrites, which run tombstone-free by contract
        ri += 1
        val rn = s"m-${manifestVersion(ref.name)}-r$v-$ri.json"
        writeAtomic(logDir(path).resolve(rn), manifestLines(kept))
        Some(envelope(kept, rn))
      }
    }
    // carried files still need their tombstones; the compacted rows
    // had theirs applied in the rewrite
    writeAtomic(logDir(path).resolve(s"v$v"),
      (carried.map(refLine) ++ dels.map(delLine) :+
        refLine(envelope(newStats, mName))).mkString("\n"))
    swingPointer(path, v, -1L)
    (small.size, carriedCount, v)
  }

  /** COPY-ON-WRITE DELETE commit: rows whose `keyCol` appears in `keys`
    * vanish from the NEW snapshot — touched files' survivors rewrite
    * as new files, touched manifests rewrite minus their dead rows
    * (metadata-sized), untouched manifests carry by reference, and
    * every PRIOR snapshot still reads the original files bit for bit.
    * Returns (rows deleted, new version; the previous version when the
    * keys match nothing).
    */
  def commitDelete(spark: SparkSession, path: String, keyCol: String,
      keys: DataFrame, zcol: String, nFiles: Int = 0): (Long, Int) = {
    val prev = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot in $path"))
    require(deleteRefs(path, Some(prev)).isEmpty,
      "snapshot carries merge-on-read tombstones - run compactCommit " +
        "to materialize them before a copy-on-write rewrite")
    val refs = snapshot(path, Some(prev))
    val byManifest = refs.map(r => r -> parseManifest(path, r.name))
    val allPaths = byManifest.flatMap(_._2).map(f => s"$path/${f.file}")
    val snapDf = readFiles(spark, path, prev, allPaths)
    val k = broadcast(keys.select(col(keyCol)).distinct())
    val touched = snapDf.withColumn("_f", input_file_name())
      .join(k, Seq(keyCol), "left_semi")
      .select(col("_f")).distinct().collect()
      .map(_.getString(0).split('/').last).toSet
    if (touched.isEmpty) return (0L, prev)
    val touchedPaths = touched.toIndexedSeq.sorted.map(n => s"$path/$n")
    val touchedDf = readFiles(spark, path, prev, touchedPaths)
    val rowsTouched = touchedDf.count()
    val survivors = touchedDf.join(k, Seq(keyCol), "left_anti")
    val rowsDeleted = rowsTouched - survivors.count()
    val v = prev + 1
    sweepUncommitted(path, v)
    writeMergedSchema(path, v, Some(prev), survivors.schema)
    val survStats = writeDataFiles(survivors, path, v, zcol,
      if (nFiles > 0) nFiles else touched.size)
    val mName = s"m-$v.json"
    writeAtomic(logDir(path).resolve(mName), manifestLines(survStats))
    var ri = 0
    val carried = byManifest.flatMap { case (ref, fs) =>
      val kept = fs.filterNot(f => touched(f.file))
      if (kept.size == fs.size) Some(ref) // untouched: by reference
      else if (kept.isEmpty) None // fully consumed
      else {
        ri += 1
        val rn = s"m-$v-r$ri.json"
        writeAtomic(logDir(path).resolve(rn), manifestLines(kept))
        Some(envelope(kept, rn))
      }
    }
    writeAtomic(logDir(path).resolve(s"v$v"),
      snapshotLines(carried :+ envelope(survStats, mName)))
    swingPointer(path, v, -1L)
    (rowsDeleted, v)
  }

  /** MERGE-ON-READ DELETE commit — the O(metadata) takedown: the keys
    * land as an equality-delete TOMBSTONE file and a one-line snapshot
    * entry; NO data file is touched, so the commit costs the tombstone
    * regardless of table size (the COW [[commitDelete]] rewrite is the
    * right tool when the delete is large or read-amplification
    * matters; this is the right tool when a takedown must land NOW on
    * a 100 TB table). Reads apply the tombstone as a broadcast
    * anti-join, scoped by sequence number: it deletes only from
    * manifests committed BEFORE it, so a later re-insert of a deleted
    * key survives (Iceberg v2 semantics). [[compactCommit]]
    * materializes tombstones and drops them from the new snapshot.
    * Tombstone sets are takedown-sized by contract — the file stages
    * as a single part. Returns (distinct tombstone keys, new version;
    * the previous version when `keys` is empty).
    */
  def commitDeleteMor(spark: SparkSession, path: String, keyCol: String,
      keys: DataFrame): (Long, Int) = {
    val prev = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot in $path"))
    val v = prev + 1
    sweepUncommitted(path, v)
    val stage = s"$path/_log/_stage"
    keys.select(col(keyCol)).distinct().coalesce(1)
      .write.mode("overwrite").parquet(stage)
    val stageDir = Paths.get(stage)
    val part = Files.list(stageDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("part-"))
      .toIndexedSeq.sorted.headOption.getOrElse(
        throw new IllegalStateException("tombstone stage produced no part"))
    val dst = f"v$v-d00000.parquet"
    Files.move(stageDir.resolve(part), Paths.get(path, dst),
      StandardCopyOption.ATOMIC_MOVE)
    val n = spark.read.parquet(s"$path/$dst").count()
    if (n == 0) { Files.deleteIfExists(Paths.get(path, dst)); return (0L, prev) }
    // the schema is unchanged by a tombstone; carry it so readFiles
    // keeps resolving this version without inference
    readSchema(path, prev).foreach(sc =>
      writeAtomic(schemaPath(path, v), sc.json))
    writeAtomic(logDir(path).resolve(s"v$v"),
      (rawSnapshotLines(path, prev) :+
        delLine(DeleteRef(dst, keyCol, n, v))).mkString("\n"))
    swingPointer(path, v, -1L)
    (n, v)
  }

  /** COPY-ON-WRITE MERGE (upsert) commit — the CDC write path: rows of
    * `changes` REPLACE same-key rows of the latest snapshot, new keys
    * INSERT, and only the files holding a matched key rewrite; their
    * manifests rewrite minus the dead rows, untouched manifests carry
    * by reference, and the pre-merge version stays readable bit for
    * bit until vacuum — [[TxJsonSink.merge]]'s shape on the
    * stats-carrying format. A change set with MULTIPLE rows per
    * matched key is rejected (nondeterministic which would win — the
    * standard MERGE contract; multiple inserts of one NEW key are the
    * caller's own data). Returns (filesReplaced, filesCarried,
    * newVersion).
    */
  def commitMerge(spark: SparkSession, path: String,
      changes: DataFrame, key: String, zcol: String): (Int, Int, Int) = {
    val prev = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot in $path"))
    require(deleteRefs(path, Some(prev)).isEmpty,
      "snapshot carries merge-on-read tombstones - run compactCommit " +
        "to materialize them before a copy-on-write rewrite")
    val refs = snapshot(path, Some(prev))
    val byManifest = refs.map(r => r -> parseManifest(path, r.name))
    val filesBefore = byManifest.map(_._2.size).sum
    val allPaths = byManifest.flatMap(_._2).map(f => s"$path/${f.file}")
    val snapDf = readFiles(spark, path, prev, allPaths)
    val dupCand = changes.groupBy(col(key))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).select(col(key))
    if (dupCand.limit(1).collect().nonEmpty) {
      val dupMatched = snapDf
        .join(broadcast(dupCand), Seq(key), "left_semi")
        .select(col(key)).distinct().limit(5).collect().map(_.get(0))
      require(dupMatched.isEmpty,
        s"merge: changes carry multiple rows per matched key ($key): " +
          dupMatched.mkString(",") + " — pre-aggregate to one row per key")
    }
    val k = broadcast(changes.select(col(key)).distinct())
    val touched = snapDf.withColumn("_f", input_file_name())
      .join(k, Seq(key), "left_semi")
      .select(col("_f")).distinct().collect()
      .map(_.getString(0).split('/').last).toSet
    val survivors =
      if (touched.isEmpty) changes.limit(0)
      else readFiles(spark, path, prev,
          touched.toIndexedSeq.sorted.map(n => s"$path/$n"))
        .join(k, Seq(key), "left_anti")
    val rewrite = survivors.unionByName(changes,
      allowMissingColumns = true)
    val v = prev + 1
    sweepUncommitted(path, v)
    writeMergedSchema(path, v, Some(prev), rewrite.schema)
    val newStats = writeDataFiles(rewrite, path, v, zcol,
      math.max(1, touched.size))
    val mName = s"m-$v.json"
    writeAtomic(logDir(path).resolve(mName), manifestLines(newStats))
    var ri = 0
    val carried = byManifest.flatMap { case (ref, fs) =>
      val kept = fs.filterNot(f => touched(f.file))
      if (kept.size == fs.size) Some(ref)
      else if (kept.isEmpty) None
      else {
        ri += 1
        val rn = s"m-$v-r$ri.json"
        writeAtomic(logDir(path).resolve(rn), manifestLines(kept))
        Some(envelope(kept, rn))
      }
    }
    writeAtomic(logDir(path).resolve(s"v$v"),
      snapshotLines(carried :+ envelope(newStats, mName)))
    swingPointer(path, v, -1L)
    (touched.size, filesBefore - touched.size, v)
  }

  /** Read a snapshot: exactly the files its manifests list — later
    * commits are invisible (snapshot isolation), earlier versions stay
    * readable (time travel).
    */
  /** Read `(manifestVersion, filePath)` pairs under `v`'s schema and
    * apply `v`'s tombstones with sequence scoping: a tombstone at
    * version d deletes only from files whose manifest committed before
    * d. Files sharing an applicable-tombstone set read as ONE scan (at
    * most #tombstones+1 groups — no tombstones means the single-scan
    * fast path), each group anti-joined against its broadcast key
    * files.
    */
  private def readApplying(spark: SparkSession, path: String, v: Int,
      pairs: Seq[(Int, String)]): DataFrame = {
    val dels = deleteRefs(path, Some(v))
    if (dels.isEmpty) readFiles(spark, path, v, pairs.map(_._2))
    else pairs.groupBy { case (mv, _) =>
        dels.filter(_.v > mv).map(_.file).sorted }
      .toSeq.sortBy(_._1.mkString(","))
      .map { case (delFiles, grp) =>
        val base = readFiles(spark, path, v, grp.map(_._2))
        delFiles.foldLeft(base) { (df, dfile) =>
          val d = dels.find(_.file == dfile).get
          df.join(broadcast(spark.read.parquet(s"$path/${d.file}")),
            Seq(d.key), "left_anti")
        }
      }.reduce(_ unionByName _)
  }

  private def manifestFilePairs(path: String, v: Int)
      : Seq[(Int, String)] =
    snapshot(path, Some(v)).flatMap(r =>
      parseManifest(path, r.name).map(f =>
        (manifestVersion(r.name), s"$path/${f.file}")))

  def read(spark: SparkSession, path: String,
      version: Option[Int] = None): DataFrame = {
    val v = version.orElse(latestVersion(path)).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot in $path"))
    readApplying(spark, path, v, manifestFilePairs(path, v))
  }

  /** ZONE-PRUNED snapshot read: (candidates, filesRead, filesTotal).
    * Planning descends the metadata pyramid — manifest-list envelopes
    * first, surviving manifests' file bounds second — and skipping is
    * SOUND by the same argument as [[Writers.readZonePruned]]: a file
    * is dropped only when its recorded bounds exclude the whole range,
    * so the candidates plus the exact residual equal a full-snapshot
    * filter. Works at any `version`: bounds are immutable with the
    * files they describe, so time travel and pruning compose for free.
    */
  def readPruned(spark: SparkSession, path: String, lo: Double,
      hi: Double, version: Option[Int] = None)
      : (DataFrame, Long, Long) = {
    val v = version.orElse(latestVersion(path)).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot in $path"))
    val refs = snapshot(path, Some(v))
    val total = refs.map(_.files.toLong).sum
    val hitRefs = refs.filter(r => r.zMin <= hi && r.zMax >= lo)
    val hit = hitRefs.flatMap(r =>
        parseManifest(path, r.name)
          .filter(f => f.zMin <= hi && f.zMax >= lo)
          .map(f => (manifestVersion(r.name), s"$path/${f.file}")))
      .sortBy(_._2)
    val df =
      if (hit.nonEmpty) readApplying(spark, path, v, hit)
      else read(spark, path, Some(v)).filter(lit(false))
    (df, hit.length.toLong, total)
  }

  /** CHANGES FEED — the row-level diff between two committed versions,
    * the read that makes the table a source for INCREMENTAL consumers
    * (a downstream index, a materialized aggregate, a replication
    * stream) without re-reading the table. Cost is O(delta), not
    * O(table): planning diffs the two manifest lists as FILE sets and
    * reads only files present on one side — an append-only history
    * reads exactly the appended files. A COW rewrite (delete/merge/
    * compact) moves surviving rows into new files, putting them on
    * BOTH sides of the file diff; the full-row `exceptAll` cancels
    * them (bag semantics, so duplicate rows cancel pairwise), leaving
    * the true inserts and deletes. Returns (changes with a `_change`
    * column of "insert"/"delete", filesRead, filesTotal-at-`to`).
    */
  def readChanges(spark: SparkSession, path: String, fromV: Int,
      toV: Int): (DataFrame, Long, Long) = {
    require(fromV <= toV, s"readChanges: from v$fromV > to v$toV")
    Seq(fromV, toV).foreach(v => require(
      deleteRefs(path, Some(v)).isEmpty,
      s"readChanges: v$v carries merge-on-read tombstones - run " +
        "compactCommit to materialize them first"))
    def fileSet(v: Int): Set[String] =
      snapshot(path, Some(v)).flatMap(r => parseManifest(path, r.name))
        .filter(_.rows > 0).map(_.file).toSet
    val from = fileSet(fromV)
    val to = fileSet(toV)
    val total = snapshot(path, Some(toV)).map(_.files.toLong).sum
    val addedF = (to -- from).toIndexedSeq.sorted.map(n => s"$path/$n")
    val removedF = (from -- to).toIndexedSeq.sorted.map(n => s"$path/$n")
    // both sides read under toV's schema (a superset of fromV's — the
    // s-files accumulate merges), so exceptAll compares like with like
    // and pre-evolution rows fill the evolved columns with null
    def readOr(paths: Seq[String], other: Seq[String]): DataFrame =
      if (paths.nonEmpty) readFiles(spark, path, toV, paths)
      else readFiles(spark, path, toV, other).filter(lit(false))
    if (addedF.isEmpty && removedF.isEmpty) {
      val empty = read(spark, path, Some(toV)).filter(lit(false))
      return (empty.withColumn("_change", lit("insert")), 0L, total)
    }
    val added = readOr(addedF, removedF)
    val removed = readOr(removedF, addedF)
    val inserts = added.exceptAll(removed)
      .withColumn("_change", lit("insert"))
    val deletes = removed.exceptAll(added)
      .withColumn("_change", lit("delete"))
    (inserts.unionByName(deletes),
      (addedF.size + removedF.size).toLong, total)
  }

  /** INCREMENTAL VIEW MAINTENANCE — apply a [[readChanges]] delta to a
    * standing grouped aggregate instead of recomputing it: count and
    * SUM are self-maintainable (insert adds, delete subtracts — min/
    * max are not; they need a recompute leg on deletes), so a
    * downstream materialized aggregate stays exact at O(delta) +
    * O(|view|) per refresh and the base table is never re-read. The
    * view's schema contract: `groupCols` ++ a long count `n` ++
    * `sumCols` under their own names; groups whose count reaches zero
    * drop out. Decimal sums stay in exact decimal arithmetic
    * throughout. The CDC delete+insert pairs a MERGE emits net to the
    * update's true effect.
    */
  def incrementalAgg(mv: DataFrame, changes: DataFrame,
      groupCols: Seq[String], sumCols: Seq[String]): DataFrame = {
    val sign = when(col("_change") === lit("insert"), lit(1))
      .otherwise(lit(-1))
    val aggs = sum(sign.cast("long")).as("_dn") +:
      sumCols.map(c => sum(col(c) * sign).as(s"_d_$c"))
    val delta = changes.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    mv.join(delta, groupCols, "full_outer")
      .select((groupCols.map(col) :+
        (coalesce(col("n"), lit(0L)) + coalesce(col("_dn"), lit(0L)))
          .as("n")) ++
        sumCols.map(c => (coalesce(col(c), lit(0)) +
          coalesce(col(s"_d_$c"), lit(0))).as(c)): _*)
      .filter(col("n") > 0)
  }

  /** METADATA-ONLY aggregates: COUNT(*), MIN(zcol), MAX(zcol) answered
    * from the manifest stats alone — ZERO data files opened, cost
    * O(manifest lines) regardless of table size. This is the planning
    * payoff of carrying exact per-file bounds in the commit log: on a
    * 100 TB table the answer comes off kilobytes of metadata. Sound
    * because [[Writers.fileStats]] records the TRUE per-file min/max
    * and row count at write time and files are immutable afterwards;
    * works at any `version` for the same reason time travel does.
    * Empty-file sentinels are excluded the same way [[envelope]] does.
    */
  def statsAgg(path: String, version: Option[Int] = None)
      : (Long, Double, Double) = {
    val vv = version.orElse(latestVersion(path))
    require(deleteRefs(path, vv).isEmpty,
      "statsAgg: snapshot carries merge-on-read tombstones whose rows " +
        "the manifest stats still count - run compactCommit first")
    val stats = snapshot(path, version)
      .flatMap(r => parseManifest(path, r.name)).filter(_.rows > 0)
    require(stats.nonEmpty, s"statsAgg: snapshot of $path holds no rows")
    (stats.map(_.rows).sum, stats.map(_.zMin).min, stats.map(_.zMax).max)
  }

  /** Zone-accelerated COUNT over `[lo, hi]`: files whose bounds fall
    * FULLY inside the range are counted from metadata (no I/O), files
    * disjoint from the range are skipped, and only the files that
    * STRADDLE a boundary are scanned with the residual filter. On a
    * range-clustered table the straddle set is O(boundary) — two files
    * per predicate edge — independent of how many files the range
    * covers, so a count over 10% of a 100 TB table opens a handful of
    * files. Sound by the zone-map argument both ways: full-inside
    * files can hold no row outside the range, disjoint files no row
    * inside it. Returns (count, rowsFromMetadata, filesScanned,
    * filesTotal) — the second component is the evidence that the
    * metadata path contributed, not just a narrowed scan.
    */
  def countRange(spark: SparkSession, path: String, zcol: String,
      lo: Double, hi: Double, version: Option[Int] = None)
      : (Long, Long, Long, Long) = {
    require(deleteRefs(path,
        version.orElse(latestVersion(path))).isEmpty,
      "countRange: snapshot carries merge-on-read tombstones whose " +
        "rows the manifest stats still count - run compactCommit first")
    val refs = snapshot(path, version)
    val total = refs.map(_.files.toLong).sum
    val files = refs.filter(r => r.zMin <= hi && r.zMax >= lo)
      .flatMap(r => parseManifest(path, r.name))
      .filter(f => f.rows > 0 && f.zMin <= hi && f.zMax >= lo)
    val (inside, straddle) =
      files.partition(f => f.zMin >= lo && f.zMax <= hi)
    val metaRows = inside.map(_.rows).sum
    val scanned =
      if (straddle.isEmpty) 0L
      else spark.read.parquet(
          straddle.map(f => s"$path/${f.file}").sorted: _*)
        .filter(col(zcol).cast("double").between(lit(lo), lit(hi)))
        .count()
    (metaRows + scanned, metaRows, straddle.size.toLong, total)
  }

  /** Retention GC — drop snapshots older than the last `keepLast`
    * versions, then every manifest and data file no retained snapshot
    * references. Vacuumed versions stop being time-travelable (the
    * explicit retention trade every table format makes); retained
    * reads are unaffected. Returns (snapshotsDeleted, filesDeleted).
    */
  def vacuum(path: String, keepLast: Int = 1): (Int, Int) = {
    require(keepLast >= 1, "must keep at least the latest snapshot")
    val latest = latestVersion(path).getOrElse(return (0, 0))
    val cutoff = latest - keepLast + 1
    val retained = (math.max(1, cutoff) to latest)
      .filter(v => Files.exists(logDir(path).resolve(s"v$v")))
    val keepManifests =
      retained.flatMap(v => snapshot(path, Some(v))).map(_.name).toSet
    val keepFiles = keepManifests
      .flatMap(m => parseManifest(path, m)).map(_.file) ++
      retained.flatMap(v => deleteRefs(path, Some(v))).map(_.file)
    var sDel = 0
    (1 until cutoff).foreach { v =>
      if (Files.deleteIfExists(logDir(path).resolve(s"v$v"))) sDel += 1
      Files.deleteIfExists(schemaPath(path, v))
    }
    val log = logDir(path).toFile
    Option(log.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName.startsWith("m-") &&
        f.getName.endsWith(".json") && !keepManifests(f.getName))
      .foreach(_.delete())
    var fDel = 0
    Option(new java.io.File(path).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && f.getName.startsWith("v") &&
        f.getName.endsWith(".parquet") && !keepFiles(f.getName))
      .foreach { f => if (f.delete()) fDel += 1 }
    (sDel, fDel)
  }
}
