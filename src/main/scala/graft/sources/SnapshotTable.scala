package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
  *       m-3.json               manifest: per-FILE stats of one commit's
  *                              files (batch-sized): legacy double zone
  *                              bounds + typed PER-COLUMN min/max
  *       v1 v2 v3               snapshots: the MANIFEST LIST — one line
  *                              per manifest with its bound ENVELOPE
  *                              (legacy + per-column)
  *       s-3.json               the schema AS OF v3 (see below)
  *       c-4                    a claim: version 4 is being written
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
  * PER-COLUMN STATS (this is what lets keyed writes plan through the
  * pyramid, not only reads): every data file's manifest line carries
  * typed min/max for each supported top-level column — integral,
  * float/double, decimal, string (UTF-8 byte order, matching Spark's
  * UTF8String comparison), date (epoch day), timestamp (epoch micros).
  * [[readPrunedCol]] serves range probes on ANY stat-carrying column,
  * and [[commitDeletePlanned]]/[[commitMergePlanned]] use the key
  * column's bounds to find candidate files BEFORE any data I/O — a
  * 10-key delete on a 100 TB table opens the handful of files whose
  * recorded key range can hold those keys, instead of scanning the
  * table to learn which files it touches.
  *
  * CRASH SAFETY: data files and manifests are written before the
  * snapshot file, the snapshot before the pointer swing, and every
  * metadata write is tmp + ATOMIC_MOVE — a crash anywhere leaves the
  * previous snapshot fully intact (readers resolve through LATEST) and
  * the orphaned files invisible; the next commit of that version
  * sweeps them.
  *
  * CONCURRENT WRITERS (optimistic concurrency on the pointer swing):
  * a committer CLAIMS its target version by atomically creating
  * `_log/c-<v>` (createFile is the filesystem's CAS), verifies the
  * pointer did not move between read and claim, writes, swings the
  * pointer, and releases the claim. Appends that lose the race WAIT
  * for the winner's swing and re-plan against the new snapshot (their
  * payload is position-independent); copy-on-write rewrites FAIL
  * CLEANLY instead (their plan is version-specific). A claim whose
  * holder died without releasing blocks waiters for [[claimStaleMs]],
  * then is broken and its orphans swept — the standard lease trade
  * every lock-service-free format makes on a plain filesystem.
  * Single-FILESYSTEM by design — the same documented scope as
  * [[TxJsonSink]] (an object-store port swaps java.nio for the
  * FileSystem API plus a conditional-put; the protocol is unchanged).
  *
  * Deletion is COPY-ON-WRITE at the file level and O(metadata) at the
  * manifest level: touched files' survivors rewrite as new files,
  * touched MANIFESTS rewrite minus their dead rows, untouched
  * manifests carry into the new snapshot BY REFERENCE. Old snapshots
  * still list the replaced files, so every prior version stays
  * readable bit for bit until [[vacuum]] reclaims it.
  */
/** A changes-feed consumer's cursor points BELOW the vacuum horizon:
  * the snapshot its incremental fold would diff against no longer
  * exists. RECOVERY: reset the cursor to 0 and rebuild from the
  * empty-table baseline — `readChanges(0, latestAnnounced)` needs no
  * earlier snapshot and replays the whole table as inserts.
  * [[SnapshotTable.maintainAgg]] performs that reset automatically;
  * hand-rolled consumers catch this (instead of an opaque require)
  * and do the same.
  */
class SnapshotVacuumedException(msg: String)
  extends IllegalStateException(msg)

object SnapshotTable {

  /** Typed min/max of one column in one data file (or, on a manifest
    * ref, the envelope over its files). `lo`/`hi` are canonical string
    * forms under tag `t`: l=integral (long), d=float/double,
    * dec=decimal (plain string), s=string (UTF-8 byte order), dt=date
    * (epoch day), ts=timestamp (epoch micros). Both None means the
    * column holds NO non-null value — prunable for any non-null
    * predicate. A column of unsupported type simply has no ColStat,
    * which planning treats as "unknown: keep".
    */
  case class ColStat(col: String, t: String,
      lo: Option[String], hi: Option[String])

  case class FileStat(file: String, zMin: Double, zMax: Double,
      rows: Long, cols: Seq[ColStat] = Nil,
      blooms: Seq[(String, String)] = Nil)
  case class ManifestRef(name: String, zMin: Double, zMax: Double,
      files: Int, rows: Long, cols: Seq[ColStat] = Nil,
      blooms: Seq[(String, String)] = Nil)
  /** An equality-delete tombstone: `file` holds the distinct keys of
    * column `key`; it applies to rows in manifests COMMITTED BEFORE
    * version `v` (Iceberg v2's sequence-number scoping) — a later
    * re-insert of a deleted key survives. A key set larger than
    * [[TombstoneRowsPerFile]] stages as SEVERAL files, one ref each
    * (same `v`, same `key`): the refs' recorded row counts are what
    * lets the read path pick broadcast vs shuffle per tombstone.
    */
  case class DeleteRef(file: String, key: String, rows: Long, v: Int)

  /** A PREDICATE merge-on-read delete: rows of stat-carrying column
    * `col` inside the closed range [lo, hi] (canonical forms under tag
    * `t`; an open side is None) vanish from manifests COMMITTED BEFORE
    * version `v` — the same sequence scoping as [[DeleteRef]], with the
    * key SET replaced by a serialized comparison, so a retention drop
    * ("everything before this date") lands as ONE snapshot line and no
    * data file or key file is written at all. NULL values never match
    * a range predicate and always survive.
    */
  case class PredDeleteRef(col: String, t: String, lo: Option[String],
      hi: Option[String], v: Int)

  // ---- typed column stats: tags, canonical forms, comparison ---------

  private[sources] def colTag(dt: DataType): Option[String] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some("l")
    case FloatType | DoubleType => Some("d")
    case _: DecimalType => Some("dec")
    case StringType => Some("s")
    case DateType => Some("dt")
    case TimestampType => Some("ts")
    case _ => None
  }

  /** Canonical string of a collected min/max (or caller-supplied bound)
    * under `t`. Accepts both the java.sql and java.time externals (the
    * session's datetime.java8API flag decides which Spark hands back)
    * and, for bounds arriving from a caller, plain "yyyy-MM-dd" /
    * ISO-instant strings.
    */
  private def canonOf(t: String, v: Any): String = (t, v) match {
    case ("l", n: java.lang.Number) => n.longValue.toString
    case ("l", s: String) => s.trim.toLong.toString
    case ("d", n: java.lang.Number) => n.doubleValue.toString
    case ("d", s: String) => s.trim.toDouble.toString
    case ("dec", d: java.math.BigDecimal) => d.toPlainString
    case ("dec", d: scala.math.BigDecimal) => d.bigDecimal.toPlainString
    case ("dec", x) => new java.math.BigDecimal(x.toString).toPlainString
    case ("s", x) => x.toString
    case ("dt", d: java.sql.Date) => d.toLocalDate.toEpochDay.toString
    case ("dt", d: java.time.LocalDate) => d.toEpochDay.toString
    case ("dt", s: String) =>
      java.time.LocalDate.parse(s.trim).toEpochDay.toString
    case ("ts", x) =>
      val i = x match {
        case ts: java.sql.Timestamp => ts.toInstant
        case in: java.time.Instant => in
        case s: String => java.time.Instant.parse(s.trim)
        case other => throw new IllegalArgumentException(
          s"cannot canonicalize $other as a timestamp bound")
      }
      (i.getEpochSecond * 1000000L + i.getNano / 1000L).toString
    case (tag, other) => throw new IllegalArgumentException(
      s"cannot canonicalize ${other.getClass.getName} under tag '$tag'")
  }

  /** Order of two canonical values under tag `t`. Strings compare as
    * UTF-8 bytes — the SAME total order as Spark's UTF8String binary
    * comparison, so bounds recorded by a Spark min/max stay sound
    * against bounds compared here (Java's String.compareTo differs for
    * supplementary characters and would not be).
    */
  private def cmpCanon(t: String, a: String, b: String): Int = t match {
    case "l" | "dt" | "ts" => java.lang.Long.compare(a.toLong, b.toLong)
    case "d" => java.lang.Double.compare(a.toDouble, b.toDouble)
    case "dec" =>
      new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b))
    case "s" =>
      val x = a.getBytes(StandardCharsets.UTF_8)
      val y = b.getBytes(StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        val c = (x(i) & 0xFF) - (y(i) & 0xFF)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    case other =>
      throw new IllegalArgumentException(s"unknown stat tag '$other'")
  }

  private def statFor(cols: Seq[ColStat], c: String): Option[ColStat] =
    cols.find(_.col == c)

  // ---- driver-side metadata I/O (tmp + ATOMIC_MOVE everywhere) --------

  private def logDir(path: String) = Paths.get(path, "_log")

  private def writeAtomic(p: java.nio.file.Path, content: String): Unit = {
    Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE)
  }

  /** The LATEST pointer's payload: (version, batch id of the LAST
    * STREAMING commit — −1 before any, that commit's WRITER id — ""
    * before any). One file, one ATOMIC_MOVE, so version AND provenance
    * publish together: that is what makes the streaming commit
    * exactly-once (see [[commitAppendOnce]]) without a separate ledger
    * whose write would open a crash window after the pointer swing.
    * Non-streaming commits CARRY the previous pointer's (batchId,
    * writerId) forward instead of erasing them: the docs recommend
    * compaction as a standing background job on streamed-into tables,
    * and a compaction landing between a stream crash (after the sink
    * swing, before Spark's checkpoint commit) and the restart must not
    * make the replayed batch commit twice — the provenance survives
    * every interleaved non-streaming commit, exactly like Delta's
    * per-appId txn versions. The writer id SCOPES the provenance the
    * same way Delta's appId does: a brand-new streaming query (fresh
    * checkpoint, batch ids restarting at 0) attached to a table whose
    * carried id happens to equal its first batch id must NOT
    * short-circuit another writer's provenance — that would be silent
    * data loss, not dedup. Pointers written before the writer-id era
    * parse with writerId = "" and keep their old (id-only) semantics.
    */
  private def readPointer(path: String): Option[(Int, Long, String)] = {
    val p = logDir(path).resolve("LATEST")
    if (!Files.exists(p)) None
    else {
      val parts = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        .trim.split("\\s+")
      Some((parts(0).toInt,
        if (parts.length > 1) parts(1).toLong else -1L,
        if (parts.length > 2) parts(2) else ""))
    }
  }

  private def swingPointer(path: String, v: Int, batchId: Long,
      writerId: String = ""): Unit = {
    require(!writerId.exists(_.isWhitespace),
      s"writerId must not contain whitespace: '$writerId'")
    writeAtomic(logDir(path).resolve("LATEST"),
      if (writerId.isEmpty) s"$v $batchId" else s"$v $batchId $writerId")
  }

  /** The (batchId, writerId) a NON-streaming commit must carry forward
    * (see [[readPointer]]) — the previous pointer's, or (−1, "") on a
    * fresh table.
    */
  private def carriedBatchId(
      prevPtr: Option[(Int, Long, String)]): (Long, String) =
    prevPtr.map(p => (p._2, p._3)).getOrElse((-1L, ""))

  /** Latest committed version, resolved through the atomic pointer —
    * None before the first commit.
    */
  def latestVersion(path: String): Option[Int] =
    readPointer(path).map(_._1)

  // ---- optimistic concurrency: version claims -------------------------

  /** How long a waiter lets a competing claim block before declaring
    * its holder dead and breaking it. A lease, not a proof — a holder
    * merely SLOWER than this can lose its in-flight commit to the
    * takeover (the standard trade of lock-service-free formats on a
    * plain filesystem; Delta on S3 pre-conditional-put had the same).
    * Volatile test hook; production default 60 s.
    */
  @volatile private[graft] var claimStaleMs: Long = 60000L

  private def claimPath(path: String, v: Int) =
    logDir(path).resolve(s"c-$v")

  /** Atomically claim version `v` — CREATE_NEW IS the filesystem CAS.
    * The claim file carries the claimant's NONCE, so a holder can
    * re-verify ownership before its destructive writes (see
    * [[requireClaimHeld]]): after a stale-claim takeover, the slow
    * holder's nonce no longer matches and it aborts instead of
    * overwriting the takeover winner's already-committed files.
    */
  private def tryClaim(path: String, v: Int, nonce: String): Boolean = {
    Files.createDirectories(logDir(path))
    try {
      Files.write(claimPath(path, v),
        nonce.getBytes(StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE_NEW)
      true
    }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
  }

  private def newNonce(): String = java.util.UUID.randomUUID().toString

  /** Abort (without publishing) unless this writer STILL holds its
    * claim. Checked immediately before the staged-part moves and again
    * before the manifest/snapshot writes + pointer swing, so a
    * slower-than-the-lease holder loses its in-flight commit CLEANLY
    * instead of clobbering the takeover winner's committed version.
    * The residual window (between a check and the write it guards) is
    * milliseconds; keep [[claimStaleMs]] well above worst-case commit
    * time regardless — the lease trade is narrowed here, not removed.
    */
  private def requireClaimHeld(path: String, v: Int,
      nonce: String): Unit = {
    val p = claimPath(path, v)
    val held = Files.exists(p) &&
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8) == nonce
    if (!held) throw new java.util.ConcurrentModificationException(
      s"claim on v$v of $path was broken (stale-lease takeover) — " +
        "aborting before any published state is touched")
  }

  private def releaseClaim(path: String, v: Int): Unit =
    Files.deleteIfExists(claimPath(path, v))

  /** Claim the next commit slot for an APPEND: loop of (read pointer,
    * claim prev+1, verify the pointer did not move under the claim);
    * on contention, wait for the holder's swing (or its release, or
    * staleness) and re-plan against whatever is latest then. Returns
    * (pointer as read, claimed version, claim nonce) with the claim
    * HELD — the caller must release it in a finally.
    */
  private def claimNext(path: String)
      : (Option[(Int, Long, String)], Int, String) = {
    while (true) {
      val ptr = readPointer(path)
      val v = ptr.map(_._1).getOrElse(0) + 1
      val nonce = newNonce()
      if (tryClaim(path, v, nonce)) {
        // a racing writer may have committed v and released between our
        // pointer read and the claim — verify, else re-plan
        if (readPointer(path) == ptr) return (ptr, v, nonce)
        releaseClaim(path, v)
      } else {
        val t0 = System.currentTimeMillis()
        var moved = false
        while (!moved && System.currentTimeMillis() - t0 < claimStaleMs) {
          if (latestVersion(path).exists(_ >= v) ||
            !Files.exists(claimPath(path, v))) moved = true
          else Thread.sleep(2)
        }
        // stale holder: break the claim; the next claimant's
        // sweepUncommitted clears its orphans
        if (!moved) releaseClaim(path, v)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Claim `prev + 1` for a COPY-ON-WRITE rewrite (delete/merge/
    * compact/tombstone): these plan against `prev` specifically, so a
    * lost race FAILS CLEANLY instead of re-planning — the caller
    * re-runs against the new snapshot if it still wants to. Claim is
    * HELD on return; release in a finally. Returns (version, nonce).
    */
  private def claimCow(path: String, prev: Int, op: String)
      : (Int, String) = {
    val v = prev + 1
    val nonce = newNonce()
    if (!tryClaim(path, v, nonce))
      throw new java.util.ConcurrentModificationException(
        s"$op: another writer holds the claim on v$v of $path")
    if (!latestVersion(path).contains(prev)) {
      releaseClaim(path, v)
      throw new java.util.ConcurrentModificationException(
        s"$op: table $path moved past v$prev while planning")
    }
    (v, nonce)
  }

  /** Bounded re-plan-and-retry around a COPY-ON-WRITE commit for the
    * standing-compactor shape: COW commits fail cleanly on a lost race
    * ([[claimCow]]), and a background OPTIMIZE racing a stream of
    * appends should re-plan against the new latest and try again
    * rather than surface every benign collision. `body` must RE-READ
    * the latest version itself (every commit in this object does);
    * between attempts the helper waits for the competing writer's
    * pointer swing (or its claim release) so the retry re-plans
    * against settled state instead of spinning into the same claim.
    */
  def withCowRetry[T](path: String, attempts: Int = 3)(body: => T): T = {
    var left = attempts
    while (true) {
      try return body
      catch {
        case e: java.util.ConcurrentModificationException =>
          left -= 1
          if (left <= 0) throw e
          val v0 = latestVersion(path)
          val t0 = System.currentTimeMillis()
          while (latestVersion(path) == v0 &&
            latestVersion(path).exists(v =>
              Files.exists(claimPath(path, v + 1))) &&
            System.currentTimeMillis() - t0 < claimStaleMs)
            Thread.sleep(2)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  // ---- manifest / snapshot / tombstone line encoding ------------------

  private def esc(s: String): String = s.flatMap {
    case '\\' => "\\\\"
    case '"' => "\\\""
    case '\n' => "\\n"
    case '\r' => "\\r"
    case c => c.toString
  }

  private def unesc(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => b += '\n'
          case 'r' => b += '\r'
          case o => b += o
        }
        i += 2
      } else { b += c; i += 1 }
    }
    b.toString
  }

  private def colStatJson(c: ColStat): String = (c.lo, c.hi) match {
    case (Some(l), Some(h)) =>
      s"""{"c":"${esc(c.col)}","t":"${c.t}","lo":"${esc(l)}",""" +
        s""""hi":"${esc(h)}"}"""
    case _ => s"""{"c":"${esc(c.col)}","t":"${c.t}"}"""
  }

  private def colsJson(cols: Seq[ColStat]): String =
    if (cols.isEmpty) ""
    else cols.map(colStatJson).mkString(""","cols":[""", ",", "]")

  // `cols` and `bf` are optional in BOTH lines: manifests written
  // before the per-column era (and the spec's hand-crafted crash
  // fixtures) parse to cols=Nil, which planning treats as "no stats:
  // cannot prune" — old tables stay readable and merely un-prunable
  // on typed columns.
  private val FileLine =
    ("""\{"file":"([^"]+)","z_min":([^,]+),"z_max":([^,]+),"rows":(\d+)""" +
      """(?:,"cols":\[(.*?)\])?(?:,"bf":\[(.*?)\])?\}""").r
  private val RefLine =
    ("""\{"manifest":"([^"]+)","z_min":([^,]+),"z_max":([^,]+),""" +
      """"files":(\d+),"rows":(\d+)""" +
      """(?:,"cols":\[(.*?)\])?(?:,"bf":\[(.*?)\])?\}""").r
  private val BloomRe =
    """\{"c":"((?:[^"\\]|\\.)*)","b":"([A-Za-z0-9+/=]*)"\}""".r

  private def bloomsJson(bfs: Seq[(String, String)]): String =
    if (bfs.isEmpty) ""
    else bfs.map { case (c, b) => s"""{"c":"${esc(c)}","b":"$b"}""" }
      .mkString(""","bf":[""", ",", "]")

  private def parseBlooms(payload: String): Seq[(String, String)] =
    if (payload == null || payload.isEmpty) Nil
    else BloomRe.findAllMatchIn(payload)
      .map(m => (unesc(m.group(1)), m.group(2))).toIndexedSeq
  private val ColRe =
    ("""\{"c":"((?:[^"\\]|\\.)*)","t":"([a-z]+)"""" +
      """(?:,"lo":"((?:[^"\\]|\\.)*)","hi":"((?:[^"\\]|\\.)*)")?\}""").r

  private def parseCols(payload: String): Seq[ColStat] =
    if (payload == null || payload.isEmpty) Nil
    else ColRe.findAllMatchIn(payload).map { m =>
      ColStat(unesc(m.group(1)), m.group(2),
        Option(m.group(3)).map(unesc), Option(m.group(4)).map(unesc))
    }.toIndexedSeq

  private def manifestLines(stats: Seq[FileStat]): String =
    stats.map(f =>
      s"""{"file":"${f.file}","z_min":${f.zMin},"z_max":${f.zMax},""" +
        s""""rows":${f.rows}${colsJson(f.cols)}${bloomsJson(f.blooms)}}""")
      .mkString("\n")

  private def parseManifest(path: String, name: String): Seq[FileStat] =
    Files.readAllLines(logDir(path).resolve(name), StandardCharsets.UTF_8)
      .asScala.toIndexedSeq.collect {
        case FileLine(f, mn, mx, n, cols, bfs) =>
          FileStat(f, mn.toDouble, mx.toDouble, n.toLong, parseCols(cols),
            parseBlooms(bfs))
      }

  private def snapshotLines(refs: Seq[ManifestRef]): String =
    refs.map(refLine).mkString("\n")

  private def refLine(r: ManifestRef): String =
    s"""{"manifest":"${r.name}","z_min":${r.zMin},"z_max":${r.zMax},""" +
      s""""files":${r.files},"rows":${r.rows}${colsJson(r.cols)}""" +
      bloomsJson(r.blooms) + "}"

  private val DelLine =
    """\{"delete":"([^"]+)","key":"([^"]+)","rows":(\d+),"v":(\d+)\}""".r

  private def delLine(d: DeleteRef): String =
    s"""{"delete":"${d.file}","key":"${d.key}","rows":${d.rows},""" +
      s""""v":${d.v}}"""

  private val PredDelLine =
    ("""\{"pdelete":"((?:[^"\\]|\\.)*)","t":"([a-z]+)"""" +
      """(?:,"lo":"((?:[^"\\]|\\.)*)")?(?:,"hi":"((?:[^"\\]|\\.)*)")?""" +
      ""","v":(\d+)\}""").r

  private def predDelLine(d: PredDeleteRef): String =
    s"""{"pdelete":"${esc(d.col)}","t":"${d.t}"""" +
      d.lo.map(l => s""","lo":"${esc(l)}"""").getOrElse("") +
      d.hi.map(h => s""","hi":"${esc(h)}"""").getOrElse("") +
      s""","v":${d.v}}"""

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

  /** The predicate-delete tombstones of `version`'s snapshot. */
  def predDeleteRefs(path: String, version: Option[Int] = None)
      : Seq[PredDeleteRef] = {
    val v = version.orElse(latestVersion(path)).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot in $path"))
    rawSnapshotLines(path, v).collect {
      case PredDelLine(c, t, lo, hi, dv) =>
        PredDeleteRef(unesc(c), t, Option(lo).map(unesc),
          Option(hi).map(unesc), dv.toInt)
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
        case RefLine(m, mn, mx, nf, nr, cols, bfs) =>
          ManifestRef(m, mn.toDouble, mx.toDouble, nf.toInt, nr.toLong,
            parseCols(cols), parseBlooms(bfs))
      }
  }

  /** The manifest's envelope over its files: legacy double z bounds
    * plus the per-column merge. A column's envelope exists only when
    * EVERY live file carries a stat for it under one tag — claiming
    * bounds over a file with unknown values would make envelope-level
    * pruning unsound. Zero-row files carry sentinels and are excluded;
    * an all-empty manifest gets the never-selected sentinel envelope.
    */
  private def envelope(stats: Seq[FileStat], name: String): ManifestRef = {
    val finite = stats.filter(_.rows > 0)
    if (finite.isEmpty)
      ManifestRef(name, Double.MaxValue, -Double.MaxValue, stats.size, 0L)
    else ManifestRef(name, finite.map(_.zMin).min, finite.map(_.zMax).max,
      stats.size, stats.map(_.rows).sum, colEnvelope(finite),
      bloomEnvelope(finite))
  }

  /** Union of the files' key blooms (same commit ⇒ same sizing, so
    * mergeInPlace is well-defined); a column's envelope bloom exists
    * only when EVERY live file carries one — a file with unknown keys
    * would make envelope-level bloom pruning unsound.
    */
  private def bloomEnvelope(live: Seq[FileStat])
      : Seq[(String, String)] = {
    val enc = java.util.Base64.getEncoder
    live.head.blooms.map(_._1).flatMap { c =>
      val per = live.map(f => f.blooms.find(_._1 == c))
      if (per.exists(_.isEmpty)) None
      else try {
        val bfs = per.map(b => readBloom(b.get._2))
        val merged = bfs.reduce { (a, b) => a.mergeInPlace(b); a }
        val bos = new java.io.ByteArrayOutputStream()
        merged.writeTo(bos)
        Some(c -> enc.encodeToString(bos.toByteArray))
      } catch { case _: Exception => None } // incompatible: no envelope
    }
  }

  private def readBloom(b64: String)
      : org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(
        java.util.Base64.getDecoder.decode(b64)))

  private def colEnvelope(live: Seq[FileStat]): Seq[ColStat] = {
    live.head.cols.flatMap { lead =>
      val per = live.map(f => statFor(f.cols, lead.col))
      if (per.exists(s => s.isEmpty || s.get.t != lead.t)) None
      else {
        val bounded = per.flatMap(s =>
          for (l <- s.get.lo; h <- s.get.hi) yield (l, h))
        if (bounded.isEmpty) Some(ColStat(lead.col, lead.t, None, None))
        else Some(ColStat(lead.col, lead.t,
          Some(bounded.map(_._1).reduce((a, b) =>
            if (cmpCanon(lead.t, a, b) <= 0) a else b)),
          Some(bounded.map(_._2).reduce((a, b) =>
            if (cmpCanon(lead.t, a, b) >= 0) a else b))))
      }
    }
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
    * retrying commit must not interleave with them. Claims (`c-$v`)
    * are NOT swept — ownership is the claimant's to release.
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

  // ---- write path: layout, staging, per-file stat collection ---------

  /** Range-clustered layout on one column of ANY orderable type —
    * string/date clustering is what makes the typed envelopes
    * selective, exactly like [[Writers.writeWithZoneMapString]].
    */
  private def rangeLayout(df: DataFrame, zcol: String,
      nFiles: Int): DataFrame =
    df.repartitionByRange(nFiles, col(zcol)).sortWithinPartitions(col(zcol))

  /** Stage an already-laid-out `df`, move the staged parts to their
    * immutable `v<N>-p<i>.parquet` names, and collect their stats in
    * ONE distributed pass: row count, legacy double z bounds, and the
    * typed per-column min/max of every supported column (the collect
    * is batch-sized — one row per new file).
    *
    * Legacy z bounds derive from `zcol`'s typed stat when it is
    * numeric (integral/float/decimal — the double cast is monotone, so
    * range pruning on the cast stays sound); for string/date/timestamp
    * cluster columns the legacy channel records the never-pruning
    * full-range sentinel and [[readPrunedCol]] is the probe path.
    */
  private def stageLaidOut(laid: DataFrame, path: String, v: Int,
      zcol: String, bloomCols: Seq[String] = Nil,
      nonce: Option[String] = None): Seq[FileStat] = {
    val s = laid.sparkSession
    val stage = s"$path/_log/_stage"
    laid.write.mode("overwrite").parquet(stage)
    val stageDir = Paths.get(stage)
    val parts = listDirNames(stageDir).filter(_.startsWith("part-")).sorted
    // ownership re-check AFTER the (slow) distributed write, BEFORE the
    // moves that could replace a takeover winner's committed files
    nonce.foreach(n => requireClaimHeld(path, v, n))
    val moved = parts.zipWithIndex.map { case (nm, i) =>
      val dst = f"v$v-p$i%05d.parquet"
      Files.move(stageDir.resolve(nm), Paths.get(path, dst),
        StandardCopyOption.ATOMIC_MOVE)
      dst
    }
    collectFileStats(s, path, moved, zcol, bloomCols, laid.schema)
  }

  /** Stats dispatcher: per-file manifest stats from the parquet FOOTERS
    * the write just produced (O(files) driver metadata reads, no Spark
    * job, no second pass over the data) whenever every stat column's
    * footer statistic is exactly decodable and no bloom is requested;
    * otherwise the one-job scan [[fileColStats]]. At the 100 TB design
    * point this is the difference between an ingest that writes W bytes
    * and one that writes W then READS W back to learn what it wrote —
    * the Iceberg/Delta shape is stats-from-the-writer's-own-footers,
    * and the values here are bit-identical by construction (verified
    * column-by-column in SnapshotTableSpec against the scan path).
    */
  private def collectFileStats(s: SparkSession, path: String,
      names: Seq[String], zcol: String, bloomCols: Seq[String],
      schema: StructType): Seq[FileStat] =
    if (bloomCols.nonEmpty) fileColStats(s, path, names, zcol, bloomCols)
    else footerColStats(s, path, names, zcol, schema)
      .getOrElse(fileColStats(s, path, names, zcol, bloomCols))

  /** Footer tags whose min/max round-trip EXACTLY to the canonical
    * forms the scan path records: integral (INT32/64), decimal
    * (unscaled INT32/64/binary + declared scale), string (un-truncated
    * UTF-8 binary under parquet's unsigned order = [[cmpCanon]]'s), and
    * date (INT32 epoch day). Deliberately NOT doubles (parquet widens
    * ±0.0 bounds conservatively, so the footer value can differ from
    * the scanned min/max) and NOT timestamps (Spark's default INT96
    * carries no usable stats) — schemas holding either fall back to the
    * scan, trading speed for the exactness the manifests are gated on.
    */
  private def footerExactTag(t: String): Boolean =
    t == "l" || t == "dec" || t == "s" || t == "dt"

  /** Per-file stats decoded from parquet footers — None when ANY
    * column of ANY file lacks an exactly-decodable statistic (missing
    * chunk stats, truncated/oversized binary bounds, unexpected
    * physical type), in which case the caller runs the scan. False
    * "unusable" only costs the fallback job; a wrong decode is ruled
    * out by taking only bit-exact representations.
    */
  private def footerColStats(s: SparkSession, path: String,
      names: Seq[String], zcol: String,
      schema: StructType): Option[Seq[FileStat]] = {
    val fields = schema.fields.toIndexedSeq
      .flatMap(f => colTag(f.dataType).map(t => (f.name, f.dataType, t)))
    if (!fields.forall { case (_, _, t) => footerExactTag(t) }) return None
    val conf = s.sparkContext.hadoopConfiguration
    // plain-path files open through java.nio (LocalInputFile): the
    // Hadoop LocalFileSystem wrapper CRC-checksums every read, which
    // measured ~30 ms per footer — as slow as the scan job this path
    // exists to remove; scheme-carrying paths keep the Hadoop route
    def inputFile(p: String): org.apache.parquet.io.InputFile =
      if (p.contains("://") && !p.startsWith("file://"))
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(p), conf)
      else new org.apache.parquet.io.LocalInputFile(
        Paths.get(p.stripPrefix("file://")))
    def decode(t: String, dt: DataType, raw: Any): Option[String] =
      (t, raw) match {
        case ("l", n: java.lang.Integer) => Some(n.longValue.toString)
        case ("l", n: java.lang.Long) => Some(n.toString)
        case ("dt", n: java.lang.Integer) => Some(n.toString)
        case ("dec", n: java.lang.Integer) =>
          Some(java.math.BigDecimal.valueOf(n.longValue,
            dt.asInstanceOf[DecimalType].scale).toPlainString)
        case ("dec", n: java.lang.Long) =>
          Some(java.math.BigDecimal.valueOf(n.longValue,
            dt.asInstanceOf[DecimalType].scale).toPlainString)
        case ("dec", b: org.apache.parquet.io.api.Binary) =>
          Some(new java.math.BigDecimal(
            new java.math.BigInteger(b.getBytes),
            dt.asInstanceOf[DecimalType].scale).toPlainString)
        case ("s", b: org.apache.parquet.io.api.Binary) =>
          Some(new String(b.getBytes, StandardCharsets.UTF_8))
        case _ => None
      }
    try {
      // footers read CONCURRENTLY (driver metadata I/O, one small read
      // per file) — the Iceberg manifest-read shape; order of the
      // returned stats stays names.sorted regardless of completion order
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(8, math.max(1, names.size)))
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try Some(scala.concurrent.Await.result(
        scala.concurrent.Future.traverse(names.sorted.toList)(n =>
          scala.concurrent.Future(footerStatOne(path, n, zcol, fields,
            inputFile, decode))),
        scala.concurrent.duration.Duration.Inf))
      finally pool.shutdown()
    } catch { case FooterUnusable => None }
  }

  private def footerStatOne(path: String, n: String, zcol: String,
      fields: IndexedSeq[(String, DataType, String)],
      inputFile: String => org.apache.parquet.io.InputFile,
      decode: (String, DataType, Any) => Option[String]): FileStat = {
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      inputFile(s"$path/$n"))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toIndexedSeq
      val rows = blocks.map(_.getRowCount).sum
      if (rows == 0L)
        FileStat(n, Double.MaxValue, -Double.MaxValue, 0L, Nil)
      else {
        val cols = fields.map { case (cName, dt, t) =>
          var lo: Option[String] = None
          var hi: Option[String] = None
          blocks.foreach { b =>
            val chunk = b.getColumns.asScala
              .find(_.getPath.toDotString == cName)
              .getOrElse(throw FooterUnusable)
            val st = chunk.getStatistics
            if (st == null) throw FooterUnusable
            else if (st.hasNonNullValue) {
              val mn = decode(t, dt, st.genericGetMin)
                .getOrElse(throw FooterUnusable)
              val mx = decode(t, dt, st.genericGetMax)
                .getOrElse(throw FooterUnusable)
              lo = Some(lo.filter(cmpCanon(t, _, mn) <= 0)
                .getOrElse(mn))
              hi = Some(hi.filter(cmpCanon(t, _, mx) >= 0)
                .getOrElse(mx))
            } else if (!(st.isNumNullsSet &&
                st.getNumNulls == b.getRowCount))
              // can't tell "all null" from "stats dropped": scan
              throw FooterUnusable
          }
          ColStat(cName, t, lo, hi)
        }
        val (zmn, zmx) = legacyZ(cols, zcol)
        FileStat(n, zmn, zmx, rows, cols)
      }
    } finally reader.close()
  }

  private object FooterUnusable
    extends RuntimeException("footer stats unusable")
      with scala.util.control.NoStackTrace

  /** Test hook: BOTH stat paths over the same committed files —
    * SnapshotTableSpec pins the footer decode bit-identical to the
    * scan (manifest values are oracle-gated downstream, so "close" is
    * not good enough).
    */
  private[graft] def statPathsForTest(s: SparkSession, path: String,
      names: Seq[String], zcol: String, schema: StructType)
      : (Option[Seq[FileStat]], Seq[FileStat]) =
    (footerColStats(s, path, names, zcol, schema),
      fileColStats(s, path, names, zcol, Nil))

  /** Expected distinct keys per file for the manifest blooms — sizes
    * the sketch (Spark's 2-arg bloom_agg allocates items×8 bits, ~2%
    * FPP at the expectation). Overshooting only raises the false-
    * positive rate, never unsoundness: a bloom can only ADD candidate
    * files, and the probe's semi-join removes false positives.
    */
  private val BloomExpectedKeys = 20000L

  private def fileColStats(s: SparkSession, path: String,
      names: Seq[String], zcol: String,
      bloomCols: Seq[String] = Nil): Seq[FileStat] = {
    val src = s.read.parquet(names.map(n => s"$path/$n"): _*)
    val fields = src.schema.fields.toIndexedSeq
      .flatMap(f => colTag(f.dataType).map(t => (f.name, t)))
    bloomCols.foreach { c =>
      require(colTag(src.schema(c).dataType).exists(t =>
          t == "l" || t == "s"),
        s"manifest blooms support integral and string key columns; " +
          s"'$c' is " + src.schema(c).dataType.toString)
    }
    if (bloomCols.nonEmpty) graft.functions.BloomExprs.ensureRegistered(s)
    val nF = fields.size
    // both tags feed the sketch the SQL xxhash64 (seed 42) of the key —
    // integral keys normalized through a long cast, string keys hashed
    // on their UTF-8 bytes directly; the probe side ([[planKeys]])
    // hashes identically
    def keyHash(c: String) =
      if (colTag(src.schema(c).dataType).contains("l"))
        xxhash64(col(c).cast("long"))
      else xxhash64(col(c))
    val aggs = (count(lit(1)).as("_nr") +:
      fields.zipWithIndex.flatMap { case ((c, _), i) =>
        Seq(min(col(c)).as(s"_mn$i"), max(col(c)).as(s"_mx$i")) }) ++
      bloomCols.map(c => call_function("bloom_agg",
        keyHash(c), lit(BloomExpectedKeys))
        .as(s"_bf_$c"))
    val byFile = src
      .groupBy(substring_index(input_file_name(), "/", -1).as("_f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getString(0) -> r).toMap
    val enc = java.util.Base64.getEncoder
    names.sorted.map { n =>
      byFile.get(n) match {
        case None => // empty file: never-selected sentinels, no stats
          FileStat(n, Double.MaxValue, -Double.MaxValue, 0L, Nil)
        case Some(r) =>
          val rows = r.getLong(1)
          val cols = fields.zipWithIndex.map { case ((c, t), i) =>
            ColStat(c, t, Option(r.get(2 + 2 * i)).map(canonOf(t, _)),
              Option(r.get(3 + 2 * i)).map(canonOf(t, _)))
          }
          val blooms = bloomCols.zipWithIndex.flatMap { case (c, i) =>
            Option(r.get(2 + 2 * nF + i)).map(b =>
              c -> enc.encodeToString(b.asInstanceOf[Array[Byte]]))
          }
          val (zmn, zmx) = legacyZ(cols, zcol)
          FileStat(n, zmn, zmx, rows, cols, blooms)
      }
    }
  }

  /** Legacy double z channel off the typed stat: numeric tags project
    * to double (monotone cast, sound for range pruning); an all-null
    * numeric zcol yields the never-selected sentinel (no row can
    * satisfy a range); non-numeric cluster columns yield the
    * never-PRUNING full range — [[readPruned]] then keeps every file
    * and [[readPrunedCol]] is the selective path.
    */
  private def legacyZ(cols: Seq[ColStat], zcol: String): (Double, Double) =
    statFor(cols, zcol) match {
      case Some(ColStat(_, t, Some(lo), Some(hi)))
          if t == "l" || t == "d" || t == "dec" =>
        (lo.toDouble, hi.toDouble)
      case Some(ColStat(_, t, None, None))
          if t == "l" || t == "d" || t == "dec" =>
        (Double.MaxValue, -Double.MaxValue)
      case _ => (-Double.MaxValue, Double.MaxValue)
    }

  private def writeDataFiles(df: DataFrame, path: String, v: Int,
      zcol: String, nFiles: Int,
      nonce: Option[String] = None): Seq[FileStat] =
    stageLaidOut(rangeLayout(df, zcol, nFiles), path, v, zcol, Nil, nonce)

  // seed 42 = the SQL xxhash64's default, which the stat pass feeds
  // bloom_agg — both sides of the bloom probe hash identically
  private def xx64(v: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64(
      Seq(org.apache.spark.sql.catalyst.expressions.Literal(v)), 42L)
      .eval().asInstanceOf[Long]

  // the string twin: UTF8String bytes under the same seed — identical
  // to the SQL xxhash64 of a string column
  private def xx64Str(v: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64(
      Seq(org.apache.spark.sql.catalyst.expressions.Literal.create(
        v, StringType)), 42L)
      .eval().asInstanceOf[Long]

  // ---- commits ---------------------------------------------------------

  /** Shared append tail: sweep, merged schema, staged data + manifest,
    * snapshot inheriting every previous line by reference, pointer
    * swing. Cost tracks the batch — inherited metadata is copied as
    * lines, never re-derived. The caller holds the claim on `v`.
    */
  private def appendCore(path: String, v: Int, prev: Option[Int],
      prov: (Long, String), laid: DataFrame, zcol: String,
      bloomCols: Seq[String] = Nil, nonce: Option[String] = None): Unit = {
    sweepUncommitted(path, v)
    writeMergedSchema(path, v, prev, laid.schema)
    val stats = stageLaidOut(laid, path, v, zcol, bloomCols, nonce)
    nonce.foreach(n => requireClaimHeld(path, v, n))
    val mName = s"m-$v.json"
    writeAtomic(logDir(path).resolve(mName), manifestLines(stats))
    val prevLines = prev.map(p => rawSnapshotLines(path, p)).getOrElse(Nil)
    writeAtomic(logDir(path).resolve(s"v$v"),
      (prevLines :+ refLine(envelope(stats, mName))).mkString("\n"))
    swingPointer(path, v, prov._1, prov._2)
  }

  /** Pointer swing for non-streaming commits: carry the previous
    * pointer's (batchId, writerId) provenance forward.
    */
  private def swingPointerCarried(path: String, v: Int): Unit = {
    val (b, w) = carriedBatchId(readPointer(path))
    swingPointer(path, v, b, w)
  }

  /** APPEND commit: new data files + their manifest + a new snapshot
    * inheriting every previous manifest by reference + the pointer
    * swing. Returns the committed version. `zcol` may be ANY orderable
    * type (string/date clustering records typed envelopes; numeric
    * additionally feeds the legacy double channel). Concurrent appends
    * serialize through the claim CAS — a loser re-plans and lands at
    * the next slot, so two racing appends BOTH commit.
    */
  def commitAppend(df: DataFrame, path: String, zcol: String,
      nFiles: Int, bloomCols: Seq[String] = Nil): Int = {
    val (prevPtr, v, nonce) = claimNext(path)
    try {
      appendCore(path, v, prevPtr.map(_._1), carriedBatchId(prevPtr),
        rangeLayout(df, zcol, nFiles), zcol, bloomCols, Some(nonce))
      v
    } finally releaseClaim(path, v)
  }

  /** Z-ORDERED append: rows lay out on the Morton interleave of
    * (`c1`, `c2`) — each file covers a compact 2-D block, so the typed
    * per-column envelopes are selective on EITHER column and
    * [[readPrunedCol]] prunes both probe dimensions (the unified-format
    * twin of [[Writers.writeZOrderedWithZoneMap]]). The legacy double
    * channel tracks `c1`.
    */
  def commitAppendZOrdered(df: DataFrame, path: String, c1: String,
      c2: String, nFiles: Int): Int = {
    val (prevPtr, v, nonce) = claimNext(path)
    try {
      appendCore(path, v, prevPtr.map(_._1), carriedBatchId(prevPtr),
        Writers.zOrderLayout(df, c1, c2, nFiles), c1, Nil, Some(nonce))
      v
    } finally releaseClaim(path, v)
  }

  // ---- partition transforms: the Iceberg hidden-partitioning shape ----
  // A PartitionSpec recorded in table metadata (`_log/part.json`) maps
  // each row to a partition VALUE via a transform of one source column
  // — days(ts), months(ts), bucket(k, n) — and the partitioned append
  // guarantees every data file holds exactly ONE value, recorded as a
  // synthetic lo==hi stat `_pt` in its manifest line. That single
  // invariant buys the two partition payoffs at O(metadata): reads
  // prune on `_pt` through the ordinary typed-envelope descent
  // ([[readPrunedCol]] — no special partition path), and
  // [[dropPartition]] retires a whole partition by manifest surgery
  // alone — no data file opened, the retention drop a 100 TB
  // time-series table runs daily.

  /** transform ∈ days|months|bucket of `col`; `n` = bucket count. */
  case class PartitionSpec(transform: String, col: String, n: Int = 0)

  /** The synthetic per-file stat carrying the partition value. */
  val PartCol = "_pt"

  private def partSpecPath(path: String) = logDir(path).resolve("part.json")

  /** List a directory's entries with the stream CLOSED on every path —
    * `Files.list` leaks a directory fd until GC otherwise, and a
    * standing compactor/ingester on a long-lived driver accumulates
    * them.
    */
  private def listDirNames(dir: java.nio.file.Path): Seq[String] = {
    val st = Files.list(dir)
    try st.iterator().asScala.map(_.getFileName.toString).toIndexedSeq
    finally st.close()
  }

  /** Record the partition spec ATOMICALLY, first writer wins: the
    * tmp+move CAS (no REPLACE) is what serializes two concurrent FIRST
    * partitioned commits with different specs — both then VERIFY the
    * recorded spec ([[requireSpecIs]]) before any staged-part move, so
    * the loser aborts instead of committing files whose `_pt` values
    * were computed under a transform that never became the table's.
    */
  private[graft] def recordSpecIfAbsent(path: String, spec: PartitionSpec): Unit = {
    val p = partSpecPath(path)
    if (Files.exists(p)) return
    Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(s"part-${newNonce()}.tmp")
    Files.write(tmp, (s"""{"transform":"${spec.transform}","col":""" +
      s""""${esc(spec.col)}","n":${spec.n}}""")
      .getBytes(StandardCharsets.UTF_8))
    try Files.move(tmp, p)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp) // a racer recorded first: verify theirs
    }
  }

  /** Abort unless the RECORDED spec (immutable once written) matches
    * this commit's — the in-claim re-validation a lost spec race needs.
    */
  private[graft] def requireSpecIs(path: String, spec: PartitionSpec): Unit = {
    val recorded = readPartitionSpec(path)
    if (!recorded.contains(spec))
      throw new java.util.ConcurrentModificationException(
        s"partition spec race on $path: this commit carries $spec but " +
          s"the table recorded ${recorded.orNull} — re-plan under the " +
          "recorded spec")
  }

  def readPartitionSpec(path: String): Option[PartitionSpec] = {
    val p = partSpecPath(path)
    if (!Files.exists(p)) None
    else {
      val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      val Re =
        """\{"transform":"(\w+)","col":"((?:[^"\\]|\\.)*)","n":(\d+)\}""".r
      s.trim match {
        case Re(t, c, n) => Some(PartitionSpec(t, unesc(c), n.toInt))
        case _ => throw new IllegalStateException(
          s"unparseable partition spec in $p: $s")
      }
    }
  }

  /** The transform's value expression — a LONG for every transform so
    * `_pt` stats always carry tag "l": days/months count from epoch,
    * bucket is the non-negative xxhash64 residue (seed 42, the same
    * hash family as the manifest blooms).
    */
  private def partValueExpr(spec: PartitionSpec)
      : org.apache.spark.sql.Column = spec.transform match {
    case "days" =>
      datediff(col(spec.col).cast("date"),
        to_date(lit("1970-01-01"))).cast("long")
    case "months" =>
      (year(col(spec.col)).cast("long") * 12 +
        month(col(spec.col)).cast("long") - 1)
    case "bucket" =>
      require(spec.n > 0, "bucket transform needs n > 0")
      pmod(xxhash64(col(spec.col)), lit(spec.n.toLong))
    case other => throw new IllegalArgumentException(
      s"unknown partition transform '$other' (days|months|bucket)")
  }

  /** PARTITIONED append: every data file holds exactly ONE partition
    * value (the stage write is partitionBy on the transform value, so
    * the single-VALUE-per-FILE invariant holds by construction), each
    * file's manifest line carrying `_pt` = that value as an exact
    * lo==hi stat. `filesPerValue` SALTS the shuffle WITHIN each value
    * (the [[Writers.writePartitioned]] pattern): without it a daily
    * ingest into days(ts) — where the whole batch IS one partition
    * value — funnels through a single task and lands as one giant
    * unsplittable file; with it up to `filesPerValue` tasks write one
    * value concurrently, and the manifest invariant is untouched
    * because it is per-FILE, not per-value. The FIRST partitioned
    * commit records the spec in table metadata ATOMICALLY
    * ([[recordSpecIfAbsent]] — tmp+move CAS, first writer wins) and
    * EVERY commit re-verifies the recorded spec inside its held claim
    * before any staged file moves: two concurrent first commits with
    * different specs cannot both land (the loser's `_pt` values were
    * computed under a transform that never became the table's, and the
    * per-file single-valued-`_pt` require cannot detect that). Null
    * transform values are rejected: a null has no partition and would
    * silently escape every drop/prune. Returns the committed version.
    */
  def commitAppendPartitioned(df: DataFrame, path: String,
      spec: PartitionSpec, filesPerValue: Int = 1): Int = {
    require(filesPerValue >= 1, "filesPerValue must be >= 1")
    readPartitionSpec(path).foreach(existing => require(existing == spec,
      s"partition spec mismatch: table has $existing, commit carries " +
        s"$spec - spec evolution is not supported"))
    val (prevPtr, v, nonce) = claimNext(path)
    try {
      sweepUncommitted(path, v)
      writeMergedSchema(path, v, prevPtr.map(_._1), df.schema)
      // record-or-verify INSIDE the claim: once the CAS settles, the
      // spec is immutable, so one verification here covers the commit
      recordSpecIfAbsent(path, spec)
      requireSpecIs(path, spec)
      val s = df.sparkSession
      val stage = s"$path/_log/_stage"
      // salt within the partition value so a hot value (a daily ingest's
      // single day) fans out across filesPerValue tasks instead of one;
      // the salted shuffle pins an EXPLICIT partition count — the
      // no-number repartition is AQE-coalescible, and coalescing the
      // salt combos back into one task would undo exactly the fan-out
      // the salt exists for
      val salted = df.withColumn(PartCol, partValueExpr(spec))
      val laid =
        if (filesPerValue == 1) salted.repartition(col(PartCol))
        else {
          val shuffleN = math.max(filesPerValue,
            s.conf.get("spark.sql.shuffle.partitions").toInt)
          salted.repartition(shuffleN, col(PartCol),
            pmod(hash(df.columns.map(col).toIndexedSeq: _*),
              lit(filesPerValue)))
        }
      laid.write.mode("overwrite").partitionBy(PartCol).parquet(stage)
      val stageDir = Paths.get(stage)
      val valueDirs = listDirNames(stageDir)
        .filter(n => n.startsWith(s"$PartCol=") &&
          Files.isDirectory(stageDir.resolve(n))).sorted
      require(!valueDirs.exists(_.endsWith("__HIVE_DEFAULT_PARTITION__")),
        s"commitAppendPartitioned: null ${spec.transform}(${spec.col}) " +
          "values - a null has no partition; filter or backfill first")
      requireClaimHeld(path, v, nonce)
      var i = -1
      val movedWithVal = valueDirs.flatMap { vn =>
        val vd = stageDir.resolve(vn)
        val pval = vn.stripPrefix(s"$PartCol=").toLong
        listDirNames(vd).filter(_.startsWith("part-")).sorted.map { nm =>
          i += 1
          val dst = f"v$v-p$i%05d.parquet"
          Files.move(vd.resolve(nm), Paths.get(path, dst),
            StandardCopyOption.ATOMIC_MOVE)
          (dst, pval)
        }
      }
      val valOf = movedWithVal.toMap
      val stats = collectFileStats(s, path, movedWithVal.map(_._1),
          spec.col, Nil, df.schema)
        .map(f => f.copy(cols = f.cols :+ ColStat(PartCol, "l",
          Some(valOf(f.file).toString), Some(valOf(f.file).toString))))
      requireClaimHeld(path, v, nonce)
      val mName = s"m-$v.json"
      writeAtomic(logDir(path).resolve(mName), manifestLines(stats))
      val prevLines = prevPtr.map(p => rawSnapshotLines(path, p._1))
        .getOrElse(Nil)
      writeAtomic(logDir(path).resolve(s"v$v"),
        (prevLines :+ refLine(envelope(stats, mName))).mkString("\n"))
      val (cb, cw) = carriedBatchId(prevPtr)
      swingPointer(path, v, cb, cw)
      v
    } finally releaseClaim(path, v)
  }

  /** DROP PARTITION — the O(METADATA) retention commit: every data
    * file whose recorded `_pt` equals `value` leaves the new snapshot
    * by manifest surgery alone (envelope-excluded manifests carry by
    * reference and never parse; touched manifests rewrite minus their
    * dead rows, KEEPING the original version in the rewrite name so
    * their surviving rows stay at their old sequence number), and NO
    * data file is opened — zero Spark jobs. Prior versions still read
    * the dropped partition bit for bit until [[vacuum]]. Requires a
    * partitioned table (every live file carries a single-valued `_pt`
    * stat — violated only by mixing unpartitioned commits in, which
    * is rejected here) and a tombstone-free snapshot, like every COW
    * surgery. Returns (rowsDropped, filesDropped, newVersion; prev
    * when the partition is empty).
    */
  def dropPartition(path: String, value: Long): (Long, Int, Int) = {
    val prev = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot in $path"))
    require(readPartitionSpec(path).nonEmpty,
      s"dropPartition: $path has no partition spec")
    require(deleteRefs(path, Some(prev)).isEmpty &&
        predDeleteRefs(path, Some(prev)).isEmpty,
      "dropPartition: snapshot carries merge-on-read tombstones - run " +
        "compactCommit to materialize them first")
    val vs = value.toString
    val (v, nonce) = claimCow(path, prev, "dropPartition")
    try {
      val refs = snapshot(path, Some(prev))
      // envelope test: a manifest whose _pt envelope excludes the value
      // carries by reference, unparsed — the pyramid payoff
      def mayHold(cols: Seq[ColStat]): Boolean =
        statFor(cols, PartCol) match {
          case Some(ColStat(_, "l", Some(lo), Some(hi))) =>
            lo.toLong <= value && value <= hi.toLong
          case Some(ColStat(_, "l", None, None)) => false
          case _ => true // no/unknown stat: must parse and check files
        }
      sweepUncommitted(path, v)
      var rows = 0L
      var filesDropped = 0
      var ri = 0
      val carried = refs.flatMap { ref =>
        if (!mayHold(ref.cols)) Some(ref)
        else {
          val fs = parseManifest(path, ref.name)
          fs.filter(_.rows > 0).foreach(f => require(
            statFor(f.cols, PartCol).exists(c => c.t == "l" &&
              c.lo.nonEmpty && c.lo == c.hi),
            s"dropPartition: ${f.file} carries no single-valued " +
              s"$PartCol stat - the table mixes unpartitioned commits"))
          val (dead, kept) = fs.partition(f =>
            statFor(f.cols, PartCol).exists(c => c.lo.contains(vs)))
          rows += dead.map(_.rows).sum
          filesDropped += dead.size
          if (dead.isEmpty) Some(ref)
          else if (kept.isEmpty) None
          else {
            ri += 1
            val rn = s"m-${manifestVersion(ref.name)}-r$v-$ri.json"
            writeAtomic(logDir(path).resolve(rn), manifestLines(kept))
            Some(envelope(kept, rn))
          }
        }
      }
      if (filesDropped == 0) return (0L, 0, prev)
      requireClaimHeld(path, v, nonce)
      readSchema(path, prev).foreach(sc =>
        writeAtomic(schemaPath(path, v), sc.json))
      writeAtomic(logDir(path).resolve(s"v$v"), snapshotLines(carried))
      swingPointerCarried(path, v)
      (rows, filesDropped, v)
    } finally releaseClaim(path, v)
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
    * collapsed into the pointer); the stream must be the table's only
    * streaming writer for the same reason. Non-streaming commits
    * (compaction, COW/MOR rewrites) CARRY the id forward (see
    * [[readPointer]]), so a background OPTIMIZE landing between a
    * stream crash and its restart cannot erase the provenance the
    * replay check needs. `writerId` scopes the provenance per STREAM
    * (Delta's appId): pass the query's checkpoint identity so a
    * brand-new stream (fresh checkpoint, batch ids restarting at 0)
    * attached to a table whose carried id equals its first batch id
    * commits instead of silently short-circuiting — the short-circuit
    * fires only when BOTH the id and the writer match. The legacy ""
    * writer keeps pre-writer-id pointers replay-safe for their own
    * (single, anonymous) stream. Returns false on the short-circuit.
    */
  def commitAppendOnce(df: DataFrame, path: String, zcol: String,
      nFiles: Int, batchId: Long,
      bloomCols: Seq[String] = Nil, writerId: String = ""): Boolean = {
    require(batchId >= 0, "batchId must be >= 0 (-1 marks non-batch commits)")
    val (prevPtr, v, nonce) = claimNext(path)
    try {
      if (prevPtr.exists(p => p._2 == batchId && p._3 == writerId))
        return false
      appendCore(path, v, prevPtr.map(_._1), (batchId, writerId),
        rangeLayout(df, zcol, nFiles), zcol, bloomCols, Some(nonce))
      true
    } finally releaseClaim(path, v)
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
    val (v, nonce) = claimCow(path, prev, "compactCommit")
    try {
      val refs = snapshot(path, Some(prev))
      val stats = refs.flatMap(r => parseManifest(path, r.name))
      val filesBefore = stats.size
      val rows = stats.map(_.rows).sum
      val nFiles = math.max(1L,
        (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
      sweepUncommitted(path, v)
      val df = read(spark, path, Some(prev))
      writeMergedSchema(path, v, Some(prev), df.schema)
      val newStats = stageLaidOut(rangeLayout(df, zcol, nFiles), path, v,
        zcol, Nil, Some(nonce))
      requireClaimHeld(path, v, nonce)
      val mName = s"m-$v.json"
      writeAtomic(logDir(path).resolve(mName), manifestLines(newStats))
      writeAtomic(logDir(path).resolve(s"v$v"),
        snapshotLines(Seq(envelope(newStats, mName))))
      swingPointerCarried(path, v)
      (filesBefore, newStats.size, v)
    } finally releaseClaim(path, v)
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
    val pdels = predDeleteRefs(path, Some(prev))
    val byManifest = snapshot(path, Some(prev))
      .map(r => r -> parseManifest(path, r.name))
    val isSmall = (f: FileStat) => f.rows < smallThresholdRows
    val small = byManifest.flatMap { case (r, fs) =>
      fs.filter(isSmall).map(f => (manifestVersion(r.name), f)) }
    val carriedCount = byManifest.map(_._2.count(f => !isSmall(f))).sum
    if (small.size <= 1) return (0, carriedCount + small.size, prev)
    val (v, nonce) = claimCow(path, prev, "compactSmallFiles")
    try {
      sweepUncommitted(path, v)
      val df = readApplying(spark, path, prev,
        small.map { case (mv, f) => (mv, s"$path/${f.file}") })
      val smallRows = small.map(_._2.rows).sum
      val nFiles = math.max(1L,
        (smallRows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
      readSchema(path, prev).foreach(sc =>
        writeAtomic(schemaPath(path, v), sc.json))
      val newStats = stageLaidOut(rangeLayout(df, zcol, nFiles), path, v,
        zcol, Nil, Some(nonce))
      requireClaimHeld(path, v, nonce)
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
        (carried.map(refLine) ++ dels.map(delLine) ++
          pdels.map(predDelLine) :+
          refLine(envelope(newStats, mName))).mkString("\n"))
      swingPointerCarried(path, v)
      (small.size, carriedCount, v)
    } finally releaseClaim(path, v)
  }

  // ---- keyed copy-on-write: pyramid-planned delete / merge -----------

  /** Keys a rewrite collects to the driver for exact per-file pruning
    * (values beyond the cap fall back to min/max-envelope pruning),
    * and the broadcast ceiling past which the touch-detection joins
    * run as shuffle joins (the [[graft.ops.Clusters]] guard pattern —
    * a table-sized tombstone batch must not be forced through a
    * driver broadcast).
    */
  private val CollectKeyCapDefault = 100000
  private val BroadcastKeyCapDefault = 2000000L

  private case class KeyPlan(k: DataFrame, nKeys: Long, big: Boolean,
      tag: Option[String], vals: Option[Array[String]],
      bounds: Option[(String, String)],
      hashes: Option[Array[Long]] = None)

  private def planKeys(keys: DataFrame, keyCol: String,
      collectCap: Int, bcastCap: Long): KeyPlan = {
    val k = keys.select(col(keyCol)).distinct()
    val tag = colTag(k.schema(keyCol).dataType)
    val head = k.limit(collectCap + 1).collect()
    if (head.length <= collectCap) {
      val vals = tag.map { t =>
        val a = head.iterator.map(_.get(0)).filter(_ != null)
          .map(v => canonOf(t, v)).toArray
        scala.util.Sorting.stableSort(a,
          (x: String, y: String) => cmpCanon(t, x, y) < 0)
        a
      }
      // integral and string keys pre-hash for the manifest-bloom probe
      // — the same xxhash64 the stat pass fed bloom_agg
      val hashes = tag match {
        case Some("l") => vals.map(_.map(v => xx64(v.toLong)))
        case Some("s") => vals.map(_.map(xx64Str))
        case _ => None
      }
      KeyPlan(k, head.length.toLong, big = false, tag, vals,
        vals.filter(_.nonEmpty).map(v => (v.head, v.last)), hashes)
    } else {
      val r = k.agg(count(lit(1)), min(col(keyCol)), max(col(keyCol))).head()
      val bounds = tag.flatMap(t =>
        (Option(r.get(1)), Option(r.get(2))) match {
          case (Some(lo), Some(hi)) => Some((canonOf(t, lo), canonOf(t, hi)))
          case _ => None
        })
      KeyPlan(k, r.getLong(0), big = r.getLong(0) > bcastCap, tag,
        None, bounds)
    }
  }

  /** May a file/manifest with these recorded bounds hold one of the
    * planned keys? Missing stats or a tag mismatch mean "unknown:
    * keep"; an all-null column can never equality-match a key; with
    * collected values the test is exact per file (binary search for a
    * key inside [lo, hi]), else the key set's own envelope intersects.
    */
  private def boundsHitKeys(cs: Option[ColStat], plan: KeyPlan): Boolean =
    cs match {
      case None => true
      case Some(s) if !plan.tag.contains(s.t) => true
      case Some(ColStat(_, t, Some(lo), Some(hi))) =>
        plan.vals match {
          case Some(vs) => anyKeyIn(vs, t, lo, hi)
          case None => plan.bounds.exists { case (kl, kh) =>
            cmpCanon(t, kl, hi) <= 0 && cmpCanon(t, kh, lo) >= 0 }
        }
      case Some(ColStat(_, _, None, None)) => false // no non-null values
      case Some(_) => true // half-written bounds: unknown, keep
    }

  /** May a file/manifest with this key BLOOM hold one of the planned
    * keys? True (keep) when no bloom exists, the keys were not
    * collected, or any key might be present — false only when the
    * bloom rules out EVERY planned key, which is what prunes the
    * scattered-key takedown min/max bounds cannot (a handful of ids
    * spread across a table intersect every file's key RANGE but almost
    * no file's key SET).
    */
  private def bloomHitsKeys(blooms: Seq[(String, String)],
      keyCol: String, plan: KeyPlan): Boolean =
    (blooms.find(_._1 == keyCol), plan.hashes) match {
      case (Some((_, b64)), Some(hs)) if hs.nonEmpty =>
        try { val bf = readBloom(b64); hs.exists(bf.mightContainLong) }
        catch { case _: Exception => true } // unreadable: keep
      case _ => true
    }

  private def anyKeyIn(sorted: Array[String], t: String, lo: String,
      hi: String): Boolean = {
    var a = 0
    var b = sorted.length
    while (a < b) {
      val m = (a + b) >>> 1
      if (cmpCanon(t, sorted(m), lo) < 0) a = m + 1 else b = m
    }
    a < sorted.length && cmpCanon(t, sorted(a), hi) <= 0
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
    val (deleted, _, _, v) =
      commitDeletePlanned(spark, path, keyCol, keys, zcol, nFiles)
    (deleted, v)
  }

  /** [[commitDelete]] with its PLANNING made visible — and made
    * O(candidate files): touched-file detection descends the metadata
    * pyramid on `keyCol`'s typed bounds (manifest envelopes first,
    * then per-file stats — only surviving manifests even parse) and
    * reads ONLY the candidate files for the semi-join probe, instead
    * of scanning the table to learn what a 10-key delete touches.
    * `collectKeyCap` bounds the exact-value plan (beyond it, the key
    * set's min/max envelope prunes); `broadcastKeyCap` bounds the
    * probe-side broadcast (beyond it the joins fall back to shuffle —
    * same answer, no driver OOM). Returns (rowsDeleted, filesPlanned,
    * filesTotal, newVersion).
    */
  def commitDeletePlanned(spark: SparkSession, path: String,
      keyCol: String, keys: DataFrame, zcol: String, nFiles: Int = 0,
      collectKeyCap: Int = CollectKeyCapDefault,
      broadcastKeyCap: Long = BroadcastKeyCapDefault)
      : (Long, Long, Long, Int) = {
    val prev = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot in $path"))
    require(deleteRefs(path, Some(prev)).isEmpty &&
        predDeleteRefs(path, Some(prev)).isEmpty,
      "snapshot carries merge-on-read tombstones - run compactCommit " +
        "to materialize them before a copy-on-write rewrite")
    val (v, nonce) = claimCow(path, prev, "commitDelete")
    try {
      val plan = planKeys(keys, keyCol, collectKeyCap, broadcastKeyCap)
      val refs = snapshot(path, Some(prev))
      val total = refs.map(_.files.toLong).sum
      // pyramid descent: envelope-pruned manifests are never parsed
      val parsedCand = refs
        .filter(r => boundsHitKeys(statFor(r.cols, keyCol), plan) &&
          bloomHitsKeys(r.blooms, keyCol, plan))
        .map(r => r -> parseManifest(path, r.name))
      val candFiles = parsedCand.flatMap(_._2).filter(f =>
        f.rows > 0 && boundsHitKeys(statFor(f.cols, keyCol), plan) &&
          bloomHitsKeys(f.blooms, keyCol, plan))
      val planned = candFiles.size.toLong
      if (planned == 0) return (0L, 0L, total, prev)
      val candDf = readFiles(spark, path, prev,
        candFiles.map(f => s"$path/${f.file}").sorted)
      val kj = if (plan.big) plan.k else broadcast(plan.k)
      val touched = candDf.withColumn("_f", input_file_name())
        .join(kj, Seq(keyCol), "left_semi")
        .select(col("_f")).distinct().collect()
        .map(_.getString(0).split('/').last).toSet
      if (touched.isEmpty) return (0L, planned, total, prev)
      val touchedPaths = touched.toIndexedSeq.sorted.map(n => s"$path/$n")
      val touchedDf = readFiles(spark, path, prev, touchedPaths)
      val rowsTouched = touchedDf.count()
      val survivors = touchedDf.join(kj, Seq(keyCol), "left_anti")
      val rowsDeleted = rowsTouched - survivors.count()
      sweepUncommitted(path, v)
      writeMergedSchema(path, v, Some(prev), survivors.schema)
      val survStats = writeDataFiles(survivors, path, v, zcol,
        if (nFiles > 0) nFiles else touched.size, Some(nonce))
      requireClaimHeld(path, v, nonce)
      val mName = s"m-$v.json"
      writeAtomic(logDir(path).resolve(mName), manifestLines(survStats))
      val parsedOf = parsedCand.toMap
      var ri = 0
      val carried = refs.flatMap { ref =>
        parsedOf.get(ref) match {
          case None => Some(ref) // envelope-pruned: carried, never parsed
          case Some(fs) =>
            val kept = fs.filterNot(f => touched(f.file))
            if (kept.size == fs.size) Some(ref)
            else if (kept.isEmpty) None // fully consumed
            else {
              ri += 1
              val rn = s"m-$v-r$ri.json"
              writeAtomic(logDir(path).resolve(rn), manifestLines(kept))
              Some(envelope(kept, rn))
            }
        }
      }
      writeAtomic(logDir(path).resolve(s"v$v"),
        snapshotLines(carried :+ envelope(survStats, mName)))
      swingPointerCarried(path, v)
      (rowsDeleted, planned, total, v)
    } finally releaseClaim(path, v)
  }

  /** Fail-fast guard for merge-on-read commits: a tombstone on a
    * mistyped or phantom key column would COMMIT fine and then poison
    * every subsequent read of the table (the read-time anti-join dies
    * at plan time) with no clean repair path — so validate against the
    * committed schema BEFORE anything lands, the way the COW paths
    * fail naturally at their own plan time.
    */
  private def requireKeyCompatible(path: String, prev: Int,
      keyCol: String, keys: DataFrame, op: String): Unit = {
    require(keys.schema.fieldNames.contains(keyCol),
      s"$op: keys relation has no column '$keyCol' " +
        s"(columns: ${keys.schema.fieldNames.mkString(",")})")
    readSchema(path, prev).foreach { sc =>
      require(sc.fieldNames.contains(keyCol),
        s"$op: table $path has no committed column '$keyCol' " +
          s"(columns: ${sc.fieldNames.mkString(",")}) — a committed " +
          "tombstone on a phantom key column poisons every later read")
      val t = sc(keyCol).dataType
      val kt = keys.schema(keyCol).dataType
      require(t == kt ||
        (t.isInstanceOf[NumericType] && kt.isInstanceOf[NumericType]),
        s"$op: key column '$keyCol' type mismatch — table has $t, " +
          s"keys carry $kt (not join-compatible)")
    }
  }

  /** Row cap per staged tombstone FILE: a takedown-sized key set stays
    * one file, a CDC-batch-sized set splits so no single tombstone file
    * outgrows what one task (and one read-side join build) should hold.
    * Volatile test hook; production default 2M keys/file.
    */
  @volatile private[graft] var TombstoneRowsPerFile: Long = 2000000L

  /** Tombstone key count past which [[readApplying]] stops hinting
    * `broadcast()` for the anti-join and lets the planner run it as a
    * shuffle join — the [[planKeys]] cap-and-fallback pattern applied
    * to the READ side: an unguarded broadcast of a table-sized CDC
    * tombstone batch is a driver OOM, not a plan. Volatile test hook.
    */
  @volatile private[graft] var ReadBroadcastKeyCap: Long =
    BroadcastKeyCapDefault

  /** Stage the distinct `keyCol` values of `keys` as immutable
    * tombstone files `v<N>-d<i>.parquet`, at most
    * [[TombstoneRowsPerFile]] keys per file (one file for takedowns;
    * a CDC-sized batch splits — single-task staging of an unbounded
    * key set is the same scale bug as an unguarded broadcast).
    * Returns one (fileName, keys) pair PER staged file; empty for a
    * zero-key set.
    */
  private def stageTombstone(spark: SparkSession, path: String, v: Int,
      keys: DataFrame, keyCol: String): Seq[(String, Long)] = {
    val stage = s"$path/_log/_stage"
    val k = keys.select(col(keyCol)).distinct()
    val n = k.count()
    if (n == 0) return Nil
    val parts =
      ((n + TombstoneRowsPerFile - 1) / TombstoneRowsPerFile).toInt
    (if (parts == 1) k.coalesce(1) else k.repartition(parts))
      .write.mode("overwrite").parquet(stage)
    val stageDir = Paths.get(stage)
    val staged = listDirNames(stageDir).filter(_.startsWith("part-")).sorted
    val moved = staged.zipWithIndex.map { case (nm, i) =>
      val dst = f"v$v-d$i%05d.parquet"
      Files.move(stageDir.resolve(nm), Paths.get(path, dst),
        StandardCopyOption.ATOMIC_MOVE)
      dst
    }
    // per-file key counts from the staged files' own FOOTERS (row
    // counts are schema-independent and exact — no decode caveats, so
    // no scan fallback needed); drop empty round-robin leftovers
    moved.flatMap { m =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        new org.apache.parquet.io.LocalInputFile(Paths.get(path, m)))
      val rows =
        try reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
        finally reader.close()
      if (rows > 0) Some((m, rows))
      else { Files.deleteIfExists(Paths.get(path, m)); None }
    }
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
    * Returns (distinct tombstone keys, new version; the previous
    * version when `keys` is empty).
    */
  def commitDeleteMor(spark: SparkSession, path: String, keyCol: String,
      keys: DataFrame): (Long, Int) = {
    val prev = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot in $path"))
    requireKeyCompatible(path, prev, keyCol, keys, "commitDeleteMor")
    val (v, nonce) = claimCow(path, prev, "commitDeleteMor")
    try {
      sweepUncommitted(path, v)
      val staged = stageTombstone(spark, path, v, keys, keyCol)
      if (staged.isEmpty) return (0L, prev)
      val n = staged.map(_._2).sum
      requireClaimHeld(path, v, nonce)
      // the schema is unchanged by a tombstone; carry it so readFiles
      // keeps resolving this version without inference
      readSchema(path, prev).foreach(sc =>
        writeAtomic(schemaPath(path, v), sc.json))
      writeAtomic(logDir(path).resolve(s"v$v"),
        (rawSnapshotLines(path, prev) ++ staged.map { case (dst, nk) =>
          delLine(DeleteRef(dst, keyCol, nk, v)) }).mkString("\n"))
      swingPointerCarried(path, v)
      (n, v)
    } finally releaseClaim(path, v)
  }

  /** PREDICATE MERGE-ON-READ DELETE — the O(METADATA) retention drop:
    * rows whose stat-carrying column `colName` falls inside the closed
    * range [lo, hi] (either side open with None) vanish from the new
    * snapshot as ONE serialized-comparison tombstone line — NO data
    * file is touched, NO key file is even written, so the commit costs
    * a snapshot write regardless of table size or match count (where
    * an equality tombstone is a takedown and a COW delete a rewrite,
    * this is "drop everything before the cutoff" landing instantly on
    * a 100 TB table). Reads apply it as a residual filter with the
    * same sequence scoping as equality tombstones — it deletes only
    * from manifests committed BEFORE it, so later re-inserts into the
    * range survive; NULL values never match and always survive.
    * [[compactCommit]] materializes and drops it; COW rewrites refuse
    * while one is live, exactly like equality tombstones. Bounds
    * accept the column's natural external forms ([[canonOf]]).
    * Returns the new version.
    */
  def commitDeleteMorPred(spark: SparkSession, path: String,
      colName: String, lo: Option[Any], hi: Option[Any]): Int = {
    require(lo.nonEmpty || hi.nonEmpty,
      "commitDeleteMorPred: at least one bound is required (an " +
        "unbounded predicate deletes the whole table - use a rewrite)")
    val prev = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot in $path"))
    val sc = readSchema(path, prev).getOrElse(
      throw new IllegalArgumentException(
        "commitDeleteMorPred: table has no committed schema - a " +
          "predicate tombstone needs the column's committed type"))
    require(sc.fieldNames.contains(colName),
      s"commitDeleteMorPred: table $path has no committed column " +
        s"'$colName' (columns: ${sc.fieldNames.mkString(",")})")
    val t = colTag(sc(colName).dataType).getOrElse(
      throw new IllegalArgumentException(
        s"commitDeleteMorPred: column '$colName' has unsupported type " +
          s"${sc(colName).dataType} - predicate tombstones need a " +
          "stat-carrying (orderable) column"))
    val ref = PredDeleteRef(colName, t, lo.map(canonOf(t, _)),
      hi.map(canonOf(t, _)), prev + 1)
    val (v, nonce) = claimCow(path, prev, "commitDeleteMorPred")
    try {
      sweepUncommitted(path, v)
      requireClaimHeld(path, v, nonce)
      writeAtomic(schemaPath(path, v), sc.json)
      writeAtomic(logDir(path).resolve(s"v$v"),
        (rawSnapshotLines(path, prev) :+ predDelLine(ref)).mkString("\n"))
      swingPointerCarried(path, v)
      v
    } finally releaseClaim(path, v)
  }

  /** MERGE-ON-READ MERGE (upsert) commit — the O(batch) upsert a
    * CDC-heavy feed needs where [[commitMerge]]'s COW rewrite per
    * batch is unpayable: the change keys land as an equality-delete
    * tombstone AND the change rows append as ordinary data files, BOTH
    * at version v. Sequence scoping does the rest — the tombstone
    * applies only to manifests committed BEFORE v, so old rows with a
    * matched key vanish at read time while the batch's own rows (at v)
    * are exempt: upsert semantics from one tombstone line and one
    * manifest line, no existing file touched (prior manifests carry
    * verbatim). [[compactCommit]] (or [[compactSmallFiles]])
    * materializes later. `changes` must carry ONE row per key — with a
    * same-commit tombstone there is no "insert-only duplicate" carve-
    * out to reason about, so the contract is stricter than COW merge
    * and checked in O(changes). Returns (changeKeys, newVersion; the
    * previous version when `changes` is empty).
    */
  def commitMergeMor(spark: SparkSession, path: String,
      changes: DataFrame, key: String, zcol: String,
      nFiles: Int): (Long, Int) = {
    val prev = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot in $path"))
    requireKeyCompatible(path, prev, key, changes, "commitMergeMor")
    val dup = changes.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).select(col(key)).limit(5)
      .collect().map(_.get(0))
    require(dup.isEmpty,
      s"commitMergeMor: changes carry multiple rows per key ($key): " +
        dup.mkString(",") + " — pre-aggregate to one row per key")
    val (v, nonce) = claimCow(path, prev, "commitMergeMor")
    try {
      sweepUncommitted(path, v)
      val staged = stageTombstone(spark, path, v, changes, key)
      if (staged.isEmpty) return (0L, prev)
      val n = staged.map(_._2).sum
      writeMergedSchema(path, v, Some(prev), changes.schema)
      val stats = writeDataFiles(changes, path, v, zcol, nFiles,
        Some(nonce))
      requireClaimHeld(path, v, nonce)
      val mName = s"m-$v.json"
      writeAtomic(logDir(path).resolve(mName), manifestLines(stats))
      writeAtomic(logDir(path).resolve(s"v$v"),
        (rawSnapshotLines(path, prev) ++
          staged.map { case (dst, nk) =>
            delLine(DeleteRef(dst, key, nk, v)) } :+
          refLine(envelope(stats, mName))).mkString("\n"))
      swingPointerCarried(path, v)
      (n, v)
    } finally releaseClaim(path, v)
  }

  /** EXACTLY-ONCE STREAMING UPSERT — [[commitMergeMor]] as a
    * foreachBatch body, the CDC INGEST path: each micro-batch's change
    * rows land as one tombstone + one appended manifest (O(batch), no
    * existing file touched), and the batch id rides the LATEST pointer
    * exactly as in [[commitAppendOnce]], so both replay windows
    * converge — a crash before the swing sweeps invisible orphans and
    * re-commits, a crash after it short-circuits. An EMPTY batch
    * commits nothing and returns false (its replay is deterministically
    * empty again, so skipping it cannot double-apply a later batch).
    * The upsert stream must target an EXISTING table (the key column
    * is validated against the committed schema) and be the table's
    * only streaming writer, as with every pointer-provenance sink.
    * `writerId` scopes the provenance per stream exactly as in
    * [[commitAppendOnce]]. Returns true iff the batch committed.
    */
  def commitMergeMorOnce(spark: SparkSession, path: String,
      changes: DataFrame, key: String, zcol: String, nFiles: Int,
      batchId: Long, writerId: String = ""): Boolean = {
    require(batchId >= 0, "batchId must be >= 0 (-1 marks non-batch commits)")
    val (prevPtr, v, nonce) = claimNext(path)
    try {
      if (prevPtr.exists(p => p._2 == batchId && p._3 == writerId))
        return false
      val prev = prevPtr.map(_._1).getOrElse(
        throw new IllegalArgumentException(
          s"commitMergeMorOnce: no committed snapshot in $path — a CDC " +
            "upsert stream needs an existing table"))
      requireKeyCompatible(path, prev, key, changes, "commitMergeMorOnce")
      val dup = changes.groupBy(col(key)).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).select(col(key)).limit(5)
        .collect().map(_.get(0))
      require(dup.isEmpty,
        s"commitMergeMorOnce: batch carries multiple rows per key " +
          s"($key): " + dup.mkString(","))
      sweepUncommitted(path, v)
      val staged = stageTombstone(spark, path, v, changes, key)
      if (staged.isEmpty) return false
      writeMergedSchema(path, v, Some(prev), changes.schema)
      val stats = writeDataFiles(changes, path, v, zcol, nFiles,
        Some(nonce))
      requireClaimHeld(path, v, nonce)
      val mName = s"m-$v.json"
      writeAtomic(logDir(path).resolve(mName), manifestLines(stats))
      writeAtomic(logDir(path).resolve(s"v$v"),
        (rawSnapshotLines(path, prev) ++
          staged.map { case (dst, nk) =>
            delLine(DeleteRef(dst, key, nk, v)) } :+
          refLine(envelope(stats, mName))).mkString("\n"))
      swingPointer(path, v, batchId, writerId)
      true
    } finally releaseClaim(path, v)
  }

  /** COPY-ON-WRITE MERGE (upsert) commit — the CDC write path: rows of
    * `changes` REPLACE same-key rows of the latest snapshot, new keys
    * INSERT, and only the files holding a matched key rewrite; their
    * manifests rewrite minus the dead rows, untouched manifests carry
    * by reference, and the pre-merge version stays readable bit for
    * bit until vacuum. A change set with MULTIPLE rows per matched key
    * is rejected (nondeterministic which would win — the standard
    * MERGE contract; multiple inserts of one NEW key are the caller's
    * own data). Returns (filesReplaced, filesCarried, newVersion).
    */
  def commitMerge(spark: SparkSession, path: String,
      changes: DataFrame, key: String, zcol: String): (Int, Int, Int) = {
    val (replaced, carried, _, _, v) =
      commitMergePlanned(spark, path, changes, key, zcol)
    (replaced, carried, v)
  }

  /** [[commitMerge]] with planning made visible and O(candidate
    * files): matched-file detection (and the duplicate-matched-key
    * check) descend the metadata pyramid on `key`'s typed bounds and
    * read only the files whose recorded key range can hold a change
    * key — a narrow upsert against a 100 TB table opens a handful of
    * files to learn what it replaces. Caps as in
    * [[commitDeletePlanned]]. Returns (filesReplaced, filesCarried,
    * filesPlanned, filesTotal, newVersion).
    */
  def commitMergePlanned(spark: SparkSession, path: String,
      changes: DataFrame, key: String, zcol: String,
      collectKeyCap: Int = CollectKeyCapDefault,
      broadcastKeyCap: Long = BroadcastKeyCapDefault)
      : (Int, Int, Long, Long, Int) = {
    val prev = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot in $path"))
    require(deleteRefs(path, Some(prev)).isEmpty &&
        predDeleteRefs(path, Some(prev)).isEmpty,
      "snapshot carries merge-on-read tombstones - run compactCommit " +
        "to materialize them before a copy-on-write rewrite")
    val (v, nonce) = claimCow(path, prev, "commitMerge")
    try {
      val plan = planKeys(changes, key, collectKeyCap, broadcastKeyCap)
      val refs = snapshot(path, Some(prev))
      val total = refs.map(_.files.toLong).sum
      val parsedCand = refs
        .filter(r => boundsHitKeys(statFor(r.cols, key), plan) &&
          bloomHitsKeys(r.blooms, key, plan))
        .map(r => r -> parseManifest(path, r.name))
      val candFiles = parsedCand.flatMap(_._2).filter(f =>
        f.rows > 0 && boundsHitKeys(statFor(f.cols, key), plan) &&
          bloomHitsKeys(f.blooms, key, plan))
      val planned = candFiles.size.toLong
      val candDf =
        if (planned == 0) null
        else readFiles(spark, path, prev,
          candFiles.map(f => s"$path/${f.file}").sorted)
      // duplicate keys are fatal only when MATCHED; a matched key can
      // only live in a candidate file, so the check scans candidates
      val dupCand = changes.groupBy(col(key))
        .agg(count(lit(1)).as("n")).filter(col("n") > 1).select(col(key))
      if (planned > 0 && dupCand.limit(1).collect().nonEmpty) {
        val dupMatched = candDf
          .join(broadcast(dupCand), Seq(key), "left_semi")
          .select(col(key)).distinct().limit(5).collect().map(_.get(0))
        require(dupMatched.isEmpty,
          s"merge: changes carry multiple rows per matched key ($key): " +
            dupMatched.mkString(",") + " — pre-aggregate to one row per key")
      }
      val kj = if (plan.big) plan.k else broadcast(plan.k)
      val touched =
        if (planned == 0) Set.empty[String]
        else candDf.withColumn("_f", input_file_name())
          .join(kj, Seq(key), "left_semi")
          .select(col("_f")).distinct().collect()
          .map(_.getString(0).split('/').last).toSet
      val survivors =
        if (touched.isEmpty) changes.limit(0)
        else readFiles(spark, path, prev,
            touched.toIndexedSeq.sorted.map(n => s"$path/$n"))
          .join(kj, Seq(key), "left_anti")
      val rewrite = survivors.unionByName(changes,
        allowMissingColumns = true)
      sweepUncommitted(path, v)
      writeMergedSchema(path, v, Some(prev), rewrite.schema)
      val newStats = writeDataFiles(rewrite, path, v, zcol,
        math.max(1, touched.size), Some(nonce))
      requireClaimHeld(path, v, nonce)
      val mName = s"m-$v.json"
      writeAtomic(logDir(path).resolve(mName), manifestLines(newStats))
      val parsedOf = parsedCand.toMap
      var ri = 0
      val carried = refs.flatMap { ref =>
        parsedOf.get(ref) match {
          case None => Some(ref)
          case Some(fs) =>
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
      }
      writeAtomic(logDir(path).resolve(s"v$v"),
        snapshotLines(carried :+ envelope(newStats, mName)))
      swingPointerCarried(path, v)
      (touched.size, (total - touched.size).toInt, planned, total, v)
    } finally releaseClaim(path, v)
  }

  // ---- reads ----------------------------------------------------------

  /** Typed Column literal from a canonical stat value (see [[ColStat]])
    * — the read-side inverse of [[canonOf]]; Catalyst coerces the
    * literal to the column's exact type at comparison time.
    */
  private def canonToLit(t: String, v: String)
      : org.apache.spark.sql.Column = t match {
    case "l" => lit(v.toLong)
    case "d" => lit(v.toDouble)
    case "dec" => lit(new java.math.BigDecimal(v))
    case "s" => lit(v)
    case "dt" => lit(java.time.LocalDate.ofEpochDay(v.toLong))
    case "ts" =>
      val us = v.toLong
      lit(java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
    case other =>
      throw new IllegalArgumentException(s"unknown stat tag '$other'")
  }

  /** Read `(manifestVersion, filePath)` pairs under `v`'s schema and
    * apply `v`'s tombstones with sequence scoping: a tombstone at
    * version d deletes only from files whose manifest committed before
    * d. Files sharing an applicable-tombstone set read as ONE scan (at
    * most #tombstones+1 groups — no tombstones means the single-scan
    * fast path). PREDICATE tombstones apply as residual filters (null
    * values never match a range and survive); equality tombstones as
    * anti-joins against their key files — broadcast while the ref's
    * recorded key count fits [[ReadBroadcastKeyCap]], shuffle beyond
    * it (a CDC-upsert stream can accumulate table-sized tombstone
    * batches between compactions; forcing those through a driver
    * broadcast is an OOM, not a plan).
    */
  private def readApplying(spark: SparkSession, path: String, v: Int,
      pairs: Seq[(Int, String)]): DataFrame = {
    val dels = deleteRefs(path, Some(v))
    val pdels = predDeleteRefs(path, Some(v))
    if (dels.isEmpty && pdels.isEmpty)
      readFiles(spark, path, v, pairs.map(_._2))
    else pairs.groupBy { case (mv, _) =>
        (dels.filter(_.v > mv).map(_.file).sorted,
          pdels.filter(_.v > mv)) }
      .toSeq
      .sortBy { case ((fs, ps), _) =>
        fs.mkString(",") + "|" + ps.map(predDelLine).mkString(",") }
      .map { case ((delFiles, pds), grp) =>
        val base = readFiles(spark, path, v, grp.map(_._2))
        val predApplied = pds.foldLeft(base) { (df, pd) =>
          val c = col(pd.col)
          val inRange = (pd.lo.map(l => c >= canonToLit(pd.t, l)) ++
            pd.hi.map(h => c <= canonToLit(pd.t, h))).reduce(_ && _)
          df.filter(c.isNull || !inRange)
        }
        // one anti-join per TOMBSTONE (all its part files union as one
        // key relation), guarded by the tombstone's TOTAL recorded key
        // count — per-part guarding would broadcast a 10M-key CDC
        // tombstone 2M keys at a time through a join chain
        delFiles.map(f => dels.find(_.file == f).get)
          .groupBy(d => (d.v, d.key)).toSeq.sortBy(_._1)
          .foldLeft(predApplied) { case (df, ((_, key), refs)) =>
            val keys = spark.read.parquet(
              refs.map(r => s"$path/${r.file}").sorted: _*)
            val side = if (refs.map(_.rows).sum > ReadBroadcastKeyCap)
              keys else broadcast(keys)
            df.join(side, Seq(key), "left_anti")
          }
      }.reduce(_ unionByName _)
  }

  private def manifestFilePairs(path: String, v: Int)
      : Seq[(Int, String)] =
    snapshot(path, Some(v)).flatMap(r =>
      parseManifest(path, r.name).map(f =>
        (manifestVersion(r.name), s"$path/${f.file}")))

  /** Read a snapshot: exactly the files its manifests list — later
    * commits are invisible (snapshot isolation), earlier versions stay
    * readable (time travel).
    */
  def read(spark: SparkSession, path: String,
      version: Option[Int] = None): DataFrame = {
    val v = version.orElse(latestVersion(path)).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot in $path"))
    readApplying(spark, path, v, manifestFilePairs(path, v))
  }

  /** ZONE-PRUNED snapshot read on the legacy double channel:
    * (candidates, filesRead, filesTotal). Planning descends the
    * metadata pyramid — manifest-list envelopes first, surviving
    * manifests' file bounds second — and skipping is SOUND by the same
    * argument as [[Writers.readZonePruned]]: a file is dropped only
    * when its recorded bounds exclude the whole range, so the
    * candidates plus the exact residual equal a full-snapshot filter.
    * Works at any `version`: bounds are immutable with the files they
    * describe, so time travel and pruning compose for free.
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

  /** TYPED pruned read: serve a range probe on ANY column whose stats
    * the manifests carry — string (UTF-8 order), date, timestamp,
    * integral, float, decimal — not only the legacy double channel.
    * `lo`/`hi` accept the column's natural external forms (a string
    * bound, a "yyyy-MM-dd" date, a number …); the column's tag comes
    * from the committed schema. Same pyramid descent and the same
    * soundness argument as [[readPruned]]: a file drops only when its
    * recorded bounds exclude the whole range (a no-stats file is
    * always kept; an all-null file cannot satisfy a range predicate
    * and drops). Returns (candidates, filesRead, filesTotal) — a table
    * with no recorded tag degrades to the full snapshot with
    * filesRead = filesTotal, never to a wrong answer.
    */
  def readPrunedCol(spark: SparkSession, path: String, colName: String,
      lo: Any, hi: Any, version: Option[Int] = None)
      : (DataFrame, Long, Long) = {
    val v = version.orElse(latestVersion(path)).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot in $path"))
    val refs = snapshot(path, Some(v))
    val total = refs.map(_.files.toLong).sum
    val tag = readSchema(path, v).flatMap(sc =>
        sc.fields.find(_.name == colName).flatMap(f => colTag(f.dataType)))
      .orElse(refs.flatMap(r => statFor(r.cols, colName))
        .headOption.map(_.t))
    tag match {
      case None => (read(spark, path, Some(v)), total, total)
      case Some(t) =>
        val (l, h) = (canonOf(t, lo), canonOf(t, hi))
        def hits(cs: Option[ColStat]): Boolean = cs match {
          case None => true
          case Some(s) if s.t != t => true
          case Some(ColStat(_, _, Some(mn), Some(mx))) =>
            cmpCanon(t, mn, h) <= 0 && cmpCanon(t, mx, l) >= 0
          case Some(ColStat(_, _, None, None)) => false // all-null file
          case Some(_) => true // half-written bounds: unknown, keep
        }
        val hit = refs.filter(r => hits(statFor(r.cols, colName)))
          .flatMap(r => parseManifest(path, r.name)
            .filter(f => f.rows > 0 && hits(statFor(f.cols, colName)))
            .map(f => (manifestVersion(r.name), s"$path/${f.file}")))
          .sortBy(_._2)
        val df =
          if (hit.nonEmpty) readApplying(spark, path, v, hit)
          else read(spark, path, Some(v)).filter(lit(false))
        (df, hit.length.toLong, total)
    }
  }

  /** CONJUNCTIVE typed pruned read — AND of range predicates over
    * several stat-carrying columns: a file survives only when EVERY
    * predicate's recorded bounds admit it, so the candidate set is the
    * INTERSECTION of the single-column prunes (on a Morton-clustered
    * table a 2-D box probe opens ~the files of one 2-D block). Each
    * predicate is individually sound by the [[readPrunedCol]] argument,
    * and dropping a file any predicate excludes is sound for a
    * conjunction. Returns (candidates, filesRead, filesTotal).
    */
  def readPrunedCols(spark: SparkSession, path: String,
      preds: Seq[(String, Any, Any)], version: Option[Int] = None)
      : (DataFrame, Long, Long) = {
    val v = version.orElse(latestVersion(path)).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot in $path"))
    val refs = snapshot(path, Some(v))
    val total = refs.map(_.files.toLong).sum
    val sc = readSchema(path, v)
    // (col, tag, canonical lo, canonical hi) — a column with no
    // recorded tag cannot prune and drops out of the conjunction
    val tests = preds.flatMap { case (c, lo, hi) =>
      sc.flatMap(s => s.fields.find(_.name == c).flatMap(f =>
          colTag(f.dataType)))
        .orElse(refs.flatMap(r => statFor(r.cols, c)).headOption.map(_.t))
        .map(t => (c, t, canonOf(t, lo), canonOf(t, hi)))
    }
    def hits(cols: Seq[ColStat]): Boolean = tests.forall {
      case (c, t, l, h) => statFor(cols, c) match {
        case None => true
        case Some(s) if s.t != t => true
        case Some(ColStat(_, _, Some(mn), Some(mx))) =>
          cmpCanon(t, mn, h) <= 0 && cmpCanon(t, mx, l) >= 0
        case Some(ColStat(_, _, None, None)) => false
        case Some(_) => true
      }
    }
    val hit = refs.filter(r => hits(r.cols))
      .flatMap(r => parseManifest(path, r.name)
        .filter(f => f.rows > 0 && hits(f.cols))
        .map(f => (manifestVersion(r.name), s"$path/${f.file}")))
      .sortBy(_._2)
    val df =
      if (hit.nonEmpty) readApplying(spark, path, v, hit)
      else read(spark, path, Some(v)).filter(lit(false))
    (df, hit.length.toLong, total)
  }

  /** KEYED pruned read — the files a KEY-SET probe must open, planned
    * through the same bounds+bloom pyramid descent the planned
    * rewrites use, on the READ side: the library-level form of DSv2
    * runtime filtering for the dim-filtered star join over a snapshot
    * fact table (the deliberate V1Scan execution boundary keeps
    * BatchScanExec's SupportsRuntimeFiltering hook out of reach — the
    * scan would forfeit the single tombstone-applying read path and
    * vectorized parquet to gain it). `collectKeyCap` bounds the
    * exact-value plan, `broadcastKeyCap` the probe broadcast, exactly
    * as in [[commitDeletePlanned]]. Sound like every prune here: a
    * file drops only when its recorded bounds OR its key bloom prove
    * no planned key can be present (bloom false positives only ADD
    * candidates), so candidates + the caller's join equal a full
    * scan's join. Returns (candidates, filesRead, filesTotal).
    */
  def readKeyedPruned(spark: SparkSession, path: String, keyCol: String,
      keys: DataFrame, version: Option[Int] = None,
      collectKeyCap: Int = CollectKeyCapDefault,
      broadcastKeyCap: Long = BroadcastKeyCapDefault)
      : (DataFrame, Long, Long) = {
    val v = version.orElse(latestVersion(path)).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot in $path"))
    val plan = planKeys(keys, keyCol, collectKeyCap, broadcastKeyCap)
    val refs = snapshot(path, Some(v))
    val total = refs.map(_.files.toLong).sum
    val hit = refs
      .filter(r => boundsHitKeys(statFor(r.cols, keyCol), plan) &&
        bloomHitsKeys(r.blooms, keyCol, plan))
      .flatMap(r => parseManifest(path, r.name)
        .filter(f => f.rows > 0 &&
          boundsHitKeys(statFor(f.cols, keyCol), plan) &&
          bloomHitsKeys(f.blooms, keyCol, plan))
        .map(f => (manifestVersion(r.name), s"$path/${f.file}")))
      .sortBy(_._2)
    val df =
      if (hit.nonEmpty) readApplying(spark, path, v, hit)
      else read(spark, path, Some(v)).filter(lit(false))
    (df, hit.length.toLong, total)
  }

  /** Plan the (manifestVersion, filePath) pairs surviving a
    * conjunction of OPTIONAL-sided range predicates — the planning
    * half of [[readPrunedCols]] exposed for the Catalyst-pushdown
    * source ([[SnapshotTableSource]]): the same pyramid descent
    * (envelope-pruned manifests never parse), the same soundness
    * argument, with an open side treated as unbounded. A predicate on
    * a column with no recorded tag drops out of the conjunction
    * (cannot prune, never wrong). Returns (pairs, filesTotal).
    */
  def planPrunedFiles(path: String, version: Option[Int],
      preds: Seq[(String, Option[Any], Option[Any])])
      : (Seq[(Int, String)], Long) =
    planPrunedFilesDnf(path, version, preds.map { case (c, lo, hi) =>
      PredDnf(Seq(Seq(RangeTest(c, lo, hi)))) })

  // ---- generalized file tests: ranges, key sets, disjunctions --------
  // The pushdown source's predicate language: a pushed filter compiles
  // to an OR of ANDs of leaf tests (disjunctive normal form), and a
  // file survives the conjunction of pushed filters iff EVERY filter
  // has SOME disjunct all of whose leaves admit the file. RangeTest is
  // the typed-envelope test planPrunedFiles always ran; InTest is the
  // point/IN shape, which additionally probes the manifest KEY BLOOMS
  // — the pruner min/max bounds can never serve for scattered ids on a
  // value-clustered table (every file spans ~the full key RANGE but
  // almost no file holds the keys' SET). Soundness is per-leaf: each
  // leaf only ever drops a file its recorded metadata PROVES cannot
  // match (bloom false positives only ADD candidates), OR-ing admits a
  // superset, and unknown shapes never reach the planner — so the
  // candidate set plus Spark's residual re-evaluation equals a full
  // scan's answer.

  sealed trait FileTest
  case class RangeTest(col: String, lo: Option[Any],
      hi: Option[Any]) extends FileTest
  case class InTest(col: String, keys: Seq[Any]) extends FileTest
  /** One pushed predicate in DNF: OR over `disjuncts`, AND within. */
  case class PredDnf(disjuncts: Seq[Seq[FileTest]])

  /** A leaf compiled against the table's committed tags: canonical
    * bounds for ranges; sorted canonical keys + xxhash64 probes (the
    * bloom family both commit paths feed) for key sets. None = the
    * column has no recorded tag — the leaf cannot prune and compiles
    * to always-hit.
    */
  private sealed trait CompiledTest
  private case class CRange(col: String, t: String, lo: Option[String],
      hi: Option[String]) extends CompiledTest
  private case class CIn(col: String, t: String, sorted: Array[String],
      hashes: Option[Array[Long]]) extends CompiledTest
  private case object CAlways extends CompiledTest

  private def compileTest(test: FileTest,
      tagOf: String => Option[String]): CompiledTest = test match {
    case RangeTest(c, lo, hi) => tagOf(c) match {
      case Some(t) => CRange(c, t, lo.map(canonOf(t, _)),
        hi.map(canonOf(t, _)))
      case None => CAlways
    }
    case InTest(c, keys) => tagOf(c) match {
      case Some(t) =>
        val a = keys.iterator.filter(_ != null)
          .map(v => canonOf(t, v)).toArray
        scala.util.Sorting.stableSort(a,
          (x: String, y: String) => cmpCanon(t, x, y) < 0)
        val hashes = t match {
          case "l" => Some(a.map(v => xx64(v.toLong)))
          case "s" => Some(a.map(xx64Str))
          case _ => None
        }
        CIn(c, t, a, hashes)
      case None => CAlways
    }
  }

  private def testHits(ct: CompiledTest, cols: Seq[ColStat],
      blooms: Seq[(String, String)]): Boolean = ct match {
    case CAlways => true
    case CRange(c, t, l, h) => statFor(cols, c) match {
      case None => true
      case Some(s) if s.t != t => true
      case Some(ColStat(_, _, Some(mn), Some(mx))) =>
        l.forall(lv => cmpCanon(t, mx, lv) >= 0) &&
          h.forall(hv => cmpCanon(t, mn, hv) <= 0)
      case Some(ColStat(_, _, None, None)) => false
      case Some(_) => true
    }
    case CIn(c, t, sorted, hashes) =>
      if (sorted.isEmpty) false // only-null IN set: no row can match
      else {
        val boundsHit = statFor(cols, c) match {
          case None => true
          case Some(s) if s.t != t => true
          case Some(ColStat(_, _, Some(mn), Some(mx))) =>
            anyKeyIn(sorted, t, mn, mx)
          case Some(ColStat(_, _, None, None)) => false
          case Some(_) => true
        }
        boundsHit && ((blooms.find(_._1 == c), hashes) match {
          case (Some((_, b64)), Some(hs)) =>
            try { val bf = readBloom(b64); hs.exists(bf.mightContainLong) }
            catch { case _: Exception => true } // unreadable: keep
          case _ => true
        })
      }
  }

  /** [[planPrunedFiles]] over the full predicate language — a
    * conjunction of DNF predicates (ranges, IN sets, disjunctions) —
    * with the same pyramid descent: a manifest whose ENVELOPE (typed
    * bounds + union bloom) fails any predicate carries by exclusion
    * and never parses; surviving manifests' files test individually.
    * Returns (pairs, filesTotal).
    */
  def planPrunedFilesDnf(path: String, version: Option[Int],
      preds: Seq[PredDnf]): (Seq[(Int, String)], Long) = {
    val v = version.orElse(latestVersion(path)).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot in $path"))
    val refs = snapshot(path, Some(v))
    val total = refs.map(_.files.toLong).sum
    val sc = readSchema(path, v)
    def tagOf(c: String): Option[String] =
      sc.flatMap(s => s.fields.find(_.name == c).flatMap(f =>
          colTag(f.dataType)))
        .orElse(refs.flatMap(r => statFor(r.cols, c)).headOption.map(_.t))
    val compiled: Seq[Seq[Seq[CompiledTest]]] = preds.map(_.disjuncts
      .map(_.map(t => compileTest(t, tagOf))))
    def hits(cols: Seq[ColStat], blooms: Seq[(String, String)]): Boolean =
      compiled.forall(_.exists(_.forall(ct => testHits(ct, cols, blooms))))
    val hit = refs.filter(r => hits(r.cols, r.blooms))
      .flatMap(r => parseManifest(path, r.name)
        .filter(f => f.rows > 0 && hits(f.cols, f.blooms))
        .map(f => (manifestVersion(r.name), s"$path/${f.file}")))
      .sortBy(_._2)
    (hit, total)
  }

  /** Read planned pairs (from [[planPrunedFiles]]) under `version`'s
    * schema with its tombstones applied — the scan body of the
    * pushdown source; an empty plan reads as the empty snapshot.
    */
  def readPlanned(spark: SparkSession, path: String, version: Option[Int],
      pairs: Seq[(Int, String)]): DataFrame = {
    val v = version.orElse(latestVersion(path)).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot in $path"))
    if (pairs.nonEmpty) readApplying(spark, path, v, pairs)
    else read(spark, path, Some(v)).filter(lit(false))
  }

  /** The OLDEST still-time-travelable version — the smallest `v<N>`
    * snapshot file surviving [[vacuum]]; None before the first commit.
    * The changes feed starts announcing here: announcing a vacuumed
    * version would fail every consumer that resolves it.
    */
  def oldestRetainedVersion(path: String): Option[Int] = {
    val log = logDir(path).toFile
    val vs = Option(log.listFiles()).getOrElse(Array.empty[java.io.File])
      .map(_.getName).filter(_.matches("v\\d+")).map(_.drop(1).toInt)
    if (vs.isEmpty) None else Some(vs.min)
  }

  /** METADATA-ONLY typed aggregates: COUNT(*) plus MIN/MAX of ANY
    * stat-carrying column off the manifest lines — zero data files
    * opened, the [[statsAgg]] payoff extended past the legacy double
    * channel (a string/date/decimal column answers as exactly). Bounds
    * return in canonical form under the returned tag (see [[ColStat]]);
    * None when no file recorded the column (pre-stats manifests or an
    * unsupported type) — the caller's signal to scan instead. Same
    * tombstone guard as [[statsAgg]].
    */
  def statsAggCol(path: String, colName: String,
      version: Option[Int] = None)
      : (Long, Option[(String, String, String)]) = {
    val (rows, by) = statsAggCols(path, Seq(colName), version)
    (rows, by(colName))
  }

  /** [[statsAggCol]] over SEVERAL columns in ONE manifest pass — the
    * pushed-aggregate planner's shape (one query's MIN/MAX list), so a
    * million-file table's manifests parse once per query, not once per
    * aggregate expression. Returns (rowCount, per-column bounds under
    * [[statsAggCol]]'s contract).
    */
  def statsAggCols(path: String, colNames: Seq[String],
      version: Option[Int] = None)
      : (Long, Map[String, Option[(String, String, String)]]) = {
    require(deleteRefs(path, version.orElse(latestVersion(path))).isEmpty
        && predDeleteRefs(path,
          version.orElse(latestVersion(path))).isEmpty,
      "statsAggCol: snapshot carries merge-on-read tombstones whose " +
        "rows the manifest stats still count - run compactCommit first")
    val stats = snapshot(path, version)
      .flatMap(r => parseManifest(path, r.name)).filter(_.rows > 0)
    require(stats.nonEmpty, s"statsAggCol: snapshot of $path holds no rows")
    val rows = stats.map(_.rows).sum
    val byCol = colNames.distinct.map { colName =>
      val per = stats.map(f => statFor(f.cols, colName))
      val bounds =
        if (per.exists(_.isEmpty)) None
        else {
          val cs = per.map(_.get)
          val t = cs.head.t
          if (cs.exists(_.t != t)) None
          else {
            val bounded = cs.flatMap(s =>
              for (l <- s.lo; h <- s.hi) yield (l, h))
            if (bounded.isEmpty) None
            else Some((t,
              bounded.map(_._1).reduce((a, b) =>
                if (cmpCanon(t, a, b) <= 0) a else b),
              bounded.map(_._2).reduce((a, b) =>
                if (cmpCanon(t, a, b) >= 0) a else b)))
          }
        }
      colName -> bounds
    }.toMap
    (rows, byCol)
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
    * the true inserts and deletes. `fromV = 0` is the EMPTY table —
    * the baseline a brand-new consumer diffs against (everything in
    * `toV` is an insert). Returns (changes with a `_change` column of
    * "insert"/"delete", filesRead, filesTotal-at-`to`).
    */
  def readChanges(spark: SparkSession, path: String, fromV: Int,
      toV: Int): (DataFrame, Long, Long) = {
    require(fromV >= 0 && fromV <= toV,
      s"readChanges: bad version range v$fromV..v$toV")
    // a vacuumed endpoint gets the DEDICATED exception naming the
    // recovery (reset to the v0 baseline), not an opaque missing-file
    // require deep inside snapshot resolution
    Seq(fromV, toV).filter(_ > 0)
      .filterNot(v => Files.exists(logDir(path).resolve(s"v$v")))
      .foreach(v => throw new SnapshotVacuumedException(
        s"readChanges: snapshot v$v of $path no longer exists " +
          "(vacuumed) — reset the cursor to 0 and rebuild from the " +
          "empty-table baseline (readChanges(0, latest) needs no " +
          "earlier snapshot)"))
    Seq(fromV, toV).filter(_ > 0).foreach(v => require(
      deleteRefs(path, Some(v)).isEmpty &&
        predDeleteRefs(path, Some(v)).isEmpty,
      s"readChanges: v$v carries merge-on-read tombstones - run " +
        "compactCommit to materialize them first"))
    def fileSet(v: Int): Set[String] =
      if (v == 0) Set.empty
      else snapshot(path, Some(v)).flatMap(r => parseManifest(path, r.name))
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
    *
    * Group keys join NULL-SAFELY (`<=>` per column), so a null group —
    * the shape schema evolution mints when it null-fills an evolved
    * column — merges into ONE view row instead of accumulating
    * duplicates. Measure columns are CONTRACTUALLY NON-NULL: an
    * all-null group sums to NULL in a recompute but to 0 in any
    * delta-maintained view (the information "no non-null value
    * remains" is not maintainable without a per-column non-null
    * count), so rather than drift silently the delta fold raises on
    * the first null measure value it meets.
    */
  def incrementalAgg(mv: DataFrame, changes: DataFrame,
      groupCols: Seq[String], sumCols: Seq[String]): DataFrame = {
    val sign = when(col("_change") === lit("insert"), lit(1))
      .otherwise(lit(-1))
    val aggs = (sum(sign.cast("long")).as("_dn") +:
      sumCols.map(c => sum(col(c) * sign).as(s"_d_$c"))) ++
      sumCols.map(c =>
        max(when(col(c).isNull, lit(1)).otherwise(lit(0))).as(s"_nul_$c"))
    val delta = changes.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val m = mv.alias("_l")
    val d = delta.alias("_r")
    val cond = groupCols.map(c => col(s"_l.$c") <=> col(s"_r.$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    m.join(d, cond, "full_outer")
      .select((groupCols.map(c =>
          coalesce(col(s"_l.$c"), col(s"_r.$c")).as(c)) :+
        (coalesce(col("_l.n"), lit(0L)) +
          coalesce(col("_r._dn"), lit(0L))).as("n")) ++
        sumCols.map(c =>
          when(col(s"_r._nul_$c") === lit(1), raise_error(lit(
            s"incrementalAgg: null value in measure column '$c' — the " +
              "view contract requires non-null measures (a null sum is " +
              "not maintainable without a per-column non-null count)")))
          .otherwise(coalesce(col(s"_l.$c"), lit(0)) +
            coalesce(col(s"_r._d_$c"), lit(0))).as(c)): _*)
      .filter(col("n") > 0)
  }

  // ---- stream-maintained aggregate: the changes feed's consumer ------
  // [[SnapshotChangesSource]] announces committed versions as a
  // checkpointed micro-batch stream; [[maintainAgg]] is the idempotent
  // foreachBatch body that folds each announced range into a DURABLE
  // materialized aggregate. Its own version cursor publishes atomically
  // AFTER the view, so Spark's at-least-once batch replay (same
  // versions re-announced after a crash) short-circuits instead of
  // double-applying — the [[commitAppendOnce]] argument, applied to the
  // consumer side. A deleted view directory self-heals: cursor 0 makes
  // the next refresh rebuild from the v0 empty-table baseline.

  private def cursorPath(viewDir: String) = Paths.get(viewDir, "CURSOR")

  /** The table version the maintained view at `viewDir` reflects —
    * 0 before the first refresh (the empty-table baseline).
    */
  def maintainedCursor(viewDir: String): Int = {
    val p = cursorPath(viewDir)
    if (!Files.exists(p)) 0
    else new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .trim.toInt
  }

  /** The maintained view's current rows (empty-schema failure before
    * the first refresh is the caller's signal to drain the stream).
    */
  def readMaintainedAgg(spark: SparkSession, viewDir: String): DataFrame =
    spark.read.parquet(s"$viewDir/v${maintainedCursor(viewDir)}")

  /** Fold table versions (cursor, toV] into the standing aggregate at
    * `viewDir` — O(delta) via [[readChanges]] + [[incrementalAgg]],
    * the base table never re-read. Idempotent: a replayed batch
    * (toV <= cursor) is a no-op, and a crash anywhere leaves the
    * previous (view, cursor) pair intact — the view lands as a new
    * `v<toV>` directory and the cursor swings atomically afterwards;
    * stale view directories are swept lazily after the swing. Returns
    * the cursor after the call.
    */
  def maintainAgg(spark: SparkSession, tablePath: String, viewDir: String,
      groupCols: Seq[String], sumCols: Seq[String], toV: Int): Int = {
    val cur0 = maintainedCursor(viewDir)
    if (toV <= cur0) return cur0 // replayed batch: already applied
    // SELF-HEAL a cursor stranded below the vacuum horizon (the view
    // fell further behind than the table's retention): its snapshot is
    // gone, so the O(delta) fold is impossible — rebuild from the v0
    // empty-table baseline instead of dying on [[SnapshotVacuumedException]]
    val cur =
      if (cur0 > 0 &&
        !Files.exists(logDir(tablePath).resolve(s"v$cur0"))) 0
      else cur0
    val (ch, _, _) = readChanges(spark, tablePath, cur, toV)
    val mv =
      if (cur == 0) {
        val aggs = count(lit(1)).as("n") +:
          sumCols.map(c => sum(col(c)).as(c))
        ch.limit(0).groupBy(groupCols.map(col): _*)
          .agg(aggs.head, aggs.tail: _*)
      }
      else spark.read.parquet(s"$viewDir/v$cur")
    incrementalAgg(mv, ch, groupCols, sumCols)
      .write.mode("overwrite").parquet(s"$viewDir/v$toV")
    writeAtomic(cursorPath(viewDir), toV.toString)
    // lazy GC of superseded view generations (best-effort: a crash
    // here just leaves a stale dir for the next refresh to sweep)
    Option(new java.io.File(viewDir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.matches("v\\d+") &&
        f.getName != s"v$toV")
      .foreach(deleteDirRecursive)
    toV
  }

  private def deleteDirRecursive(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      .foreach(deleteDirRecursive)
    f.delete()
  }

  /** METADATA-ONLY aggregates: COUNT(*), MIN(zcol), MAX(zcol) answered
    * from the manifest stats alone — ZERO data files opened, cost
    * O(manifest lines) regardless of table size. This is the planning
    * payoff of carrying exact per-file bounds in the commit log: on a
    * 100 TB table the answer comes off kilobytes of metadata. Sound
    * because the stat pass records the TRUE per-file min/max and row
    * count at write time and files are immutable afterwards; works at
    * any `version` for the same reason time travel does. Empty-file
    * sentinels are excluded the same way [[envelope]] does.
    */
  def statsAgg(path: String, version: Option[Int] = None)
      : (Long, Double, Double) = {
    val vv = version.orElse(latestVersion(path))
    require(deleteRefs(path, vv).isEmpty && predDeleteRefs(path, vv).isEmpty,
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
        version.orElse(latestVersion(path))).isEmpty &&
        predDeleteRefs(path, version.orElse(latestVersion(path))).isEmpty,
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
    * references (plus any dead claim at or below the latest committed
    * version — a claim for a version that EXISTS can never be
    * re-claimed and is pure leftover). Vacuumed versions stop being
    * time-travelable (the explicit retention trade every table format
    * makes); retained reads are unaffected. Returns (snapshotsDeleted,
    * filesDeleted).
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
    (1 to latest).foreach(v => releaseClaim(path, v))
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
