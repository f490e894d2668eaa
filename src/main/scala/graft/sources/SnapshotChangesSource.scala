package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The [[SnapshotTable]] commit log as a STREAMING SOURCE — the read
  * that turns the table into first-class CDC: each committed VERSION
  * becomes one control row `(version INT)`, the stream's offset is the
  * version cursor, and Spark's checkpoint makes restarts resume
  * exactly where they stopped — no version is re-announced, ever.
  *
  * Deliberately a CONTROL-ROW source, not a data-row source: the
  * version rows are driver-cheap (one pointer read per trigger — the
  * same shape as [[PagedApiMicroBatchStream]]'s listing cursor), and
  * the micro-batch body resolves versions to row-level deltas with
  * [[SnapshotTable.readChanges]] — a fully DISTRIBUTED plan (file-set
  * diff + exceptAll) that a PartitionReader emitting InternalRows
  * could not express. [[SnapshotTable.maintainAgg]] is the idempotent
  * consumer built for exactly this foreachBatch: its own durable
  * cursor makes replayed batches no-ops, so the pair gives
  * effectively-exactly-once view maintenance over an at-least-once
  * stream.
  *
  * Admission control: at most `maxVersionsPerTrigger` versions per
  * batch (default 1 — each commit maintains separately, the steady
  * state of a standing refresh job); Trigger.AvailableNow pins the
  * catch-up target at start like every admission-controlled source.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft.sources.SnapshotChangesSource")
  *     .option("path", tableDir).load()   // rows: (version INT)
  * }}}
  */
class SnapshotChangesSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SnapshotChangesSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SnapshotChangesTable(properties.asScala.toMap)
}

object SnapshotChangesSource {
  val schema: StructType = StructType(Seq(
    StructField("version", IntegerType, nullable = false)))
}

private[sources] class SnapshotChangesTable(options: Map[String, String])
    extends Table with SupportsRead {
  private val path = options.getOrElse("path",
    throw new IllegalArgumentException(
      "snapshot-changes: 'path' option required"))
  override def name(): String = s"snapshot_changes($path)"
  override def schema(): StructType = SnapshotChangesSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap):
      ScanBuilder = new ScanBuilder with Scan with Batch {
    override def build(): Scan = this
    override def readSchema(): StructType = SnapshotChangesSource.schema
    override def toBatch: Batch = this
    // batch mode: every RETAINED committed version, for ad-hoc
    // catch-up reads — vacuum(keepLast=k) deletes early snapshot
    // files, and announcing a vacuumed version would fail any consumer
    // that resolves it; a consumer starting from cursor 0 still
    // rebuilds exactly, because readChanges(0, firstAnnounced) is the
    // empty-table baseline and needs no earlier snapshot
    override def planInputPartitions(): Array[InputPartition] = {
      val latest = SnapshotTable.latestVersion(path).getOrElse(0)
      val oldest = SnapshotTable.oldestRetainedVersion(path).getOrElse(1)
      if (latest == 0) Array.empty
      else Array(SnapshotVersionsPartition(oldest, latest))
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new SnapshotVersionsReaderFactory
    override def toMicroBatchStream(checkpointLocation: String):
        streaming.MicroBatchStream =
      new SnapshotChangesMicroBatchStream(path, options)
  }
}

/** Offset = the last ANNOUNCED version; a plain cursor serializes
  * trivially into the checkpoint, which is what makes restarts resume
  * without re-reading versions.
  */
private[sources] case class SnapshotVersionOffset(v: Int)
    extends streaming.Offset {
  override def json(): String = v.toString
}

private[sources] class SnapshotChangesMicroBatchStream(path: String,
    options: Map[String, String]) extends streaming.MicroBatchStream
    with streaming.SupportsAdmissionControl
    with streaming.SupportsTriggerAvailableNow {
  private val maxPerTrigger =
    options.getOrElse("maxVersionsPerTrigger", "1").toInt
  // AvailableNow contract: pin the catch-up target at start; the engine
  // drains rate-capped batches until the offset reaches it
  private var availableTarget: Option[Int] = None

  private def latest(): Int = SnapshotTable.latestVersion(path).getOrElse(0)

  override def prepareForTriggerAvailableNow(): Unit =
    availableTarget = Some(latest())

  override def initialOffset(): streaming.Offset = SnapshotVersionOffset(0)

  override def deserializeOffset(json: String): streaming.Offset =
    SnapshotVersionOffset(json.toInt)

  override def getDefaultReadLimit: streaming.ReadLimit =
    streaming.ReadLimit.maxRows(maxPerTrigger.toLong)

  private def readLimitRows(limit: streaming.ReadLimit): Long =
    limit match {
      case r: streaming.ReadMaxRows => r.maxRows()
      case _: streaming.ReadAllAvailable => Long.MaxValue
      case c: streaming.CompositeReadLimit =>
        c.getReadLimits.map(readLimitRows).min
      case _ => maxPerTrigger.toLong
    }

  override def latestOffset(start: streaming.Offset,
      limit: streaming.ReadLimit): streaming.Offset = {
    val s = start.asInstanceOf[SnapshotVersionOffset].v
    val cap = math.min(readLimitRows(limit), Int.MaxValue.toLong).toInt
    val target = math.min(
      availableTarget.getOrElse(Int.MaxValue).toLong,
      math.min(latest().toLong, s.toLong + cap))
    SnapshotVersionOffset(target.toInt)
  }

  override def latestOffset(): streaming.Offset =
    SnapshotVersionOffset(availableTarget.getOrElse(latest()))

  override def planInputPartitions(start: streaming.Offset,
      end: streaming.Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[SnapshotVersionOffset].v,
      end.asInstanceOf[SnapshotVersionOffset].v)
    // clamp a below-horizon cursor up to the oldest retained version:
    // a restart whose checkpoint predates a vacuum must not announce
    // versions whose snapshots no longer exist. A consumer whose OWN
    // durable cursor is below the horizon cannot fold the skipped gap
    // (readChanges needs the cursor's snapshot) — it rebuilds by
    // resetting its view to cursor 0, which folds the announced
    // version as a fresh empty-table baseline.
    val horizon =
      SnapshotTable.oldestRetainedVersion(path).getOrElse(1) - 1
    val from = math.max(s, horizon)
    if (e <= from) Array.empty
    else Array(SnapshotVersionsPartition(from + 1, e))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SnapshotVersionsReaderFactory

  override def commit(end: streaming.Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class SnapshotVersionsPartition(fromV: Int,
    toV: Int) extends InputPartition

private[sources] class SnapshotVersionsReaderFactory
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition):
      PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SnapshotVersionsPartition]
    new PartitionReader[InternalRow] {
      private val it = (p.fromV to p.toV).iterator
      private var current: InternalRow = _
      override def next(): Boolean =
        it.hasNext && { current = InternalRow(it.next()); true }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
