package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, Filter, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The [[SnapshotTable]] as a PLANNER-INTEGRATED read: a DSv2
  * `TableProvider` whose `ScanBuilder` receives Catalyst's pushed
  * filters and drives the metadata-pyramid descent with them, so
  *
  * {{{
  *   spark.read.format("graft.sources.SnapshotTableSource")
  *     .option("path", dir)                // + versionAsOf for travel
  *     .load().filter($"price" >= 100000)
  * }}}
  *
  * prunes data files exactly like a hand-called
  * [[SnapshotTable.readPrunedCols]] — no side API, the predicate
  * arrives through the optimizer like any parquet scan's.
  *
  * Pushdown is ADVISORY by construction: `pushFilters` keeps EVERY
  * filter as a residual (Spark re-evaluates them over the scan
  * output), and the accepted subset only narrows which files the scan
  * opens — a missed translation can only widen the read, never wrong
  * it. Translated shapes: =, <, <=, >, >= (strict inequalities prune
  * as their closed forms — sound), IS NOT NULL (drops all-null files),
  * and conjunctions; anything else is simply not used for pruning.
  *
  * The scan itself is a [[V1Scan]]: planning resolves the candidate
  * file list on the driver (O(metadata)), and the relation body
  * delegates to [[SnapshotTable.readPlanned]] — the tombstone-applying
  * distributed read — rather than re-implementing a parquet
  * PartitionReader. This is the same v2-plans/v1-executes shape
  * Spark's own JDBC source uses, and it keeps ONE read path for
  * manual and SQL access.
  */
class SnapshotTableSource extends TableProvider {
  private def pathOf(m: java.util.Map[String, String]): String =
    Option(m.get("path")).getOrElse(throw new IllegalArgumentException(
      "graft-snapshot: 'path' option required"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SnapshotTableSource.schemaOf(pathOf(options),
      Option(options.get("versionAsOf")).map(_.toInt))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = properties.asScala.toMap
    new SnapshotV2Table(pathOf(properties),
      opts.get("versionAsOf").map(_.toInt), schema)
  }
}

object SnapshotTableSource {
  private[sources] def schemaOf(path: String,
      version: Option[Int]): StructType = {
    val v = version.orElse(SnapshotTable.latestVersion(path)).getOrElse(
      throw new IllegalArgumentException(
        s"graft-snapshot: no committed snapshot in $path"))
    SnapshotTable.readSchema(path, v).getOrElse(
      throw new IllegalArgumentException(
        s"graft-snapshot: $path v$v has no committed schema (written " +
          "before schema tracking) - read it via SnapshotTable.read"))
  }

  /** Planning evidence of the most recent scan built in this JVM —
    * (files opened, files total), the strict-subset counter the plan
    * audit pins. Diagnostics only; concurrent scans may interleave.
    */
  @volatile var lastPlanned: Long = -1L
  @volatile var lastTotal: Long = -1L

  /** Pushed filters → optional-sided ranges for the pyramid descent.
    * None = shape not translatable (it still applies as a residual).
    */
  private[sources] def ranges(f: Filter)
      : Option[Seq[(String, Option[Any], Option[Any])]] = f match {
    case sources.EqualTo(a, v) if v != null => Some(Seq((a, Some(v), Some(v))))
    case sources.GreaterThan(a, v) => Some(Seq((a, Some(v), None)))
    case sources.GreaterThanOrEqual(a, v) => Some(Seq((a, Some(v), None)))
    case sources.LessThan(a, v) => Some(Seq((a, None, Some(v))))
    case sources.LessThanOrEqual(a, v) => Some(Seq((a, None, Some(v))))
    case sources.IsNotNull(a) => Some(Seq((a, None, None)))
    case sources.And(l, r) =>
      for { a <- ranges(l); b <- ranges(r) } yield a ++ b
    case _ => None
  }
}

private[sources] class SnapshotV2Table(path: String, version: Option[Int],
    schema0: StructType) extends Table with SupportsRead {
  override def name(): String = s"graft_snapshot($path)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new SnapshotScanBuilder(path, version, schema0)
}

private[sources] class SnapshotScanBuilder(path: String,
    version: Option[Int], schema0: StructType) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var required: StructType = schema0
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => SnapshotTableSource.ranges(f).nonEmpty)
    filters // every filter stays residual: pruning is advisory, sound
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new SnapshotV1Scan(path, version, required, pushed)
}

private[sources] class SnapshotV1Scan(path: String, version: Option[Int],
    required: StructType, pushed: Array[Filter]) extends V1Scan {
  override def readSchema(): StructType = required

  override def description(): String = {
    val preds = pushed.mkString(", ")
    s"graft-snapshot $path${version.map(v => s"@v$v").getOrElse("")}" +
      (if (preds.isEmpty) "" else s" pushed=[$preds]")
  }

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = required
      override def buildScan(): RDD[Row] = {
        val preds = pushed.toIndexedSeq
          .flatMap(SnapshotTableSource.ranges).flatten
        val (pairs, total) =
          SnapshotTable.planPrunedFiles(path, version, preds)
        SnapshotTableSource.lastPlanned = pairs.size.toLong
        SnapshotTableSource.lastTotal = total
        val df = SnapshotTable.readPlanned(
          context.sparkSession, path, version, pairs)
        val pruned =
          if (required.fieldNames.sameElements(df.schema.fieldNames)) df
          else df.select(required.fieldNames.toIndexedSeq
            .map(org.apache.spark.sql.functions.col): _*)
        pruned.rdd
      }
    }.asInstanceOf[T]
}
