package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, Filter, TableScan}
import org.apache.spark.sql.types._
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

  /** True when the most recent scan answered a pushed AGGREGATION from
    * manifest metadata alone (zero data files opened).
    */
  @volatile var lastAggPushed: Boolean = false

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
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {
  private var required: StructType = schema0
  private var pushed: Array[Filter] = Array.empty
  private var aggResult: Option[(StructType, Row)] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => SnapshotTableSource.ranges(f).nonEmpty)
    filters // every filter stays residual: pruning is advisory, sound
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // ---- aggregate pushdown: statsAgg/statsAggCol through Catalyst ----
  // COUNT(*) / MIN / MAX with no GROUP BY and no predicates answer
  // from the manifest lines alone — ZERO data files opened, the
  // metadata-only aggregate surfaced to SQL. Declined (so the ordinary
  // scan path answers, never wrongly) whenever: any filter reached the
  // scan, a group-by exists, the snapshot carries live tombstones
  // (their rows still count in the stats), the table is empty, or a
  // column lacks complete stats under one tag. The single result row
  // is computed at PLAN time from O(manifest-lines) metadata — the
  // same pyramid read [[SnapshotTable.statsAggCol]] serves by hand.

  private def singleName(e: org.apache.spark.sql.connector.expressions
      .Expression): Option[String] = e match {
    case nr: NamedReference if nr.fieldNames().length == 1 =>
      Some(nr.fieldNames()(0))
    case _ => None
  }

  /** Canonical stat value → the column type's EXTERNAL form (the Row
    * converter's input); the inverse of [[SnapshotTable]]'s canonOf.
    */
  private def externalOf(t: String, v: String, dt: DataType): Any =
    (t, dt) match {
      case ("l", ByteType) => java.lang.Byte.valueOf(v.toByte)
      case ("l", ShortType) => java.lang.Short.valueOf(v.toShort)
      case ("l", IntegerType) => java.lang.Integer.valueOf(v.toInt)
      case ("l", LongType) => java.lang.Long.valueOf(v.toLong)
      case ("d", FloatType) => java.lang.Float.valueOf(v.toDouble.toFloat)
      case ("d", DoubleType) => java.lang.Double.valueOf(v.toDouble)
      case ("dec", _) => new java.math.BigDecimal(v)
      case ("s", _) => v
      case ("dt", _) =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.toLong))
      case ("ts", _) =>
        val us = v.toLong
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
      case other => throw new IllegalStateException(
        s"stat tag/type mismatch $other")
    }

  private def planAgg(agg: Aggregation): Option[(StructType, Row)] = {
    if (pushed.nonEmpty || agg.groupByExpressions.nonEmpty) return None
    try {
      val v = version.orElse(SnapshotTable.latestVersion(path))
        .getOrElse(return None)
      if (SnapshotTable.deleteRefs(path, Some(v)).nonEmpty ||
        SnapshotTable.predDeleteRefs(path, Some(v)).nonEmpty) return None
      val cells = agg.aggregateExpressions.toIndexedSeq.map {
        case _: CountStar =>
          val (rows, _, _) = SnapshotTable.statsAgg(path, Some(v))
          Some((StructField("count(*)", LongType, nullable = false),
            java.lang.Long.valueOf(rows)))
        case m: Min => singleName(m.column).flatMap { c =>
          val dt = schema0.fields.find(_.name == c).map(_.dataType)
            .getOrElse(return None)
          SnapshotTable.statsAggCol(path, c, Some(v))._2.map {
            case (t, lo, _) => (StructField(s"min($c)", dt),
              externalOf(t, lo, dt))
          }
        }
        case m: Max => singleName(m.column).flatMap { c =>
          val dt = schema0.fields.find(_.name == c).map(_.dataType)
            .getOrElse(return None)
          SnapshotTable.statsAggCol(path, c, Some(v))._2.map {
            case (t, _, hi) => (StructField(s"max($c)", dt),
              externalOf(t, hi, dt))
          }
        }
        case _ => None // any other function: the ordinary scan answers
      }
      if (cells.exists(_.isEmpty)) None
      else Some((StructType(cells.map(_.get._1)),
        Row.fromSeq(cells.map(_.get._2))))
    } catch { case _: Exception => None } // empty/stat-less: decline
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    planAgg(agg).nonEmpty

  override def pushAggregation(agg: Aggregation): Boolean = {
    val planned = planAgg(agg)
    aggResult = planned
    planned.nonEmpty
  }

  override def build(): Scan = aggResult match {
    case Some((sc, row)) => new SnapshotAggScan(path, sc, row)
    case None => new SnapshotV1Scan(path, version, required, pushed)
  }
}

/** The metadata-answered aggregate as a one-row scan. */
private[sources] class SnapshotAggScan(path: String,
    aggSchema: StructType, row: Row) extends V1Scan {
  override def readSchema(): StructType = aggSchema
  override def description(): String =
    s"graft-snapshot $path PushedAggregates=[${aggSchema.fieldNames
      .mkString(", ")}] (metadata-only)"
  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = aggSchema
      override def buildScan(): RDD[Row] = {
        SnapshotTableSource.lastAggPushed = true
        SnapshotTableSource.lastPlanned = 0L
        context.sparkSession.sparkContext.parallelize(Seq(row), 1)
      }
    }.asInstanceOf[T]
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
        SnapshotTableSource.lastAggPushed = false
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
