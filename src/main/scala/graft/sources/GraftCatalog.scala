package graft.sources

import java.nio.file.{Files, Paths}
import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SNAPSHOT TABLES BY NAME — the `TableCatalog` that gives SQL DML a
  * table to target: register it once per session and every
  * [[SnapshotTable]] under the base directory is addressable as
  * `graft.<ns...>.<table>`:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft",
  *     "graft.sources.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.base", "/data/tables")
  *
  *   spark.sql("INSERT INTO graft.sales.orders SELECT ...")
  *   spark.sql("DELETE FROM graft.sales.orders WHERE odate <= '...'")
  *   spark.sql("SELECT * FROM graft.sales.orders WHERE price > 5")
  * }}}
  *
  * Identifier → path mapping is the whole catalog state: namespace
  * segments are directories under `base`, the table name is the leaf
  * directory, and a NAME that is itself an absolute path (quoted:
  * ``graft.`/abs/path/t` ``) bypasses `base` — so ad-hoc tables stay
  * reachable without registration. There is no extra metastore: a
  * table EXISTS iff its directory holds a committed snapshot (the
  * `_log/LATEST` pointer), exactly the source of truth every other
  * read path uses, so catalog and direct-path access can never
  * disagree. All resolved tables are [[SnapshotV2Table]]s: reads get
  * the full pushdown pyramid, writes the claim/nonce append commit,
  * deletes the MOR tombstone routing.
  *
  * `createTable` commits an EMPTY v1 carrying the declared schema —
  * the table format has no tableless schema slot, and an empty first
  * commit makes `INSERT INTO` work immediately while keeping "a
  * snapshot exists" as the single existence test. Partition transforms
  * in CREATE TABLE are rejected (partitioned ingest is the
  * [[SnapshotTable.commitAppendPartitioned]] API; a SQL-declared spec
  * would silently diverge from the recorded `part.json` contract).
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var base: Option[String] = None

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    base = Option(options.get("base"))
  }

  override def name(): String = catalogName

  private def pathOf(ident: Identifier): String =
    if (ident.name().startsWith("/")) ident.name()
    else base match {
      case Some(b) =>
        ((b +: ident.namespace().toIndexedSeq) :+ ident.name())
          .mkString("/")
      case None => throw new NoSuchTableException(ident)
    }

  private def exists(path: String): Boolean =
    SnapshotTable.latestVersion(path).nonEmpty

  override def tableExists(ident: Identifier): Boolean =
    exists(pathOf(ident))

  override def loadTable(ident: Identifier): Table = {
    val p = pathOf(ident)
    if (!exists(p)) throw new NoSuchTableException(ident)
    new SnapshotV2Table(p, None, SnapshotTableSource.schemaOf(p, None))
  }

  /** `VERSION AS OF <v>` — SQL time travel by snapshot version: the
    * resolved table reads that version's manifests bit for bit (and
    * refuses writes/deletes, like every versionAsOf table).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val p = pathOf(ident)
    if (!exists(p)) throw new NoSuchTableException(ident)
    val v =
      try version.toInt
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            "graft-catalog: VERSION AS OF takes the integer snapshot " +
              s"version, got '$version'")
      }
    new SnapshotV2Table(p, Some(v),
      SnapshotTableSource.schemaOf(p, Some(v)))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    base match {
      case None => Array.empty
      case Some(b) =>
        val dir = Paths.get((b +: namespace.toIndexedSeq).mkString("/"))
        if (!Files.isDirectory(dir))
          throw new NoSuchNamespaceException(namespace)
        val st = Files.list(dir)
        try st.iterator().asScala
          .filter(p => Files.isDirectory(p) &&
            exists(p.toString))
          .map(p => Identifier.of(namespace, p.getFileName.toString))
          .toArray
        finally st.close()
    }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft-catalog: SQL-declared partition transforms are not " +
        "supported — use SnapshotTable.commitAppendPartitioned")
    val p = pathOf(ident)
    if (exists(p)) throw new TableAlreadyExistsException(ident)
    val spark = org.apache.spark.sql.SparkSession.active
    val zcol = Option(properties.get("zcol")).getOrElse(
      schema.fields.find(f => SnapshotTable.colTag(f.dataType).nonEmpty)
        .map(_.name).getOrElse(throw new IllegalArgumentException(
          "graft-catalog: CREATE TABLE needs at least one " +
            "stat-carrying column to cluster on")))
    // an empty v1 with the declared schema: existence and schema land
    // through the SAME commit path every later write uses
    val empty = spark.createDataFrame(
      new util.ArrayList[org.apache.spark.sql.Row](), schema)
    SnapshotTable.commitAppend(empty, p, zcol, 1)
    new SnapshotV2Table(p, None, schema)
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft-catalog: ALTER TABLE is not supported — schema evolution " +
        "rides the append commits (writeMergedSchema)")

  override def dropTable(ident: Identifier): Boolean = {
    val p = Paths.get(pathOf(ident))
    if (!exists(p.toString)) false
    else {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(p.toFile)
      true
    }
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    val from = Paths.get(pathOf(oldIdent))
    val to = Paths.get(pathOf(newIdent))
    if (!exists(from.toString)) throw new NoSuchTableException(oldIdent)
    if (exists(to.toString))
      throw new TableAlreadyExistsException(newIdent)
    Files.createDirectories(to.getParent)
    Files.move(from, to)
  }

  // ---- namespaces = directories under base ---------------------------

  override def listNamespaces(): Array[Array[String]] = base match {
    case None => Array.empty
    case Some(b) =>
      val dir = Paths.get(b)
      if (!Files.isDirectory(dir)) Array.empty
      else {
        val st = Files.list(dir)
        try st.iterator().asScala
          .filter(p => Files.isDirectory(p) && !exists(p.toString))
          .map(p => Array(p.getFileName.toString)).toArray
        finally st.close()
      }
  }

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces() else Array.empty

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || base.exists(b =>
      Files.isDirectory(Paths.get((b +: namespace.toIndexedSeq)
        .mkString("/"))))

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] =
    if (namespaceExists(namespace)) new util.HashMap[String, String]()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = base match {
    case Some(b) => Files.createDirectories(
      Paths.get((b +: namespace.toIndexedSeq).mkString("/")))
    case None => throw new UnsupportedOperationException(
      "graft-catalog: set spark.sql.catalog.<name>.base to create " +
        "namespaces")
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft-catalog: namespace metadata is not supported")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = base match {
    case Some(b) if namespace.nonEmpty =>
      val dir = Paths.get((b +: namespace.toIndexedSeq).mkString("/"))
      if (!Files.isDirectory(dir)) false
      else {
        val st = Files.list(dir)
        val empty = try !st.iterator().hasNext finally st.close()
        require(empty || cascade,
          s"namespace ${namespace.mkString(".")} is not empty")
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete()
        }
        rm(dir.toFile)
        true
      }
    case _ => false
  }
}
