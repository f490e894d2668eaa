package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 TRANSACTIONAL sink — the write-side counterpart of
  * [[PagedApiSource]], and the scale form of the reference's
  * write-then-commit protocol (raw JSON written first, the state-DB
  * insert only after success: resources/gmail_functions.py:118-126 —
  * commit order is what makes its daily batch idempotent).
  *
  * Protocol (the standard two-phase DSv2 contract):
  *  - each task writes its rows to an invisible `_tmp_` file and returns
  *    the (path, rowCount) as its [[WriterCommitMessage]];
  *  - the DRIVER commits: renames every temp file into place and then —
  *    last, atomically — writes a `_COMMIT` manifest with the file list
  *    and total row count. Readers treat the manifest as the source of
  *    truth, so a job that dies mid-write leaves NO visible data;
  *  - on job abort the temp files are deleted; nothing becomes visible.
  *
  * Rows are written as line-JSON of the row's string rendering — the
  * payload format is deliberately minimal: the point of this connector
  * is the COMMIT PROTOCOL surface (tasks -> messages -> driver commit /
  * abort), which is what a real warehouse sink (Iceberg/Delta-style)
  * builds on.
  *
  * Usage:
  * {{{
  *   df.write.format("graft.sources.TxJsonSink")
  *     .option("path", dir).mode("append").save()
  * }}}
  */
class TxJsonSink extends TableProvider {
  // sink-only: the schema is whatever the written DataFrame carries —
  // declaring external metadata makes Spark pass it into getTable
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TxJsonTable(schema)
}

private[sources] class TxJsonTable(schema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = "tx_json_sink"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new TxJsonBatchWrite(info.options.get("path"), info.schema())
      }
    }
}

private[sources] case class TxFileCommit(tmpPath: String, rows: Long)
    extends WriterCommitMessage

private[sources] class TxJsonBatchWrite(path: String, schema: StructType)
    extends BatchWrite {
  require(path != null, "TxJsonSink requires a 'path' option")

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new TxJsonWriterFactory(path, schema)

  /** Driver-side commit: publish every task file, THEN the manifest. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    val entries = messages.toIndexedSeq.collect {
      case TxFileCommit(tmp, rows) =>
        val visible = tmp.replace("_tmp_", "part-")
        Files.move(Paths.get(tmp), Paths.get(visible),
          StandardCopyOption.ATOMIC_MOVE)
        (Paths.get(visible).getFileName.toString, rows)
    }
    val manifest =
      (entries.map { case (f, n) => s"""{"file":"$f","rows":$n}""" } :+
        s"""{"total_rows":${entries.map(_._2).sum}}""").mkString("\n")
    val tmpManifest = dir.resolve("_COMMIT.tmp")
    Files.write(tmpManifest, manifest.getBytes(StandardCharsets.UTF_8))
    Files.move(tmpManifest, dir.resolve("_COMMIT"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.toIndexedSeq.foreach {
      case TxFileCommit(tmp, _) => Files.deleteIfExists(Paths.get(tmp))
      case _ => ()
    }
}

private[sources] class TxJsonWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new TxJsonDataWriter(path, schema, partitionId, taskId)
}

private[sources] class TxJsonDataWriter(path: String, schema: StructType,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {
  private val dir = new File(path)
  dir.mkdirs()
  private val tmp = new File(dir, s"_tmp_$partitionId-$taskId.jsonl")
  private val out = new java.io.PrintWriter(tmp, "UTF-8")
  private var rows = 0L

  override def write(record: InternalRow): Unit = {
    val fields = schema.fields.indices.map { i =>
      val v = record.get(i, schema.fields(i).dataType)
      val s = if (v == null) "null"
        else "\"" + v.toString.replace("\\", "\\\\")
          .replace("\"", "\\\"") + "\""
      s""""${schema.fields(i).name}":$s"""
    }
    out.println(fields.mkString("{", ",", "}"))
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    TxFileCommit(tmp.getAbsolutePath, rows)
  }

  override def abort(): Unit = {
    out.close()
    tmp.delete()
  }

  override def close(): Unit = out.close()
}
