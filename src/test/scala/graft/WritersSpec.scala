package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Writers

/** Sink-side layout control (Writers): bounded files per partition dir,
  * within-file ordering, and compaction — asserted on the actual file
  * layout the write produced, not just the data.
  */
class WritersSpec extends SparkSpec {

  private def partFiles(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).getOrElse(Array.empty).toIndexedSeq
      .filter(f => f.getName.endsWith(".parquet") && f.isFile)

  test("writePartitioned bounds files per partition dir and round-trips") {
    val d = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("graft-write").toString
    val events = Tables.events(spark, d)
    // worst-case input layout: many tasks, every partition value in each
    val fragmented = events.repartition(16)
    Writers.writePartitioned(fragmented, out, Seq("event_type"),
      filesPerDir = 2, sortCols = Seq("user_id"))

    val dirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("event_type="))
    assert(dirs.nonEmpty)
    dirs.foreach { dir =>
      val n = partFiles(dir).size
      assert(n >= 1 && n <= 2, s"${dir.getName} has $n files")
    }

    val back = spark.read.parquet(out)
    assert(back.count() == events.count())
    // same multiset of (event_id) — layout changed, data didn't
    assert(back.agg(sum(col("event_id"))).head.getLong(0) ==
      events.agg(sum(col("event_id"))).head.getLong(0))

    // within-file ordering: each file is sorted by user_id, so per-file
    // min/max footers are tight and a user_id filter prunes files
    val files = dirs.flatMap(partFiles)
    files.foreach { f =>
      val ids = spark.read.parquet(f.getAbsolutePath)
        .select("user_id").collect().map(_.getLong(0)).toIndexedSeq
      assert(ids == ids.sorted, s"${f.getName} not sorted by user_id")
    }
  }

  test("compact merges a fragmented layout to the target file count") {
    val d = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("graft-compact").toString + "/t"
    val events = Tables.events(spark, d) // 1000 rows
    events.repartition(50).write.parquet(out)
    assert(spark.read.parquet(out).inputFiles.length == 50)

    val (rows, before) = Writers.compact(spark, out, targetRowsPerFile = 400)
    assert(rows == 1000 && before == 50)
    val after = spark.read.parquet(out)
    assert(after.inputFiles.length == 3) // ceil(1000/400)
    assert(after.count() == 1000)
  }
}
