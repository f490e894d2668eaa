package graft

import java.io.File
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Transactional DSv2 sink (sources.TxJsonSink): the write-then-commit
  * protocol asserted at the file level — visible data exists iff the
  * job committed.
  */
class TxJsonSinkSpec extends SparkSpec {

  private def ls(dir: String): Seq[String] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .map(_.getName).toIndexedSeq

  test("committed write publishes part files plus a _COMMIT manifest") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-txsink").toString + "/t"
    val df = (1L to 100L).map(i => (i, s"body-$i")).toDF("id", "body")
      .repartition(4)
    df.write.format("graft.sources.TxJsonSink")
      .option("path", out).mode("append").save()

    val names = ls(out)
    assert(names.contains("_COMMIT"), names)
    assert(names.count(_.startsWith("part-")) == 4, names)
    assert(!names.exists(_.startsWith("_tmp_")), names)

    val manifest = new String(Files.readAllBytes(
      new File(out, "_COMMIT").toPath))
    assert(manifest.contains("\"total_rows\":100"), manifest)

    // data round-trips through Spark's own json reader
    val back = spark.read.json(
      names.filter(_.startsWith("part-")).map(n => s"$out/$n"): _*)
    assert(back.count() == 100)
    assert(back.filter(col("id") === "7").count() == 1)
  }

  test("failed write leaves NO visible data and no manifest") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-txfail").toString + "/t"
    val boom = udf((i: Long) =>
      if (i == 99L) throw new RuntimeException("induced") else i)
    val df = (1L to 100L).map(i => (i, s"body-$i")).toDF("id", "body")
      .repartition(4)
      .withColumn("id", boom(col("id")))
    intercept[Exception] {
      df.write.format("graft.sources.TxJsonSink")
        .option("path", out).mode("append").save()
    }
    val names = ls(out)
    assert(!names.contains("_COMMIT"), names)
    assert(!names.exists(_.startsWith("part-")), names)
  }
}
