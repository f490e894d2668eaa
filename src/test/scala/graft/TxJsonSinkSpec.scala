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

  test("versioned manifests: snapshot isolation and time travel across appends") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-txver").toString + "/t"
    def write(lo: Long, hi: Long): Unit =
      (lo to hi).map(i => (i, s"body-$i")).toDF("id", "body")
        .repartition(2)
        .write.format("graft.sources.TxJsonSink")
        .option("path", out).mode("append").save()

    write(1L, 50L)
    write(51L, 80L)

    // immutable per-version manifests plus the latest pointer
    val names = ls(out)
    assert(names.contains("_COMMIT-v1") && names.contains("_COMMIT-v2"), names)
    // every manifest (versioned and pointer) lands via tmp + ATOMIC_MOVE;
    // a leftover *.tmp would mean a torn write is reachable again
    assert(!names.exists(_.endsWith(".tmp")), names)
    val m1 = graft.sources.TxJsonSink.manifest(out, Some(1)).get
    val m2 = graft.sources.TxJsonSink.manifest(out, Some(2)).get
    val latest = graft.sources.TxJsonSink.manifest(out).get
    assert(m1.version == 1 && m1.totalRows == 50 && m1.files.size == 2)
    assert(m2.version == 2 && m2.totalRows == 80 && m2.files.size == 4)
    assert(latest.version == 2 && latest.totalRows == 80)
    // v2 inherits v1's files — a snapshot is the FULL visible file list
    assert(m1.files.toSet.subsetOf(m2.files.toSet))

    // time travel: v1 readers never see v2's rows
    assert(graft.sources.TxJsonSink.read(spark, out, Some(1)).count() == 50)
    assert(graft.sources.TxJsonSink.read(spark, out).count() == 80)
  }

  test("control characters in values round-trip intact") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-txesc").toString + "/t"
    // a raw newline would tear the line-JSON record across physical
    // lines (extra/corrupt rows on read); tab and CR are invalid JSON
    // unescaped; backslash+quote exercise the double-escape order
    val nasty = "line1\nline2\tmid\rend \\ \"quoted\" "
    Seq((1L, nasty), (2L, "plain")).toDF("id", "body").coalesce(1)
      .write.format("graft.sources.TxJsonSink")
      .option("path", out).mode("append").save()
    val back = graft.sources.TxJsonSink.read(spark, out)
    assert(back.count() == 2) // no torn records
    val got = back.filter(col("id") === "1")
      .select("body").collect()(0).getString(0)
    assert(got == nasty, s"round-trip mismatch: ${got.getBytes.toSeq}")
  }

  test("mode(overwrite) truncates snapshot-semantically") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-txtrunc").toString + "/t"
    def df(lo: Long, hi: Long) =
      (lo to hi).map(i => (i, s"b$i")).toDF("id", "body").coalesce(1)
    df(1, 50).write.format("graft.sources.TxJsonSink")
      .option("path", out).mode("append").save()
    df(51, 60).write.format("graft.sources.TxJsonSink")
      .option("path", out).mode("overwrite").save()
    // latest snapshot holds ONLY the overwrite's rows...
    assert(graft.sources.TxJsonSink.read(spark, out).count() == 10)
    val m2 = graft.sources.TxJsonSink.manifest(out).get
    assert(m2.version == 2 && m2.totalRows == 10 && m2.files.size == 1)
    // ...while the pre-overwrite snapshot stays time-travelable
    assert(graft.sources.TxJsonSink.read(spark, out, Some(1)).count() == 50)
  }

  test("vacuum drops expired snapshots and their unshared files only") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-txvac").toString + "/t"
    def write(lo: Long, hi: Long): Unit =
      (lo to hi).map(i => (i, s"b-$i")).toDF("id", "body").repartition(2)
        .write.format("graft.sources.TxJsonSink")
        .option("path", out).mode("append").save()
    write(1L, 30L); write(31L, 50L); write(51L, 60L)

    val (mDel, fDel) = graft.sources.TxJsonSink.vacuum(out, keepLast = 2)
    // v1's manifest goes; its FILES stay (v2 and v3 still reference
    // them — a snapshot inherits its ancestors' files)
    assert(mDel == 1 && fDel == 0, (mDel, fDel))
    assert(graft.sources.TxJsonSink.manifest(out, Some(1)).isEmpty)
    assert(graft.sources.TxJsonSink.read(spark, out, Some(2)).count() == 50)
    assert(graft.sources.TxJsonSink.read(spark, out).count() == 60)

    // a stray unreferenced part file (e.g. from a lost task after its
    // message was dropped) IS collected
    Files.writeString(new File(out, "part-v9-orphan.jsonl").toPath,
      """{"id":"999"}""")
    val (_, fDel2) = graft.sources.TxJsonSink.vacuum(out, keepLast = 2)
    assert(fDel2 == 1)
    assert(graft.sources.TxJsonSink.read(spark, out).count() == 60)
  }

  test("failed append leaves the previous snapshot fully readable") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-txprev").toString + "/t"
    (1L to 40L).map(i => (i, s"b-$i")).toDF("id", "body").repartition(2)
      .write.format("graft.sources.TxJsonSink")
      .option("path", out).mode("append").save()
    val boom = udf((i: Long) =>
      if (i == 60L) throw new RuntimeException("induced") else i)
    intercept[Exception] {
      (41L to 70L).map(i => (i, s"b-$i")).toDF("id", "body").repartition(2)
        .withColumn("id", boom(col("id")))
        .write.format("graft.sources.TxJsonSink")
        .option("path", out).mode("append").save()
    }
    val latest = graft.sources.TxJsonSink.manifest(out).get
    assert(latest.version == 1 && latest.totalRows == 40)
    assert(graft.sources.TxJsonSink.read(spark, out).count() == 40)
    // no half-published files from the failed batch
    assert(!ls(out).exists(_.startsWith("_tmp_")), ls(out))
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

  test("additive schema evolution: old reader sees old columns, new " +
      "reader nulls the gap") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-txevo").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "body").coalesce(1)
      .write.format("graft.sources.TxJsonSink")
      .option("path", out).mode("append").save()
    Seq((3L, "c", "en"), (4L, "d", "fr")).toDF("id", "body", "lang")
      .coalesce(1)
      .write.format("graft.sources.TxJsonSink")
      .option("path", out).mode("append").save()

    // the OLD reader (time travel to v1) sees exactly v1's columns —
    // a later column never bleeds backward into an old snapshot
    val v1 = graft.sources.TxJsonSink.read(spark, out, Some(1))
    assert(v1.columns.toSeq == Seq("id", "body"))
    assert(v1.count() == 2)

    // the latest reader sees the evolved schema with NULLs where v1
    // files predate the column, in manifest order
    val latest = graft.sources.TxJsonSink.read(spark, out)
    assert(latest.columns.toSeq == Seq("id", "body", "lang"))
    assert(latest.count() == 4)
    assert(latest.filter(col("lang").isNull).count() == 2)
    assert(latest.filter(col("lang").isNotNull)
      .select(col("id")).as[String].collect().toSet == Set("3", "4"))

    // a batch MISSING an old column is additive too: the column stays
    // in the schema and the new rows read as NULL for it
    Seq(Tuple1(5L)).toDF("id").coalesce(1)
      .write.format("graft.sources.TxJsonSink")
      .option("path", out).mode("append").save()
    val v3 = graft.sources.TxJsonSink.read(spark, out)
    assert(v3.columns.toSeq == Seq("id", "body", "lang"))
    assert(v3.filter(col("id") === "5").select(col("body"), col("lang"))
      .head.toSeq == Seq(null, null))

    // truncate starts the schema fresh; prior versions keep theirs
    Seq((9L, 1.5)).toDF("id", "score").coalesce(1)
      .write.format("graft.sources.TxJsonSink")
      .option("path", out).mode("overwrite").save()
    assert(graft.sources.TxJsonSink.read(spark, out).columns.toSeq ==
      Seq("id", "score"))
    assert(graft.sources.TxJsonSink.read(spark, out, Some(3))
      .columns.toSeq == Seq("id", "body", "lang"))
  }

  test("copy-on-write merge rewrites only matched files, carries the " +
      "rest by reference, and keeps old snapshots intact") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-txmerge").toString + "/t"
    // 4 files, ids clustered so matches hit a strict file subset
    (1L to 40L).map(i => (i, s"body-$i", (i - 1) / 10))
      .toDF("id", "body", "bucket").repartition(4, col("bucket"))
      .write.format("graft.sources.TxJsonSink")
      .option("path", out).mode("append").save()
    val v1Files = graft.sources.TxJsonSink.manifest(out).get.files
      .map(_._1).toSet
    assert(v1Files.size == 4)

    // update ids 1-5 (bucket 0 only) + insert 101-102
    val changes = (1L to 5L).map(i => (i, s"upd-$i", 0L)) ++
      Seq((101L, "new-101", 99L), (102L, "new-102", 99L))
    val mr = graft.sources.TxJsonSink.merge(spark, out,
      changes.toDF("id", "body", "bucket"), "id")
    assert(mr.filesReplaced >= 1 && mr.filesReplaced < 4, mr)
    assert(mr.filesCarried == 4 - mr.filesReplaced, mr)
    assert(mr.version == 2)

    // carried files appear in v2's manifest under their v1 names
    val v2 = graft.sources.TxJsonSink.manifest(out).get
    assert(v2.files.map(_._1).toSet.intersect(v1Files).size ==
      mr.filesCarried)

    // merged content: updates replaced, non-matches survived, inserts in
    val latest = graft.sources.TxJsonSink.read(spark, out)
    assert(latest.count() == 42)
    assert(latest.filter(col("id") === "3").select(col("body"))
      .head.getString(0) == "upd-3")
    assert(latest.filter(col("id") === "7").select(col("body"))
      .head.getString(0) == "body-7")
    assert(latest.filter(col("id") === "101").count() == 1)

    // the pre-merge snapshot is untouched (replaced files still on disk)
    val old = graft.sources.TxJsonSink.read(spark, out, Some(1))
    assert(old.count() == 40)
    assert(old.filter(col("id") === "3").select(col("body"))
      .head.getString(0) == "body-3")

    // no matches -> pure-insert merge: every file carried
    val mr2 = graft.sources.TxJsonSink.merge(spark, out,
      Seq((201L, "new-201", 99L)).toDF("id", "body", "bucket"), "id")
    assert(mr2.filesReplaced == 0, mr2)
    assert(graft.sources.TxJsonSink.read(spark, out).count() == 43)

    // schema evolution composes: a change batch with a NEW column
    val mr3 = graft.sources.TxJsonSink.merge(spark, out,
      Seq((201L, "upd-201", 99L, "en")).toDF("id", "body", "bucket",
        "lang"), "id")
    val evolved = graft.sources.TxJsonSink.read(spark, out)
    assert(evolved.columns.contains("lang"))
    assert(evolved.filter(col("id") === "201")
      .select(col("body"), col("lang")).head.toSeq == Seq("upd-201", "en"))
    assert(evolved.filter(col("id") === "3").select(col("lang"))
      .head.isNullAt(0))
    assert(mr3.version == 4)
  }

  test("merge rejects multiple change rows per key (standard MERGE " +
      "multiple-matches error)") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-txdup").toString + "/t"
    (1L to 10L).map(i => (i, s"body-$i")).toDF("id", "body")
      .write.format("graft.sources.TxJsonSink")
      .option("path", out).mode("append").save()
    val e = intercept[IllegalArgumentException] {
      graft.sources.TxJsonSink.merge(spark, out,
        Seq((3L, "a"), (3L, "b"), (4L, "c")).toDF("id", "body"), "id")
    }
    assert(e.getMessage.contains("multiple rows per matched key"))
    // the rejected merge committed nothing
    assert(graft.sources.TxJsonSink.manifest(out).get.version == 1)
    assert(graft.sources.TxJsonSink.read(spark, out).count() == 10)
  }

  test("merge accepts duplicate change keys that match NO target row " +
      "(multiple NOT-MATCHED inserts are legal MERGE)") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-txdupins").toString + "/t"
    (1L to 10L).map(i => (i, s"body-$i")).toDF("id", "body")
      .write.format("graft.sources.TxJsonSink")
      .option("path", out).mode("append").save()
    // 77 appears twice but matches nothing -> both rows insert; the
    // matched key 4 updates normally in the same commit
    val mr = graft.sources.TxJsonSink.merge(spark, out,
      Seq((77L, "ins-a"), (77L, "ins-b"), (4L, "upd-4"))
        .toDF("id", "body"), "id")
    assert(mr.version == 2)
    val latest = graft.sources.TxJsonSink.read(spark, out)
    assert(latest.count() == 12)
    assert(latest.filter(col("id") === "77").count() == 2)
    assert(latest.filter(col("id") === "4").select(col("body"))
      .head.getString(0) == "upd-4")
    // once duplicated in the TARGET, a later change matching that key
    // is a multiple-target-match and still rejects
    val e = intercept[IllegalArgumentException] {
      graft.sources.TxJsonSink.merge(spark, out,
        Seq((77L, "x"), (77L, "y")).toDF("id", "body"), "id")
    }
    assert(e.getMessage.contains("multiple rows per matched key"))
  }

  test("merge DELETE arm drops matched rows from the latest view only; " +
      "history keeps them until vacuum") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-txdel").toString + "/t"
    (1L to 40L).map(i => (i, s"body-$i", (i - 1) / 10))
      .toDF("id", "body", "bucket").repartition(4, col("bucket"))
      .write.format("graft.sources.TxJsonSink")
      .option("path", out).mode("append").save()

    // one commit: update 1-2, insert 101, DELETE 3-5 and 11
    val mr = graft.sources.TxJsonSink.merge(spark, out,
      Seq((1L, "upd-1", 0L), (2L, "upd-2", 0L), (101L, "new-101", 99L))
        .toDF("id", "body", "bucket"), "id",
      deletes = Some(Seq(3L, 4L, 5L, 11L, 999L).toDF("id")))
    // the touched buckets' files rewritten, the rest carried (hash
    // partitioning may co-locate buckets, so pin subset-ness, not the
    // exact split); deleting the absent 999 is a WHEN MATCHED no-op
    assert(mr.filesReplaced >= 1 && mr.filesCarried >= 1 &&
      mr.filesReplaced + mr.filesCarried == 4, mr)

    val latest = graft.sources.TxJsonSink.read(spark, out)
    assert(latest.count() == 40 - 4 + 1)
    assert(latest.filter(col("id").isin("3", "4", "5", "11")).count() == 0)
    assert(latest.filter(col("id") === "1").select(col("body"))
      .head.getString(0) == "upd-1")
    assert(latest.filter(col("id") === "7").select(col("body"))
      .head.getString(0) == "body-7")

    // delete-then-travel: v1 still reads every deleted row bit-identically
    val old = graft.sources.TxJsonSink.read(spark, out, Some(1))
    assert(old.count() == 40)
    assert(old.filter(col("id") === "3").select(col("body"))
      .head.getString(0) == "body-3")

    // a key in BOTH arms is order-dependent -> rejected, nothing commits
    val e = intercept[IllegalArgumentException] {
      graft.sources.TxJsonSink.merge(spark, out,
        Seq((7L, "x", 0L)).toDF("id", "body", "bucket"), "id",
        deletes = Some(Seq(7L).toDF("id")))
    }
    assert(e.getMessage.contains("both changes and deletes"))
    assert(graft.sources.TxJsonSink.manifest(out).get.version == 2)

    // vacuum to the latest snapshot reclaims the rewritten files and
    // ends the deleted rows' travelability — the documented retention
    // trade
    val (mDel, fDel) = graft.sources.TxJsonSink.vacuum(out, keepLast = 1)
    assert(mDel == 1 && fDel == mr.filesReplaced, (mDel, fDel))
    assert(graft.sources.TxJsonSink.read(spark, out).count() == 37)
  }

  test("unescape tolerates truncated and non-hex \\u escapes") {
    import graft.sources.TxJsonSink
    // valid escape decodes
    assert(TxJsonSink.unescape("a\\u0041b") == "aAb")
    // truncated at end-of-string: literal fallback, no exception
    assert(TxJsonSink.unescape("a\\u00") == "au00")
    assert(TxJsonSink.unescape("a\\u") == "au")
    // non-hex body: literal fallback, no exception
    assert(TxJsonSink.unescape("a\\uzzzzb") == "auzzzzb")
    // a valid escape right at the end still decodes
    assert(TxJsonSink.unescape("x\\u0041") == "xA")
  }
}
