package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** The unified snapshot table (commit log + zone-map skipping in one
  * format): snapshot isolation, time travel, pruned reads at any
  * version, copy-on-write delete, vacuum retention, and the
  * pointer-swing crash window.
  */
class SnapshotTableSpec extends SparkSpec {

  import spark.implicits._

  private def rows(r: Range) =
    r.map(i => (i.toLong, i.toDouble, s"p${i % 7}")).toDF("id", "z", "tag")

  test("append commits are snapshot-isolated and time travel reads " +
      "each version bit for bit") {
    val t = Files.createTempDirectory("graft-snap").toString + "/t"
    assert(SnapshotTable.commitAppend(rows(0 until 500), t, "z", 4) == 1)
    val v1Sum = SnapshotTable.read(spark, t)
      .agg(sum(col("id"))).head.getLong(0)
    assert(SnapshotTable.commitAppend(rows(500 until 900), t, "z", 3) == 2)
    assert(SnapshotTable.read(spark, t).count() == 900)
    // v1 is unchanged by the later commit
    assert(SnapshotTable.read(spark, t, Some(1)).count() == 500)
    assert(SnapshotTable.read(spark, t, Some(1))
      .agg(sum(col("id"))).head.getLong(0) == v1Sum)
  }

  test("pruned reads descend the manifest pyramid soundly at every " +
      "version") {
    val t = Files.createTempDirectory("graft-snapp").toString + "/t"
    SnapshotTable.commitAppend(rows(0 until 1000), t, "z", 8)
    SnapshotTable.commitAppend(rows(1000 until 1500), t, "z", 4)
    for (v <- Seq(None, Some(1), Some(2));
         (lo, hi) <- Seq((0.0, 120.0), (450.0, 700.0), (1100.0, 1200.0),
           (5000.0, 9000.0), (-10.0, 20000.0))) {
      val (cand, read, total) =
        SnapshotTable.readPruned(spark, t, lo, hi, v)
      val full = SnapshotTable.read(spark, t, v)
      assert(cand.filter(col("z").between(lo, hi)).count() ==
        full.filter(col("z").between(lo, hi)).count(),
        s"unsound skip v=$v [$lo,$hi]")
      assert(read <= total)
    }
    // a v1-era probe on a range only v2 covers reads zero files at v1
    val (_, r1, _) = SnapshotTable.readPruned(spark, t, 1100, 1200, Some(1))
    assert(r1 == 0)
    // and a strict subset at v2
    val (_, r2, tot2) = SnapshotTable.readPruned(spark, t, 1100, 1200)
    assert(r2 > 0 && r2 < tot2)
  }

  test("copy-on-write delete: the new version loses exactly the keys, " +
      "old versions stay intact, untouched manifests carry by reference") {
    val t = Files.createTempDirectory("graft-snapd").toString + "/t"
    SnapshotTable.commitAppend(rows(0 until 600), t, "z", 4)
    SnapshotTable.commitAppend(rows(600 until 1000), t, "z", 4)
    // keys living only in v2's range: v1's manifest must survive
    // untouched (by-reference carry), v2's gets rewritten
    val (deleted, v) = SnapshotTable.commitDelete(spark, t, "id",
      (700L until 750L).toDF("id"), "z")
    assert(deleted == 50 && v == 3)
    val latest = SnapshotTable.read(spark, t)
    assert(latest.count() == 950)
    assert(latest.filter(col("id").between(700, 749)).count() == 0)
    assert(SnapshotTable.read(spark, t, Some(2)).count() == 1000)
    assert(SnapshotTable.read(spark, t, Some(2))
      .filter(col("id").between(700, 749)).count() == 50)
    val refs3 = SnapshotTable.snapshot(t, Some(3)).map(_.name)
    assert(refs3.contains("m-1.json"),
      s"v1's untouched manifest should carry by reference: $refs3")
    assert(!refs3.contains("m-2.json"),
      s"v2's touched manifest must not carry unrewritten: $refs3")
    // deleting keys that match nothing is a no-op commit
    val (d0, v0) = SnapshotTable.commitDelete(spark, t, "id",
      Seq(999999L).toDF("id"), "z")
    assert(d0 == 0 && v0 == 3)
    // pruning stays strict after the delete
    val (cand, read, total) = SnapshotTable.readPruned(spark, t, 100, 200)
    assert(read > 0 && read < total)
    assert(cand.filter(col("z").between(100, 200)).count() == 101)
  }

  test("vacuum reclaims unreferenced versions; retained reads are " +
      "unaffected") {
    val t = Files.createTempDirectory("graft-snapv").toString + "/t"
    SnapshotTable.commitAppend(rows(0 until 300), t, "z", 3)
    SnapshotTable.commitAppend(rows(300 until 500), t, "z", 2)
    val (deleted, _) = SnapshotTable.commitDelete(spark, t, "id",
      (0L until 300L by 2).toDF("id"), "z")
    assert(deleted == 150)
    // keepLast=2 retains v2+v3; v1's files are still referenced BY v2
    // (the COW carry), so only the v1 snapshot entry goes — no data
    // file may be reclaimed while any retained snapshot lists it
    val (sDel2, fDel2) = SnapshotTable.vacuum(t, keepLast = 2)
    assert(sDel2 == 1 && fDel2 == 0, s"vacuum removed ($sDel2, $fDel2)")
    assert(SnapshotTable.read(spark, t, Some(2)).count() == 500)
    // keepLast=1 retains only v3: the files the delete replaced are now
    // unreferenced and reclaimed; v2 stops being time-travelable
    val (sDel1, fDel1) = SnapshotTable.vacuum(t, keepLast = 1)
    assert(sDel1 == 1 && fDel1 > 0, s"vacuum removed ($sDel1, $fDel1)")
    assert(SnapshotTable.read(spark, t, Some(3)).count() == 350)
    intercept[IllegalArgumentException] {
      SnapshotTable.read(spark, t, Some(2))
    }
    intercept[IllegalArgumentException] {
      SnapshotTable.read(spark, t, Some(1))
    }
    // pruning still sound on the survivors
    val (cand, _, _) = SnapshotTable.readPruned(spark, t, 0, 100)
    assert(cand.filter(col("z").between(0, 100)).count() ==
      SnapshotTable.read(spark, t).filter(col("z").between(0, 100))
        .count())
  }

  test("commitMerge upserts copy-on-write: matched keys replaced, new " +
      "keys inserted, untouched manifests carried, history intact") {
    import spark.implicits._
    val t = Files.createTempDirectory("graft-snapmg").toString + "/t"
    SnapshotTable.commitAppend(rows(0 until 500), t, "z", 4)
    SnapshotTable.commitAppend(rows(500 until 900), t, "z", 4)
    // updates hit only v2's key range; inserts are brand-new keys
    val changes = (700 until 720).map(i =>
        (i.toLong, i * 10.0, "upd")) ++
      (5000 until 5010).map(i => (i.toLong, i.toDouble, "ins"))
    val (replaced, carried, v) = SnapshotTable.commitMerge(spark, t,
      changes.toDF("id", "z", "tag"), "id", "z")
    assert(v == 3 && replaced > 0 && carried > 0)
    val refs3 = SnapshotTable.snapshot(t, Some(3)).map(_.name)
    assert(refs3.contains("m-1.json"),
      s"v1's untouched manifest should carry by reference: $refs3")
    val latest = SnapshotTable.read(spark, t)
    assert(latest.count() == 910)
    // matched rows really replaced (z rewritten), inserts present
    assert(latest.filter(col("id") === 705L).head.getDouble(1) == 7050.0)
    assert(latest.filter(col("tag") === "upd").count() == 20)
    assert(latest.filter(col("tag") === "ins").count() == 10)
    // the pre-merge version still reads the ORIGINAL values
    val pre = SnapshotTable.read(spark, t, Some(2))
    assert(pre.count() == 900)
    assert(pre.filter(col("id") === 705L).head.getDouble(1) == 705.0)
    // multiple change rows per MATCHED key are rejected
    val dup = Seq((700L, 1.0, "a"), (700L, 2.0, "b")).toDF("id", "z", "tag")
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.commitMerge(spark, t, dup, "id", "z")
    }
    assert(e.getMessage.contains("multiple rows per matched key"))
    // pruning stays strict and sound over the merged layout
    val (cand, read, total) = SnapshotTable.readPruned(spark, t, 0, 300)
    assert(read > 0 && read < total)
    assert(cand.filter(col("z").between(0, 300)).count() ==
      latest.filter(col("z").between(0, 300)).count())
  }

  test("commitAppendOnce is exactly-once across both replay windows") {
    val t = Files.createTempDirectory("graft-snapso").toString + "/t"
    // batch 0 commits; a replay of the SAME batch id (crash after the
    // pointer swing) must short-circuit without a new version
    assert(SnapshotTable.commitAppendOnce(rows(0 until 300), t, "z", 3, 0L))
    assert(!SnapshotTable.commitAppendOnce(rows(0 until 300), t, "z", 3, 0L))
    assert(SnapshotTable.latestVersion(t).contains(1))
    assert(SnapshotTable.read(spark, t).count() == 300)
    // crash BEFORE the swing: a dead attempt left v2 orphans (data +
    // manifest + snapshot, no pointer) — the retry sweeps them and
    // commits the real batch exactly once
    rows(900 until 920).coalesce(1).write.mode("overwrite")
      .parquet(s"$t/_log/_stage_dead")
    val dead = Files.list(Paths.get(s"$t/_log/_stage_dead")).iterator()
    val part = Iterator.continually(dead).flatMap(p =>
      if (p.hasNext) Some(p.next()) else None)
      .find(_.getFileName.toString.startsWith("part-")).get
    Files.move(part, Paths.get(t, "v2-p00000.parquet"))
    Files.write(Paths.get(s"$t/_log/m-2.json"),
      """{"file":"v2-p00000.parquet","z_min":900.0,"z_max":919.0,"rows":20}"""
        .getBytes("UTF-8"))
    assert(SnapshotTable.commitAppendOnce(rows(300 until 500), t, "z", 2, 1L))
    assert(SnapshotTable.latestVersion(t).contains(2))
    val got = SnapshotTable.read(spark, t)
    assert(got.count() == 500)
    assert(got.filter(col("id") >= 900).count() == 0,
      "dead attempt's orphan rows leaked into the committed snapshot")
    // a NON-batch commit after the stream keeps its own provenance and
    // never collides with a batch id
    SnapshotTable.commitAppend(rows(500 until 550), t, "z", 1)
    assert(SnapshotTable.commitAppendOnce(rows(550 until 560), t, "z", 1, 1L),
      "a -1-provenance commit must not shadow batch id 1")
  }

  test("compactCommit merges the fragmented layout as a new version; " +
      "the pre-compact version still reads the original files") {
    val t = Files.createTempDirectory("graft-snapcp").toString + "/t"
    // five tiny per-batch commits fragment the layout
    for (b <- 0 until 5)
      SnapshotTable.commitAppendOnce(
        rows(b * 100 until (b + 1) * 100), t, "z", 3, b.toLong)
    val vPre = SnapshotTable.latestVersion(t).get
    val preFiles = SnapshotTable.snapshot(t, Some(vPre)).map(_.files).sum
    val (before, after, v) =
      SnapshotTable.compactCommit(spark, t, "z", 200L)
    assert(before == preFiles && after < before && v == vPre + 1,
      s"compact $before -> $after at v$v")
    // same rows, fresh layout
    val latest = SnapshotTable.read(spark, t)
    assert(latest.count() == 500)
    assert(latest.agg(sum(col("id"))).head.getLong(0) ==
      (0L until 500L).sum)
    assert(latest.inputFiles.length == after)
    // the pre-compact version is untouched
    assert(SnapshotTable.read(spark, t, Some(vPre)).count() == 500)
    // pruning stays strict over the compacted layout
    val (cand, read, total) = SnapshotTable.readPruned(spark, t, 100, 180)
    assert(read > 0 && read < total)
    assert(cand.filter(col("z").between(100, 180)).count() == 81)
    // vacuum to the compacted version reclaims every pre-compact file
    val (sDel, fDel) = SnapshotTable.vacuum(t, keepLast = 1)
    assert(sDel == vPre && fDel == preFiles, s"vacuum ($sDel, $fDel)")
    assert(SnapshotTable.read(spark, t).count() == 500)
  }

  test("a commit that dies before the pointer swing is invisible and " +
      "swept by the retry") {
    val t = Files.createTempDirectory("graft-snapc").toString + "/t"
    SnapshotTable.commitAppend(rows(0 until 200), t, "z", 2)
    // simulate the dead attempt: v2 data + manifest + snapshot written,
    // pointer NEVER swung — readers must still see v1
    rows(200 until 260).coalesce(1).write.mode("overwrite")
      .parquet(s"$t/_log/_stage2")
    val part = Files.list(Paths.get(s"$t/_log/_stage2")).iterator()
    val first = Iterator.continually(part).flatMap(p =>
      if (p.hasNext) Some(p.next()) else None)
      .find(_.getFileName.toString.startsWith("part-")).get
    Files.move(first, Paths.get(t, "v2-p00000.parquet"))
    Files.write(Paths.get(s"$t/_log/m-2.json"),
      """{"file":"v2-p00000.parquet","z_min":200.0,"z_max":259.0,"rows":60}"""
        .getBytes("UTF-8"))
    Files.write(Paths.get(s"$t/_log/v2"),
      """{"manifest":"m-2.json","z_min":200.0,"z_max":259.0,"files":1,"rows":60}"""
        .getBytes("UTF-8"))
    assert(SnapshotTable.latestVersion(t).contains(1))
    assert(SnapshotTable.read(spark, t).count() == 200)
    // the retry sweeps the orphans and commits the REAL batch
    assert(SnapshotTable.commitAppend(rows(200 until 300), t, "z", 2) == 2)
    assert(SnapshotTable.read(spark, t).count() == 300)
    assert(SnapshotTable.read(spark, t)
      .filter(col("id").between(200, 259)).count() == 60)
  }
}
