package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** SQL DML over snapshot tables: the [[graft.sources.GraftCatalog]]
  * (tables by name, existence = the committed pointer), the DSv2 write
  * path (V1Write → commitAppend), and SupportsDelete's tombstone
  * routing — plus the IN/OR pushdown shapes of the Catalyst read path.
  */
class GraftSqlSpec extends SparkSpec {

  import spark.implicits._

  private def rows(r: Range) =
    r.map(i => (i.toLong, i.toDouble, s"p${i % 7}")).toDF("id", "z", "tag")

  test("catalog lifecycle: CREATE, INSERT INTO, pushed SELECT, DELETE " +
      "(predicate + IN), RENAME, DROP — one commit path throughout") {
    val base = Files.createTempDirectory("graft-cat").toString
    spark.conf.set("spark.sql.catalog.gt", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gt.base", base)
    spark.sql("CREATE NAMESPACE gt.ns")
    spark.sql("CREATE TABLE gt.ns.t (id BIGINT, z DOUBLE, tag STRING)")
    // CREATE commits an empty v1: the table exists and reads empty
    assert(spark.sql("SELECT * FROM gt.ns.t").count() == 0)
    spark.sql("INSERT INTO gt.ns.t SELECT id, CAST(id AS DOUBLE) AS z, " +
      "concat('p', CAST(id % 7 AS STRING)) AS tag FROM range(1000)")
    assert(spark.sql("SELECT count(*) FROM gt.ns.t").head.getLong(0)
      == 1000)
    assert(spark.sql(
        "SELECT sum(id) FROM gt.ns.t WHERE z >= 100 AND z <= 199")
      .head.getLong(0) == (100L to 199L).sum)
    // range DELETE = metadata-only predicate tombstone
    spark.sql("DELETE FROM gt.ns.t WHERE z <= 99")
    assert(spark.sql("SELECT count(*) FROM gt.ns.t").head.getLong(0)
      == 900)
    // IN DELETE = equality tombstone, composing with the live predicate
    spark.sql("DELETE FROM gt.ns.t WHERE id IN (100, 101)")
    assert(spark.sql("SELECT count(*) FROM gt.ns.t").head.getLong(0)
      == 898)
    // the catalog is a NAME layer: the direct path sees the same table,
    // and time travel still reads the pre-delete version in full —
    // both by API and by SQL `VERSION AS OF`
    val path = s"$base/ns/t"
    assert(SnapshotTable.read(spark, path, Some(2)).count() == 1000)
    assert(spark.sql("SELECT count(*) FROM gt.ns.t VERSION AS OF 2")
      .head.getLong(0) == 1000)
    // an inexact delete shape refuses loudly, table unchanged
    intercept[Exception] {
      spark.sql("DELETE FROM gt.ns.t WHERE z < 500")
    }
    assert(SnapshotTable.latestVersion(path).contains(4))
    spark.sql("ALTER TABLE gt.ns.t RENAME TO ns.t2")
    assert(spark.sql("SELECT count(*) FROM gt.ns.t2").head.getLong(0)
      == 898)
    assert(!spark.catalog.tableExists("gt.ns.t"))
    spark.sql("DROP TABLE gt.ns.t2")
    intercept[Exception] { spark.sql("SELECT * FROM gt.ns.t2").collect() }
  }

  test("connector writes: append commits a version, overwrite and " +
      "versionAsOf writes refuse, absolute-path identifiers need no base") {
    val t = Files.createTempDirectory("graft-sqlw").toString + "/t"
    SnapshotTable.commitAppend(rows(0 until 400), t, "z", 4)
    rows(400 until 500).write.format("graft.sources.SnapshotTableSource")
      .option("path", t).option("zcol", "z").mode("append").save()
    assert(SnapshotTable.latestVersion(t).contains(2))
    assert(SnapshotTable.read(spark, t).count() == 500)
    intercept[Exception] {
      rows(0 until 10).write.format("graft.sources.SnapshotTableSource")
        .option("path", t).mode("overwrite").save()
    }
    intercept[Exception] {
      rows(0 until 10).write.format("graft.sources.SnapshotTableSource")
        .option("path", t).option("versionAsOf", "1")
        .mode("append").save()
    }
    assert(SnapshotTable.latestVersion(t).contains(2))
    // a catalog WITHOUT base still resolves quoted absolute paths
    spark.conf.set("spark.sql.catalog.gabs", "graft.sources.GraftCatalog")
    assert(spark.sql(s"SELECT count(*) FROM gabs.`$t`").head.getLong(0)
      == 500)
  }

  test("native batch scan: parity with the V1 path, pushed-band " +
      "pruning, and a silent fallback while tombstones are live") {
    val t = Files.createTempDirectory("graft-nsc").toString + "/t"
    SnapshotTable.commitAppend(rows(0 until 1200), t, "z", 8)
    def src(native: Boolean) = spark.read
      .format("graft.sources.SnapshotTableSource")
      .option("path", t).option("nativeScan", native.toString).load()
    // parity: same rows, same aggregates
    val a = src(native = true).agg(count(lit(1)), sum(col("id")),
      sum(col("z"))).head()
    val b = src(native = false).agg(count(lit(1)), sum(col("id")),
      sum(col("z"))).head()
    assert(a == b && a.getLong(0) == 1200)
    // pushed band plans a strict subset through the native partitions
    val band = src(native = true)
      .filter(col("z") >= 100 && col("z") <= 220)
    assert(band.count() == 121)
    val (p, tot) = (graft.sources.SnapshotTableSource.lastPlanned,
      graft.sources.SnapshotTableSource.lastTotal)
    assert(p > 0 && p < tot, s"native scan must prune: $p/$tot")
    // a live tombstone silently falls back to the (always-correct) V1
    // read — the anti-join path the native partitions cannot express
    SnapshotTable.commitDeleteMor(spark, t, "id",
      (0L until 100L).toDF("id"))
    assert(src(native = true).count() == 1100)
  }

  test("runtime filtering fires on the native scan: a broadcast join's " +
      "build-side keys prune fact files at execution time") {
    val t = Files.createTempDirectory("graft-nrf").toString + "/t"
    // scatter ids across a z-clustered table so only blooms/keys can
    // confine a key probe; blooms recorded on the id column
    val df = (0 until 3000).map(i => (i.toLong, (i % 600).toDouble))
      .toDF("id", "z")
    SnapshotTable.commitAppend(df, t, "z", 10, bloomCols = Seq("id"))
    val dimDir = Files.createTempDirectory("graft-nrfd").toString
    Seq((7L, 1L), (1499L, 2L), (2993L, 3L), (-5L, 4L), (-6L, 5L))
      .toDF("want", "w").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("want") > 0)
    val fact = spark.read.format("graft.sources.SnapshotTableSource")
      .option("path", t).option("nativeScan", "true").load()
    val joined = fact.join(broadcast(dim), col("id") === col("want"))
    assert(joined.count() == 3)
    val (p, tot) = (graft.sources.SnapshotTableSource.lastPlanned,
      graft.sources.SnapshotTableSource.lastTotal)
    assert(p > 0 && p * 2 <= tot,
      s"runtime filter did not confine the fact scan: $p/$tot")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"), plan.take(2000))
  }

  test("IN and OR pushdown plan strict file subsets through the " +
      "Catalyst read path") {
    val t = Files.createTempDirectory("graft-sqlr").toString + "/t"
    SnapshotTable.commitAppend(rows(0 until 1000), t, "z", 8)
    SnapshotTable.commitAppend(rows(1000 until 1600), t, "z", 4)
    def src() = spark.read.format("graft.sources.SnapshotTableSource")
      .option("path", t).load()
    // IN on the cluster column: bounds alone confine the probe
    assert(src().filter(col("z").isin(5.0, 1500.0)).count() == 2)
    val (p1, t1) = (graft.sources.SnapshotTableSource.lastPlanned,
      graft.sources.SnapshotTableSource.lastTotal)
    assert(p1 > 0 && p1 < t1, s"IN must plan a strict subset: $p1/$t1")
    // OR of two bands: union-of-ranges, any-disjunct-hits per file
    val or = src().filter(
      (col("z") >= 0 && col("z") <= 50) ||
        (col("z") >= 1500 && col("z") <= 1550))
    assert(or.count() == 102)
    val (p2, t2) = (graft.sources.SnapshotTableSource.lastPlanned,
      graft.sources.SnapshotTableSource.lastTotal)
    assert(p2 > 0 && p2 < t2, s"OR must plan a strict subset: $p2/$t2")
    // an OR with an untranslatable disjunct must NOT narrow the read
    val wide = src().filter(
      (col("z") >= 0 && col("z") <= 50) || col("tag").contains("p1"))
    assert(wide.count() ==
      51 + (0 until 1600).count(i => i % 7 == 1 && !(i <= 50)))
    val (p3, t3) = (graft.sources.SnapshotTableSource.lastPlanned,
      graft.sources.SnapshotTableSource.lastTotal)
    assert(p3 == t3, s"an untranslatable disjunct must read all: $p3/$t3")
  }
}
