package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ops.AsOfJoin

/** ops.AsOfJoin vs its brute-force executable spec, plus edge semantics
  * (inclusive match, no-match nulls, tolerance horizon) and plan shape
  * (single shuffle, no pair explosion).
  */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    // key, ts, px
    ("A", ts("2024-01-01 10:00:00"), 1.0),
    ("A", ts("2024-01-01 10:05:00"), 2.0),
    ("A", ts("2024-01-01 10:30:00"), 3.0),
    ("B", ts("2024-01-01 09:00:00"), 10.0)
  ).toDF("k", "rts", "px")

  private lazy val trades = Seq(
    // id, key, ts
    (1L, "A", ts("2024-01-01 10:00:00")), // == quote ts: inclusive match px=1
    (2L, "A", ts("2024-01-01 10:07:00")), // between: px=2
    (3L, "A", ts("2024-01-01 11:00:00")), // after all: px=3
    (4L, "A", ts("2024-01-01 09:59:59")), // before all: null
    (5L, "B", ts("2024-01-01 12:00:00")), // stale quote: px=10
    (6L, "C", ts("2024-01-01 10:00:00")) // no quotes for key: null
  ).toDF("id", "k", "lts")

  test("asof: backward-inclusive semantics on a hand-checked fixture") {
    val got = AsOfJoin.asof(trades, quotes, Seq("k"), "lts", "rts")
      .orderBy("id").select("id", "px").as[(Long, Option[Double])].collect()
    assert(got.toSeq == Seq(
      1L -> Some(1.0), 2L -> Some(2.0), 3L -> Some(3.0),
      4L -> None, 5L -> Some(10.0), 6L -> None))
  }

  test("asof: tolerance drops matches past the lookback horizon") {
    // 30-minute horizon: trade 3 (gap 30min exactly) keeps its match,
    // trade 5 (gap 3h) loses it.
    val tol = Some(lit(30L * 60 * 1000000))
    val got = AsOfJoin.asof(trades, quotes, Seq("k"), "lts", "rts", tol)
      .orderBy("id").select("id", "px").as[(Long, Option[Double])].collect()
    assert(got.toSeq == Seq(
      1L -> Some(1.0), 2L -> Some(2.0), 3L -> Some(3.0),
      4L -> None, 5L -> None, 6L -> None))
  }

  test("asof == brute-force spec on random-ish data, with and without tolerance") {
    // Deterministic pseudo-random fixture: ids are unique (brute-force
    // spec keys its per-probe argmax on the first left column).
    val left = spark.range(200).select(
      col("id"),
      (col("id") % 7).cast("string").as("k"),
      timestamp_micros(lit(1700000000000000L) + (col("id") * 12345678L) % 86400000000L)
        .as("lts"))
    val right = spark.range(60).select(
      (col("id") % 7).cast("string").as("k"),
      timestamp_micros(lit(1700000000000000L) + (col("id") * 98765432L) % 86400000000L)
        .as("rts"),
      (col("id") * 31 % 1000).cast("double").as("px"))
      // enforce the operator's contract: unique per (key, ts)
      .groupBy("k", "rts").agg(max(col("px")).as("px"))

    for (tol <- Seq(None, Some(lit(3600000000L)))) {
      val fast = AsOfJoin.asof(left, right, Seq("k"), "lts", "rts", tol)
        .orderBy("id").collect().toSeq
      val slow = AsOfJoin.asofBruteForce(left, right, Seq("k"), "lts", "rts", tol)
        .orderBy("id").collect().toSeq
      assert(fast == slow, s"tolerance=$tol")
    }
  }

  test("asofForward: forward-inclusive semantics on the same fixture") {
    val got = AsOfJoin.asofForward(trades, quotes, Seq("k"), "lts", "rts")
      .orderBy("id").select("id", "px").as[(Long, Option[Double])].collect()
    assert(got.toSeq == Seq(
      1L -> Some(1.0), // == quote ts: inclusive in both directions
      2L -> Some(3.0), // next quote after 10:07 is 10:30
      3L -> None, // nothing after 11:00
      4L -> Some(1.0), // everything is ahead; nearest is 10:00
      5L -> None, // B's only quote is behind
      6L -> None))
  }

  test("asofForward == forward brute-force spec, with and without tolerance") {
    val n = 400
    val build = spark.range(n).select(
      (col("id") % 7).cast("string").as("k"),
      timestamp_micros(col("id") * 977_777L + 13L).as("rts"),
      (col("id") * 3).cast("double").as("px"))
    val probe = spark.range(n * 2).select(
      col("id").as("pid"),
      (col("id") % 9).cast("string").as("k"),
      timestamp_micros(col("id") * 491_113L).as("lts"))
    for (tol <- Seq(None, Some(lit(2_000_000L)))) {
      val fast = AsOfJoin.asofForward(probe, build, Seq("k"), "lts", "rts", tol)
      val spec = AsOfJoin.asofForwardBruteForce(
        probe, build, Seq("k"), "lts", "rts", tol)
      assert(fast.exceptAll(spec).isEmpty && spec.exceptAll(fast).isEmpty,
        s"tolerance=$tol mismatch")
    }
  }

  test("asof: NULL keys and NULL build timestamps never match") {
    // NULL-key build rows and NULL-ts build rows must not leak payloads
    // (equality never matches NULL; ts <= ts is NULL for a NULL build ts);
    // NULL-key probe rows stay unmatched but are preserved left-outer.
    val quotesN = Seq(
      (Option("A"), Option(ts("2024-01-01 10:00:00")), 1.0),
      (Option.empty[String], Option(ts("2024-01-01 09:00:00")), 66.0),
      (Option("A"), Option.empty[Timestamp], 77.0)
    ).toDF("k", "rts", "px")
    val tradesN = Seq(
      (1L, Option("A"), ts("2024-01-01 10:30:00")),
      (2L, Option.empty[String], ts("2024-01-01 10:30:00"))
    ).toDF("id", "k", "lts")
    for (tol <- Seq(None, Some(lit(86400000000L)))) {
      val fast = AsOfJoin.asof(tradesN, quotesN, Seq("k"), "lts", "rts", tol)
        .orderBy("id").select("id", "px").as[(Long, Option[Double])].collect()
      assert(fast.toSeq == Seq(1L -> Some(1.0), 2L -> None), s"tolerance=$tol")
      val slow = AsOfJoin.asofBruteForce(tradesN, quotesN, Seq("k"), "lts", "rts", tol)
        .orderBy("id").select("id", "px").as[(Long, Option[Double])].collect()
      assert(fast.toSeq == slow.toSeq, s"spec divergence, tolerance=$tol")
    }
  }

  test("asofBruteForce: duplicate probe rows each keep their own output row") {
    val dupTrades = Seq(
      (1L, "A", ts("2024-01-01 10:30:00"), "x"),
      (1L, "A", ts("2024-01-01 10:30:00"), "y") // same id/key/ts, new payload
    ).toDF("id", "k", "lts", "tag")
    val got = AsOfJoin.asofBruteForce(dupTrades, quotes, Seq("k"), "lts", "rts")
    assert(got.count() == 2)
    assert(AsOfJoin.asof(dupTrades, quotes, Seq("k"), "lts", "rts").count() == 2)
  }

  test("asofBucketed == asof, including a hot key and cross-bucket carries") {
    // one hot key (k=0 gets half of all rows), sparse keys elsewhere;
    // bucket width chosen so matches routinely live in older buckets
    val left = spark.range(400).select(
      col("id"),
      when(col("id") % 2 === 0, "hot").otherwise((col("id") % 5).cast("string"))
        .as("k"),
      timestamp_micros(lit(1700000000000000L) + (col("id") * 77777771L) % 86400000000L)
        .as("lts"))
    val right = spark.range(50).select(
      when(col("id") % 2 === 0, "hot").otherwise((col("id") % 5).cast("string"))
        .as("k"),
      timestamp_micros(lit(1700000000000000L) + (col("id") * 999999937L) % 86400000000L)
        .as("rts"),
      (col("id") * 17 % 1000).cast("double").as("px"))
      .groupBy("k", "rts").agg(max(col("px")).as("px"))
    val bucket = (ts: org.apache.spark.sql.Column) =>
      floor(unix_micros(ts) / lit(3600000000L)) // 1h buckets
    for (tol <- Seq(None, Some(lit(7200000000L)))) {
      val plain = AsOfJoin.asof(left, right, Seq("k"), "lts", "rts", tol)
        .orderBy("id").collect().toSeq
      val bucketed = AsOfJoin.asofBucketed(left, right, Seq("k"), "lts", "rts",
          bucket, tol)
        .orderBy("id").collect().toSeq
      assert(bucketed == plain, s"tolerance=$tol")
    }
  }

  test("asof plan: one shuffle on the key, no join node, no pair explosion") {
    val df = AsOfJoin.asof(trades, quotes, Seq("k"), "lts", "rts")
    df.collect()
    // AQE's toString repeats the tree (Final + Initial) — inspect only
    // the final plan section.
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // union + window, not a join: the O(n*m) shape never appears
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 key shuffle, got $exchanges:\n$plan")
  }
}
