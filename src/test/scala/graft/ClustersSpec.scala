package graft

import org.apache.spark.sql.functions._
import graft.ops.Clusters

/** ops.Clusters min-label propagation vs hand-checked components,
  * including a long chain (worst-case diameter: one round per hop).
  */
class ClustersSpec extends SparkSpec {

  import spark.implicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Clusters.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("two components and a fully-connected triangle resolve to min ids") {
    val got = components(Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("a 12-node chain converges to one root") {
    val chain = (0L until 11L).map(i => (i, i + 1))
    val got = components(chain)
    assert(got.size == 12 && got.values.forall(_ == 0L))
  }

  test("pointer doubling: a 64-node chain resolves within 10 rounds") {
    // plain propagation would need 63 rounds; doubling needs O(log n) —
    // maxIter = 10 only passes if the doubling step actually works
    val chain = (0L until 63L).map(i => (i, i + 1))
    val got = Clusters.connectedComponents(
        chain.toDF("a", "b"), "a", "b", maxIter = 10)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 64 && got.values.forall(_ == 0L))
  }

  test("incremental update equals from-scratch CC, including two " +
      "standing components bridged through one new node") {
    // standing graph: components {1,2,3} (root 1) and {10,11} (root 10),
    // plus isolated pair {20,21} (root 20)
    val oldEdges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
    val standing = Clusters.connectedComponents(
      oldEdges.toDF("a", "b"), "a", "b")
    // new node 100 bridges components 1 and 10; 200 attaches to 20;
    // 300-301 form a brand-new component
    val newEdges = Seq((100L, 3L), (100L, 11L), (200L, 21L),
      (300L, 301L))
    val got = Clusters.incrementalComponents(standing,
        newEdges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    val full = components(oldEdges ++ newEdges)
    assert(got == full, s"incremental $got\nfull $full")
    // the bridge really merged: 10's component now roots at 1
    assert(got(10L) == 1L && got(100L) == 1L && got(11L) == 1L)
    assert(got(200L) == 20L && got(300L) == 300L && got(301L) == 300L)
    // empty day: the standing assignment passes through untouched
    val noop = Clusters.incrementalComponents(standing,
        Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(noop == standing.as[(Long, Long)].collect().toMap)
  }

  test("a blowup day exceeding maxPairs takes the distributed fallback " +
      "and still equals from-scratch CC") {
    // standing: two components {0..4} and {10..14}
    val oldEdges = (0L until 4L).map(i => (i, i + 1)) ++
      (10L until 14L).map(i => (i, i + 1))
    val standing = Clusters.connectedComponents(
      oldEdges.toDF("a", "b"), "a", "b")
    // the blowup: a template cluster wires 30 new nodes pairwise AND
    // bridges the two standing components — far past maxPairs = 5, so
    // the driver union-find path must NOT run
    val blowup = (for {
      i <- 100L until 110L; j <- (i + 1) until 110L
    } yield (i, j)) ++ Seq((100L, 4L), (100L, 14L))
    assert(blowup.length > 5)
    val got = Clusters.incrementalComponents(standing,
        blowup.toDF("a", "b"), "a", "b", maxPairs = 5)
      .as[(Long, Long)].collect().toMap
    val full = components(oldEdges ++ blowup)
    assert(got == full, s"fallback diverged from from-scratch CC")
    // everything merged through the bridge: one component rooted at 0
    assert(got(14L) == 0L && got(109L) == 0L)
    // and below the guard the driver path still gives the same answer
    val small = Clusters.incrementalComponents(standing,
        Seq((100L, 4L), (100L, 14L)).toDF("a", "b"), "a", "b",
        maxPairs = 5)
      .as[(Long, Long)].collect().toMap
    assert(small == components(oldEdges ++ Seq((100L, 4L), (100L, 14L))))
  }

  test("edge direction does not matter") {
    assert(components(Seq((5L, 2L), (2L, 9L))) ==
      Map(2L -> 2L, 5L -> 2L, 9L -> 2L))
  }
}
