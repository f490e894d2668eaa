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

  test("edge direction does not matter") {
    assert(components(Seq((5L, 2L), (2L, 9L))) ==
      Map(2L -> 2L, 5L -> 2L, 9L -> 2L))
  }
}
