package graft

import org.apache.spark.sql.functions._

/** Retrieval teeth of the PQ-codes deletion arm (q_pq_index_delete):
  * the privacy contract an ANN index owes is that a deleted vector can
  * no longer be RETRIEVED — so on a corpus where tombstoned ids sit in
  * the undeleted top-k (sf0.001 does; checked here, not assumed), the
  * post-delete probe must (a) contain no tombstoned id and (b) actually
  * differ from the undeleted probe. A tombstone rate that stopped
  * intersecting the top-k would fail (a)'s precondition loudly here
  * rather than silently weakening the gate.
  */
class PqDeleteSpec extends SparkSpec {

  test("deleting codes removes the vectors from the top-k, and the " +
      "top-k actually changes") {
    val d = "/root/testdata/sf0.001"
    val kept = SparkEntry.queries("q_pq_index_persist")(spark, d)
      .select(col("q_id"), col("rn"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val del = SparkEntry.queries("q_pq_index_delete")(spark, d)
      .select(col("q_id"), col("rn"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // precondition: the undeleted probe retrieves at least one
    // tombstoned id — otherwise this test pins nothing
    assert(kept.exists(_._3 % 10 == 7),
      "tombstone rate no longer intersects the top-k; pick ids that do")
    assert(del.forall(_._3 % 10 != 7),
      s"deleted vector still retrieved: ${del.filter(_._3 % 10 == 7).toSeq}")
    assert(!kept.sameElements(del), "probe unchanged by deletion")
    // every query still gets a full top-k (the index has candidates)
    assert(del.groupBy(_._1).values.forall(_.length == kept.length / 5))
  }
}
