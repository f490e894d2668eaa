package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge set — the last step of every
  * near-dup pipeline: candidate pairs become canonical cluster ids
  * (keep min-id per cluster, drop the rest).
  *
  * Iterative min-label propagation, the standard Spark formulation
  * (GraphX's connectedComponents is the same loop on RDDs): every node
  * starts rooted at itself; each round pushes the smallest known root
  * across edges; fixpoint = component minimum. The loop is
  * driver-COORDINATED but the data never leaves the cluster — each
  * round is one shuffle join + one min-aggregate, and `localCheckpoint`
  * truncates the growing lineage so round N doesn't replay rounds
  * 1..N-1. Rounds needed = graph diameter (near-dup clusters are
  * shallow — pairs share a source document — so 2-4 rounds in
  * practice).
  */
object Clusters {

  /** @return (id, root) — one row per node that appears in `edges`,
    *         root = smallest node id reachable (the canonical cluster id)
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 50): DataFrame =
    connectedComponentsWithRounds(edges, srcCol, dstCol, maxIter)._1

  /** Same loop, also reporting the number of rounds run until the
    * fixpoint — the observable the O(log diameter) pointer-doubling
    * claim is measured by (ScaleStress records it at 1x vs 10x).
    */
  def connectedComponentsWithRounds(edges: DataFrame, srcCol: String,
      dstCol: String, maxIter: Int = 50): (DataFrame, Int) = {
    // symmetrize once; this small relation drives every round
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("root"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrRoots = sym.join(labels, sym("a") === labels("id"))
        .select(col("b").as("id"), col("root"))
      // checkpoint BEFORE the self-join below: truncates lineage AND
      // gives the two join sides a concrete common relation (a self-join
      // of the raw derived plan trips Catalyst's union-constraint
      // attribute rewriting)
      val propagated = labels.unionByName(nbrRoots)
        .groupBy(col("id")).agg(min(col("root")).as("root"))
        .localCheckpoint()
      // pointer doubling: follow root -> root-of-root in the same round
      // (a root is always itself a node, so the self-join is total).
      // Plain propagation alone needs diameter rounds — a 10k-hop chain
      // would mean 10k shuffles; doubling squares the reach per round,
      // so rounds = O(log diameter).
      val next = propagated
        .join(propagated.select(col("id").as("rid"), col("root").as("rroot")),
          col("root") === col("rid"))
        .select(col("id"), least(col("root"), col("rroot")).as("root"))
      val changed = next.as("n")
        .join(labels.as("p"), col("n.id") === col("p.id"))
        .filter(col("n.root") =!= col("p.root"))
        .limit(1).count()
      labels = next
      converged = changed == 0
      i += 1
    }
    (labels, i)
  }
}
