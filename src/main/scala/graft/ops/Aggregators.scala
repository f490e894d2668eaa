package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF surface (SURVEY.md §2.9): custom aggregators for shapes
  * the built-ins cover only with unbounded state.
  *
  * [[TopKByScore]] keeps the k best (score, id) pairs per group with a
  * BOUNDED buffer — `collect_list` + sort materializes every row of the
  * group (OOM on a 100 TB skewed key); this holds at most k elements per
  * partial aggregate, merges map-side, and its shuffle volume per group
  * is k rows regardless of group size.
  */
object Aggregators {

  case class ScoredId(score: Double, id: Long)

  /** Bounded partial-aggregate state: at most k scored ids. */
  case class TopKBuffer(items: Seq[ScoredId])

  /** Top-k by (score desc, id asc), emitted as a csv of ids — a
    * deterministic, oracle-comparable rendering.
    */
  class TopKByScore(k: Int)
      extends Aggregator[ScoredId, TopKBuffer, String] {

    private def ord: Ordering[ScoredId] = Ordering.by(s => (-s.score, s.id))

    override def zero: TopKBuffer = TopKBuffer(Seq.empty)

    // amortized O(1) per row: append, and only sort+trim when the
    // buffer doubles past k (a fresh k-element sort per input row —
    // the naive shape — is O(k log k) allocation+sort on the exact
    // hot path this aggregator exists to bound). The k best of a
    // union survive in the union of each part's buffered 2k, so lazy
    // compaction never loses a keeper.
    private def compact(items: Seq[ScoredId]): Seq[ScoredId] =
      items.sorted(ord).take(k)

    override def reduce(buf: TopKBuffer, in: ScoredId): TopKBuffer = {
      val grown = buf.items :+ in
      TopKBuffer(if (grown.size > 2 * k) compact(grown) else grown)
    }

    override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer =
      TopKBuffer(compact(a.items ++ b.items))

    override def finish(buf: TopKBuffer): String =
      compact(buf.items).map(_.id).mkString(",")

    override def bufferEncoder: Encoder[TopKBuffer] =
      Encoders.product[TopKBuffer]
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Column function: topKByScore(k)(score, id) -> csv of the k best ids. */
  def topKByScore(k: Int) = udaf(new TopKByScore(k), Encoders.product[ScoredId])

}
