package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator showcase (SURVEY.md §2.12): exact top-K (term, count)
  * pairs as a single-pass aggregate. The buffer is a bounded sorted list —
  * merge is associative/commutative, so Spark runs it as partial
  * aggregation map-side and merges partials on the reducer: a top-K that
  * never materializes the full (term → count) map on any single node
  * beyond K entries per partition.
  *
  * (The declared queries use orderBy+limit — TakeOrderedAndProject — which
  * Catalyst already optimizes; this Aggregator is the custom-UDAF
  * capability proof, exercised in AggregatorSpec.)
  */
class TopKTerms(k: Int) extends Aggregator[(String, Long), Seq[(String, Long)], Seq[(String, Long)]] {

  private def trim(buf: Seq[(String, Long)]): Seq[(String, Long)] =
    buf.sortBy { case (t, c) => (-c, t) }.take(k)

  override def zero: Seq[(String, Long)] = Seq.empty

  override def reduce(buf: Seq[(String, Long)], in: (String, Long)): Seq[(String, Long)] =
    trim(buf :+ in)

  override def merge(a: Seq[(String, Long)], b: Seq[(String, Long)]): Seq[(String, Long)] =
    trim(a ++ b)

  override def finish(buf: Seq[(String, Long)]): Seq[(String, Long)] = trim(buf)

  override def bufferEncoder: Encoder[Seq[(String, Long)]] = Encoders.kryo[Seq[(String, Long)]]
  override def outputEncoder: Encoder[Seq[(String, Long)]] = Encoders.kryo[Seq[(String, Long)]]
}
