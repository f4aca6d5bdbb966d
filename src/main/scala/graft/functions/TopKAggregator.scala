package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator showcase (SURVEY.md §2.12): top-K (term, count) pairs
  * as a single-pass aggregate. Counts for the same term are summed before
  * trimming, so partial buffers from different partitions combine
  * correctly. The buffer is bounded at K entries per partition — which
  * makes this EXACT when input terms are pre-aggregated (each term on one
  * row per partition, the q30-style shape) and a heavy-hitters
  * approximation when fed raw occurrences (count mass for a term evicted
  * from a partial is lost, like SpaceSaving without error bounds).
  *
  * (The declared queries use orderBy+limit — TakeOrderedAndProject — which
  * Catalyst already optimizes; this Aggregator is the custom-UDAF
  * capability proof, exercised in ScalePatternsSpec.)
  */
class TopKTerms(k: Int) extends Aggregator[(String, Long), Seq[(String, Long)], Seq[(String, Long)]] {

  private def trim(buf: Seq[(String, Long)]): Seq[(String, Long)] =
    buf.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(k)

  override def zero: Seq[(String, Long)] = Seq.empty

  override def reduce(buf: Seq[(String, Long)], in: (String, Long)): Seq[(String, Long)] =
    trim(buf :+ in)

  override def merge(a: Seq[(String, Long)], b: Seq[(String, Long)]): Seq[(String, Long)] =
    trim(a ++ b)

  override def finish(buf: Seq[(String, Long)]): Seq[(String, Long)] = trim(buf)

  override def bufferEncoder: Encoder[Seq[(String, Long)]] = Encoders.kryo[Seq[(String, Long)]]
  override def outputEncoder: Encoder[Seq[(String, Long)]] = Encoders.kryo[Seq[(String, Long)]]
}
