package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator showcase (SURVEY.md §2.12): top-K (term, count) pairs
  * as a single-pass aggregate. Counts for the same term are summed before
  * trimming, so partial buffers from different partitions combine
  * correctly. The buffer is bounded at 2·OverTrim·K entries per partition
  * (trimmed down to OverTrim·K with hysteresis — see below) — EXACT when
  * input terms are pre-aggregated (each term on one row per partition,
  * the q30-style shape) and a heavy-hitters approximation when fed raw
  * occurrences (count mass for a term evicted from a partial is lost,
  * like SpaceSaving without error bounds).
  *
  * (The declared queries use orderBy+limit — TakeOrderedAndProject — which
  * Catalyst already optimizes; this Aggregator is the custom-UDAF
  * capability proof, exercised in ScalePatternsSpec.)
  */
/** One (score, id) candidate in a bounded top-k buffer. A named case
  * class (not a tuple) so the udaf output surfaces as
  * `array<struct<score:double, id:bigint>>` with stable field names. */
case class Scored(score: Double, id: Long)

/** Bounded per-group top-k as a partial-aggregating k-heap — the
  * scale-correct replacement for `Window.partitionBy(group)` over a
  * corpus-sized scored relation (which shuffles the ENTIRE corpus into
  * |groups| reduce partitions and sorts each). As an Aggregator inside
  * `groupBy(group).agg(...)`, map-side combine (ObjectHashAggregate
  * Partial mode) trims every partial buffer to ≤2k entries, so the
  * shuffle carries ≤ 2k·mapTasks·|groups| rows and no corpus-sized sort
  * exists anywhere in the plan. EXACT (unlike [[TopKTerms]] on raw
  * occurrences): the global top-k is a subset of the union of
  * per-partial top-k's, so trimming partials to k never loses a final
  * answer. Ordering: score DESC (ASC when `asc`), id ASC tie-break —
  * identical to `row_number() OVER (ORDER BY score [DESC], id)`.
  */
class TopKScored(k: Int, asc: Boolean = false)
    extends Aggregator[(Double, Long), Seq[Scored], Seq[Scored]] {

  private def key(s: Scored): (Double, Long) = (if (asc) s.score else -s.score, s.id)

  // Same hysteresis as TopKTerms: grow to 2k before trimming to k, so a
  // sort is amortized over ≥k inserts — O(log k) amortized per row.
  private def trim(b: Seq[Scored]): Seq[Scored] =
    if (b.size <= 2 * k) b else b.sortBy(key).take(k)

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(b: Seq[Scored], in: (Double, Long)): Seq[Scored] =
    trim(b :+ Scored(in._1, in._2))

  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
    trim(a ++ b)

  override def finish(b: Seq[Scored]): Seq[Scored] = b.sortBy(key).take(k)

  override def bufferEncoder: Encoder[Seq[Scored]] = Encoders.kryo[Seq[Scored]]
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}

/** Bounded k-min sorted-set monoid over hash values — the BATCH twin of
  * `streaming/StatefulOps.kmvStream`'s keyed state, as an Aggregator so
  * q153's KMV sketch builds inside `groupBy(scope).agg(...)` with
  * map-side combine instead of ranking every distinct hash per scope
  * through one `Window.partitionBy(scope)` reduce partition (r4 verdict
  * "What's wrong" #4). EXACT for the sketch semantics: the k smallest
  * of a union equal the k smallest of the per-partial k-smallest, so
  * partial buffers (trimmed to ≤2k with the usual hysteresis) merge
  * losslessly. Output is the ascending sketch array (≤k hashes); the
  * kth-min is `element_at(sk, k)` and the sketch members ARE the top-k
  * probe set, so both of q153's uses of the old rank column fall out. */
class KMinHashes(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {

  private def trim(b: Seq[Long]): Seq[Long] =
    if (b.size <= 2 * k) b else b.distinct.sorted.take(k)

  override def zero: Seq[Long] = Vector.empty

  override def reduce(b: Seq[Long], h: Long): Seq[Long] = trim(b :+ h)

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = trim(a ++ b)

  override def finish(b: Seq[Long]): Seq[Long] = b.distinct.sorted.take(k)

  override def bufferEncoder: Encoder[Seq[Long]] = Encoders.kryo[Seq[Long]]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

class TopKTerms(k: Int) extends Aggregator[(String, Long), Map[String, Long], Seq[(String, Long)]] {

  // Buffer with HYSTERESIS (r1 advice + r2 review): grow to 2·OverTrim·k
  // before trimming DOWN to OverTrim·k, so on high-cardinality streams a
  // trim is amortized over ≥ OverTrim·k inserts — O(log b) per row —
  // instead of firing on every row once saturated. The retained slack
  // also shrinks heavy-hitter lossiness on raw-occurrence input: a term
  // must stay out of the top 4k of every partial to lose mass (still
  // SpaceSaving-like, still only EXACT when the input is pre-aggregated
  // — one row per term per partition).
  private val OverTrim = 4
  private def keepSize = OverTrim * k
  private def trimAt = 2 * OverTrim * k

  private def trim(buf: Map[String, Long]): Map[String, Long] =
    if (buf.size <= trimAt) buf
    else buf.toSeq.sortBy { case (t, c) => (-c, t) }.take(keepSize).toMap

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], in: (String, Long)): Map[String, Long] =
    trim(buf.updated(in._1, buf.getOrElse(in._1, 0L) + in._2))

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    trim(b.foldLeft(a) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) })

  override def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (t, c) => (-c, t) }.take(k)

  override def bufferEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Seq[(String, Long)]] = Encoders.kryo[Seq[(String, Long)]]
}
