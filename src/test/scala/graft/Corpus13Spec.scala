package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral checks for q269 (host-graph PageRank): a full local
  * integer replay of the syndication-edge derivation and both damped
  * rounds, plus the mass and dominance invariants.
  */
class Corpus13Spec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("q269 host pagerank: local integer replay of edges and both rounds") {
    val S = 1000000000000L
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    def host(id: Long) = if (id % 3 == 0) "h0" else s"h${id % 23 + 1}"
    // (fp → distinct hosts) over the q93 chunking; fp stands in for the
    // chunk string itself (md5 is injective on this corpus per q260)
    val hc = docs.flatMap { case (id, text) =>
      val w = text.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
      if (w.isEmpty) Seq.empty
      else (0 to (w.length - 1) / 15).map { i =>
        (w.slice(i * 15, i * 15 + 20).mkString(" "), host(id))
      }
    }.distinct
    val nodes = hc.map(_._2).distinct.sorted
    val byChunk = hc.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      .filter { case (_, hs) => hs.size >= 2 && hs.size <= 64 }
    val e = byChunk.toSeq.flatMap { case (_, hs) =>
      for (u <- hs.toSeq; v <- hs.toSeq if u != v) yield (u, v)
    }.groupBy(identity).map { case ((u, v), o) => (u, v, o.size.toLong) }.toSeq
    val bigW = e.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var t = nodes.map(_ -> S).toMap
    for (_ <- 1 to 2) {
      val m = e.groupBy(_._2).view.mapValues(_.map { case (u, _, w) =>
        (t(u) / bigW(u)) * w + ((t(u) % bigW(u)) * w) / bigW(u)
      }.sum).toMap
      t = nodes.map(h => h -> ((3L * S) / 20L + 17L * m.getOrElse(h, 0L) / 20L)).toMap
    }
    val exp = nodes.map { h =>
      (h, bigW.getOrElse(h, 0L), t(h),
        BigDecimal(t(h) * 1.0 / (nodes.size * S))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (h, _, ts, _) => (-ts, h) }
    val got = SparkEntry.queries("q269_host_pagerank")(spark, sfDir)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == exp)
    // dominance: the deliberate heavy-hitter host outranks everyone
    assert(got.head._1 == "h0" && got.head._3 > got(1)._3)
    // mass: fixed-point total never exceeds N·S (floor + dangling only lose)
    assert(got.map(_._3).sum <= nodes.size * S)
    // the graph is real on this corpus: edges exist and a dangling or
    // low-connectivity host sits at the uniform-teleport floor
    assert(e.nonEmpty)
    assert(got.last._3 >= (3L * S) / 20L)
  }
}
