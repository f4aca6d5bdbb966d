package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral checks for q259 — chunk-granularity dedup: a local
  * brute-force replay of the corpus-wide keep-first rule over q93's
  * chunking, plus the defining conservation identities.
  */
class Corpus11Spec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def round(x: Double, dp: Int): Double =
    BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def toks(text: String): Array[String] =
    text.toLowerCase.split(" ").filter(_.nonEmpty)

  private def chunks(text: String): Seq[(Long, String, Long)] = {
    val w = toks(text)
    if (w.isEmpty) Seq.empty
    else (0 to (w.length - 1) / 15).map { i =>
      val c = w.slice(i * 15, i * 15 + 20)
      (i.toLong, c.mkString(" "), c.length.toLong)
    }
  }

  test("q259 chunk dedup: brute-force keep-first replay and conservation identities") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)

    // local replay: first (doc_id, chunk_idx) occurrence of each chunk wins
    val firstOwner = scala.collection.mutable.Map.empty[String, (Long, Long)]
    for ((id, text) <- docs; (ci, c, _) <- chunks(text))
      if (!firstOwner.contains(c)) firstOwner(c) = (id, ci)
    val expected = docs.filter(d => toks(d._2).nonEmpty).map { case (id, text) =>
      val ch = chunks(text)
      val kept = ch.filter { case (ci, c, _) => firstOwner(c) == (id, ci) }
      (id, ch.size.toLong, kept.size.toLong,
        ch.map(_._3).sum, kept.map(_._3).sum,
        round(kept.map(_._3).sum.toDouble / ch.map(_._3).sum, 4))
    }.map(r => r._1 -> r).toMap

    val out = SparkEntry.queries("q259_chunk_dedup")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(out.length == expected.size)
    out.foreach { case r @ (id, _, _, _, _, _) => assert(r == expected(id), s"doc $id") }

    // conservation: total kept chunks across the corpus = number of
    // distinct chunk strings; every doc's retention is in (0, 1]
    assert(out.map(_._3).sum == firstOwner.size)
    assert(out.forall { case (_, nc, nk, tt, kt, rf) =>
      nk >= 0 && nk <= nc && kt <= tt && rf >= 0.0 && rf <= 1.0
    })
  }
}
