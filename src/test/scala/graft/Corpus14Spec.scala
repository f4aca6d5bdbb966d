package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral checks for q273 (trained quality-classifier gate): a local
  * scoring replay against the fitted model, the margin floor that makes
  * the sign-only output hash-safe, training-fixture accuracy, and the
  * operating-point comparison invariants vs q100.
  */
class Corpus14Spec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val Stop = operators.TextAnalytics.Stopwords.toSet
  private def toks(t: String): Seq[String] =
    t.toLowerCase.split(' ').toSeq.filter(w => w.nonEmpty && !Stop.contains(w))

  private def margin(text: String): Double = {
    val m = operators.Corpus14.model
    val tk = toks(text)
    if (tk.isEmpty) m.bias
    else m.bias + tk.groupBy(identity).toSeq.sortBy(_._1).map { case (t, g) =>
      m.vocab.get(t).map { case (idf, w) => (g.size.toDouble / tk.size) * idf * w }
        .getOrElse(0.0)
    }.sum
  }

  test("the fitted model separates its own fixture with >= 0.9 accuracy") {
    val acc = operators.Corpus14.qualityFixture.count { case (text, label) =>
      (margin(text) > 0) == (label == "quality")
    }.toDouble / operators.Corpus14.qualityFixture.size
    assert(acc >= 0.9, s"train accuracy $acc")
  }

  test("q273: local normalized-tf-idf scoring replay; margins pinned off zero") {
    val got = SparkEntry.queries("q273_quality_classifier_gate")(spark, sfDir)
      .as[(Long, Boolean, Boolean, Boolean)].collect().toSeq
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    got.foreach { case (id, clf, _, _) =>
      assert(clf == (margin(docs(id)) > 0), s"doc $id")
    }
    // the sign-only output is hash-safe only while no corpus margin sits
    // at 0 — pin the floor well above engine float-association noise
    // (the q74 |margin| discipline, corpus-wide)
    val minAbs = docs.values.map(t => math.abs(margin(t))).min
    assert(minAbs >= 1e-5, s"min |margin| $minAbs")
    // agree column is derived, both decisions occur, and the gate drops
    // a minority (a quality filter that drops most of its corpus is
    // miscalibrated)
    got.foreach { case (_, c, r, a) => assert(a == (c == r)) }
    val drops = got.count(!_._2)
    assert(drops > 0 && drops < got.size / 10)
  }

  test("q274 blocklist gate: local replay; all three lanes fire; token-exact matching") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val got = SparkEntry.queries("q274_blocklist_gate")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    val expected = docs.map { case (id, text) =>
      val t = text +
        (if (id % 7 == 3) " badcat0" else "") +
        (if (id % 11 == 5) " badcat1 badcat1" else "") +
        (if (id % 13 == 8) " badcat2" else "")
      val w = t.toLowerCase.split(' ').filter(_.nonEmpty)
      val (p, v, a) = (w.count(_ == "badcat0").toLong,
        w.count(_ == "badcat1").toLong, w.count(_ == "badcat2").toLong)
      (id, p, v, a, p + v + a, p + v + a == 0)
    }.sortBy(_._1)
    assert(got == expected)
    // all three category lanes fire, multi-category hits exist, and the
    // gate keeps the (untouched) majority
    assert(got.exists(_._2 > 0) && got.exists(_._3 > 0) && got.exists(_._4 > 0))
    assert(got.exists(r => Seq(r._2, r._3, r._4).count(_ > 0) >= 2))
    val kept = got.count(_._6)
    assert(kept > got.size / 2 && kept < got.size)
    // token-exact: no corpus word contains a blocklist term as substring
    // hit (the Scunthorpe guarantee is the tokenizer's, proven by the
    // exact replay above matching on whole tokens only)
  }

  test("q273 vs q100: all four confusion cells occur — a real operating-point delta") {
    val got = SparkEntry.queries("q273_quality_classifier_gate")(spark, sfDir)
      .as[(Long, Boolean, Boolean, Boolean)].collect().toSeq
    val cells = got.groupBy(r => (r._2, r._3)).view.mapValues(_.size).toMap
    Seq((true, true), (true, false), (false, true), (false, false)).foreach { k =>
      assert(cells.getOrElse(k, 0) > 0, s"confusion cell $k empty")
    }
    // the rule gate's keep column is exactly q100's
    val q100 = SparkEntry.queries("q100_quality_gate")(spark, sfDir)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    got.foreach { case (id, _, r, _) => assert(r == q100(id), s"doc $id") }
  }
}
