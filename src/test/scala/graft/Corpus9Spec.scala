package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral checks for the q211-q213 comparative-statistics tranche:
  * full local replays (BigInt moments for ANOVA, brute-force pairwise
  * U for Mann-Whitney, md5-arm cell recompute for DiD) plus the
  * identities that define each statistic.
  */
class Corpus9Spec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def round(x: Double, dp: Int): Double =
    BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q211 ANOVA: BigInt moment replay; SSB + SSW = SST; F matches") {
    val out = SparkEntry.queries("q211_anova_oneway")(spark, sfDir)
      .as[(String, Long, Double, Double, Double, Double, Double)].collect()
    val docs = Tables.documents(spark, sfDir)
      .select($"lang".as[String], $"n_chars".as[Long]).collect()

    val groups = docs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val n = BigInt(docs.length)
    val st = docs.map(d => BigInt(d._2)).sum
    val sst = docs.map(d => BigInt(d._2) * BigInt(d._2)).sum
    val k = groups.size
    // same sequential lang-ordered double fold as both engines
    val sgg = groups.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, (_, xs)) =>
      val s = xs.map(BigInt(_)).sum
      acc + s.toDouble * s.toDouble / xs.length
    }
    val ssb = sgg - st.toDouble * st.toDouble / n.toDouble
    val ssw = sst.toDouble - st.toDouble * st.toDouble / n.toDouble - ssb
    val f = (ssb / (k - 1)) / (ssw / (n.toDouble - k))

    assert(out.map(_._1).toSeq == groups.keys.toSeq.sorted)
    out.foreach { case (lang, ng, mean, dev, oSsb, oSsw, oF) =>
      val xs = groups(lang)
      assert(ng == xs.length)
      assert(mean == round(xs.map(BigInt(_)).sum.toDouble / xs.length, 4))
      assert(dev == round(xs.map(BigInt(_)).sum.toDouble / xs.length - st.toDouble / n.toDouble, 4))
      assert(oSsb == round(ssb, 4) && oSsw == round(ssw, 4) && oF == round(f, 6))
    }
    // the decomposition identity (pre-rounding check at 4dp tolerance)
    assert(math.abs(out.head._5 + out.head._6 -
      (sst.toDouble - st.toDouble * st.toDouble / n.toDouble)) < 1e-3)
  }

  test("q212 Mann-Whitney: brute-force pairwise U with tie halves; AUC in [0,1]") {
    val Array((na, nb, u2, uA, z, auc)) =
      SparkEntry.queries("q212_mann_whitney")(spark, sfDir)
        .as[(Long, Long, Long, Double, Double, Double)].collect()
    val docs = Tables.documents(spark, sfDir)
      .select($"lang".as[String], $"n_chars".as[Long]).collect()
    val a = docs.filter(_._1 == "en").map(_._2)
    val b = docs.filter(_._1 != "en").map(_._2)
    assert(na == a.length && nb == b.length)

    // O(nA·nB) ground truth in the doubled-integer scale
    var u2Brute = 0L
    for (x <- a; y <- b) u2Brute += (if (x > y) 2L else if (x == y) 1L else 0L)
    assert(u2 == u2Brute)
    assert(uA == round(u2Brute / 2.0, 1))

    val nn = na + nb
    val ties = docs.map(_._2).groupBy(identity).values
      .map(g => { val t = g.length.toLong; t * t * t - t }).sum
    val sig = 2.0 * math.sqrt(na.toDouble * nb / 12.0 *
      ((nn + 1) - ties.toDouble / (nn.toDouble * (nn - 1))))
    assert(z == round((u2.toDouble - na.toDouble * nb) / sig, 6))
    assert(auc >= 0.0 && auc <= 1.0)
    assert(auc == round(u2.toDouble / 2 / (na.toDouble * nb), 6))
  }

  test("q213 DiD: md5-arm cell replay; DiD identity over the four cell means") {
    val out = SparkEntry.queries("q213_diff_in_diff")(spark, sfDir)
      .as[(String, String, Long, Double, Double)].collect()
    val ev = Tables.events(spark, sfDir)
      .where($"event_type" === "purchase")
      .select($"user_id".as[Long], $"ts".cast("date").cast("string").as[String],
        $"value".as[Double]).collect()

    def arm(u: Long): String = {
      val hx = java.security.MessageDigest.getInstance("MD5")
        .digest(s"d#$u".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      if (java.lang.Long.parseLong(hx, 16) % 2 == 0) "treat" else "control"
    }
    val cells = ev.groupBy { case (u, d, _) =>
      (arm(u), if (d < "2024-01-16") "pre" else "post")
    }.view.mapValues { rs =>
      (rs.length.toLong, rs.map(r => math.round(r._3 * 100)).sum)
    }.toMap

    assert(out.map(r => (r._1, r._2)).toSeq ==
      Seq(("control", "post"), ("control", "pre"), ("treat", "post"), ("treat", "pre")))
    out.foreach { case (a, p, n, mean, _) =>
      val (cn, cs) = cells((a, p))
      assert(n == cn)
      assert(mean == round(cs.toDouble / cn / 100.0, 4))
    }
    def m(a: String, p: String): Double = { val (cn, cs) = cells((a, p)); cs.toDouble / cn }
    val did = round(((m("treat", "post") - m("treat", "pre")) -
      (m("control", "post") - m("control", "pre"))) / 100.0, 4)
    assert(out.forall(_._5 == did))
    assert(out.map(_._3).sum == ev.length)
  }

  test("q214 RAKE: full local replay of runs, word stats, and phrase scores") {
    val out = SparkEntry.queries("q214_rake_keywords")(spark, sfDir)
      .as[(String, Long, Double)].collect()
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id".as[Long], $"text".as[String]).collect()
    val stops = operators.TextAnalytics.Stopwords.toSet

    // candidate phrases: maximal non-stopword runs, capped at 4 words
    val phrases = docs.flatMap { case (_, text) =>
      val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
      val runs = scala.collection.mutable.ArrayBuffer[List[String]]()
      var cur = List.newBuilder[String]; var any = false
      for (t <- toks) {
        if (stops(t)) { val r = cur.result(); if (r.nonEmpty) runs += r; cur = List.newBuilder[String]; any = false }
        else { cur += t; any = true }
      }
      val last = cur.result(); if (last.nonEmpty) runs += last
      runs.filter(_.length <= 4)
    }
    val freq = phrases.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val deg = phrases.flatMap(p => p.map(w => w -> p.length.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def score(p: List[String]): Double =
      p.foldLeft(0.0)((acc, w) => acc + deg(w).toDouble / freq(w))
    val expected = phrases.groupBy(_.mkString(" ")).toSeq
      .map { case (txt, ps) => (txt, ps.length.toLong, round(score(ps.head), 6)) }
      .sortBy { case (txt, _, sc) => (-sc, txt) }.take(20)
    assert(out.toSeq == expected)
  }

  test("q215 k-center: exact greedy replay; selection distances shrink; radii covered") {
    val out = SparkEntry.queries("q215_kcenter_coreset")(spark, sfDir)
      .as[(Int, Long, Double, Long, Double)].collect().sortBy(_._1)
    val vecs = Tables.embeddings(spark, sfDir)
      .select($"vec_id".as[Long], $"embedding".as[Array[Float]]).collect().sortBy(_._1)

    // the query's exact float recipe: three index-ordered folds
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    def d2(a: Array[Float], b: Array[Float]): Double = dot(a, a) + dot(b, b) - 2 * dot(a, b)

    var chosen = Vector(vecs.minBy(_._1))
    var dm = vecs.map(v => v._1 -> d2(v._2, chosen.head._2)).toMap
    var selD = Vector(0.0)
    for (_ <- 2 to 4) {
      val next = vecs.map(v => (v._1, dm(v._1))).maxBy { case (id, d) => (d, -id) }
      val nv = vecs.find(_._1 == next._1).get
      selD :+= next._2; chosen :+= nv
      dm = vecs.map(v => v._1 -> math.min(dm(v._1), d2(v._2, nv._2))).toMap
    }
    assert(out.map(_._2).toSeq == chosen.map(_._1))
    assert(out.map(_._3).toSeq == selD.map(round(_, 6)))
    // farthest-point guarantee: selection distances never increase
    assert(selD.drop(1) == selD.drop(1).sorted.reverse)
    // census: every point assigned once; final radii ≤ last selection distance
    assert(out.map(_._4).sum == vecs.length)
    assert(out.forall(_._5 <= selD.last + 1e-9))
  }
}
