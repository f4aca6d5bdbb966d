package graft

import org.apache.spark.sql.functions.{datediff, lit, to_date}
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

  test("q216 Bradley-Terry: exact MM replay; win bookkeeping; mean-1 normalization") {
    val out = SparkEntry.queries("q216_bradley_terry")(spark, sfDir)
      .as[(String, Long, Double, Long)].collect()
    val ev = Tables.events(spark, sfDir)
      .select($"user_id".as[Long], $"event_type".as[String]).collect()

    val uc = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val types = ev.map(_._2).distinct.sorted
    val users = ev.map(_._1).distinct
    // directed win counts and comparison totals
    val w = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
    for (u <- users; i <- types; j <- types if i < j) {
      val ci = uc.getOrElse((u, i), 0L); val cj = uc.getOrElse((u, j), 0L)
      if (ci > cj) w((i, j)) += 1 else if (cj > ci) w((j, i)) += 1
    }
    val nij = (for (i <- types; j <- types if i != j)
      yield (i, j) -> (w((i, j)) + w((j, i)))).toMap
    val wins = types.map(i => i -> types.filter(_ != i).map(j => w((i, j))).sum).toMap

    def mm(p: Map[String, Double]): Map[String, Double] = {
      val it = types.map { i =>
        val den = types.filter(_ != i).sorted // j-ordered fold
          .foldLeft(0.0)((acc, j) => acc + nij((i, j)).toDouble / (p(i) + p(j)))
        i -> wins(i).toDouble / den
      }.toMap
      val sp = types.foldLeft(0.0)((acc, i) => acc + it(i)) // i-ordered fold
      types.map(i => i -> it(i) / sp * types.size).toMap
    }
    val p2 = mm(mm(types.map(_ -> 1.0).toMap))
    val expected = types.map(i => (i, wins(i), round(p2(i), 6)))
      .sortBy { case (i, _, s) => (-s, i) }
      .zipWithIndex.map { case ((i, ww, s), r) => (i, ww, s, (r + 1).toLong) }
    assert(out.toSeq == expected.toSeq)
    // every decided comparison is exactly one win
    assert(out.map(_._2).sum == w.values.sum)
  }

  test("q217 power iteration: BigInt-moment R replay, 3 exact rounds; unit norm") {
    val out = SparkEntry.queries("q217_power_iteration_pc1")(spark, sfDir)
      .as[(Int, String, Double, Double)].collect().sortBy(_._1)
    val rows = Tables.lineitem(spark, sfDir)
      .selectExpr("CAST(round(l_quantity * 100) AS BIGINT)",
        "CAST(round(l_extendedprice * 100) AS BIGINT)",
        "CAST(round(l_discount * 100) AS BIGINT)",
        "CAST(round(l_tax * 100) AS BIGINT)")
      .as[(Long, Long, Long, Long)].collect()
      .map(t => Array(t._1, t._2, t._3, t._4))

    val k = 4
    val n = BigInt(rows.length)
    val s = (0 until k).map(i => rows.map(r => BigInt(r(i))).sum)
    val sxy = Array.tabulate(k, k)((i, j) => rows.map(r => BigInt(r(i)) * BigInt(r(j))).sum)
    val rm = Array.tabulate(k, k) { (i, j) =>
      if (i == j) 1.0
      else {
        val (a, b) = (math.min(i, j), math.max(i, j))
        val num = (n * sxy(a)(b) - s(a) * s(b)).toDouble
        val dx = (n * sxy(a)(a) - s(a) * s(a)).toDouble
        val dy = (n * sxy(b)(b) - s(b) * s(b)).toDouble
        num / (math.sqrt(dx) * math.sqrt(dy))
      }
    }
    var v = Array.fill(k)(0.5)
    for (_ <- 1 to 3) {
      val mv = Array.tabulate(k)(i => (0 until k).foldLeft(0.0)((acc, j) => acc + rm(i)(j) * v(j)))
      val nrm = math.sqrt((0 until k).foldLeft(0.0)((acc, i) => acc + mv(i) * mv(i)))
      v = mv.map(_ / nrm)
    }
    val f = Array.tabulate(k)(i => (0 until k).foldLeft(0.0)((acc, j) => acc + rm(i)(j) * v(j)))
    val lam = (0 until k).foldLeft(0.0)((acc, i) => acc + v(i) * f(i))

    assert(out.map(_._3).toSeq == v.map(round(_, 6)).toSeq)
    assert(out.forall(_._4 == round(lam, 6)))
    // unit vector, and a correlation matrix's top eigenvalue is ≥ 1
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-12)
    assert(lam > 0.0 && lam <= k + 1e-9)
  }

  test("q218 Theil-Sen: pairwise-slope median replay; slope within slope envelope") {
    val Array((nDays, nPairs, slope, intercept)) =
      SparkEntry.queries("q218_theil_sen")(spark, sfDir)
        .as[(Long, Long, Double, Double)].collect()
    val days = Tables.events(spark, sfDir)
      .groupBy(to_date($"ts").as("day")).count()
      .select(datediff($"day", lit("2024-01-01").cast("date")).cast("long").as[Long].as("x"),
        $"count".as[Long]).as[(Long, Long)].collect().sortBy(_._1)

    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else {
        // quantile_cont/percentile interpolation at p=0.5
        val pos = 0.5 * (n - 1); val lo = s(pos.toInt); val hi = s(pos.toInt + 1)
        lo + (pos - pos.toInt) * (hi - lo)
      }
    }
    val slopes = for (i <- days.indices; j <- (i + 1) until days.length)
      yield (days(j)._2 - days(i)._2).toDouble / (days(j)._1 - days(i)._1)
    assert(nDays == days.length && nPairs == slopes.length)
    val ms = med(slopes)
    assert(slope == round(ms, 6))
    assert(intercept == round(med(days.map(d => d._2.toDouble - ms * d._1)), 6))
    assert(ms >= slopes.min && ms <= slopes.max)
  }

  test("q219 HITS: exact integer-numerator replay; authorities unit-norm") {
    val out = SparkEntry.queries("q219_hits_ranking")(spark, sfDir)
      .as[(String, String, Double, Long)].collect()
    val ev = Tables.events(spark, sfDir)
      .select($"user_id".as[Long], $"event_type".as[String]).collect()
    val w = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val users = ev.map(_._1).distinct.sorted
    val types = ev.map(_._2).distinct.sorted

    val h1 = users.map(u => u -> types.map(t => BigInt(w.getOrElse((u, t), 0L))).sum).toMap
    val a1 = types.map(t => t -> users.map(u => BigInt(w.getOrElse((u, t), 0L)) * h1(u)).sum).toMap
    val h2 = users.map(u => u -> types.map(t => BigInt(w.getOrElse((u, t), 0L)) * a1(t)).sum).toMap
    val a2 = types.map(t => t -> users.map(u => BigInt(w.getOrElse((u, t), 0L)) * h2(u)).sum).toMap
    val nh = math.sqrt(users.map(u => h2(u) * h2(u)).sum.toDouble)
    val na = math.sqrt(types.map(t => a2(t) * a2(t)).sum.toDouble)

    val expHubs = users.map(u => (u.toString, round(h2(u).toDouble / nh, 6)))
      .sortBy { case (id, sc) => (-sc, id) }.take(20)
      .zipWithIndex.map { case ((id, sc), r) => ("hub", id, sc, (r + 1).toLong) }
    val expAuths = types.map(t => (t, round(a2(t).toDouble / na, 6)))
      .sortBy { case (id, sc) => (-sc, id) }
      .zipWithIndex.map { case ((id, sc), r) => ("authority", id, sc, (r + 1).toLong) }
    assert(out.toSeq == (expAuths ++ expHubs).toSeq)
    // unit norm over ALL authorities (they are not truncated)
    val asum = out.filter(_._1 == "authority").map(r => r._3 * r._3).sum
    assert(math.abs(asum - 1.0) < 1e-4)
  }

  test("q220 Neyman: allocation formula + hash-selection replay; budget bookkeeping") {
    val out = SparkEntry.queries("q220_neyman_allocation")(spark, sfDir)
      .as[(String, Long, Double, Long, Long, Double)].collect()
    val docs = Tables.documents(spark, sfDir)
      .select($"source".as[String], $"doc_id".as[Long], $"n_chars".as[Long]).collect()

    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val bySrc = docs.groupBy(_._1)
    val nsh = bySrc.view.mapValues { rs =>
      val n = BigInt(rs.length); val sv = rs.map(r => BigInt(r._3)).sum
      val ss = rs.map(r => BigInt(r._3) * BigInt(r._3)).sum
      math.sqrt((n * ss - sv * sv).toDouble)
    }.toMap
    val totNsh = nsh.toSeq.sortBy(_._1).foldLeft(0.0)(_ + _._2)
    val n = docs.length.toDouble

    out.foreach { case (src, nhOut, sd, nAlloc, nSel, mean) =>
      val rs = bySrc(src)
      assert(nhOut == rs.length)
      assert(sd == round(nsh(src) / rs.length, 4))
      val expAlloc = math.floor(n * 0.1 * nsh(src) / totNsh + 0.5).toLong
      assert(nAlloc == expAlloc)
      val sel = rs.sortBy(r => (md5hex(s"n#${r._2}"), r._2)).take(expAlloc.toInt)
      assert(nSel == sel.length)
      assert(mean == round(sel.map(_._3).sum.toDouble / sel.length, 4))
    }
    // realized budget lands within rounding of the 10% target
    val total = out.map(_._4).sum
    assert(math.abs(total - n * 0.1) <= out.length / 2.0 + 1)
  }

  test("q221 Spearman: midrank moment replay equals rank-based Pearson") {
    val out = SparkEntry.queries("q221_spearman_matrix")(spark, sfDir)
      .as[(String, String, Long, Double)].collect()
    val rows = Tables.lineitem(spark, sfDir)
      .selectExpr("CAST(round(l_quantity * 100) AS BIGINT)",
        "CAST(round(l_discount * 100) AS BIGINT)",
        "CAST(round(l_tax * 100) AS BIGINT)")
      .as[(Long, Long, Long)].collect().map(t => Array(t._1, t._2, t._3))

    // exact doubled midranks: 2·rank = 2·cnt_below + cnt + 1 (integer)
    def midranks2(xs: Array[Long]): Array[Long] = {
      val cnt = xs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val sorted = cnt.keys.toSeq.sorted
      val cumBelow = sorted.zip(sorted.scanLeft(0L)((acc, v) => acc + cnt(v)).dropRight(1)).toMap
      xs.map(v => 2 * cumBelow(v) + cnt(v) + 1)
    }
    def pearsonExact(a: Array[Long], b: Array[Long]): Double = {
      val n = BigInt(a.length)
      val sa = a.map(BigInt(_)).sum; val sb = b.map(BigInt(_)).sum
      val sab = a.indices.map(i => BigInt(a(i)) * BigInt(b(i))).sum
      val saa = a.map(x => BigInt(x) * BigInt(x)).sum
      val sbb = b.map(x => BigInt(x) * BigInt(x)).sum
      (n * sab - sa * sb).toDouble /
        (math.sqrt((n * saa - sa * sa).toDouble) * math.sqrt((n * sbb - sb * sb).toDouble))
    }
    val ranks = (0 until 3).map(c => midranks2(rows.map(_(c))))
    val names = Seq("quantity", "discount", "tax")
    val exp = (for (i <- 0 until 3; j <- (i + 1) until 3)
      yield (names(i), names(j), pearsonExact(ranks(i), ranks(j))))
      .sortBy(t => (t._1, t._2))
    assert(out.map(t => (t._1, t._2)).toSeq == exp.map(t => (t._1, t._2)))
    out.zip(exp).foreach { case ((_, _, n, rho), (_, _, expRho)) =>
      assert(n == rows.length)
      assert(rho == round(expRho, 6))
    }
  }

  test("q222 Kendall tau-b: brute-force pairwise replay") {
    val Array((n, conc, disc, tiesX, tiesY, taub)) =
      SparkEntry.queries("q222_kendall_taub")(spark, sfDir)
        .as[(Long, Long, Long, Long, Long, Double)].collect()
    val rows = Tables.lineitem(spark, sfDir)
      .selectExpr("CAST(round(l_quantity * 100) AS BIGINT)",
        "CAST(round(l_discount * 100) AS BIGINT)")
      .as[(Long, Long)].collect()
    assert(n == rows.length)
    var c = 0L; var d = 0L; var tx = 0L; var ty = 0L
    var i = 0
    while (i < rows.length) {
      var j = i + 1
      while (j < rows.length) {
        val dx = java.lang.Long.compare(rows(j)._1, rows(i)._1)
        val dy = java.lang.Long.compare(rows(j)._2, rows(i)._2)
        if (dx != 0 && dy != 0) { if (dx == dy) c += 1 else d += 1 }
        if (dx == 0) tx += 1
        if (dy == 0) ty += 1
        j += 1
      }
      i += 1
    }
    assert(conc == c && disc == d && tiesX == tx && tiesY == ty)
    val n0 = n.toDouble * (n - 1) / 2
    assert(taub == round((c - d).toDouble /
      (math.sqrt(n0 - tx) * math.sqrt(n0 - ty)), 6))
    assert(taub >= -1.0 && taub <= 1.0)
  }

  test("q223 James-Stein: moment replay; shrinkage pulls toward the grand mean") {
    val out = SparkEntry.queries("q223_james_stein")(spark, sfDir)
      .as[(String, Long, Double, Double, Double)].collect()
    val docs = Tables.documents(spark, sfDir)
      .select($"source".as[String], $"n_chars".as[Long]).collect()
    val g = docs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val srcs = g.keys.toSeq.sorted
    val k = srcs.size
    val nn = docs.length
    val gm = docs.map(d => BigInt(d._2)).sum.toDouble / nn
    val sst = docs.map(d => BigInt(d._2) * BigInt(d._2)).sum
    val sgg = srcs.foldLeft(0.0) { (acc, src) =>
      val s = g(src).map(BigInt(_)).sum
      acc + s.toDouble * s.toDouble / g(src).length
    }
    val sinv = srcs.foldLeft(0.0)((acc, src) => acc + 1.0 / g(src).length)
    val sig2m = (sst.toDouble - sgg) / (nn - k) * sinv / k
    val ssbM = srcs.foldLeft(0.0) { (acc, src) =>
      val dev = g(src).map(BigInt(_)).sum.toDouble / g(src).length - gm
      acc + dev * dev
    }
    val c = math.max(0.0, 1.0 - (k - 3).toDouble * sig2m / ssbM)
    assert(out.map(_._1).toSeq == srcs)
    out.foreach { case (src, nh, raw, shrunk, sf) =>
      val xs = g(src)
      assert(nh == xs.length)
      assert(raw == round(xs.map(BigInt(_)).sum.toDouble / xs.length, 4))
      assert(sf == round(c, 6))
      val rawD = xs.map(BigInt(_)).sum.toDouble / xs.length
      assert(shrunk == round(gm + c * (rawD - gm), 4))
      // shrinkage never overshoots: shrunk lies between raw and grand
      assert(shrunk >= math.min(rawD, gm) - 0.01 && shrunk <= math.max(rawD, gm) + 0.01)
    }
    assert(out.head._5 >= 0.0 && out.head._5 <= 1.0)
  }

  test("q224 Cramér's V: contingency replay; V in [0,1]; contributions sum to total") {
    val out = SparkEntry.queries("q224_cramers_v")(spark, sfDir)
      .as[(String, Long, Double, Double, Double)].collect()
    val ev = Tables.events(spark, sfDir)
      .selectExpr("event_type", "weekday(CAST(ts AS DATE))")
      .as[(String, Int)].collect()
    val cells = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val types = ev.map(_._1).distinct.sorted
    val dows = ev.map(_._2).distinct.sorted
    val n = ev.length.toDouble
    val rt = types.map(t => t -> ev.count(_._1 == t).toLong).toMap
    val ct = dows.map(d => d -> ev.count(_._2 == d).toLong).toMap
    def contrib(t: String): Double = dows.foldLeft(0.0) { (acc, d) =>
      val o = cells.getOrElse((t, d), 0L).toDouble
      val e = rt(t).toDouble * ct(d) / n
      if (cells.contains((t, d))) acc + (o - e) * (o - e) / e else acc
    }
    val chi2 = types.foldLeft(0.0)((acc, t) => acc + contrib(t))
    val v = math.sqrt(chi2 / (n * math.min(types.size - 1, dows.size - 1)))
    assert(out.map(_._1).toSeq == types.toSeq)
    out.foreach { case (t, nt, cc, c2, vv) =>
      assert(nt == rt(t))
      assert(cc == round(contrib(t), 6))
      assert(c2 == round(chi2, 6))
      assert(vv == round(v, 6))
    }
    assert(out.head._5 >= 0.0 && out.head._5 <= 1.0)
  }
}
