package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral checks for q225-q229 — graph cohesion and corpus-statistics
  * diagnostics: brute-force graph replays, exact count-table replays, and
  * the defining identities (transitivity bookkeeping, probability-mass
  * conservation, pair symmetry under a symmetric window).
  */
class Corpus10Spec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def round(x: Double, dp: Int): Double =
    BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def toks(text: String): Array[String] =
    text.toLowerCase.split(" ").filter(_.nonEmpty)

  private def trigrams(text: String): Seq[String] =
    toks(text).sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq

  test("q225 clustering coefficient: brute-force triangle replay; transitivity bookkeeping") {
    val out = SparkEntry.queries("q225_clustering_coefficient")(spark, sfDir)
      .as[(String, Long, Long, Long, Double)].collect()
    val edges = operators.Corpus5.shingleEdges(Tables.documents(spark, sfDir))
      .as[(Long, Long)].collect().toSet

    val adj = (edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) })
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val triPerNode = adj.keys.map { n =>
      val nb = adj(n).toSeq
      n -> (for (i <- nb.indices; j <- (i + 1) until nb.length
                 if adj(nb(i)).contains(nb(j))) yield 1).size.toLong
    }.toMap
    val totalTri = triPerNode.values.sum / 3
    val wedges = adj.values.map(nb => nb.size.toLong * (nb.size - 1) / 2).sum

    val globalRow = out.filter(_._1 == "global")
    assert(globalRow.length == 1)
    assert(globalRow.head._3 == wedges)
    assert(globalRow.head._4 == 3 * totalTri)
    assert(globalRow.head._5 == round(3.0 * totalTri / wedges, 6))
    out.filter(_._1 == "node").foreach { case (_, id, dg, ntri, lcc) =>
      assert(dg == adj(id).size)
      assert(ntri == triPerNode(id))
      assert(lcc == round(2.0 * ntri / (dg.toDouble * (dg - 1)), 6))
      assert(lcc >= 0.0 && lcc <= 1.0)
    }
  }

  test("q226 Good-Turing: trigram count-table replay; mass is a probability share") {
    val out = SparkEntry.queries("q226_good_turing")(spark, sfDir)
      .as[(Long, Long, Double, Double, Long, Long)].collect()
    val tgs = Tables.documents(spark, sfDir).select($"text".as[String]).collect()
      .flatMap(trigrams)
    val tf = tgs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nr = tf.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nTokens = tgs.length.toLong
    val vocab = tf.size.toLong

    assert(out.map(_._1).toSeq == nr.keys.filter(_ <= 10).toSeq.sorted)
    out.foreach { case (r, nrOut, rStar, mass, nt, vc) =>
      assert(nrOut == nr(r))
      assert(rStar == round((r + 1).toDouble * nr.getOrElse(r + 1, 0L) / nr(r), 6))
      assert(mass == round((r * nr(r)).toDouble / nTokens, 6))
      assert(nt == nTokens && vc == vocab)
      assert(mass >= 0.0 && mass <= 1.0)
    }
    assert(out.map(_._4).sum <= 1.0 + 1e-6)
  }

  test("q227 Zipf fit: local top-100 OLS replay") {
    val Array((nTerms, slope, intercept, r2)) =
      SparkEntry.queries("q227_zipf_fit")(spark, sfDir)
        .as[(Long, Double, Double, Double)].collect()
    val tf = Tables.documents(spark, sfDir).select($"text".as[String]).collect()
      .flatMap(toks).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val top = tf.toSeq.sortBy { case (w, f) => (-f, w) }.take(100)
    val pts = top.zipWithIndex.map { case ((_, f), i) =>
      (math.log((i + 1).toDouble), math.log(f.toDouble))
    }
    val n = pts.length.toDouble
    val sx = pts.foldLeft(0.0)(_ + _._1); val sy = pts.foldLeft(0.0)(_ + _._2)
    val sxx = pts.foldLeft(0.0)((a, p) => a + p._1 * p._1)
    val sxy = pts.foldLeft(0.0)((a, p) => a + p._1 * p._2)
    val syy = pts.foldLeft(0.0)((a, p) => a + p._2 * p._2)
    val sl = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(nTerms == pts.length)
    assert(slope == round(sl, 6))
    assert(intercept == round((sy - sl * sx) / n, 6))
    assert(r2 == round((n * sxy - sx * sy) * (n * sxy - sx * sy) /
      ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6))
    assert(slope < 0.0 && r2 >= 0.0 && r2 <= 1.0)
  }

  test("q228 Heaps growth: decile replay; final checkpoint covers the full vocabulary") {
    val out = SparkEntry.queries("q228_heaps_growth")(spark, sfDir)
      .as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1)
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id".as[Long], $"text".as[String]).collect()
    val md = docs.map(_._1).max + 1
    val occ = docs.flatMap { case (id, t) => trigrams(t).map(tg => (id * 10 / md, tg)) }
    val firstSeen = occ.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val buckets = occ.map(_._1).distinct.sorted

    var toksCum = 0L; var vocabCum = 0L
    val exp = buckets.map { b =>
      toksCum += occ.count(_._1 == b)
      vocabCum += firstSeen.values.count(_ == b)
      (b, toksCum, vocabCum)
    }
    assert(out.map(t => (t._1, t._2, t._3)).toSeq == exp.toSeq)
    assert(out.last._3 == firstSeen.size)
    // β in (0, 1): sublinear growth once any trigram repeats
    out.flatMap(_._4).foreach(b => assert(b > 0.0 && b <= 1.0))
  }

  test("q226/q228 survive documents shorter than 3 tokens (trigram guard regression)") {
    // A bare sequence(1, size-2) descends to [1, 0] on short docs and
    // throws INVALID_ARRAY_INDEX_IN_ELEMENT_AT; the shared guarded
    // template must yield an empty trigram list instead, matching the
    // oracle's empty generate_series.
    val dir = java.nio.file.Files.createTempDirectory("graft_shortdocs").toString
    val docs = Seq(
      (1L, "", "en", "web", 0L),
      (2L, "one", "en", "web", 3L),
      (3L, "two words", "en", "web", 9L),
      (4L, "three word doc", "en", "web", 14L),
      (5L, "a slightly longer document with several words", "en", "web", 45L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val gt = SparkEntry.queries("q226_good_turing")(spark, dir).collect()
    // one trigram each from docs 4-5's sliding windows: doc4 has 1,
    // doc5 has 5 — all frequency-1, so N_1 = 6 at r = 1.
    assert(gt.length == 1 && gt.head.getLong(0) == 1L && gt.head.getLong(1) == 6L)
    val heaps = SparkEntry.queries("q228_heaps_growth")(spark, dir).collect()
    assert(heaps.nonEmpty && heaps.map(_.getLong(2)).max == 6L)
  }

  test("q229 skip-gram pairs: hash-subsample replay; symmetric window ⇒ symmetric counts") {
    val out = SparkEntry.queries("q229_skipgram_pairs")(spark, sfDir)
      .as[(String, String, Long)].collect()
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id".as[Long], $"text".as[String]).collect()

    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val occ = docs.flatMap { case (id, t) =>
      toks(t).zipWithIndex.map { case (w, i) => (id, w, i + 1L) } }
    val tf = occ.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = occ.length.toLong
    val thr = tf.map { case (w, f) =>
      w -> math.floor(math.min(1.0, math.sqrt(0.001 * n / f)) * 1000000).toLong }
    val surv = occ.filter { case (id, w, pos) =>
      java.lang.Long.parseLong(md5hex(s"sg#$id#$pos").take(15), 16) % 1000000 < thr(w) }
    val pairs = surv.groupBy(_._1).values.toSeq.flatMap { ws =>
      val sorted = ws.sortBy(_._3).toIndexedSeq
      for {
        ia <- sorted.indices
        ib <- sorted.indices
        if ia != ib && math.abs(ia - ib) <= 2
      } yield (sorted(ia)._2, sorted(ib)._2)
    }
    val cnt = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = cnt.toSeq.map { case ((c, x), m) => (c, x, m) }
      .sortBy { case (c, x, m) => (-m, c, x) }.take(20)
    assert(out.toSeq == expected.toSeq)
    // the ±2 window is symmetric, so every pair count has its mirror
    out.foreach { case (c, x, m) => assert(cnt.getOrElse((x, c), 0L) == m) }
  }

  test("q230 KL divergence: local distribution replay; Gibbs non-negativity") {
    val out = SparkEntry.queries("q230_kl_divergence")(spark, sfDir)
      .as[(String, Double, Long)].collect()
    val occ = Tables.documents(spark, sfDir)
      .select($"source".as[String], $"text".as[String]).collect()
      .flatMap { case (src, t) => toks(t).map(src -> _) }
    val g = occ.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = occ.length.toDouble
    val bySrc = occ.groupBy(_._1)
    assert(out.map(_._1).toSeq == bySrc.keys.toSeq.sorted)
    out.foreach { case (src, kl, nTerms) =>
      val sw = bySrc(src).groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val ns = bySrc(src).length.toDouble
      assert(nTerms == sw.size)
      val expected = sw.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, (w, c)) =>
        acc + (c / ns) * math.log((c / ns) / (g(w) / n))
      }
      assert(kl == round(expected, 6))
      assert(kl >= -1e-9) // D(p‖q) ≥ 0
    }
  }

  test("q231 silhouette: cluster census matches q170's fit; scores bounded and ordered") {
    val out = SparkEntry.queries("q231_silhouette")(spark, sfDir)
      .as[(Long, Long, Double, Double, Double)].collect()
    val q170Sizes = SparkEntry.queries("q170_semdedup")(spark, sfDir)
      .groupBy($"cluster").count()
      .as[(Long, Long)].collect().toMap
    // identical LloydKMeans fit ⇒ identical census
    assert(out.map(r => (r._1, r._2)).toMap == q170Sizes)
    assert(out.map(_._2).sum == q170Sizes.values.sum)
    out.foreach { case (_, _, med, p10, p90) =>
      assert(p10 <= med && med <= p90)
      Seq(med, p10, p90).foreach(v => assert(v >= -1.0 && v <= 1.0))
    }
  }

  test("q232 confusion metrics: heuristic replay; marginal bookkeeping identities") {
    val out = SparkEntry.queries("q232_confusion_metrics")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect()
    val docs = Tables.documents(spark, sfDir)
      .select($"lang".as[String], $"text".as[String]).collect()
    val en = Set("the", "a", "an", "and", "or", "of", "is", "to")
    val es = Set("el", "la", "de", "que", "y", "en", "los", "se")
    val de = Set("der", "die", "das", "und", "ist", "von", "mit", "den")
    val pred = docs.map { case (lang, t) =>
      val ws = toks(t)
      val (ne, ns, nd) = (ws.count(en), ws.count(es), ws.count(de))
      val p = if (ne >= ns && ne >= nd) "en" else if (ns >= nd) "es" else "de"
      (lang, p)
    }
    val n = pred.length.toLong
    assert(out.map(_._1).toSeq == Seq("de", "en", "es"))
    out.foreach { case (c, tp, fp, fn, tn, prec, rec, f1, mcc) =>
      val etp = pred.count(p => p._2 == c && p._1 == c).toLong
      val efp = pred.count(p => p._2 == c && p._1 != c).toLong
      val efn = pred.count(p => p._2 != c && p._1 == c).toLong
      assert(tp == etp && fp == efp && fn == efn && tn == n - etp - efp - efn)
      // marginals: predicted count and gold count reconstruct
      assert(tp + fp == pred.count(_._2 == c))
      assert(tp + fn == pred.count(_._1 == c))
      if (tp + fp > 0) assert(prec.get == round(tp.toDouble / (tp + fp), 6))
      if (tp + fn > 0) assert(rec.get == round(tp.toDouble / (tp + fn), 6))
      f1.foreach(v => assert(v >= 0.0 && v <= 1.0))
      mcc.foreach(v => assert(v >= -1.0 && v <= 1.0))
    }
  }

  test("q233 STL-lite: window replay; v = trend + seasonal + residual identity") {
    val out = SparkEntry.queries("q233_stl_decompose")(spark, sfDir)
      .as[(String, Long, Double, Double, Double)].collect().sortBy(_._1)
    val days = Tables.events(spark, sfDir)
      .groupBy(org.apache.spark.sql.functions.to_date($"ts").cast("string").as("day"))
      .count().as[(String, Long)].collect().sortBy(_._1)

    val v = days.map(_._2)
    val trend = v.indices.map { i =>
      val lo = math.max(0, i - 3); val hi = math.min(v.length - 1, i + 3)
      (lo to hi).map(v(_)).sum.toDouble / (hi - lo + 1)
    }
    val dow = days.map(d => (java.time.LocalDate.parse(d._1).getDayOfWeek.getValue - 1))
    val seasonal = dow.distinct.map { dw =>
      val idx = v.indices.filter(dow(_) == dw)
      // day-ordered fold, as both engines do
      dw -> idx.foldLeft(0.0)((acc, i) => acc + (v(i).toDouble - trend(i))) / idx.size
    }.toMap
    out.zipWithIndex.foreach { case ((day, vo, to, so, ro), i) =>
      assert(day == days(i)._1 && vo == v(i))
      assert(to == round(trend(i), 4))
      assert(so == round(seasonal(dow(i)), 4))
      assert(ro == round(v(i).toDouble - trend(i) - seasonal(dow(i)), 4))
      // decomposition identity within the 4dp rounding of each part
      assert(math.abs(vo - (to + so + ro)) < 3e-4)
    }
  }

  test("q234 U-shape attribution: allocation replay conserves revenue to the cent") {
    val out = SparkEntry.queries("q234_ushape_attribution")(spark, sfDir)
      .as[(String, Long, Long)].collect()
    val ev = Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_id", "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP))", "value")
      .as[(Long, Long, String, Long, Double)].collect()

    val purchases = ev.filter(_._3 == "purchase")
    val byChannel = scala.collection.mutable.Map[String, (Long, Long)]().withDefaultValue((0L, 0L))
    var attributable = 0L
    for (p <- purchases) {
      val touches = ev.filter(e => e._1 == p._1 && (e._3 == "view" || e._3 == "click")
        && e._4 < p._4).sortBy(e => (e._4, e._2))
      if (touches.nonEmpty) {
        val c = math.round(p._5 * 100)
        attributable += c
        val nt = touches.length
        val cents = touches.zipWithIndex.map { case (_, i) =>
          if (nt == 1) c
          else if (nt == 2) { if (i == 0) c - c / 2 else c / 2 }
          else if (i == 0) c - (c * 2) / 5 - c / 5
          else if (i == nt - 1) (c * 2) / 5
          else (c / 5) / (nt - 2) + (if (i <= (c / 5) % (nt - 2)) 1L else 0L)
        }
        assert(cents.sum == c) // conservation per purchase
        touches.zip(cents).foreach { case (t, cc) =>
          val (n0, c0) = byChannel(t._3); byChannel(t._3) = (n0 + 1, c0 + cc)
        }
      }
    }
    assert(out.map(r => r._1 -> (r._2, r._3)).toMap == byChannel.toMap)
    assert(out.map(_._3).sum == attributable)
  }

  test("q235 Markov attribution: full chain replay — journeys, P, 8-round values, removal effects") {
    val out = SparkEntry.queries("q235_markov_attribution")(spark, sfDir)
      .as[(String, Double, Double, Double, Double)].collect()
    val ev = Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(CAST(ts AS TIMESTAMP))")
      .as[(Long, Long, String, Long)].collect()

    // journeys truncated at first purchase
    val byUser = ev.groupBy(_._1).view.mapValues(_.sortBy(e => (e._4, e._2))).toMap
    val transitions = scala.collection.mutable.ArrayBuffer[(String, String)]()
    for ((_, es) <- byUser) {
      val firstP = es.indexWhere(_._3 == "purchase")
      val run = if (firstP >= 0) es.take(firstP + 1) else es
      var prev = "start"
      for (e <- run) {
        val t = if (e._3 == "purchase") "conv" else e._3
        transitions += ((prev, t)); prev = t
      }
      if (firstP < 0) transitions += ((prev, "null"))
    }
    val cnt = transitions.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rowTot = transitions.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    def prob(tr: Map[(String, String), Double]): Map[String, Double] = {
      var p = Map("conv" -> 1.0)
      for (_ <- 1 to 8) {
        val states = tr.keys.map(_._1).toSeq.distinct
        p = states.map { s =>
          val terms = tr.filter(_._1._1 == s).toSeq.sortBy(_._1._2)
          s -> terms.foldLeft(0.0)((acc, kv) => acc + kv._2 * p.getOrElse(kv._1._2, 0.0))
        }.toMap + ("conv" -> 1.0)
      }
      p
    }
    val pFullMap = cnt.map { case ((s, t), n) => (s, t) -> n.toDouble / rowTot(s) }
    val pcf = prob(pFullMap)("start")
    def removed(c: String): Map[(String, String), Double] =
      pFullMap.filter(_._1._1 != c).toSeq
        .map { case ((s, t), p) => ((s, if (t == c) "null" else t), (t, p)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).map(_._2).sum).toMap
    val channels = Seq("click", "error", "signup", "view")
    val removal = channels.map(c => c -> math.max(0.0, 1.0 - prob(removed(c))("start") / pcf)).toMap
    val tot = channels.foldLeft(0.0)((acc, c) => acc + removal(c))

    assert(out.map(_._1).toSeq == channels)
    out.foreach { case (c, pf, pw, re, sh) =>
      assert(pf == round(pcf, 6))
      assert(pw == round(prob(removed(c))("start"), 6))
      assert(re == round(removal(c), 6))
      assert(sh == round(removal(c) / tot, 6))
      assert(pf >= 0.0 && pf <= 1.0 && re >= 0.0 && re <= 1.0)
    }
    assert(math.abs(out.map(_._5).sum - 1.0) < 1e-4)
  }

  test("q236 runs test: brute-force sequential runs count; moments replay") {
    val Array((n, n1, n0, runs, eRuns, z)) =
      SparkEntry.queries("q236_runs_test")(spark, sfDir)
        .as[(Long, Long, Long, Long, Double, Double)].collect()
    val xs = Tables.documents(spark, sfDir)
      .select($"doc_id".as[Long], $"lang".as[String]).collect()
      .sortBy(_._1).map(d => if (d._2 == "en") 1 else 0)
    assert(n == xs.length && n1 == xs.sum && n0 == xs.length - xs.sum)
    val bruteRuns = 1 + xs.sliding(2).count(p => p(0) != p(1))
    assert(runs == bruteRuns)
    val e = 1.0 + 2.0 * n1 * n0 / n
    assert(eRuns == round(e, 4))
    val v = 2.0 * n1 * n0 * (2.0 * n1 * n0 - n) / (n.toDouble * n * (n - 1))
    assert(z == round((bruteRuns - e) / math.sqrt(v), 4))
  }

  test("q237 Mann-Kendall: brute-force S and tie-corrected variance") {
    val Array((n, s, tie, varS, z)) =
      SparkEntry.queries("q237_mann_kendall")(spark, sfDir)
        .as[(Long, Long, Long, Double, Double)].collect()
    val days = Tables.events(spark, sfDir)
      .groupBy(org.apache.spark.sql.functions.to_date($"ts").as("day")).count()
      .select($"day".cast("string").as[String], $"count".as[Long]).collect().sortBy(_._1)
    assert(n == days.length)
    var bs = 0L
    for (i <- days.indices; j <- (i + 1) until days.length)
      bs += java.lang.Long.compare(days(j)._2, days(i)._2).sign
    assert(s == bs)
    val bt = days.map(_._2).groupBy(identity).values.filter(_.length > 1)
      .map(g => { val t = g.length.toLong; t * (t - 1) * (2 * t + 5) }).sum
    assert(tie == bt)
    val v = (n.toDouble * (n - 1) * (2 * n + 5) - bt) / 18.0
    assert(varS == round(v, 4))
    val cc = if (bs > 0) bs - 1 else if (bs < 0) bs + 1 else 0L
    assert(z == round(cc / math.sqrt(v), 4))
  }

  test("q238 PACF: Durbin-Levinson replay from exact-deviation ACF; lag-1 identity") {
    val out = SparkEntry.queries("q238_pacf")(spark, sfDir)
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    val days = Tables.events(spark, sfDir)
      .groupBy(org.apache.spark.sql.functions.to_date($"ts").as("day")).count()
      .select($"day".cast("string").as[String], $"count".as[Long]).collect().sortBy(_._1)
    val n = BigInt(days.length)
    val t = days.map(d => BigInt(d._2)).sum
    val dev = days.map(d => n * d._2 - t)
    val dd = dev.map(x => x * x).sum
    val r = (1 to 5).map { k =>
      k -> (0 until days.length - k).map(i => dev(i) * dev(i + k)).sum.toDouble / dd.toDouble
    }.toMap

    // Durbin-Levinson, same fold order as the shared expression chain
    var prev = Map(1 -> r(1))
    val pacf = scala.collection.mutable.Map(1 -> r(1))
    for (k <- 2 to 5) {
      val num = r(k) - (1 until k).map(j => prev(j) * r(k - j)).sum
      val den = 1.0 - (1 until k).map(j => prev(j) * r(j)).sum
      val pk = num / den
      prev = (1 until k).map(j => j -> (prev(j) - pk * prev(k - j))).toMap + (k -> pk)
      pacf(k) = pk
    }
    out.foreach { case (lag, acf, p) =>
      assert(acf == round(r(lag.toInt), 6))
      assert(math.abs(p - pacf(lag.toInt)) < 1e-5)
    }
    // φ11 = ρ1 by definition
    assert(out.head._2 == out.head._3)
  }

  test("q239 V-optimal histogram: DP optimality vs brute force; partition bookkeeping") {
    val out = SparkEntry.queries("q239_voptimal_histogram")(spark, sfDir)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    val pts = Tables.lineitem(spark, sfDir)
      .selectExpr("CAST(round(l_quantity) AS BIGINT)").as[Long].collect()
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)

    val n = pts.length
    val v = pts.map(_._1.toDouble); val c = pts.map(_._2.toDouble)
    val pc = c.scanLeft(0.0)(_ + _); val ps = v.zip(c).map(t => t._1 * t._2).scanLeft(0.0)(_ + _)
    val pss = v.zip(c).map(t => t._1 * t._1 * t._2).scanLeft(0.0)(_ + _)
    def sse(a: Int, b: Int): Double =
      (pss(b) - pss(a)) - (ps(b) - ps(a)) * (ps(b) - ps(a)) / (pc(b) - pc(a))
    val B = 4
    val best = Array.fill(B + 1, n + 1)(Double.MaxValue)
    best(0)(0) = 0.0
    for (k <- 1 to B; j <- k to n)
      best(k)(j) = ((k - 1) until j).map(i => best(k - 1)(i) + sse(i, j)).min

    // buckets partition the value domain contiguously and conserve rows
    assert(out.length == B)
    assert(out.head._2 == pts.head._1 && out.last._3 == pts.last._1)
    out.sliding(2).foreach { w =>
      val hiIdx = pts.indexWhere(_._1 == w(0)._3)
      assert(pts(hiIdx + 1)._1 == w(1)._2) // next bucket starts at next value
    }
    assert(out.map(_._4).sum == pts.map(_._2).sum)
    // total SSE equals the DP optimum (each bucket SSE rounded at 4dp)
    assert(math.abs(out.map(_._5).sum - best(B)(n)) < 1e-2)
    // per-bucket SSE replays from the prefix sums
    out.foreach { case (_, lo, hi, nr, s) =>
      val a = pts.indexWhere(_._1 == lo); val b = pts.indexWhere(_._1 == hi) + 1
      assert(nr == pts.slice(a, b).map(_._2).sum)
      assert(s == round(sse(a, b), 4))
    }
  }

  test("q240 SRM guard: arm-hash census replay; χ² formula") {
    val Array((na, nb, chi2, flag)) =
      SparkEntry.queries("q240_srm_guard")(spark, sfDir)
        .as[(Long, Long, Double, Boolean)].collect()
    val users = Tables.events(spark, sfDir)
      .select($"user_id".as[Long]).distinct().collect()
    def arm(u: Long): String = {
      val hx = java.security.MessageDigest.getInstance("MD5")
        .digest(s"x#$u".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      if (java.lang.Long.parseLong(hx, 16) % 2 == 0) "A" else "B"
    }
    val ea = users.count(arm(_) == "A").toLong
    assert(na == ea && nb == users.length - ea)
    val x2 = (na - nb).toDouble * (na - nb) / (na + nb)
    assert(chi2 == round(x2, 6))
    assert(flag == (x2 > 3.841))
  }

  test("q241 Haar synopsis: pyramid replay; keeping every coefficient reconstructs exactly") {
    val out = SparkEntry.queries("q241_haar_synopsis")(spark, sfDir)
      .as[(Long, Long, Double, Double)].collect()
    val days = Tables.events(spark, sfDir)
      .groupBy(org.apache.spark.sql.functions.to_date($"ts").as("day")).count()
      .select($"day".cast("string").as[String], $"count".as[Long]).collect().sortBy(_._1)
    val v = Array.fill(32)(0.0)
    days.map(_._2.toDouble).copyToArray(v)

    var a = v.clone()
    val coefs = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    for (l <- 4 to 0 by -1) {
      val next = new Array[Double](a.length / 2)
      for (p <- next.indices) {
        coefs += ((l.toLong, p.toLong, (a(2 * p) - a(2 * p + 1)) / 2))
        next(p) = (a(2 * p) + a(2 * p + 1)) / 2
      }
      a = next
    }
    val base = a(0)
    def recon(kept: Seq[(Long, Long, Double)]): Array[Double] = {
      val vh = Array.fill(32)(base)
      for ((lvl, pos, c) <- kept.sortBy(t => (t._1, t._2)); i <- 0 until 32) {
        val size = 1L << (5 - lvl)
        if (i / size == pos) vh(i) += (if ((i / (size / 2)) % 2 == 0) c else -c)
      }
      vh
    }
    val sorted = coefs.sortBy(t => (-math.abs(t._3), t._1, t._2))
    val kept = sorted.take(6).toSeq
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ==
      kept.map(t => (t._1, t._2, round(t._3, 4))))
    val vh = recon(kept)
    val sse = v.indices.foldLeft(0.0)((acc, i) => acc + (v(i) - vh(i)) * (v(i) - vh(i)))
    assert(out.forall(_._4 == round(sse, 4)))
    // more coefficients never hurt; the full set reconstructs exactly
    val vh10 = recon(sorted.take(10).toSeq)
    val sse10 = v.indices.foldLeft(0.0)((acc, i) => acc + (v(i) - vh10(i)) * (v(i) - vh10(i)))
    assert(sse10 <= sse + 1e-9)
    val vhAll = recon(sorted.toSeq)
    assert(v.indices.forall(i => math.abs(v(i) - vhAll(i)) < 1e-9))
  }

  test("q242 LF analysis: vote replay against q182; conflict ⊆ overlap; bookkeeping") {
    val out = SparkEntry.queries("q242_lf_analysis")(spark, sfDir)
      .as[(String, Long, Double, Long, Long, Long, Option[Double])].collect()
    val votes = SparkEntry.queries("q182_weak_label_vote")(spark, sfDir)
      .select($"lf_len".as[Int], $"lf_stop".as[Int], $"lf_digit".as[Int])
      .collect()
    val n = votes.length.toDouble
    val byName = Map[String, Array[(Int, Int, Int)]](
      "lf_len" -> votes.map(v => (v._1, v._2, v._3)),
      "lf_stop" -> votes.map(v => (v._2, v._1, v._3)),
      "lf_digit" -> votes.map(v => (v._3, v._1, v._2)))
    assert(out.map(_._1).toSeq == Seq("lf_digit", "lf_len", "lf_stop"))
    out.foreach { case (lf, fired, cov, ov, cf, comp, agree) =>
      val vs = byName(lf)
      assert(fired == vs.count(_._1 != 0))
      assert(cov == round(fired / n, 4))
      assert(ov == vs.count(v => v._1 != 0 && (v._2 != 0 || v._3 != 0)))
      assert(cf == vs.count(v => v._1 != 0 && (v._2 == -v._1 || v._3 == -v._1)))
      val loo = vs.filter(v => v._1 != 0 && v._2 + v._3 != 0)
      assert(comp == loo.length)
      if (loo.nonEmpty)
        assert(agree.get == round(
          loo.count(v => v._1.sign == (v._2 + v._3).sign).toDouble / loo.length, 4))
      else assert(agree.isEmpty)
      assert(cf <= ov && ov <= fired)
    }
  }

  test("q243 LSH audit: tp is exactly q41's verified set; counts cross-check q41/q42") {
    val Array((nCand, nTruth, tp, prec, rec, f1)) =
      SparkEntry.queries("q243_lsh_operating_point")(spark, sfDir)
        .as[(Long, Long, Long, Option[Double], Option[Double], Option[Double])].collect()
    // verified = candidates ∩ truth, so tp must equal q41's row count
    val q41 = SparkEntry.queries("q41_dedup_minhash_lsh")(spark, sfDir).count()
    val q42 = SparkEntry.queries("q42_dedup_jaccard")(spark, sfDir).count()
    assert(tp == q41)
    assert(nTruth == q42)
    assert(tp <= math.min(nCand, nTruth))
    prec.foreach(p => assert(p == round(tp.toDouble / nCand, 4)))
    rec.foreach(r => assert(r == round(tp.toDouble / nTruth, 4)))
    f1.foreach(f => assert(f == round(2.0 * tp / (nCand + nTruth), 4)))
  }

  test("q244 Friedman: within-block midrank replay; rank-sum conservation") {
    val out = SparkEntry.queries("q244_friedman_test")(spark, sfDir)
      .as[(String, Long, Double, Double, Boolean)].collect()
    val cells = Tables.events(spark, sfDir)
      .groupBy(org.apache.spark.sql.functions.to_date($"ts").cast("string").as("day"),
        $"event_type").count()
      .as[(String, String, Long)].collect()
    val days = cells.map(_._1).distinct
    val types = cells.map(_._2).distinct.sorted
    val k = types.length

    // doubled midranks within each day
    val q2 = scala.collection.mutable.Map[(String, String), Long]()
    for (d <- days) {
      val row = types.map(t => t -> cells.find(c => c._1 == d && c._2 == t).map(_._3).getOrElse(0L))
      for ((t, v) <- row) {
        val sm = row.count(_._2 < v); val tied = row.count(_._2 == v)
        q2((d, t)) = 2L * sm + tied + 1
      }
    }
    val r2j = types.map(t => t -> days.map(d => q2((d, t))).sum).toMap
    val n = days.length
    val sq2 = q2.values.map(q => q * q).sum
    val dev = types.foldLeft(0.0) { (acc, t) =>
      val d = r2j(t) / 2.0 - n * (k + 1) / 2.0; acc + d * d
    }
    val chi2 = (k - 1) * dev / (sq2 / 4.0 - n.toDouble * k * (k + 1) * (k + 1) / 4.0)

    assert(out.map(_._1).toSeq == types.toSeq)
    out.foreach { case (t, nb, rsum, c2, sig) =>
      assert(nb == n)
      assert(rsum == round(r2j(t) / 2.0, 1))
      assert(c2 == round(chi2, 4))
      assert(sig == (chi2 > 9.488))
    }
    // rank sums over all treatments total n·k(k+1)/2
    assert(out.map(_._3).sum == n.toDouble * k * (k + 1) / 2)
  }

  test("q245 Kruskal-Wallis: global midrank replay; mean ranks average to (N+1)/2") {
    val out = SparkEntry.queries("q245_kruskal_wallis")(spark, sfDir)
      .as[(String, Long, Double, Double, Boolean)].collect()
    val docs = Tables.documents(spark, sfDir)
      .select($"lang".as[String], $"n_chars".as[Long]).collect()
    val n = docs.length
    val cnt = docs.map(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val sorted = cnt.keys.toSeq.sorted
    val below = sorted.zip(sorted.scanLeft(0L)((a, v) => a + cnt(v)).dropRight(1)).toMap
    def q2(v: Long): Long = 2 * below(v) + cnt(v) + 1

    val groups = docs.groupBy(_._1)
    val langs = groups.keys.toSeq.sorted
    val r2j = langs.map(l => l -> groups(l).map(d => q2(d._2)).sum).toMap
    val ties = cnt.values.map(t => t * t * t - t).sum
    val sr = langs.foldLeft(0.0) { (acc, l) =>
      acc + (r2j(l) / 2.0) * (r2j(l) / 2.0) / groups(l).length
    }
    val hh = (12.0 / (n.toDouble * (n + 1)) * sr - 3.0 * (n + 1)) /
      (1.0 - ties.toDouble / (n.toDouble * n * n - n))
    assert(out.map(_._1).toSeq == langs)
    out.foreach { case (l, nj, mr, h, sig) =>
      assert(nj == groups(l).length)
      assert(mr == round(r2j(l) / 2.0 / nj, 4))
      assert(h == round(hh, 4))
      assert(sig == (hh > 9.488))
    }
    // weighted mean of the (4dp-rounded) mean ranks is the global
    // average rank (N+1)/2, up to the publication rounding
    val wm = out.map(r => r._3 * r._2).sum / n
    assert(math.abs(wm - (n + 1) / 2.0) < 1e-3)
  }

  test("q246 RBO: top-list replay; identical lists would score the truncated maximum") {
    val Array((depth, rboV, nShared, ov20)) =
      SparkEntry.queries("q246_rank_biased_overlap")(spark, sfDir)
        .as[(Long, Double, Long, Double)].collect()
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id".as[Long], $"text".as[String]).collect()
    val mid = (docs.map(_._1).max + 1) / 2
    def top20(half: Array[(Long, String)]): Seq[String] =
      half.flatMap(d => toks(d._2)).groupBy(identity).view.mapValues(_.length.toLong)
        .toSeq.sortBy { case (w, f) => (-f, w) }.take(20).map(_._1)
    val la = top20(docs.filter(_._1 < mid)); val lb = top20(docs.filter(_._1 >= mid))
    val ra = la.zipWithIndex.toMap; val rb = lb.zipWithIndex.toMap
    val ms = la.filter(rb.contains).map(w => math.max(ra(w) + 1, rb(w) + 1))
    assert(nShared == ms.length)
    assert(ov20 == round(ms.length / 20.0, 4))
    val expRbo = (1.0 - 0.9) * (1 to 20).foldLeft(0.0) { (acc, d) =>
      acc + math.pow(0.9, d - 1) * ms.count(_ <= d).toDouble / d
    }
    assert(depth == 20 && math.abs(rboV - expRbo) < 1e-5)
    // sanity: a list compared with itself scores the truncated maximum
    val maxRbo = (1.0 - 0.9) * (1 to 20).foldLeft(0.0)((acc, d) => acc + math.pow(0.9, d - 1))
    assert(rboV <= maxRbo + 1e-9)
  }

  test("q247 Cohen's kappa: cell/marginal replay; κ ≤ p_o bound") {
    val Array((n, agree, po, pe, kap)) =
      SparkEntry.queries("q247_cohens_kappa")(spark, sfDir)
        .as[(Long, Long, Double, Double, Double)].collect()
    val docs = Tables.documents(spark, sfDir)
      .select($"n_chars".as[Long], $"text".as[String]).collect()
    val stops = Set("the", "and", "of", "to", "a", "in", "is", "that", "it", "for")
    val votes = docs.map { case (nc, t) =>
      val ws = toks(t)
      val a = if (nc >= 300) 1 else if (nc < 80) -1 else 0
      val b = if (ws.isEmpty) 0
        else if (ws.count(stops).toDouble / ws.length >= 0.15) 1
        else if (ws.count(stops) == 0) -1 else 0
      (a, b)
    }
    assert(n == votes.length)
    assert(agree == votes.count(v => v._1 == v._2))
    val cats = Seq(-1, 0, 1)
    val peSum = cats.foldLeft(0.0) { (acc, c) =>
      acc + votes.count(_._1 == c).toDouble * votes.count(_._2 == c)
    }
    val poE = agree.toDouble / n
    val peE = peSum / (n.toDouble * n)
    assert(po == round(poE, 4) && pe == round(peE, 4))
    assert(kap == round((poE - peE) / (1.0 - peE), 6))
    assert(kap <= poE + 1e-9)
  }

  test("q248 Lorenz: sorted-prefix replay; monotone convex; terminal share is 1") {
    val out = SparkEntry.queries("q248_lorenz_curve")(spark, sfDir)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val v = Tables.orders(spark, sfDir)
      .selectExpr("CAST(round(o_totalprice * 100) AS BIGINT)").as[Long].collect().sorted
    val cs = v.scanLeft(0L)(_ + _).drop(1)
    val tot = cs.last
    out.foreach { case (d, k, share) =>
      assert(k == (d * v.length + 9) / 10)
      assert(share == round(cs(k.toInt - 1).toDouble / tot, 6))
    }
    assert(out.last._3 == 1.0)
    // convexity: increments are non-decreasing (poorest deciles hold least)
    val inc = out.map(_._3).zip(0.0 +: out.map(_._3).dropRight(1)).map(t => t._1 - t._2)
    assert(inc.zip(inc.drop(1)).forall { case (a, b) => b >= a - 1e-9 })
  }

  test("q249 Atkinson: domain-fold replay; AM-GM bound makes A ∈ [0, 1)") {
    val Array((n, mean, geo, a)) =
      SparkEntry.queries("q249_atkinson_index")(spark, sfDir)
        .as[(Long, Double, Double, Double)].collect()
    val xs = Tables.documents(spark, sfDir).select($"n_chars".as[Long]).collect()
    assert(n == xs.length)
    val cnt = xs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val meanE = xs.map(BigInt(_)).sum.toDouble / n
    val slog = cnt.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, (v, c)) =>
      acc + c * math.log(v.toDouble)
    }
    val geoE = math.exp(slog / n)
    assert(mean == round(meanE, 4) && geo == round(geoE, 4))
    assert(a == round(1.0 - geoE / meanE, 6))
    assert(a >= 0.0 && a < 1.0) // AM ≥ GM
  }

  test("q250 Gumbel: block-maxima moment replay; return level dominates the fit location") {
    val Array((n, meanMax, mu, beta, rl)) =
      SparkEntry.queries("q250_gumbel_return_level")(spark, sfDir)
        .as[(Long, Double, Double, Double, Double)].collect()
    val mx = Tables.events(spark, sfDir)
      .where($"event_type" === "purchase")
      .groupBy(org.apache.spark.sql.functions.to_date($"ts"))
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.expr("CAST(round(value * 100) AS BIGINT)")).as("mx"))
      .select($"mx".as[Long]).collect()
    assert(n == mx.length)
    val m = mx.map(BigInt(_)).sum.toDouble / mx.length
    val sd = math.sqrt((mx.map(x => BigInt(x) * BigInt(x)).sum.toDouble -
      mx.map(BigInt(_)).sum.toDouble * mx.map(BigInt(_)).sum.toDouble / mx.length) / (mx.length - 1))
    val b = 0.7796968012336293 * sd
    val u = m - 0.5772156649015329 * b
    assert(meanMax == round(m / 100.0, 4))
    assert(mu == round(u / 100.0, 4) && beta == round(b / 100.0, 4))
    assert(rl == round((u - b * math.log(-math.log(1.0 - 1.0 / 100))) / 100.0, 4))
    // the 100-day return level exceeds both the location and the mean max
    assert(rl > mu && rl > meanMax)
  }

  test("q251 CVaR: exact tail replay; CVaR ≥ VaR and ≤ max") {
    val Array((n, var95, nTail, cvar95)) =
      SparkEntry.queries("q251_cvar")(spark, sfDir)
        .as[(Long, Double, Long, Double)].collect()
    val v = Tables.events(spark, sfDir).where($"event_type" === "purchase")
      .selectExpr("CAST(round(value * 100) AS BIGINT)").as[Long].collect().sorted
    assert(n == v.length)
    // percentile interpolation at p=0.95
    val pos = 0.95 * (v.length - 1)
    val varE = v(pos.toInt) + (pos - pos.toInt) * (v(math.min(pos.toInt + 1, v.length - 1)) - v(pos.toInt))
    assert(var95 == round(varE / 100.0, 4))
    val tail = v.filter(_ > varE)
    assert(nTail == tail.length)
    val cvarE = (tail.map(BigInt(_)).sum.toDouble + (n * 0.05 - tail.length) * varE) / (n * 0.05)
    assert(cvar95 == round(cvarE / 100.0, 4))
    assert(cvar95 >= var95 - 1e-9 && cvar95 <= v.last / 100.0 + 1e-9)
  }

  test("q252 partial correlation: BigInt-moment replay; |r_partial| ≤ 1") {
    val out = SparkEntry.queries("q252_partial_correlation")(spark, sfDir)
      .as[(String, String, Double, Double)].collect()
    val rows = Tables.lineitem(spark, sfDir)
      .selectExpr("CAST(round(l_quantity * 100) AS BIGINT)",
        "CAST(round(l_extendedprice * 100) AS BIGINT)",
        "CAST(round(l_discount * 100) AS BIGINT)",
        "CAST(round(l_tax * 100) AS BIGINT)")
      .as[(Long, Long, Long, Long)].collect()
      .map(t => Array(t._1, t._2, t._3, t._4))
    val n = BigInt(rows.length)
    def r(i: Int, j: Int): Double = {
      val si = rows.map(x => BigInt(x(i))).sum; val sj = rows.map(x => BigInt(x(j))).sum
      val sij = rows.map(x => BigInt(x(i)) * BigInt(x(j))).sum
      val sii = rows.map(x => BigInt(x(i)) * BigInt(x(i))).sum
      val sjj = rows.map(x => BigInt(x(j)) * BigInt(x(j))).sum
      (n * sij - si * sj).toDouble /
        (math.sqrt((n * sii - si * si).toDouble) * math.sqrt((n * sjj - sj * sj).toDouble))
    }
    // columns: 0=quantity, 1=extendedprice(z), 2=discount, 3=tax
    val idx = Map("quantity" -> 0, "discount" -> 2, "tax" -> 3)
    out.foreach { case (x, y, rRaw, rPart) =>
      val (i, j) = (idx(x), idx(y))
      val rxy = r(math.min(i, j), math.max(i, j))
      val rxz = r(math.min(i, 1), math.max(i, 1)); val ryz = r(math.min(j, 1), math.max(j, 1))
      assert(rRaw == round(rxy, 6))
      assert(rPart == round((rxy - rxz * ryz) /
        (math.sqrt(1.0 - rxz * rxz) * math.sqrt(1.0 - ryz * ryz)), 6))
      assert(math.abs(rPart) <= 1.0)
    }
  }

  test("q253 ICC(1): mean-square replay; ICC bounded by (-1/(n0-1), 1]") {
    val Array((k, n, msb, msw, n0, icc1)) =
      SparkEntry.queries("q253_intraclass_correlation")(spark, sfDir)
        .as[(Long, Long, Double, Double, Double, Double)].collect()
    val docs = Tables.documents(spark, sfDir)
      .select($"source".as[String], $"n_chars".as[Long]).collect()
    val g = docs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(k == g.size && n == docs.length)
    val st = docs.map(d => BigInt(d._2)).sum
    val sst = docs.map(d => BigInt(d._2) * BigInt(d._2)).sum
    val sgg = g.keys.toSeq.sorted.foldLeft(0.0) { (acc, src) =>
      val s = g(src).map(BigInt(_)).sum
      acc + s.toDouble * s.toDouble / g(src).length
    }
    val msbE = (sgg - st.toDouble * st.toDouble / n) / (k - 1)
    val mswE = (sst.toDouble - sgg) / (n - k)
    val sn2 = g.values.map(v => v.length.toLong * v.length).sum
    val n0E = (n.toDouble - sn2.toDouble / n) / (k - 1)
    assert(msb == round(msbE, 4) && msw == round(mswE, 4) && n0 == round(n0E, 4))
    assert(icc1 == round((msbE - mswE) / (msbE + (n0E - 1) * mswE), 6))
    assert(icc1 > -1.0 / (n0E - 1) - 1e-9 && icc1 <= 1.0)
  }
}
