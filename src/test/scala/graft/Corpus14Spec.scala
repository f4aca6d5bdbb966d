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

  test("q273: local normalized-tf-idf scoring replay; margins pinned off the threshold") {
    val t0 = operators.Corpus14.QThreshold
    val got = SparkEntry.queries("q273_quality_classifier_gate")(spark, sfDir)
      .as[(Long, Boolean, Boolean, Boolean)].collect().toSeq
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    got.foreach { case (id, clf, _, _) =>
      assert(clf == (margin(docs(id)) > t0), s"doc $id")
    }
    // the threshold-sign output is hash-safe only while no corpus margin
    // sits AT the deployed threshold — pin the clearance well above
    // engine float-association noise (~1e-13; the q74 |margin|
    // discipline, corpus-wide — measured clearance at t=0.03:
    // 4.0e-4 / 1.9e-4 / 7.4e-6 at sf0.001/0.01/0.1)
    val minAbs = docs.values.map(t => math.abs(margin(t) - t0)).min
    assert(minAbs >= 1e-5, s"min |margin - $t0| $minAbs")
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

  test("q275 lang gate: local replay; injected docs flip language; keep = argmax en") {
    val bats = operators.TextAnalytics.langBatteries.map { case (l, ws) => (l, ws.toSet) }
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val got = SparkEntry.queries("q275_langid_gate")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, String, Boolean)].collect().toSeq
    val expected = docs.map { case (id, text) =>
      val t = text +
        (if (id % 17 == 4) " el que y en" * 40 else "") +
        (if (id % 19 == 6) " der und ist von" * 40 else "")
      val w = t.toLowerCase.split(' ').filter(_.nonEmpty)
      val counts = bats.map { case (l, ws) => (l, w.count(ws).toLong) }
      // argmax with battery-table-order tie-break
      val p = counts.zipWithIndex
        .find { case ((_, c), i) => counts.drop(i + 1).forall(c >= _._2) }.get._1._1
      (id, counts(0)._2, counts(1)._2, counts(2)._2, counts(3)._2, p, p == "en")
    }.sortBy(_._1)
    assert(got == expected)
    // every injected doc flips to its injected language (160 hits beat a
    // <=100-token doc by construction), clean docs all stay en, the ru
    // battery scores ZERO on this Latin-script corpus (its path is
    // proven on a Cyrillic fixture below), and the gate drops a real
    // minority
    got.foreach { case (id, _, _, _, nr, p, k) =>
      assert(nr == 0L, s"doc $id has Cyrillic battery hits on a Latin corpus")
      if (id % 17 == 4) assert(p == "es" && !k, s"doc $id")
      else if (id % 19 == 6) assert(p == "de" && !k, s"doc $id")
      else assert(p == "en" && k, s"doc $id")
    }
    val drops = got.count(!_._7)
    assert(drops > 0 && drops < got.size / 5)
  }

  test("q275 battery is data: the non-Latin-script (Cyrillic) row works through the gate body") {
    // the tokenizer chain (lower/split/IN-list) must be honest UTF-8 —
    // nothing may assume ASCII. doc_ids dodge the dirty-twin injections
    // (% 17 != 4, % 19 != 6) so the fixture text is what gets scored.
    val docs = Seq(
      (1L, "и в не на что с он как и в не"),
      (2L, "the data of the table is to scan and to sort"))
      .toDF("doc_id", "text")
    val got = operators.Corpus14.langGateDecisions(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, String, Boolean)].collect().toSeq
    assert(got(0) == ((1L, 0L, 0L, 0L, 11L, "ru", false)), got(0).toString)
    assert(got(1)._6 == "en" && got(1)._7)
  }

  test("q276 operating point: holdout replay, threshold cells, margins clear of every t") {
    import operators.Corpus14.{marginThresholds, qualityFixture, qualityHoldout, QThreshold}
    // the holdout is genuinely held out — zero overlap with the fit rows
    val trainTexts = qualityFixture.map(_._1).toSet
    qualityHoldout.foreach { case (t, _) => assert(!trainTexts(t)) }
    // r12 resolution contract: ≥24 rows, balanced, all distinct — so
    // precision/recall move in steps of ~1/12, not the old 1/4
    assert(qualityHoldout.size >= 24)
    assert(qualityHoldout.count(_._2 == "quality") == qualityHoldout.size / 2)
    assert(qualityHoldout.map(_._1).distinct.size == qualityHoldout.size)
    val got = SparkEntry.queries("q276_clf_operating_point")(spark, sfDir)
      .as[(Double, Long, Long, Long, Long, Double, Double, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got.map(_._1) == marginThresholds)
    // local replay of the holdout confusion at every threshold
    val hm = qualityHoldout.map { case (text, label) => (margin(text), label) }
    got.foreach { case (t, tp, fp, fn, tn, _, _, _, _, _, _) =>
      assert(tp == hm.count(x => x._1 > t && x._2 == "quality").toLong)
      assert(fp == hm.count(x => x._1 > t && x._2 != "quality").toLong)
      assert(fn == hm.count(x => x._1 <= t && x._2 == "quality").toLong)
      assert(tn == hm.count(x => x._1 <= t && x._2 != "quality").toLong)
    }
    // r13 discriminative-holdout contract: the boundary rows make the
    // sweep genuinely trade precision against recall — recall strictly
    // falls as t rises (every notch pays), precision is non-decreasing
    // and takes >1 value (no longer saturated at 1.0 everywhere)
    val recalls = got.map(_._7)
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a > b },
      s"recall not strictly decreasing: $recalls")
    val precisions = got.map(_._6)
    assert(precisions.zip(precisions.tail).forall { case (a, b) => a <= b })
    assert(precisions.distinct.size > 1, s"precision saturated: $precisions")
    // the DEPLOYED threshold is now EVIDENCE, not tie-break: under the
    // precision-first operating rule (junk admitted to a pretraining
    // corpus costs more than surplus quality discarded — FineWeb-Edu /
    // Gopher stance), QThreshold is the unique max-recall threshold
    // among those with holdout precision 1.0 — the quality-adjacent
    // junk row at margin +0.0122 makes every looser t pay precision
    val atT = got.find(_._1 == QThreshold).get
    assert(atT._6 == 1.0, s"holdout precision at deployed t: ${atT._6}")
    assert(got.filter(_._6 == 1.0).maxBy(_._7)._1 == QThreshold,
      "QThreshold is not the max-recall precision-1.0 threshold")
    // and the trade is real: the deployed point pays boundary recall
    assert(atT._7 < 1.0)
    // corpus agreement cells replay vs q273/q100 flags at the deployed
    // threshold (q273 publishes margin > QThreshold), and every row's
    // four cells sum to the corpus size
    val q273 = SparkEntry.queries("q273_quality_classifier_gate")(spark, sfDir)
      .as[(Long, Boolean, Boolean, Boolean)].collect().toSeq
    val n = q273.size.toLong
    got.foreach { case (_, _, _, _, _, _, _, bk, co, ro, bd) =>
      assert(bk + co + ro + bd == n)
    }
    val atTc = got.find(_._1 == QThreshold).get
    assert(atTc._8 == q273.count(r => r._2 && r._3).toLong)
    assert(atTc._9 == q273.count(r => r._2 && !r._3).toLong)
    assert(atTc._10 == q273.count(r => !r._2 && r._3).toLong)
    assert(atTc._11 == q273.count(r => !r._2 && !r._3).toLong)
    // hash-safety: every corpus AND holdout margin is pinned >= 1e-6 away
    // from every published threshold, so engine float-association jitter
    // cannot flip a counted cell (the q273 min-|margin| discipline,
    // extended to the sweep). The floor is 1e-6, not q273's 1e-5: the
    // sweep's brackets land inside the corpus's dense positive-margin
    // region (measured clearance over the full 4-threshold sweep:
    // 1.0e-4 at sf0.001, 1.9e-4 at sf0.01, 7.4e-6 at sf0.1), while the
    // jitter the pin must dominate — double-association error of a
    // ≤40-term sum of O(0.1) values — is bounded near 1e-13, seven
    // orders below the pin.
    val docs = Tables.documents(spark, sfDir)
      .select("text").as[String].collect().toSeq
    val margins = docs.map(margin) ++ hm.map(_._1)
    val minGap = (for (m <- margins; t <- marginThresholds) yield math.abs(m - t)).min
    assert(minGap >= 1e-6, s"min |margin - t| $minGap")
  }

  test("q278 reliability: bin/rate replay, ECE arithmetic, monotone confidence") {
    import operators.Corpus14.{qualityHoldout, reliabilityEdges}
    val edges = reliabilityEdges
    // the diagram's bins reuse the sweep's thresholds EXACTLY — one edge
    // list, one clearance pin (the q276 test above measures it)
    assert(edges == operators.Corpus14.marginThresholds.sorted)
    val got = SparkEntry.queries("q278_clf_reliability")(spark, sfDir)
      .as[(String, Int, String, String, Long, Double, Double, Double, Double)]
      .collect().toSeq
    def binOf(m: Double): Int =
      edges.zipWithIndex.collectFirst { case (e, i) if m <= e => i }
        .getOrElse(edges.size)
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // scope truths: corpus = (margin, rule keep) via q273's published
    // rule column (≡ q100), holdout = (margin, label)
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val rk = SparkEntry.queries("q273_quality_classifier_gate")(spark, sfDir)
      .as[(Long, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> r._3).toMap
    val corpus = docs.toSeq.map { case (id, t) => (margin(t), rk(id)) }
    val holdout = qualityHoldout.map { case (t, l) => (margin(t), l == "quality") }
    val truth = Map("corpus" -> corpus, "holdout" -> holdout)
    assert(got.map(_._1).toSet == truth.keySet)
    for ((scope, rows) <- truth) {
      val pub = got.filter(_._1 == scope)
      // bins partition the scope: counts replay bin-by-bin, absent bins empty
      val exp = rows.groupBy(x => binOf(x._1))
      assert(pub.map(_._2).toSet == exp.keySet)
      assert(pub.map(r => r._2 -> r._5).toMap ==
        exp.view.mapValues(_.size.toLong).toMap)
      // per-bin aggregates replay under the same round-4 discipline
      pub.foreach { case (_, bin, _, _, n, avgP, posRate, gap, _) =>
        val xs = exp(bin)
        assert(avgP == r4(xs.map(x => 1.0 / (1.0 + math.exp(-x._1))).sum / n))
        assert(posRate == r4(xs.count(_._2).toDouble / n))
        assert(gap == r4(math.abs(avgP - posRate)))
      }
      // ECE is exact arithmetic over the published (rounded) rows
      val ece = r4(pub.map(r => r._8 * r._5).sum / pub.map(_._5).sum)
      assert(pub.forall(_._9 == ece), s"$scope ece ${pub.map(_._9).distinct}")
      // mean confidence is strictly monotone across occupied bins (bins
      // are margin-ordered and sigmoid is monotone)
      val byBin = pub.sortBy(_._2).map(_._6)
      assert(byBin.zip(byBin.tail).forall { case (a, b) => a < b }, s"$scope $byBin")
      // bin labels are the edge list verbatim
      pub.foreach { case (_, bin, lo, hi, _, _, _, _, _) =>
        assert(lo == (("-inf" +: edges.map(_.toString)))(bin))
        assert(hi == ((edges.map(_.toString) :+ "inf"))(bin))
      }
    }
    // the audit says something: the holdout's extreme bins are PURE
    // (perfectly separated labels), so ECE there reads the probability
    // scale's honesty, not classification error
    val h = got.filter(_._1 == "holdout").sortBy(_._2)
    assert(h.head._7 == 0.0 && h.last._7 == 1.0)
  }

  test("q279 temperature scaling: metric replay, argmin choice, holdout/corpus tension") {
    import operators.Corpus14.{qualityHoldout, temperatureGrid}
    // exact binary fractions only — m/T must be an exact rescaling
    temperatureGrid.foreach { t =>
      assert(java.lang.Double.toHexString(t).matches("0x1\\.0p-?\\d+"), s"$t")
    }
    val got = SparkEntry.queries("q279_temperature_scaling")(spark, sfDir)
      .as[(Double, Double, Double, Double, Boolean)].collect().toSeq
    assert(got.map(_._1) == temperatureGrid.sorted)
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def sig(m: Double, t: Double): Double = 1.0 / (1.0 + math.exp(-m / t))
    // local replay of all three metrics per temperature
    val hm = qualityHoldout.map { case (text, l) => (margin(text), l == "quality") }
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect()
    val rk = SparkEntry.queries("q273_quality_classifier_gate")(spark, sfDir)
      .as[(Long, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> r._3).toMap
    val cm = docs.map { case (id, t) => (margin(t), rk(id)) }
    got.foreach { case (t, nll, brier, cbrier, _) =>
      assert(nll == r4(hm.map { case (m, y) =>
        -math.log(if (y) sig(m, t) else 1.0 - sig(m, t))
      }.sum / hm.size))
      assert(brier == r4(hm.map { case (m, y) =>
        math.pow(sig(m, t) - (if (y) 1.0 else 0.0), 2)
      }.sum / hm.size))
      assert(cbrier == r4(cm.map { case (m, y) =>
        math.pow(sig(m, t) - (if (y) 1.0 else 0.0), 2)
      }.sum / cm.size))
    }
    // chosen = unique holdout-NLL argmin (tie-break: larger T)
    val chosen = got.filter(_._5)
    assert(chosen.size == 1)
    assert(chosen.head == got.sortBy(r => (r._2, -r._1)).head)
    // r13: on the boundary holdout the NLL(T) curve is a genuine
    // VALLEY — the chosen T is strictly interior (not a grid edge) and
    // both grid neighbors are strictly worse, so the argmin is a
    // finding about the probability scale, not "sharpest wins" (the
    // r12 verdict's degeneracy, closed by the wrong-side boundary rows
    // whose NLL pays |m|/T as T → 0)
    val byT = got.sortBy(_._1)
    val ci = byT.indexWhere(_._5)
    assert(ci > 0 && ci < byT.size - 1, s"chosen T is a grid edge: $ci")
    assert(byT(ci - 1)._2 > byT(ci)._2 && byT(ci + 1)._2 > byT(ci)._2)
    // and the published TENSION: the corpus-vs-rule Brier does NOT
    // reward the holdout's choice — its optimum is a milder interior T
    // and the holdout-chosen T is strictly worse than even the
    // unscaled T=1 (confident disagreement on ~40% of docs penalized
    // quadratically) — the measured reason raw σ(margin/T_chosen) must
    // not be shipped as corpus sampling weights unchecked
    val byCorpus = got.minBy(r => (r._4, -r._1))
    assert(byCorpus._1 != chosen.head._1)
    assert(chosen.head._4 > got.find(_._1 == 1.0).get._4)
  }

  test("q280 domain reweighting: loss replay, DRO tilt arithmetic, hard domains up") {
    import operators.Corpus14.{DoremiAlpha, DoremiEta, DoremiT}
    // T* is q279's corpus-Brier optimum, read from its own published row
    val q279 = SparkEntry.queries("q279_temperature_scaling")(spark, sfDir)
      .as[(Double, Double, Double, Double, Boolean)].collect().toSeq
    assert(q279.minBy(r => (r._4, -r._1))._1 == DoremiT,
      "DoremiT is not the corpus-Brier-optimal temperature q279 publishes")
    val got = SparkEntry.queries("q280_domain_reweight")(spark, sfDir)
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // per-domain mean loss replayed from raw text: calibrated
    // cross-entropy of the classifier vs the rule verdict
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text", "source").as[(Long, String, String)].collect()
    val rk = SparkEntry.queries("q273_quality_classifier_gate")(spark, sfDir)
      .as[(Long, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> r._3).toMap
    val byDom = docs.groupBy(_._3).view.mapValues { rows =>
      rows.map { case (id, t, _) =>
        val p = 1.0 / (1.0 + math.exp(-margin(t) / DoremiT))
        val y = if (rk(id)) 1.0 else 0.0
        -(y * math.log(p) + (1.0 - y) * math.log(1.0 - p))
      }
    }.toMap
    assert(got.map(_._1) == byDom.keys.toSeq.sorted)
    got.foreach { case (s, n, ml, _, _, _) =>
      assert(n == byDom(s).size.toLong)
      assert(ml == r4(byDom(s).sum / n), s"$s mean loss")
    }
    // the tilt is exact arithmetic on the published rounded means
    val base = r4(got.map(_._3).sum / got.size)
    val tilts = got.map(r => math.exp(DoremiEta * r4(r._3 - base)))
    val z = tilts.sum
    got.zip(tilts).foreach { case ((s, _, ml, ex, wr, ws), t) =>
      assert(ex == r4(ml - base), s"$s excess")
      assert(wr == r4(t / z), s"$s w_raw")
      assert(ws == r4(DoremiAlpha * t / z + (1.0 - DoremiAlpha) / got.size), s"$s w_smoothed")
    }
    // both weight columns are distributions (rounding slack 0.5e-4/row)
    Seq(got.map(_._5), got.map(_._6)).foreach { ws =>
      assert(math.abs(ws.sum - 1.0) <= 0.5e-4 * got.size)
    }
    // the DRO direction: the hardest domain (max mean loss) carries the
    // max weight, the easiest the min, and smoothing contracts toward
    // uniform without reordering
    val hardest = got.maxBy(_._3); val easiest = got.minBy(_._3)
    assert(hardest._5 == got.map(_._5).max && easiest._5 == got.map(_._5).min)
    // (slack: each published weight is independently round-4'd, so the
    // exact ws = α·wr + (1−α)·u identity holds only to ~0.75e-4)
    val u = 1.0 / got.size
    got.foreach { case (_, _, _, _, wr, ws) =>
      assert(math.abs(ws - u) <= DoremiAlpha * math.abs(wr - u) + 1e-4)
    }
    // the signal is real: the tilt separates domains (not a constant column)
    assert(got.map(_._5).distinct.size > 1)
  }

  test("q282 doremi sample: targets replay from q280's weights, membership replays the hash") {
    // the consumer's contract: targets derive from q280's PUBLISHED
    // table (integer arithmetic on the round-4 weights) and membership
    // is the q104 content-hash bucket — both replayed independently
    val w = SparkEntry.queries("q280_domain_reweight")(spark, sfDir)
      .as[(String, Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, math.round(r._6 * 10000))).toMap
    val nTotal = w.values.collect { case (n, wu) if wu > 0 => n * 10000L / wu }.min
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source").as[(Long, String)].collect()
    def u(id: Long): Long = {
      val hx = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(2).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hx, 16)
    }
    val exp = docs.groupBy(_._2).view.mapValues { rows =>
      val (n, wu) = w(rows.head._2)
      val tgt = nTotal * wu / 10000L
      (n, tgt, rows.count { case (id, _) => u(id) * n < 65536L * tgt }.toLong)
    }.toMap
    // columns: source, n_docs, w_target, n_target, n_sampled, achieved, gap
    val got2 = SparkEntry.queries("q282_doremi_sample")(spark, sfDir)
      .as[(String, Long, Double, Long, Long, Double, Double)].collect().toSeq
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got2.map(_._1) == exp.keys.toSeq.sorted)
    val totalSampled = got2.map(_._5).sum
    got2.foreach { case (s, n, wt, tgt, smp, ach, gap) =>
      val (en, etgt, esmp) = exp(s)
      assert(n == en)
      assert(wt == w(s)._2 / 10000.0, s"$s w_target")
      assert(tgt == etgt, s"$s n_target")
      // the target never exhausts the domain (the N = min_d bound)
      assert(tgt <= n)
      assert(smp == esmp, s"$s n_sampled")
      assert(ach == r4(smp.toDouble / totalSampled))
      assert(gap == r4(math.abs(ach - wt)))
    }
    // achieved shares are a distribution, and the sample is a real
    // subset (neither empty nor the whole corpus)
    assert(math.abs(got2.map(_._6).sum - 1.0) <= 0.5e-4 * got2.size)
    assert(totalSampled > 0 && totalSampled < docs.length)
    assert(got2 == got2.sortBy(_._1))
  }

  test("q283 lm perplexity: LM replay from survivors, integer tercile split, clearance") {
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    // reference = the rule-gate survivors, read from q273's published
    // rule column (≡ q100) — the same truth source the other replays use
    val rk = SparkEntry.queries("q273_quality_classifier_gate")(spark, sfDir)
      .as[(Long, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> r._3).toMap
    val ref = docs.filter { case (id, _) => rk(id) }
    // q283 runs on the RAW tokenizer (no stopword filter — an LM needs
    // function words), unlike the classifier-margin replays above
    def rawToks(t: String): Seq[String] =
      t.toLowerCase.split(' ').toSeq.filter(_.nonEmpty)
    def bigrams(t: String): Seq[(String, String)] = {
      val w = rawToks(t); if (w.size < 2) Nil else w.zip(w.tail)
    }
    val c12 = ref.flatMap(d => bigrams(d._2)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val c1 = ref.flatMap(d => bigrams(d._2)).groupBy(_._1)
      .view.mapValues(_.size.toLong).toMap
    val v = ref.flatMap(d => rawToks(d._2)).distinct.size.toLong
    // per-doc score replay under the exact-integer log-argument form
    val exp0 = docs.flatMap { case (id, t) =>
      val bs = bigrams(t)
      if (bs.isEmpty) None else {
        val lpRaw = bs.map { bg =>
          math.log(2L * c12.getOrElse(bg, 0L) + 1L) -
            math.log(2L * c1.getOrElse(bg._1, 0L) + v)
        }.sum
        val lp = r4(lpRaw)
        val ppl = r4(math.exp(-lp / bs.size))
        Some((id, bs.size.toLong, lp, ppl, lpRaw))
      }
    }
    // tercile replay: integer rank on (ppl4, doc_id), integer thirds
    val ranked = exp0.sortBy(e => (math.round(e._4 * 10000), e._1))
    val n = ranked.size
    val terc = ranked.zipWithIndex.map { case (e, i) =>
      val rnk = i + 1
      e._1 -> (if (rnk <= n / 3) "head"
               else if (rnk <= 2 * n / 3) "middle" else "tail")
    }.toMap
    val got = SparkEntry.queries("q283_lm_perplexity")(spark, sfDir)
      .as[(Long, Long, Double, Double, String, Boolean)].collect().toSeq
    assert(got.map(_._1) == exp0.map(_._1).sorted,
      "exactly the >=2-token docs are scored")
    val byId = exp0.map(e => e._1 -> e).toMap
    got.foreach { case (id, nb, lp, ppl, tc, keep) =>
      val e = byId(id)
      assert(nb == e._2, s"doc $id n_bigrams")
      assert(lp == e._3, s"doc $id log_prob")
      assert(ppl == e._4, s"doc $id ppl")
      assert(tc == terc(id), s"doc $id tercile")
      assert(keep == (tc != "tail"))
    }
    // CCNet thirds: sizes n/3, n/3, the remainder; ascending ppl bands
    val sizes = got.groupBy(_._5).view.mapValues(_.size).toMap
    assert(sizes("head") == n / 3 && sizes("middle") == 2 * n / 3 - n / 3)
    assert(got.filter(_._5 == "head").map(_._4).max <=
      got.filter(_._5 == "middle").map(_._4).min)
    assert(got.filter(_._5 == "middle").map(_._4).max <=
      got.filter(_._5 == "tail").map(_._4).min)
    // the signal is real: the tail is materially worse than the head
    assert(got.filter(_._5 == "tail").map(_._4).max >
      1.2 * got.filter(_._5 == "head").map(_._4).min)
    // hash-safety clearance: the raw log-prob sum (the only float sum
    // crossing the engines) sits >= 1e-6 away from its round-4 boundary
    // on every doc, >> the ~1e-13 summation-order jitter
    val clear = exp0.map { e =>
      val f = e._5 * 1e4
      math.abs(f - math.floor(f) - 0.5)
    }.min
    assert(clear >= 1e-6, s"log_prob rounding clearance $clear")
  }

  test("q284 dsir: hashed-model replay, deterministic top-quarter, selection enriches quality") {
    import operators.Corpus14.{DsirBuckets, DsirKeepDen}
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def rawToks(t: String): Seq[String] =
      t.toLowerCase.split(' ').toSeq.filter(_.nonEmpty)
    def bucket(bg: String): Long = {
      val hx = java.security.MessageDigest.getInstance("MD5")
        .digest(bg.getBytes("UTF-8")).take(2).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hx, 16) % DsirBuckets
    }
    def feats(t: String): Seq[Long] = {
      val w = rawToks(t)
      if (w.size < 2) Nil else w.zip(w.tail).map { case (a, b) => bucket(s"$a $b") }
    }
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val rk = SparkEntry.queries("q273_quality_classifier_gate")(spark, sfDir)
      .as[(Long, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> r._3).toMap
    val tfs = docs.filter(d => rk(d._1)).flatMap(d => feats(d._2))
    val rfs = docs.flatMap(d => feats(d._2))
    val tb = tfs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rb = rfs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (tc, rc) = (tfs.size.toLong, rfs.size.toLong)
    val exp0 = docs.flatMap { case (id, t) =>
      val fs = feats(t)
      if (fs.isEmpty) None else {
        val lwRaw = fs.map { b =>
          math.log(2L * tb.getOrElse(b, 0L) + 1L) - math.log(2L * tc + DsirBuckets) -
            math.log(2L * rb.getOrElse(b, 0L) + 1L) + math.log(2L * rc + DsirBuckets)
        }.sum
        Some((id, fs.size.toLong, r4(lwRaw), lwRaw))
      }
    }
    val n = exp0.size
    val selected = exp0.sortBy(e => (-math.round(e._3 * 10000), e._1))
      .take((n / DsirKeepDen).toInt).map(_._1).toSet
    val got = SparkEntry.queries("q284_dsir_select")(spark, sfDir)
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(got.map(_._1) == exp0.map(_._1).sorted)
    val byId = exp0.map(e => e._1 -> e).toMap
    got.foreach { case (id, nb, lw, sel) =>
      assert(nb == byId(id)._2, s"doc $id n_bigrams")
      assert(lw == byId(id)._3, s"doc $id log_w")
      assert(sel == selected(id), s"doc $id selected")
    }
    assert(got.count(_._4) == (n / DsirKeepDen).toInt)
    // THE DSIR CLAIM, measured: importance selection enriches the
    // target distribution — the selected quarter's rule-gate keep rate
    // strictly exceeds the corpus rate
    val selRate = got.filter(_._4).count(g => rk(g._1)).toDouble / got.count(_._4)
    val allRate = docs.count(d => rk(d._1)).toDouble / docs.size
    assert(selRate > allRate,
      s"selection does not enrich quality: $selRate vs corpus $allRate")
    // hash-safety clearance on the one cross-engine float sum
    val clear = exp0.map { e =>
      val f = e._4 * 1e4
      math.abs(f - math.floor(f) - 0.5)
    }.min
    assert(clear >= 1e-6, s"log_w rounding clearance $clear")
  }

  test("q285 quality cube: cells replay from the four standalone signals; real dissent") {
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // the truth source is the four signals' OWN published queries —
    // the cube must fold exactly their joint distribution
    val rule = SparkEntry.queries("q273_quality_classifier_gate")(spark, sfDir)
      .as[(Long, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> r._3).toMap
    val clf = SparkEntry.queries("q273_quality_classifier_gate")(spark, sfDir)
      .as[(Long, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> r._2).toMap
    val ppl = SparkEntry.queries("q283_lm_perplexity")(spark, sfDir)
      .as[(Long, Long, Double, Double, String, Boolean)].collect()
      .map(r => r._1 -> r._6).toMap
    val dsir = SparkEntry.queries("q284_dsir_select")(spark, sfDir)
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r._4).toMap
    val exp = rule.keys.toSeq
      .map(id => (rule(id), clf(id), ppl(id), dsir(id)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("q285_quality_signal_cube")(spark, sfDir)
      .as[(Boolean, Boolean, Boolean, Boolean, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3, r._4)).toSet == exp.keySet)
    val n = exp.values.sum
    got.foreach { case (a, b, c, d, nd, sh) =>
      assert(nd == exp((a, b, c, d)), s"cell ($a,$b,$c,$d)")
      assert(sh == r4(nd.toDouble / n), s"share ($a,$b,$c,$d)")
    }
    // the cube partitions the corpus; shares are a distribution
    assert(got.map(_._5).sum == n)
    assert(math.abs(got.map(_._6).sum - 1.0) <= 0.5e-4 * got.size)
    // the audit says something: every signal dissents somewhere (both
    // values of each flag occur across cells), all-four-agree keep is
    // the modal bulk, and the signals are not one signal in disguise
    Seq(got.map(_._1), got.map(_._2), got.map(_._3), got.map(_._4))
      .foreach(fs => assert(fs.distinct.size == 2))
    assert(got.size > 2 && got.size <= 16)
    assert(exp.getOrElse((true, true, true, true), 0L) > 0)
  }

  test("q286 ensemble verdict: replay from the four standalone signals; pivotal accounting") {
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = SparkEntry.queries("q273_quality_classifier_gate")(spark, sfDir)
      .as[(Long, Boolean, Boolean, Boolean)].collect()
    val rule = rows.map(r => r._1 -> r._3).toMap
    val clf = rows.map(r => r._1 -> r._2).toMap
    val ppl = SparkEntry.queries("q283_lm_perplexity")(spark, sfDir)
      .as[(Long, Long, Double, Double, String, Boolean)].collect()
      .map(r => r._1 -> r._6).toMap
    val dsir = SparkEntry.queries("q284_dsir_select")(spark, sfDir)
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r._4).toMap
    val ids = rule.keys.toSeq
    // the published decision rule, replayed per doc — and per-signal
    // pivotality by DEFINITION (flip the one signal, recompute)
    def ensOf(r: Boolean, c: Boolean, p: Boolean, d: Boolean) =
      r && Seq(c, p, d).count(identity) >= 2
    def ens(id: Long) = ensOf(rule(id), clf(id), ppl(id), dsir(id))
    def pivot(id: Long, s: String): Boolean = {
      val (r, c, p, d) = (rule(id), clf(id), ppl(id), dsir(id))
      val flipped = s match {
        case "rule" => ensOf(!r, c, p, d)
        case "clf"  => ensOf(r, !c, p, d)
        case "ppl"  => ensOf(r, c, !p, d)
        case "dsir" => ensOf(r, c, p, !d)
      }
      flipped != ens(id)
    }
    val kept = ids.count(ens)
    val n = ids.size
    val got = SparkEntry.queries("q286_ensemble_verdict")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq("clf", "dsir", "ppl", "rule"))
    got.foreach { case (sig, nk, us, uk, ek, nt, red) =>
      val keepMap: Long => Boolean = sig match {
        case "rule" => rule
        case "clf"  => clf
        case "ppl"  => ppl
        case "dsir" => dsir
      }
      assert(nk == ids.count(keepMap), s"$sig n_keep")
      assert(us == ids.count(id => ens(id) && pivot(id, sig)), s"$sig unique_save")
      assert(uk == ids.count(id => !ens(id) && pivot(id, sig)), s"$sig unique_kill")
      assert(ek == kept && nt == n, s"$sig totals")
      assert(red == r4((n - kept).toDouble / n), s"$sig reduction")
    }
    // the policy does real work at this SF: a strict subset is kept,
    // and every signal's vote is pivotal somewhere (no ceremonial column)
    assert(kept > 0 && kept < n)
    got.foreach(g => assert(g._3 + g._4 > 0, s"${g._1} never pivotal"))
  }

  test("q283 LM vocab cap: OOV bounds the model by construction; inert at this SF") {
    import operators.Corpus14.{LmVocabCap, LmOovSymbol}
    // (a) inert on this corpus: vocabulary ≪ cap, so no OOV row exists
    // in the trained tables — the documented reason no published q283
    // value moved when the cap landed
    val docs = Tables.documents(spark, sfDir)
    val ref = docs.join(operators.Corpus.qualityGate(docs)
      .filter($"keep").select("doc_id"), Seq("doc_id"), "left_semi")
    val (lm2, _, _, vt) = operators.Corpus14.lmModels(ref)
    assert(vt.count() <= LmVocabCap)
    assert(lm2.filter($"w1" === LmOovSymbol || $"w2" === LmOovSymbol).count() == 0,
      "corpus vocabulary exceeds the cap — published q283 values now depend on OOV")
    // (b) the bound BITES on an over-cap corpus: with a tiny cap the
    // model stays ≤ (cap+1)² rows REGARDLESS of corpus vocabulary
    val wide = spark.range(0, 40).selectExpr("id AS doc_id",
      "concat_ws(' ', 'common', concat('rare', id), 'common', concat('rarer', id)) AS text")
    val cap = 3
    val (wlm2, wlm1, wv, wvt) = operators.Corpus14.lmModels(wide, cap)
    assert(wvt.count() <= cap)
    assert(wlm2.count() <= (cap + 1L) * (cap + 1L),
      "trained bigram table exceeds the (V+1)² construction bound")
    val modelToks = wlm2.select($"w1".as("t"))
      .union(wlm2.select($"w2".as("t"))).distinct().as[String].collect().toSet
    assert(modelToks.size <= cap + 1 && modelToks.contains(LmOovSymbol),
      "the synthetic corpus must actually exercise the OOV path")
    // (c) scoring under the capped model: every ≥2-token doc scores a
    // finite ppl (OOV rows + the add-½ backoff never yield NULL/NaN)
    val scored = operators.Corpus14.lmScore(wide, wlm2, wlm1, wv, wvt)
      .as[(Long, Long, Double, Double)].collect()
    assert(scored.length == 40)
    scored.foreach { case (id, nb, lp, pp) =>
      assert(nb == 3, s"doc $id bigram count")
      assert(!lp.isNaN && !pp.isNaN && pp > 0 && pp.isFinite, s"doc $id ppl $pp")
    }
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
