package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral checks for the q144-q146 mixture/diagnostics closers — what
  * the DuckDB oracle can't see: the temperature-flattening direction, the
  * count-min invariants (est ≥ exact; narrow-width collisions real; the
  * sketch a true sum-monoid under sharding), and the coverage curve's
  * exact local recompute.
  */
class Corpus3Spec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("q144 temperature mixture: α=0.5 flattens shares toward uniform, quotas honor the budget, selection is hash-deterministic") {
    val out = SparkEntry.queries("q144_temperature_mixture")(spark, sfDir)
      .select("lang", "n_docs", "raw_frac", "temp_frac", "quota", "sel_docs", "sel_toks", "checksum")
      .as[(String, Long, Double, Double, Long, Long, Long, Long)].collect()
    assert(out.length >= 3)
    // flattening direction: the dominant language's tempered share drops,
    // every below-average language's share rises (p^0.5 renormalized
    // strictly contracts shares toward uniform)
    val maxRaw = out.maxBy(_._3)
    assert(maxRaw._4 < maxRaw._3, s"dominant ${maxRaw._1} not flattened down")
    val mean = 1.0 / out.length
    out.filter(_._3 < mean).foreach { r =>
      assert(r._4 > r._3, s"low-resource ${r._1} not flattened up")
    }
    // quotas: sum ≤ the declared half-corpus budget, each filled exactly
    val nTotal = out.map(_._2).sum
    assert(out.map(_._5).sum <= nTotal / 2)
    out.foreach(r => assert(r._6 == r._5, s"${r._1} quota not filled"))
    // integer-exact weight rule replayed locally
    val wts = out.map(r => r._1 -> math.floor(math.sqrt(r._2.toDouble) * 1e6).toLong).toMap
    val tot = wts.values.sum
    out.foreach { r =>
      assert(r._5 == (nTotal / 2) * wts(r._1) / tot, s"${r._1} quota rule")
    }
    // the selected CONTENT is deterministic: replay the per-lang hash rank
    val docs = Tables.documents(spark, sfDir)
      .select($"lang", $"doc_id", md5($"doc_id".cast("string")).as("sk"),
        expr("CAST(conv(substr(md5(text), 1, 15), 16, 10) AS BIGINT)").as("h"))
      .as[(String, Long, String, Long)].collect()
    val byLang = docs.groupBy(_._1)
    out.foreach { r =>
      val sel = byLang(r._1).sortBy(d => (d._3, d._2)).take(r._5.toInt)
      assert(r._8 == sel.map(_._4).reduce(_ ^ _), s"${r._1} checksum")
    }
  }

  test("q145 count-min: est ≥ exact at both widths, narrow width shows real collisions, wide width is exact here") {
    val out = SparkEntry.queries("q145_countmin_heavy_hitters")(spark, sfDir)
      .select("term", "exact_cnt", "est_narrow", "over_narrow", "est_wide", "over_wide")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(out.length == 20)
    out.foreach { r =>
      assert(r._4 >= 0 && r._6 >= 0, s"${r._1}: count-min underestimated")
      assert(r._3 == r._2 + r._4 && r._5 == r._2 + r._6)
    }
    // 31-term vocab in 16 buckets ⇒ collisions must be measured
    assert(out.exists(_._4 > 0), "narrow sketch shows no collisions")
    // 31-term vocab in 1024 buckets ⇒ sized right, exact on this corpus
    assert(out.forall(_._6 == 0), "wide sketch collided unexpectedly")
    // exact counts replayed locally
    val freq = Tables.documents(spark, sfDir)
      .select(explode(expr(operators.TextAnalytics.toksExpr)).as("term"))
      .as[String].collect().groupBy(identity).view.mapValues(_.size.toLong)
    out.foreach(r => assert(freq(r._1) == r._2, s"${r._1} exact count"))
  }

  test("q145 sketch is a sum-monoid: per-shard sketches union+regroup to the whole-corpus sketch") {
    val tok = Tables.documents(spark, sfDir)
      .select($"doc_id", explode(expr(operators.TextAnalytics.toksExpr)).as("term"))
    def sketch(df: org.apache.spark.sql.DataFrame) =
      df.select(posexplode(array((0 until operators.Corpus3.CM_DEPTH).map(j =>
          expr(operators.Corpus3.cmBucketSpark(j, operators.Corpus3.CM_NARROW))): _*))
          .as(Seq("row_j", "bucket")))
        .groupBy("row_j", "bucket").agg(count(lit(1)).as("cnt"))
    val whole = sketch(tok).as[(Int, Long, Long)].collect().toSet
    val merged = sketch(tok.filter($"doc_id" % 2 === 0))
      .unionByName(sketch(tok.filter($"doc_id" % 2 =!= 0)))
      .groupBy("row_j", "bucket").agg(sum("cnt").as("cnt"))
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("q147 skew audit: bucket placement replayed exactly; hot-key column flagged, spread column near-uniform") {
    val out = SparkEntry.queries("q147_shuffle_skew_audit")(spark, sfDir)
      .select("key_name", "n_keys", "buckets_used", "max_bucket", "skew_ratio")
      .as[(String, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val ev = Tables.events(spark, sfDir)
      .select($"user_id".cast("string").as("u"), $"event_type".as("t"))
      .as[(String, String)].collect()
    def replay(vals: Seq[String]) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      vals.groupBy { v =>
        val hex = md.digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.take(15), 16) % 32
      }.view.mapValues(_.size.toLong).toMap
    }
    Seq("user_id" -> ev.map(_._1).toSeq, "event_type" -> ev.map(_._2).toSeq)
      .foreach { case (name, vals) =>
        val buckets = replay(vals)
        val r = out(name)
        assert(r._2 == vals.distinct.size, s"$name n_keys")
        assert(r._3 == buckets.size, s"$name buckets_used")
        assert(r._4 == buckets.values.max, s"$name max_bucket")
        assert(math.abs(r._5 - buckets.values.max * 32.0 / vals.size) < 1e-3)
      }
    // the audit's verdicts: event_type concentrates, user_id spreads
    // (relative, so they hold at every SF's key density)
    assert(out("event_type")._3 <= 5 && out("event_type")._5 > 4.0)
    // at sf0.001's 15 users the spread key is itself fairly skewed
    // (~67 rows per user) — the audit reports it; the ORDERING between
    // the two keys is what must hold at every SF
    assert(out("user_id")._3 > out("event_type")._3)
    assert(out("user_id")._5 < out("event_type")._5)
  }

  test("q148 linear counting: estimate formula replayed, sized-right bitmap accurate, saturation flagged honestly") {
    val out = SparkEntry.queries("q148_linear_counting")(spark, sfDir)
      .select("col_name", "n_exact", "m", "occupied", "saturated", "est")
      .as[(String, Long, Long, Long, Boolean, Double)].collect()
    assert(out.length == 4)
    out.foreach { case (name, n, m, occ, sat, est) =>
      assert(occ <= math.min(n, m), s"$name occupancy bound")
      assert(sat == (occ == m), s"$name saturation flag")
      if (!sat) {
        val expected = BigDecimal(-m.toDouble * math.log((m - occ).toDouble / m))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(est - expected) < 1e-9, s"$name est formula")
        // linear counting never underestimates below the occupancy
        assert(est >= occ, s"$name est < occupied")
      } else assert(est == -1.0, s"$name sentinel")
    }
    // the sized-right bitmap is accurate on every column at this SF
    out.filter(_._3 == 4096L).foreach { case (name, n, _, _, _, est) =>
      assert(math.abs(est - n) / n < 0.05, s"$name m=4096 error >5%")
    }
  }

  test("q149 chi-square cells: marginals consistent, terms replayed exactly, exact dev agrees with the float term") {
    val out = SparkEntry.queries("q149_chisq_independence")(spark, sfDir)
      .select("source", "lang", "o", "r", "c", "dev", "e", "chisq_term")
      .as[(String, String, Long, Long, Long, java.math.BigDecimal, Double, Double)].collect()
    assert(out.nonEmpty)
    val n = out.map(_._3).sum
    // marginal consistency: per-source and per-lang sums of observed
    // counts equal the r/c the query attached to every cell
    out.groupBy(_._1).foreach { case (_, cells) =>
      assert(cells.map(_._3).sum == cells.head._4)
    }
    out.groupBy(_._2).foreach { case (_, cells) =>
      assert(cells.map(_._3).sum == cells.head._5)
    }
    // per-cell replay of e, the χ² term, and the exact deviation
    out.foreach { case (s0, l, o, r, c, dev, e, term) =>
      val eExp = r.toDouble * c / n
      assert(math.abs(e - BigDecimal(eExp).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9, s"$s0/$l e")
      val tExp = (o - eExp) * (o - eExp) / eExp
      assert(math.abs(term - BigDecimal(tExp).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9, s"$s0/$l term")
      assert(dev.longValueExact() == math.abs(o * n - r * c), s"$s0/$l dev")
      // dev = 0 exactly when the cell sits on independence
      assert((dev.signum == 0) == (o * n == r * c))
    }
    // the χ² total — the SUM the query deliberately leaves to controlled
    // summation — is finite and consistent with the published terms
    val total = out.map(_._8).sorted.sum
    assert(total >= 0 && !total.isNaN)
  }

  test("q150 constraint audit: every check replayed exactly; the audit catches the real composite-key defect") {
    val out = SparkEntry.queries("q150_constraint_audit")(spark, sfDir)
      .select("constraint_name", "n_checked", "n_violations", "pass")
      .as[(String, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out.size == 6)
    out.values.foreach(r => assert(r._4 == (r._3 == 0L), s"${r._1} verdict"))
    // composite-key uniqueness replayed exactly (the testdata's lineitem
    // genuinely repeats (l_orderkey, l_linenumber) — the audit must say so)
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber").as[(Long, Long)].collect()
    val uniq = out("lineitem (l_orderkey,l_linenumber) unique")
    assert(uniq._2 == li.length)
    assert(uniq._3 == li.length - li.distinct.length)
    assert(!uniq._4 && uniq._3 > 0, "the known composite-key defect went undetected")
    // referential integrity replayed via set difference
    val custKeys = Tables.customer(spark, sfDir)
      .select("c_custkey").as[Long].collect().toSet
    val orderCust = Tables.orders(spark, sfDir)
      .select("o_custkey").as[Long].collect()
    val ref = out("orders.o_custkey references customer")
    assert(ref._2 == orderCust.length)
    assert(ref._3 == orderCust.count(!custKeys.contains(_)))
    // the FD holds on nation
    assert(out("nation.n_nationkey -> n_regionkey")._4)
  }

  test("q151 equi-depth histogram: depths equal to the rank formula, ranges monotone and tiling, stats replayed exactly") {
    val out = SparkEntry.queries("q151_equidepth_histogram")(spark, sfDir)
      .select("col_name", "bucket", "lo", "hi", "cnt", "ndv")
      .as[(String, Long, Double, Double, Long, Long)].collect()
    val byCol = out.groupBy(_._1)
    assert(byCol.keySet == Set("l_quantity", "events.value"))
    byCol.foreach { case (cn, rows0) =>
      val rows = rows0.sortBy(_._2)
      assert(rows.map(_._2).sameElements(0L until 8L), s"$cn buckets")
      val n = rows.map(_._5).sum
      // depth of bucket b under the (idx·8) div n rule, replayed
      rows.foreach { r =>
        val expected = (0L until n).count(i => i * 8 / n == r._2)
        assert(r._5 == expected, s"$cn bucket ${r._2} depth")
      }
      // ranges are monotone and tile the column (ties may touch: a
      // discrete column's boundary value can close one bucket and open
      // the next)
      rows.sliding(2).foreach {
        case Array(a, b) => assert(a._4 <= b._3, s"$cn range overlap")
        case _ =>
      }
      rows.foreach(r => assert(r._3 <= r._4 && r._6 <= r._5))
    }
    // exact replay of the l_quantity histogram from the raw column
    val vals = Tables.lineitem(spark, sfDir)
      .select("l_quantity", "l_orderkey", "l_linenumber", "l_partkey")
      .as[(Double, Long, Long, Long)].collect()
      .sortBy(v => (v._1, v._2, v._3, v._4)).map(_._1)
    val n = vals.length
    val expected = vals.zipWithIndex.groupBy { case (_, i) => i.toLong * 8 / n }
    byCol("l_quantity").foreach { r =>
      val b = expected(r._2).map(_._1)
      assert(r._3 == b.min && r._4 == b.max && r._5 == b.length && r._6 == b.distinct.length,
        s"l_quantity bucket ${r._2}")
    }
  }

  test("q152 cardinality estimates: formulas replayed from raw stats, actuals exact, heavy-tail range is the bad one") {
    val out = SparkEntry.queries("q152_cardinality_estimates")(spark, sfDir)
      .select("target", "est_rows", "actual_rows", "err_ratio")
      .as[(String, Double, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out.size == 4)
    val lq = Tables.lineitem(spark, sfDir).select("l_quantity").as[Double].collect()
    def r1(x: Double) = BigDecimal(x).setScale(1, BigDecimal.RoundingMode.HALF_UP).toDouble
    // uniform-NDV equality estimate
    assert(out("l_quantity = 5")._2 == r1(lq.length.toDouble / lq.distinct.length))
    assert(out("l_quantity = 5")._3 == lq.count(_ == 5.0))
    // min-max interpolation
    assert(out("l_quantity <= 10")._2 ==
      r1(lq.length * (10 - lq.min) / (lq.max - lq.min)))
    assert(out("l_quantity <= 10")._3 == lq.count(_ <= 10.0))
    // join estimate: FK join onto a unique PK ⇒ est = |orders| exactly
    val nOrders = Tables.orders(spark, sfDir).count()
    assert(out("orders join customer on custkey")._2 == nOrders.toDouble)
    assert(out("orders join customer on custkey")._3 == nOrders)
    assert(math.abs(out("orders join customer on custkey")._4 - 1.0) < 1e-9)
    // the audit's lesson: uniformity works on the uniform columns and
    // fails on the heavy tail
    assert(out("l_quantity = 5")._4 > 0.8 && out("l_quantity = 5")._4 < 1.2)
    assert(out("events.value > 100")._4 > 2.0, "heavy-tail overshoot not visible")
  }

  test("q146 vocab coverage: curve matches an exact local recompute and is monotone") {
    val out = SparkEntry.queries("q146_vocab_coverage")(spark, sfDir)
      .select("k", "covered_occurrences", "coverage", "oov_rate")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(out.nonEmpty)
    val freq = Tables.documents(spark, sfDir)
      .select(explode(expr(operators.TextAnalytics.toksExpr)).as("term"))
      .as[String].collect().groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (t, c) => (-c, t) }
    val nTotal = freq.map(_._2).sum
    out.foreach { case (k, cum, cov, oov) =>
      val expected = freq.take(k.toInt).map(_._2).sum
      assert(cum == expected, s"k=$k covered occurrences")
      assert(math.abs(cov - expected.toDouble / nTotal) < 1e-6)
      assert(math.abs(cov + oov - 1.0) < 1e-6)
    }
    assert(out.map(_._2).sameElements(out.map(_._2).sorted), "coverage not monotone")
    // ranks beyond the vocab don't appear (31-term corpus ⇒ no k=50 row)
    assert(out.map(_._1).forall(k => k <= freq.size || out.last._3 == 1.0))
  }
}
