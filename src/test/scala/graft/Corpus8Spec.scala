package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral checks for q198-q200 — local replays plus the semantic
  * invariants: tamper-evidence for the Merkle tree, probability-mass
  * bookkeeping for the Benford audit, and the |ACF| ≤ 1 bound.
  */
class Corpus8Spec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def round(x: Double, dp: Int): Double =
    BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q198 Merkle manifest: local tree replay; tampering one doc flips exactly its path") {
    val out = SparkEntry.queries("q198_merkle_manifest")(spark, sfDir)
      .as[(String, Long, Long, String)].collect()
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id".as[Long], $"text".as[String]).collect().sortBy(_._1)

    def tree(leaf: Map[Long, String]): (Map[Long, String], Map[Long, String], String) = {
      val pages = leaf.toSeq.groupBy(_._1 / 64).view
        .mapValues(rs => md5hex(rs.sortBy(_._1).map(_._2).mkString)).toMap
      val shards = pages.toSeq.groupBy(_._1 % 8).view
        .mapValues(rs => md5hex(rs.sortBy(_._1).map(_._2).mkString)).toMap
      val root = md5hex(shards.toSeq.sortBy(_._1).map(_._2).mkString)
      (pages, shards, root)
    }
    val leaves = docs.map { case (id, t) => id -> md5hex(t) }.toMap
    val (pages, shards, root) = tree(leaves)

    val expected =
      (pages.toSeq.map { case (p, dg) =>
        ("page", p, docs.count(_._1 / 64 == p).toLong, dg) } ++
       shards.toSeq.map { case (sh, dg) =>
        ("shard", sh, docs.count(_._1 / 64 % 8 == sh).toLong, dg) } ++
       Seq(("root", -1L, docs.length.toLong, root)))
        .sortBy(r => (r._1, r._2))
    assert(out.toSeq == expected)

    // Tamper-evidence: flipping one leaf changes its page, its shard,
    // and the root — and NOTHING else.
    val victim = docs.head._1
    val (p2, s2, r2) = tree(leaves.updated(victim, md5hex("tampered")))
    assert(r2 != root)
    assert(p2.filter { case (k, v) => pages(k) != v }.keySet == Set(victim / 64))
    assert(s2.filter { case (k, v) => shards(k) != v }.keySet == Set(victim / 64 % 8))
  }

  test("q199 Benford audit: digit counts replay; probabilities and counts conserve") {
    val out = SparkEntry.queries("q199_benford_audit")(spark, sfDir)
      .as[(Int, Long, Long, Double, Double, Double)].collect()
    val prices = Tables.orders(spark, sfDir).select($"o_totalprice".as[Double]).collect()
    val obs = prices.map(p => p.toLong.toString.head.asDigit)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(out.length == 9 && out.map(_._1).toSeq == (1 to 9))
    out.foreach { r => assert(r._2 == obs.getOrElse(r._1, 0L) && r._3 == prices.length.toLong) }
    // every order lands in exactly one digit bucket
    assert(out.map(_._2).sum == prices.length.toLong)
    // pinned probabilities: expected counts sum back to ~n
    assert(math.abs(out.map(_._4).sum - prices.length) < 0.1)
    // chisq_part is the published (obs − np)²/np for each digit
    out.foreach { r =>
      val np = r._3 * benfordP(r._1)
      assert(r._6 == round((r._2 - np) * (r._2 - np) / np, 4))
    }
  }

  private def benfordP(d: Int): Double = Seq(0.301029995663981, 0.176091259055681,
    0.124938736608300, 0.096910013008056, 0.079181246047625, 0.066946789630613,
    0.057991946977687, 0.051152522447381, 0.045757490560675)(d - 1)

  test("q201 Simpson audit: integer sign replay; flag fires on a textbook reversal") {
    val out = SparkEntry.queries("q201_simpson_audit")(spark, sfDir)
      .as[(String, Double, Int, Long, Long, Long, Int)].collect()
    val docs = Tables.documents(spark, sfDir)
      .select($"source".as[String], $"lang".as[String], $"n_chars".as[Long]).collect()

    def sgn(a: Long, b: Long): Int = java.lang.Long.compare(a, b)
    val cell = docs.groupBy(r => (r._1, r._2)).view.mapValues { rs =>
      (rs.count(_._3 >= 300).toLong, rs.length.toLong)
    }.toMap
    val bySrc = cell.toSeq.groupBy(_._1._1).view.mapValues(cs =>
      (cs.map(_._2._1).sum, cs.map(_._2._2).sum)).toMap
    val byLang = cell.toSeq.groupBy(_._1._2).view.mapValues(cs =>
      (cs.map(_._2._1).sum, cs.map(_._2._2).sum)).toMap
    val (xt, nt) = (bySrc.values.map(_._1).sum, bySrc.values.map(_._2).sum)
    val expected = bySrc.keys.toSeq.sorted.map { src =>
      val (xs, ns) = bySrc(src)
      val psign = sgn(xs * (nt - ns), (xt - xs) * ns)
      val ss = cell.collect { case ((s, l), (x, n)) if s == src =>
        val (xl, nl) = byLang(l); sgn(x * (nl - n), (xl - x) * n)
      }.toSeq
      val (np, nn) = (ss.count(_ == 1).toLong, ss.count(_ == -1).toLong)
      val rev = if ((psign == 1 && np == 0 && nn > 0) ||
        (psign == -1 && nn == 0 && np > 0)) 1 else 0
      (src, round(xs.toDouble / ns, 4), psign, ss.size.toLong, np, nn, rev)
    }
    assert(out.toSeq == expected.toSeq)
    // The replayed decision rule must fire on a textbook reversal
    // (UC-Berkeley-admissions shape): pooled favors A, every stratum
    // favors B. Run the SAME sign arithmetic on the literal cells.
    val lit = Map(("A", "x") -> (8L, 10L), ("A", "y") -> (2L, 10L),
      ("B", "x") -> (18L, 20L), ("B", "y") -> (17L, 80L))
    val aPool = (10L, 20L); val bPool = (35L, 100L) // (x, n)
    val psign = sgn(aPool._1 * bPool._2, bPool._1 * aPool._2)
    val ssigns = Seq("x", "y").map { l =>
      val (ax, an) = lit(("A", l)); val (bx, bn) = lit(("B", l))
      sgn(ax * bn, bx * an)
    }
    assert(psign == 1 && ssigns.forall(_ == -1),
      "literal fixture is not a reversal — fix the fixture")
  }

  test("q202 jackknife influence: per-day replay; unique earliest top flag") {
    val out = SparkEntry.queries("q202_jackknife_influence")(spark, sfDir)
      .select($"d".cast("string"), $"c", $"v", $"theta_i", $"influence", $"is_top")
      .as[(String, Long, Long, Double, Double, Int)].collect()
    val ev = Tables.events(spark, sfDir)
      .select(org.apache.spark.sql.functions.to_date($"ts").cast("string").as[String],
        $"event_type".as[String]).collect()
    val daily = ev.groupBy(_._1).view.mapValues { rs =>
      (rs.count(_._2 == "click").toLong, rs.count(_._2 == "view").toLong)
    }.toSeq.sortBy(_._1)
    val ct = daily.map(_._2._1).sum; val vt = daily.map(_._2._2).sum
    val rows = daily.map { case (d, (c, v)) =>
      val theta = (ct - c).toDouble / (vt - v)
      (d, c, v, theta, theta - ct.toDouble / vt)
    }
    val mx = rows.map(r => math.abs(r._5)).max
    val td = rows.filter(r => math.abs(r._5) == mx).map(_._1).min
    val expected = rows.map { case (d, c, v, th, in) =>
      (d, c, v, round(th, 6), round(in, 6), if (d == td) 1 else 0)
    }
    assert(out.toSeq == expected.toSeq)
    assert(out.count(_._6 == 1) == 1)
  }

  test("q203 winsorized mean: interpolated-percentile clamp replay") {
    val out = SparkEntry.queries("q203_winsorized_mean")(spark, sfDir)
      .as[(String, Long, Long, Long, Double, Double, Double, Double)].collect()
    val cents = Tables.events(spark, sfDir)
      .select($"event_type".as[String],
        org.apache.spark.sql.functions.expr("CAST(round(value * 100) AS BIGINT)").as[Long])
      .collect()
    def quant(xs: Seq[Long], f: Double): Double = {
      val s = xs.sorted; val pos = f * (s.length - 1)
      val lo = pos.toInt; val frac = pos - lo
      if (lo + 1 < s.length) s(lo) * (1 - frac) + s(lo + 1) * frac else s(lo).toDouble
    }
    val expected = cents.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, rs) =>
      val xs = rs.map(_._2).toSeq
      val (p5, p95) = (quant(xs, 0.05), quant(xs, 0.95))
      val nLo = xs.count(_ < p5).toLong; val nHi = xs.count(_ > p95).toLong
      val sIn = xs.filter(x => x >= p5 && x <= p95).sum
      val wins = (nLo * p5 + nHi * p95 + sIn) / xs.size / 100
      (et, xs.size.toLong, nLo, nHi, round(p5 / 100, 4), round(p95 / 100, 4),
        round(wins, 4), round(xs.sum.toDouble / xs.size / 100, 4))
    }
    assert(out.toSeq == expected.toSeq)
    // winsorized mean is pulled toward the center whenever tails clip
    out.foreach(r => assert(r._3 == 0L && r._4 == 0L || r._7 != r._8))
  }

  test("q204 clamped balance: sequential fold replay; balances stay inside [0, 50]") {
    val out = SparkEntry.queries("q204_clamped_balance")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    val ev = Tables.events(spark, sfDir)
      .select($"user_id".as[Long],
        org.apache.spark.sql.functions.to_date($"ts").cast("string").as[String],
        $"event_type".as[String]).collect()
    def wOf(t: String): Long = t match {
      case "signup" => 20L; case "purchase" => -5L; case "error" => -2L; case _ => -1L
    }
    val expected = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (u, rows) =>
      val daily = rows.groupBy(_._2).view.mapValues(_.map(r => wOf(r._3)).sum)
        .toSeq.sortBy(_._1).map(_._2)
      val fin = daily.foldLeft(0L)((a, b) => math.max(0L, math.min(50L, a + b)))
      (u, daily.size.toLong, daily.sum, fin)
    }
    assert(out.toSeq == expected.toSeq)
    assert(out.forall(r => r._4 >= 0L && r._4 <= 50L))
    // the clamp must actually bind somewhere, or the fold degenerates
    // to a prefix sum and the operator proves nothing
    assert(out.exists(r => r._4 != math.max(0L, math.min(50L, r._3))))
  }

  test("q205 transition latency: lag replay; pair counts conserve events minus users") {
    val out = SparkEntry.queries("q205_transition_latency")(spark, sfDir)
      .as[(String, String, Long, Double, Double)].collect()
    val ev = Tables.events(spark, sfDir)
      .select($"user_id".as[Long], $"event_type".as[String],
        org.apache.spark.sql.functions.expr("unix_micros(ts)").as[Long],
        $"event_id".as[Long]).collect()
    def quant(xs: Seq[Long], f: Double): Double = {
      val s = xs.sorted; val pos = f * (s.length - 1)
      val lo = pos.toInt; val frac = pos - lo
      if (lo + 1 < s.length) s(lo) * (1 - frac) + s(lo + 1) * frac else s(lo).toDouble
    }
    val steps = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._3, r._4))
      sorted.zip(sorted.tail).map { case (a, b) => ((a._2, b._2), b._3 - a._3) }
    }.toSeq
    val expected = steps.groupBy(_._1).toSeq.sortBy(_._1).map { case ((p, nx), gs) =>
      val xs = gs.map(_._2)
      (p, nx, xs.size.toLong, round(quant(xs, 0.5) / 1e6, 1), round(quant(xs, 0.9) / 1e6, 1))
    }
    assert(out.toSeq == expected.toSeq)
    val users = ev.map(_._1).distinct.length
    assert(out.map(_._3).sum == ev.length.toLong - users)
  }

  test("q206 encoding advisor: size model replay; low-cardinality dict wins, near-unique plain wins") {
    val out = SparkEntry.queries("q206_encoding_advisor")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long, Double, String)].collect()
    val docs = Tables.documents(spark, sfDir)
      .select($"lang".as[String], $"source".as[String], $"text".as[String]).collect()
    val ev = Tables.events(spark, sfDir)
      .select($"event_type".as[String], $"props".as[String]).collect()
    val colVals: Map[String, Seq[String]] = Map(
      "documents.lang" -> docs.map(_._1).toSeq, "documents.source" -> docs.map(_._2).toSeq,
      "documents.text" -> docs.map(_._3).toSeq, "events.event_type" -> ev.map(_._1).toSeq,
      "events.props" -> ev.map(_._2).toSeq)
    val expected = colVals.toSeq.sortBy(_._1).map { case (c, vs) =>
      val n = vs.size.toLong; val ndv = vs.distinct.size.toLong
      val plain = vs.map(_.length.toLong).sum
      val bits = java.lang.Long.toBinaryString(ndv - 1).length.toLong
      val dict = vs.distinct.map(_.length.toLong).sum + (n * bits + 7) / 8
      (c, n, ndv, plain, dict, bits, round(plain.toDouble / dict, 2),
        if (dict < plain) "dict" else "plain")
    }
    assert(out.toSeq == expected.toSeq)
    val byCol = out.map(r => r._1 -> r._8).toMap
    assert(byCol("events.event_type") == "dict" && byCol("documents.text") == "plain")
  }

  test("q207 mix/rate bridge: replay; terms reconstruct the overall delta") {
    val out = SparkEntry.queries("q207_mix_rate_bridge")(spark, sfDir)
      .as[(String, Double, Double, Double, Double, Double, Double, Double)].collect()
    val ev = Tables.events(spark, sfDir)
      .select($"event_type".as[String],
        org.apache.spark.sql.functions.to_date($"ts").cast("string").as[String],
        org.apache.spark.sql.functions.expr("CAST(round(value * 100) AS BIGINT)").as[Long])
      .collect()
    val d0 = java.time.LocalDate.parse(ev.map(_._2).min)
    val d1 = java.time.LocalDate.parse(ev.map(_._2).max)
    val span = java.time.temporal.ChronoUnit.DAYS.between(d0, d1)
    def period(d: String): Int =
      if (2 * java.time.temporal.ChronoUnit.DAYS.between(d0, java.time.LocalDate.parse(d)) < span + 1) 1 else 2
    val m = ev.groupBy(r => (r._1, period(r._2))).view
      .mapValues(rs => (rs.length.toLong, rs.map(_._3).sum)).toMap
    val nt = Map(1 -> m.collect { case ((_, 1), (n, _)) => n }.sum,
      2 -> m.collect { case ((_, 2), (n, _)) => n }.sum)
    case class B(w1: Double, r1: Double, w2: Double, r2: Double)
    val bs = ev.map(_._1).distinct.sorted.map { g =>
      val (n1, s1) = m((g, 1)); val (n2, s2) = m((g, 2))
      g -> B(n1.toDouble / nt(1), s1.toDouble / n1, n2.toDouble / nt(2), s2.toDouble / n2)
    }
    val expected = bs.map { case (g, b) =>
      (g, round(b.w1, 6), round(b.w2, 6), round(b.r1 / 100, 4), round(b.r2 / 100, 4),
        round((b.w2 - b.w1) * b.r1 / 100, 4), round(b.w1 * (b.r2 - b.r1) / 100, 4),
        round((b.w2 - b.w1) * (b.r2 - b.r1) / 100, 4))
    }
    assert(out.toSeq == expected.toSeq)
    // Bridge identity: Σ_g (mix + rate + interaction) = overall₂ − overall₁
    val overall1 = bs.map { case (_, b) => b.w1 * b.r1 }.sum
    val overall2 = bs.map { case (_, b) => b.w2 * b.r2 }.sum
    val bridge = bs.map { case (_, b) =>
      (b.w2 - b.w1) * b.r1 + b.w1 * (b.r2 - b.r1) + (b.w2 - b.w1) * (b.r2 - b.r1) }.sum
    assert(math.abs(bridge - (overall2 - overall1)) < 1e-9)
  }

  test("q208 Kaplan-Meier: product-limit replay; survival monotone, risk set conserves") {
    val out = SparkEntry.queries("q208_kaplan_meier")(spark, sfDir)
      .as[(Long, Long, Long, Long, Double)].collect()
    val ev = Tables.events(spark, sfDir)
      .select($"user_id".as[Long],
        org.apache.spark.sql.functions.to_date($"ts").cast("string").as[String],
        $"event_type".as[String], $"value".as[Double]).collect()
    val endd = java.time.LocalDate.parse(ev.map(_._2).max)
    val lifetimes = ev.groupBy(_._1).values.map { rows =>
      val fd = java.time.LocalDate.parse(rows.map(_._2).min)
      val pd = rows.filter(r => r._3 == "purchase" && r._4 >= 130).map(_._2) match {
        case Array() => None
        case ps => Some(java.time.LocalDate.parse(ps.min))
      }
      val to = pd.getOrElse(endd)
      (java.time.temporal.ChronoUnit.DAYS.between(fd, to), pd.isDefined)
    }.toSeq
    val nu = lifetimes.size.toLong
    val byt = lifetimes.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, rs) =>
      (t, rs.count(_._2).toLong, rs.count(!_._2).toLong)
    }
    var atRisk = nu; var lnSum = 0.0
    val expected = byt.flatMap { case (t, d, c) =>
      val row = if (d > 0) {
        lnSum += math.log(1.0 - d.toDouble / atRisk)
        Some((t, atRisk, d, c, round(math.exp(lnSum), 6)))
      } else None
      atRisk -= d + c
      row
    }
    assert(out.toSeq == expected)
    // survival is non-increasing in (0, 1]; risk sets strictly decrease
    assert(out.map(_._5).toSeq == out.map(_._5).sorted.reverse.toSeq)
    assert(out.forall(r => r._5 > 0.0 && r._5 <= 1.0))
    assert(out.map(_._2).toSeq == out.map(_._2).sorted.reverse.toSeq)
  }

  test("q209 log-rank: per-time replay; pooled columns agree with q208's risk table") {
    val out = SparkEntry.queries("q209_logrank_contributions")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Double, Double, Double)].collect()
    val ev = Tables.events(spark, sfDir)
      .select($"user_id",
        org.apache.spark.sql.functions.to_date($"ts").cast("string").as("d"),
        $"event_type", $"value",
        org.apache.spark.sql.functions.expr("unix_micros(ts)").as("us"),
        $"event_id")
      .as[(Long, String, String, Double, Long, Long)].collect()
    val endd = java.time.LocalDate.parse(ev.map(_._2).max)
    val users = ev.groupBy(_._1).values.map { rows =>
      val first = rows.minBy(r => (r._5, r._6))
      val coh = if (first._3 == "view") 1 else 2
      val fd = java.time.LocalDate.parse(rows.map(_._2).min)
      val pd = rows.filter(r => r._3 == "purchase" && r._4 >= 130).map(_._2) match {
        case Array() => None
        case ps => Some(java.time.LocalDate.parse(ps.min))
      }
      (coh, java.time.temporal.ChronoUnit.DAYS.between(fd, pd.getOrElse(endd)), pd.isDefined)
    }.toSeq
    var n1 = users.count(_._1 == 1).toLong; var n2 = users.count(_._1 == 2).toLong
    val byt = users.groupBy(_._2).toSeq.sortBy(_._1)
    val expected = byt.flatMap { case (t, rs) =>
      val d1 = rs.count(r => r._1 == 1 && r._3).toLong
      val d2 = rs.count(r => r._1 == 2 && r._3).toLong
      val row = if (d1 + d2 > 0) {
        val n = n1 + n2; val d = d1 + d2
        val e1 = (d * n1).toDouble / n
        val v = if (n <= 1) null
          else d.toDouble * n1 / n * (1.0 - n1.toDouble / n) * (n - d).toDouble / (n - 1)
        Some((t, n1, n2, d1, d2, round(e1, 6), round(d1 - e1, 6),
          if (v == null) null else round(v.asInstanceOf[Double], 6)))
      } else None
      n1 -= rs.count(_._1 == 1); n2 -= rs.count(_._1 == 2)
      row
    }
    assert(out.toSeq.map(r => (r._1, r._2, r._3, r._4, r._5, r._6, r._7, r._8: Any)) ==
      expected.map(e => (e._1, e._2, e._3, e._4, e._5, e._6, e._7, e._8)))
    // cross-query consistency: pooled at-risk and events equal q208's table
    val km = SparkEntry.queries("q208_kaplan_meier")(spark, sfDir)
      .as[(Long, Long, Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    out.foreach { r =>
      val (nRisk, d) = km(r._1)
      assert(r._2 + r._3 == nRisk && r._4 + r._5 == d, s"t=${r._1}")
    }
  }

  test("q210 correlation matrix: BigInt moment replay; r within [-1, 1]") {
    val out = SparkEntry.queries("q210_correlation_matrix")(spark, sfDir)
      .as[(String, String, Long, Double)].collect()
    val li = Tables.lineitem(spark, sfDir)
      .select(org.apache.spark.sql.functions.expr("CAST(round(l_quantity*100) AS BIGINT)"),
        org.apache.spark.sql.functions.expr("CAST(round(l_extendedprice*100) AS BIGINT)"),
        org.apache.spark.sql.functions.expr("CAST(round(l_discount*100) AS BIGINT)"),
        org.apache.spark.sql.functions.expr("CAST(round(l_tax*100) AS BIGINT)"))
      .as[(Long, Long, Long, Long)].collect()
    val cols = Seq("quantity", "extendedprice", "discount", "tax")
    val data = Seq(li.map(_._1), li.map(_._2), li.map(_._3), li.map(_._4))
    val n = BigInt(li.length)
    def s(i: Int) = data(i).map(BigInt(_)).sum
    def sxy(i: Int, j: Int) = data(i).zip(data(j)).map { case (a, b) => BigInt(a) * b }.sum
    val expected = (for (i <- 0 until 4; j <- (i + 1) until 4) yield {
      val num = (n * sxy(i, j) - s(i) * s(j)).toDouble
      val dx = (n * sxy(i, i) - s(i) * s(i)).toDouble
      val dy = (n * sxy(j, j) - s(j) * s(j)).toDouble
      (cols(i), cols(j), li.length.toLong,
        round(num / (math.sqrt(dx) * math.sqrt(dy)), 6))
    }).sortBy(r => (r._1, r._2))
    assert(out.toSeq == expected)
    assert(out.forall(r => math.abs(r._4) <= 1.0))
  }

  test("q200 ACF: exact integer replay; |acf| bounded by 1") {
    val out = SparkEntry.queries("q200_volume_acf")(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    val daily = Tables.events(spark, sfDir)
      .select(org.apache.spark.sql.functions.to_date($"ts").cast("string").as[String])
      .collect().groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1).map(_._2)
    val n = daily.size.toLong
    val t = daily.sum
    val dev = daily.map(c => n * c - t)
    val dd = dev.map(d => d * d).sum
    val expected = (1 to 7).map { k =>
      val nm = dev.dropRight(k).zip(dev.drop(k)).map { case (a, b) => a * b }.sum
      (k.toLong, (dev.size - k).toLong, round(nm.toDouble / dd, 6))
    }
    assert(out.toSeq == expected.toSeq)
    assert(out.forall(r => math.abs(r._3) <= 1.0))
  }
}
