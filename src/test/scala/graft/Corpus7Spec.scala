package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral checks for q190-q194 — each query replayed by an
  * independent local (pure-Scala) simulation, plus the invariants that
  * define the operator: lift/support bookkeeping (q190), CUSUM argmax
  * uniqueness and telescoping-to-zero (q191), syllable-fold exactness
  * (q192), brute-force dominance (q193), and sliding-window counting
  * (q194).
  */
class Corpus7Spec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def round(x: Double, dp: Int): Double =
    BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q190 basket lift: counts and ratios match a brute-force basket replay") {
    val out = SparkEntry.queries("q190_basket_lift")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect()

    val baskets = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey".as[Long], $"l_partkey".as[Long]).collect()
      .distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val n = baskets.size.toLong
    val itemSup = baskets.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val pairSup = baskets.values.toSeq
      .flatMap(ps => ps.toSeq.sorted.combinations(2).map(c => (c(0), c(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 2)

    val expected = pairSup.toSeq.map { case ((pa, pb), sup) =>
      val (ca, cb) = (itemSup(pa), itemSup(pb))
      val lift = (n * sup).toDouble / (ca * cb)
      (pa, pb, sup, ca, cb, lift, sup.toDouble / ca)
    }.sortBy { case (pa, pb, _, _, _, lift, _) => (-lift, pa, pb) }.take(20)

    assert(out.length == expected.length)
    for ((got, exp) <- out.zip(expected)) {
      assert((got._1, got._2, got._3, got._4, got._5) ==
        (exp._1, exp._2, exp._3, exp._4, exp._5))
      assert(got._6 == round(exp._6, 6) && got._7 == round(exp._7, 6))
    }
    // Lift is symmetric in the pair; confidence is P(pb | pa) and must
    // never exceed 1 nor fall below support/N.
    assert(out.forall(r => r._7 <= 1.0 + 1e-12))
  }

  test("q191 CUSUM: exact integer replay; one change-point at the earliest argmax; sum telescopes to 0") {
    val out = SparkEntry.queries("q191_cusum_changepoint")(spark, sfDir)
      .select($"d".cast("string").as[String], $"cnt".as[Long], $"cusum".as[Long],
        $"is_changepoint".as[Int]).collect()

    val daily = Tables.events(spark, sfDir)
      .select(org.apache.spark.sql.functions.to_date($"ts").cast("string").as[String])
      .collect().groupBy(identity).view.mapValues(_.length.toLong).toMap
      .toSeq.sortBy(_._1)
    val n = daily.size.toLong
    val t = daily.map(_._2).sum
    var cum = 0L
    val expected = daily.zipWithIndex.map { case ((d, c), i) =>
      cum += c
      (d, c, n * cum - (i + 1) * t)
    }
    assert(out.map(r => (r._1, r._2, r._3)).toSeq == expected)
    // s_n = n·T − n·T = 0 by construction — the telescoping identity.
    assert(out.last._3 == 0L)
    val mxa = expected.map(x => math.abs(x._3)).max
    val cpd = expected.filter(x => math.abs(x._3) == mxa).map(_._1).min
    assert(out.filter(_._4 == 1).map(_._1).toSeq == Seq(cpd))
  }

  test("q192 readability: integer folds and formulas match a token-by-token replay") {
    val out = SparkEntry.queries("q192_readability")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long, Double, Double)].collect()

    val vowels = "[aeiou]+".r
    val docs = Tables.documents(spark, sfDir)
      .select($"source".as[String], $"text".as[String]).collect()
    val expected = docs
      .map { case (src, text) =>
        val w = text.toLowerCase.split(" ").filter(_.nonEmpty)
        val syl = w.map(t => vowels.findAllIn(t).length).map(_.toLong).sum
        val cpx = w.count(t => vowels.findAllIn(t).length >= 3).toLong
        (src, w.length.toLong, syl, cpx, (w.length + 14L) / 15L)
      }
      .filter(_._2 > 0)
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (src, rows) =>
        val (nd, nw, ns, nc, nsent) = (rows.length.toLong, rows.map(_._2).sum,
          rows.map(_._3).sum, rows.map(_._4).sum, rows.map(_._5).sum)
        val flesch = 206.835 - 1.015 * (nw.toDouble / nsent) - 84.6 * (ns.toDouble / nw)
        val fog = 0.4 * (nw.toDouble / nsent + 100.0 * nc / nw)
        (src, nd, nw, ns, nc, nsent, round(flesch, 3), round(fog, 3))
      }
    assert(out.toSeq == expected)
  }

  test("q193 Pareto frontier: segmented sweep equals brute-force dominance") {
    val out = SparkEntry.queries("q193_pareto_frontier")(spark, sfDir)
      .as[(Long, Double, Int)].collect()
    val parts = Tables.part(spark, sfDir)
      .select($"p_partkey".as[Long], $"p_retailprice".as[Double], $"p_size".as[Int])
      .collect()

    def dominated(p: (Long, Double, Int)): Boolean = parts.exists(q =>
      q._2 <= p._2 && q._3 >= p._3 && (q._2 < p._2 || q._3 > p._3))
    val expected = parts.filterNot(dominated).sortBy(p => (p._2, p._1))
    assert(out.toSeq == expected.toSeq)
    assert(out.nonEmpty)
    // Frontier shape: as price rises along the frontier, size strictly
    // rises too (a pricier point survives only by being bigger);
    // equal-price ties share the price's max size.
    val perPrice = out.groupBy(_._2).toSeq.sortBy(_._1).map(_._2.map(_._3).max)
    assert(perPrice.zip(perPrice.tail).forall { case (a, b) => a < b })
  }

  test("q196 trend fit: moments and formulas match a zero-filled local regression") {
    val out = SparkEntry.queries("q196_trend_fit")(spark, sfDir)
      .as[(String, Long, Double, Double, Double)].collect()

    val ev = Tables.events(spark, sfDir)
      .select($"event_type".as[String],
        org.apache.spark.sql.functions.to_date($"ts").cast("string").as[String]).collect()
    val days = ev.map(_._2).distinct.sorted
    val d0 = java.time.LocalDate.parse(days.min)
    val nDays = java.time.temporal.ChronoUnit.DAYS
      .between(d0, java.time.LocalDate.parse(days.max)).toInt + 1
    val counts = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = ev.map(_._1).distinct.sorted.map { et =>
      val xy = (0 until nDays).map { x =>
        (x.toLong, counts.getOrElse((et, d0.plusDays(x.toLong).toString), 0L))
      }
      val n = xy.size.toLong
      val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
      val sxy = xy.map(p => p._1 * p._2).sum
      val sxx = xy.map(p => p._1 * p._1).sum; val syy = xy.map(p => p._2 * p._2).sum
      val num = n * sxy - sx * sy; val dx = n * sxx - sx * sx; val dy = n * syy - sy * sy
      val slope = num.toDouble / dx
      (et, n, round(slope, 6), round((sy - slope * sx) / n, 4),
        round((num * num).toDouble / (dx * dy), 6))
    }
    assert(out.toSeq == expected.toSeq)
  }

  test("q197 fair share: water-filling replay; capped set is the ascending prefix; budget respected") {
    val out = SparkEntry.queries("q197_fair_share")(spark, sfDir)
      .as[(String, Long, Int, Long, Long)].collect()

    val caps = Tables.documents(spark, sfDir)
      .select($"source".as[String], $"text".as[String]).collect()
      .map { case (s, t) => (s, t.toLowerCase.split(" ").count(_.nonEmpty).toLong) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val n = caps.size.toLong
    val b = 9 * caps.values.sum / 10
    val asc = caps.toSeq.sortBy { case (s, c) => (c, s) }
    var pfx = 0L; var wl = -1L
    val capped = scala.collection.mutable.Map.empty[String, Boolean]
    for (((src, cap), idx) <- asc.zipWithIndex) {
      val isCapped = pfx + cap * (n - idx) <= b
      capped(src) = isCapped
      if (!isCapped && wl < 0) wl = (b - pfx) / (n - idx)
      pfx += cap // prefix of ALL earlier caps, mirroring the query
    }
    val expected = caps.keys.toSeq.sorted.map { src =>
      (src, caps(src), if (capped(src)) 1 else 0,
        if (capped(src)) caps(src) else wl, b)
    }
    assert(out.toSeq == expected)
    // invariants: total allocation within budget, shortfall < #uncapped
    // (floor remainder), capped rows form the ascending-capacity prefix,
    // and the waterline never exceeds an uncapped row's capacity.
    val used = out.map(_._4).sum
    val uncapped = out.count(_._3 == 0)
    assert(used <= b && (uncapped == 0 || b - used < uncapped))
    val flagsAsc = out.sortBy(r => (r._2, r._1)).map(_._3)
    assert(!flagsAsc.dropWhile(_ == 1).contains(1))
    assert(out.filter(_._3 == 0).forall(r => r._4 <= r._2))
  }

  test("q194 burst rate: per-user trailing-24h sliding counts match a local sweep") {
    val out = SparkEntry.queries("q194_burst_rate_audit")(spark, sfDir)
      .select($"user_id".as[Long], $"n_events".as[Long], $"peak_24h".as[Long],
        $"n_bursty".as[Long], $"first_burst_day".cast("string").as[String]).collect()

    val ev = Tables.events(spark, sfDir)
      .select($"user_id".as[Long], org.apache.spark.sql.functions.expr("unix_micros(ts)").as[Long],
        org.apache.spark.sql.functions.to_date($"ts").cast("string").as[String]).collect()
    val expected = ev.groupBy(_._1).toSeq.map { case (u, rows) =>
      val sorted = rows.sortBy(_._2)
      // RANGE-frame semantics: peers at one microsecond share one value.
      val wins = sorted.map { case (_, us, day) =>
        val c = sorted.count(r => r._2 >= us - 86400000000L && r._2 <= us).toLong
        (c, day)
      }
      val bursty = wins.filter(_._1 >= 5L)
      (u, sorted.length.toLong, wins.map(_._1).max, bursty.length.toLong,
        if (bursty.isEmpty) null else bursty.map(_._2).min)
    }.filter(_._3 >= 5L).sortBy(_._1)
    assert(out.toSeq == expected)
    // Peak is bounded below by the burst threshold on every output row
    // and n_bursty ≥ 1 whenever a first_burst_day is present.
    assert(out.forall(r => r._3 >= 5L && r._4 >= 1L && r._5 != null))
  }
}
