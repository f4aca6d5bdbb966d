package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral checks for q178-q182 — what the DuckDB oracle can't see:
  * each query replayed by an independent local (pure-Scala) simulation,
  * plus the semantic invariants that define the operator (CDC
  * resurrection, layout-skipping dominance, mutual-NN symmetry,
  * anomaly-flag monotonicity, vote/abstain bookkeeping).
  */
class Corpus6Spec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q178 CDC apply: keep-last upsert semantics match a local replay") {
    val out = SparkEntry.queries("q178_cdc_apply")(spark, sfDir)
      .as[(Long, String, Long, String)].collect()
    val ids = Tables.documents(spark, sfDir)
      .select($"doc_id".as[Long], $"source".as[String]).collect()

    // Independent replay: apply ops in seq order into a mutable map.
    val state = scala.collection.mutable.Map.empty[Long, (Option[String], Long, String)]
    for ((id, src) <- ids) state(id) = (Some(src), 0L, "I")
    for ((id, src) <- ids if id % 7 == 0) state(id) = (Some(src + "+u1"), 1L, "U")
    for ((id, _) <- ids if id % 13 == 0) state(id) = (None, 2L, "D")
    for ((id, src) <- ids if id % 11 == 0) state(id + 100000L) = (Some("ins:" + src), 3L, "I")
    for ((id, _) <- ids if id % 26 == 0) state(id) = (Some("resurrected"), 4L, "U")
    val expected = state.toSeq.collect {
      case (k, (Some(attr), seq, op)) => (k, attr, seq, op)
    }.sortBy(_._1)
    assert(out.toSeq == expected)

    // The semantics that make it an upsert: even multiples of 13 come
    // back (seq-4 UPDATE after the seq-2 DELETE); odd multiples stay gone.
    val live = out.map(_._1).toSet
    val del13 = ids.map(_._1).filter(_ % 13 == 0)
    assert(del13.filter(_ % 26 == 0).forall(live.contains))
    assert(del13.filterNot(_ % 26 == 0).forall(k => !live.contains(k)))
    assert(out.filter(r => r._1 % 26 == 0 && r._1 < 100000L)
      .forall(_._2 == "resurrected"))
  }

  test("q179 zone maps: audit matches a local recompute; sorted layout dominates hash") {
    val out = SparkEntry.queries("q179_zonemap_pruning")(spark, sfDir)
      .as[(String, Int, Long, Long, Long, Long, Long, Double, Double)].collect()
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id".as[Long], $"n_chars".as[Long]).collect()
    val preds = Seq((1, 0L, 800L), (2, 800L, 1600L), (3, 1600L, 3200L),
      (4, 3200L, 100000000L))

    // Local shard assignment: interpolated quantile boundaries (same
    // definition as percentile/quantile_cont) and the md5-derived hash.
    val sorted = docs.map(_._2.toDouble).sorted
    def quant(f: Double): Double = {
      val pos = f * (sorted.length - 1)
      val lo = pos.toInt; val frac = pos - lo
      if (lo + 1 < sorted.length) sorted(lo) * (1 - frac) + sorted(lo + 1) * frac
      else sorted(lo)
    }
    val bs = (1 to 15).map(i => quant(i / 16.0))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val assigned = docs.flatMap { case (id, nc) =>
      val sh = bs.count(b => nc.toDouble > b)
      val hh = java.lang.Long.parseLong(md5hex(s"s#$id").take(15), 16) % 16
      Seq(("sorted", sh, nc), ("hash", hh.toInt, nc))
    }
    val zones = assigned.groupBy(a => (a._1, a._2)).map { case ((l, s), g) =>
      (l, s, g.map(_._3).min, g.map(_._3).max, g.size.toLong)
    }.toSeq
    val expected = (for {
      l <- Seq("hash", "sorted"); (pid, lo, hi) <- preds
    } yield {
      val z = zones.filter(_._1 == l)
      val scanned = z.filter(zz => !(zz._4 < lo || zz._3 >= hi))
      val matched = docs.count(d => d._2 >= lo && d._2 < hi).toLong
      val rs = scanned.map(_._5).sum
      (l, pid, lo, hi, scanned.size.toLong, rs, matched,
        BigDecimal(1.0 - scanned.size / 16.0).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(rs.toDouble / math.max(matched, 1L)).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }).sortBy(r => (r._1, r._2))
    assert(out.toSeq == expected)

    // The layout lesson: range layout never scans more shards than hash.
    for (pid <- preds.map(_._1)) {
      val s = out.find(r => r._1 == "sorted" && r._2 == pid).get._5
      val h = out.find(r => r._1 == "hash" && r._2 == pid).get._5
      assert(s <= h, s"pred $pid: sorted scans $s > hash $h")
    }
    assert(out.exists(r => r._1 == "sorted" && r._5 < 16))
  }

  test("q180 mutual kNN: pairs match a local in-bucket brute force and are symmetric") {
    val out = SparkEntry.queries("q180_mutual_knn")(spark, sfDir)
      .as[(Long, Long, Double, Double)].collect()
    val emb = Tables.embeddings(spark, sfDir)
      .select($"vec_id".as[Long], $"embedding".as[Seq[Float]]).collect()

    // Independent sketch recompute from the public md5 derivation.
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val planes = 4; val dims = 64
    val m = (0 until planes).map(p => (0 until dims).map(d =>
      if (md5hex(s"$p:$d").head.toInt % 2 == 1) 1.0 else -1.0))
    def sketch(v: Seq[Float]): Long =
      (0 until planes).foldLeft(0L) { (acc, p) =>
        var s = 0.0
        for (d <- 0 until dims) s += m(p)(d) * v(d).toDouble
        if (s > 0) acc | (1L << p) else acc
      }
    def nrm(v: Seq[Float]): Double = {
      var s = 0.0; for (x <- v) s += x.toDouble * x.toDouble; math.sqrt(s)
    }
    def dot(a: Seq[Float], b: Seq[Float]): Double = {
      var s = 0.0; for (i <- a.indices) s += a(i).toDouble * b(i).toDouble; s
    }
    val withSk = emb.map { case (id, v) => (id, v, sketch(v), nrm(v)) }
    val byBucket = withSk.groupBy(_._3)
    val best = withSk.flatMap { case (id, v, sk, n) =>
      val cands = byBucket(sk).filter(_._1 != id)
        .map { case (bid, bv, _, bn) => (bid, round6(dot(v, bv) / (n * bn))) }
        .sortBy { case (bid, c) => (-c, bid) }
      if (cands.isEmpty) None
      else {
        val (nn, c1) = cands.head
        val c2 = if (cands.size > 1) cands(1)._2 else 0.0
        Some(id -> (nn, c1, round6(c1 - c2)))
      }
    }.toMap
    val expected = best.toSeq.collect {
      case (a, (b, c1, ma)) if best.get(b).exists(_._1 == a) && a < b =>
        (a, b, c1, round6(ma + best(b)._3))
    }.sortBy(_._1)
    assert(out.toSeq == expected)

    // Mutual-NN symmetry: each endpoint appears in at most one pair.
    val ends = out.flatMap(r => Seq(r._1, r._2))
    assert(ends.distinct.length == ends.length)
    assert(out.forall(r => r._3 >= -1.000001 && r._3 <= 1.000001 && r._4 >= 0.0))
  }

  test("q181 seasonal anomaly: flags match a local dow-baseline MAD recompute") {
    val out = SparkEntry.queries("q181_seasonal_anomaly")(spark, sfDir)
      .select(col("d").cast("string"), col("dow"), col("cnt"), col("baseline"),
        col("resid"), col("mz"), col("anomaly"))
      .as[(String, Int, Long, Double, Double, Option[Double], Int)].collect()
    val ev = Tables.events(spark, sfDir)
      .select(expr("unix_micros(ts)").as[Long]).collect()
    def dayOf(us: Long): java.time.LocalDate =
      java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L))
        .atZone(java.time.ZoneOffset.UTC).toLocalDate
    val daily = ev.groupBy(dayOf).view.mapValues(_.length.toLong).toMap
    val dowOf = daily.keys.map(d => d -> d.getDayOfWeek.getValue % 7).toMap
    val bl = daily.groupBy { case (d, _) => dowOf(d) }
      .view.mapValues(g => g.values.sum.toDouble / g.size).toMap
    val resid = daily.map { case (d, c) => d -> (c.toDouble - bl(dowOf(d))) }
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      val pos = 0.5 * (n - 1); val lo = pos.toInt; val frac = pos - lo
      if (lo + 1 < n) s(lo) * (1 - frac) + s(lo + 1) * frac else s(lo)
    }
    val m0 = med(resid.values.toSeq)
    val devs = resid.map { case (d, r) => d -> math.abs(r - m0) }
    val mad = med(devs.values.toSeq)
    def r2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = daily.keys.toSeq.sorted(Ordering.by((d: java.time.LocalDate) => d.toString))
      .map { d =>
        val mz = if (mad == 0) None else Some(0.6745 * devs(d) / mad)
        (d.toString, dowOf(d), daily(d), r2(bl(dowOf(d))), r2(resid(d)),
          mz.map(r2), if (mz.exists(_ > 3.5)) 1 else 0)
      }
    assert(out.toSeq == expected)
  }

  test("q182 weak labels: votes match a local LF replay; abstain bookkeeping holds") {
    val out = SparkEntry.queries("q182_weak_label_vote")(spark, sfDir)
      .as[(Long, Int, Int, Int, Int, Int)].collect()
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id".as[Long], $"n_chars".as[Long], $"text".as[String]).collect()
    val stops = Set("the", "and", "of", "to", "a", "in", "is", "that", "it", "for")
    val expected = docs.map { case (id, nc, text) =>
      val toks = text.toLowerCase.split(' ').filter(_.nonEmpty)
      val nstop = toks.count(stops.contains)
      val ndig = text.count(c => c >= '0' && c <= '9')
      val lfLen = if (nc >= 300) 1 else if (nc < 80) -1 else 0
      val lfStop =
        if (toks.isEmpty) 0
        else if (nstop.toDouble / toks.length >= 0.15) 1
        else if (nstop == 0) -1 else 0
      val lfDig = if (text.nonEmpty && ndig.toDouble / text.length > 0.1) -1 else 0
      val score = lfLen + lfStop + lfDig
      (id, lfLen, lfStop, lfDig, score, Integer.signum(score))
    }.sortBy(_._1)
    assert(out.toSeq == expected.toSeq)
    // All three LFs must actually fire in both directions somewhere (a
    // labeling function that never votes is dead weight).
    assert(out.exists(_._2 == 1) && out.exists(_._2 == -1))
    assert(out.exists(_._3 == 1))
    assert(out.exists(r => r._5 != 0))
  }

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q183 link prediction: top-20 matches a local 4-gram-graph recompute") {
    val out = SparkEntry.queries("q183_link_prediction")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id".as[Long], $"text".as[String]).collect()

    val grams = docs.map { case (id, text) =>
      val w = text.toLowerCase.split(' ').filter(_.nonEmpty)
      id -> (if (w.length >= 4) w.sliding(4).map(_.mkString(" ")).toSet
             else Set.empty[String])
    }
    val df = grams.flatMap(_._2).groupBy(identity).view.mapValues(_.length).toMap
    val kept = grams.map { case (id, g) => id -> g.filter(df(_) <= 8) }
    val byGram = kept.flatMap { case (id, g) => g.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val edges = byGram.values.flatMap { ids =>
      val s = ids.toSeq.sorted
      for (i <- s.indices; j <- (i + 1) until s.size) yield (s(i), s(j))
    }.toSet
    val nbrs = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val cands = nbrs.toSeq.flatMap { case (_, ns) =>
      val s = ns.toSeq.sorted
      for (i <- s.indices; j <- (i + 1) until s.size) yield (s(i), s(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = cands.toSeq.collect {
      case ((a, b), cn) if !edges((a, b)) =>
        val (da, db) = (nbrs(a).size.toLong, nbrs(b).size.toLong)
        (a, b, cn, da, db, round6(cn.toDouble / (da + db - cn)))
    }.sortBy { case (a, b, _, _, _, j) => (-j, a, b) }.take(20)
    assert(out.toSeq == expected)
    assert(out.nonEmpty, "gate-scale corpus must yield distance-2 candidates")
  }

  test("q184 moments: skew/kurtosis match an exact-integer-sum local recompute") {
    val out = SparkEntry.queries("q184_moments_profile")(spark, sfDir)
      .as[(String, Long, Double, Double, Double, Double)].collect()
    val ev = Tables.events(spark, sfDir)
      .select($"event_type".as[String],
        expr("CAST(round(value * 100) AS BIGINT)").as[Long]).collect()
    val expected = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, rows) =>
      val cs = rows.map(r => BigInt(r._2))
      val n = cs.length.toLong; val nn = n.toDouble
      val s1 = cs.sum.toDouble
      val s2 = cs.map(c => c * c).sum.toDouble
      val s3 = cs.map(c => c * c * c).sum.toDouble
      val s4 = cs.map(c => c * c * c * c).sum.toDouble
      val mean = s1 / nn
      val m2 = s2 / nn - mean * mean
      val m3 = s3 / nn - 3 * mean * (s2 / nn) + 2 * mean * mean * mean
      val m4 = s4 / nn - 4 * mean * (s3 / nn) + 6 * mean * mean * (s2 / nn) -
        3 * mean * mean * mean * mean
      (et, n, r4(mean / 100), r4(math.sqrt(m2) / 100),
        r4(m3 / math.pow(m2, 1.5)), r4(m4 / (m2 * m2) - 3))
    }
    assert(out.toSeq == expected)
    // events.value is exponential-ish: every type should be right-skewed
    // with positive excess kurtosis.
    assert(out.forall(r => r._5 > 0 && r._6 > 0))
  }

  test("q185 KS drift: D statistics match a local binned-ECDF recompute") {
    val out = SparkEntry.queries("q185_ks_drift")(spark, sfDir)
      .as[(String, Long, Long, Double, Double, Int)].collect()
    val ev = Tables.events(spark, sfDir)
      .select($"event_type".as[String], expr("unix_micros(ts)").as[Long],
        $"value".as[Double]).collect()
    def dayOf(us: Long): java.time.LocalDate =
      java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L))
        .atZone(java.time.ZoneOffset.UTC).toLocalDate
    val days = ev.map(e => dayOf(e._2))
    val (dmin, dmax) = (days.min, days.max)
    val span = java.time.temporal.ChronoUnit.DAYS.between(dmin, dmax)
    val expected = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, rows) =>
      val tagged = rows.map { case (_, us, v) =>
        val off = java.time.temporal.ChronoUnit.DAYS.between(dmin, dayOf(us))
        (if (off * 2 <= span) "a" else "b", v)
      }
      val vmin = rows.map(_._3).min; val vmax = rows.map(_._3).max
      def bin(v: Double): Int =
        if (vmax == vmin) 0
        else math.min(31, math.floor((v - vmin) / ((vmax - vmin) / 32.0)).toInt)
      val cells = tagged.groupBy { case (sm, v) => bin(v) }.toSeq.sortBy(_._1)
        .map { case (b, g) =>
          (b, g.count(_._1 == "a").toLong, g.count(_._1 == "b").toLong) }
      val na = cells.map(_._2).sum; val nb = cells.map(_._3).sum
      var (ca, cb) = (0L, 0L); var d = 0.0
      for ((_, a, b) <- cells) {
        ca += a; cb += b
        d = math.max(d, math.abs(ca.toDouble / na - cb.toDouble / nb))
      }
      val ksd = round6(d)
      val crit = round6(1.358 * math.sqrt((na + nb).toDouble / (na.toDouble * nb.toDouble)))
      (et, na, nb, ksd, crit, if (ksd > crit) 1 else 0)
    }
    assert(out.toSeq == expected)
  }

  test("q186 Gini: scores match a local rank-formula recompute and stay in [0,1)") {
    val out = SparkEntry.queries("q186_gini_concentration")(spark, sfDir)
      .as[(String, Long, Long, Double)].collect()
    val docs = Tables.documents(spark, sfDir)
      .select($"source".as[String], $"n_chars".as[Long], $"doc_id".as[Long]).collect()
    val expected = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val n = sorted.length.toLong
      val tot = sorted.map(_._2).sum
      val iw = sorted.zipWithIndex.map { case ((_, x, _), i) => (i + 1) * x }.sum
      val gini = round6(2.0 * iw.toDouble / (n.toDouble * tot.toDouble) -
        (n.toDouble + 1.0) / n.toDouble)
      (src, n, tot, gini)
    }
    assert(out.toSeq == expected)
    assert(out.forall(r => r._4 >= 0.0 && r._4 < 1.0))
  }

  private def r2d(x: Double): Double =
    BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def quantI(sorted: Seq[Long], f: Double): Double = {
    val pos = f * (sorted.length - 1)
    val lo = pos.toInt; val frac = pos - lo
    if (lo + 1 < sorted.length) sorted(lo) * (1 - frac) + sorted(lo + 1) * frac
    else sorted(lo).toDouble
  }

  test("q187 RFM: segment report matches a local quartile-score replay") {
    val out = SparkEntry.queries("q187_rfm_segments")(spark, sfDir)
      .as[(String, Long, Double, Double, Double)].collect()
    val ev = Tables.events(spark, sfDir)
      .select($"user_id".as[Long], expr("unix_micros(ts)").as[Long],
        $"event_type".as[String],
        expr("CAST(round(value * 100) AS BIGINT)").as[Long]).collect()
    def dayOf(us: Long): java.time.LocalDate =
      java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L))
        .atZone(java.time.ZoneOffset.UTC).toLocalDate
    val dmax = ev.map(e => dayOf(e._2)).max
    val peru = ev.groupBy(_._1).toSeq.map { case (u, rows) =>
      val r = rows.map(e =>
        java.time.temporal.ChronoUnit.DAYS.between(dayOf(e._2), dmax)).min
      val f = rows.length.toLong
      val m = rows.filter(_._3 == "purchase").map(_._4).sum
      (u, r, f, m)
    }
    def bounds(xs: Seq[Long]): Seq[Double] = {
      val s = xs.sorted
      Seq(0.25, 0.5, 0.75).map(quantI(s, _))
    }
    val (rb, fb, mb) = (bounds(peru.map(_._2)), bounds(peru.map(_._3)), bounds(peru.map(_._4)))
    def sc(v: Long, bs: Seq[Double]) = 1 + bs.count(v.toDouble > _)
    val segs = peru.map { case (_, r, f, m) =>
      val (rq, fq, mq) = (sc(r, rb), sc(f, fb), sc(m, mb))
      val seg =
        if (rq <= 2 && fq >= 3 && mq >= 3) "champion"
        else if (rq >= 3 && fq <= 2) "at_risk"
        else if (rq <= 2 && fq <= 2) "casual"
        else "regular"
      (seg, r, f, m)
    }
    val expected = segs.groupBy(_._1).toSeq.sortBy(_._1).map { case (seg, g) =>
      val n = g.length
      (seg, n.toLong, r2d(g.map(_._2).sum.toDouble / n),
        r2d(g.map(_._3).sum.toDouble / n),
        r2d(g.map(_._4).sum.toDouble / n / 100))
    }
    assert(out.toSeq == expected)
    assert(out.map(_._2).sum == peru.size, "segments must partition the users")
  }

  test("q188 Holt forecast matches a local sequential-recurrence replay") {
    val out = SparkEntry.queries("q188_holt_forecast")(spark, sfDir)
      .as[(String, Long, Double, Double, Double, Double, Double, Double)].collect()
    val ev = Tables.events(spark, sfDir)
      .select($"event_type".as[String], expr("unix_micros(ts)").as[Long]).collect()
    def dayOf(us: Long): java.time.LocalDate =
      java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L))
        .atZone(java.time.ZoneOffset.UTC).toLocalDate
    val expected = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, rows) =>
      val ys = rows.groupBy(e => dayOf(e._2)).toSeq.sortBy(_._1.toString)
        .map(_._2.length.toDouble)
      var l = ys.head; var b = 0.0; var sse = 0.0; var k = 1
      for (y <- ys.tail) {
        sse = sse + (y - (l + b)) * (y - (l + b))
        val nl = 0.5 * y + 0.5 * (l + b)
        b = 0.3 * (nl - l) + 0.7 * b
        l = nl
        k += 1
      }
      (et, k.toLong, r4(l), r4(b), r4(l + b), r4(l + 2 * b), r4(l + 3 * b),
        r4(sse / (k - 1)))
    }
    assert(out.toSeq == expected)
    // Forecasts continue the trend line: f2 − f1 equals the trend up to
    // the two 4dp roundings.
    assert(out.forall(r => ((r._6 - r._5) - r._4).abs <= 2.1e-4))
  }

  test("q189 attribution matches a local walk; revenue is conserved") {
    val out = SparkEntry.queries("q189_attribution")(spark, sfDir)
      .as[(String, Long, Double, Long, Double)].collect()
    val ev = Tables.events(spark, sfDir)
      .select($"user_id".as[Long], expr("unix_micros(ts)").as[Long],
        $"event_id".as[Long], $"event_type".as[String],
        expr("CAST(round(value * 100) AS BIGINT)").as[Long]).collect()
    val attributions = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      var firstTouch: Option[String] = None
      var lastTouch: Option[String] = None
      sorted.flatMap { case (_, _, _, et, c) =>
        if (et == "purchase")
          Some((lastTouch.getOrElse("direct"), firstTouch.getOrElse("direct"), c))
        else {
          if (firstTouch.isEmpty) firstTouch = Some(et)
          lastTouch = Some(et)
          None
        }
      }
    }.toSeq
    val channels = (attributions.map(_._1) ++ attributions.map(_._2)).distinct.sorted
    val expected = channels.map { ch =>
      val la = attributions.filter(_._1 == ch)
      val fa = attributions.filter(_._2 == ch)
      (ch, la.size.toLong, r2d(la.map(_._3).sum / 100.0),
        fa.size.toLong, r2d(fa.map(_._3).sum / 100.0))
    }
    assert(out.toSeq == expected)
    val nPur = attributions.size.toLong
    assert(out.map(_._2).sum == nPur && out.map(_._4).sum == nPur)
  }
}
