package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral checks for q162-q165 — what the DuckDB oracle can't see:
  * the segmented sweep-line replayed by a straight-line local simulation,
  * SCD2 interval tiling invariants, a brute-force triangle recount on
  * the query's own edge list, the Q21 semi/anti correlation replayed
  * row-by-row, and the plan shapes (no cartesian product in the wedge
  * join; supplier broadcast).
  */
class Corpus5Spec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val GAP = 1800000000L // 30 min in micros

  test("q162 peak concurrency: exact match with a local global-sweep simulation") {
    val out = SparkEntry.queries("q162_peak_concurrency")(spark, sfDir)
      .select(col("day").cast("string"), col("sessions_started"),
        col("sessions_ended"), col("max_concurrency"))
      .as[(String, Long, Long, Long)].collect()

    // Local sessionization under q62/session_window semantics.
    val ev = Tables.events(spark, sfDir)
      .select(expr("unix_micros(ts)").as[Long], $"user_id".as[Long]).collect()
    val sessions = ev.groupBy(_._2).values.flatMap { rows =>
      val ts = rows.map(_._1).sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var st = ts.head; var last = ts.head
      for (t <- ts.tail) {
        if (t - last >= GAP) { out += ((st, last + GAP)); st = t }
        last = t
      }
      out += ((st, last + GAP))
      out
    }.toSeq

    // Straight-line simulation of the sweep the engine computes
    // segmented. Three deliberate matches with the query's semantics
    // (r4 advice): (1) deltas are applied in (ts, delta) PEER GROUPS —
    // the RANGE-frame default — so several ends tied on one timestamp
    // never expose an intermediate carry−1 value the query can't
    // produce; (2) each day's max starts at its MIDNIGHT level (the
    // running count carried in), so an all-negative-prefix day peaks at
    // the carry; (3) every day from first to last delta day is emitted,
    // delta-free days at their flat carry level.
    val deltas = sessions.flatMap { case (st, en) => Seq((st, 1), (en, -1)) }
    val groups = deltas.groupBy(identity).toSeq
      .map { case ((t, d), g) => (t, d, g.size.toLong) }
      .sortBy { case (t, d, _) => (t, d) }
    def dayOf(us: Long): java.time.LocalDate =
      java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L))
        .atZone(java.time.ZoneOffset.UTC).toLocalDate
    val firstDay = dayOf(groups.head._1)
    val lastDay = dayOf(groups.last._1)
    val days = Iterator.iterate(firstDay)(_.plusDays(1))
      .takeWhile(!_.isAfter(lastDay)).toSeq
    var cur = 0L
    val mx = scala.collection.mutable.Map.empty[java.time.LocalDate, Long]
    val nst = scala.collection.mutable.Map.empty[java.time.LocalDate, Long].withDefaultValue(0L)
    val nen = scala.collection.mutable.Map.empty[java.time.LocalDate, Long].withDefaultValue(0L)
    var di = 0
    for ((t, d, n) <- groups) {
      val day = dayOf(t)
      while (di < days.size && !days(di).isAfter(day)) {
        mx(days(di)) = cur // midnight level of every day up to this delta's
        di += 1
      }
      cur += d * n // whole peer group applies at once (RANGE semantics)
      mx(day) = math.max(mx(day), cur)
      if (d == 1) nst(day) += n else nen(day) += n
    }
    val expected = days.map(d => (d.toString, nst(d), nen(d), mx(d)))
    assert(out.toSeq == expected)
    assert(out.map(_._2).sum == sessions.size && out.map(_._3).sum == sessions.size)
  }

  test("q163 SCD2: histories tile [1,99] with one current row and closed-form attrs") {
    val out = SparkEntry.queries("q163_scd2_dimension")(spark, sfDir)
      .as[(Long, String, Int, Int, Int)].collect()
    val src = Tables.documents(spark, sfDir)
      .select($"doc_id".as[Long], $"source".as[String]).collect().toMap

    // Independent local SCD2 build from the closed-form snapshots.
    val expected = src.toSeq.sorted.flatMap { case (id, source) =>
      val a2 = if (id % 5 == 0) source + "+r2" else source
      val a3 = if (id % 3 == 0) a2 + "+r3" else a2
      val vers = Seq((1, source), (2, a2), (3, a3))
      val kept = vers.zipWithIndex.filter { case ((_, a), i) =>
        i == 0 || a != vers(i - 1)._2
      }.map(_._1)
      kept.zipWithIndex.map { case ((v, a), i) =>
        val vt = if (i == kept.size - 1) 99 else kept(i + 1)._1 - 1
        (id, a, v, vt, if (vt == 99) 1 else 0)
      }
    }
    assert(out.toSeq.sortBy(r => (r._1, r._3)) == expected)
    // Tiling: per doc, intervals start at 1, chain without gaps, end open.
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.head._3 == 1 && sorted.last._4 == 99)
      assert(sorted.count(_._5 == 1) == 1)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 == a._4 + 1)
        case _           =>
      }
    }
  }

  test("q164 triangles: brute-force recount on the query's own edge list; no cartesian plan") {
    val df = SparkEntry.queries("q164_triangle_count")(spark, sfDir)
    assert(!df.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    val out = df.as[(Long, Long)].collect()
    val edges = operators.Corpus5
      .shingleEdges(Tables.documents(spark, sfDir))
      .as[(Long, Long)].collect()
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    edges.foreach { case (u, v) => adj(u) += v; adj(v) += u }
    // Each triangle enumerated once as u < v < w.
    val triCnt = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    var total = 0L
    edges.foreach { case (u, v) =>
      for (w <- (adj(u) & adj(v)) if w > v) {
        total += 1; triCnt(u) += 1; triCnt(v) += 1; triCnt(w) += 1
      }
    }
    assert(out.find(_._1 == -1L).map(_._2).contains(total))
    val expTop = triCnt.toSeq.sortBy { case (id, n) => (-n, id) }.take(20)
    assert(out.filter(_._1 != -1L).sortBy { case (id, n) => (-n, id) }.toSeq == expTop)
  }

  test("q165 sole-late-supplier: exists/not-exists replayed row-by-row; supplier broadcast") {
    val df = SparkEntry.queries("q165_sole_late_supplier")(spark, sfDir)
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    val out = df.as[(String, Long)].collect()

    val li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey".as[Long], $"l_suppkey".as[Long],
        expr("unix_micros(cast(l_shipdate as timestamp))").as[Long]).collect()
    val od = Tables.orders(spark, sfDir)
      .select($"o_orderkey".as[Long],
        expr("unix_micros(cast(o_orderdate as timestamp))").as[Long])
      .collect().toMap
    val sname = Tables.supplier(spark, sfDir)
      .select($"s_suppkey".as[Long], $"s_name".as[String]).collect().toMap

    val ninety = 90L * 86400L * 1000000L
    val late = li.filter { case (o, _, ship) => od.get(o).exists(ship > _ + ninety) }
    val allSupp = li.groupBy(_._1).map { case (o, rs) => o -> rs.map(_._2).toSet }
    val lateSupp = late.groupBy(_._1).map { case (o, rs) => o -> rs.map(_._2).toSet }
    val waiting = late.filter { case (o, s, _) =>
      allSupp(o).exists(_ != s) && (lateSupp(o) - s).isEmpty
    }
    val expected = waiting.groupBy(r => sname(r._2))
      .map { case (n, rs) => (n, rs.size.toLong) }.toSeq
      .sortBy { case (n, c) => (-c, n) }.take(20)
    assert(out.toSeq == expected)
    assert(out.nonEmpty)
  }

  test("q174 CUPED: arms partition the users, theta replayed from integer cents, adjustment is mean-preserving") {
    val out = SparkEntry.queries("q174_cuped_experiment")(spark, sfDir)
      .as[(String, Long, Double, Double, Double, Double, Double)].collect()
    assert(out.map(_._1).toSeq == Seq("A", "B"))
    // pooled fit: identical theta / rho2 on both rows
    assert(out.map(_._6).distinct.length == 1 && out.map(_._7).distinct.length == 1)

    // local replay in exact integer cents
    def arm(u: Long): String = {
      val h = java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"x#$u".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
      if (h % 2 == 0) "A" else "B"
    }
    val ev = Tables.events(spark, sfDir)
      .select($"user_id".as[Long], expr("CAST(ts AS DATE) < DATE '2024-01-16'").as[Boolean],
        expr("CAST(round(value * 100) AS BIGINT)").as[Long]).collect()
    val perUser = ev.groupBy(_._1).map { case (u, rows) =>
      (u, arm(u), rows.filter(_._2).map(_._3).sum, rows.filter(!_._2).map(_._3).sum)
    }.toSeq
    assert(perUser.map(r => r._1 -> r._2).toMap.values.toSet == Set("A", "B"))
    assert(out.map(_._2).sum == perUser.size)
    val n = perUser.size.toDouble
    val sx = perUser.map(_._3).sum.toDouble; val sy = perUser.map(_._4).sum.toDouble
    val sxx = perUser.map(r => r._3 * r._3).sum.toDouble
    val sxy = perUser.map(r => r._3 * r._4).sum.toDouble
    val theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(out.head._6 - math.rint(theta * 1e6) / 1e6) < 1e-9,
      s"theta ${out.head._6} vs replay $theta")
    // CUPED is mean-preserving over the pooled population:
    // Σ n_arm·mean_adj == Σ n_arm·mean_post (the adjustment only moves
    // variance between arms), up to the published rounding
    val tot = out.map(r => r._2 * r._5).sum
    val totPost = out.map(r => r._2 * r._4).sum
    assert(math.abs(tot - totPost) < 1.0, s"adjusted total $tot vs post $totPost")
  }

  test("q176 Poisson bootstrap replayed end-to-end from raw hashes") {
    val out = SparkEntry.queries("q176_bootstrap_ci")(spark, sfDir)
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    out.values.foreach { case (m, lo, hi) => assert(lo <= m && m <= hi) }

    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def arm(u: Long) =
      if (java.lang.Long.parseLong(md5hex(s"x#$u").take(15), 16) % 2 == 0) "A" else "B"
    val thresholds = Seq(0.3678794411714423, 0.7357588823428846, 0.9196986029286058,
      0.9810118431238462, 0.9963401531726563, 0.9994058151824183)
    def pois(u: Double): Long = thresholds.indexWhere(u < _) match {
      case -1 => 6L; case k => k.toLong
    }
    val users = Tables.events(spark, sfDir)
      .select($"user_id".as[Long], expr("CAST(round(value * 100) AS BIGINT)").as[Long])
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    Seq("A", "B").foreach { a =>
      val us = users.keys.filter(arm(_) == a).toSeq
      val means = (0 until 32).map { r =>
        var wx = 0L; var ws = 0L
        us.foreach { u =>
          val uu = java.lang.Long.parseLong(md5hex(s"b$r#$u").take(8), 16) / 4294967296.0
          val w = pois(uu)
          wx += w * users(u); ws += w
        }
        wx.toDouble / ws.toDouble / 100.0
      }.sorted
      val (gm, glo, ghi) = out(a)
      assert(math.rint(means(1) * 1e4) / 1e4 == glo, s"$a lo")
      assert(math.rint(means(30) * 1e4) / 1e4 == ghi, s"$a hi")
      assert(math.abs(means.foldLeft(0.0)(_ + _) / 32.0 - gm) < 1e-4, s"$a mean")
    }
  }
}
