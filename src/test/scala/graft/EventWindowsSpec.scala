package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral checks for the event-analytics family beyond the oracle —
  * q124's defining invariants plus a full local recompute. */
class EventWindowsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("q124 cohorts: day-0 retention is 1.0 and the matrix matches a local recompute") {
    val got = SparkEntry.queries("q124_retention_cohorts")(spark, sfDir)
      .select("cohort_d", "offset_d", "n_active", "cohort_n", "retention")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    // every user is active on their own first day, so every cohort has
    // an offset-0 row at retention exactly 1.0
    val byCohort = got.groupBy(_._1)
    byCohort.foreach { case (c, rows) =>
      val day0 = rows.filter(_._2 == 0L)
      assert(day0.length == 1 && day0.head._5 == 1.0, s"cohort $c day-0")
      rows.foreach { case (_, _, nA, nC, r) =>
        assert(nA <= nC && r > 0.0 && r <= 1.0, s"cohort $c bounds")
      }
    }
    // full local recompute from the raw events
    val ev = Tables.events(spark, sfDir)
      .selectExpr("user_id", "CAST(to_date(ts) AS STRING) AS d")
      .as[(Long, String)].collect()
    val firstDay = ev.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val active = ev.distinct
    val sizes = firstDay.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def dayNum(s: String) = java.time.LocalDate.parse(s).toEpochDay
    val expected = active
      .map { case (u, d) => (firstDay(u), dayNum(d) - dayNum(firstDay(u))) }
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((c, off), n) =>
        (c, off, n, sizes(c),
          BigDecimal(n.toDouble / sizes(c))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy { case (c, off, _, _, _) => (c, off) }
    assert(got.toSeq == expected, s"got=${got.take(3).toSeq} exp=${expected.take(3)}")
  }

  test("q126 session paths match a local sessionize-and-count recompute") {
    val got = SparkEntry.queries("q126_session_paths")(spark, sfDir)
      .select("path", "n_sessions").as[(String, Long)].collect()
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "event_type")
      .as[(Long, Long, Long, String)].collect()
    val paths = ev.groupBy(_._1).values.flatMap { rows =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      // q62's break rule: a gap of ≥ 30 min starts a new session
      val sessions = ordered.foldLeft(Vector.empty[Vector[(Long, String)]]) {
        case (acc, (_, us, _, t)) =>
          if (acc.isEmpty || us - acc.last.last._1 >= 1800000000L)
            acc :+ Vector((us, t))
          else acc.init :+ (acc.last :+ ((us, t)))
      }
      sessions.map(_.take(3).map(_._2).mkString(">"))
    }
    val expected = paths.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(20)
    assert(got.toSeq == expected, s"got=${got.take(3).toSeq} exp=${expected.take(3)}")
  }
}
