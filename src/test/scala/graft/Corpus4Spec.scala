package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral checks for the q153-q155 summary/lifecycle closers — what
  * the DuckDB oracle can't see: the KMV estimator replayed from raw
  * hashes and its shard-merge identity, the Bloom filter's no-false-
  * negative guarantee and width economics, and the CDC diff replayed
  * from the edit script.
  */
class Corpus4Spec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The engine's 60-bit hex fold + 1 (Corpus4.uhSpark), locally. */
  private def uhash(uid: Long): Long =
    java.lang.Long.parseLong(md5hex(s"u#$uid").take(15), 16) + 1

  private val K = operators.Corpus4.KMV_K
  private val TWO60 = 1152921504606846976L

  test("q153 KMV: estimator replayed from raw hashes, err within 25% in the n>k regime, sketches merge across shards") {
    // sf0.01: 150 distinct users > k=64, so the estimator actually runs
    val dir = "/root/testdata/sf0.01"
    val out = SparkEntry.queries("q153_kmv_distinct_sketch")(spark, dir)
      .select("scope", "est_ndv", "exact_ndv", "err_ratio")
      .as[(String, Double, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out.size == 10)
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_type", $"value")
      .as[(Long, String, Double)].collect()
    def kmvEst(users: Set[Long]): Double = {
      val hs = users.map(uhash).toSeq.sorted
      if (hs.size < K) hs.size.toDouble
      else (K - 1).toDouble * TWO60.toDouble / hs(K - 1)
    }
    val all = ev.map(_._1).toSet
    val a = ev.filter(_._3 > 150).map(_._1).toSet
    val b = ev.filter(_._2 == "error").map(_._1).toSet
    for ((scope, users) <- Seq("all" -> all, "A_value_gt150" -> a,
        "B_error" -> b, "AuB" -> (a ++ b))) {
      val r = out(scope)
      assert(r._3 == users.size, s"$scope exact ndv")
      assert(math.abs(r._2 - kmvEst(users)) <= 0.051, s"$scope est replay")
      assert(r._4 > 0.75 && r._4 < 1.25, s"$scope err ratio ${r._4}")
    }
    // intersection row: J over the union's top-k, replayed
    val union = (a ++ b).map(uhash).toSeq.sorted.take(K)
    val ah = a.map(uhash); val bh = b.map(uhash)
    val j = union.count(h => ah(h) && bh(h)).toDouble / union.size
    val intRow = out("AnB_est")
    assert(intRow._3 == (a & b).size, "exact intersection")
    assert(math.abs(intRow._2 - math.round(j * kmvEst(a ++ b) * 10) / 10.0) <= 0.051,
      "intersection est replay")
    // mergeability: k-min of unioned per-shard k-mins ≡ the global sketch
    val shards = ev.map(_._1).distinct.groupBy(_ % 4).values
      .map(_.map(uhash).toSeq.distinct.sorted.take(K))
    val merged = shards.flatten.toSeq.distinct.sorted.take(K)
    assert(merged == all.map(uhash).toSeq.sorted.take(K), "shard-merge identity")
  }

  private def tsetFp(text: String): String =
    md5hex(text.toLowerCase.split(" ").filter(_.nonEmpty).distinct.sorted.mkString(","))

  test("q154 bloom: zero false negatives at both widths, every exact_hit verdict true to the data, wide width at most as noisy") {
    val out = SparkEntry.queries("q154_bloom_decontaminate")(spark, sfDir)
      .select("width", "doc_id", "exact_hit")
      .as[(Int, Long, Boolean)].collect()
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => id -> tsetFp(t) }
    val evalFps = docs.filter(_._1 % 10 == 1).map(_._2).toSet
    val train = docs.filter(_._1 % 10 != 1)
    val trueHits = train.filter(d => evalFps(d._2)).map(_._1).toSet
    assert(trueHits.nonEmpty, "fixture has no true collisions — test is vacuous")
    for (w <- Seq(operators.Corpus4.BLOOM_NARROW, operators.Corpus4.BLOOM_WIDE)) {
      val flagged = out.filter(_._1 == w)
      // Bloom guarantee: a true collision can NEVER be missed
      assert(trueHits.subsetOf(flagged.map(_._2).toSet), s"width $w false negative")
      // exact_hit column is truthful both ways
      flagged.foreach { case (_, id, eh) =>
        assert(eh == trueHits(id), s"width $w doc $id exact_hit wrong")
      }
    }
    val fp = (w: Int) => out.count(r => r._1 == w && !r._3)
    assert(fp(operators.Corpus4.BLOOM_WIDE) <= fp(operators.Corpus4.BLOOM_NARROW),
      "wide bloom noisier than narrow")
  }

  test("q156 profile: stats replayed locally for representative columns") {
    val out = SparkEntry.queries("q156_column_profile")(spark, sfDir)
      .select("tbl", "col_name", "n_rows", "n_null", "ndv", "min_v", "max_v", "avg_len")
      .as[(String, String, Long, Long, Long, String, String, Option[Double])]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(out.size == 10)
    val vals = Tables.events(spark, sfDir).select($"value").as[Double].collect()
    val v = out(("events", "value"))
    assert(v._3 == vals.length && v._4 == 0)
    assert(v._5 == vals.distinct.length)
    assert(v._6 == BigDecimal(vals.min).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble.toString)
    assert(v._8.isEmpty, "numeric column must not report avg_len")
    val langs = Tables.documents(spark, sfDir).select($"lang").as[String].collect()
    val l = out(("documents", "lang"))
    assert(l._5 == langs.distinct.length && l._6 == langs.min && l._7 == langs.max)
    val texts = Tables.documents(spark, sfDir).select($"text").as[String].collect()
    val t = out(("documents", "text"))
    val meanLen = texts.map(_.length.toLong).sum.toDouble / texts.length
    assert(math.abs(t._8.get - meanLen) < 0.005 + 1e-9, s"avg_len ${t._8} vs $meanLen")
  }

  test("q157 robust outliers: median/MAD/modified-z replayed exactly per event_type") {
    val out = SparkEntry.queries("q157_robust_outliers")(spark, sfDir)
      .select("event_type", "n", "med", "mad", "n_outliers", "max_mz")
      .as[(String, Long, Double, Double, Long, Double)].collect()
    assert(out.length == 5)
    def medOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val byType = Tables.events(spark, sfDir)
      .select($"event_type", $"value").as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq)
    out.foreach { case (et, n, med, mad, nOut, maxMz) =>
      val xs = byType(et)
      assert(n == xs.length)
      val m = medOf(xs)
      val devs = xs.map(x => math.abs(x - m))
      val md = medOf(devs)
      assert(med == math.round(m * 100) / 100.0, s"$et med")
      assert(mad == math.round(md * 100) / 100.0, s"$et mad")
      val mzs = devs.map(_ * 0.6745 / md)
      assert(nOut == mzs.count(_ > 3.5), s"$et outlier count")
      assert(maxMz == math.round(mzs.max * 100) / 100.0, s"$et max mz")
    }
  }

  test("q158 PMI: every published pair's PMI replayed from raw doc-term sets") {
    val out = SparkEntry.queries("q158_pmi_cooccurrence")(spark, sfDir)
      .select("a", "b", "cab", "ca", "cb", "pmi")
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(out.length == 20)
    val docToks = Tables.documents(spark, sfDir)
      .select($"text").as[String].collect()
      .map(_.toLowerCase.split(" ").filter(_.nonEmpty).toSet)
    val n = docToks.length.toLong
    val dfm = docToks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    out.foreach { case (a, b, cab, ca, cb, pmi) =>
      assert(a < b, "pair not canonically ordered")
      assert(cab == docToks.count(s => s(a) && s(b)), s"($a,$b) cab")
      assert(ca == dfm(a) && cb == dfm(b), s"($a,$b) df")
      val want = math.log(cab.toDouble * n / (ca * cb))
      assert(math.abs(pmi - want) <= 0.00005 + 1e-12, s"($a,$b) pmi $pmi vs $want")
      assert(cab >= 5, "support floor violated")
    }
    // descending PMI with (a,b) tie-break — the declared total order
    assert(out.sliding(2).forall { case Array(x, y) =>
      x._6 > y._6 || (x._6 == y._6 && (x._1 < y._1 || (x._1 == y._1 && x._2 < y._2)))
    })
  }

  test("q159 NFC: codegen and interpreted paths agree with java.text.Normalizer; idempotent; nulls pass through") {
    val fixture = Seq("café", "café", "éléphant",
      "plain ascii text", "각", "ﬁle", "Å", "Å")
    // codegen path (default): run through a DataFrame projection
    val viaDf = fixture.toDF("raw")
      .select(functions.TextExprs.nfcNorm($"raw")).as[String].collect()
    // interpreted path: eval() on the bare expression
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val viaEval = fixture.map { s =>
      functions.NfcNormalize(Literal(UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType)).eval(null)
        .asInstanceOf[UTF8String].toString
    }
    val want = fixture.map(
      java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    assert(viaDf.toSeq == want && viaEval == want)
    // idempotence: NFC(NFC(x)) == NFC(x)
    assert(want.map(java.text.Normalizer.normalize(_,
      java.text.Normalizer.Form.NFC)) == want)
    // ligature preserved (NFKC-only fold), angstrom singleton mapped
    assert(want(5) == "ﬁle" && want(7) == "Å")
    // null passes through the null-safe unary path
    val n = Seq[(Long, Option[String])]((1L, None)).toDF("id", "raw")
      .select(functions.TextExprs.nfcNorm($"raw")).collect()
    assert(n.head.isNullAt(0))
  }

  test("ORC round trip preserves the documents table exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val docs = Tables.documents(spark, sfDir)
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == docs.schema)
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
  }

  test("q160 growth curve: first-seen, cumulative, and rolling-7-day uniques replayed locally") {
    val out = SparkEntry.queries("q160_cumulative_uniques")(spark, sfDir)
      .select("day", "new_users", "cum_users", "wau7")
      .as[(String, Long, Long, Long)].collect()
    val ev = Tables.events(spark, sfDir)
      .select($"user_id", to_date($"ts").cast("string")).as[(Long, String)]
      .collect()
    val days = ev.map(_._2).distinct.sorted
    assert(out.map(_._1).toSeq == days.toSeq, "one row per active day")
    val firstSeen = ev.groupBy(_._1).view.mapValues(_.map(_._2).min)
    var cum = 0L
    out.foreach { case (d, nu, cu, wau) =>
      val expectNew = firstSeen.count(_._2 == d).toLong
      assert(nu == expectNew, s"$d new_users")
      cum += expectNew
      assert(cu == cum, s"$d cum_users")
      val lo = java.time.LocalDate.parse(d).minusDays(6).toString
      val expectWau = ev.filter(e => e._2 >= lo && e._2 <= d).map(_._1).distinct.length
      assert(wau == expectWau, s"$d wau7")
    }
    assert(out.last._3 == firstSeen.size, "cumulative must end at total uniques")
  }

  test("q161 funnel: strict ordering rejects out-of-order conversions") {
    // the dense corpus converts everyone; this fixture is where the
    // ordering logic can actually discriminate
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    val fixture = Seq(
      // u1: clean view < click < purchase → counts everywhere
      (1L, "view", ts(0)), (1L, "click", ts(1)), (1L, "purchase", ts(2)),
      // u2: purchase BEFORE click → stops at click
      (2L, "view", ts(0)), (2L, "purchase", ts(1)), (2L, "click", ts(2)),
      // u3: click before any view → stops at view
      (3L, "click", ts(0)), (3L, "view", ts(1)),
      // u4: never viewed → not even stage 1
      (4L, "click", ts(0)), (4L, "purchase", ts(1)),
      // u5: second click after view rescues the funnel; purchase after it
      (5L, "click", ts(0)), (5L, "view", ts(1)), (5L, "click", ts(2)),
      (5L, "purchase", ts(3)))
      .toDF("user_id", "event_type", "ts")
    val out = operators.Corpus4.funnel(fixture)
      .select("stage", "users").as[(String, Long)].collect().toMap
    assert(out("1_view") == 4)      // u1 u2 u3 u5
    assert(out("2_click") == 3)     // u1 u2 u5 (u3 click precedes view)
    assert(out("3_purchase") == 2)  // u1 u5 (u2 purchase precedes click)
  }

  test("q155 CDC diff: exact replay of the edit script") {
    val out = SparkEntry.queries("q155_snapshot_diff")(spark, sfDir)
      .select("doc_id", "change", "old_fp", "new_fp")
      .as[(Long, String, Option[String], Option[String])].collect().toSet
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val v1 = docs.map { case (id, t) => id -> md5hex(t) }.toMap
    val v2 = (docs.filter(_._1 % 7 != 0).map { case (id, t) =>
        id -> md5hex(if (id % 11 == 0) t + " v2" else t)
      } ++ docs.filter(_._1 % 13 == 0).map { case (id, t) =>
        (id + 1000000L) -> md5hex(t)
      }).toMap
    val expected =
      v2.keySet.diff(v1.keySet).map(id => (id, "added", None, Some(v2(id)))) ++
      v1.keySet.diff(v2.keySet).map(id => (id, "removed", Some(v1(id)), None)) ++
      v1.keySet.intersect(v2.keySet).filter(id => v1(id) != v2(id))
        .map(id => (id, "changed", Some(v1(id)), Some(v2(id))))
    assert(out == expected)
    // the script really produced all three kinds
    assert(Set("added", "removed", "changed").subsetOf(out.map(_._2)))
  }

  test("q168 HLL: registers and estimate replayed from raw user ids; estimates within 15%") {
    val out = SparkEntry.queries("q168_hll_distinct")(spark, sfDir)
      .select($"scope".as[String], $"est_ndv".as[Double], $"exact_ndv".as[Long])
      .collect().map(r => r._1 -> (r._2, r._3)).toMap

    def uhash(u: Long): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"u#$u".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16) + 1

    val ev = Tables.events(spark, sfDir)
      .select($"event_type".as[String], $"user_id".as[Long]).collect()
    val scopes = ev.map { case (_, u) => ("all", u) } ++ ev
    scopes.groupBy(_._1).foreach { case (scope, rows) =>
      // local register build + HLL formula replay (m=256, p=8)
      val reg = Array.fill(256)(0)
      rows.foreach { case (_, u) =>
        val h = uhash(u)
        val idx = (h % 256).toInt
        val w = h / 256
        val rho = if (w == 0) 53 else 53 - java.lang.Long.toBinaryString(w).length
        reg(idx) = math.max(reg(idx), rho)
      }
      val s = reg.foldLeft(0.0)((a, m) => a + math.pow(2.0, -m))
      val v = reg.count(_ == 0)
      val alpha = 0.7213 / (1 + 1.079 / 256.0)
      val eRaw = alpha * 65536.0 / s
      val est = if (eRaw <= 2.5 * 256 && v > 0) 256.0 * math.log(256.0 / v) else eRaw
      val (gotEst, gotExact) = out(scope)
      assert(math.abs(gotEst - est) < 0.05 + 1e-9, s"$scope: $gotEst vs replay $est")
      assert(gotExact == rows.map(_._2).distinct.size)
      assert(math.abs(gotEst / gotExact - 1.0) <= 0.15,
        s"$scope estimate off by ${gotEst / gotExact}")
    }
  }

  test("q172 sketch rollup: the last day's merged registers equal a full-history rebuild") {
    val out = SparkEntry.queries("q172_hll_timeseries")(spark, sfDir)
      .select($"etype".as[String], $"day".cast("string").as[String],
        $"est_cum".as[Double], $"exact_cum".as[Long]).collect()

    def uhash(u: Long): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"u#$u".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16) + 1

    val ev = Tables.events(spark, sfDir)
      .select($"event_type".as[String], $"user_id".as[Long]).collect()
    ev.groupBy(_._1).foreach { case (etype, rows) =>
      // full-history register build — what the merge must reproduce
      val reg = Array.fill(256)(0)
      rows.foreach { case (_, u) =>
        val h = uhash(u); val w = h / 256
        val rho = if (w == 0) 53 else 53 - java.lang.Long.toBinaryString(w).length
        val i = (h % 256).toInt
        reg(i) = math.max(reg(i), rho)
      }
      val s = reg.foldLeft(0.0)((a, m) => a + math.pow(2.0, -m))
      val v = reg.count(_ == 0)
      val alpha = 0.7213 / (1 + 1.079 / 256.0)
      val eRaw = alpha * 65536.0 / s
      val est = if (eRaw <= 2.5 * 256 && v > 0) 256.0 * math.log(256.0 / v) else eRaw
      val last = out.filter(_._1 == etype).maxBy(_._2)
      assert(math.abs(last._3 - math.round(est * 10) / 10.0) < 1e-9,
        s"$etype: rollup ${last._3} != full rebuild $est")
      assert(last._4 == rows.map(_._2).distinct.size)
      // exact to-date counts never decrease
      val series = out.filter(_._1 == etype).sortBy(_._2).map(_._4)
      assert(series.zip(series.tail).forall { case (a, b) => a <= b })
    }
  }
}
