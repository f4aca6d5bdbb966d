package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r17: which of the funnel's five pins earn their barrier? Replicates
  * hygieneStages (appended-battery form) with a per-pin mask and times
  * masks interleaved in one JVM (this host's window swings 2-3×/min).
  * A pin whose suffix re-derivation is cheap (w: two groupBys over the
  * pinned-narrow f; k4: a chunk pipeline whose exchanges ReuseExchange
  * dedupes inside the one audit action) may cost more as a sequential
  * barrier than its readers save. Ends with row-identity asserts.
  * Run: `sbt "Test/runMain graft.ProfR17PinMask [sfDir] [rounds]"`. */
object ProfR17PinMask {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs0 = Tables.documents(spark, dir)
    docs0.count()

    def pin(df: DataFrame, on: Boolean): DataFrame =
      if (on) df.localCheckpoint() else df

    // hygieneStages replicated with a pin mask (order: f, w, s2, w3, k4)
    def funnel(m: (Boolean, Boolean, Boolean, Boolean, Boolean)): DataFrame = {
      val docs = docs0.select(col("doc_id"), col("text"), col("n_chars"))
      val langCounts = operators.TextAnalytics.langBatteries.map(l => s"n_${l._1}")
      val f = pin(operators.Corpus14.withLangGate(docs)
        .withColumnRenamed("keep", "f_lang")
        .drop(langCounts :+ "predicted": _*)
        .withColumn("canon_url", operators.Corpus12.canonUrlCol)
        .transform(operators.Corpus13.withRobotsAllowed)
        .withColumnRenamed("allowed", "f_robots")
        .select(col("doc_id"), col("n_chars"),
          operators.Corpus12.hostColForProf.as("host"),
          col("canon_url"), col("f_robots"), col("f_lang")), m._1)
      val u = f.filter(col("f_robots")).groupBy("canon_url")
        .agg(min("doc_id").as("doc_id"))
        .select(col("doc_id"), lit(true).as("won_url"))
      val fu = f.join(u, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chars"), col("host"), col("f_robots"),
          col("f_lang"), coalesce(col("won_url"), lit(false)).as("won_url"))
      val top = udaf(new graft.functions.TopKScored(10))
      val q = fu.filter(col("f_robots") && col("won_url") && col("f_lang"))
        .groupBy("host")
        .agg(top(col("n_chars").cast("double"), col("doc_id")).as("kept"))
        .select(explode(col("kept")).as("k"))
        .select(col("k.id").as("doc_id"), lit(true).as("won_quota"))
      val w = pin(fu.join(q, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chars"), col("f_robots"), col("f_lang"),
          col("won_url"), coalesce(col("won_quota"), lit(false)).as("won_quota")), m._2)
      val s1c = col("f_robots") && col("won_url")
      val s15c = s1c && col("f_lang")
      val s2 = pin(docs.join(
        w.filter(s15c && col("won_quota")).select("doc_id"),
        Seq("doc_id"), "left_semi"), m._3)
      val w3 = pin(operators.Corpus14.withQualityMargin(
        operators.Corpus14.withBlocklist(operators.Corpus12.withGopherKeep(s2)))
        .select(col("doc_id"), col("n_chars"),
          (col("blocked_total") === 0).as("f_block"),
          col("f_gopher"),
          (col("clf_margin") > operators.Corpus14.QThreshold).as("f_clf")), m._4)
      val s35 = s2.join(
        w3.filter(col("f_block") && col("f_gopher") && col("f_clf")).select("doc_id"),
        Seq("doc_id"), "left_semi")
      val ch = operators.Corpus.chunkTokens(s35).withColumn("fp", md5(col("chunk")))
      val dd = ch.groupBy("fp").agg(
        countDistinct("doc_id").as("df"),
        min(struct(col("doc_id"), col("chunk_idx"))).as("win"))
      val k4 = pin(ch.join(dd, Seq("fp"))
        .select(col("doc_id"), col("n_tokens"),
          when(col("df") >= 3, lit(0L))
            .when(col("win") === struct(col("doc_id"), col("chunk_idx")), col("n_tokens"))
            .otherwise(lit(0L)).as("kt"))
        .groupBy("doc_id")
        .agg(round(sum("kt") * lit(1.0) / sum("n_tokens"), 4).as("rf"))
        .filter(col("rf") >= 0.2).select("doc_id"), m._5)
      val s4 = s2.join(k4, Seq("doc_id"), "left_semi")
      operators.Corpus12.funnelAudit(Seq("fetch" -> docs,
        "robots_gate" -> f.filter(col("f_robots")),
        "url_dedup" -> w.filter(s1c),
        "lang_id_gate" -> w.filter(s15c),
        "domain_quota" -> s2,
        "blocklist_gate" -> w3.filter(col("f_block")),
        "gopher_gate" -> w3.filter(col("f_block") && col("f_gopher")),
        "clf_gate" -> s35,
        "chunk_scrub" -> s4))
    }

    val masks = Seq(
      "fwswk(all,r16-ish)" -> (true, true, true, true, true),
      "fws2w3  (no k4)   " -> (true, true, true, true, false),
      "f_s2w3k (no w)    " -> (true, false, true, true, true))
    def time(m: (Boolean, Boolean, Boolean, Boolean, Boolean)): Double = {
      val t0 = System.nanoTime()
      funnel(m).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    masks.foreach { case (_, m) => time(m) } // warm lap, untimed
    val res = masks.map { case (n, _) => n -> Array.fill(rounds)(0.0) }.toMap
    for (i <- 0 until rounds; (n, m) <- masks) {
      val d = time(m); res(n)(i) = d
    }
    masks.foreach { case (n, _) =>
      val a = res(n).sorted
      println(f"$n min=${a.head}%.2f med=${a(rounds / 2)}%.2f")
    }
    val ref = funnel(masks.head._2).collect().map(_.toString).sorted.toSeq
    masks.tail.foreach { case (n, m) =>
      val b = funnel(m).collect().map(_.toString).sorted.toSeq
      assert(ref == b, s"mask $n rows differ!")
    }
    println(s"ROWS IDENTICAL across masks n=${ref.size}")
    spark.stop()
  }
}
