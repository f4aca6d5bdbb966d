package graft

import org.apache.spark.sql.SparkSession

/** r17 same-JVM interleaved A/B for the q268 PASS-4 restructure: the
  * battery flag now APPENDS per row (withGopherKeep) instead of joining
  * its frame back, which makes w3 a zero-exchange projection — variant A
  * drops the w3 localCheckpoint (each reader re-runs bounded map work),
  * variant B keeps it (one more sequential barrier, one evaluation).
  * Interleaved minima because this host's window swings 2-3× minute to
  * minute; ends with a row-identity assert between the two variants.
  * Run: `sbt "Test/runMain graft.ProfR17FunnelAB [sfDir] [rounds]"`. */
object ProfR17FunnelAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    docs.count() // warm the scan
    import org.apache.spark.sql.{Column, DataFrame}
    import org.apache.spark.sql.functions._
    // The r16 funnel replicated FAITHFULLY (PASS 4 joins the battery
    // frame back on doc_id and pins w3) so the A/B attributes exactly
    // this round's restructure — the r16 ADVICE note on ProfFunnelAB
    // (baseline accidentally sharing the new code) applied.
    def oldAudit(): DataFrame = {
      // PASS 1-3 replicated verbatim (they are identical in both forms,
      // but hygieneStages pins eagerly, so sharing its frames would
      // charge the NEW w3/k4 pin jobs to the old variant's clock).
      val ds = docs.select(col("doc_id"), col("text"), col("n_chars"))
      val langCounts = operators.TextAnalytics.langBatteries.map(l => s"n_${l._1}")
      val f = operators.Corpus14.withLangGate(ds)
        .withColumnRenamed("keep", "f_lang")
        .drop(langCounts :+ "predicted": _*)
        .withColumn("canon_url", operators.Corpus12.canonUrlCol)
        .transform(operators.Corpus13.withRobotsAllowed)
        .withColumnRenamed("allowed", "f_robots")
        .select(col("doc_id"), col("n_chars"), operators.Corpus12.hostColForProf.as("host"),
          col("canon_url"), col("f_robots"), col("f_lang"))
        .localCheckpoint()
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
      val w = fu.join(q, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chars"), col("f_robots"), col("f_lang"),
          col("won_url"), coalesce(col("won_quota"), lit(false)).as("won_quota"))
        .localCheckpoint()
      val s1c = col("f_robots") && col("won_url")
      val s15c = s1c && col("f_lang")
      val s2 = ds.join(
        w.filter(s15c && col("won_quota")).select("doc_id"), Seq("doc_id"), "left_semi")
        .localCheckpoint()
      val st: Seq[(String, DataFrame)] = Seq("fetch" -> ds,
        "robots_gate" -> f.filter(col("f_robots")),
        "url_dedup" -> w.filter(s1c),
        "lang_id_gate" -> w.filter(s15c),
        "domain_quota" -> s2)
      val fg = operators.Corpus12.repetitionBattery(s2)
        .select(col("doc_id"), col("keep").as("f_gopher"))
      val w3 = operators.Corpus14.withQualityMargin(operators.Corpus14.withBlocklist(s2))
        .select(col("doc_id"), col("n_chars"),
          (col("blocked_total") === 0).as("f_block"),
          (col("clf_margin") > operators.Corpus14.QThreshold).as("f_clf"))
        .join(fg, Seq("doc_id"))
        .localCheckpoint()
      val s35 = s2.join(
        w3.filter(col("f_block") && col("f_gopher") && col("f_clf")).select("doc_id"),
        Seq("doc_id"), "left_semi")
      val ch = operators.Corpus.chunkTokens(s35).withColumn("fp", md5(col("chunk")))
      val dd = ch.groupBy("fp").agg(
        countDistinct("doc_id").as("df"),
        min(struct(col("doc_id"), col("chunk_idx"))).as("win"))
      val k4 = ch.join(dd, Seq("fp"))
        .select(col("doc_id"), col("n_tokens"),
          when(col("df") >= 3, lit(0L))
            .when(col("win") === struct(col("doc_id"), col("chunk_idx")), col("n_tokens"))
            .otherwise(lit(0L)).as("kt"))
        .groupBy("doc_id")
        .agg(round(sum("kt") * lit(1.0) / sum("n_tokens"), 4).as("rf"))
        .filter(col("rf") >= 0.2).select("doc_id")
        .localCheckpoint()
      val s4 = s2.join(k4, Seq("doc_id"), "left_semi")
      operators.Corpus12.funnelAudit(
        st.take(5) ++ Seq(
          "blocklist_gate" -> w3.filter(col("f_block")),
          "gopher_gate" -> w3.filter(col("f_block") && col("f_gopher")),
          "clf_gate" -> s35,
          "chunk_scrub" -> s4))
    }
    def newAudit(): DataFrame =
      operators.Corpus12.funnelAudit(
        operators.Corpus12.hygieneStages(docs, pinW3 = true))
    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(() => oldAudit()); time(() => newAudit()) // warm laps, untimed
    val (as, bs) = (Array.fill(rounds)(0.0), Array.fill(rounds)(0.0))
    for (i <- 0 until rounds) {
      as(i) = time(() => oldAudit())
      bs(i) = time(() => newAudit())
      println(f"round $i: old=${as(i)}%.2f new=${bs(i)}%.2f")
    }
    println(f"MIN old=${as.min}%.2f  new=${bs.min}%.2f  " +
      f"MED old=${as.sorted.apply(rounds / 2)}%.2f new=${bs.sorted.apply(rounds / 2)}%.2f")
    val a = oldAudit().collect().map(_.toString).sorted.toSeq
    val b = newAudit().collect().map(_.toString).sorted.toSeq
    assert(a == b, "variant rows differ!")
    println(s"ROWS IDENTICAL n=${a.size}")
    spark.stop()
  }
}
