package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r16: same-JVM interleaved A/B of the OLD (r15, 8-pin sequential) vs
  * NEW (r16, 5-pin fused-flags) hygiene funnel — the host window swings
  * 2-3× between minutes, so only interleaved same-JVM minima compare.
  * The OLD chain is replicated inline (it no longer exists in main).
  *
  * CAVEAT (r16 ADVICE, acknowledged): BOTH sides intentionally share
  * the current repetitionBattery — in the r16 runs that was already the
  * new codegen battery, so this A/B isolates the PIN/FLAG RESTRUCTURE
  * only, not the battery fold; the r15 funnel's gopher stage actually
  * ran the five-aggregate form (repetitionBatteryAggTwin). The r17
  * old-vs-new A/B lives in ProfR17FunnelAB.
  * Run: `sbt "Test/runMain graft.ProfFunnelAB [sfDir] [rounds]"`. */
object ProfFunnelAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("PROF_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import operators.{Corpus, Corpus12, Corpus13, Corpus14, TextAnalytics}

    def oldStages(docs0: DataFrame): Seq[(String, DataFrame)] = {
      val cap = 10
      val minRetained = 0.2
      val docs = docs0.select(col("doc_id"), col("text"), col("n_chars"))
      val k0 = Corpus13.robotsDecisions(docs).filter(col("allowed"))
        .select("doc_id").localCheckpoint()
      val s0 = docs.join(k0, Seq("doc_id"), "left_semi")
      val w1 = Corpus12.canonUrls(s0).groupBy("canon_url")
        .agg(min("doc_id").as("doc_id")).select("doc_id")
      val narrow = docs0.select(col("doc_id"), col("n_chars"))
      val k1 = narrow.join(k0, Seq("doc_id"), "left_semi")
        .join(w1, Seq("doc_id"), "left_semi").localCheckpoint()
      val s1 = docs.join(k1.select("doc_id"), Seq("doc_id"), "left_semi")
      val kl = Corpus14.langGateDecisions(s1).filter(col("keep")).select("doc_id")
      val k15 = k1.join(kl, Seq("doc_id"), "left_semi").localCheckpoint()
      val top = udaf(new graft.functions.TopKScored(cap))
      val k2 = Corpus12.hostedDocs(k15).groupBy("host")
        .agg(top(col("n_chars").cast("double"), col("doc_id")).as("kept"))
        .select(explode(col("kept")).as("k")).select(col("k.id").as("doc_id"))
      val s2 = docs.join(k2, Seq("doc_id"), "left_semi").localCheckpoint()
      val k25 = Corpus14.blocklistDecisions(s2).filter(col("keep")).select("doc_id")
      val s25 = s2.join(k25, Seq("doc_id"), "left_semi").localCheckpoint()
      val k3 = Corpus12.repetitionBattery(s25).filter(col("keep")).select("doc_id")
      val s3 = s25.join(k3, Seq("doc_id"), "left_semi").localCheckpoint()
      val k35 = Corpus14.qualityClassify(s3).filter(col("clf_keep")).select("doc_id")
      val s35 = s3.join(k35, Seq("doc_id"), "left_semi").localCheckpoint()
      val ch = Corpus.chunkTokens(s35).withColumn("fp", md5(col("chunk")))
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
        .filter(col("rf") >= minRetained).select("doc_id")
      val s4 = s35.join(k4, Seq("doc_id"), "left_semi").localCheckpoint()
      Seq("fetch" -> docs, "robots_gate" -> s0, "url_dedup" -> k1,
        "lang_id_gate" -> k15, "domain_quota" -> s2, "blocklist_gate" -> s25,
        "gopher_gate" -> s3, "clf_gate" -> s35, "chunk_scrub" -> s4)
    }

    try {
      Tables.documents(spark, dir).count()
    } catch { case _: Throwable => () }
    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val docs = () => Tables.documents(spark, dir)
    var oldTs = List.empty[Double]
    var newTs = List.empty[Double]
    (1 to rounds).foreach { r =>
      val o = time(Corpus12.funnelAudit(oldStages(docs())))
      val n = time(SparkEntry.queries("q268_hygiene_funnel")(spark, dir))
      oldTs ::= o; newTs ::= n
      println(f"round $r: old=$o%.2f new=$n%.2f")
    }
    println(f"OLD min=${oldTs.min}%.2f median=${oldTs.sorted.apply(oldTs.size / 2)}%.2f")
    println(f"NEW min=${newTs.min}%.2f median=${newTs.sorted.apply(newTs.size / 2)}%.2f")
    // value identity: same rows both forms
    val a = Corpus12.funnelAudit(oldStages(docs())).collect().map(_.toString).sorted
    val b = SparkEntry.queries("q268_hygiene_funnel")(spark, dir).collect().map(_.toString).sorted
    println(s"VALUE-IDENTICAL: ${a.sameElements(b)} (${a.length} rows)")
    spark.stop()
  }
}
