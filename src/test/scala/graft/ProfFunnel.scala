package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for q268's stage costs (test scope, the ProfQ121
  * discipline): times each pinned stage build and the final audit
  * assembly separately, so a composition regression can be attributed
  * to a stage instead of guessed at. Run:
  * `sbt "Test/runMain graft.ProfFunnel [sfDir]"`. */
object ProfFunnel {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import operators.{Corpus, Corpus12, Corpus13, Corpus14}
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $name%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { i =>
      println(s"--- pass $i")
      val docs = Tables.documents(spark, dir).select("doc_id", "text", "n_chars")
      val k0 = t("k0 robots") {
        Corpus13.robotsDecisions(docs).filter(col("allowed"))
          .select("doc_id").localCheckpoint()
      }
      val s0 = docs.join(k0, Seq("doc_id"), "left_semi")
      val s1 = t("s1 url_dedup") {
        val w1 = Corpus12.canonUrls(s0).groupBy("canon_url")
          .agg(min("doc_id").as("doc_id")).select("doc_id")
        s0.join(w1, Seq("doc_id"), "left_semi").localCheckpoint()
      }
      val s2 = t("s2 quota") {
        val top = udaf(new graft.functions.TopKScored(10))
        val k2 = Corpus12.hostedDocs(s1).groupBy("host")
          .agg(top(col("n_chars").cast("double"), col("doc_id")).as("kept"))
          .select(explode(col("kept")).as("k")).select(col("k.id").as("doc_id"))
        s1.join(k2, Seq("doc_id"), "left_semi").localCheckpoint()
      }
      val s25 = t("s25 blocklist") {
        val k25 = Corpus14.blocklistDecisions(s2).filter(col("keep")).select("doc_id")
        s2.join(k25, Seq("doc_id"), "left_semi").localCheckpoint()
      }
      val s3 = t("s3 gopher") {
        val k3 = Corpus12.repetitionBattery(s25).filter(col("keep")).select("doc_id")
        s25.join(k3, Seq("doc_id"), "left_semi").localCheckpoint()
      }
      val s35 = t("s35 clf") {
        val k35 = Corpus14.qualityClassify(s3).filter(col("clf_keep")).select("doc_id")
        s3.join(k35, Seq("doc_id"), "left_semi").localCheckpoint()
      }
      val s4 = t("s4 chunk_scrub") {
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
          .filter(col("rf") >= 0.2).select("doc_id")
        s35.join(k4, Seq("doc_id"), "left_semi").localCheckpoint()
      }
      t("audits+collect") {
        SparkEntry.queries("q268_hygiene_funnel")(spark, dir).collect()
      }
      Seq(s0, s1, s2, s25, s3, s35, s4).foreach(_ => ())
    }
    spark.stop()
  }
}
