package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage profiler for q283/q284/q285 (r13): attributes the sf0.1 wall
  * to model-build vs scoring vs rank vs the final sort, so a slow
  * reading is a measured stage, not a guess.
  * Run: `sbt "Test/runMain graft.ProfQ283 [sfDir]"`. */
object ProfQ283 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import operators.{Corpus, Corpus14}
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF283 $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass")
      val docs = Tables.documents(spark, dir)
      t("gate only") {
        Corpus.qualityGate(docs).agg(sum(when(col("keep"), 1L))).collect()
      }
      val ref = docs.join(Corpus.qualityGate(docs).filter(col("keep"))
        .select("doc_id"), Seq("doc_id"), "left_semi")
      t("bigramPairs count") {
        Corpus14.bigramPairs(docs).agg(count(lit(1))).collect()
      }
      val (lm2, lm1, vocab, vt) = Corpus14.lmModels(ref)
      // CAPTURE the pinned frames and score against THOSE (r14 ADVICE):
      // discarding localCheckpoint()'s return re-derived lm1/vocab from
      // lm2's lineage inside the lmScore stage, misallocating the
      // attribution this harness exists to produce
      val Seq(lm2p, lm1p, vp, vtp) = t("models build+pin") {
        Seq(lm2, lm1, vocab, vt).map(_.localCheckpoint())
      }
      t("lmScore") {
        Corpus14.lmScore(docs, lm2p, lm1p, vp, vtp)
          .agg(sum("ppl")).collect()
      }
      t("q283 full") {
        SparkEntry.queries("q283_lm_perplexity")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      t("q284 full") {
        SparkEntry.queries("q284_dsir_select")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      t("q285 full") {
        SparkEntry.queries("q285_quality_signal_cube")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
