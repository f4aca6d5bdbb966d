package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch analysis main for the r12 classifier-gate recalibration
  * (test scope, the ProfFunnel discipline): for a grid of margin
  * thresholds t, how many docs the classifier-at-t fails on the full
  * corpus (nf) and how many it UNIQUELY kills while the other four
  * stateless gates pass (nu) — the q277 question, swept instead of
  * pinned at the deployed t. Also prints every holdout margin so the
  * chosen t's clearance (min |margin − t|) can be verified against the
  * float-jitter pin before it is deployed. This harness is what chose
  * QThreshold = 0.03 in r12 (measured: nu = 2/4/56 at the three SFs
  * with holdout P = R = 1.0; nu ≈ 0 at the old t = 0).
  * Run: `sbt "Test/runMain graft.ProfClf [sfDir ...]"`. */
object ProfClf {

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import operators.{Corpus12, Corpus13, Corpus14}
    import spark.implicits._

    // holdout margins under the deployed model (train fixture unchanged)
    def printHold(name: String, rows: Seq[(String, String)]): Unit = {
      val hold = rows.zipWithIndex
        .map { case ((text, label), i) => (i.toLong, text, label) }
        .toDF("doc_id", "text", "label")
      val hm = Corpus14.qualityMargins(hold)
        .join(hold.select(col("doc_id"), col("label")), Seq("doc_id"))
        .orderBy("doc_id")
        .select($"doc_id", $"label", $"clf_margin").as[(Long, String, Double)]
        .collect()
      println(s"--- holdout '$name' margins")
      hm.foreach { case (i, l, m) => println(f"  $i%2d $l%-8s $m%+.6f") }
    }
    printHold("deployed", Corpus14.qualityHoldout)

    val grid = Seq(-0.10, -0.05, -0.02, 0.0, 0.02, 0.03, 0.04, 0.05,
      0.06, 0.08, 0.10, 0.12, 0.15)
    dirs.foreach { dir =>
      val docs = Tables.documents(spark, dir)
      val flags = Corpus13.robotsDecisions(docs)
        .select(col("doc_id"), col("allowed").as("f_robots"))
        .join(Corpus14.langGateDecisions(docs)
          .select(col("doc_id"), col("keep").as("f_lang")), Seq("doc_id"))
        .join(Corpus14.blocklistDecisions(docs)
          .select(col("doc_id"), col("keep").as("f_block")), Seq("doc_id"))
        .join(Corpus12.repetitionBattery(docs)
          .select(col("doc_id"), col("keep").as("f_gopher")), Seq("doc_id"))
        .join(Corpus14.qualityMargins(docs), Seq("doc_id"))
        .localCheckpoint()
      val n = flags.count()
      val others = col("f_robots") && col("f_lang") && col("f_block") && col("f_gopher")
      println(s"=== $dir n=$n")
      // margin distribution: how far up does the corpus margin mass go?
      val qs = flags.stat.approxQuantile("clf_margin",
        Array(0.0, 0.01, 0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0), 0.001)
      println("  corpus margin quantiles " + qs.map(q => f"$q%.4f").mkString(" "))
      grid.foreach { t =>
        val r = flags.agg(
          sum(when(col("clf_margin") <= t, 1L).otherwise(0L)).as("nf"),
          sum(when(col("clf_margin") <= t && others, 1L).otherwise(0L)).as("nu"),
          min(abs(col("clf_margin") - t)).as("clearance"))
          .as[(Long, Long, Double)].head()
        println(f"  t=$t%+.3f nf=${r._1}%6d nu=${r._2}%6d clearance=${r._3}%.2e")
      }
    }
    spark.stop()
  }
}
