package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r17: sharedSpanIslands re-derivation A/B — the positional-8-gram
  * fingerprint relation g(doc_id, pos, g64) is referenced by the df-cap
  * aggregate AND the pair join (2 full explode passes; the capped self-
  * join's two sides dedupe via exchange reuse). Variant PIN checkpoints
  * g once (narrow: 3 numeric cols per token position — the pinnedLsh
  * fingerprint discipline); variant NOPIN is the shipped form.
  * Run: `sbt "Test/runMain graft.ProfR17Spans [sfDir] [rounds]"`. */
object ProfR17Spans {
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
    val docs = Tables.documents(spark, dir)
    docs.count()
    val toksExpr = operators.TextAnalytics.toksExpr
    def islands(pin: Boolean): DataFrame = {
      val g0 = operators.Corpus2.posGrams8(docs)
      val g = if (pin) g0.localCheckpoint() else g0
      val dfOk = g.groupBy("g").agg(countDistinct("doc_id").as("df"))
        .filter(col("df") <= 8).select("g")
      val capped = g.join(dfOk, "g")
      val m = capped.as("a").join(capped.as("b"),
          col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.pos").as("pa"), col("b.pos").as("pb"))
        .distinct()
        .withColumn("diag", col("pa") - col("pb"))
      m.withColumn("isl", col("pa") - row_number().over(
          Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")))
        .groupBy("doc_a", "doc_b", "diag", "isl")
        .agg(min("pa").as("lo_a"), max("pa").as("hi_a"),
          (max(col("pa")) - min(col("pa")) + 8).cast("long").as("span"))
    }
    def time(pin: Boolean): Double = {
      val t0 = System.nanoTime()
      islands(pin).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(false); time(true)
    val (as, bs) = (Array.fill(rounds)(0.0), Array.fill(rounds)(0.0))
    for (i <- 0 until rounds) { as(i) = time(false); bs(i) = time(true) }
    println(f"MIN nopin=${as.min}%.2f pin=${bs.min}%.2f  MED nopin=${as.sorted.apply(rounds / 2)}%.2f pin=${bs.sorted.apply(rounds / 2)}%.2f")
    val a = islands(false).collect().map(_.toString).sorted.toSeq
    val b = islands(true).collect().map(_.toString).sorted.toSeq
    assert(a == b, "variant rows differ!")
    println(s"ROWS IDENTICAL n=${a.size}")
    spark.stop()
  }
}
