package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r17: attribute q143's exec time to its three rungs by timing each
  * rung's frame standalone (noop sink, min-of-N, same JVM).
  * Run: `sbt "Test/runMain graft.ProfR17Q143 [sfDir] [rounds]"`. */
object ProfR17Q143 {
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
    docs.count()
    val isEval = col("doc_id") % 10 === 1
    def d2() = docs
      .select(col("doc_id"), operators.TextAnalytics.fpExactCol.as("fp"),
        graft.functions.ShingleFps.shingleFps(
          expr(operators.TextAnalytics.toksExpr), 5).as("shs"))
      .localCheckpoint()
    val p = d2() // pin once; rungs read the pin like the real query
    def ex() = {
      val evFp = p.filter(isEval).select(col("fp")).distinct()
        .withColumn("ex", lit(true))
      p.filter(!isEval).select(col("doc_id"), col("fp"))
        .join(broadcast(evFp), Seq("fp"), "left")
        .select(col("doc_id"), coalesce(col("ex"), lit(false)).as("exact_hit"))
    }
    def ng() = {
      val sh = p.select(col("doc_id"), explode(col("shs")).as("shingle"))
      val evSh = sh.filter(col("doc_id") % 10 === 1)
        .select("shingle").distinct().withColumn("hit", lit(1))
      sh.filter(col("doc_id") % 10 =!= 1)
        .join(broadcast(evSh), Seq("shingle"), "left")
        .groupBy("doc_id")
        .agg(expr("round(sum(coalesce(hit, 0)) * 1.0D / count(1), 4)").as("ngram_frac"))
    }
    def nd() = operators.Dedup.neardupEvalHitsForProf(spark, dir)
      .select(col("doc_id"), col("mj"))
    def time(n: String, f: () => org.apache.spark.sql.DataFrame): Unit = {
      val ds = (0 until rounds).map { _ =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n min=${ds.min}%.2f med=${ds.sorted.apply(rounds / 2)}%.2f")
    }
    time("d2 pin build (ckpt)", () => { d2(); p })
    time("rung1 exact        ", () => ex())
    time("rung2 shingle      ", () => ng())
    time("rung3 neardup (own pin)", () => nd())
    spark.stop()
  }
}
