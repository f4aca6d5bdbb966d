package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main (TEST scope — never ships): splits q121's wall time
  * into Catalyst analysis/optimization/physical-planning vs execution,
  * for the BENCH_r08 +41% investigation. Run:
  *   sbt "Test/runMain graft.ProfQ121 /root/testdata/sf0.1"
  */
object ProfQ121 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.experimental.extraOptimizations ++= Seq(graft.plans.LowercaseContainsRewrite)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries("q121_bpe_merges")(spark, dir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // forces analysis→optimization→planning
      val t2 = System.nanoTime()
      val n = df.count()
      val t3 = System.nanoTime()
      println(f"PROF run=$i build=${(t1 - t0) / 1e9}%.2f plan=${(t2 - t1) / 1e9}%.2f exec=${(t3 - t2) / 1e9}%.2f rows=$n")
    }
    spark.stop()
  }
}
