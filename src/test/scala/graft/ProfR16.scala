package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** r16 optimization profiler (test scope, the ProfFunnel discipline):
  * for each headline query, separate DRIVER planning time (force
  * executedPlan) from execution time (noop sink), and count the Spark
  * jobs each execution submits — distinguishes "deep-plan planning/
  * codegen cost" from "job-barrier floor" from "real compute".
  * Run: `sbt "Test/runMain graft.ProfR16 [sfDir] [names...]"`. */
object ProfR16 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.benchNames
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.experimental.extraOptimizations ++= Seq(graft.plans.LowercaseContainsRewrite)
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    // warmup (mirrors Bench)
    try {
      Tables.lineitem(spark, dir).count()
      Tables.documents(spark, dir).count()
      operators.Relational.flagship(spark, dir).count()
    } catch { case _: Throwable => () }
    println(f"${"query"}%-28s ${"plan1"}%7s ${"exec1"}%7s ${"jobs1"}%5s ${"plan2"}%7s ${"exec2"}%7s ${"jobs2"}%5s")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): (Double, Double, Int) = {
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        df.queryExecution.executedPlan // force analysis+optimization+physical planning
        val t1 = System.nanoTime()
        val j0 = jobs.get()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, jobs.get() - j0)
      }
      val (p1, e1, j1) = once()
      val (p2, e2, j2) = once()
      println(f"$name%-28s $p1%7.2f $e1%7.2f $j1%5d $p2%7.2f $e2%7.2f $j2%5d")
      if (sys.env.contains("PROF_R16_MIN4")) {
        val extra = Seq(once(), once())
        val tot = (Seq((p1, e1, j1), (p2, e2, j2)) ++ extra).map(t => t._1 + t._2)
        println(f"$name%-28s min4=${tot.min}%.2f  runs=${tot.map(t => f"$t%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
