package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}

/** r16: per-JOB timeline for one query — prints every Spark job's wall
  * duration during DataFrame construction (eager checkpoints) and the
  * final action, so the barrier floor can be attributed job by job.
  * Run: `sbt "Test/runMain graft.ProfR16b [sfDir] [name]"`. */
object ProfR16b {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = if (args.length > 1) args(1) else "q268_hygiene_funnel"
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
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, (System.nanoTime(), js.stageInfos.size))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, nst) = starts.getOrDefault(je.jobId, (0L, -1))
        println(f"JOB ${je.jobId}%3d stages=$nst%2d ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      }
    })
    try {
      Tables.lineitem(spark, dir).count()
      Tables.documents(spark, dir).count()
      operators.Relational.flagship(spark, dir).count()
    } catch { case _: Throwable => () }
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass: construct $name")
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      df.queryExecution.executedPlan
      val t1 = System.nanoTime()
      println(f"--- construct+plan ${(t1 - t0) / 1e9}%.2f s; exec:")
      df.write.format("noop").mode("overwrite").save()
      println(f"--- exec ${(System.nanoTime() - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
