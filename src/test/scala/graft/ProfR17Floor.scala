package graft

import org.apache.spark.sql.SparkSession

/** r17: same-JVM per-query A/B of the Tables.parallelFloor scan
  * repartition (on vs off via the graft.parallel.floor sysprop, read at
  * DataFrame construction). Alternating minima — this host's window
  * swings 2-3×/min, so only same-JVM interleaved numbers compare.
  * Run: `sbt "Test/runMain graft.ProfR17Floor [sfDir] [rounds] [names...]"`. */
object ProfR17Floor {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 4
    val names = if (args.length > 2) args.drop(2).toSeq else SparkEntry.benchNames
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
    try {
      Tables.lineitem(spark, dir).count()
      Tables.documents(spark, dir).count()
      operators.Relational.flagship(spark, dir).count()
    } catch { case _: Throwable => () }
    def once(name: String, on: Boolean): Double = {
      sys.props("graft.parallel.floor") = if (on) "on" else "off"
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val rows = names.map { n =>
      once(n, on = true); once(n, on = false) // warm, untimed
      val ons = Array.fill(rounds)(0.0)
      val offs = Array.fill(rounds)(0.0)
      for (i <- 0 until rounds) { ons(i) = once(n, true); offs(i) = once(n, false) }
      val (mOn, mOff) = (ons.min, offs.min)
      println(f"$n%-30s on=$mOn%6.2f off=$mOff%6.2f  ${if (mOn < mOff) "ON WINS" else "off wins"}  (${mOff / mOn}%4.2fx)")
      (n, mOn, mOff)
    }
    val (tOn, tOff) = (rows.map(_._2).sum, rows.map(_._3).sum)
    println(f"TOTAL on=$tOn%.2f off=$tOff%.2f (${tOff / tOn}%4.2fx)")
    spark.stop()
  }
}
