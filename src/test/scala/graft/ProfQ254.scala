package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q254 variance attribution harness (r12 verdict What's-wrong #2): the
  * query's five-round official history spans 1.59-2.74 s with no code
  * change and no mechanism on record. Hypotheses measured here:
  *  (a) ImageIO FILE-cache streams — `ImageIO.write` and
  *      `createImageInputStream` default to useCache=true, creating and
  *      deleting a TEMP FILE per encode and per decode (2 × n_docs
  *      filesystem ops per run) — host filesystem pressure would read
  *      as unattributed variance;
  *  (b) reader/writer registry scans — `getImageReaders`/`write`
  *      iterate the JVM-global IIORegistry per call, which local[32]
  *      could feel as contention.
  * Design: encode-only, decode-only, and full-q254 timings, min-of-N,
  * with the file cache toggled per round in the SAME JVM (interleaved,
  * so host drift hits both arms equally). Run at local[32] (default)
  * and local[4] (pass as arg 2) for the contention comparison.
  * Run: `sbt "Test/runMain graft.ProfQ254 [sfDir] [threads]"`. */
object ProfQ254 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threads = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import operators.Multimodal
    val docs = Tables.documents(spark, dir)
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def setCache(on: Boolean): Unit = {
      // JVM-global, but local[*] executors share the JVM so the toggle
      // reaches the mapPartitions workers
      spark.range(spark.sparkContext.defaultParallelism)
        .repartition(spark.sparkContext.defaultParallelism)
        .foreachPartition { _: Iterator[java.lang.Long] =>
          javax.imageio.ImageIO.setUseCache(on) }
      javax.imageio.ImageIO.setUseCache(on)
    }
    def encodeOnly(): Unit =
      Multimodal.toImageTable(docs)
        .agg(sum(length(col("payload")))).collect()
    def full(): Unit =
      SparkEntry.queries("q254_image_decode")(spark, dir)
        .agg(sum("gray_sum"), count(lit(1))).collect()
    // warm both arms
    setCache(true); encodeOnly(); full()
    setCache(false); encodeOnly(); full()
    val res = collection.mutable.Map[String, List[Double]]()
    (1 to 3).foreach { _ =>
      Seq(true, false).foreach { c =>
        setCache(c)
        res(s"encode cache=$c") = t(encodeOnly()) :: res.getOrElse(s"encode cache=$c", Nil)
        res(s"full   cache=$c") = t(full()) :: res.getOrElse(s"full   cache=$c", Nil)
      }
    }
    println(s"PROF254 sf_dir=$dir threads=$threads")
    res.toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(f"PROF254 $k min=${v.min}%.3f s  all=${v.reverse.map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
