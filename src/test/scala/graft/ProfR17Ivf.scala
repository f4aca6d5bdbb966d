package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r17: q255 centroid-pin A/B — the k×d centroid table is built by a
  * full corpus explode+agg and referenced twice (broadcast(cent) and
  * centNorm's input), so the aggregate runs twice per execution; a
  * centroid-sized localCheckpoint is bounded (k cells × d dims) and
  * scale-honest. Same-JVM interleaved, row-identity assert.
  * Run: `sbt "Test/runMain graft.ProfR17Ivf [sfDir] [rounds]"`. */
object ProfR17Ivf {
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
    import graft.functions.VectorExprs.{vecDot, vecNorm}
    val corpus = Tables.embeddings(spark, dir)
    corpus.count()
    val queryPred = col("vec_id") % 2 === 0
    val (k, nprobe) = (10, 2)
    def body(pinCent: Boolean): DataFrame = {
      val e = corpus.select(col("vec_id"), col("label"), col("embedding"),
        vecNorm(col("embedding")).as("nrm"))
      val dims = e.select(col("vec_id"), col("label"), posexplode(col("embedding")))
        .select(col("vec_id"), col("label"), col("pos"), col("col").cast("double").as("v"))
      val cent0 = dims.groupBy("label", "pos").agg(avg("v").as("cv"))
      val cent = if (pinCent) cent0.localCheckpoint() else cent0
      val centNorm = cent.groupBy("label").agg(sqrt(sum(col("cv") * col("cv"))).as("cn"))
      val q = e.filter(queryPred)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
      val qdims = q.select(col("qid"), col("qn"), posexplode(col("qe")))
        .select(col("qid"), col("qn"), col("pos"), col("col").cast("double").as("qv"))
      val qc = qdims.join(broadcast(cent), "pos")
        .groupBy("qid", "label")
        .agg(sum(col("qv") * col("cv")).as("dot"), max("qn").as("qn"))
        .join(broadcast(centNorm), "label")
        .withColumn("cscore", round(col("dot") / (col("qn") * col("cn")), 6))
      val probeW = Window.partitionBy("qid").orderBy(col("cscore").desc, col("label"))
      val probed = qc.withColumn("pr", row_number().over(probeW))
        .filter(col("pr") <= nprobe)
        .select(col("qid").as("pqid"), col("label"))
      val qcells = q.join(probed, col("qid") === col("pqid")).drop("pqid")
      val scored = e.join(qcells.hint("shuffle_hash"), Seq("label"))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("cos", round(vecDot(col("embedding"), col("qe")) / (col("nrm") * col("qn")), 6))
      val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
        .select(col("qid"), col("vec_id").as("nn"), col("cos"), col("rk").cast("long").as("rk"))
    }
    // NOTE: the topk tail above approximates groupTopK for timing only;
    // row-identity is asserted between the two variants, not vs q255.
    def time(pin: Boolean): Double = {
      val t0 = System.nanoTime()
      body(pin).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(false); time(true)
    val (as, bs) = (Array.fill(rounds)(0.0), Array.fill(rounds)(0.0))
    for (i <- 0 until rounds) { as(i) = time(false); bs(i) = time(true) }
    println(f"MIN nopin=${as.min}%.2f pin=${bs.min}%.2f  MED nopin=${as.sorted.apply(rounds / 2)}%.2f pin=${bs.sorted.apply(rounds / 2)}%.2f")
    val a = body(false).collect().map(_.toString).sorted.toSeq
    val b = body(true).collect().map(_.toString).sorted.toSeq
    assert(a == b, "variant rows differ!")
    println(s"ROWS IDENTICAL n=${a.size}")
    spark.stop()
  }
}
