package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r16: same-JVM interleaved A/B/C of q121's BPE-merge forms —
  *  A: current declarative 3-round unroll (bpeMerges),
  *  B: checkpoint-per-round (lineage stays one round deep; still a
  *     1-row broadcast argmax, no driver collect),
  *  C: iterative with 1-row driver collect per round (bpeTrainIterative
  *     shape, the production form for real merge counts).
  * All three produce identical rows (asserted at the end).
  * Run: `sbt "Test/runMain graft.ProfBpeAB [sfDir] [rounds]"`. */
object ProfBpeAB {
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
    import operators.Corpus2
    import operators.TextAnalytics.toksExpr

    val aggOut: DataFrame => DataFrame = finalSyms =>
      finalSyms.groupBy("word")
        .agg(max("freq").as("freq"),
          expr("array_join(transform(array_sort(collect_list(struct(pos, sym))), x -> x.sym), ' ')")
            .as("syms"))

    // B: checkpoint-per-round, broadcast argmax (no collect)
    def bpeMergesCkpt(docs: DataFrame, n: Int): DataFrame = {
      val words = docs.select(explode(expr(toksExpr)).as("word"))
        .groupBy("word").agg(count(lit(1)).as("freq"))
      var s = words.select(col("word"), col("freq"),
        posexplode(expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
          .as(Seq("pos", "sym"))).localCheckpoint()
      var out = Seq.empty[(Int, DataFrame)]
      for (r <- 1 to n) {
        val (s2, b) = Corpus2.bpeRound(s)
        s = s2.localCheckpoint()
        out = out :+ (r -> b.localCheckpoint())
      }
      out.foldLeft(aggOut(s)) { case (df, (r, b)) =>
        df.crossJoin(broadcast(
          b.select(concat(col("b_sym"), lit("+"), col("b_nxt")).as(s"merge$r"))))
      }
    }

    // C: iterative, 1-row collect per round
    def bpeMergesIter(docs: DataFrame, n: Int): DataFrame = {
      val (s, merges) = Corpus2.bpeTrainIterative(docs, n)
      merges.zipWithIndex.foldLeft(aggOut(s)) { case (df, (m, i)) =>
        df.withColumn(s"merge${i + 1}", lit(m))
      }
    }

    try Tables.documents(spark, dir).count() catch { case _: Throwable => () }
    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.orderBy("word").write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val docs = () => Tables.documents(spark, dir)
    var (as, bs, cs) = (List.empty[Double], List.empty[Double], List.empty[Double])
    (1 to rounds).foreach { r =>
      val a = time(Corpus2.bpeMerges(docs(), 3))
      val b = time(bpeMergesCkpt(docs(), 3))
      val c = time(bpeMergesIter(docs(), 3))
      as ::= a; bs ::= b; cs ::= c
      println(f"round $r: unroll=$a%.2f ckpt=$b%.2f iter=$c%.2f")
    }
    println(f"A unroll min=${as.min}%.2f  B ckpt min=${bs.min}%.2f  C iter min=${cs.min}%.2f")
    val va = Corpus2.bpeMerges(docs(), 3).orderBy("word").collect().map(_.toString)
    val vb = bpeMergesCkpt(docs(), 3).orderBy("word").collect().map(_.toString)
    val vc = bpeMergesIter(docs(), 3).orderBy("word").collect().map(_.toString)
    println(s"VALUE-IDENTICAL: B=${va.sameElements(vb)} C=${va.sameElements(vc)} (${va.length} rows)")
    spark.stop()
  }
}
