package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: string-token vs interned-int64-token verify cost at q137 shape. */
object ProfIntern {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROF $name%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val toks = "filter(split(lower(text), ' '), x -> x <> '')"
    def tStr: DataFrame = Tables.documents(spark, sfDir)
      .select(col("doc_id"), expr(s"array_distinct($toks)").as("w"))
    def tInt: DataFrame = Tables.documents(spark, sfDir)
      .select(col("doc_id"), expr(
        s"array_distinct(transform($toks, u -> CAST(conv(substring(md5(u), 1, 15), 16, 10) AS BIGINT)))").as("w"))
    def sigs(t: DataFrame): DataFrame = tStr // candidates always from string path
    val bandsExpr = "transform(sequence(0, 2), b -> md5(concat(sigs[2*b], '|', sigs[2*b+1])))"
    def cand: DataFrame = {
      val b = tStr.withColumn("sigs", graft.functions.MinHashSigs.minhashSigs(col("w"), 6))
        .select(col("doc_id"), size(col("w")).cast("long").as("n"), posexplode(expr(bandsExpr)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "h")
      b.as("a").join(b.as("b"),
          col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
            (col("a.doc_id") % 10 =!= 1) && (col("b.doc_id") % 10 === 1) &&
            (least(col("a.n"), col("b.n")) >= (lit(0.8) - lit(0.001)) * greatest(col("a.n"), col("b.n"))))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db")).distinct()
    }
    def verify(t: DataFrame): DataFrame = cand
      .join(t.select(col("doc_id").as("da"), col("w").as("wa")), "da")
      .join(t.select(col("doc_id").as("db"), col("w").as("wb")), "db")
      .withColumn("i", size(array_intersect(col("wa"), col("wb"))).cast("long"))
      .select(col("da"), col("db"),
        round(col("i") * lit(1.0) / (size(col("wa")) + size(col("wb")) - col("i")), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
    Tables.documents(spark, sfDir).count()
    time("warm_cand") { cand.write.format("noop").mode("overwrite").save() }
    time("verify_str_1") { verify(tStr).write.format("noop").mode("overwrite").save() }
    time("verify_int_1") { verify(tInt).write.format("noop").mode("overwrite").save() }
    time("verify_str_2") { verify(tStr).write.format("noop").mode("overwrite").save() }
    time("verify_int_2") { verify(tInt).write.format("noop").mode("overwrite").save() }
    println("COUNT str=" + verify(tStr).count() + " int=" + verify(tInt).count())
    spark.stop()
  }
}
