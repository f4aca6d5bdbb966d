package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r17: sub-stage attribution for neardupEvalHits (q137's body, q143's
  * rung 3): pin build vs bucket pairs vs interned verify.
  * Run: `sbt "Test/runMain graft.ProfR17Q137 [sfDir] [rounds]"`. */
object ProfR17Q137 {
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
    val bandsExpr =
      "transform(sequence(0, 2), b -> md5(concat(sigs[2*b], '|', sigs[2*b+1])))"
    def tokenSets() = docs.select(col("doc_id"),
      expr(s"array_distinct(${operators.TextAnalytics.toksExpr})").as("w"))
    def pinBuild() = tokenSets()
      .withColumn("sigs", graft.functions.MinHashSigs.minhashSigs(col("w"), 6))
      .select(col("doc_id"), size(col("w")).cast("long").as("n"), col("sigs"),
        graft.functions.InternTokens.internTokens(col("w")).as("iw"))
    val t = pinBuild().localCheckpoint()
    def bands() = t.select(col("doc_id"), col("n"), posexplode(expr(bandsExpr)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "h")
    def pairs() = {
      val b = bands()
      val sizeOk = least(col("a.n"), col("b.n")) >=
        (lit(0.8) - lit(0.001)) * greatest(col("a.n"), col("b.n"))
      b.as("a").join(b.as("b"),
          col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
            (col("a.doc_id") % 10 =!= 1) && (col("b.doc_id") % 10 === 1) && sizeOk)
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .distinct()
    }
    def verify() = pairs()
      .join(t.select(col("doc_id").as("da"), col("iw").as("wa")), "da")
      .join(t.select(col("doc_id").as("db"), col("iw").as("wb")), "db")
      .withColumn("i", graft.functions.SortedLongIntersectCount
        .sortedIntersectCount(col("wa"), col("wb")))
      .select(col("da"), col("db"),
        round(col("i") * lit(1.0) /
          (size(col("wa")) + size(col("wb")) - col("i")), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .groupBy("da")
      .agg(count(lit(1)).as("n_eval_matches"), max("jaccard").as("mj"))
    def time(n: String, f: () => org.apache.spark.sql.DataFrame): Unit = {
      val ds = (0 until rounds).map { _ =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n min=${ds.min}%.2f med=${ds.sorted.apply(rounds / 2)}%.2f")
    }
    def timePin(): Unit = {
      val ds = (0 until rounds).map { _ =>
        val t0 = System.nanoTime()
        pinBuild().localCheckpoint()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"pin build (ckpt)   min=${ds.min}%.2f med=${ds.sorted.apply(rounds / 2)}%.2f")
    }
    // variant: long-valued band hash (xxhash64 over the same two sig
    // strings + band index) — bucket equality unchanged for equal
    // sig-pairs; the join/distinct key shrinks from (int, 32-char
    // string) to (int, long).
    val bandsLongExpr =
      "transform(sequence(0, 2), b -> xxhash64(b, sigs[2*b], sigs[2*b+1]))"
    def bandsL() = t.select(col("doc_id"), col("n"), posexplode(expr(bandsLongExpr)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "h")
    def pairsL() = {
      val b = bandsL()
      val sizeOk = least(col("a.n"), col("b.n")) >=
        (lit(0.8) - lit(0.001)) * greatest(col("a.n"), col("b.n"))
      b.as("a").join(b.as("b"),
          col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
            (col("a.doc_id") % 10 =!= 1) && (col("b.doc_id") % 10 === 1) && sizeOk)
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .distinct()
    }
    def verifyOf(p: () => org.apache.spark.sql.DataFrame) = () => p()
      .join(t.select(col("doc_id").as("da"), col("iw").as("wa")), "da")
      .join(t.select(col("doc_id").as("db"), col("iw").as("wb")), "db")
      .withColumn("i", graft.functions.SortedLongIntersectCount
        .sortedIntersectCount(col("wa"), col("wb")))
      .select(col("da"), col("db"),
        round(col("i") * lit(1.0) /
          (size(col("wa")) + size(col("wb")) - col("i")), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .groupBy("da")
      .agg(count(lit(1)).as("n_eval_matches"), max("jaccard").as("mj"))
    timePin()
    time("bands explode      ", () => bands())
    time("bucket pairs md5   ", () => pairs())
    time("bucket pairs long  ", () => pairsL())
    time("verify md5 (full)  ", () => verify())
    time("verify long (full) ", verifyOf(() => pairsL()))
    // raw (pre-distinct) collision volume
    val b0 = bands()
    val sizeOk0 = least(col("a.n"), col("b.n")) >=
      (lit(0.8) - lit(0.001)) * greatest(col("a.n"), col("b.n"))
    val raw = b0.as("a").join(b0.as("b"),
      col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
        (col("a.doc_id") % 10 =!= 1) && (col("b.doc_id") % 10 === 1) && sizeOk0).count()
    println("raw collisions=" + raw + " pairs md5 n=" + pairs().count() +
      " pairs long n=" + pairsL().count() +
      " verified md5 n=" + verify().count() +
      " verified long n=" + verifyOf(() => pairsL())().count())
    println("=== pairs() plan ===")
    pairs().explain("formatted")
    spark.stop()
  }
}
