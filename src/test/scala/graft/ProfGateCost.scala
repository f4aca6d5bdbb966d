package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-gate UNIT-COST measurement for the q281 ordering decision (r12
  * verdict #1): times each stateless gate's decision frame standalone
  * over the full corpus — the flag column forced through an aggregate
  * so Catalyst cannot prune the gate's work — and prints ns/doc.
  * min-of-N over interleaved passes (the BASELINE.md discipline: the
  * q01-style cheapest gate doubles as the host-drift control).
  * Run: `sbt "Test/runMain graft.ProfGateCost [sfDir]"`. */
object ProfGateCost {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import operators.{Corpus12, Corpus13, Corpus14}
    def gates(docs: DataFrame): Seq[(String, () => DataFrame, String)] = Seq(
      ("robots", () => Corpus13.robotsDecisions(docs), "allowed"),
      ("lang_id", () => Corpus14.langGateDecisions(docs), "keep"),
      ("blocklist", () => Corpus14.blocklistDecisions(docs), "keep"),
      ("gopher", () => Corpus12.repetitionBattery(docs), "keep"),
      ("classifier", () => Corpus14.qualityClassify(docs), "clf_keep"))
    def run(f: () => DataFrame, flag: String): Double = {
      val t0 = System.nanoTime()
      // force the flag through an aggregate — count() alone would let
      // Catalyst prune the entire gate computation
      f().agg(sum(when(col(flag), 1L).otherwise(0L))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    // all (dir, gate) cells measured in ONE JVM, rounds interleaved
    // across dirs, so host drift between invocations cannot skew the
    // size-differencing that extracts marginal per-doc cost
    val frames = dirs.map(d => d -> Tables.documents(spark, d)).toMap
    val nDocs = frames.map { case (d, f) => d -> f.count() }
    dirs.foreach(d => gates(frames(d)).foreach { case (_, f, fl) => run(f, fl) })
    val times = collection.mutable.Map[(String, String), List[Double]]()
    (1 to 3).foreach { _ =>
      dirs.foreach { d =>
        gates(frames(d)).foreach { case (n, f, fl) =>
          times((d, n)) = run(f, fl) :: times.getOrElse((d, n), Nil)
        }
      }
    }
    dirs.foreach { d =>
      println(s"GATECOST sf_dir=$d n_docs=${nDocs(d)}")
      gates(frames(d)).foreach { case (n, _, _) =>
        val best = times((d, n)).min
        println(f"GATECOST $n%-10s min=${best}%.3f s  " +
          f"per_doc=${best * 1e9 / nDocs(d)}%.0f ns  all=${times((d, n)).reverse.map(t => f"$t%.3f").mkString(",")}")
      }
    }
    // marginal per-doc cost by size differencing between the first two
    // dirs: (t_big - t_small) / (n_big - n_small) strips the fixed
    // per-query scheduling overhead that dominates cheap gates at 500
    if (dirs.size >= 2) {
      val (small, big) = (dirs(0), dirs(1))
      val dn = nDocs(big) - nDocs(small)
      println(s"GATECOST marginal ns/doc over ($small -> $big), dn=$dn")
      gates(frames(small)).foreach { case (n, _, _) =>
        val m = (times((big, n)).min - times((small, n)).min) * 1e9 / dn
        println(f"GATECOST marginal $n%-10s ${m}%.0f ns/doc")
      }
    }
    spark.stop()
  }
}
