package graft

import org.apache.spark.sql.SparkSession

/** Scratch margin scorer for designing the q276 holdout's BOUNDARY rows
  * (r12 verdict What's-wrong #3): prints the deployed model's margin for
  * candidate holdout texts so rows can be placed INSIDE the
  * (junk_max, quality_min) margin gap, straddling the sweep thresholds.
  * Run: `sbt "Test/runMain graft.ProfHoldout"`. */
object ProfHoldout {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import operators.Corpus14

    // candidates: ~9-10 token draws from the fixture's 31-word vocab
    // with exactly 2 fillers (junk-adjacent quality) or ~20-30% filler
    // (quality-adjacent junk) — the verdict's two boundary families
    val cands: Seq[(String, String)] = Seq(
      // 2 fillers + 7-8 content (candidate "quality" labels)
      ("data query join table stream merge slow small scan", "q2f"),
      ("group column sort key agg order slow big filter", "q2f"),
      ("spark stream batch query data big dup table", "q2f"),
      ("hash join merge sort group small dup window scan", "q2f"),
      ("vector data stream column key small slow order batch", "q2f"),
      ("row value part customer line big dup key stream", "q2f"),
      ("window filter stream batch hash big small scan vector", "q2f"),
      ("table data query join agg dup slow key sort", "q2f"),
      ("scan batch merge spark vector slow dup order column", "q2f"),
      ("query table join data group small big window agg", "q2f"),
      // 3 fillers + 6-7 content (candidate "junk" labels, ~30% filler)
      ("data query join table slow small dup merge scan", "j3f"),
      ("group column sort key slow big dup agg filter", "j3f"),
      ("spark stream batch big small dup query data table", "j3f"),
      ("hash join merge small big slow group window scan", "j3f"),
      ("vector data stream slow small big column key batch", "j3f"),
      ("row value part big dup slow customer line stream", "j3f"),
      ("window filter batch small dup big hash scan vector", "j3f"),
      ("table data query dup slow small join key sort", "j3f"),
      // 2 fillers + stopword pad (pull toward 0 via length)
      ("the data query join table a slow small scan", "q2fs"),
      ("a group column sort key the slow big filter", "q2fs"))
    val df = cands.zipWithIndex
      .map { case ((t, tag), i) => (i.toLong, t, tag) }
      .toDF("doc_id", "text", "tag")
    val m = Corpus14.qualityMargins(df)
      .join(df.select("doc_id", "tag", "text"), Seq("doc_id"))
      .orderBy("doc_id").collect()
    m.foreach(r => println(f"MARGIN ${r.getAs[Double]("clf_margin")}%+.4f  " +
      f"${r.getAs[String]("tag")}%-5s ${r.getAs[String]("text")}"))

    // current holdout extremes for reference
    val hold = Corpus14.qualityHoldout.zipWithIndex
      .map { case ((t, l), i) => (i.toLong, t, l) }.toDF("doc_id", "text", "label")
    val hm = Corpus14.qualityMargins(hold)
      .join(hold.select("doc_id", "label"), Seq("doc_id")).collect()
    val qmin = hm.filter(_.getAs[String]("label") == "quality")
      .map(_.getAs[Double]("clf_margin")).min
    val jmax = hm.filter(_.getAs[String]("label") == "junk")
      .map(_.getAs[Double]("clf_margin")).max
    println(f"HOLDOUT quality_min=$qmin%+.4f junk_max=$jmax%+.4f")
    hm.foreach(r => println(f"HM ${r.getAs[Double]("clf_margin")}%+.6f " +
      r.getAs[String]("label")))
    // holdout NLL over an extended exact-binary T grid, to find the
    // interior argmin the boundary rows create
    val ms = hm.map(r => (r.getAs[Double]("clf_margin"),
      r.getAs[String]("label") == "quality"))
    for (k <- 0 to 12) {
      val t = math.pow(2.0, -k)
      val nll = ms.map { case (m, y) =>
        val p = 1.0 / (1.0 + math.exp(-m / t))
        -math.log(if (y) p else 1.0 - p)
      }.sum / ms.length
      println(f"NLL T=2^-$k%-2d ($t%.8f) = $nll%.4f")
    }
    spark.stop()
  }
}
