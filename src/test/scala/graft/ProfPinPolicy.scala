package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r12 measurement for the funnel's POST-CAP pin policy (the r11
  * verdict's open judgment call): past the domain cap the funnel pins
  * TEXT-BEARING survivor frames (each feeds 2+ text readers), justified
  * by "survivors bounded by cap × |hosts|" — but at web scale |hosts|
  * is ~10⁸ and cap×|hosts| is itself a large corpus. This harness
  * builds the skewed-host fixture the question needs (many hosts,
  * shallow quotas: cap×|hosts| ≈ 40% of docs — the web's actual shape,
  * vs the funnel's default 24-host fixture where the cap output is 121
  * docs at any SF) and times the post-cap chain (quota → blocklist →
  * Gopher → classifier → chunk scrub → audit + PII) under both layouts:
  *
  *  A. text-bearing pins (current hygieneStages shape past the cap):
  *     each stage localCheckpoints (doc_id, text, n_chars) survivors;
  *  B. narrow pins (the url_dedup/lang rule extended): each stage
  *     localCheckpoints (doc_id, n_chars) only and every text reader
  *     re-attaches text by a column-pruned scan ⋉ pinned ids.
  *
  * Run: `sbt "Test/runMain graft.ProfPinPolicy [sfDir] [replicas] [hosts]"`.
  * Results land in SCALE.md (r12 entry).
  */
object ProfPinPolicy {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(8)
    val nHosts = args.lift(2).map(_.toInt).getOrElse(1600)
    val cap = 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import operators.{Corpus, Corpus12, Corpus14}

    // skewed-host fixture: sfDir documents replicated `replicas`× (fresh
    // doc_ids), hosts spread over nHosts so the cap keeps ~cap·nHosts
    // docs — sized to ≈40% of the corpus at the defaults
    val base = Tables.documents(spark, dir).select("doc_id", "text", "n_chars")
    val docs0 = (0 until replicas).map { k =>
      base.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
        col("text"), col("n_chars"))
    }.reduce(_ unionByName _)
      .withColumn("host", concat(lit("h"), (col("doc_id") % nHosts).cast("string")))
      .localCheckpoint()
    val n0 = docs0.count()
    println(s"FIXTURE docs=$n0 hosts=$nHosts cap=$cap capXhosts=${cap * nHosts} " +
      f"(${cap * nHosts * 100.0 / n0}%.0f%% of corpus if every host saturates)")

    val top = udaf(new graft.functions.TopKScored(cap))
    def quotaIds(hosted: DataFrame): DataFrame =
      hosted.groupBy("host")
        .agg(top(col("n_chars").cast("double"), col("doc_id")).as("kept"))
        .select(explode(col("kept")).as("k")).select(col("k.id").as("doc_id"))
    def chunkKeepIds(withText: DataFrame, minRetained: Double = 0.2): DataFrame = {
      val ch = Corpus.chunkTokens(withText).withColumn("fp", md5(col("chunk")))
      val dd = ch.groupBy("fp").agg(
        countDistinct("doc_id").as("df"),
        min(struct(col("doc_id"), col("chunk_idx"))).as("win"))
      ch.join(dd, Seq("fp"))
        .select(col("doc_id"), col("n_tokens"),
          when(col("df") >= 3, lit(0L))
            .when(col("win") === struct(col("doc_id"), col("chunk_idx")), col("n_tokens"))
            .otherwise(lit(0L)).as("kt"))
        .groupBy("doc_id")
        .agg(round(sum("kt") * lit(1.0) / sum("n_tokens"), 4).as("rf"))
        .filter(col("rf") >= minRetained).select("doc_id")
    }
    def audit(frames: Seq[(String, DataFrame)], piiSrc: DataFrame): Unit = {
      frames.foreach { case (nm, f) =>
        val r = f.agg(count(lit(1)), coalesce(sum("n_chars"), lit(0L))).head()
        println(s"  stage $nm docs=${r.getLong(0)} chars=${r.getLong(1)}")
      }
      val pc = Corpus12.piiScrub(piiSrc)
        .agg(coalesce(sum(length(col("scrubbed"))).cast("long"), lit(0L))).head().getLong(0)
      println(s"  pii chars=$pc")
    }

    // Layout A — text-bearing pins past the cap (current production shape)
    def runA(): Unit = {
      val k2 = quotaIds(docs0.select("doc_id", "n_chars", "host"))
      val s2 = docs0.select("doc_id", "text", "n_chars")
        .join(k2, Seq("doc_id"), "left_semi").localCheckpoint()
      val k25 = Corpus14.blocklistDecisions(s2).filter(col("keep")).select("doc_id")
      val s25 = s2.join(k25, Seq("doc_id"), "left_semi").localCheckpoint()
      val k3 = Corpus12.repetitionBattery(s25).filter(col("keep")).select("doc_id")
      val s3 = s25.join(k3, Seq("doc_id"), "left_semi").localCheckpoint()
      val k35 = Corpus14.qualityClassify(s3).filter(col("clf_keep")).select("doc_id")
      val s35 = s3.join(k35, Seq("doc_id"), "left_semi").localCheckpoint()
      val k4 = chunkKeepIds(s35)
      val s4 = s35.join(k4, Seq("doc_id"), "left_semi").localCheckpoint()
      audit(Seq("quota" -> s2, "blocklist" -> s25, "gopher" -> s3,
        "clf" -> s35, "scrub" -> s4), s4)
    }

    // Layout B — narrow pins past the cap; text re-attached per reader
    def runB(): Unit = {
      val narrow = docs0.select("doc_id", "n_chars")
      val text = docs0.select("doc_id", "text")
      def reattach(k: DataFrame): DataFrame =
        text.join(k.select("doc_id"), Seq("doc_id"), "left_semi")
      val k2 = narrow.join(quotaIds(docs0.select("doc_id", "n_chars", "host")),
        Seq("doc_id"), "left_semi").localCheckpoint()
      val k25 = k2.join(Corpus14.blocklistDecisions(reattach(k2))
        .filter(col("keep")).select("doc_id"), Seq("doc_id"), "left_semi").localCheckpoint()
      val k3 = k25.join(Corpus12.repetitionBattery(reattach(k25))
        .filter(col("keep")).select("doc_id"), Seq("doc_id"), "left_semi").localCheckpoint()
      val k35 = k3.join(Corpus14.qualityClassify(reattach(k3))
        .filter(col("clf_keep")).select("doc_id"), Seq("doc_id"), "left_semi").localCheckpoint()
      val k4 = k35.join(chunkKeepIds(reattach(k35)), Seq("doc_id"), "left_semi")
        .localCheckpoint()
      audit(Seq("quota" -> k2, "blocklist" -> k25, "gopher" -> k3,
        "clf" -> k35, "scrub" -> k4), reattach(k4))
    }

    def time(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"PROF $name%-10s $s%.2f s")
      s
    }
    // alternate order, 2 passes each, report per-pass (min-of-2 offline)
    (1 to 2).foreach { i =>
      println(s"--- pass $i")
      time("layoutA")(runA())
      time("layoutB")(runB())
    }
    spark.stop()
  }
}
