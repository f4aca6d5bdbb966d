package graft

import graft.streaming.{StatefulOps, StreamingTwin}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

class StatefulStreamingSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def stagedEventStream() = StreamingTwin.eventStream(spark, sfDir)

  test("stream-stream interval join equals the batch range join") {
    val clicks = stagedEventStream().filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id".as("cu"), $"ts".as("cts"))
      .withWatermark("cts", "10 minutes")
    val purchases = stagedEventStream().filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("pu"), $"ts".as("pts"))
      .withWatermark("pts", "10 minutes")
    val q = clicks.join(purchases,
        expr("cu = pu AND pts > cts AND pts <= cts + interval 5 minutes"))
      .select("click_id", "purchase_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("ss_join").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val stream = spark.table("ss_join")
    val e = Tables.events(spark, sfDir)
    val batch = e.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id".as("cu"), $"ts".as("cts"))
      .join(e.filter($"event_type" === "purchase")
        .select($"event_id".as("purchase_id"), $"user_id".as("pu"), $"ts".as("pts")),
        expr("cu = pu AND pts > cts AND pts <= cts + interval 5 minutes"))
      .select("click_id", "purchase_id")
    assert(stream.count() > 0)
    assert(batch.exceptAll(stream).count() == 0)
    assert(stream.exceptAll(batch).count() == 0)
  }

  test("flatMapGroupsWithState running stats converge to the batch aggregate") {
    val evs = stagedEventStream()
      .select($"event_id", $"user_id", $"event_type", $"value")
      .as[StatefulOps.Ev]
    val q = StatefulOps.runningStats(evs).writeStream
      .outputMode("update").format("memory").queryName("stateful_stats")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // last update per user = final running total
    val fin = spark.table("stateful_stats")
      .groupBy("user_id").agg(max("n_events").as("n_events"))
    val batch = StatefulOps.runningStatsBatch(spark, sfDir)
      .select($"user_id", $"n_events")
    assert(fin.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(fin).count() == 0)
  }

  test("stateful budget admission equals the batch q115 prefix") {
    val docs = StreamingTwin.docStream(spark, sfDir)
      .select($"doc_id", $"source", $"n_chars",
        expr(s"CAST(size(${operators.TextAnalytics.toksExpr}) AS BIGINT)").as("n_toks"))
      .as[StatefulOps.DocTok]
    val q = StatefulOps.budgetAdmission(docs, 600L).writeStream
      .outputMode("append").format("memory").queryName("budget_admission")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val stream = spark.table("budget_admission")
      .select("doc_id", "source", "n_toks", "src_run")
    val batch = SparkEntry.queries("q115_group_budget")(spark, sfDir)
      .select("doc_id", "source", "n_toks", "src_run")
    assert(stream.count() > 0)
    assert(batch.exceptAll(stream).count() == 0)
    assert(stream.exceptAll(batch).count() == 0)
  }

  test("incremental shard manifest over multi-batch replay settles to the batch manifest") {
    // stage the corpus as 4 parquet files, replay 1 file per micro-batch
    // in whatever order the source picks — the manifest must not care
    val stage = java.nio.file.Files.createTempDirectory("graft_manifest_stage")
    val hExpr = "CAST(conv(substr(md5(text), 1, 15), 16, 10) AS BIGINT)"
    val prepared = Tables.documents(spark, sfDir)
      .select($"doc_id",
        expr(s"CAST(size(${operators.TextAnalytics.toksExpr}) AS BIGINT)").as("n_toks"),
        expr(hExpr).as("h"),
        ($"doc_id" % 8).as("shard"))
    prepared.repartition(4).write.mode("overwrite").parquet(stage.toString)
    val docs = spark.readStream
      .schema(prepared.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stage.toString)
      .as[StatefulOps.DocShard]
    val q = StatefulOps.manifestStream(docs).writeStream
      .outputMode("update").format("memory").queryName("manifest_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val updates = spark.table("manifest_stream").collect()
    // the replay really was incremental: shards were updated more than once
    assert(updates.length > 8, s"only ${updates.length} updates — not multi-batch")
    // final state per shard = the update with the largest n_docs (the
    // count is strictly increasing across a shard's emitted updates)
    val fin = spark.table("manifest_stream")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("shard")
          .orderBy($"n_docs".desc)))
      .filter($"rn" === 1).drop("rn")
    val batch = prepared.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("total_toks"),
        expr("bit_xor(h)").as("checksum"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
    assert(fin.count() == 8 && batch.count() == 8)
    assert(fin.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(fin).count() == 0)
  }

  test("streaming count-min sketch over multi-batch replay settles to q145's batch sketch") {
    // stage the token cells as 4 parquet files, replay 1 per micro-batch;
    // cell counts are sum-monoids so arrival order must not matter
    val stage = java.nio.file.Files.createTempDirectory("graft_cm_stage")
    val tok = Tables.documents(spark, sfDir)
      .select(explode(expr(operators.TextAnalytics.toksExpr)).as("term"))
    val prepared = tok.select(posexplode(array(
        (0 until operators.Corpus3.CM_DEPTH).map(j =>
          expr(operators.Corpus3.cmBucketSpark(j, operators.Corpus3.CM_NARROW))): _*))
        .as(Seq("row_j", "bucket")))
      .select($"row_j".cast("int").as("row_j"), $"bucket")
    prepared.repartition(4).write.mode("overwrite").parquet(stage.toString)
    val cells = spark.readStream
      .schema(prepared.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stage.toString)
      .as[StatefulOps.CmCell]
    val q = StatefulOps.countMinStream(cells).writeStream
      .outputMode("update").format("memory").queryName("cm_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val updates = spark.table("cm_stream").collect()
    assert(updates.length > 64, s"only ${updates.length} updates — not multi-batch")
    // final state per cell = the largest emitted count (strictly increasing)
    val fin = spark.table("cm_stream").groupBy("row_j", "bucket")
      .agg(max("cnt").as("cnt"))
    val batch = prepared.groupBy("row_j", "bucket").agg(count(lit(1)).as("cnt"))
    assert(fin.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(fin).count() == 0)
    // the state store is hard-capped at depth×width cells
    assert(fin.count() <= operators.Corpus3.CM_DEPTH * operators.Corpus3.CM_NARROW)
  }

  test("streaming occupancy bitmap emits each slot once and settles to q148's m=256 occupancy") {
    val stage = java.nio.file.Files.createTempDirectory("graft_lc_stage")
    val prepared = Tables.events(spark, sfDir)
      .select(expr("CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % 256")
        .as("slot"))
    prepared.repartition(4).write.mode("overwrite").parquet(stage.toString)
    val slots = spark.readStream
      .schema(prepared.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stage.toString)
      .as[StatefulOps.Slot]
    val q = StatefulOps.occupancyStream(slots).writeStream
      .outputMode("append").format("memory").queryName("occupancy_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val emitted = spark.table("occupancy_stream").as[Long].collect()
    // each slot exactly once — the emitted count IS the occupancy
    assert(emitted.length == emitted.distinct.length)
    val batchOccupied = prepared.distinct().as[Long].collect().toSet
    assert(emitted.toSet == batchOccupied)
    // and it matches the occupancy q148 publishes for (user_id, m=256)
    val q148 = SparkEntry.queries("q148_linear_counting")(spark, sfDir)
      .filter($"col_name" === "user_id" && $"m" === 256L)
      .select("occupied").as[Long].head()
    assert(emitted.length.toLong == q148)
  }

  test("streaming KMV sketch settles to q153's published estimate across micro-batches") {
    // sf0.01: 150 distinct users > k=64 — the estimator regime
    val dir = "/root/testdata/sf0.01"
    val stage = java.nio.file.Files.createTempDirectory("graft_kmv_stage")
    val prepared = Tables.events(spark, dir)
      .select(lit("all").as("scope"),
        expr("CAST(conv(substr(md5(concat('u#', CAST(user_id AS STRING))), 1, 15), 16, 10) AS BIGINT) + 1")
          .as("h"))
    prepared.repartition(4).write.mode("overwrite").parquet(stage.toString)
    val hashes = spark.readStream
      .schema(prepared.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stage.toString)
      .as[StatefulOps.KmvHash]
    val k = operators.Corpus4.KMV_K
    val q = StatefulOps.kmvStream(hashes, k).writeStream
      .outputMode("update").format("memory").queryName("kmv_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("kmv_stream")
      .select("n_seen", "n_kept", "est")
      .as[(Long, Int, Double)].collect()
    assert(rows.length > 1, "single micro-batch — merge path untested")
    // the n_seen high-water row is the final sketch
    val fin = rows.maxBy(_._1)
    assert(fin._1 == prepared.count(), "stream did not absorb every row")
    assert(fin._2 == k, "sketch not full in the estimator regime")
    // settles to the batch query's published estimate for the same scope
    val q153 = SparkEntry.queries("q153_kmv_distinct_sketch")(spark, dir)
      .filter($"scope" === "all").select("est_ndv").as[Double].head()
    assert(math.abs(math.round(fin._3 * 10) / 10.0 - q153) < 1e-9,
      s"stream est ${fin._3} vs batch $q153")
    // state is capped at k longs no matter the stream length
    assert(rows.forall(_._2 <= k))
  }

  test("streaming HLL registers settle to q168's published estimate across micro-batches") {
    val dir = "/root/testdata/sf0.01"
    val stage = java.nio.file.Files.createTempDirectory("graft_hll_stage")
    val prepared = Tables.events(spark, dir)
      .select(lit("all").as("scope"),
        expr("CAST(conv(substr(md5(concat('u#', CAST(user_id AS STRING))), 1, 15), 16, 10) AS BIGINT) + 1")
          .as("h"))
    prepared.repartition(4).write.mode("overwrite").parquet(stage.toString)
    val hashes = spark.readStream
      .schema(prepared.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stage.toString)
      .as[StatefulOps.KmvHash]
    val q = StatefulOps.hllStream(hashes).writeStream
      .outputMode("update").format("memory").queryName("hll_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("hll_stream")
      .select("n_seen", "n_occupied", "est")
      .as[(Long, Int, Double)].collect()
    assert(rows.length > 1, "single micro-batch — merge path untested")
    val fin = rows.maxBy(_._1)
    assert(fin._1 == prepared.count(), "stream did not absorb every row")
    // MAX-monoid registers ⇒ the final estimate IS the batch estimate
    val q168 = SparkEntry.queries("q168_hll_distinct")(spark, dir)
      .filter($"scope" === "all").select("est_ndv").as[Double].head()
    assert(math.abs(math.round(fin._3 * 10) / 10.0 - q168) < 1e-9,
      s"stream est ${fin._3} vs batch $q168")
    // occupancy only grows, never exceeds m
    assert(rows.sortBy(_._1).map(_._2).toSeq.sliding(2).forall {
      case Seq(a, b) => a <= b
      case _         => true
    })
    assert(rows.forall(_._2 <= 256))
  }

  test("streaming decayed-volume state settles to q175's published numbers under shuffled arrival") {
    val dir = "/root/testdata/sf0.01"
    val stage = java.nio.file.Files.createTempDirectory("graft_decay_stage")
    val daily = Tables.events(spark, dir)
      .select($"event_type".as("etype"), expr("CAST(ts AS DATE)").as("d"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy("etype", "d").agg(sum("c").as("vol_c"))
    // shuffled day order across 4 files — the order-independence claim
    daily.orderBy(md5(concat($"etype", $"d".cast("string")))).repartition(4)
      .write.mode("overwrite").parquet(stage.toString)
    val stream = spark.readStream.schema(daily.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage.toString)
      .as[StatefulOps.DayVol]
    val q = StatefulOps.decayedStream(stream).writeStream
      .outputMode("update").format("memory").queryName("decay_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val fin = spark.table("decay_stream")
      .select("etype", "total_c", "decayed_c")
      .as[(String, Long, Double)].collect()
      .groupBy(_._1).map { case (k, rs) => k -> rs.maxBy(_._2) } // total_c is the high-water mark
    val batch = SparkEntry.queries("q175_decayed_volume")(spark, dir)
      .select($"etype".as[String], $"total".as[Double], $"decayed".as[Double]).collect()
    assert(batch.nonEmpty)
    batch.foreach { case (etype, total, decayed) =>
      val (_, tc, dc) = fin(etype)
      assert(math.rint(tc / 100.0 * 1e4) / 1e4 == total, s"$etype total")
      // batch publishes round(·, 4): allow the rounding half-width plus
      // the arrival-order float ulps the scaladoc scopes
      assert(math.abs(dc / 100.0 - decayed) < 6e-5,
        s"$etype decayed stream ${dc / 100.0} vs batch $decayed")
    }
  }

  test("streaming moment sketch settles EXACTLY to q184's published statistics") {
    val dir = "/root/testdata/sf0.01"
    val stage = java.nio.file.Files.createTempDirectory("graft_mom_stage")
    val cents = Tables.events(spark, dir)
      .select($"event_type".as("etype"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
    // shuffled arrival across 4 files — the monoid claim is exact, so
    // the final rows must match the batch query bit-for-bit.
    cents.orderBy(md5(concat($"etype", $"c".cast("string")))).repartition(4)
      .write.mode("overwrite").parquet(stage.toString)
    val stream = spark.readStream.schema(cents.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage.toString)
      .as[StatefulOps.EvCents]
    val q = StatefulOps.momentsStream(stream).writeStream
      .outputMode("update").format("memory").queryName("mom_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val fin = spark.table("mom_stream")
      .select("etype", "n", "mean_val", "sd_val", "skewness", "ex_kurtosis")
      .as[(String, Long, Double, Double, Double, Double)].collect()
      .groupBy(_._1).map { case (k, rs) => k -> rs.maxBy(_._2) } // n is the high-water mark
    val batch = SparkEntry.queries("q184_moments_profile")(spark, dir)
      .as[(String, Long, Double, Double, Double, Double)].collect()
    assert(batch.nonEmpty && fin.size == batch.length)
    assert(spark.table("mom_stream").count() > batch.length,
      "single micro-batch — the state-merge path was never exercised")
    batch.foreach { case (et, n, mean, sd, skew, kurt) =>
      assert(fin(et) == ((et, n, mean, sd, skew, kurt)), s"$et: ${fin(et)}")
    }
  }

  test("streaming burst state settles BIT-FOR-BIT to q194 under shuffled arrival") {
    val dir = "/root/testdata/sf0.01"
    val stage = java.nio.file.Files.createTempDirectory("graft_burst_stage")
    val evs = Tables.events(spark, dir)
      .select($"user_id", expr("unix_micros(ts)").as("us"))
    // shuffled arrival across 4 files: a late event must retroactively
    // raise earlier events' windows — only the multiset state is exact.
    evs.orderBy(md5(concat($"user_id", $"us".cast("string")))).repartition(4)
      .write.mode("overwrite").parquet(stage.toString)
    val stream = spark.readStream.schema(evs.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage.toString)
      .as[StatefulOps.UserEvt]
    val q = StatefulOps.burstStream(stream).writeStream
      .outputMode("update").format("memory").queryName("burst_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val fin = spark.table("burst_stream")
      .select("user_id", "n_events", "peak_24h", "n_bursty", "first_burst_day")
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).map { case (k, rs) => k -> rs.maxBy(_._2) }
    assert(spark.table("burst_stream").count() > fin.size,
      "single micro-batch — the state-merge path was never exercised")
    val batch = SparkEntry.queries("q194_burst_rate_audit")(spark, dir)
      .select($"user_id".as[Long], $"n_events".as[Long], $"peak_24h".as[Long],
        $"n_bursty".as[Long], $"first_burst_day".cast("string").as[String]).collect()
    assert(batch.nonEmpty)
    batch.foreach { case (u, n, peak, nb, fd) =>
      assert(fin(u) == ((u, n, peak, nb, fd)), s"user $u: ${fin(u)}")
    }
    // users below the batch threshold must be below it in the stream too
    val flagged = batch.map(_._1).toSet
    fin.values.filterNot(r => flagged(r._1)).foreach(r =>
      assert(r._3 < 5L && r._4 == 0L && r._5 == null))
  }

  test("streaming clamped balance settles to q204 under day-ordered log delivery") {
    val dir = "/root/testdata/sf0.01"
    val stage = java.nio.file.Files.createTempDirectory("graft_bal_stage")
    val deltas = Tables.events(spark, dir)
      .select($"user_id", to_date($"ts").as("d"),
        when($"event_type" === "signup", 20L).when($"event_type" === "purchase", -5L)
          .when($"event_type" === "error", -2L).otherwise(-1L).as("w"))
      .groupBy("user_id", "d").agg(sum($"w").as("dv"))
    // day-RANGED appends with distinct modification times: the clamp is
    // order-sensitive, so the stream must see each key's deltas in day
    // order across triggers — the partitioned-log contract. The file
    // source replays oldest-modtime-first, so stage four week chunks
    // sequentially (sleep makes the modtimes strictly increase).
    val allDays = deltas.select($"d".cast("string").as[String]).distinct()
      .collect().sorted
    allDays.grouped((allDays.length + 3) / 4).zipWithIndex.foreach { case (chunk, i) =>
      if (i > 0) Thread.sleep(1100)
      deltas.filter($"d".cast("string").isin(chunk: _*))
        .coalesce(1).write.mode("append").parquet(stage.toString)
    }
    val stream = spark.readStream.schema(deltas.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage.toString)
      .as[StatefulOps.DayDelta]
    val q = StatefulOps.clampedBalanceStream(stream).writeStream
      .outputMode("update").format("memory").queryName("bal_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val fin = spark.table("bal_stream")
      .select("user_id", "n_days", "delta_sum", "final_bal")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (k, rs) => k -> rs.maxBy(_._2) }
    assert(spark.table("bal_stream").count() > fin.size,
      "single micro-batch — the cross-trigger fold path was never exercised")
    val batch = SparkEntry.queries("q204_clamped_balance")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(batch.nonEmpty && fin.size == batch.length)
    batch.foreach { case (u, nd, net, bal) =>
      assert(fin(u) == ((u, nd, net, bal)), s"user $u: ${fin(u)}")
    }
  }

  test("streaming runs segments assemble to q236's runs count under shuffled arrival") {
    val dir = "/root/testdata/sf0.01"
    val stage = java.nio.file.Files.createTempDirectory("graft_runs_stage")
    val docs = Tables.documents(spark, dir)
      .selectExpr("doc_id div 50 AS b", "doc_id",
        "CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS INT) AS x")
    // shuffled arrival across 4 files: a doc landing between two
    // previously-adjacent docs rewrites the transition it sat on.
    docs.orderBy(md5($"doc_id".cast("string"))).repartition(4)
      .write.mode("overwrite").parquet(stage.toString)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage.toString)
      .as[StatefulOps.DocBit]
    val q = StatefulOps.runsStream(stream).writeStream
      .outputMode("update").format("memory").queryName("runs_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val segs = spark.table("runs_stream")
      .as[(Long, Long, Int, Int, Long)].collect()
      .groupBy(_._1).map { case (b, rs) => rs.maxBy(_._2) }
      .toSeq.sortBy(_._1)
    assert(spark.table("runs_stream").count() > segs.size,
      "single micro-batch — the state-merge path was never exercised")
    // monoid assembly across buckets in order
    val runs = 1 + segs.map(_._5).sum +
      segs.sliding(2).count(p => p.length == 2 && p(0)._4 != p(1)._3)
    val Array((n, n1, _, batchRuns, _, _)) =
      SparkEntry.queries("q236_runs_test")(spark, dir)
        .as[(Long, Long, Long, Long, Double, Double)].collect()
    assert(runs == batchRuns)
    assert(segs.map(_._2).sum == n)
  }

  private def chunkDecisionRetention(table: String) =
    spark.table(table)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when($"kept", 1L).otherwise(0L)).as("n_kept"),
        sum("n_tokens").as("total_tokens"),
        sum(when($"kept", $"n_tokens").otherwise(0L)).as("kept_tokens"))
      .withColumn("retained_frac",
        round($"kept_tokens" * lit(1.0) / $"total_tokens", 4))
      .select("doc_id", "n_chunks", "n_kept", "total_tokens",
        "kept_tokens", "retained_frac")

  private def stagedChunks(dir: String, stage: java.nio.file.Path,
      nFiles: Int): (org.apache.spark.sql.DataFrame, Long => Int) = {
    // doc-ranged files staged in doc_id order (modtime-ordered replay),
    // so cross-batch first-arrival matches q259's (doc_id, chunk_idx) min
    val prepared = operators.Corpus.chunkTokens(Tables.documents(spark, dir))
      .withColumn("fp", md5($"chunk"))
      .select("doc_id", "chunk_idx", "n_tokens", "fp")
    val ids = prepared.select($"doc_id").distinct()
      .as[Long].collect().sorted
    val groups = ids.grouped((ids.length + nFiles - 1) / nFiles).toSeq
    groups.zipWithIndex.foreach { case (chunk, i) =>
      if (i > 0) Thread.sleep(1100)
      prepared.filter($"doc_id".isin(chunk: _*))
        .coalesce(1).write.mode("append").parquet(stage.toString)
    }
    val fileOf = groups.zipWithIndex
      .flatMap { case (g, i) => g.map(_ -> i) }.toMap
    (prepared, fileOf)
  }

  test("streaming chunk dedup over one replay batch equals q259's retention table") {
    val dir = "/root/testdata/sf0.01"
    val stage = java.nio.file.Files.createTempDirectory("graft_chunk_stage1")
    val (prepared, _) = stagedChunks(dir, stage, 1)
    val q = StatefulOps.chunkDedupStream(
        spark.readStream.schema(prepared.schema).parquet(stage.toString)
          .as[StatefulOps.ChunkIn]).writeStream
      .outputMode("append").format("memory").queryName("chunk_dedup1")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val fin = chunkDecisionRetention("chunk_dedup1")
    val batch = SparkEntry.queries("q259_chunk_dedup")(spark, dir)
    assert(fin.count() > 0)
    assert(batch.exceptAll(fin).count() == 0)
    assert(fin.exceptAll(batch).count() == 0)
  }

  test("streaming chunk dedup carries first-owner state across micro-batches") {
    val dir = "/root/testdata/sf0.01"
    val stage = java.nio.file.Files.createTempDirectory("graft_chunk_stage3")
    val (prepared, fileOf) = stagedChunks(dir, stage, 3)
    val q = StatefulOps.chunkDedupStream(
        spark.readStream.schema(prepared.schema)
          .option("maxFilesPerTrigger", 1).parquet(stage.toString)
          .as[StatefulOps.ChunkIn]).writeStream
      .outputMode("append").format("memory").queryName("chunk_dedup3")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // a cross-batch duplicate really exercised state: some chunk whose
    // owner arrived in an earlier file was rejected in a later one
    val crossFile = prepared.groupBy("fp")
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .as[(String, Long, Long)].collect()
      .count { case (_, lo, hi) => fileOf(lo) != fileOf(hi) }
    assert(crossFile > 0,
      "fixture has no cross-file duplicate chunks — multi-batch path untested")
    val fin = chunkDecisionRetention("chunk_dedup3")
    val batch = SparkEntry.queries("q259_chunk_dedup")(spark, dir)
    assert(batch.exceptAll(fin).count() == 0)
    assert(fin.exceptAll(batch).count() == 0)
  }

  private def stagedUrls(dir: String, stage: java.nio.file.Path,
      nFiles: Int): (org.apache.spark.sql.DataFrame, Long => Int) = {
    // doc-ranged files staged in doc_id order, as stagedChunks: the
    // cross-batch first-arrival then matches q266's min(doc_id) winner
    val prepared = operators.Corpus12.canonUrls(Tables.documents(spark, dir))
      .select("doc_id", "canon_url")
    val ids = prepared.select($"doc_id").distinct().as[Long].collect().sorted
    val groups = ids.grouped((ids.length + nFiles - 1) / nFiles).toSeq
    groups.zipWithIndex.foreach { case (chunk, i) =>
      if (i > 0) Thread.sleep(1100)
      prepared.filter($"doc_id".isin(chunk: _*))
        .coalesce(1).write.mode("append").parquet(stage.toString)
    }
    val fileOf = groups.zipWithIndex
      .flatMap { case (g, i) => g.map(_ -> i) }.toMap
    (prepared, fileOf)
  }

  test("streaming url dedup over one replay batch equals q266's kept column") {
    val dir = "/root/testdata/sf0.01"
    val stage = java.nio.file.Files.createTempDirectory("graft_url_stage1")
    val (prepared, _) = stagedUrls(dir, stage, 1)
    val q = StatefulOps.urlDedupStream(
        spark.readStream.schema(prepared.schema).parquet(stage.toString)
          .as[StatefulOps.UrlIn]).writeStream
      .outputMode("append").format("memory").queryName("url_dedup1")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val fin = spark.table("url_dedup1").select("doc_id", "canon_url", "kept")
    val batch = SparkEntry.queries("q266_url_dedup")(spark, dir)
      .select("doc_id", "canon_url", "kept")
    assert(fin.count() > 0)
    assert(batch.exceptAll(fin).count() == 0)
    assert(fin.exceptAll(batch).count() == 0)
  }

  test("streaming url dedup carries first-owner state across micro-batches") {
    val dir = "/root/testdata/sf0.01"
    val stage = java.nio.file.Files.createTempDirectory("graft_url_stage3")
    val (prepared, fileOf) = stagedUrls(dir, stage, 3)
    val q = StatefulOps.urlDedupStream(
        spark.readStream.schema(prepared.schema)
          .option("maxFilesPerTrigger", 1).parquet(stage.toString)
          .as[StatefulOps.UrlIn]).writeStream
      .outputMode("append").format("memory").queryName("url_dedup3")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // a cross-file duplicate URL really exercised state
    val crossFile = prepared.groupBy("canon_url")
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .as[(String, Long, Long)].collect()
      .count { case (_, lo, hi) => fileOf(lo) != fileOf(hi) }
    assert(crossFile > 0,
      "fixture has no cross-file duplicate URLs — multi-batch path untested")
    val fin = spark.table("url_dedup3").select("doc_id", "canon_url", "kept")
    val batch = SparkEntry.queries("q266_url_dedup")(spark, dir)
      .select("doc_id", "canon_url", "kept")
    assert(batch.exceptAll(fin).count() == 0)
    assert(fin.exceptAll(batch).count() == 0)
  }

  test("streaming domain quota over one score-ordered batch equals q265's selection") {
    val dir = "/root/testdata/sf0.01"
    val stage = java.nio.file.Files.createTempDirectory("graft_quota_stage1")
    val prepared = operators.Corpus12.hostedDocs(Tables.documents(spark, dir))
    prepared.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val q = StatefulOps.domainQuotaStream(
        spark.readStream.schema(prepared.schema).parquet(stage.toString)
          .as[StatefulOps.QuotaIn]).writeStream
      .outputMode("append").format("memory").queryName("quota1")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // one batch = the whole corpus, intra-batch order is q265's
    // (n_chars DESC, doc_id) — so admit-first-cap IS the batch top-cap
    val fin = spark.table("quota1")
      .join(prepared, Seq("doc_id", "host"))
      .groupBy("host")
      .agg(sum(when($"admitted", 1L).otherwise(0L)).as("n_kept"),
        sum(when($"admitted", $"n_chars").otherwise(0L)).as("kept_chars"))
    val batch = SparkEntry.queries("q265_domain_quota")(spark, dir)
      .select("host", "n_kept", "kept_chars")
    assert(fin.count() > 0)
    assert(batch.exceptAll(fin).count() == 0)
    assert(fin.exceptAll(batch).count() == 0)
  }

  test("streaming domain quota enforces the budget across micro-batches in arrival order") {
    val dir = "/root/testdata/sf0.01"
    val stage = java.nio.file.Files.createTempDirectory("graft_quota_stage3")
    val prepared = operators.Corpus12.hostedDocs(Tables.documents(spark, dir))
    val ids = prepared.select($"doc_id").distinct().as[Long].collect().sorted
    val groups = ids.grouped((ids.length + 2) / 3).toSeq
    groups.zipWithIndex.foreach { case (chunk, i) =>
      if (i > 0) Thread.sleep(1100)
      prepared.filter($"doc_id".isin(chunk: _*))
        .coalesce(1).write.mode("append").parquet(stage.toString)
    }
    val q = StatefulOps.domainQuotaStream(
        spark.readStream.schema(prepared.schema)
          .option("maxFilesPerTrigger", 1).parquet(stage.toString)
          .as[StatefulOps.QuotaIn]).writeStream
      .outputMode("append").format("memory").queryName("quota3")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // budget invariant: admitted per host == min(cap, |host|), any order
    val perHost = spark.table("quota3").groupBy("host")
      .agg(count(lit(1)).as("n"),
        sum(when($"admitted", 1L).otherwise(0L)).as("adm"))
      .as[(String, Long, Long)].collect()
    assert(perHost.nonEmpty)
    perHost.foreach { case (h, n, adm) =>
      assert(adm == math.min(10L, n), s"host $h admitted $adm of $n")
    }
    // cross-batch state: h0 (the heavy hitter) exhausts its budget in
    // file 0 (>= cap docs there), so every later-file h0 doc is refused
    val file0Max = groups.head.max
    val h0Later = spark.table("quota3")
      .filter($"host" === "h0" && $"doc_id" > file0Max)
      .as[StatefulOps.QuotaDecision].collect()
    assert(h0Later.nonEmpty && h0Later.forall(!_.admitted),
      "h0's later-file docs must all be refused by carried state")
  }

  test("composed streaming admission: robots gate → url dedup → lang gate in the bridge → domain quota ties to q268") {
    // The production topology for q268's STATEFUL stages with the
    // stateless robots gate chained at the head (it is a plain
    // stream-side map + broadcast-rules join, so it composes into stage
    // 1's query for free — a disallowed URL never even reaches the
    // frontier's dedup state, exactly the funnel's composition order).
    // Two keyed flatMapGroupsWithState operators cannot chain inside
    // one streaming query, so stage 2 (crawl-frontier URL dedup) writes
    // its kept rows through a foreachBatch bridge (= the Kafka/shard
    // hop between pipeline services) and stage 3 (per-domain admission)
    // streams from the bridge. The stateless LANG-ID GATE (q275's body,
    // the funnel's stage 3) runs INSIDE the bridge batch on the payload
    // attach — exactly where a pipeline service would score language
    // before forwarding to the admission frontier, and in the funnel's
    // composition order (after dedup, before the cap). One AvailableNow
    // replay each: intra-batch ties resolve in the batch queries' own
    // order, so the composed stream must equal the batch funnel's
    // robots_gate, url_dedup, lang_id_gate and domain_quota rows
    // exactly.
    val dir = "/root/testdata/sf0.01"
    val stage = java.nio.file.Files.createTempDirectory("graft_adm_in")
    val bridge = java.nio.file.Files.createTempDirectory("graft_adm_bridge")
      .resolve("kept").toString
    val (prepared, _) = stagedUrls(dir, stage, 1)
    val hosted = operators.Corpus12.hostedDocs(Tables.documents(spark, dir))
    val payload = Tables.documents(spark, dir).select($"doc_id", $"text")
      .join(hosted, Seq("doc_id"))
    val gated = operators.Corpus13.robotsDecideUrls(
        spark.readStream.schema(prepared.schema).parquet(stage.toString))
      .filter($"allowed").select("doc_id", "canon_url")
    val q1 = StatefulOps.urlDedupStream(
        gated.as[StatefulOps.UrlIn]).writeStream
      .outputMode("append")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[StatefulOps.UrlDecision], _: Long) =>
        val kept = ds.filter($"kept").join(payload, Seq("doc_id"))
        val langKeep = operators.Corpus14.langGateDecisions(
            kept.select($"doc_id", $"text"))
          .filter($"keep").select("doc_id")
        kept.join(langKeep, Seq("doc_id"), "left_semi")
          .select($"doc_id", $"host", $"n_chars")
          .write.mode("append").parquet(bridge)
      }
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination()
    val q2 = StatefulOps.domainQuotaStream(
        spark.readStream.schema(hosted.schema).parquet(bridge)
          .as[StatefulOps.QuotaIn]).writeStream
      .outputMode("append").format("memory").queryName("admission2")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val funnel = SparkEntry.queries("q268_hygiene_funnel")(spark, dir)
      .select("name", "docs_out").as[(String, Long)].collect().toMap
    // the stream-side robots head passes exactly the batch gate's docs
    assert(SparkEntry.queries("q272_robots_gate")(spark, dir)
      .filter($"allowed").count() == funnel("robots_gate"))
    // bridge == the funnel's lang-gated url_dedup survivors (the lang
    // gate composed into the bridge batch, so the bridge IS stage 3's
    // output)
    val bridged = spark.read.parquet(bridge)
    assert(bridged.count() == funnel("lang_id_gate"))
    // admitted set == the funnel's domain_quota survivors (score-ordered
    // single batch = the batch top-cap selection, host by host)
    val admitted = spark.table("admission2").filter($"admitted")
    assert(admitted.count() == funnel("domain_quota"))
    val expected = bridged.join(hosted.select("doc_id"), Seq("doc_id"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"host")
          .orderBy($"n_chars".desc, $"doc_id")))
      .filter($"rn" <= 10).select("doc_id")
    assert(expected.exceptAll(admitted.select("doc_id")).count() == 0)
    assert(admitted.select("doc_id").exceptAll(expected).count() == 0)
    // the stateless gates run unchanged downstream: q274's and q263's
    // per-doc keep flags applied in funnel order to the admitted set
    // reproduce the funnel's blocklist and gopher stages
    val keepB = SparkEntry.queries("q274_blocklist_gate")(spark, dir)
      .select("doc_id", "keep")
    val blocked = admitted.select("doc_id").join(keepB, Seq("doc_id"))
      .filter($"keep").select("doc_id")
    assert(blocked.count() == funnel("blocklist_gate"))
    val keep = SparkEntry.queries("q263_repetition_battery")(spark, dir)
      .select("doc_id", "keep")
    assert(blocked.join(keep, Seq("doc_id"))
      .filter($"keep").count() == funnel("gopher_gate"))
  }

  test("q273 classifier gate runs unchanged on a readStream frontier") {
    // the r10 zero-shuffle rewrite's claim made true-by-test: the gate
    // is one stateless projection (map-literal HOF fold), so the SAME
    // qualityClassify body runs on a streaming frontier and its
    // decisions equal the batch query's (doc_id, clf_keep) rows exactly
    val dir = "/root/testdata/sf0.01"
    val stage = java.nio.file.Files.createTempDirectory("graft_clf_stage")
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    docs.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val q = operators.Corpus14.qualityClassify(
        spark.readStream.schema(docs.schema).parquet(stage.toString))
      .writeStream
      .outputMode("append").format("memory").queryName("clf_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val fin = spark.table("clf_stream")
    val batch = SparkEntry.queries("q273_quality_classifier_gate")(spark, dir)
      .select("doc_id", "clf_keep")
    assert(fin.count() > 0)
    assert(batch.exceptAll(fin).count() == 0)
    assert(fin.exceptAll(batch).count() == 0)
  }

  test("q274 blocklist gate runs unchanged on a readStream frontier") {
    // same stateless-gate discipline as q272/q273: one projection, so
    // the SAME blocklistGate body runs on a streaming frontier and its
    // per-doc rows equal the batch query's exactly
    val dir = "/root/testdata/sf0.01"
    val stage = java.nio.file.Files.createTempDirectory("graft_bl_stage")
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    docs.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val q = operators.Corpus14.blocklistDecisions(
        spark.readStream.schema(docs.schema).parquet(stage.toString))
      .writeStream
      .outputMode("append").format("memory").queryName("blocklist_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val fin = spark.table("blocklist_stream")
    val batch = SparkEntry.queries("q274_blocklist_gate")(spark, dir)
    assert(fin.count() > 0)
    assert(batch.exceptAll(fin).count() == 0)
    assert(fin.exceptAll(batch).count() == 0)
  }

  test("q272 robots gate runs unchanged on a readStream frontier") {
    // the scaladoc's claim made true-by-test: the gate is stateless, so
    // the SAME robotsGate body runs on a streaming frontier and its
    // decisions equal the batch query's rows exactly
    val dir = "/root/testdata/sf0.01"
    val stage = java.nio.file.Files.createTempDirectory("graft_robots_stage")
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    docs.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val q = operators.Corpus13.robotsDecisions(
        spark.readStream.schema(docs.schema).parquet(stage.toString))
      .writeStream
      .outputMode("append").format("memory").queryName("robots_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val fin = spark.table("robots_stream")
    val batch = SparkEntry.queries("q272_robots_gate")(spark, dir)
    assert(fin.count() > 0)
    assert(batch.exceptAll(fin).count() == 0)
    assert(fin.exceptAll(batch).count() == 0)
  }

  test("q283/q284 scoring runs unchanged on a readStream frontier against frozen models") {
    // the production deploy shape of both signals: the models are
    // TRAINED IN BATCH (lmModels/dsirModels — a fixed artifact, like a
    // shipped KenLM or DSIR bucket table) and the scoring halves
    // (lmScore/dsirScore) are stream-static broadcast joins + one
    // doc-keyed aggregate, so the SAME bodies score a streaming
    // frontier; each doc arrives whole in one file, so its aggregate
    // finalizes in its arrival micro-batch and update-mode emits it once
    val dir = "/root/testdata/sf0.01"
    val stage = java.nio.file.Files.createTempDirectory("graft_score_stage")
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    // shuffled arrival across 3 files — 3 micro-batches
    docs.orderBy(md5($"doc_id".cast("string"))).repartition(3)
      .write.mode("overwrite").parquet(stage.toString)
    val full = Tables.documents(spark, dir)
    val ref = full.join(operators.Corpus.qualityGate(full)
      .filter($"keep").select("doc_id"), Seq("doc_id"), "left_semi")
    val (lm2, lm1, vocab, vt) = operators.Corpus14.lmModels(ref)
    val (tf, rf, tt, rt) = operators.Corpus14.dsirModels(ref, full)
    // pin the artifacts: a deploy ships static files, and a lazy model
    // frame would re-derive the training lineage inside every micro-batch
    val Seq(lm2p, lm1p, vp, vtp, tfp, rfp, ttp, rtp) =
      Seq(lm2, lm1, vocab, vt, tf, rf, tt, rt).map(_.localCheckpoint())
    def stream() = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage.toString)
    val q1 = operators.Corpus14.lmScore(stream(), lm2p, lm1p, vp, vtp)
      .writeStream.outputMode("update").format("memory")
      .queryName("lm_stream").trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination()
    val q2 = operators.Corpus14.dsirScore(stream(), tfp, rfp, ttp, rtp)
      .writeStream.outputMode("update").format("memory")
      .queryName("dsir_stream").trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val sLm = spark.table("lm_stream")
    val bLm = operators.Corpus14.lmScore(docs, lm2p, lm1p, vp, vtp)
    assert(sLm.count() > 0)
    assert(bLm.exceptAll(sLm).count() == 0 && sLm.exceptAll(bLm).count() == 0,
      "streamed LM scores must equal the batch scores exactly")
    val sDs = spark.table("dsir_stream")
    val bDs = operators.Corpus14.dsirScore(docs, tfp, rfp, ttp, rtp)
    assert(bDs.exceptAll(sDs).count() == 0 && sDs.exceptAll(bDs).count() == 0,
      "streamed DSIR weights must equal the batch weights exactly")
    // and the batch scores ARE the published queries' scores (the
    // decomposition did not fork the math): ppl column vs q283's
    val pub = SparkEntry.queries("q283_lm_perplexity")(spark, dir)
      .select("doc_id", "n_bigrams", "log_prob", "ppl")
    assert(pub.exceptAll(bLm.select("doc_id", "n_bigrams", "log_prob", "ppl"))
      .count() == 0)
  }

  test("streaming dedup by event_id keeps exactly the distinct ids") {
    val q = StreamingTwin.dedupStream(stagedEventStream()).writeStream
      .outputMode("append").format("memory").queryName("dedup_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val n = spark.table("dedup_stream").count()
    val distinct = Tables.events(spark, sfDir).select("event_id").distinct().count()
    assert(n == distinct)
  }
}
