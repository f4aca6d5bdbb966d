package graft

import graft.streaming.StatefulOps
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint RECOVERY for the keyed-state twins (r5/r6 verdict task):
  * kill the query between micro-batches, restart from the checkpoint,
  * and prove the state store carried over — the property that makes the
  * streaming surface operable at 100 TB (a 1000-executor job WILL be
  * preempted mid-stream).
  *
  * Harness: phase 1 processes a staged prefix of the input with a
  * checkpointLocation and stops (AvailableNow drains what exists — a
  * deterministic "killed between micro-batches" boundary); more files
  * are then staged and a NEW query object restarts from the SAME
  * checkpoint. Recovery is proven two ways:
  *  - the monotone absorbed-row counters (n_seen/n_days) end at the
  *    FULL input size even though phase 2's source only read the new
  *    files — state restored; and they end EXACTLY there — offsets
  *    restored (a from-scratch replay against restored state would
  *    double-count);
  *  - clampedBalanceStream's out-of-order fail-fast would THROW if the
  *    restart replayed already-folded days against the recovered
  *    lastDay watermark, so a green run is itself offset-recovery
  *    evidence.
  * Final state must equal the batch twin (q153 / q204) exactly.
  *
  * foreachBatch is the sink (the memory sink rejects checkpoint
  * recovery by design); outputs accumulate in a driver buffer.
  */
class StreamingRecoverySpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("KMV stream killed between micro-batches resumes from the checkpoint and settles to q153") {
    val dir = "/root/testdata/sf0.01"
    val stage = java.nio.file.Files.createTempDirectory("graft_kmvrec_stage")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_kmvrec_ckpt")
    val prepared = Tables.events(spark, dir)
      .select(lit("all").as("scope"),
        expr("CAST(conv(substr(md5(concat('u#', CAST(user_id AS STRING))), 1, 15), 16, 10) AS BIGINT) + 1")
          .as("h"))
    val total = prepared.count()
    val halfA = prepared.filter($"h" % 2 === 0)
    val halfB = prepared.filter($"h" % 2 =!= 0)
    val k = operators.Corpus4.KMV_K

    val buf = collection.mutable.ArrayBuffer.empty[StatefulOps.KmvSketch]
    def runPhase(): Unit = {
      val hashes = spark.readStream.schema(prepared.schema)
        .option("maxFilesPerTrigger", 1).parquet(stage.toString)
        .as[StatefulOps.KmvHash]
      val q = StatefulOps.kmvStream(hashes, k).writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch { (ds: Dataset[StatefulOps.KmvSketch], _: Long) =>
          val rows = ds.collect()
          buf.synchronized { buf ++= rows }
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    halfA.repartition(2).write.mode("append").parquet(stage.toString)
    runPhase() // "killed" here: the query object is gone, checkpoint remains
    assert(buf.nonEmpty && buf.map(_.n_seen).max == halfA.count(),
      "phase 1 must absorb exactly the staged prefix")
    val phase1Rows = buf.size

    halfB.repartition(2).write.mode("append").parquet(stage.toString)
    runPhase() // NEW query, SAME checkpoint
    assert(buf.size > phase1Rows, "phase 2 emitted nothing — restart did not run")
    val fin = buf.maxBy(_.n_seen)
    // state AND offsets both recovered: full count, not half, not 1.5x
    assert(fin.n_seen == total,
      s"absorbed ${fin.n_seen} of $total rows across the restart")
    assert(fin.n_kept == k)
    val q153 = SparkEntry.queries("q153_kmv_distinct_sketch")(spark, dir)
      .filter($"scope" === "all").select("est_ndv").as[Double].head()
    assert(math.abs(math.round(fin.est * 10) / 10.0 - q153) < 1e-9,
      s"recovered stream est ${fin.est} vs batch $q153")
  }

  test("composed admission topology killed between micro-batches recovers BOTH state stores") {
    // The r10 verdict's composed-topology recovery ask: the full
    // three-service admission pipeline (robots gate → crawl-frontier URL
    // dedup → lang gate in the foreachBatch bridge → per-domain quota),
    // each stateful stage on its OWN checkpoint (two services, two
    // stores — exactly the production shape), killed after a prefix and
    // restarted with fresh query objects. Recovery must hold end to end:
    //  - url store: a canonical URL claimed before the kill is NEVER
    //    re-claimed after it (phase-2 duplicates all come out
    //    kept=false), while genuinely new canons still claim;
    //  - url offsets: every robots-allowed input row is decided EXACTLY
    //    once across the restart (a replay would double-decide);
    //  - quota store: a host that exhausted its budget before the kill
    //    admits nothing after it; every host ends at min(cap, arrivals);
    //  - quota offsets: every bridged row is decided exactly once.
    // Staging is doc_id-ordered (the stagedChunks discipline), so the
    // recovered first-arrival winners equal q266's min(doc_id) winners
    // on the allowed subset — state recovery is checked against the
    // BATCH truth, not just internal consistency.
    val dir = "/root/testdata/sf0.01"
    val stage = java.nio.file.Files.createTempDirectory("graft_admrec_stage")
    val ckpt1 = java.nio.file.Files.createTempDirectory("graft_admrec_ckpt1")
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_admrec_ckpt2")
    val bridge = java.nio.file.Files.createTempDirectory("graft_admrec_bridge")
      .resolve("kept").toString

    val prepared = operators.Corpus12.canonUrls(Tables.documents(spark, dir))
      .select("doc_id", "canon_url")
    val hosted = operators.Corpus12.hostedDocs(Tables.documents(spark, dir))
    val payload = Tables.documents(spark, dir).select($"doc_id", $"text")
      .join(hosted, Seq("doc_id"))

    val urlBuf = collection.mutable.ArrayBuffer.empty[StatefulOps.UrlDecision]
    val quotaBuf = collection.mutable.ArrayBuffer.empty[StatefulOps.QuotaDecision]

    def runTopology(): Unit = {
      val gated = operators.Corpus13.robotsDecideUrls(
          spark.readStream.schema(prepared.schema)
            .option("maxFilesPerTrigger", 1).parquet(stage.toString))
        .filter($"allowed").select("doc_id", "canon_url")
      val q1 = StatefulOps.urlDedupStream(gated.as[StatefulOps.UrlIn]).writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt1.toString)
        .foreachBatch { (ds: Dataset[StatefulOps.UrlDecision], batchId: Long) =>
          val rows = ds.collect().toSeq
          urlBuf.synchronized { urlBuf ++= rows }
          val kept = rows.filter(_.kept).toDF().join(payload, Seq("doc_id"))
          val langKeep = operators.Corpus14.langGateDecisions(
              kept.select($"doc_id", $"text"))
            .filter($"keep").select("doc_id")
          // batchId-keyed idempotent landing (NOT append): a re-delivered
          // micro-batch must not double-feed the quota service
          streaming.StreamingTwin.landBatch(
            kept.join(langKeep, Seq("doc_id"), "left_semi")
              .select($"doc_id", $"host", $"n_chars"),
            batchId, bridge)
        }
        .trigger(Trigger.AvailableNow()).start()
      q1.awaitTermination()
      val q2 = StatefulOps.domainQuotaStream(
          spark.readStream
            .schema(org.apache.spark.sql.Encoders.product[StatefulOps.QuotaIn].schema)
            .option("maxFilesPerTrigger", 1).parquet(bridge)
            .as[StatefulOps.QuotaIn]).writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt2.toString)
        .foreachBatch { (ds: Dataset[StatefulOps.QuotaDecision], _: Long) =>
          val rows = ds.collect()
          quotaBuf.synchronized { quotaBuf ++= rows }
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q2.awaitTermination()
    }

    // split so BOTH phases claim new canons AND phase 2 replays phase-1
    // canons: ids 0..149 claim canons 0..149; ids 150+ claim canons
    // 150..199 and duplicate everything else (canon is doc_id mod 200)
    val ids = prepared.select($"doc_id").as[Long].collect().sorted
    val (idsA, idsB) = (ids.take(150), ids.drop(150))
    prepared.filter($"doc_id".isin(idsA: _*))
      .coalesce(1).write.mode("append").parquet(stage.toString)
    runTopology() // "killed" here: query objects gone, both checkpoints remain
    val urlPhase1 = urlBuf.size
    val quotaPhase1 = quotaBuf.size
    val claimed1 = urlBuf.filter(_.kept).map(_.canon_url).toSet
    val h0Bridged1 = spark.read.parquet(bridge).filter($"host" === "h0").count()
    assert(urlPhase1 > 0 && quotaPhase1 > 0 && claimed1.nonEmpty)
    // the heavy-hitter host must have exhausted its budget in phase 1,
    // or the phase-2 "admits nothing" check below proves nothing
    assert(h0Bridged1 >= 10L, s"h0 bridged only $h0Bridged1 rows in phase 1")

    Thread.sleep(1100) // keep modtime order across the restart boundary
    prepared.filter($"doc_id".isin(idsB: _*))
      .coalesce(1).write.mode("append").parquet(stage.toString)
    runTopology() // NEW query objects, SAME two checkpoints

    val allowed = SparkEntry.queries("q272_robots_gate")(spark, dir)
      .filter($"allowed").select("doc_id").as[Long].collect().toSet
    // url offsets recovered: every allowed row decided exactly once
    assert(urlBuf.size == ids.count(allowed), s"decided ${urlBuf.size} rows")
    assert(urlBuf.map(_.doc_id).distinct.size == urlBuf.size)
    // url state recovered: one claim per canon across the restart, and
    // the winner is the min allowed doc_id — the batch q266 rule
    urlBuf.groupBy(_.canon_url).foreach { case (cu, ds) =>
      assert(ds.count(_.kept) == 1, s"canon $cu claimed ${ds.count(_.kept)} times")
      assert(ds.filter(_.kept).head.doc_id == ds.map(_.doc_id).min, s"canon $cu")
    }
    val phase2 = urlBuf.drop(urlPhase1)
    val replayed = phase2.filter(d => claimed1(d.canon_url))
    assert(replayed.nonEmpty && replayed.forall(!_.kept),
      "a phase-1-claimed canon was re-claimed after the restart")
    assert(phase2.exists(_.kept), "phase 2 claimed no new canons")
    // quota offsets recovered: every bridged row decided exactly once
    val bridged = spark.read.parquet(bridge)
    assert(quotaBuf.size == bridged.count())
    // quota state recovered: per host min(cap, arrivals); the exhausted
    // heavy hitter admits NOTHING after the restart
    val perHost = bridged.groupBy($"host").count()
      .as[(String, Long)].collect().toMap
    quotaBuf.groupBy(_.host).foreach { case (h, ds) =>
      assert(ds.count(_.admitted) == math.min(10L, perHost(h)), s"host $h")
    }
    val h0Phase2 = quotaBuf.drop(quotaPhase1).filter(_.host == "h0")
    assert(h0Phase2.nonEmpty && h0Phase2.forall(!_.admitted),
      "h0's post-restart arrivals must all be refused by carried state")
  }

  test("a re-delivered micro-batch lands idempotently through the batchId-keyed bridge") {
    // foreachBatch is at-least-once: after a post-write pre-commit crash
    // the SAME batchId is delivered again on restart. The bridge landing
    // (StreamingTwin.landBatch) must make that a no-op — this forces the
    // replay deterministically by re-invoking the sink with the same
    // batchId (same rows, the WAL-fixed offset range; different
    // partitioning, as a restarted job may produce) and checks the
    // landed frame equals the batch truth, not truth + a doubled batch.
    val bridge = java.nio.file.Files.createTempDirectory("graft_idem_bridge")
      .resolve("kept").toString
    val truth = operators.Corpus12.hostedDocs(
      Tables.documents(spark, "/root/testdata/sf0.001"))
      .select($"doc_id", $"host", $"n_chars")
    val batch0 = truth.filter($"doc_id" % 2 === 0)
    val batch1 = truth.filter($"doc_id" % 2 =!= 0)
    streaming.StreamingTwin.landBatch(batch0, 0L, bridge)
    streaming.StreamingTwin.landBatch(batch1, 1L, bridge)
    def landed(): Seq[(Long, String, Long)] =
      spark.read.parquet(bridge).select("doc_id", "host", "n_chars")
        .as[(Long, String, Long)].collect().toSeq.sorted
    val expected = truth.as[(Long, String, Long)].collect().toSeq.sorted
    assert(landed() == expected)
    // the crash-replay: batch 1 delivered AGAIN (same batchId), with a
    // different physical partitioning — the landing must not change
    streaming.StreamingTwin.landBatch(batch1.repartition(3), 1L, bridge)
    assert(landed() == expected,
      "a re-delivered micro-batch changed the landed frame — the bridge is not idempotent")
    // and an append-mode landing WOULD have doubled it (the hole this
    // sink closes): the batch_id partition column scopes each delivery
    val perBatch = spark.read.parquet(bridge)
      .groupBy("batch_id").count().as[(Long, Long)].collect().toMap
    assert(perBatch(1L) == batch1.count(), s"batch 1 landed ${perBatch(1L)} rows")
  }

  test("draining consumed bridge partitions is safe under the consumer's restart") {
    // drainBridge's consumer-side contract: the downstream file-stream
    // reads the bridge with its own checkpoint; once it has CONSUMED a
    // batch partition, the drain may delete that dir. The proof: consume
    // batches 0-1, drain them (dirs gone, rows upserted into the store),
    // land batch 2, restart the consumer from the SAME checkpoint over a
    // bridge missing its seen files — it must neither crash, nor lose
    // batch 2, nor re-deliver the drained rows; and store ∪ deliveries
    // stays exactly the truth (compaction moved data, never changed it).
    val tmp = java.nio.file.Files.createTempDirectory("graft_drainrec")
    val bridge = tmp.resolve("bridge").toString
    val store = tmp.resolve("store").toString
    val ckpt = tmp.resolve("ckpt").toString
    val truth = operators.Corpus12.hostedDocs(
        Tables.documents(spark, "/root/testdata/sf0.001"))
      .select($"doc_id", $"host", $"n_chars")
    val Seq(b0, b1, b2) = (0 to 2).map(i => truth.filter($"doc_id" % 3 === i))
    val buf = collection.mutable.ArrayBuffer.empty[Long]
    def runConsumer(): Unit = {
      val q = spark.readStream.schema(truth.schema)
        .option("maxFilesPerTrigger", 1).parquet(bridge)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = df.select("doc_id").as[Long].collect()
          buf.synchronized { buf ++= rows }
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    streaming.StreamingTwin.landBatch(b0, 0L, bridge)
    streaming.StreamingTwin.landBatch(b1, 1L, bridge)
    runConsumer() // consumes batches 0 and 1, checkpoint records them
    val n1 = buf.size
    assert(n1 == b0.count() + b1.count())
    // the consumed partitions drain away (committed watermark = 1)
    assert(Flows.drainBridge(spark, bridge, store, 1L) == 2)
    streaming.StreamingTwin.landBatch(b2, 2L, bridge)
    runConsumer() // SAME checkpoint, seen files now deleted
    val phase2 = buf.drop(n1)
    assert(phase2.toSet == b2.select("doc_id").as[Long].collect().toSet,
      "the restarted consumer must deliver exactly the undrained batch")
    assert(buf.size == truth.count(), "no loss, no re-delivery across the drain")
    // end-to-end conservation: compacted store ∪ live bridge == truth
    val all = spark.read.parquet(store).select("doc_id", "host", "n_chars")
      .unionByName(spark.read.parquet(bridge).select("doc_id", "host", "n_chars"))
      .as[(Long, String, Long)].collect().toSeq.sorted
    assert(all == truth.as[(Long, String, Long)].collect().toSeq.sorted)
  }

  test("a consumer bootstrapping from scratch after a drain starts from the store, not the bridge") {
    // drainBridge's THIRD consumer path (the scaladoc's last promise,
    // r12 verdict #6): a consumer with NO checkpoint arriving after a
    // drain cannot see the drained batches on the bridge — its
    // bootstrap is the compacted STORE (batch snapshot) plus a stream
    // over the surviving bridge dirs. The proof: drain batches 0-1,
    // land batch 2 undrained, start a FRESH consumer (new checkpoint)
    // whose first act reads the store and then streams the bridge —
    // it must see exactly the truth once: no loss (the drained rows
    // arrive via the store), no doubles (the stream delivers only the
    // undrained batch).
    val tmp = java.nio.file.Files.createTempDirectory("graft_drainboot")
    val bridge = tmp.resolve("bridge").toString
    val store = tmp.resolve("store").toString
    val ckptFresh = tmp.resolve("ckpt_fresh").toString
    val truth = operators.Corpus12.hostedDocs(
        Tables.documents(spark, "/root/testdata/sf0.001"))
      .select($"doc_id", $"host", $"n_chars")
    val Seq(b0, b1, b2) = (0 to 2).map(i => truth.filter($"doc_id" % 3 === i))
    streaming.StreamingTwin.landBatch(b0, 0L, bridge)
    streaming.StreamingTwin.landBatch(b1, 1L, bridge)
    // the producer's watermark is committed at 1; no consumer exists
    // yet, so the consumedFloor guard is not in play — this is the
    // bootstrap-AFTER-drain ordering the scaladoc describes
    assert(Flows.drainBridge(spark, bridge, store, 1L) == 2)
    streaming.StreamingTwin.landBatch(b2, 2L, bridge)
    // FRESH consumer, no checkpoint: bootstrap = store snapshot …
    val boot = spark.read.parquet(store)
      .select($"doc_id", $"host", $"n_chars")
      .as[(Long, String, Long)].collect().toSeq
    assert(boot.map(_._1).sorted ==
      b0.unionByName(b1).select("doc_id").as[Long].collect().sorted.toSeq,
      "the compacted store must hand the bootstrap exactly the drained batches")
    // … then a stream over the bridge from a brand-new checkpoint
    val buf = collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    val q = spark.readStream.schema(truth.schema)
      .option("maxFilesPerTrigger", 1).parquet(bridge)
      .writeStream.option("checkpointLocation", ckptFresh)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.select("doc_id", "host", "n_chars")
          .as[(Long, String, Long)].collect()
        buf.synchronized { buf ++= rows }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(buf.map(_._1).toSet ==
      b2.select("doc_id").as[Long].collect().toSet,
      "the fresh stream must deliver exactly the undrained batch — " +
        "drained rows are the store's job, not the bridge's")
    // exactly-once union: bootstrap ∪ stream == truth, no overlap
    val all = (boot ++ buf).sorted
    assert(all == truth.as[(Long, String, Long)].collect().toSeq.sorted,
      "store ∪ fresh-consumer deliveries must conserve the truth exactly once")
    assert(boot.map(_._1).toSet.intersect(buf.map(_._1).toSet).isEmpty)
  }

  test("clamped-balance stream killed between micro-batches resumes and settles to q204") {
    val dir = "/root/testdata/sf0.01"
    val stage = java.nio.file.Files.createTempDirectory("graft_balrec_stage")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_balrec_ckpt")
    val deltas = Tables.events(spark, dir)
      .select($"user_id", to_date($"ts").as("d"),
        when($"event_type" === "signup", 20L).when($"event_type" === "purchase", -5L)
          .when($"event_type" === "error", -2L).otherwise(-1L).as("w"))
      .groupBy("user_id", "d").agg(sum($"w").as("dv"))
    // day-RANGED chunks, staged oldest-first (the keyed-log contract the
    // clamp fold requires); the restart must pick up AFTER the folded
    // days — replaying them would trip the fail-fast and redden this test
    val allDays = deltas.select($"d".cast("string").as[String]).distinct()
      .collect().sorted
    val chunks = allDays.grouped((allDays.length + 3) / 4).toSeq
    def stageChunks(cs: Seq[Array[String]]): Unit = cs.zipWithIndex.foreach {
      case (chunk, i) =>
        if (i > 0) Thread.sleep(1100)
        deltas.filter($"d".cast("string").isin(chunk.toSeq: _*))
          .coalesce(1).write.mode("append").parquet(stage.toString)
    }

    val buf = collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    def runPhase(): Unit = {
      val stream = spark.readStream.schema(deltas.schema)
        .option("maxFilesPerTrigger", 1).parquet(stage.toString)
        .as[StatefulOps.DayDelta]
      val q = StatefulOps.clampedBalanceStream(stream).writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch { (ds: Dataset[StatefulOps.BalanceState], _: Long) =>
          val rows = ds.select("user_id", "n_days", "delta_sum", "final_bal")
            .as[(Long, Long, Long, Long)].collect()
          buf.synchronized { buf ++= rows }
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    stageChunks(chunks.take(2))
    runPhase() // stop between micro-batches; folded-day watermarks persist
    val phase1Rows = buf.size
    assert(phase1Rows > 0)

    Thread.sleep(1100) // keep modtime order across the restart boundary
    stageChunks(chunks.drop(2))
    runPhase() // NEW query, SAME checkpoint — no fail-fast means no replay
    assert(buf.size > phase1Rows, "phase 2 emitted nothing — restart did not run")

    // latest emission per user across BOTH phases (users with no
    // phase-2 deltas keep their recovered phase-1 state)
    val fin = buf.groupBy(_._1).map { case (u, rs) => u -> rs.maxBy(_._2) }
    val batch = SparkEntry.queries("q204_clamped_balance")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(batch.nonEmpty && fin.size == batch.length)
    batch.foreach { case (u, nd, net, bal) =>
      assert(fin(u) == ((u, nd, net, bal)), s"user $u diverged after recovery: ${fin(u)}")
    }
  }
}
