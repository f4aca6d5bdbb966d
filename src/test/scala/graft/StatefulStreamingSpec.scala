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
