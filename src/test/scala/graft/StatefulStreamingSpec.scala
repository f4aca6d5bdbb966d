package graft

import graft.streaming.{StatefulOps, StreamingTwin}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

class StatefulStreamingSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def stagedEventStream() = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stage = java.nio.file.Files.createTempDirectory("graft_stateful_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      stage.resolve("events.parquet"))
    spark.readStream
      .schema(StructType(StreamingTwin.eventSchema.fields.map(f =>
        if (f.name == "ts") StructField("ts", LongType) else f)))
      .parquet(stage.toString)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
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
